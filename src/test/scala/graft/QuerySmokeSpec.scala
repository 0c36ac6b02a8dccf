package graft

/** t1-style smoke: every registered query runs at sf0.001 without
  * throwing, and its oracle (if any) is non-empty SQL. The value-level
  * check is Verify + the DuckDB oracle at sf0.01 (driver gate t2). */
class QuerySmokeSpec extends SparkTestBase {

  graft.queries.Registry.specs.foreach { spec =>
    test(s"${spec.name} runs at sf0.001") {
      val df = spec.run(spark, sf0001)
      df.write.format("noop").mode("overwrite").save()
      spec.oracle.foreach(sql => assert(sql.trim.nonEmpty))
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query/oracle name alignment") {
    val q = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(q))
  }
}
