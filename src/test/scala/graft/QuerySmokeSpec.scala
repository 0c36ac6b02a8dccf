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

  test("q23's measured HLL relative error stays inside the sketch's rsd envelope") {
    import org.apache.spark.sql.functions.col
    val errs = graft.queries.Registry.specs.find(_.name == "q23_approx_distinct").get
      .run(spark, sf0001)
      .select(col("rel_err_parts"), col("rel_err_orders"))
      .collect().flatMap(r => Seq(r.getDouble(0), r.getDouble(1)))
    // default approx_count_distinct rsd is 5%; 3×rsd is a generous but
    // real gate — a broken sketch (or a broken error column) blows it
    assert(errs.forall(e => e >= 0.0 && e < 0.15), s"errors: ${errs.toSeq}")
  }
}
