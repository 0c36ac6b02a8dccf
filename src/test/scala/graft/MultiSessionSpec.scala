package graft

/** Multi-session robustness (the r15–r16 ADVICE theme): the engine's
  * session-scoped machinery — function registration (GraftExpressions
  * registers into the SESSION's function registry), the (session, dir)
  * memoization caches behind silverFlat, and the stream-stage cache's
  * per-session ownership — must let two sessions of one SparkContext
  * run the same queries independently and agree on results. */
class MultiSessionSpec extends SparkTestBase {

  private def rows(name: String, s: org.apache.spark.sql.SparkSession): Seq[String] = {
    val df = graft.queries.Registry.specs.find(_.name == name).get.run(s, sf0001)
    // canonical row text, orderless — the driver-compare convention
    df.collect().map(_.toString).sorted.toSeq
  }

  test("a cloned session runs the same queries to the same results") {
    val s2 = spark.newSession()
    // q06: the flagship join+agg (exercises Corpus reads + dsum);
    // p02: exercises the (session, dir)-keyed silverFlat cache;
    // v01: exercises per-session GraftExpressions registration
    for (q <- Seq("q06_region_customer_stats", "p02_courier_metrics", "v01_cosine_topk")) {
      assert(rows(q, s2) === rows(q, spark), s"$q must agree across sessions")
    }
    // the caches are keyed per session — both entries coexist
    assert(graft.queries.Domain.silverFlat(spark, sf0001) ne
      graft.queries.Domain.silverFlat(s2, sf0001),
      "silverFlat memoization must be per-session, not shared")
  }
}
