package graft.queries

/** Shared DuckDB CTE chain replaying
  * [[graft.operators.Graph.pageRank]] over an in-scope CTE `e`
  * (src, dst): uniform start, per-iteration contribution sums through
  * the DECIMAL(38,18) detour, sink-restoring left join from the node
  * table. Splices as a comma-terminated run of CTEs; the final rank
  * table is `p<iterations>` (node, pagerank). Shared by the q34
  * entity-graph and t64 word-graph oracles — ONE definition of the
  * replay, so a damping or detour change cannot silently diverge.
  * `e` is deduplicated up front (the `ed` CTE), mirroring
  * [[graft.operators.Graph.pageRank]]'s internal `.distinct()` — a
  * caller whose `e` is a multigraph still converges to the operator. */
private[queries] object GraphSql {

  def pageRankChainSql(iterations: Int, damping: Double): String = {
    require(iterations >= 1, s"iterations must be positive, got $iterations")
    // constants interpolated from the SAME Scala doubles the operator
    // uses (the BM25 discipline): (1.0 - damping) is NOT a decimal
    // literal, and all divisions must run in DOUBLE, never DuckDB's
    // decimal division
    val oneMinusD = java.lang.Double.toString(1.0 - damping)
    val d = java.lang.Double.toString(damping)
    def step(prev: String, next: String) =
      s"""$next AS (
         |  SELECT n.node,
         |    (CAST($oneMinusD AS DOUBLE) / (SELECT n FROM nn))
         |      + CAST($d AS DOUBLE) * COALESCE(m.mass, CAST(0.0 AS DOUBLE)) AS pagerank
         |  FROM nodes n LEFT JOIN (
         |    SELECT ed.dst,
         |      CAST(SUM(CAST((p.pagerank / od.outdeg) AS DECIMAL(38,18))) AS DOUBLE) AS mass
         |    FROM $prev p JOIN od ON p.node = od.src
         |      JOIN ed ON p.node = ed.src
         |    GROUP BY ed.dst) m ON n.node = m.dst)""".stripMargin
    val chain = (1 to iterations)
      .map(i => step(s"p${i - 1}", s"p$i")).mkString(",\n")
    s"""ed AS (SELECT DISTINCT src, dst FROM e),
       |nodes AS (SELECT DISTINCT src AS node FROM ed
       |          UNION SELECT DISTINCT dst AS node FROM ed),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM ed GROUP BY src),
       |p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pagerank
       |       FROM nodes),
       |$chain""".stripMargin
  }
}
