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

  /** Shared DuckDB CTE chain replaying
    * [[graft.operators.Graph.labelPropagation]] over an in-scope CTE
    * `e` (src, dst): mirrors the operator's canonSym normalization
    * (least/greatest dedup, self-loops and NULLs dropped, symmetrized)
    * then chains `rounds` synchronous adopt-the-most-frequent-neighbor-
    * label steps with the deterministic (count DESC, label ASC)
    * tie-break. The final labeling is `l<rounds>` (node, label). */
  def labelPropChainSql(rounds: Int): String = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    def step(prev: String, next: String) =
      s"""$next AS (
         |  SELECT node, label FROM (
         |    SELECT node, label,
         |      row_number() OVER (PARTITION BY node
         |                         ORDER BY c DESC, label) AS rn
         |    FROM (SELECT se.dst AS node, l.label,
         |            CAST(count(*) AS BIGINT) AS c
         |          FROM se JOIN $prev l ON l.node = se.src
         |          GROUP BY 1, 2) t) r
         |  WHERE rn = 1)""".stripMargin
    val chain = (1 to rounds)
      .map(i => step(s"l${i - 1}", s"l$i")).mkString(",\n")
    s"""ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |       FROM e
       |       WHERE src <> dst AND src IS NOT NULL AND dst IS NOT NULL),
       |se AS (SELECT a AS src, b AS dst FROM ce
       |       UNION ALL SELECT b AS src, a AS dst FROM ce),
       |lnodes AS (SELECT DISTINCT src AS node FROM se),
       |l0 AS (SELECT node, node AS label FROM lnodes),
       |$chain""".stripMargin
  }
}
