package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank: hand-checkable fixed points, mass conservation, and
  * determinism under partitioning. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRank on a symmetric pair converges to the uniform fixed point") {
    // two nodes pointing at each other: pr = 1/2 each, at every iteration
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(e, iterations = 5).as[(Long, Double)].collect().toMap
    assert(math.abs(pr(1L) - 0.5) < 1e-6 && math.abs(pr(2L) - 0.5) < 1e-6)
  }

  test("pageRank concentrates mass on the hub of a star") {
    // spokes 2..6 <-> hub 1 (symmetrized): the hub must dominate
    val spokes = (2L to 6L)
    val e = (spokes.map(s => (1L, s)) ++ spokes.map(s => (s, 1L))).toDF("src", "dst")
    val pr = Graph.pageRank(e, iterations = 10).as[(Long, Double)].collect().toMap
    assert(spokes.forall(s => pr(1L) > 2 * pr(s)),
      s"hub must outrank every spoke by a wide margin: $pr")
    // total mass stays ~1 (symmetric graph, no dangling nodes)
    assert(math.abs(pr.values.sum - 1.0) < 1e-3)
  }

  test("pageRank preserves sub-1e-6 contributions (the decimal-grid regression)") {
    // hub with out-degree 3000: each hub contribution is ~1/(N·outdeg)
    // ≈ 1e-7 — a Num.dsum-style 6-dp detour would zero ALL of them and
    // evaporate a third of the probability mass (the finding that moved
    // this operator to an 18-dp grid)
    val spokes = (2L to 3001L)
    val e = (spokes.map(s => (1L, s)) ++ spokes.map(s => (s, 1L))).toDF("src", "dst")
    val pr = Graph.pageRank(e, iterations = 3).as[(Long, Double)].collect()
    assert(math.abs(pr.map(_._2).sum - 1.0) < 1e-6,
      s"mass must survive tiny contributions, got ${pr.map(_._2).sum}")
    val spokeRanks = pr.filter(_._1 != 1L).map(_._2)
    assert(spokeRanks.forall(_ > (1.0 - 0.85) / 3001 + 1e-9),
      "every spoke must receive hub mass, not just the teleport base")
  }

  test("pageRank is deterministic under partitioning and rejects bad args") {
    val e = (1L to 40L).map(i => (i, i % 7 + 1)).toDF("src", "dst")
      .unionByName((1L to 40L).map(i => (i % 7 + 1, i)).toDF("src", "dst"))
    val a = Graph.pageRank(e, iterations = 4).collect().toSeq
    val b = Graph.pageRank(e.repartition(11), iterations = 4).collect().toSeq
    assert(a === b)
    intercept[IllegalArgumentException] { Graph.pageRank(e, iterations = 0) }
    intercept[IllegalArgumentException] { Graph.pageRank(e, damping = 1.0) }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e.filter(col("src") < 0), iterations = 2)
    }
  }

  test("triangleCounts: K4, star, and a hub-heavy graph count by hand") {
    // K4: 4 triangles, every node on exactly 3
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(k4).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // star: wedges everywhere, zero triangles — empty output, and the
    // hub's out-degree under orientation is 0 (every spoke has lower
    // degree, so all edges point hub-ward... spoke-ward): no last-reducer
    val star = (2L to 50L).map(s => (1L, s)).toDF("src", "dst")
    assert(Graph.triangleCounts(star).isEmpty)
    // two triangles sharing an edge: shared nodes count both
    val bowtie = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val bt = Graph.triangleCounts(bowtie).as[(Long, Long)].collect().toMap
    assert(bt === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangleCounts canonicalizes input: direction, duplicates, self-loops") {
    // the same K3 arriving as reversed edges, duplicates, and a self-loop
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (1L, 3L), (2L, 2L)).toDF("src", "dst")
    val got = Graph.triangleCounts(messy).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // partitioning invariance: joins + aggregations only
    val big = (for (a <- 1L to 30L; b <- 1L to 30L if a < b && (a + b) % 3 != 0)
      yield (a, b)).toDF("src", "dst")
    val one = Graph.triangleCounts(big).collect().toSeq
    val many = Graph.triangleCounts(big.repartition(13)).collect().toSeq
    assert(one === many)
  }

  test("kCore: triangle with a tail keeps only the triangle at k=2") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.kCore(edges, 2).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: a cascading peel empties a pure chain (multi-round fixpoint)") {
    // removing each endpoint exposes the next — the peel must iterate to
    // the TRUE fixpoint, not stop after one synchronous round
    val chain = (1L to 6L).sliding(2).map(p => (p.head, p.last)).toSeq
      .toDF("src", "dst")
    assert(Graph.kCore(chain, 2).isEmpty)
    // and K4 survives k=3 intact while a pendant vertex does not
    val k4plus = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val core = Graph.kCore(k4plus, 3).as[(Long, Long)].collect().toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore canonicalizes input and is partitioning-invariant") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.kCore(messy, 2).as[(Long, Long)].collect().toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val big = (for (a <- 1L to 40L; b <- 1L to 40L if a < b && (a * b) % 5 == 0)
      yield (a, b)).toDF("src", "dst")
    val one = Graph.kCore(big, 6).collect().toSeq
    val many = Graph.kCore(big.repartition(13), 6).collect().toSeq
    assert(one === many)
  }

  test("bfsHops walks a chain level by level and stops at the horizon") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsHops(chain, seeds, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"nodes 5/6 lie beyond the 3-hop horizon: $got")
  }

  test("bfsHops keeps the shortest distance when paths of mixed length meet") {
    // 1-2-3-4 chain plus a 1-4 shortcut: node 4 is 1 hop, node 3 is 2
    // (via the shortcut), never the chain's 3
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.bfsHops(g, Seq(1L).toDF("node"), maxHops = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("bfsHops excludes disconnected components and honors multi-source seeds") {
    val g = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val multi = Graph.bfsHops(g, Seq(1L, 10L).toDF("node"), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(multi === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 10L -> 0L, 11L -> 1L))
    val single = Graph.bfsHops(g, Seq(1L).toDF("node"), maxHops = 9)
      .as[(Long, Long)].collect().toMap
    assert(!single.contains(10L) && !single.contains(11L),
      s"the 10-11 component is unreachable from 1: $single")
  }

  test("bfsHops canonicalizes edges and is partitioning-invariant") {
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (3L, 3L), (4L, 3L))
      .toDF("src", "dst")
    val a = Graph.bfsHops(messy, Seq(1L).toDF("node"), maxHops = 3)
      .collect().toSeq
    val b = Graph.bfsHops(messy.repartition(7), Seq(1L).toDF("node"), maxHops = 3)
      .collect().toSeq
    assert(a === b)
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toMap ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("triangleCounts under extreme degree skew: hub graph counts exactly, any partitioning") {
    // star hub 0 with 400 leaves, rim edges closing every (2k, 2k+1)
    // leaf pair into a triangle with the hub — the worst-case skew for
    // naive wedge generation: the hub alone would yield C(400,2) ≈ 80k
    // wedges. Degree orientation sends every hub edge INTO the hub
    // (leaves have degree 2), so wedges form only at the leaves and the
    // hub is never a wedge center — the no-last-reducer-hot-spot
    // property, asserted here by exact counts under skew.
    val star = (1L to 400L).map(l => (0L, l))
    val rim = (0L until 200L).map(k => (2 * k + 1, 2 * k + 2))
    val edges = (star ++ rim).toDF("src", "dst")
    val got = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    // 200 triangles, each touching the hub once and two leaves once
    assert(got(0L) === 200L)
    assert((1L to 400L).forall(l => got(l) === 1L))
    val again = Graph.triangleCounts(edges.repartition(13)).as[(Long, Long)].collect().toMap
    assert(again === got)
  }

  test("labelPropagation separates two planted communities; hand-traced rounds; partition-invariant") {
    // two triangles bridged by one edge: {1,2,3} and {10,11,12}, 3–10
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 5)
      .as[(Long, Long)].collect().toMap
    // hand-traced 5 synchronous rounds with the (count DESC, label ASC)
    // tie-break: the left triangle converges to label 1, the right to 3
    // (the bridge pulls 3's label across before 10's own community
    // re-anchors — the deterministic trace, not just "two groups")
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
    // partitioning invariance: synchronous rounds + deterministic
    // tie-break make the labeling a pure function of the graph
    val again = Graph.labelPropagation(edges.repartition(7), rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(again === got)
  }
}
