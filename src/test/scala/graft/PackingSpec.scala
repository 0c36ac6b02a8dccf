package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sequence-packing invariants: running sums are gapless within a shard,
  * no tokens are lost, sequence ranges cover exactly each doc's span, and
  * the layout is deterministic under input partitioning. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(n.toLong).select(
      col("id").as("doc_id"),
      concat(lit("doc "), col("id"), lit(" body text")).as("text"),
      (pmod(col("id") * 37, lit(90)) + 10).as("n_tokens"))

  private case class Packed(docId: Long, shard: Long, nTokens: Long,
      cumBefore: Long, seqFirst: Long, seqLast: Long)

  private def pack(df: org.apache.spark.sql.DataFrame, ctx: Int = 64, shards: Int = 4) =
    Packing.packSequences(df, "text", "doc_id", "n_tokens", ctx, shards)
      .select("doc_id", "shard", "n_tokens", "cum_before", "seq_first", "seq_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map((Packed.apply _).tupled)

  test("within a shard the running sum is gapless and starts at zero") {
    val rows = pack(corpus(300))
    rows.groupBy(_.shard).foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_.cumBefore)
      assert(ordered.head.cumBefore === 0L, s"shard $shard must start at 0")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.cumBefore === a.cumBefore + a.nTokens,
            s"shard $shard: doc ${b.docId} leaves a gap after ${a.docId}")
        case _ => ()
      }
    }
    // no tokens lost: per-shard totals equal the input totals
    assert(rows.map(_.nTokens).sum === corpus(300).agg(sum("n_tokens")).as[Long].head())
  }

  test("sequence ranges cover exactly each doc's token span") {
    val ctx = 64
    val rows = pack(corpus(300), ctx = ctx)
    rows.foreach { r =>
      assert(r.seqFirst === r.cumBefore / ctx)
      assert(r.seqLast === (r.cumBefore + r.nTokens - 1) / ctx)
      assert(r.seqLast >= r.seqFirst)
      // a doc shorter than ctx spans at most 2 sequences (one boundary)
      if (r.nTokens <= ctx) assert(r.seqLast - r.seqFirst <= 1)
    }
  }

  test("chunkTokens: coverage, overlap, short docs, and argument guards") {
    val toks = (1 to 75).map(i => s"w$i")
    val df = Seq((1L, toks), (2L, toks.take(10)), (3L, Seq.empty[String]))
      .toDF("doc_id", "toks")
    val chunks = Packing.chunkTokens(df, "toks", ctxLen = 32, overlap = 8)
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Int, String)].collect().sortBy(c => (c._1, c._2))
    // doc 1 (75 toks, stride 24): starts 1/25/49 → sizes 32/32/27
    val d1 = chunks.filter(_._1 == 1L).map(_._3.split(" ").toSeq)
    assert(d1.map(_.size).toSeq === Seq(32, 32, 27))
    assert(d1(0).take(32) === toks.slice(0, 32))
    assert(d1(1).take(8) === d1(0).takeRight(8), "consecutive chunks share the overlap")
    assert(d1.flatten.distinct.size === 75, "every token appears in some chunk")
    // a doc shorter than ctxLen is one whole chunk; empty docs drop
    assert(chunks.filter(_._1 == 2L).map(_._3).toSeq === Seq(toks.take(10).mkString(" ")))
    assert(!chunks.exists(_._1 == 3L))
    intercept[IllegalArgumentException](Packing.chunkTokens(df, "toks", 32, 32))
    intercept[IllegalArgumentException](Packing.chunkTokens(df, "toks", 0, 0))
  }

  test("layout is deterministic under input partitioning; zero-token rows drop") {
    val base = pack(corpus(250)).sortBy(_.docId).toSeq
    val shuffled = pack(corpus(250).repartition(13)).sortBy(_.docId).toSeq
    assert(base === shuffled, "packing must not depend on input partitioning")
    val withEmpty = corpus(250)
      .withColumn("n_tokens", when(col("doc_id") % 5 === 0, 0L).otherwise(col("n_tokens")))
    assert(pack(withEmpty).length === 200, "0-token rows occupy no sequence")
  }

  test("fimTransform: PSM pieces reassemble the original; gate honors the rate; deterministic") {
    val docs = (0L until 40L).map(i => (i, s"the quick brown fox $i jumps over dogs"))
      .toDF("doc_id", "text")
    val out = Packing.fimTransform(docs, "text", "doc_id", seed = "s", ratePct = 100)
      .select("doc_id", "fim_text").as[(Long, String)].collect().toMap
    val orig = docs.as[(Long, String)].collect().toMap
    out.foreach { case (id, psm) =>
      // <PRE> prefix <SUF> suffix <MID> middle  →  prefix+middle+suffix
      val m = """(?s)^<PRE> (.*) <SUF> (.*) <MID> (.*)$""".r
      psm match {
        case m(pre, suf, mid) =>
          assert(pre + mid + suf === orig(id), s"doc $id must reassemble losslessly")
        case _ => fail(s"doc $id not in PSM layout: $psm")
      }
    }
    // rate 0: everything passes through untouched
    val ar = Packing.fimTransform(docs, "text", "doc_id", seed = "s", ratePct = 0)
    assert(ar.filter(col("fim")).isEmpty)
    assert(ar.select("doc_id", "fim_text").as[(Long, String)].collect().toMap === orig)
    // gate + cuts are (seed, id)-keyed: same seed reproduces, partitioning irrelevant
    val a = Packing.fimTransform(docs, "text", "doc_id", "s", 50).orderBy("doc_id").collect()
    val b = Packing.fimTransform(docs.repartition(7), "text", "doc_id", "s", 50)
      .orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(Packing.fimTransform(docs, "text", "doc_id", "s", 50)
      .filter(col("fim")).count() > 0, "a 50% gate must transform some docs")
  }

  test("spanCorrupt: sentinels substitute losslessly; budget and span count honored") {
    val docs = (0L until 30L).map(i =>
      (i, (0 until 40).map(t => s"w$t").mkString(" "))).toDF("doc_id", "text")
    val out = Packing.spanCorrupt(docs, "text", "doc_id", seed = "s")
      .select("doc_id", "corrupted", "n_spans", "input_text", "target_text")
      .as[(Long, Boolean, Long, String, String)].collect()
    assert(out.length === 30 && out.forall(_._2), "40-token docs all corrupt")
    out.foreach { case (id, _, k, input, target) =>
      // 40 tokens → c=6, k=2 spans of 3
      assert(k === 2L, s"doc $id span count")
      // substitute each <Xi> in the input by its target tokens → original
      val tgt = target.split(" ")
      val spans = (0 until k.toInt).map { i =>
        val at = tgt.indexOf(s"<X$i>")
        val end = if (i + 1 < k) tgt.indexOf(s"<X${i + 1}>") else tgt.length
        s"<X$i>" -> tgt.slice(at + 1, end).mkString(" ")
      }.toMap
      val rebuilt = input.split(" ").flatMap(t =>
        if (spans.contains(t)) spans(t).split(" ") else Array(t)).mkString(" ")
      assert(rebuilt === (0 until 40).map(t => s"w$t").mkString(" "),
        s"doc $id must reassemble: $input / $target")
      assert(tgt.count(_.startsWith("<X")) === 2 && tgt.length === 2 + 6,
        s"doc $id target must carry exactly the 6-token budget: $target")
    }
    // short docs pass through
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    val t = Packing.spanCorrupt(tiny, "text", "doc_id", "s")
      .select("corrupted", "n_spans", "input_text", "target_text")
      .as[(Boolean, Long, String, String)].head()
    assert(t === ((false, 0L, "a b c", "")))
    // deterministic under partitioning
    val a = Packing.spanCorrupt(docs, "text", "doc_id", "s").orderBy("doc_id").collect()
    val b = Packing.spanCorrupt(docs.repartition(7), "text", "doc_id", "s")
      .orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("sequenceBoundaries: spans tile every sequence gaplessly and cover each doc exactly") {
    val ctx = 64
    val packed = Packing.packSequences(corpus(250), "text", "doc_id", "n_tokens", ctx, 4)
    val bounds = Packing.sequenceBoundaries(packed, ctx)
      .select("shard", "seq", "doc_id", "start_in_seq", "end_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
    val shardTotals = pack(corpus(250), ctx, 4)
      .groupBy(_.shard).view.mapValues(_.map(_.nTokens).sum).toMap
    bounds.groupBy(b => (b._1, b._2)).foreach { case ((shard, seq), spans) =>
      val sorted = spans.sortBy(_._4)
      assert(sorted.head._4 === 0L, s"seq ($shard,$seq) must start at 0")
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._5 === y._4, s"gap in seq ($shard,$seq)")
        case _ =>
      }
      val expectedEnd = math.min(ctx.toLong, shardTotals(shard) - seq * ctx)
      assert(sorted.last._5 === expectedEnd, s"seq ($shard,$seq) must end at $expectedEnd")
    }
    // every doc's spans across its sequences sum to exactly its tokens
    val perDoc = bounds.groupBy(_._3).view
      .mapValues(_.map(s => s._5 - s._4).sum).toMap
    pack(corpus(250), ctx, 4).foreach { p =>
      assert(perDoc(p.docId) === p.nTokens, s"doc ${p.docId} span coverage")
    }
  }
}
