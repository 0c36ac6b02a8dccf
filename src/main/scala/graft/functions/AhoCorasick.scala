package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton (Aho & Corasick, "Efficient string matching:
  * an aid to bibliographic search", CACM 1975): goto/fail/output trie
  * over a fixed pattern set, matching ALL patterns in ONE left-to-right
  * pass over the text — O(|text| + matches) regardless of pattern count,
  * where the naive form runs one `contains` scan PER pattern. Dictionary
  * suffix links are materialized into per-node output sets at build time
  * (`she` must also report the embedded `he`), so the match loop never
  * chases link chains.
  *
  * Transitions are dense int arrays over the 7-bit alphabet (patterns
  * must be ASCII; the goto function is completed at build so the match
  * loop is branch-light array indexing — no fail-link chasing either).
  * Text characters outside the alphabet can appear in no pattern, so
  * they reset to the root, which is exactly what the completed goto
  * does for any unknown character.
  */
final class AhoCorasickAutomaton(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern set")
  require(patterns.forall(p => p.nonEmpty && p.forall(_ < 128)),
    "patterns must be non-empty ASCII")
  private val A = 128

  // --- trie build ---
  private var cap = 16
  private var goto_ = Array.fill(cap * A)(-1)
  private var words = Array.fill[List[Int]](cap)(Nil) // pattern ids ending here
  private var n = 1 // node 0 = root

  private def grow(): Unit = {
    val nc = cap * 2
    val ng = Array.fill(nc * A)(-1); System.arraycopy(goto_, 0, ng, 0, cap * A)
    val nw = Array.fill[List[Int]](nc)(Nil); System.arraycopy(words, 0, nw, 0, cap)
    goto_ = ng; words = nw; cap = nc
  }

  patterns.zipWithIndex.foreach { case (p, pid) =>
    var s = 0
    p.foreach { ch =>
      val c = ch.toInt
      if (goto_(s * A + c) == -1) {
        if (n == cap) grow()
        goto_(s * A + c) = n; n += 1
      }
      s = goto_(s * A + c)
    }
    words(s) ::= pid
  }

  // --- BFS: fail links, output-set union (dictionary suffixes), and
  // goto completion (missing transitions point where fail would land) ---
  private val fail = new Array[Int](n)
  // per-node: bitmask of pattern ids ending at or suffix-reachable from
  // the node (pattern sets here are small; a long mask keeps the match
  // loop allocation-free) + length of the LONGEST pattern ending here
  // (for first-match position)
  require(patterns.size <= 64, s"at most 64 patterns, got ${patterns.size}")
  val outMask = new Array[Long](n)
  private val queue = new java.util.ArrayDeque[Int]()
  var i = 0
  while (i < n) { outMask(i) = words(i).foldLeft(0L)((m, pid) => m | (1L << pid)); i += 1 }
  var c = 0
  while (c < A) {
    val s = goto_(c)
    if (s == -1) goto_(c) = 0
    else { fail(s) = 0; queue.add(s) }
    c += 1
  }
  while (!queue.isEmpty) {
    val u = queue.poll()
    outMask(u) |= outMask(fail(u))
    var c = 0
    while (c < A) {
      val v = goto_(u * A + c)
      if (v == -1) goto_(u * A + c) = goto_(fail(u) * A + c)
      else { fail(v) = goto_(fail(u) * A + c); queue.add(v) }
      c += 1
    }
  }

  private val patLen = patterns.map(_.length).toArray

  /** One pass: (count of DISTINCT patterns present, 1-based char position
    * of the first match — the minimum over patterns of its first
    * occurrence start — or -1 if none). */
  def scan(text: String): (Int, Int) = {
    var s = 0
    var seen = 0L
    var firstPos = -1
    var i = 0
    val len = text.length
    while (i < len) {
      val ch = text.charAt(i)
      // chars outside the 7-bit alphabet occur in no pattern: transition
      // on \0 (never in a pattern either) — the completed goto routes
      // both through the root exactly like any unmatched character
      val ci = if (ch < 128) ch.toInt else 0
      s = goto_(s * A + ci)
      val m = outMask(s)
      if (m != 0) {
        var fresh = m & ~seen
        while (fresh != 0) {
          val pid = java.lang.Long.numberOfTrailingZeros(fresh)
          val start = i - patLen(pid) + 2 // 1-based
          if (firstPos == -1 || start < firstPos) firstPos = start
          fresh &= fresh - 1
        }
        seen |= m
      }
      i += 1
    }
    (java.lang.Long.bitCount(seen), firstPos)
  }

  /** Fast path over the raw UTF-8 bytes — no String materialization (the
    * per-row toString copy cost more than the whole match loop on short
    * docs). For pure-ASCII text, byte positions ARE char positions, so
    * results are identical to [[scan]]; the first non-ASCII byte (any
    * negative signed byte) bails to the string path, where char
    * positions are computed properly. Returns (count, firstPos) or null
    * to signal the bail-out. */
  def scanAsciiBytes(bytes: org.apache.spark.unsafe.types.UTF8String): (Int, Int) = {
    var s = 0
    var seen = 0L
    var firstPos = -1
    var i = 0
    val len = bytes.numBytes()
    while (i < len) {
      val b = bytes.getByte(i)
      if (b < 0) return null // non-ASCII: caller re-scans via toString
      s = goto_(s * A + b)
      val m = outMask(s)
      if (m != 0) {
        var fresh = m & ~seen
        while (fresh != 0) {
          val pid = java.lang.Long.numberOfTrailingZeros(fresh)
          val start = i - patLen(pid) + 2
          if (firstPos == -1 || start < firstPos) firstPos = start
          fresh &= fresh - 1
        }
        seen |= m
      }
      i += 1
    }
    (java.lang.Long.bitCount(seen), firstPos)
  }
}

/** `graft_blocklist(text, patterns)` — multi-pattern substring scan via
  * [[AhoCorasickAutomaton]]: returns
  * `struct<n_patterns int, first_pos int>` = how many DISTINCT blocklist
  * patterns occur in the text and the 1-based character position of the
  * earliest match (-1 when clean). The C4/Gopher badlist-filter
  * primitive: at corpus scale the naive form is one `contains` pass per
  * pattern (P scans of every byte); this is ONE pass total, inside
  * whole-stage codegen (the generated code calls the shared automaton —
  * the BandedSignature embedding pattern).
  *
  * first_pos caveat: positions are CHARACTER positions of the earliest
  * match START across all patterns — NOT the first position at which any
  * automaton match COMPLETES (a long pattern can start before a short
  * one that finishes first); the oracle mirror is
  * `min over present patterns of strpos(text, p)`.
  */
case class BlocklistScan(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_patterns", IntegerType, nullable = false),
    StructField("first_pos", IntegerType, nullable = false)))
  override def prettyName: String = "graft_blocklist"

  // built once per expression instance, shared by all tasks (codegen
  // embeds the instance via the references array); volatile single-write
  // publication, racing duplicate builds are idempotent
  @transient @volatile private var auto: AhoCorasickAutomaton = _
  private def automaton: AhoCorasickAutomaton = {
    var a = auto
    if (a == null) { a = new AhoCorasickAutomaton(patterns); auto = a }
    a
  }

  def scanRow(text: UTF8String): InternalRow = {
    val a = automaton
    // byte fast path (no String copy); null = non-ASCII text seen, fall
    // back to the char-correct string scan
    var r = a.scanAsciiBytes(text)
    if (r == null) r = a.scan(text.toString)
    InternalRow(r._1, r._2)
  }

  override protected def nullSafeEval(t: Any): Any =
    scanRow(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blocklistScan", this)
    defineCodeGen(ctx, ev, t => s"$ref.scanRow($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistScan =
    copy(child = newChild)
}
