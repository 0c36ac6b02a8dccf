package graft.util

/** Accumulates named wall-clock phases inside a query so the bench can
  * attribute time to them separately. The index-backed queries
  * (t15/t16/v05) rebuild their on-disk index inside the query body by
  * design — a single total hides whether a regression is in the
  * amortizable build (paid once per corpus in production) or in the
  * per-batch probe (paid every run). [[graft.Bench]] drains this after
  * each query and reports `build` next to the total.
  *
  * Thread-safe (builds run Spark jobs from the caller's thread, but
  * nothing stops parallel suites sharing the JVM); timings are additive
  * within one drain window.
  */
object PhaseTimer {
  private val acc = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def time[T](phase: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally acc.merge(phase, (System.nanoTime() - t0) / 1e9,
      (a, b) => java.lang.Double.valueOf(a + b))
  }

  /** Returns all phase totals accumulated since the last drain and resets. */
  def drain(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val snap = acc.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
    acc.clear()
    snap
  }

  // Integer metrics (iteration-round counts) ride a SEPARATE channel from
  // time: Bench derives the probe remainder by subtracting the time-phase
  // sum from the query's elapsed seconds, and a count mixed into that sum
  // would corrupt it.
  private val cnt = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Accumulates an integer metric — e.g. the connected-components round
    * count, whose log-n growth is the scale argument the bench makes
    * checkable per run. */
  def count(metric: String, n: Long): Unit =
    cnt.merge(metric, java.lang.Long.valueOf(n),
      (a, b) => java.lang.Long.valueOf(a + b))

  /** Returns all counts accumulated since the last drain and resets. */
  def drainCounts(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val snap = cnt.asScala.map { case (k, v) => k -> v.longValue }.toMap
    cnt.clear()
    snap
  }
}
