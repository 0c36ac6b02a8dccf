package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for persisted intermediates that feed multiple plan branches
  * (Catalyst does not CSE across branches, so an unpersisted shared frame
  * re-executes its whole upstream plan per branch). Operators persist
  * through [[track]]; long-lived drivers free everything via
  * [[releaseAll]] (each owner's release hook is wired into
  * `graft.queries.Domain.clearCache`). One-shot Verify/Bench runs never
  * need to release. */
final class CacheRegistry {
  private val live = scala.collection.mutable.ListBuffer.empty[DataFrame]

  def track(df: DataFrame): DataFrame = synchronized {
    val persisted = df.persist(StorageLevel.MEMORY_AND_DISK)
    live += persisted
    persisted
  }

  /** Registers an ALREADY-persisted frame (e.g. one persisted inside an
    * iterative loop) for release without re-persisting it. */
  def register(df: DataFrame): Unit = synchronized { live += df }

  def releaseAll(): Unit = synchronized {
    live.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    live.clear()
  }
}
