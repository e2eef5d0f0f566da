package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry of the intermediate frames the operators in this package
  * cache (`units`/`cUnits` vector materializations, encoded ANN
  * indexes, MinHash signatures, Bloom build sides, ...).
  *
  * Spark's `Dataset.cache` is session-lifetime: without a release
  * path, every index build over a DISTINCT corpus adds cached plans
  * that live until the session ends — the build-once / search-many
  * pattern reuses one entry (the CacheManager dedups identical
  * plans), but a pipeline cycling through many corpora accumulates.
  * Operators register each cached frame here; callers that are done
  * with every index/operator result call [[release]] to unpersist
  * them all at once (the targeted alternative to
  * `spark.catalog.clearCache()`, which would also evict caches the
  * caller owns). Releasing is safe at any time — a live result
  * derived from a released frame recomputes instead of failing. */
object OpCaches {

  /** Keyed by (session identity, analyzed-plan semanticHash): a
    * build-once/search-many loop that re-derives the plan-identical
    * frame each call reuses one entry instead of growing the registry
    * unboundedly (Spark's CacheManager already dedups the cached data;
    * this dedups OUR bookkeeping so we don't pin one DataFrame — and
    * through it a QueryExecution + SparkSession — per invocation). */
  private val frames =
    new java.util.LinkedHashMap[(Int, Int), DataFrame]()

  private def keyOf(df: DataFrame): (Int, Int) =
    (System.identityHashCode(df.sparkSession),
      df.queryExecution.analyzed.semanticHash())

  /** Cache `df` and remember it for [[release]]. Visible to the whole
    * engine (not just operators): composition queries (c01/c02, q67)
    * stage their reused pipeline intermediates through the same
    * registry, so one release path covers every cached frame. */
  private[graft] def track(df: DataFrame): DataFrame = synchronized {
    df.cache()
    frames.put(keyOf(df), df)
    df
  }

  /** Unpersist every operator-cached frame registered since the last
    * release (blocking=false: eviction proceeds in the background).
    * Process-wide: in a JVM running several sessions, prefer the
    * session-scoped overload so one pipeline's release cannot evict
    * another's in-flight build-once/search-many index. */
  def release(): Unit = synchronized {
    frames.values.forEach { f =>
      try f.unpersist() catch { case _: Throwable => () }
    }
    frames.clear()
  }

  /** Unpersist only the frames owned by `session`, leaving caches of
    * concurrently-running sessions untouched. */
  def release(session: org.apache.spark.sql.SparkSession): Unit = synchronized {
    val it = frames.entrySet().iterator()
    while (it.hasNext) {
      val f = it.next().getValue
      if (f.sparkSession eq session) {
        try f.unpersist() catch { case _: Throwable => () }
        it.remove()
      }
    }
  }

  /** Currently-tracked frame count (diagnostics/tests). */
  def trackedCount: Int = synchronized(frames.size)
}
