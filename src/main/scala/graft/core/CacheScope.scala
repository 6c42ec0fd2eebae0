package graft.core

import org.apache.spark.sql.DataFrame

/** Tracks the operator-local `.cache()`s of one logical run so the caller
  * can release them once the (lazily returned) results are consumed.
  *
  * The caching operators (`Dedup.minhashLsh`, `Dedup.ngramJaccard`,
  * `Similarity.lshTopK`, `Similarity.cosineDup`, ...) return LAZY
  * DataFrames built over cached intermediates, so they cannot unpersist
  * before returning — the cache must outlive the call. By default they
  * register their caches with [[CacheScope.session]], which keeps them for
  * the session's lifetime (the round-trip-friendly behavior, and what a
  * one-shot job wants). A long-lived process deduplicating many corpora
  * passes its own scope instead and releases it between runs:
  *
  * {{{
  * val scope = new CacheScope
  * val pairs = Dedup.minhashLsh(docs, "doc_id", "text", scope = scope)
  * pairs.write.parquet(out)   // consume while the caches are warm
  * scope.release()            // then free executor storage memory
  * }}}
  *
  * [[release]] only drops storage: results consumed after it stay CORRECT
  * (the plans recompute), so a forgotten release is a perf bug, never a
  * correctness bug.
  */
final class CacheScope private[core] (track: Boolean) {

  def this() = this(true)

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Cache `df` and remember it for [[release]]. */
  def cache(df: DataFrame): DataFrame = {
    val c = df.cache()
    if (track) synchronized { tracked += c }
    c
  }

  /** Unpersist every tracked plan (non-blocking) and forget it. Idempotent. */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }

  /** Number of plans currently tracked (diagnostics/tests). */
  def size: Int = synchronized(tracked.size)
}

object CacheScope {
  /** The default scope: caches live until the session drops them
    * (`spark.catalog.clearCache()` or session stop). Deliberately
    * untracked, so the singleton never accumulates references across a
    * long-lived process.
    */
  val session: CacheScope = new CacheScope(false)
}
