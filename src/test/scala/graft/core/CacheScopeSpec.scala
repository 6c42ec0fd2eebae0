package graft.core

import org.apache.spark.storage.StorageLevel
import graft.SparkSpec
import graft.llm.Dedup

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  test("release unpersists every tracked plan and is idempotent") {
    val scope = new CacheScope
    val df = Seq(1, 2, 3).toDF("x")
    val cached = scope.cache(df)
    cached.count()
    assert(cached.storageLevel != StorageLevel.NONE)
    assert(scope.size == 1)
    scope.release()
    assert(cached.storageLevel == StorageLevel.NONE)
    assert(scope.size == 0)
    scope.release() // idempotent
  }

  test("released results stay correct (plans recompute)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "an entirely different document about distributed aggregation"),
    ).toDF("doc_id", "text")
    val scope = new CacheScope
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", scope = scope)
    val before = pairs.collect().toSet
    assert(scope.size >= 2) // shingle base + banded bucket table
    scope.release()
    assert(pairs.collect().toSet == before, "post-release consumption must recompute, not corrupt")
  }

  test("the session scope caches but never accumulates references") {
    val df = Seq(1).toDF("x")
    val cached = CacheScope.session.cache(df)
    assert(CacheScope.session.size == 0)
    cached.unpersist(false)
  }
}
