package graft.core

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec
import graft.dedup.Dedup

class CacheScopeSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      ("d1", "the quick brown fox jumps over the lazy dog"),
      ("d2", "the quick brown fox jumps over the lazy cat"),
      ("d3", "completely different text with no overlap at all"))
      .toDF("doc_id", "text")
  }

  test("withScope releases operator caches after the consuming action") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    val result = CacheScope.withScope { scope =>
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, scope)
      val n = pairs.count() // consuming action inside the scope
      assert(!cm.isEmpty, "shingle table should be cached during the scope")
      n
    }
    assert(result >= 1)
    assert(cm.isEmpty, "scope close must unpersist every retained cache")
  }

  test("session scope keeps legacy behavior (cache survives the call)") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    assert(!cm.isEmpty, "default session scope must not release caches")
    cm.clearCache()
  }

  test("retain applies the requested storage level") {
    CacheScope.withScope { scope =>
      val df = scope.retain(docs, StorageLevel.MEMORY_ONLY)
      assert(df.storageLevel == StorageLevel.MEMORY_ONLY)
    }
  }

  test("close is idempotent and releases on failure paths") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    intercept[RuntimeException] {
      CacheScope.withScope { scope =>
        scope.retain(docs).count()
        throw new RuntimeException("boom")
      }
    }
    assert(cm.isEmpty, "caches must be released when the scope body throws")
  }
}
