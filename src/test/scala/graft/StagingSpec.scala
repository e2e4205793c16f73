package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Staging
import graft.queries.TextQueries

/** Scoped staging lifecycle (Staging.scoped/run): the library-caller
  * contract that no cached block outlives the materializing action —
  * and the harness contract that OUTSIDE a scope, staged() is exactly
  * persist() (Verify/Bench clearCache-per-query behavior unchanged).
  */
class StagingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cacheEmpty: Boolean = spark.sharedState.cacheManager.isEmpty

  test("staged outside any scope is plain persist (caller-owned)") {
    spark.catalog.clearCache()
    val df = Staging.staged(Seq(1, 2, 3).toDF("x"))
    df.count()
    assert(df.storageLevel != StorageLevel.NONE, "must stay cached")
    spark.catalog.clearCache() // the harness's per-query cleanup
    assert(cacheEmpty)
  }

  test("scoped releases every staged frame, success or failure") {
    spark.catalog.clearCache()
    val out = Staging.scoped {
      val a = Staging.staged(Seq(1, 2).toDF("x"))
      val b = Staging.staged(Seq(3).toDF("x"))
      a.union(b).count()
    }
    assert(out == 3L)
    assert(cacheEmpty, "staged frames must not survive the scope")

    intercept[RuntimeException] {
      Staging.scoped {
        Staging.staged(Seq(1).toDF("x")).count()
        throw new RuntimeException("boom")
      }
    }
    assert(cacheEmpty, "failure path must release too")
  }

  test("nested scopes release only their own frames") {
    spark.catalog.clearCache()
    Staging.scoped {
      val outer = Staging.staged(Seq(1).toDF("x"))
      outer.count()
      Staging.scoped {
        val inner = Staging.staged(Seq(2).toDF("x"))
        inner.count()
      }
      assert(outer.storageLevel != StorageLevel.NONE,
        "inner scope must not release the outer frame")
    }
    assert(cacheEmpty)
  }

  test("Staging.run drives a real staging core and leaves zero cached blocks") {
    spark.catalog.clearCache()
    // minhashNearDupCore stages its signature table internally; the
    // library face materializes inside the scope and releases it
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "an entirely different document with its own words here")
    ).toDF("doc_id", "text")
    val pairs = Staging.run(TextQueries.minhashNearDupCore(docs, 1000))(_.collect())
    assert(pairs.nonEmpty, "the exact-duplicate pair must surface")
    assert(cacheEmpty, "no staged block may outlive the action")
  }

  test("Staging.run releases incrementalDedup's staged signature frames (q124)") {
    // the r16 gap: the q124 wrapper's base frame was a bare persist()
    // outside Staging, leaking one cached frame per call even under
    // Staging.run; r17 dropped the text-frame cache entirely (the q84
    // cache-or-recompute rule) — the staged inc/ex signature sets
    // must still release on scope exit
    spark.catalog.clearCache()
    val n = Staging.run(
      TextQueries.incrementalDedup(spark, "/root/testdata/sf0.001"))(_.count())
    assert(n > 0)
    assert(cacheEmpty, "q124's staged frames must not outlive the action")
  }

  test("Staging.run releases the winnow near-dup staging (q113) and substring gram table (q107)") {
    spark.catalog.clearCache()
    val pairs = Staging.run(
      graft.queries.CurationQueries.winnowNearDup(spark, "/root/testdata/sf0.001"))(_.count())
    assert(pairs >= 0)
    assert(cacheEmpty, "q113's fp/fpk staged frames must not outlive the action")
    val sub = Staging.run(
      graft.queries.CurationQueries.substringDedup(spark, "/root/testdata/sf0.001"))(_.count())
    assert(sub > 0)
    assert(cacheEmpty, "q107's gram table must not outlive the action")
  }

  test("Staging.run releases a multi-frame core over real tables (q156)") {
    // ingestionGateBatch stages TWO frames (the slim doc scan and the
    // pre-hashed incoming slice); a scoped run must release both
    spark.catalog.clearCache()
    val n = Staging.run(
      TextQueries.ingestionGateBatch(spark, "/root/testdata/sf0.001"))(_.count())
    assert(n > 0)
    assert(cacheEmpty, "q156's staged frames must not outlive the action")
  }
}
