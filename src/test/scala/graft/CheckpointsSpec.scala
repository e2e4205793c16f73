package graft

import org.apache.spark.sql.functions.md5
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Checkpoints

/** Locks for [[Checkpoints.stable]] — the deploy-aware lineage cut
  * the r18 chaos probe forced into existence (CHAOS_r18.md): both
  * paths must truncate lineage (the iterative-loop plan-blowup
  * guarantee), the reliable path must actually write recoverable
  * files (the executor-loss guarantee), and the master switch must
  * classify the in-process master as local.
  */
class CheckpointsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def isLineageCut(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]

  test("both paths cut lineage to a flat LogicalRDD") {
    val src = spark.range(100).select($"id", ($"id" % 7).as("k"))
    val local = Checkpoints.stable(src, reliable = false)
    val rel = Checkpoints.stable(src, reliable = true)
    assert(isLineageCut(local) && isLineageCut(rel),
      "checkpointed plans must be flat — persist-style lineage doubles per loop round")
    assert(local.collect().toSet == rel.collect().toSet)
  }

  test("the reliable path writes files under spark.checkpoint.dir") {
    val dirConf = spark.conf.get("spark.checkpoint.dir")
    val dir = new java.io.File(new java.net.URI(dirConf))
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      if (dir.exists()) walk(dir).map(_.getPath).toSet else Set.empty
    }
    val before = files()
    val df = Checkpoints.stable(
      spark.range(1000).select($"id", md5($"id".cast("string")).as("h")),
      reliable = true)
    assert(df.count() == 1000)
    val added = files() -- before
    assert(added.nonEmpty,
      s"reliable checkpoint must persist recoverable files under $dirConf")
  }

  test("the master switch: in-process test master takes the local path") {
    // TestSpark runs local[4] — sparkContext.isLocal must be true, so
    // the default stable() call picks localCheckpoint here; the
    // reliable path under a REAL fleet is exercised end-to-end by
    // ChaosProbe (CHAOS_r18.md) and the multiexec verify runs
    assert(spark.sparkContext.isLocal)
    val df = Checkpoints.stable(spark.range(10).toDF())
    assert(isLineageCut(df) && df.count() == 10)
  }
}
