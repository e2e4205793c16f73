package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CurationQueries

/** Executes q161's PRODUCTION write shape — the claim the q161
  * docstring previously only stated: `partitionBy(shard) +
  * sortWithinPartitions(pos)` writes every shard as a file whose rows
  * are contiguous in training order, with NO global exchange beyond
  * the window's own hash shuffle (the presentation `orderBy` in the
  * registered gate query is NOT part of the operator).
  *
  * Why this holds at any scale: the per-shard rank window hash-
  * partitions by `shard` and sorts (shard, h) within partitions, so
  * rows already stand in (shard, pos) order when the writer sees them
  * — the local sort is eliminated, no range exchange is ever needed,
  * and each shard lands in exactly one task's output file.
  */
class ShardWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q161 production write: per-file contiguous order, no global exchange") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val k = 8L
    val assigned = CurationQueries.shardAssignment(docs, k)
      .sortWithinPartitions("shard", "pos")

    // plan shape: the window's hash shuffle is the ONLY exchange —
    // a global orderBy would show as Exchange rangepartitioning
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange rangepartitioning"),
      s"production shard write must not globally sort:\n${p.take(600)}")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected only the window's shuffle, saw $hashEx:\n${p.take(600)}")

    val out = Files.createTempDirectory("shard_write").toString
    assigned.write.partitionBy("shard").mode("overwrite").parquet(out)

    val shardDirs = (0L until k).map(s => Paths.get(out, s"shard=$s"))
    assert(shardDirs.forall(Files.isDirectory(_)), "every shard must materialize")

    var total = 0L
    shardDirs.zipWithIndex.foreach { case (d, s) =>
      val listing = Files.list(d)
      val files = try listing.toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).sorted
      finally listing.close()
      assert(files.length == 1,
        s"shard $s: expected ONE file (one owning task), got ${files.length}")
      // row order INSIDE the file is the training order: pos must be
      // exactly 1..n in read order, no sort at read time
      val pos = spark.read.parquet(files.head)
        .select("pos").collect().map(_.getLong(0)).toSeq
      assert(pos == (1L to pos.length), s"shard $s not contiguous: ${pos.take(10)}...")
      total += pos.length
    }
    assert(total == docs.count(), "every document lands in exactly one shard")

    // and the logical permutation matches the gate query's content
    val viaGate = CurationQueries.trainingShuffle(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaWrite = spark.read.parquet(out)
      // partition-dir column comes back type-inferred (int) — recast
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("shard").cast("long"),
        org.apache.spark.sql.functions.col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaGate == viaWrite, "write shape must preserve the assignment")
  }
}
