package graft

import org.apache.spark.sql.SparkSession

import graft.operators.BpeTrainer

/** Vocab-scale attestation of the r20 batched BPE trainer (a `main`,
  * like [[StarProbe]]): the r19 verdict's named limit was per-merge
  * round structure — 2 Spark jobs + 1 checkpoint write PER MERGE, so
  * a production 32k–50k-merge training is ~100k sequential jobs. The
  * restructured [[BpeTrainer]] batches greedy-EXACT merge sets per
  * round (BpeTrainerSpec pins batched ≡ sequential) and cuts lineage
  * on a cadence; this probe measures the two claims that make that a
  * vocab-scale fix, at `nMerges` two orders of magnitude past the
  * 12-merge oracle fixtures:
  *
  *  1. per-ROUND cost is FLAT in round number (the vocab frame the
  *     rounds scan does not grow; lineage cuts keep plan depth
  *     bounded) — reported as mean wall of the first vs last round
  *     quartile;
  *  2. per-MERGE cost drops by the measured batch factor — reported
  *     as rounds vs merges plus an A/B against the sequential
  *     (`maxBatch=1, checkpointEvery=1`) structure at `abMerges`
  *     merges of the SAME corpus.
  *
  * Prints ONE JSON line:
  * {"sf_dir":…,"n_merges":…,"merges_learned":…,"rounds":…,
  *  "merges_per_round":…,"wall_s":…,"round_ms_q1":…,"round_ms_q4":…,
  *  "ab_merges":…,"ab_seq_s":…,"ab_batched_s":…,"ab_speedup":…,
  *  "ab_equal":…}
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nMerges = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val abMerges = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The synthetic documents corpus draws from a 31-word vocabulary —
    // it EXHAUSTS near 89 merges (every word one token), far short of
    // a 256-merge headline. Widen the vocabulary deterministically
    // from the same testdata: entity-name columns contribute ~10³
    // distinct digit-bearing words (Customer#000000042 …), the shape
    // that keeps hundreds of merges learnable and lets token-disjoint
    // digit pairs batch.
    val docs = Tables.load(spark, sfDir, "documents").select("text")
      .unionByName(Tables.load(spark, sfDir, "customer")
        .selectExpr("c_name AS text"))
      .unionByName(Tables.load(spark, sfDir, "part")
        .selectExpr("p_name AS text"))
      .unionByName(Tables.load(spark, sfDir, "supplier")
        .selectExpr("s_name AS text"))

    // headline: nMerges with production-shaped settings, per-round walls
    val rounds = scala.collection.mutable.ListBuffer.empty[BpeTrainer.RoundStats]
    val t0 = System.nanoTime()
    val learned = BpeTrainer.learn(docs, "text", nMerges, onRound = rounds += _)
    val wallS = (System.nanoTime() - t0) / 1e9
    graft.operators.Checkpoints.free(learned.vocab)
    val walls = rounds.map(_.wallMs).toSeq
    val q = math.max(walls.size / 4, 1)
    def mean(xs: Seq[Long]): Double =
      if (xs.isEmpty) 0.0 else xs.sum.toDouble / xs.size

    // A/B: the r19 per-merge structure vs the r20 batched one.
    // min-of-2, cells interleaved — single-shot walls on this box
    // swing ±2x with JIT/GC phase (the SkewAqeProbe discipline)
    def run(maxBatch: Int, cadence: Int): (Double, Seq[(String, String, Long)]) = {
      val s = System.nanoTime()
      val l = BpeTrainer.learn(docs, "text", abMerges,
        maxBatch = maxBatch, checkpointEvery = cadence)
      graft.operators.Checkpoints.free(l.vocab)
      ((System.nanoTime() - s) / 1e9, l.merges)
    }
    val cells = (1 to 2).map { _ =>
      (run(1, 1), run(1, 4), run(16, 4))
    }
    val (seqS, seqMerges) = cells.map(_._1).minBy(_._1)
    val (cadS, cadMerges) = cells.map(_._2).minBy(_._1)
    val (batS, batMerges) = cells.map(_._3).minBy(_._1)

    println(
      s"""{"sf_dir":"$sfDir","n_merges":$nMerges,""" +
      s""""merges_learned":${learned.merges.size},"rounds":${rounds.size},""" +
      f""""merges_per_round":${learned.merges.size.toDouble / math.max(rounds.size, 1)}%.2f,""" +
      f""""wall_s":$wallS%.1f,""" +
      f""""round_ms_q1":${mean(walls.take(q))}%.0f,""" +
      f""""round_ms_q4":${mean(walls.takeRight(q))}%.0f,""" +
      s""""ab_merges":$abMerges,""" +
      f""""ab_seq_s":$seqS%.1f,"ab_cadence_s":$cadS%.1f,""" +
      f""""ab_batched_s":$batS%.1f,""" +
      f""""ab_speedup":${seqS / batS}%.2f,""" +
      s""""ab_equal":${seqMerges == batMerges && cadMerges == batMerges}}""")
    spark.stop()
  }
}
