package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with total and
  * per-query wall seconds at SPARK_GRAFT_SF_DIR.
  *
  * Methodology: one warmup pass (JIT + codegen + shuffle-service warm)
  * whose times seed the measurement, two more timed passes (min-of-3
  * total; sub-0.3 s-warmup queries take one — they cannot move the 2×
  * bar), outlier re-measure via [[BenchCore]], a hard wall-clock
  * budget (SPARK_GRAFT_BENCH_BUDGET_S, default 1400 s), and
  * incremental JSON persistence after every sample. Every run also
  * records its process-CPU delta: the JSON carries per-query "cpu"
  * (the CPU seconds of the pass that produced the min) and
  * "cpu_passes", so a slow entry is attributable to plan compute vs
  * a loaded box without a rerun. The sf1 scale probe (warmup + 1
  * pass + ratio-alarm confirms, [[BenchCore.probeMeasure]]) persists
  * per-entry samples/spread_all/pass counts (spread_all includes the
  * seeded warmup, unlike the corpus "spread" — the probe seed runs
  * in a warm JVM), names all-runs-failed entries in "failed" and
  * budget-cut ones in "truncated" (value maps hold only measured
  * entries), and records the budget left at its start/end, so a
  * superlinear number in the artifact is re-measured evidence, never
  * a budget-truncated single sample. Each query is forced through the
  * noop sink so every column is materialized (a bare count() would
  * let Catalyst prune the computation being measured).
  */
object Bench {
  /** sf1 probe set: the most expensive queries AND the fastest-growing
    * ones from the full SCALE_PROBE audit (q88 9.2x, q26 8.5x on 10x
    * data) — a superlinear drift shows here first. BenchSpec asserts
    * every entry resolves against SparkEntry.queries so a rename can't
    * silently shrink the probe.
    */
  val probeNames: Seq[String] = Seq("q26_simhash_near_dup",
    "q80_ivf_multiprobe", "q81_option_data_to_save", "q82_dedup_clusters",
    "q83_semantic_dedup", "q86_bm25_topk", "q87_bloom_decontaminate",
    "q88_stream_stream_join", "q93_asof_forward", "q94_asof_tolerance",
    "q96_image_decode",
    // the q88 mitigation pair and the bucketized range join: cheap at
    // sf1, and a superlinear drift in any of them means the skew story
    // (SCALE_PROBE.md round-11 table) no longer holds
    "q99_error_window_join", "q100_bucketed_interval_count",
    "q103_capped_interval_join",
    // round 11: the substring-dedup gram index, the winnow-sketch
    // candidate self-join, and the DSIR double-scan are the newest
    // full-corpus-shuffle queries — the class whose sf1 ratio matters
    "q107_substring_dedup", "q113_winnow_near_dup", "q114_dsir_resample",
    // round 13: the hybrid-retrieval fusion (two bounded candidate
    // lists — its sf1 ratio should track the corpus scan, not the
    // fusion) and the PQ pipeline (training is sample-bound; encode +
    // ADC is the corpus-linear part)
    "q122_hybrid_rrf", "q123_pq_adc_search",
    // round 13 (late): retention composes the LSH pair + component
    // machinery end-to-end (the heaviest dedup chain), and the
    // edit-distance dedup's prefix blocks must stay capped — both
    // would show any quadratic drift here first
    "q128_dedup_retention", "q134_edit_distance_dedup",
    // round 14: the calibration audit was the costliest sf0.1 query
    // pre-slim; its sf1 ratio now guards both the band-bucket cap and
    // the candidate-bounded shingle refetch
    "q147_minhash_calibration",
    // round 15: the leakage-safe split is now the heaviest corpus
    // query and composes the newest machinery end-to-end (LSH pairs ∪
    // exact-md5 star edges → pointer-doubled components → fold hash) —
    // a superlinear drift in any of those parts shows here first
    "q102_leakage_safe_split",
    // round 16: chunk retrieval was the cluster-profile probe's worst
    // coalescing casualty (31.6 s serialized -> 4.7 s after the
    // spread + literal-df rework); its ratio now guards the chunker
    // spread and the bounded-collect scoring shape
    "q125_chunk_retrieval",
    // round 18: the streaming LSH gate's batch face — its ratio
    // guards the stream-static anti-join + windowed all-bands check
    // over the full band index (and the corpus-side kernel spread)
    "q159_neardup_gate",
    // round 19: the composed IVFADC index — assignment/encode must
    // stay one map-only corpus scan (both quantizers enter as
    // literals), so its sf1 ratio guards the whole literal-index
    // discipline; scoring is cell-restricted (~nprobe/nlist)
    "q160_ivfpq_search",
    // round 19: the global shuffle's per-shard rank is the newest
    // corpus-wide window — its ratio guards the derived-k shard
    // bound (k floors at 8 across probe scales, so the window
    // partition grows with the corpus here; sub-linear wall means
    // the 8-task sort is not yet the bottleneck, and past 8·100k
    // docs k itself grows)
    "q161_training_shuffle",
    // round 18 (driver): the two compute-densest crawl extractions —
    // the HTML strip is ~20 regex passes/row and the BPE apply an
    // O(word²·merges) worst-case loop; both must stay linear map-only
    // scans, so their sf1 ratio guards the kernel-spread shape (the
    // URL family rides the same scan and is strictly cheaper)
    "q162_html_extract", "q164_bpe_apply",
    // round 19 (driver): the tokenizer lifecycle — training's corpus
    // cost is ONE word-frequency aggregation (rounds are vocab-bound,
    // so the end-to-end q168 ratio should track the two corpus scans
    // and stay far below 10×), and the quality classifier must stay a
    // single codegen scan (the q110 class)
    "q167_quality_classifier", "q168_bpe_pipeline",
    // round 20: the two new corpus-wide compute shapes — embedding
    // inference × the broadcast-kNN candidate fan-out (corpus-linear
    // × |query set|, the q30 class with engine-produced vectors), and
    // the exact-substring gram index (the q107 shuffle class plus the
    // occurrence-level join-back and per-doc reassembly). q171's
    // bench cost is dominated by the fixture-writer scaffolding (not
    // the scan under test) and q172 is q168 + bounded catalog I/O —
    // both stay out, guarded by q162/q168's ratios
    "q170_embed_knn", "q173_exact_substring_remove")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = SessionDefaults.master(cpus)
    val spark = SessionDefaults.masterConfigs(master).foldLeft(
      SessionDefaults(SparkSession.builder()
        .master(master))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Deployment-independent CPU attribution (and shuffle-transport
    // evidence) via task metrics — see TaskMetricsProbe for why the
    // process clock alone is blind under a forked-executor master.
    val taskMetrics = TaskMetricsProbe.install(spark)

    // Optional args: query names to bench (default: all). Unknown
    // names are a hard error — a misspelled filter would otherwise
    // silently bench nothing.
    val wanted = args.toSet
    val unknown = wanted -- SparkEntry.queries.keySet
    if (unknown.nonEmpty) {
      System.err.println(s"[bench] unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }

    // Each run also measures its process-CPU delta (BenchCore
    // .processCpuSeconds) so a slow pass in the artifact is
    // attributable to plan vs box without a rerun; single-threaded
    // harness, so one mutable slot carries the last run's CPU to the
    // caller that records it next to the wall sample.
    var lastRunCpuS: Double = -1.0
    var lastRunTaskCpuS: Double = -1.0
    // Plan-inspection slots, refreshed per run (see cpu_race_flags):
    // multi-consumer caches in the final plan, and — checked BEFORE
    // execution, when it is meaningful — the ones unmaterialized at
    // build time (the q84-class race precondition).
    var lastMultiUseCache = false
    var lastUnpinned: Seq[String] = Nil
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String = sfDir): Double = {
      // boundary snapshot: drain the async listener bus so the delta
      // holds exactly this run's tasks (drain cost sits OUTSIDE the
      // timed window on both ends)
      TaskMetricsProbe.drain(spark)
      val tm0 = taskMetrics.snapshot()
      val c0 = BenchCore.processCpuSeconds()
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, dir)
        lastUnpinned = graft.operators.Staging.unpinnedMultiUse(df)
        // ordered materialization INSIDE the timed window (building
        // the staged tables is part of the query's cost): one
        // sequential job per multi-consumer cache pins the
        // deterministic low-CPU mode the per-core blocking-count
        // discipline achieved by hand — no concurrent stage can race
        // an unbuilt cache into a duplicate kernel recompute.
        // SPARK_GRAFT_PIN=0 disables it for A/B runs only.
        if (sys.env.getOrElse("SPARK_GRAFT_PIN", "1") != "0")
          graft.operators.Staging.pinCaches(df)
        df.write.format("noop").mode("overwrite").save()
        val c1 = BenchCore.processCpuSeconds()
        lastRunCpuS = if (c0 < 0 || c1 < 0) -1.0 else c1 - c0
        val wall = (System.nanoTime() - t0) / 1e9
        TaskMetricsProbe.drain(spark)
        lastRunTaskCpuS = (taskMetrics.snapshot() - tm0).cpuS
        // occurrence count is stable across execution; checked outside
        // the timed window
        lastMultiUseCache = graft.operators.Staging.cacheUse(df).exists(_._2 >= 2)
        wall
      } catch { case _: Throwable =>
        lastRunCpuS = -1.0
        lastRunTaskCpuS = -1.0
        -1.0
      }
    }

    // Hard wall-clock budget (BENCH_r11 died rc=124 with NOTHING
    // written because the full corpus + probe overran the driver's
    // timeout and the JSON only landed at the end). The deadline is
    // consulted before every individual run; whatever samples exist
    // when it trips are summarized and persisted.
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1400").toDouble
    val deadlineNanos = System.nanoTime() + (budgetS * 1e9).toLong
    val outOfBudget = () => System.nanoTime() > deadlineNanos

    // Incremental persistence: after EVERY sample, rewrite the output
    // JSON with min-so-far per query (marked "partial":true), so a
    // driver-side kill costs only the tail, never the whole artifact.
    val out = java.nio.file.Paths.get("target", "bench_full.json")
    java.nio.file.Files.createDirectories(out.getParent)
    val samplesSoFar = collection.mutable.LinkedHashMap[String, Vector[Double]]()
    def persistPartial(): Unit = {
      val qs = samplesSoFar.toSeq.collect { case (n, ss) if ss.exists(_ >= 0) =>
        "\"" + n + "\":" + ss.filter(_ >= 0).min
      }.mkString("{", ",", "}")
      val partial = s"""{"metric":"total","value":-1,"unit":"sec","partial":true,"queries":$qs,"sf":"$sfDir"}"""
      java.nio.file.Files.write(out, partial.getBytes("UTF-8"))
    }

    // Warmup pass (JIT + codegen + shuffle-service warm; cache cleared
    // per query so persists don't accumulate). The times feed into
    // measure() as each query's first sample — min-of-3 at the cost of
    // two timed passes. Deadline-gated PER QUERY (a takeWhile over the
    // strict Seq would evaluate every predicate before any warmup ran
    // and then run them all ungated).
    // CPU samples, positionally aligned with each query's wall-sample
    // list as BenchCore.measure assembles it (valid seed first, then
    // timed passes and reruns) — a FAILED warmup is skipped here
    // exactly as measure() drops it from the sample list.
    val cpuSoFar = collection.mutable.LinkedHashMap[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    // Task-metric CPU, same positional alignment as cpuSoFar (see
    // TaskMetricsProbe: the process clock and the task clock diverge
    // exactly when the master forks executors).
    val taskCpuSoFar = collection.mutable.LinkedHashMap[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val multiUse = collection.mutable.LinkedHashMap[String, Boolean]()
      .withDefaultValue(false)
    val unpinned = collection.mutable.LinkedHashMap[String, Seq[String]]()
    // queries whose warmup produced a valid seed sample — their cpu
    // vector starts with the seed, so race analysis drops slot 0;
    // a failed-warmup query's vector holds timed passes only
    val seeded = collection.mutable.Set[String]()
    // plan diagnostics refresh on EVERY successful pass (a query whose
    // warmup failed would otherwise never surface in cpu_race_flags /
    // unpinned_caches no matter how its timed passes behave)
    def recordDiagnostics(name: String): Unit = {
      multiUse(name) = lastMultiUseCache
      if (lastUnpinned.nonEmpty) unpinned(name) = lastUnpinned
    }
    val warm = queries.flatMap { case (name, fn) =>
      if (outOfBudget()) None
      else {
        val t = runOnce(fn); spark.catalog.clearCache()
        samplesSoFar(name) = Vector(t); persistPartial()
        if (t >= 0) {
          seeded += name
          cpuSoFar(name) = Vector(lastRunCpuS)
          taskCpuSoFar(name) = Vector(lastRunTaskCpuS)
          recordDiagnostics(name)
        }
        Some(name -> t)
      }
    }.toMap

    // Timed passes keep the per-query minimum (robust against
    // transient co-tenant load and GC pauses; observed swings >40%
    // between whole runs on this box), and BenchCore re-measures any
    // query whose pass spread exceeds 3x its min — so a future
    // regression flag must survive a clean re-measure before anyone
    // bisects it.
    val fns = queries.toMap
    def timedRun(name: String): Double = {
      val sec = runOnce(fns(name))
      spark.catalog.clearCache()
      samplesSoFar(name) = samplesSoFar.getOrElse(name, Vector.empty) :+ sec
      cpuSoFar(name) = cpuSoFar(name) :+ lastRunCpuS
      taskCpuSoFar(name) = taskCpuSoFar(name) :+ lastRunTaskCpuS
      if (sec >= 0) recordDiagnostics(name)
      persistPartial()
      sec
    }
    // quickThresholdS: a query whose warmup came in sub-0.3 s takes one
    // timed pass, not two — it cannot move the 2x headline bar, and the
    // saved wall time is exactly the headroom the sf1 probe below needs
    // to never again be budget-truncated into a noisy artifact (r13).
    val measured = BenchCore.measure(queries.map(_._1), timedRun,
      seed = warm, outOfBudget = outOfBudget, quickThresholdS = 0.3)
    val results = queries.map { case (name, _) => name -> measured(name).min }

    // Value maps carry only MEASURED entries (the probe section's
    // rule, applied to the corpus too): a query whose every run
    // failed (min = -1) is named in "failed", a budget-cut one in
    // "truncated" — neither leaks a -1 into queries/spread/cpu
    // unmarked. The raw passes/cpu_passes logs keep every sample,
    // including failed (-1) ones, on purpose.
    def measuredOk(k: String): Boolean =
      !measured(k).truncated && measured(k).min >= 0
    val qs = results.collect { case (k, v) if measuredOk(k) =>
      "\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    // Every raw sample per query (3 passes + any outlier reruns), so a
    // reader can see run-to-run noise directly instead of inferring it
    // from the min — a loaded box shows one inflated slot, a plan
    // regression shows consistent slowness; spread/reruns summarize it.
    val ps = queries.map { case (name, _) =>
      "\"" + name + "\":[" + measured(name).samples.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val spreads = queries.collect { case (name, _) if measuredOk(name) =>
      "\"" + name + "\":" + BenchCore.jnum(measured(name).spread, 3)
    }.mkString("{", ",", "}")
    val reruns = queries.collect { case (name, _) if measured(name).reruns > 0 =>
      "\"" + name + "\":" + measured(name).reruns
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum

    // 10x scale-probe section: when the sf1 dataset exists (generated
    // by tools/gen_sf1.py into probe_data/sf1 — NOT under target/,
    // which sbt clean wipes) and this run isn't already at sf1,
    // re-bench the heavy subset there so every bench JSON carries a
    // second scale point — a superlinear plan shows up as a ratio far
    // above the 10x input growth instead of hiding until an audit.
    // Skipped for filtered (arg-driven A/B) runs.
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "probe_data/sf1")
    // A renamed/removed query must fail loudly, not silently shrink the
    // probe (BenchSpec enforces the same invariant at test time).
    val missingProbe = probeNames.filterNot(SparkEntry.queries.keySet)
    require(missingProbe.isEmpty,
      s"sf1 probe names not registered in SparkEntry.queries: " +
        missingProbe.mkString(", "))
    def budgetLeftS: Double = (deadlineNanos - System.nanoTime()) / 1e9
    val sf1Section =
      if (wanted.nonEmpty || outOfBudget() ||
          !new java.io.File(sf1Dir, "documents.parquet").exists() ||
          new java.io.File(sfDir).getCanonicalPath ==
            new java.io.File(sf1Dir).getCanonicalPath) ""
      else {
        val probe = SparkEntry.queries.toSeq.sortBy(_._1)
          .filter { case (n, _) => probeNames.contains(n) }
        val budgetAtStart = budgetLeftS
        // Probe warmups seed the probe measure too, and the SAME
        // deadline governs every probe run — the probe is a ratio
        // check, so a budget-truncated probe (fewer entries) is still
        // useful where a blown driver timeout is not. Gated per entry
        // (not takeWhile: on a strict Seq the predicates all evaluate
        // before the first warmup runs).
        val pCpu = collection.mutable.LinkedHashMap[String, Vector[Double]]()
          .withDefaultValue(Vector.empty)
        val pTaskCpu = collection.mutable.LinkedHashMap[String, Vector[Double]]()
          .withDefaultValue(Vector.empty)
        val pWarm = probe.flatMap { case (name, fn) =>
          if (outOfBudget()) None
          else {
            val t = runOnce(fn, sf1Dir); spark.catalog.clearCache()
            if (t >= 0) {
              pCpu(name) = Vector(lastRunCpuS)
              pTaskCpu(name) = Vector(lastRunTaskCpuS)
            }
            Some(name -> t)
          }
        }.toMap
        val pFns = probe.toMap
        def probeRun(name: String): Double = {
          val sec = runOnce(pFns(name), sf1Dir)
          spark.catalog.clearCache()
          pCpu(name) = pCpu(name) :+ lastRunCpuS
          pTaskCpu(name) = pTaskCpu(name) :+ lastRunTaskCpuS
          sec
        }
        // warmup + 1 timed pass per entry; any entry whose best still
        // exceeds 10x its same-run sf0.1 min gets confirmation passes
        // (BenchCore.probeMeasure) — a superlinear number in this
        // artifact has survived re-measurement, and every sample,
        // spread and pass count is persisted so a reader can tell box
        // noise from plan drift (the r13 40.5x lesson).
        val pMeasured = BenchCore.probeMeasure(probe.map(_._1), probeRun,
          baseline = results.toMap, ratioAlarm = 10.0,
          outOfBudget = outOfBudget, seed = pWarm)
        // Output-row count per entry (one count() job each, budget-
        // gated): a wall ratio alone cannot distinguish "superlinear
        // plan" from "the OUTPUT grew superlinearly" — q88's standing
        // 3.2x is pair-output growth, and cost-per-output-row is the
        // machine-readable way the artifact says so instead of a prose
        // re-explanation each round.
        val pRows = probe.flatMap { case (name, fn) =>
          if (outOfBudget()) None
          else {
            val n = try fn(spark, sf1Dir).count() catch { case _: Throwable => -1L }
            spark.catalog.clearCache()
            if (n >= 0) Some(name -> n) else None
          }
        }.toMap
        // Value fields carry only MEASURED entries: a probe whose
        // every run failed (min = -1) is named in "failed", a probe
        // the budget cut before any sample in "truncated" — neither
        // may leak a -1 into the queries/ratio maps unmarked.
        def pField(f: (String, BenchCore.ProbeResult) => String): String =
          probe.collect { case (name, _)
              if !pMeasured(name).truncated && pMeasured(name).min >= 0 =>
            "\"" + name + "\":" + f(name, pMeasured(name))
          }.mkString("{", ",", "}")
        val pq = pField((_, r) => r.min.toString)
        val pRatio = pField((_, r) => BenchCore.jnum(r.ratio, 2))
        // "spread_all", not "spread": unlike the corpus section's
        // spread (timed passes only, seed excluded), the probe spread
        // includes the seeded warmup — the probe runs in a warm JVM,
        // so its seed is a real sample; the name records the
        // difference in semantics.
        val pSpread = pField((_, r) => BenchCore.jnum(r.spread, 3))
        val pPasses = pField((_, r) => r.samples.size.toString)
        val pSamples = pField((_, r) => r.samples.mkString("[", ",", "]"))
        val pCpuOfMin = pField((n, r) =>
          BenchCore.jnum(BenchCore.cpuOfMin(r.samples, pCpu(n)), 3))
        val pTaskCpuOfMin = pField((n, r) =>
          BenchCore.jnum(BenchCore.cpuOfMin(r.samples, pTaskCpu(n)), 3))
        val pTrunc = probe.collect { case (name, _) if pMeasured(name).truncated =>
          "\"" + name + "\""
        }.mkString("[", ",", "]")
        val pFailed = probe.collect { case (name, _)
            if !pMeasured(name).truncated && pMeasured(name).min < 0 =>
          "\"" + name + "\""
        }.mkString("[", ",", "]")
        // rows_out obeys the same measured-entries invariant as every
        // other value field: a probe whose timed runs all failed or
        // were truncated must not surface a successful count() as if
        // it had been measured.
        val pRowsJson = probe.collect { case (name, _)
            if pRows.contains(name) &&
              !pMeasured(name).truncated && pMeasured(name).min >= 0 =>
          "\"" + name + "\":" + pRows(name)
        }.mkString("{", ",", "}")
        s""","sf1":{"dir":"$sf1Dir","budget_left_start_s":${BenchCore.jnum(budgetAtStart, 1)},""" +
          s""""queries":$pq,"ratio":$pRatio,"spread_all":$pSpread,""" +
          s""""passes":$pPasses,"samples":$pSamples,"cpu":$pCpuOfMin,""" +
          s""""cpu_task":$pTaskCpuOfMin,""" +
          s""""rows_out":$pRowsJson,"truncated":$pTrunc,"failed":$pFailed,""" +
          s""""budget_left_end_s":${BenchCore.jnum(budgetLeftS, 1)}}"""
      }

    val rerunsField = if (reruns == "{}") "" else s""","reruns":$reruns"""
    // Budget-truncated queries (no samples at all) are UNMEASURED, not
    // broken — named separately so a -1 never masquerades as a failure.
    val truncated = queries.collect { case (name, _) if measured(name).truncated =>
      "\"" + name + "\""
    }.mkString("[", ",", "]")
    val truncatedField = if (truncated == "[]") "" else s""","truncated":$truncated"""
    // All-runs-failed queries (min = -1, not budget-cut) — excluded
    // from the value maps above, named here.
    val failed = queries.collect { case (name, _)
        if !measured(name).truncated && measured(name).min < 0 =>
      "\"" + name + "\""
    }.mkString("[", ",", "]")
    val failedField = if (failed == "[]") "" else s""","failed":$failed"""
    // Per-query process-CPU seconds of the pass that produced the min
    // (cpu ≈ wall × busy-cores → plan compute; cpu ≪ that → box/IO),
    // plus every per-pass CPU sample aligned with "passes".
    val cpuMin = queries.collect { case (name, _) if measuredOk(name) =>
      "\"" + name + "\":" +
        BenchCore.jnum(BenchCore.cpuOfMin(measured(name).samples, cpuSoFar(name)), 3)
    }.mkString("{", ",", "}")
    val cpuPasses = queries.map { case (name, _) =>
      "\"" + name + "\":[" + cpuSoFar(name).map(c => BenchCore.jnum(c, 3)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // Task-metric CPU of the min pass + every pass, aligned exactly
    // like cpu/cpu_passes. On local[n] cpu_task ≈ cpu minus harness
    // threads; under a forked-executor master cpu_task is the ONLY
    // valid plan-CPU attribution (cpu collapses to driver overhead).
    val cpuTaskMin = queries.collect { case (name, _) if measuredOk(name) =>
      "\"" + name + "\":" +
        BenchCore.jnum(BenchCore.cpuOfMin(measured(name).samples, taskCpuSoFar(name)), 3)
    }.mkString("{", ",", "}")
    val cpuTaskPasses = queries.map { case (name, _) =>
      "\"" + name + "\":[" + taskCpuSoFar(name).map(c => BenchCore.jnum(c, 3)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // The q84-class race, machine-visible (r16 verdict #4): queries
    // whose warm CPU passes spread >1.5x (gap >5s) WITH a
    // multi-consumer cache in the plan. Since pinCaches runs in every
    // timed pass, a firing here is box contention or a pinning gap —
    // the shortlist for an isolated re-measure. "unpinned_caches"
    // records which query plans REQUIRED pinning (pure cores whose
    // caches pinCaches built); RaceDisciplineSpec asserts the pinned
    // plans are race-free for every query. BOTH cpu series feed the
    // flag: under a forked-executor master the process clock collapses
    // to driver overhead (a race there would be invisible to it), so
    // the task-metric series carries the detection; in local mode the
    // process series additionally sees driver-side compute.
    val raceFlags = queries.collect { case (name, _)
        if Seq(cpuSoFar(name), taskCpuSoFar(name)).exists(series =>
          BenchCore.cpuRaceFlag(
            if (seeded(name)) series.drop(1) else series,
            multiUse(name))) =>
      "\"" + name + "\""
    }.mkString("[", ",", "]")
    val raceField = if (raceFlags == "[]") "" else s""","cpu_race_flags":$raceFlags"""
    val unpinnedJson = unpinned.map { case (name, caches) =>
      "\"" + name + "\":[" +
        caches.map(BenchCore.jstr).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val unpinnedField = if (unpinnedJson == "{}") "" else s""","unpinned_caches":$unpinnedJson"""
    // Whole-run shuffle transport totals (all passes, warmups and the
    // probe included): remote vs local read bytes split by the
    // BlockManager locality of the fetch. remote_mb > 0 is the
    // machine-readable attestation that this run moved shuffle blocks
    // between executor JVMs over the wire — impossible on local[n],
    // expected under local-cluster.
    TaskMetricsProbe.drain(spark)
    val tmTotal = taskMetrics.snapshot()
    val shuffleField =
      s""","shuffle":{"remote_mb":${BenchCore.jnum(tmTotal.remoteShuffleBytes / 1048576.0, 1)},""" +
        s""""local_mb":${BenchCore.jnum(tmTotal.localShuffleBytes / 1048576.0, 1)},""" +
        s""""tasks":${tmTotal.tasks}}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","master":${BenchCore.jstr(master)},"queries":$qs,"passes":$ps,"spread":$spreads,"cpu":$cpuMin,"cpu_passes":$cpuPasses,"cpu_task":$cpuTaskMin,"cpu_task_passes":$cpuTaskPasses$rerunsField$truncatedField$failedField$raceField$unpinnedField$shuffleField,"sf":"$sfDir"$sf1Section}"""
    println(json)
    // The console line can be lost to log-tail truncation (one line per
    // 114 queries is long); persist the identical JSON where the driver
    // and later rounds can always read it.
    java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    SessionDefaults.stopAndReap(spark)
  }
}
