package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries._

/** Plan-shape assertions — the 100 TB design contract, enforced in CI:
  * filters reach the parquet scan, small dims broadcast, the resample
  * is one hash aggregation (no window shuffle), codegen covers the hot
  * path. A regression here is a scale bug even when results stay
  * correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = plan(RelationalQueries.pricingSummary(spark, dir))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("q01: only referenced columns are read") {
    val p = plan(RelationalQueries.pricingSummary(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema) // pruned
    assert(readSchema.contains("l_quantity"))
  }

  test("q03: dimension joins are broadcast, not shuffled") {
    val p = plan(RelationalQueries.revenueByRegion(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q10 resample: aggregation with partial combine, no window operator") {
    val p = plan(TimeSeriesQueries.resampleOhlc1h(spark, dir))
    assert(!p.contains("Window"), "resample must not need a window shuffle")
    // min_by/max_by carry a struct buffer -> SortAggregate; what
    // matters at scale is partial aggregation before ONE exchange
    assert(p.contains("Aggregate"), p)
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one data shuffle, plan:\n$p")
  }

  test("q11 dedup: aggregation-based (partial combine), no row_number window") {
    val p = plan(TimeSeriesQueries.dedupKeepLastQ(spark, dir))
    assert(!p.contains("Window"), "keep-last dedup must use max_by aggregation")
  }

  test("q12/q93/q94 as-of joins: one shuffle on the key, no cartesian/range join") {
    for (q <- Seq(TimeSeriesQueries.asofClickPurchase(spark, dir),
        TimeSeriesQueries.asofNextPurchase(spark, dir),
        TimeSeriesQueries.asofTolerance(spark, dir),
        TimeSeriesQueries.asofByChannel(spark, dir),
        TimeSeriesQueries.asofNearest(spark, dir))) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), p.take(300))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(300))
      // direction flip and tolerance must not add a join: the as-of
      // stays a union + ONE window pass
      assert(!p.contains("SortMergeJoin"), p.take(300))
      // ... and that one pass must run on the INCREMENTAL frame:
      // Spark evaluates [CURRENT ROW, UNBOUNDED FOLLOWING] by
      // re-aggregating the tail for every row — O(n²) on a hot key —
      // so the forward direction must scan descending instead of
      // flipping the frame
      assert(!p.toLowerCase.contains("unboundedfollowing"),
        "as-of join must never use the quadratic UnboundedFollowing frame")
      // the as-of itself contributes exactly ONE key shuffle (the
      // union partitioned on __k); the dedup prep and the final ORDER
      // BY have their own exchanges, so count only the operator's key
      val asofExchanges = p.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(__k"))
      assert(asofExchanges == 1,
        s"as-of join must shuffle once on its key, saw $asofExchanges:\n${p.take(800)}")
    }
  }

  test("whole-stage codegen covers the scan+filter+project hot path") {
    val df = TimeSeriesQueries.businessHoursDaily(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen subtree"), p.take(500))
  }

  test("q14: events time-range predicate reaches the parquet scan") {
    val p = plan(TimeSeriesQueries.businessHoursDaily(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,") ||
      p.contains("GreaterThanOrEqual(ts,"), p)
  }

  test("q30 knn: query side broadcast against a single corpus pass") {
    val p = plan(SimilarityQueries.knnBruteForce(spark, dir))
    assert(p.contains("Broadcast"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q55 median: percentile_disc aggregate, no whole-table window sort") {
    val p = plan(AnalyticsQueries.discreteMedian(spark, dir))
    assert(!p.contains("Window"), "median must not sort the table through a window")
    assert(p.toLowerCase.contains("percentile"), p)
  }

  test("q15 closest-to-mean: day means broadcast back, no day window") {
    val p = plan(TimeSeriesQueries.closestToMean(spark, dir))
    assert(!p.contains("Window"), "day means must come from agg + broadcast join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q134: block self-join is a pinned shuffle-hash, never broadcast") {
    // a self-join's sides are the same size: a broadcast flip would
    // pipeline the candidate+Levenshtein work into the scan's task
    // layout and park a corpus-sized HashedRelation per executor (the
    // r14 root cause of the false 19x scale ratio)
    val p = plan(TextQueries.editDistanceDedup(spark, dir))
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("levenshtein")), p.take(2000))
  }

  test("scan-stage filters stay cheap: no hash kernels pushed into parquet scans") {
    // pushdown is aggressive (join-key IsNotNull constraints are
    // inferred and pushed through everything deterministic); a pushed
    // predicate over a derived kernel column re-evaluates the kernel
    // per row at file-split parallelism (the r14 q26/q147 finding)
    for (name <- Seq("q26_simhash_near_dup", "q147_minhash_calibration",
        "q24_minhash_near_dup")) {
      val p = plan(SparkEntry.queries(name)(spark, dir))
      val scanFilters = p.linesIterator.filter(_.contains("DataFilters:")).toSeq
      scanFilters.foreach { l =>
        assert(!l.contains("md5("), s"$name pushes an md5 kernel into the scan: $l")
        assert(!l.contains("simhash"), s"$name pushes the simhash kernel into the scan: $l")
      }
      spark.catalog.clearCache()
    }
  }

  test("q86/q122/q125 scoring: no shuffle join on the query-term key") {
    // The BM25 df side is bounded by the query set (<=3 rows) and
    // enters the plan as a collected literal (q125/PQ-codebook
    // discipline); a shuffle join keyed on `term` would cap the
    // scoring stage at |query terms| tasks at ANY corpus size — the
    // round-16 cluster finding, where AQE merged those 3 effective
    // partitions into ONE serialized task. The only term-keyed
    // exchanges left feed the bounded-top-k FINAL aggregates, whose
    // input is already partial-aggregated to O(partitions) rows.
    for (q <- Seq("q86_bm25_topk", "q122_hybrid_rrf", "q125_chunk_retrieval")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(!p.contains("SortMergeJoin [term") && !p.contains("ShuffledHashJoin [term"),
        s"$q shuffles scored rows on the query-term key")
    }
  }

  test("q26: signature frame is cache-staged so the kernel runs once") {
    val p = plan(TextQueries.simhashNearDup(spark, dir))
    assert(p.contains("InMemoryTableScan"), p.take(2000))
    spark.catalog.clearCache()
  }

  test("q24/q25/q26 near-dup plans: no all-pairs product anywhere") {
    for (q <- Seq(TextQueries.minhashNearDup(spark, dir),
        TextQueries.jaccardPairs(spark, dir),
        TextQueries.simhashNearDup(spark, dir))) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), p.take(300))
    }
  }

  test("native hash expressions compile into whole-stage codegen") {
    // AQE finalizes stages lazily — run the query, then read the
    // codegen dump of the finalized plan; the kernel call must appear
    // in GENERATED code (interpreted fallback would leave the hot
    // path outside codegen)
    def codegenOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    }
    val gen = codegenOf(SessionQueries.rollingFingerprint(spark, dir))
    assert(gen.contains("graft.plans.Kernels.rollingHash"), gen.take(400))
    // q26's simhash projection sits beside a Generate (posexplode),
    // which legally breaks the codegen stage there — assert the
    // expression's doGenCode on a pure projection plan instead
    import org.apache.spark.sql.functions.{array, col, lit}
    val simDf = spark.range(8)
      .select(graft.plans.NativeFunctions.simhash64(
        array(lit("a"), col("id").cast("string"))).as("h"))
      .filter(col("h") =!= 0L)
    val sim = codegenOf(simDf.toDF())
    assert(sim.contains("graft.plans.Kernels.simhash"), sim.take(400))
  }

  test("q87 bloom probe is the native codegen might_contain, not a UDF") {
    val p = plan(TextQueries.bloomDecontaminate(spark, dir))
    assert(p.contains("might_contain"), p.take(500))
    // the per-shingle hot path must not drop out of codegen into a
    // Scala closure
    assert(!p.contains("UDF"), p.take(500))
  }

  test("q34 cosine near-dup: bucket equi-join, no cross product") {
    val p = plan(SimilarityQueries.cosineNearDup(spark, dir))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(300))
  }

  test("q174 text semantic dedup: banded equi-join candidates, no cross product") {
    val df = SimilarityQueries.textSemanticDedup(spark, dir)
    df.collect() // AQE: final plan
    val p = df.queryExecution.executedPlan.toString
    // candidates come from the (band, sig) equi-join only; no window
    // anywhere (the prune is distinct + left-anti). The inference
    // codegen span itself is pinned by CurationSpec's q170 test —
    // here AQE folds that projection into a collapsed query stage
    // whose subtree the final-plan string no longer prints.
    assert(!p.contains("CartesianProduct"), p.take(400))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
    assert(!p.contains("Window"), p.take(300))
  }

  test("q99: bucketized interval join never plans a nested loop") {
    val p = plan(TimeSeriesQueries.errorWindowJoin(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // and the naive formulation of the SAME predicate does — the
    // rewrite is what changes the join class, not the data
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, dir, "events")
    val w = ev.filter(col("event_type") === "error")
      .groupBy(date_trunc("hour", col("ts")).as("w_hour"))
      .agg(min(col("ts")).as("w_start"), max(col("ts")).as("w_end"))
    val naive = ev.filter(col("event_type") === "purchase")
      .select(col("ts").as("p_ts"))
      .join(w, col("p_ts") >= col("w_start") && col("p_ts") <= col("w_end"))
    assert(plan(naive).contains("BroadcastNestedLoopJoin"), plan(naive))
  }

  test("q100: purchases are pre-aggregated BELOW the join (skew-proof shape)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val qe = TimeSeriesQueries.bucketedIntervalCount(spark, dir).queryExecution
    val joins = qe.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty, qe.optimizedPlan.treeString)
    val preAgg = joins.exists(j =>
      j.left.collectFirst { case a: Aggregate => a }.isDefined ||
        j.right.collectFirst { case a: Aggregate => a }.isDefined)
    assert(preAgg, "per-(user, bucket) aggregate must sit below the join:\n" +
      qe.optimizedPlan.treeString)
    val p = qe.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q103: per-key cap is the bounded-heap aggregate, not a window sort") {
    val p = plan(TimeSeriesQueries.cappedIntervalJoin(spark, dir))
    assert(!p.contains("Window"), "capPerKey must not plan a window sort:\n" + p)
    assert(p.contains("bounded_top_k"), p)
  }

  test("q108 chunking is map-side only: no hash shuffle, no window") {
    val p = plan(CurationQueries.chunkDocuments(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"),
      "chunking must not shuffle data:\n" + p)
    assert(!p.contains("Window"), p)
  }

  test("q109 regression: broadcast dims, ONE moment-sum shuffle") {
    val p = plan(CurationQueries.groupRegression(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"grouped regression must shuffle once (the partial-agg moment sums), saw $exchanges:\n$p")
  }

  test("q110 byte_entropy runs inside whole-stage codegen, no shuffle") {
    val df = CurationQueries.charEntropy(spark, dir)
    val p = plan(df)
    assert(!p.contains("Exchange hashpartitioning"), p)
    val codegen = df.queryExecution.executedPlan
      .asInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]
      .initialPlan.toString
    assert(codegen.contains("byte_entropy"), codegen)
  }

  test("q107 substring dedup: equi-joins only, no window, no nested loop") {
    val p = plan(CurationQueries.substringDedup(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("q113 winnow near-dup: equi-joins only, verify restricted to candidates") {
    val p = plan(CurationQueries.winnowNearDup(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("df/occupancy caps are join-based, never a bucket-key window") {
    // A window partitioned by the bucket key funnels a hot bucket's
    // ENTIRE row set through one un-splittable WindowExec task (AQE
    // skew-splits joins, never windows) — tried round 15, reverted;
    // this pins the skew-safe shape so a future "optimization" can't
    // silently reintroduce it. q24/q25 tolerate no window at all;
    // q113's winnow sketch keeps its PER-DOC window (bounded by
    // document length), so only a fingerprint-key window is banned.
    val p24 = plan(TextQueries.minhashNearDup(spark, dir))
    assert(!p24.contains("Window"), p24)
    val p25 = plan(TextQueries.jaccardPairs(spark, dir))
    assert(!p25.contains("Window"), p25)
    val p113 = plan(CurationQueries.winnowNearDup(spark, dir))
    assert(!p113.contains("windowspecdefinition(fp"), p113)
  }

  test("q116 DSIR select: top-k heap + broadcast of the selected ids, no window") {
    val df = CurationQueries.dsirSelectCorpus(spark, dir)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"),
      "the k-selection must be a per-partition heap, not a global sort:\n" + p)
    assert(!p.contains("Window"), p)
    // the k selected ids broadcast back onto the corpus — the corpus
    // side must never shuffle for the materialization join
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q117 video decode: one mapPartitions batch stage, no hash shuffle") {
    val p = plan(PipelineQueries.videoDecode(spark, dir))
    // loadSpread's round-robin repartition is the only exchange; the
    // decode itself must not induce a hash shuffle or a window
    assert(!p.contains("Exchange hashpartitioning"),
      "video decode must stay partition-local:\n" + p)
    assert(!p.contains("Window"), p)
  }

  test("q137 interpolate: every window sits above the hourly aggregate") {
    // the windows scan GRID rows (|hours| x |types|), never the raw
    // event stream — the aggregate must be strictly below each window
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg, Window => LWin}
    val lp = TimeSeriesQueries.linearInterpolate(spark, dir)
      .queryExecution.optimizedPlan
    val wins = lp.collect { case w: LWin => w }
    assert(wins.nonEmpty, "interpolation needs the two neighbor scans")
    wins.foreach { w =>
      assert(w.child.collectFirst { case a: LAgg => a }.isDefined,
        s"window over the raw stream:\n${w.treeString.take(800)}")
    }
  }

  test("q138 outliers: broadcast baseline, no window over the stream") {
    val p = plan(SessionQueries.robustOutliers(spark, dir))
    assert(!p.contains("Window"), "MAD baseline must be aggregate+join, not window")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "type x hour baselines must broadcast")
  }

  test("q139 transition lift: matrix-side joins all broadcast") {
    val p = plan(SessionQueries.transitionLift(spark, dir))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "marginals join the |types|^2 matrix — must broadcast")
    assert(!p.contains("CartesianProduct"),
      "the 1-row total must broadcast-nest, never cartesian")
  }

  test("q140 novelty: equi-joins only, no window, no nested loop") {
    val p = plan(TextQueries.ngramNovelty(spark, dir))
    assert(!p.contains("Window"), p.take(500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(500))
  }

  test("q141 EMA: pure aggregate kernel — no window operator anywhere") {
    val p = plan(TimeSeriesQueries.emaHourly(spark, dir))
    assert(!p.contains("Window"),
      "the EMA must be the explode + hash-aggregate rewrite, never a window")
    assert(p.contains("Generate"), "the 24-offset contribution explode")
  }

  test("q155 100ms resample: one data shuffle, no window (the q10 contract at the finest grain)") {
    val p = plan(TimeSeriesQueries.resampleOhlc100ms(spark, dir))
    assert(!p.contains("Window"), "resample must not need a window shuffle")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one data shuffle, plan:\n$p")
  }

  test("q156 ingestion gate (batch): anti-join present, no window, no nested loop") {
    val p = plan(TextQueries.ingestionGateBatch(spark, dir))
    assert(p.contains("LeftAnti"),
      "the stream-static corpus exclusion must be a left-anti join:\n" + p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    spark.catalog.clearCache()
  }

  test("q68 multileg: the JSON kernel never rides the scan as a data filter") {
    // InferFiltersFromGenerate once pushed `size(from_json(...)) > 0`
    // into the orders scan (the r14 scan-riding-kernel class) — the
    // posexplode_outer form must keep the scan on the key column only
    val p = plan(CalendarQueries.multilegOrders(spark, dir))
    val scanLines = p.linesIterator.filter(_.contains("FileScan")).mkString("\n")
    assert(!scanLines.contains("from_json"),
      "JSON kernel must not be evaluated inside the scan:\n" + scanLines)
  }

  test("q123 PQ serving: corpus never sort-merge-shuffles; codebook is literal data") {
    // training runs at plan-construction (bounded sample + collect);
    // the SERVING plan must keep the corpus map-side: queries and
    // shortlists broadcast, no sort-merge join, no cartesian product
    val df = SimilarityQueries.pqAdcSearch(spark, dir)
    val p = plan(df)
    assert(!p.contains("SortMergeJoin"),
      "PQ serving must never shuffle the corpus for a join:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    spark.catalog.clearCache()
  }

  test("every broadcast() hint sits on a bounded-cardinality side") {
    // The q84/q86 regression class: a broadcast hint on a
    // vocabulary-sized aggregate works at sf0.1 and OOMs the driver at
    // 100 TB. This walks EVERY registered query's analyzed plan and
    // requires each BROADCAST-hinted subtree to be bounded under rules
    // that encode the audited justifications:
    //  - literal/local data; scans of the region/nation dims;
    //  - global aggregates (≤1 row) and anything built on bounded
    //    input (grouped agg, explode of a ≤k bounded_top_k array);
    //  - groupings whose key domain is fixed: pmod(_, k), the
    //    corpus's fixed-cardinality `label`, calendar days;
    //  - threshold filters directly over an aggregate (the q25
    //    hot-shingle cap / patch-rule qualifying-keys shape);
    //  - unique-id range caps (`vec_id < 10` query sets).
    // Anything else — in ANY current or future query — fails here
    // with the query name and offending subtree.
    import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BinaryComparison, Cast, Expression, Literal, Pmod}
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.types.DateType

    def stripCast(e: Expression): Expression = e match {
      case Cast(c, _, _, _) => stripCast(c)
      case other => other
    }
    def litThresholds(e: Expression): Boolean = e match {
      case And(l, r) => litThresholds(l) && litThresholds(r)
      case c: BinaryComparison =>
        stripCast(c.right).isInstanceOf[Literal] || stripCast(c.left).isInstanceOf[Literal]
      case _ => false
    }
    def idRangeCap(e: Expression): Boolean = e.exists {
      case c: BinaryComparison => (stripCast(c.left), stripCast(c.right)) match {
        case (a: Attribute, _: Literal) => a.name.endsWith("id")
        case (_: Literal, a: Attribute) => a.name.endsWith("id")
        case _ => false
      }
      case _ => false
    }
    def boundedKey(e: Expression): Boolean = e match {
      // `label` is the corpus's fixed class-label column; `source` is
      // the mixture recipe's curated sub-corpus enumeration (a data
      // recipe names its sources explicitly — the domain is the
      // recipe's length, not the data's); *nationkey/*regionkey are
      // FKs into the 25/5-row dims; calendar days are bounded by the
      // range scanned.
      case a: Attribute =>
        a.name == "label" || a.name == "source" ||
          // event taxonomy: a fixed enum domain like source/label
          // (5 types in the generator; a bounded vocabulary at any
          // scale — the q136 winsorize stats broadcast). The two
          // exact aliases are the q139 transition-matrix endpoints
          // (same domain, renamed) — exact names, not a suffix
          // pattern, so an unrelated high-cardinality column can't
          // ride in on a lookalike alias.
          a.name == "event_type" || a.name == "src_event_type" ||
          a.name == "dst_event_type" ||
          // hour-of-day: domain ≤ 24 by construction (the q138
          // robust-outlier seasonal baseline key)
          a.name == "hod" ||
          // contract root symbol: the synthetic market's fixed 5-
          // underlier universe (user_id % 5) — a root taxonomy is a
          // curated list at any data scale (the q143 spot broadcast)
          a.name == "root" ||
          a.name.endsWith("nationkey") ||
          a.name.endsWith("regionkey") || a.dataType == DateType ||
          // md5-prefix bucket keys (DSIR / KL-drift featurizer): the
          // reserved-name guards mean only CurationOps creates these,
          // and both operators cap hexChars at 4 → domain ≤ 65536
          a.name == "__b" || a.name == "__bk"
      case _: Literal => true
      case Pmod(_, _: Literal, _) => true
      case _ => false
    }
    def throughProjections(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, c) => throughProjections(c)
      case SubqueryAlias(_, c) => throughProjections(c)
      case other => other
    }
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: LocalRelation => true
      case _: OneRowRelation => true
      // spark.range(n) support grids (the KL-drift bucket support)
      case r: Range => r.numElements <= BigInt(65536)
      // q97's learned centroids: an eager localCheckpoint of the ≤ k
      // k-means centroid set. The RDD is already materialized, so the
      // spec verifies the ACTUAL cardinality instead of trusting the
      // lineage it replaced.
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.count() <= 1000
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.forall(rp =>
          rp.toString.endsWith("region.parquet") || rp.toString.endsWith("nation.parquet"))
        case _ => false
      }
      case _: GlobalLimit | _: LocalLimit => true
      case a: Aggregate =>
        a.groupingExpressions.isEmpty ||
          a.groupingExpressions.forall(boundedKey) ||
          bounded(a.child) ||
          // grouped agg whose EVERY grouping key comes from a bounded
          // join side: group count ≤ that side's cardinality (the
          // q123 ADC-shortlist shape — per-qid bounded_top_k where
          // qid is the vec_id<10 broadcast query set)
          (throughProjections(a.child) match {
            case j: Join =>
              val refs = a.groupingExpressions.flatMap(_.references)
              refs.nonEmpty && Seq(j.left, j.right).exists(side =>
                refs.forall(side.outputSet.contains) && bounded(side))
            case _ => false
          })
      // distinct over a fixed-domain key (q146's event-type list):
      // same cardinality argument as the bounded-key Aggregate rule
      case d: Deduplicate => d.keys.forall(boundedKey) || bounded(d.child)
      case Filter(cond, child) =>
        bounded(child) ||
          (throughProjections(child).isInstanceOf[Aggregate] && litThresholds(cond)) ||
          idRangeCap(cond)
      case g: Generate => bounded(g.child)
      case j: Join => bounded(j.left) && bounded(j.right)
      case u: UnaryNode => bounded(u.child)
      case _ => false
    }

    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val hinted = fn(spark, dir).queryExecution.analyzed.collect {
        case ResolvedHint(child, hints) if hints.strategy.contains(BROADCAST) => child
      }
      hinted.filterNot(bounded).map(t => s"$name:\n${t.treeString.take(1500)}")
    }
    assert(violations.isEmpty,
      s"unbounded broadcast side(s):\n${violations.mkString("\n---\n")}")
  }
}
