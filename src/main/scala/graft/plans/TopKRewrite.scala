package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrites the `row_number()/rank()/dense_rank() <= k`
  * window-filter idiom into the [[BoundedTopK]] / [[BoundedRankTopK]]
  * aggregates.
  *
  * The window plan is the classic 100 TB anti-pattern this engine
  * bans from its own queries (see DESIGN.md): every row of a group is
  * shuffled into ONE task and sorted there, so a low-cardinality
  * partition key (market segment, query id) serializes the whole
  * dataset through a handful of reducers. Spark's own
  * `InferWindowGroupLimit` (3.5+) bounds the shuffle volume with a
  * partial rank limit, but it still full-sorts every map partition
  * and still evaluates one group per reducer task.
  *
  * The rewrite replaces the whole shape with a hash aggregate whose
  * partial state is a ≤k heap per group ([[BoundedTopK]]): O(n log k)
  * map-side work instead of a sort, ≤k rows per (group, map task) on
  * the wire, and groups distributed across reducers like any other
  * aggregation. SQL users who write the window idiom — the natural
  * way to express top-k — get the bounded plan for free when the rule
  * is installed via [[GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`.
  *
  * The rewrite is attempted only when it is provably safe:
  *   - the window has exactly one window expression: a plain
  *     `row_number()`, `rank()` or `dense_rank()` over the `ROWS
  *     UNBOUNDED PRECEDING .. CURRENT ROW` frame that Catalyst's
  *     `RankLike`/`AggregateWindowFunction.frame` pins for all three
  *     (the analyzer rejects user-specified frames on them). The
  *     rank-like functions keep boundary ties, so they map onto the
  *     tie-aware [[BoundedRankTopK]] (whole key groups retained /
  *     evicted, rank precomputed in the emitted struct) instead of the
  *     fixed-k-heap [[BoundedTopK]];
  *   - at least one filter conjunct bounds the rank (`rn <= k`,
  *     `rn < k`, `rn = c`, or the mirrored literal-first forms) with
  *     an INT or BIGINT literal — integer-widening casts Spark
  *     inserts around the rank column (`cast(rn AS bigint) <= 5L`)
  *     are seen through. The tightest bound caps the aggregate; every
  *     conjunct the cap does not fully subsume (non-rank predicates,
  *     and `rn = c` for c > 1, which caps at c but still has to pick
  *     rank c) survives as a residual Filter above the rewrite —
  *     sound because every original column and the rank are restored
  *     under their original ExprIds;
  *   - every ORDER BY key maps onto [[BoundedTopK]]'s per-field
  *     [[SortOrder]] comparator natively — both directions and BOTH
  *     null placements (`asc_nulls_last` / `desc_nulls_first`
  *     included), since the comparator is built from the same
  *     SortOrder the window sort would use. No negation, so nullable
  *     keys and every orderable type — including Float/Double NaN and
  *     integral MIN_VALUE — rank exactly as the window would;
  *   - all carried columns are of orderable types, and k is small
  *     enough that a k-row heap per group is trivially safe.
  *
  * Among rows tied on the full ORDER BY the window's row_number picks
  * an arbitrary subset; the rewrite picks the subset that is minimal
  * under the payload-column tie-break — a deterministic instance of
  * the same contract.
  */
object RewriteRankLimitToBoundedTopK extends Rule[LogicalPlan] {

  /** A k-row heap lives in each aggregation buffer; beyond this the
    * window/`WindowGroupLimit` plan's streaming evaluation is the
    * safer memory trade, so the rule stands down.
    */
  private val MaxK = 10000

  /** Which rank-like function drives the window; rank/dense_rank keep
    * boundary ties and so route to [[BoundedRankTopK]].
    */
  private sealed trait RankKind
  private case object RowNum extends RankKind
  private case object RankTies extends RankKind
  private case object DenseRankTies extends RankKind

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) => attempt(cond, w).getOrElse(f)
  }

  /** The rewritten Project restores every child column AND the rank
    * column under their original ExprIds, so only ONE conjunct — the
    * tightest rank bound — is consumed by the rewrite; every other
    * conjunct survives verbatim as a residual Filter on top
    * (`rn <= 3 AND price > 100` rewrites with `price > 100` kept).
    */
  private def attempt(cond: Expression, w: Window): Option[LogicalPlan] =
    for {
      (rnAlias, part, order, kind) <- rankWindow(w)
      conjuncts = splitConjunctivePredicates(cond)
      bounds = conjuncts.flatMap(c => rankBound(c, rnAlias.exprId))
      if bounds.nonEmpty
      k = bounds.map(_._1).min
      if k >= 1L && k <= MaxK
      (keys, desc, nullsLast) = sortKeys(order)
      if keys.nonEmpty
      if keys.forall(_.deterministic) && part.forall(_.deterministic)
      if w.child.output.forall(a => RowOrdering.isOrderable(a.dataType))
    } yield {
      val top = rewrite(stripGroupLimit(w.child), part, keys, desc, nullsLast,
        k.toInt, w.child.output, rnAlias, kind)
      // Keep every conjunct the bound did not fully consume: non-bound
      // predicates, and partially-consumed bounds like `rn = c` (the
      // rewrite caps at c; the equality still has to pick rank c).
      // Redundant looser bounds (rn <= 5 beside rn <= 3) drop out.
      val residual = conjuncts.filter(c =>
        rankBound(c, rnAlias.exprId).forall(!_._2))
      if (residual.isEmpty) top else Filter(residual.reduce(And), top)
    }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  /** Matches a single rank-like window expression over its default
    * frame — `ROWS UNBOUNDED PRECEDING .. CURRENT ROW`, which is what
    * `RankLike.frame` pins for all three functions (the analyzer
    * rejects user-specified frames on them outright).
    */
  private def rankWindow(
      w: Window): Option[(Alias, Seq[Expression], Seq[SortOrder], RankKind)] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(fn,
          WindowSpecDefinition(p, o,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) =>
        fn match {
          case RowNumber() => Some((a, p, o, RowNum))
          case Rank(_) => Some((a, p, o, RankTies))
          case DenseRank(_) => Some((a, p, o, DenseRankTies))
          case _ => None
        }
      case _ => None
    }

  /** The rank column with any integer-widening cast stripped: binary
    * comparison against a BIGINT literal makes Spark wrap the INT rank
    * output in `cast(rn AS bigint)`, which is lossless.
    */
  private def rankAttr(e: Expression, rn: ExprId): Boolean = e match {
    case a: AttributeReference => a.exprId == rn
    case Cast(a: AttributeReference, LongType, _, _) =>
      a.dataType == IntegerType && a.exprId == rn
    case _ => false
  }

  private def intBound(l: Literal): Option[Long] = l match {
    case Literal(k: Int, IntegerType) => Some(k.toLong)
    case Literal(k: Long, LongType) => Some(k)
    case _ => None
  }

  /** Extracts an upper bound on the rank column from one conjunct:
    * `(k, consumed)` where `consumed` says the rewrite's `<= k` cap
    * fully subsumes the predicate. `rn = c` bounds at c but is only
    * consumed for c = 1 (`rank >= 1` always holds); for c > 1 the
    * equality must survive as a residual filter over the capped rows.
    */
  private def rankBound(cond: Expression, rn: ExprId): Option[(Long, Boolean)] = cond match {
    case LessThanOrEqual(a, l: Literal) if rankAttr(a, rn) => intBound(l).map((_, true))
    case LessThan(a, l: Literal) if rankAttr(a, rn) => intBound(l).map(k => (k - 1L, true))
    case GreaterThanOrEqual(l: Literal, a) if rankAttr(a, rn) => intBound(l).map((_, true))
    case GreaterThan(l: Literal, a) if rankAttr(a, rn) => intBound(l).map(k => (k - 1L, true))
    case EqualTo(a, l: Literal) if rankAttr(a, rn) => intBound(l).map(k => (k, k == 1L))
    case EqualTo(l: Literal, a) if rankAttr(a, rn) => intBound(l).map(k => (k, k == 1L))
    case _ => None
  }

  /** Maps each ORDER BY key onto the aggregate's per-field struct
    * order: (child, descending?, nullsLast?). All four
    * direction/placement combinations are exact — the aggregate's
    * comparator is built from the same [[SortOrder]] semantics the
    * window sort uses, so every orderable type ranks identically (no
    * negation, hence no NaN / MIN_VALUE / nullability hazard).
    */
  private def sortKeys(
      order: Seq[SortOrder]): (Seq[Expression], Seq[Boolean], Seq[Boolean]) =
    order.map { o =>
      (o.child, o.direction == Descending, o.nullOrdering == NullsLast)
    }.unzip3

  /** `InferWindowGroupLimit` may already have bounded the child; the
    * aggregate subsumes that limit, so drop it.
    */
  private def stripGroupLimit(child: LogicalPlan): LogicalPlan = child match {
    case WindowGroupLimit(_, _, _, _, inner) => inner
    case other => other
  }

  private def rewrite(
      child: LogicalPlan,
      part: Seq[Expression],
      keys: Seq[Expression],
      desc: Seq[Boolean],
      nullsLast: Seq[Boolean],
      k: Int,
      payload: Seq[Attribute],
      rnAlias: Alias,
      kind: RankKind): LogicalPlan = {
    // Sort keys lead the struct (they define the top-k order, each
    // with its own direction); the full child row rides behind them
    // and doubles as a deterministic ascending tie-break.
    val struct = CreateNamedStruct(
      keys.zipWithIndex.flatMap { case (e, i) => Seq(Literal(s"k$i"), e) } ++
      payload.zipWithIndex.flatMap { case (a, i) => Seq(Literal(s"p$i"), a) })

    kind match {
      case RowNum =>
        val topk = Alias(
          BoundedTopK(struct, k, desc, nullsLast).toAggregateExpression(),
          "graft_topk")()
        val agg = Aggregate(part, Seq(topk), child)

        val pos = AttributeReference("graft_pos", IntegerType, nullable = false)()
        val row = AttributeReference("graft_row", struct.dataType, nullable = false)()
        val gen = Generate(PosExplode(topk.toAttribute), unrequiredChildIndex = Seq(0),
          outer = false, qualifier = None, generatorOutput = Seq(pos, row), agg)

        // Restore the original output attributes (same ExprIds) from the
        // struct, and the rank column from the explode position.
        val restored: Seq[NamedExpression] = payload.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(row, keys.length + i, Some(s"p$i")), a.name)(
            exprId = a.exprId, qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
        }
        val rn = Alias(Add(pos, Literal(1)), rnAlias.name)(
          exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
        Project(restored :+ rn, gen)

      case RankTies | DenseRankTies =>
        // Ties share a rank, so position can't reproduce it: the
        // aggregate precomputes each row's rank as struct field 0.
        val fn = BoundedRankTopK(struct, k, keys.length,
          dense = kind == DenseRankTies, descFields = desc,
          nullsLastFields = nullsLast)
        val topk = Alias(fn.toAggregateExpression(), "graft_topk")()
        val agg = Aggregate(part, Seq(topk), child)

        val row = AttributeReference("graft_row", fn.outputSchema, nullable = false)()
        val gen = Generate(Explode(topk.toAttribute), unrequiredChildIndex = Seq(0),
          outer = false, qualifier = None, generatorOutput = Seq(row), agg)

        val restored: Seq[NamedExpression] = payload.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(row, 1 + keys.length + i, Some(s"p$i")), a.name)(
            exprId = a.exprId, qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
        }
        val rn = Alias(GetStructField(row, 0, Some("r")), rnAlias.name)(
          exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
        Project(restored :+ rn, gen)
    }
  }
}
