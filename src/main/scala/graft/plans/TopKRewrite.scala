package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrites the `row_number() <= k` window-filter
  * idiom into the [[BoundedTopK]] aggregate.
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
  *   - the window has exactly one window expression, a plain
  *     `row_number()` over `ROWS UNBOUNDED PRECEDING .. CURRENT ROW`;
  *   - the filter is a sole rank bound (`rn <= k`, `rn < k`,
  *     `rn = 1`, or the mirrored literal-first forms) with literal k;
  *   - every ORDER BY key uses a DEFAULT null placement — ascending
  *     NULLS FIRST or descending NULLS LAST, exactly what `.asc` /
  *     `.desc` / SQL `ASC`/`DESC` produce. Both directions map onto
  *     [[BoundedTopK]]'s per-field [[SortOrder]] comparator natively
  *     (no negation), so nullable keys and every orderable type —
  *     including Float/Double NaN and integral MIN_VALUE — rank
  *     exactly as the window would. The non-default placements
  *     (`asc_nulls_last`, `desc_nulls_first`) stand down;
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) => attempt(cond, w).getOrElse(f)
  }

  private def attempt(cond: Expression, w: Window): Option[LogicalPlan] =
    for {
      (rnAlias, part, order) <- rowNumberWindow(w)
      k <- rankBound(cond, rnAlias.exprId)
      if k >= 1 && k <= MaxK
      (keys, desc) <- sortKeys(order)
      if keys.forall(_.deterministic) && part.forall(_.deterministic)
      if w.child.output.forall(a => RowOrdering.isOrderable(a.dataType))
    } yield rewrite(stripGroupLimit(w.child), part, keys, desc, k, w.child.output, rnAlias)

  /** Matches a single plain row_number() window expression. */
  private def rowNumberWindow(w: Window): Option[(Alias, Seq[Expression], Seq[SortOrder])] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(p, o,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) =>
        Some((a, p, o))
      case _ => None
    }

  /** Extracts k from a sole rank-bound predicate on the rank column. */
  private def rankBound(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) if a.exprId == rn => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId == rn => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId == rn => Some(k - 1)
    case EqualTo(Literal(1, IntegerType), a: AttributeReference) if a.exprId == rn => Some(1)
    case _ => None
  }

  /** Maps each ORDER BY key onto the aggregate's per-field struct
    * order, or None when a key uses a non-default null placement.
    * The aggregate's comparator is built from the same [[SortOrder]]
    * semantics the window sort uses, so both default directions are
    * exact for every orderable type — no negation, hence no NaN /
    * MIN_VALUE / nullability hazard.
    */
  private def sortKeys(order: Seq[SortOrder]): Option[(Seq[Expression], Seq[Boolean])] = {
    val mapped = order.map {
      case SortOrder(c, Ascending, NullsFirst, _) => Some((c, false))
      case SortOrder(c, Descending, NullsLast, _) => Some((c, true))
      case _ => None
    }
    if (mapped.forall(_.isDefined)) Some(mapped.flatten.unzip) else None
  }

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
      k: Int,
      payload: Seq[Attribute],
      rnAlias: Alias): LogicalPlan = {
    // Sort keys lead the struct (they define the top-k order, each
    // with its own direction); the full child row rides behind them
    // and doubles as a deterministic ascending tie-break.
    val struct = CreateNamedStruct(
      keys.zipWithIndex.flatMap { case (e, i) => Seq(Literal(s"k$i"), e) } ++
      payload.zipWithIndex.flatMap { case (a, i) => Seq(Literal(s"p$i"), a) })
    val topk = Alias(BoundedTopK(struct, k, desc).toAggregateExpression(), "graft_topk")()
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
  }
}
