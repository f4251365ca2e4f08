package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftAggBridge
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: `row_number().over(partitionBy p orderBy o) <= k`
  * filters become a bounded-heap `CollectTopK` aggregate — the q61 plan —
  * instead of the window plan that shuffles EVERY input row and fully
  * sorts each partition before discarding all but k rows per group.
  * After the rewrite each map task keeps ≤ k rows per group in a heap
  * (partial ObjectHashAggregate, O(n log k) and no corpus sort), the
  * exchange carries ≤ k·groups rows per map partition, and the rank is
  * re-derived by exploding the per-group top-k array (CollectTopK.eval
  * emits it largest-first — rank order — by construction). This is the
  * plan that survives a 100× fact-table scale-up, applied automatically
  * to the window formulation users actually write.
  *
  * Spark's own `InferWindowGroupLimit` (3.5+) already prunes these plans
  * to ≤ k rows per group per map partition, but still fully sorts every
  * map partition (O(n log n)) and runs the Window machinery; this rewrite
  * removes the sort and the window entirely. Matched shape (anything else
  * is left alone):
  *
  *   Filter((rn ≤ k | rn < k | rn = 1) [AND rest],
  *     Window([row_number() AS rn | rank() AS rn], part, order, child))
  *
  * `rank()` rides the same shape through [[CollectTopKRank]]: ties share
  * places and the k-th place can be shared, so the heap keeps k plus the
  * boundary tie-group (state bounded by the query's own output, not the
  * corpus) and emits the rank next to each row — the filter's ties-kept
  * semantics, without the full partition sort.
  *
  * with 1 ≤ k ≤ [[MaxK]] (heap state per group is k rows — past that the
  * window plan's spill behavior is the safer default), every partition
  * key a plain attribute, and every order key encodable below. `rest`
  * conjuncts (including ones over rn, e.g. pagination's `rn >= 2`) are
  * re-applied above the rewritten subtree, which re-emits the window's
  * exact output attributes. Order-key encoding (CollectTopK keeps the k
  * LARGEST under the struct's lexicographic interpreted ordering, so
  * "first k by the ORDER BY" must mean "largest k by the struct"):
  *
  *   - DESC NULLS LAST:  value as-is; when nullable, a leading
  *     `isnull ? 0 : 1` flag makes nulls smallest (picked last — exactly
  *     the window's desc null placement).
  *   - ASC NULLS FIRST (numeric only): order-reversed value; when
  *     nullable, a leading null flag makes nulls largest (picked FIRST —
  *     the window's default asc null placement). Reversal must be an
  *     exact anti-monotone bijection under the interpreted ordering:
  *     integral types use bitwise NOT (`~x = -x-1`, total on the domain —
  *     `-MinValue` would wrap to itself and rank the smallest key last),
  *     Decimal uses negation (its range is symmetric), and Float/Double
  *     use negation plus a NaN leg in the flag (`-NaN` is still NaN and
  *     would rank first where the window ranks it last, so the flag
  *     orders null > ordinary > NaN and NaN's value slot is neutralized).
  *
  * Non-default null orderings, non-numeric ASC keys, dense_rank() (its
  * k-th DISTINCT place has no row-count bound at all), and multi-window
  * nodes all fall through to the stock plan. Ties beyond the order keys
  * are broken by the full row payload (the struct's trailing fields), so
  * the rewrite is MORE deterministic than the window's partition-order
  * tie behavior — both are within row_number's tie contract.
  */
object BoundedRankRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Heap rows per group above which the window plan is kept. */
  val MaxK = 1024

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  /** The single row_number/rank alias of a one-expression window node
    * (isRank = true for `rank()`, whose k-th place keeps ties).
    */
  private def soleRankLike(w: Window): Option[(Alias, Boolean)] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) => Some((a, false))
    case Seq(a @ Alias(WindowExpression(_: Rank, _), _))      => Some((a, true))
    case _ => None
  }

  /** k such that `cond` ≡ rank ≤ k, for the supported comparison shapes. */
  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  /** Struct fields encoding one ORDER BY key for keep-largest semantics,
    * or None when the key shape is unsupported.
    */
  private def encodeKey(s: SortOrder): Option[Seq[Expression]] = {
    val e = s.child
    (s.direction, s.nullOrdering) match {
      case (Descending, NullsLast) =>
        if (!RowOrdering.isOrderable(e.dataType)) None
        else if (!e.nullable) Some(Seq(e))
        else Some(Seq(
          If(IsNull(e), Literal(0), Literal(1)),
          Coalesce(Seq(e, Literal.default(e.dataType)))))
      case (Ascending, NullsFirst) =>
        e.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            // ~x = -x-1: exact anti-monotone bijection, no MinValue wrap
            if (!e.nullable) Some(Seq(BitwiseNot(e)))
            else Some(Seq(
              If(IsNull(e), Literal(1), Literal(0)),
              If(IsNull(e), Literal.default(e.dataType), BitwiseNot(e))))
          case FloatType | DoubleType =>
            // -NaN is still NaN (largest); route NaN through the flag so
            // it is picked LAST, matching the window's asc NaN placement
            val sick = If(IsNaN(e), Literal(0), Literal(1))
            val safe = If(IsNaN(e), Literal.default(e.dataType), UnaryMinus(e))
            if (!e.nullable) Some(Seq(sick, safe))
            else Some(Seq(
              If(IsNull(e), Literal(2), sick),
              If(IsNull(e), Literal.default(e.dataType), safe)))
          case _: DecimalType =>
            // decimal range is symmetric: negation never overflows
            if (!e.nullable) Some(Seq(UnaryMinus(e)))
            else Some(Seq(
              If(IsNull(e), Literal(1), Literal(0)),
              If(IsNull(e), Literal.default(e.dataType), UnaryMinus(e))))
          case _ => None
        }
      case _ => None
    }
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    for {
      (rnAlias, isRank) <- soleRankLike(w)
      rnAttr = rnAlias.toAttribute
      // exactly one rank-limit conjunct defines k; other conjuncts (even
      // over rn) re-apply above the rewrite, which preserves output attrs
      conjuncts = splitConjunctivePredicates(cond)
      limits = conjuncts.flatMap(c => rankLimit(c, rnAttr).map(k => (c, k)))
      (rankPred, k) <- limits.headOption
      if limits.size == 1 && k >= 1 && k <= MaxK
      if w.orderSpec.nonEmpty
      groupKeys <- someIfAll(w.partitionSpec) {
        case a: AttributeReference => Some(a); case _ => None
      }
      sortFields <- someIfAll(w.orderSpec)(encodeKey)
      // Spark may already have inserted its WindowGroupLimit below the
      // window (same spec, limit ≥ k) — the rewrite subsumes it. The rank
      // path only strips a ties-keeping (Rank) limit: a RowNumber limit of
      // exactly k could have dropped boundary ties the rank filter keeps.
      child = w.child match {
        case wgl: WindowGroupLimit
            if wgl.partitionSpec == w.partitionSpec &&
              wgl.orderSpec == w.orderSpec && wgl.limit >= k &&
              (!isRank || wgl.rankLikeFunction.isInstanceOf[Rank]) => wgl.child
        case c => c
      }
      // the row payload rides the struct tail: it must be orderable (it
      // participates in tie comparison past the sort keys)
      if child.output.forall(a => RowOrdering.isOrderable(a.dataType))
    } yield {
      val payloadStart = sortFields.flatten.size
      val fields = sortFields.flatten.zipWithIndex.flatMap { case (e, i) =>
        Seq(Literal(s"_s$i"), e)
      } ++ child.output.zipWithIndex.flatMap { case (a, i) =>
        Seq(Literal(s"_p$i"), a: Expression)
      }
      val item       = CreateNamedStruct(fields)
      val structType = item.dataType.asInstanceOf[StructType]
      val groupIds   = groupKeys.map(_.exprId).toSet

      // (generate node, struct holding the row payload, rank expression)
      val (gen, valRef, rankExpr): (Generate, Expression, Expression) =
        if (!isRank) {
          val topk = Alias(GraftAggBridge.collectTopK(item, k), "_graft_topk")()
          val agg = Aggregate(w.partitionSpec, (groupKeys: Seq[NamedExpression]) :+ topk, child)
          // CollectTopK.eval returns the heap sorted largest-first = rank order
          val posAttr = AttributeReference("_graft_pos", IntegerType, nullable = false)()
          val rowAttr = AttributeReference("_graft_row", structType, nullable = false)()
          val g = Generate(
            PosExplode(topk.toAttribute),
            unrequiredChildIndex = Nil,
            outer = false,
            qualifier = None,
            generatorOutput = Seq(posAttr, rowAttr),
            child = agg)
          (g, rowAttr, Add(posAttr, Literal(1)))
        } else {
          // rank(): ties share places and the k-th place can be shared, so
          // the heap keeps k plus the boundary tie-group and eval emits the
          // rank alongside each row (struct<r int, v struct>)
          val ctr  = CollectTopKRank(item, k, payloadStart)
          val topk = Alias(ctr.toAggregateExpression(), "_graft_topk")()
          val agg = Aggregate(w.partitionSpec, (groupKeys: Seq[NamedExpression]) :+ topk, child)
          val rowAttr = AttributeReference("_graft_row", ctr.entryType, nullable = false)()
          val g = Generate(
            Explode(topk.toAttribute),
            unrequiredChildIndex = Nil,
            outer = false,
            qualifier = None,
            generatorOutput = Seq(rowAttr),
            child = agg)
          (g, GetStructField(rowAttr, 1, Some("v")), GetStructField(rowAttr, 0, Some("r")))
        }

      // re-emit the window's exact output attributes (same exprIds) so the
      // surrounding plan needs no adjustment; group keys come from the
      // aggregate directly, everything else from the struct payload
      val projRow: Seq[NamedExpression] = child.output.zipWithIndex.map { case (a, i) =>
        if (groupIds.contains(a.exprId)) a
        else Alias(
          GetStructField(valRef, payloadStart + i, Some(s"_p$i")), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      }
      val rnOut = Alias(rankExpr, rnAlias.name)(
        exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
      val proj = Project(projRow :+ rnOut, gen)
      val rest = conjuncts.filterNot(_ eq rankPred)
      if (rest.isEmpty) proj else Filter(rest.reduce(And), proj)
    }
  }

  /** Traverse: Some(mapped) iff f is defined on every element. */
  private def someIfAll[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val mapped = xs.flatMap(x => f(x))
    if (mapped.size == xs.size) Some(mapped) else None
  }
}
