package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the keep-one-row-per-group idiom
  *
  * {{{
  *   SELECT * FROM (
  *     SELECT *, row_number() OVER (PARTITION BY k ORDER BY o) AS rn
  *     FROM t) WHERE rn = 1
  * }}}
  *
  * into a `min_by(struct(*), o)` aggregate. Spark's own
  * WindowGroupLimit already prunes rank-1 windows to one row per key
  * map-side, but the window form still SORTS twice (a full local
  * sort before the partial limit, another before the final window)
  * and evaluates the window machinery; the aggregate form is pure
  * hash aggregation — O(n) local work, no sort anywhere, one row per
  * (mapper, key) through the exchange. It is the same rewrite this
  * repo applied by hand to its IVF cell assignments (q72/q88/q91/
  * q97/q98), productized so a user's naive SQL gets it for free.
  *
  * Conservative by construction — fires only when:
  *  - the Window computes EXACTLY ONE expression, a row_number();
  *  - the window HAS a PARTITION BY (`parts.nonEmpty`): an
  *    unpartitioned rank-one window yields ZERO rows on empty input,
  *    but a global (grouping-less) Aggregate yields ONE all-null
  *    row — rewriting it would invent a row on runtime-empty input;
  *  - the filter directly above it keeps `rn = 1` / `rn <= 1`;
  *  - every ORDER BY key is deterministic and the keys are EITHER
  *    all ascending NULLS FIRST (→ `min_by`) or all descending
  *    NULLS LAST (→ `max_by`) — the two default sort shapes, which
  *    cover keep-first-per-key and keep-latest-per-key. The ordering
  *    keys are wrapped in ONE struct even when there is a single
  *    key: a struct value is never null (so min_by/max_by can never
  *    skip a null-keyed row the way they would with a bare nullable
  *    key), and struct field comparison ranks null fields SMALLEST —
  *    under min that is NULLS FIRST, under max NULLS LAST, exactly
  *    row_number's defaults for each direction;
  *  - ties: row_number over a non-total order picks an arbitrary
  *    tied row, and so does min_by — the same nondeterminism class,
  *    no new behavior introduced.
  *
  * Output attribute ids are preserved (each restored column is
  * re-aliased under its original exprId), so parent operators are
  * untouched; `rn` itself is restored as the literal 1 it must be.
  */
object RankToArgMin extends Rule[LogicalPlan] {

  /** heap state per group is k rows — bound it so the rewrite never
    * builds an unbounded aggregation buffer from a huge literal */
  private val MaxK = 10000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond, Window(
        Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
        parts, order, child, _))
        if isRankOne(cond, alias.toAttribute) &&
          parts.nonEmpty &&
          order.nonEmpty &&
          order.forall(_.child.deterministic) &&
          (order.forall(o => o.direction == Ascending &&
              o.nullOrdering == NullsFirst) ||
            order.forall(o => o.direction == Descending &&
              o.nullOrdering == NullsLast)) &&
          parts.forall(_.deterministic) &&
          child.output.nonEmpty =>
      val ordKey = CreateStruct(order.map(_.child))
      val value = CreateStruct(child.output)
      val argmin = Alias(
        (if (order.head.direction == Ascending) MinBy(value, ordKey)
         else MaxBy(value, ordKey)).toAggregateExpression(),
        "_graft_argmin")()
      val agg = Aggregate(parts, Seq(argmin), child)
      val restored: Seq[NamedExpression] =
        child.output.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(argmin.toAttribute, i, Some(a.name)),
            a.name)(exprId = a.exprId)
        } :+ Alias(Literal(1), alias.name)(exprId = alias.exprId)
      Project(restored, agg)

    // rn <= k (k ≥ 2): same double-sort elimination via the bounded
    // top-k-rows aggregate + posexplode. The heap carries
    // struct(order keys…, child cols…); the key fields are BARE
    // (not struct-wrapped), so the generated comparator's per-field
    // null ordering is exactly row_number's default for each
    // direction (asc NULLS FIRST / desc NULLS LAST).
    case Filter(cond, Window(
        Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
        parts, order, child, _))
        if rankBound(cond, alias.toAttribute).exists(k =>
            k >= 2 && k <= MaxK) &&
          parts.nonEmpty &&
          order.nonEmpty &&
          order.forall(_.child.deterministic) &&
          (order.forall(o => o.direction == Ascending &&
              o.nullOrdering == NullsFirst) ||
            order.forall(o => o.direction == Descending &&
              o.nullOrdering == NullsLast)) &&
          parts.forall(_.deterministic) &&
          child.output.nonEmpty =>
      val k = rankBound(cond, alias.toAttribute).get
      val asc = order.head.direction == Ascending
      val nKeys = order.length
      val combined = CreateStruct(order.map(_.child) ++ child.output)
      val topk = Alias(
        graft.functions.TopKRows(combined, nKeys, k, asc)
          .toAggregateExpression(), "_graft_topk")()
      val agg = Aggregate(parts, Seq(topk), child)
      val structT = combined.dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val posAttr = AttributeReference("_graft_pos", IntegerType,
        nullable = false)()
      val colAttr = AttributeReference("_graft_row", structT,
        nullable = false)()
      val gen = Generate(PosExplode(topk.toAttribute),
        unrequiredChildIndex = Seq(0), outer = false,
        qualifier = None, generatorOutput = Seq(posAttr, colAttr), agg)
      val restored: Seq[NamedExpression] =
        child.output.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(colAttr, nKeys + i, Some(a.name)),
            a.name)(exprId = a.exprId)
        } :+ Alias(Add(posAttr, Literal(1)), alias.name)(
          exprId = alias.exprId)
      Project(restored, gen)
  }

  private def isRankOne(cond: Expression, rn: Attribute): Boolean =
    cond match {
      case EqualTo(a: Attribute, Literal(1, IntegerType)) =>
        a.semanticEquals(rn)
      case EqualTo(Literal(1, IntegerType), a: Attribute) =>
        a.semanticEquals(rn)
      case LessThanOrEqual(a: Attribute, Literal(1, IntegerType)) =>
        a.semanticEquals(rn)
      case _ => false
    }

  /** `rn <= k` / `rn < k+1` / `k >= rn` → Some(k), else None */
  private def rankBound(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rn) => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rn) => Some(k - 1)
      case _ => None
    }
}
