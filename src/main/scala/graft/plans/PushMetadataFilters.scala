package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.{sources => f}
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.connectors.vectorstore.VSTable
import graft.model.Canonical

/** Optimizer rule: metadata predicates over a vector-store relation reach
  * the backend even though Spark's pushdown APIs cannot carry them — map
  * access (`element_at(metadata, 'k')`) has no translation in
  * `V2ExpressionBuilder`, so both the V1-Filter and V2-Predicate pushdown
  * paths leave the predicate in a plan-side Filter and the scan ships
  * EVERY row across the seam. Every real backend evaluates exactly these
  * predicates natively (Qdrant scroll filters, Milvus `expr`, Pinecone
  * metadata filters — the surface `FilterDialects` renders).
  *
  * The rule extracts the faithfully-translatable conjuncts (comparisons /
  * In / IsNull / string predicates on `element_at(metadata, <lit>)`,
  * including the `cast(... as double)` the dialects wrap numeric
  * comparisons in) as `metadata.<key>` source filters — the address form
  * `FilterDialects.render` and `FilterEval` already speak — and installs
  * them on the table for the scan to apply at the store. The original
  * Filter node is deliberately LEFT IN PLACE: the pushed copy only
  * shrinks what crosses the seam; Spark's own evaluation remains the
  * correctness authority, so a backend that filters more loosely (or the
  * emulation's numeric-string comparison) can never change results. Only
  * whole conjuncts that translate exactly are pushed; the rest stay
  * Spark-side untouched.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftSparkExtensions]]), like [[PushVectorSearch]]. Runs
  * before `V2ScanRelationPushDown`, which then merges these with the id
  * filters it pushes itself.
  */
object PushMetadataFilters extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case filt @ LFilter(cond, r @ DataSourceV2Relation(t: VSTable, _, _, _, _, _))
        if t.backendFilters.isEmpty && t.search.isEmpty =>
      val pushable = splitConjunctivePredicates(cond).flatMap(translate)
      if (pushable.isEmpty) filt
      else filt.copy(child = r.copy(table = t.withBackendFilters(pushable.toArray)))
  }

  /** `metadata.<key>` when the expression is a metadata lookup by literal
    * key, unwrapping the to-double cast numeric comparisons carry. */
  private def metaKey(e: Expression): Option[String] = e match {
    case ElementAt(a: AttributeReference, Literal(k: UTF8String, StringType), _, _)
      if a.name == Canonical.METADATA => Some(s"${Canonical.METADATA}.$k")
    case GetMapValue(a: AttributeReference, Literal(k: UTF8String, StringType))
      if a.name == Canonical.METADATA => Some(s"${Canonical.METADATA}.$k")
    case Cast(child, DoubleType, _, _) => metaKey(child)
    case _ => None
  }

  /** Literal comparison value in external form. Strings and numbers only —
    * the two shapes `FilterEval`/the dialects compare faithfully. */
  private def litValue(e: Expression): Option[Any] = e match {
    case Literal(u: UTF8String, StringType) => Some(u.toString)
    case Literal(n: Number, _) => Some(n)
    case _ => None
  }

  private def cmp(l: Expression, r: Expression)(direct: (String, Any) => f.Filter,
                                                flipped: (String, Any) => f.Filter)
  : Option[f.Filter] =
    (metaKey(l), litValue(r)) match {
      case (Some(k), Some(v)) => Some(direct(k, v))
      case _ =>
        (metaKey(r), litValue(l)) match {
          case (Some(k), Some(v)) => Some(flipped(k, v))
          case _ => None
        }
    }

  /** Shared with [[PushVectorSearch]], which absorbs a whole Filter into a
    * pushed search only when EVERY conjunct translates. */
  private[plans] def translate(e: Expression): Option[f.Filter] = e match {
    case EqualTo(l, r) => cmp(l, r)(f.EqualTo, f.EqualTo)
    case GreaterThan(l, r) => cmp(l, r)(f.GreaterThan, f.LessThan)
    case GreaterThanOrEqual(l, r) => cmp(l, r)(f.GreaterThanOrEqual, f.LessThanOrEqual)
    case LessThan(l, r) => cmp(l, r)(f.LessThan, f.GreaterThan)
    case LessThanOrEqual(l, r) => cmp(l, r)(f.LessThanOrEqual, f.GreaterThanOrEqual)
    case In(v, list) if list.forall(_.isInstanceOf[Literal]) =>
      for { k <- metaKey(v); vs <- traverse(list.map(litValue)) } yield f.In(k, vs.toArray)
    case InSet(v, hset) =>
      metaKey(v).map(k => f.In(k, hset.map {
        case u: UTF8String => u.toString
        case other => other
      }.toArray))
    case IsNull(v) => metaKey(v).map(f.IsNull)
    case IsNotNull(v) => metaKey(v).map(f.IsNotNull)
    case StartsWith(v, Literal(p: UTF8String, StringType)) =>
      metaKey(v).map(k => f.StringStartsWith(k, p.toString))
    case EndsWith(v, Literal(p: UTF8String, StringType)) =>
      metaKey(v).map(k => f.StringEndsWith(k, p.toString))
    case Contains(v, Literal(p: UTF8String, StringType)) =>
      metaKey(v).map(k => f.StringContains(k, p.toString))
    case Or(l, r) => for { lf <- translate(l); rf <- translate(r) } yield f.Or(lf, rf)
    case Not(c) => translate(c).map(f.Not)
    case _ => None
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}
