package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, FloatType}
import graft.connectors.vectorstore.{SearchSpec, VSTable}
import graft.functions.{BinaryHammingExpr, VectorKernel}

/** Optimizer rule: `ORDER BY vec_cosine(vector, <literal>) DESC LIMIT k`
  * (float collections) or `ORDER BY binary_hamming(vector, <literal>) ASC
  * LIMIT k` (BINARY_VECTOR collections) over a vector-store relation
  * becomes a NATIVE SEARCH pushed into the scan — each partition returns
  * only its local top-k, and the Sort+Limit left in place merges
  * partition winners into the exact global answer. The scan's output
  * shrinks from |collection| to partitions×k rows, which is the
  * difference between shipping 100 TB through a sort and shipping a few
  * thousand rows.
  *
  * This is the DSv2 analog of what the reference's backends do natively
  * (Qdrant/Milvus/Pinecone search endpoints; Milvus serves HAMMING over
  * binary fields); registered through
  * `SparkSessionExtensions.injectOptimizerRule` in
  * [[graft.GraftSparkExtensions]].
  *
  * Filtered search: `df.filter(<metadata predicates>).orderBy(score)
  * .limit(k)` — THE canonical vector query — also rewrites, PROVIDED every
  * conjunct of the Filter reaches the store BEFORE top-k selection: each
  * must translate to a `metadata.<key>` source filter (the
  * [[PushMetadataFilters.translate]] surface — what `FilterDialects`
  * renders and the readers' `FilterEval` applies ahead of local top-k),
  * or be one of the optimizer's inferred `isnotnull(<canonical column>)`
  * tautologies (the canonical record model has no null ids/metadata maps,
  * so those drop nothing). A single conjunct outside that surface blocks
  * the rewrite — it would re-filter AFTER per-partition selection and
  * drop winners (the filter-after-top-k hazard), so such plans keep the
  * scan + Spark TakeOrdered shape. The Filter node itself stays in the
  * plan as the correctness backstop, same contract as
  * [[PushMetadataFilters]].
  */
object PushVectorSearch extends Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // Limit over Sort, optionally with a pure Project in between (the
    // optimizer hoists output pruning above the Sort). The two shapes are
    // disjoint, and each evaluates the (traversing) extraction ONCE —
    // returning the node unchanged when it does not rewrite.
    case limit @ GlobalLimit(IntegerLiteral(k), ll @ LocalLimit(_,
        sort @ Sort(SortOrder(scoreExpr, dir, _, _) +: _, true, child, _))) =>
      findRewrite(scoreExpr, dir, child, k) match {
        case Some(rewritten) =>
          limit.copy(child = ll.copy(child = sort.copy(child = rewritten)))
        case None => limit
      }

    case limit @ GlobalLimit(IntegerLiteral(k), ll @ LocalLimit(_, proj @ Project(_,
        sort @ Sort(SortOrder(scoreExpr, dir, _, _) +: _, true, child, _)))) =>
      findRewrite(scoreExpr, dir, child, k) match {
        case Some(rewritten) =>
          limit.copy(child = ll.copy(child = proj.copy(child =
            sort.copy(child = rewritten))))
        case None => limit
      }
  }

  /** Returns the child with the relation swapped for a search-enabled one,
    * when the score expression is a supported metric against a literal
    * query and the path to the relation is projection-only. */
  private def findRewrite(scoreExpr: Expression, dir: SortDirection, child: LogicalPlan,
                          k: Int): Option[LogicalPlan] = {
    val resolved = resolveScore(scoreExpr, dir, child, k)
    resolved.flatMap { spec =>
      child match {
        case r @ DataSourceV2Relation(t: VSTable, _, _, _, _, _) if t.search.isEmpty =>
          Some(r.copy(table = t.withSearch(spec)))
        case p @ Project(_, r @ DataSourceV2Relation(t: VSTable, _, _, _, _, _))
          if t.search.isEmpty =>
          Some(p.copy(child = r.copy(table = t.withSearch(spec))))
        case filt @ LFilter(cond, r @ DataSourceV2Relation(t: VSTable, _, _, _, _, _))
          if t.search.isEmpty =>
          absorb(cond, t).map(t2 =>
            filt.copy(child = r.copy(table = t2.withSearch(spec))))
        case p @ Project(_,
            filt @ LFilter(cond, r @ DataSourceV2Relation(t: VSTable, _, _, _, _, _)))
          if t.search.isEmpty =>
          absorb(cond, t).map(t2 => p.copy(child =
            filt.copy(child = r.copy(table = t2.withSearch(spec)))))
        case _ => None
      }
    }
  }

  /** The whole Filter condition as store-side filters, or None when any
    * conjunct cannot reach the store before top-k. Inferred
    * `isnotnull(<bare canonical column>)` conjuncts are tautologies over
    * this source (records carry non-null ids and materialized metadata
    * maps by the write-path model) and may stay plan-side; everything
    * else must translate AND be null-strict (below). Installed filters
    * are deduplicated against any [[PushMetadataFilters]] copy already on
    * the table (rule order within the optimizer batch is not fixed). */
  private def absorb(cond: Expression, t: VSTable): Option[VSTable] = {
    val rest = splitConjunctivePredicates(cond).filterNot {
      case IsNotNull(_: AttributeReference) => true
      case _ => false
    }
    val translated = rest.map(PushMetadataFilters.translate)
    if (translated.forall(f => f.isDefined && nullStrict(f.get)))
      Some(t.withBackendFilters((t.backendFilters ++ translated.flatten).distinct))
    else None
  }

  /** Store-side filter evaluation is 2-valued (a missing metadata key is
    * plain FALSE — `FilterEval`, and real services match the same way:
    * Qdrant renders Not as `must_not`, which MATCHES records lacking the
    * key) while Spark is 3-valued (missing → NULL → row dropped). For a
    * positive predicate the two agree on what's EXCLUDED, so the store is
    * never looser — but under Not they invert differently: the store
    * passes missing-key rows Spark would drop, those rows occupy top-k
    * slots, and the retained plan Filter then drops them AFTER selection —
    * evicting genuine winners (the filter-after-top-k hazard, reached
    * through null semantics instead of an untranslated conjunct). So
    * absorption refuses any Not whose child can be null-valued; Not over
    * the null-UNAMBIGUOUS IsNull/IsNotNull stays eligible, and the same
    * divergence cannot hide under And/Or of positive atoms. Plain scans
    * keep pushing Not (their plan Filter re-check is sound — looseness
    * only ships extra rows); only SEARCH absorption needs null-strictness. */
  private[graft] def nullStrict(filter: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.{sources => f}
    filter match {
      case f.Not(f.IsNull(_)) | f.Not(f.IsNotNull(_)) => true
      case f.Not(_) => false
      case f.And(l, r) => nullStrict(l) && nullStrict(r)
      case f.Or(l, r) => nullStrict(l) && nullStrict(r)
      case _ => true
    }
  }

  /** Extract a [[SearchSpec]] from the score expression: best-first means
    * cosine DESCENDING or hamming ASCENDING — the opposite directions are
    * worst-first scans and must NOT become searches. Follows one level of
    * Project aliasing. */
  private def resolveScore(e: Expression, dir: SortDirection, child: LogicalPlan,
                           k: Int): Option[SearchSpec] = e match {
    case VectorKernel(l, r, VectorKernel.Cosine) if dir == Descending =>
      (literalVector(l), literalVector(r)) match {
        case (Some(qv), None) if isVectorAttr(r) => Some(SearchSpec(qv, k))
        case (None, Some(qv)) if isVectorAttr(l) => Some(SearchSpec(qv, k))
        case _ => None
      }
    case BinaryHammingExpr(l, r) if dir == Ascending =>
      (literalBytes(l), literalBytes(r)) match {
        case (Some(qb), None) if isVectorAttr(r) =>
          Some(SearchSpec(null, k, binary = qb, metric = "hamming"))
        case (None, Some(qb)) if isVectorAttr(l) =>
          Some(SearchSpec(null, k, binary = qb, metric = "hamming"))
        case _ => None
      }
    case a: AttributeReference =>
      child.collectFirst {
        case Project(projectList, grandchild)
          if projectList.exists(_.exprId == a.exprId) =>
          projectList.find(_.exprId == a.exprId).collect {
            case Alias(inner, _) => resolveScore(inner, dir, grandchild, k)
          }.flatten
      }.flatten
    case Alias(inner, _) => resolveScore(inner, dir, child, k)
    case _ => None
  }

  private def literalBytes(e: Expression): Option[Array[Byte]] = e match {
    case Literal(b: Array[Byte], BinaryType) => Some(b)
    case _ => None
  }

  private def isVectorAttr(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == graft.model.Canonical.VECTOR
    case _ => false
  }

  private def literalVector(e: Expression): Option[Array[Float]] = e match {
    case Literal(data: ArrayData, ArrayType(FloatType, _)) => Some(data.toFloatArray())
    case Literal(data: ArrayData, ArrayType(DoubleType, _)) =>
      Some(data.toDoubleArray().map(_.toFloat))
    case CreateArray(children, _) if children.forall(_.foldable) =>
      val vals = children.map(_.eval())
      if (vals.forall(v => v.isInstanceOf[Float] || v.isInstanceOf[Double]))
        Some(vals.map {
          case f: Float => f
          case d: Double => d.toFloat
        }.toArray)
      else None
    case _ => None
  }
}
