package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
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
  * Conservative by design: only fires when the sort child is the relation
  * itself or a pure Project over it (an intervening Filter could drop
  * partition winners after selection, so those plans are left alone).
  */
object PushVectorSearch extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // Limit over Sort, optionally with a pure Project in between (the
    // optimizer hoists output pruning above the Sort)
    case limit @ GlobalLimit(IntegerLiteral(k), ll @ LocalLimit(_,
        sort @ Sort(SortOrder(scoreExpr, dir, _, _) +: _, true, child, _)))
      if findRewrite(scoreExpr, dir, child, k).isDefined =>
      limit.copy(child = ll.copy(child =
        sort.copy(child = findRewrite(scoreExpr, dir, child, k).get)))

    case limit @ GlobalLimit(IntegerLiteral(k), ll @ LocalLimit(_, proj @ Project(_,
        sort @ Sort(SortOrder(scoreExpr, dir, _, _) +: _, true, child, _))))
      if findRewrite(scoreExpr, dir, child, k).isDefined =>
      limit.copy(child = ll.copy(child = proj.copy(child =
        sort.copy(child = findRewrite(scoreExpr, dir, child, k).get))))
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
        case _ => None
      }
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
