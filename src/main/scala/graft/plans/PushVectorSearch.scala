package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.connectors.vectorstore.{SearchSpec, VSTable}
import graft.functions.VectorKernel

/** Optimizer rule: `ORDER BY vec_cosine(vector, <literal>) DESC LIMIT k`
  * over a vector-store relation becomes a NATIVE SEARCH pushed into the
  * scan — each partition returns only its local top-k, and the Sort+Limit
  * left in place merges partition winners into the exact global answer.
  * The scan's output shrinks from |collection| to partitions×k rows, which
  * is the difference between shipping 100 TB through a sort and shipping a
  * few thousand rows.
  *
  * This is the DSv2 analog of what the reference's backends do natively
  * (Qdrant/Milvus/Pinecone search endpoints); registered through
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
        sort @ Sort(SortOrder(scoreExpr, Descending, _, _) +: _, true, child, _)))
      if findRewrite(scoreExpr, child, k).isDefined =>
      limit.copy(child = ll.copy(child = sort.copy(child = findRewrite(scoreExpr, child, k).get)))

    case limit @ GlobalLimit(IntegerLiteral(k), ll @ LocalLimit(_, proj @ Project(_,
        sort @ Sort(SortOrder(scoreExpr, Descending, _, _) +: _, true, child, _))))
      if findRewrite(scoreExpr, child, k).isDefined =>
      limit.copy(child = ll.copy(child = proj.copy(child =
        sort.copy(child = findRewrite(scoreExpr, child, k).get))))
  }

  /** Returns the child with the relation swapped for a search-enabled one,
    * when the score expression is a cosine against a literal query vector
    * and the path to the relation is projection-only. */
  private def findRewrite(scoreExpr: Expression, child: LogicalPlan,
                          k: Int): Option[LogicalPlan] = {
    val resolved = resolveScore(scoreExpr, child)
    resolved.flatMap { qv =>
      child match {
        case r @ DataSourceV2Relation(t: VSTable, _, _, _, _, _) if t.search.isEmpty =>
          Some(r.copy(table = t.withSearch(SearchSpec(qv, k))))
        case p @ Project(_, r @ DataSourceV2Relation(t: VSTable, _, _, _, _, _))
          if t.search.isEmpty =>
          Some(p.copy(child = r.copy(table = t.withSearch(SearchSpec(qv, k)))))
        case _ => None
      }
    }
  }

  /** Extract the literal query vector from `vec_cosine(vector, lit)` /
    * `vec_cosine(lit, vector)`, following one level of Project aliasing. */
  private def resolveScore(e: Expression, child: LogicalPlan): Option[Array[Float]] = e match {
    case VectorKernel(l, r, VectorKernel.Cosine) =>
      (literalVector(l), literalVector(r)) match {
        case (Some(qv), None) if isVectorAttr(r) => Some(qv)
        case (None, Some(qv)) if isVectorAttr(l) => Some(qv)
        case _ => None
      }
    case a: AttributeReference =>
      child.collectFirst {
        case Project(projectList, grandchild)
          if projectList.exists(_.exprId == a.exprId) =>
          projectList.find(_.exprId == a.exprId).collect {
            case Alias(inner, _) => resolveScore(inner, grandchild)
          }.flatten
      }.flatten
    case Alias(inner, _) => resolveScore(inner, child)
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
