package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorAggFunctions, VectorExpressions}

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * primitive under IVF index construction and semantic (centroid-bucket)
  * dedup. Reference scope stops at store-to-store migration; this serves
  * the index-building side of the stores it migrates (IVF cell lists).
  *
  * Scale shape per iteration: the k centers (k·dim doubles — bounded,
  * driver-collected like the IVF seeds) ride into a single codegen'd
  * argmin expression, so assignment is ONE corpus scan with no join, no
  * row inflation, and no shuffle; the centroid update is one vecCentroid
  * aggregate (a single dim-length buffer per cluster through the shuffle).
  * Centers stay a DataFrame between rounds, eagerly checkpointed so
  * lineage stays flat.
  */
object Clustering {

  /** Deterministic seed centers: the k lowest-id vectors (k-means++ is a
    * quality upgrade, not a scale requirement — sorted ids keep the gate
    * SQL-replayable). */
  def initCenters(df: DataFrame, k: Int, vecCol: String = "embedding",
                  idCol: String = "vec_id"): DataFrame =
    df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("center_id"),
        transform(col(vecCol), _.cast("double")).as("center"))

  /** Farthest-point (k-center) seeding: start from the lowest-id vector,
    * repeatedly add the point with the LARGEST distance to its nearest
    * chosen center (ties break to the lowest id). Deterministic — no RNG —
    * and spreads seeds across the data's extent where lowest-id seeding
    * can clump. Cost: k-1 assign passes over the corpus (each one
    * broadcast-scored, no shuffle beyond the 1-row TakeOrdered), the
    * known price of this init; at extreme k use k-means|| oversampling
    * instead. The per-round 1-row limit is the same bounded pattern as
    * the IVF seed collect. */
  def initCentersFarthest(df: DataFrame, k: Int, vecCol: String = "embedding",
                          idCol: String = "vec_id"): DataFrame = {
    require(k > 0)
    val vecs = df.select(col(idCol), col(vecCol))
    var centers = Materialize(initCenters(vecs, 1, vecCol, idCol))
    var i = 1
    while (i < k) {
      val next = assign(vecs, centers, vecCol, idCol)
        .orderBy(col("dist").desc, col(idCol).asc).limit(1)
        .join(vecs, idCol)
        .select(col(idCol).as("center_id"),
          transform(col(vecCol), _.cast("double")).as("center"))
      centers = Materialize(centers.union(next))
      i += 1
    }
    centers
  }

  /** Collect a (bounded — k rows, the centers are BY CONSTRUCTION few) center
    * set into id-sorted arrays for the fused argmin kernel. The only
    * driver materialization in the k-means path, same shape as the IVF
    * seed collect (`Similarity.ivfTopK`). */
  private def collectCenters(centers: DataFrame): (Array[Long], Array[Array[Double]]) = {
    val rows = centers
      .select(col("center_id").cast("long"),
        transform(col("center"), _.cast("double")))
      .orderBy("center_id").collect()
    require(rows.nonEmpty, "empty center set")
    (rows.map(_.getLong(0)), rows.map(_.getSeq[Double](1).toArray))
  }

  /** Assign each vector to its nearest center (l2; ties break to the lowest
    * center_id — deterministic under any partitioning). Output: idCol,
    * cluster_id, dist.
    *
    * A PURE MAP: the centers (k rows) are collected once and scored inside
    * one codegen'd expression ([[VectorExpressions.nearestCenter]]) — no
    * crossJoin row inflation, no argmin shuffle. The earlier
    * crossJoin(broadcast) → min(struct) formulation ([[assignViaShuffle]])
    * pushed n×k rows through a partial aggregate; map-side combine kept the
    * shuffle small, but the inflation itself was pure waste — at 100 TB the
    * assign pass is now exactly one corpus scan. */
  def assign(df: DataFrame, centers: DataFrame, vecCol: String = "embedding",
             idCol: String = "vec_id"): DataFrame = {
    val (ids, cs) = collectCenters(centers)
    df.select(col(idCol),
        VectorExpressions.nearestCenter(col(vecCol), ids, cs).as("best"))
      .select(col(idCol), col("best.cluster_id").as("cluster_id"),
        col("best.dist").as("dist"))
  }

  /** The pre-round-5 assignment plan, kept as the parity witness for the
    * fused kernel (and for the hypothetical regime where the center set is
    * too large to collect): crossJoin against broadcast centers, argmin via
    * min over a (dist, center_id) struct. Bit-identical output to
    * [[assign]]. */
  private[graft] def assignViaShuffle(df: DataFrame, centers: DataFrame,
                                      vecCol: String = "embedding",
                                      idCol: String = "vec_id"): DataFrame =
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(centers))
      .select(col(idCol), col(vecCol),
        struct(VectorExpressions.l2(col(vecCol), col("center")).as("dist"),
          col("center_id").as("cluster_id")).as("sc"))
      .groupBy(col(idCol))
      .agg(min(col("sc")).as("best"))
      .select(col(idCol), col("best.cluster_id").as("cluster_id"),
        col("best.dist").as("dist"))

  /** Centers after `iters` Lloyd's rounds (iters = 1 is the raw seed set;
    * each further round is assign → vecCentroid update). Clusters that
    * lose every point drop out (standard Lloyd's behavior — pass a larger
    * k to compensate). Centers stay a DataFrame, eagerly checkpointed per
    * round so lineage stays flat; nothing driver-side. */
  def fitCenters(df: DataFrame, k: Int, iters: Int, vecCol: String = "embedding",
                 idCol: String = "vec_id", farthestInit: Boolean = false): DataFrame = {
    require(k > 0 && iters > 0)
    val vecs = df.select(col(idCol), col(vecCol))
    var centers =
      if (farthestInit) initCentersFarthest(vecs, k, vecCol, idCol)
      else Materialize(initCenters(vecs, k, vecCol, idCol))
    var i = 1
    while (i < iters) {
      centers = Materialize(assign(vecs, centers, vecCol, idCol).join(vecs, idCol)
        .groupBy(col("cluster_id"))
        .agg(VectorAggFunctions.vecCentroid(col(vecCol)).as("center"))
        .select(col("cluster_id").as("center_id"), col("center")))
      i += 1
    }
    centers
  }

  /** Lloyd's k-means: the final (idCol, cluster_id, dist) assignment after
    * `iters` rounds. */
  def kmeans(df: DataFrame, k: Int, iters: Int, vecCol: String = "embedding",
             idCol: String = "vec_id", farthestInit: Boolean = false): DataFrame =
    assign(df.select(col(idCol), col(vecCol)),
      fitCenters(df, k, iters, vecCol, idCol, farthestInit), vecCol, idCol)

  /** Within-cluster sum of squared distances for an assignment — the
    * convergence metric (must be non-increasing over Lloyd's rounds). */
  def inertia(assigned: DataFrame): Double =
    assigned.agg(sum(col("dist") * col("dist"))).head().getDouble(0)
}
