package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorAggFunctions, VectorExpressions}

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * primitive under IVF index construction and semantic (centroid-bucket)
  * dedup. Reference scope stops at store-to-store migration; this serves
  * the index-building side of the stores it migrates (IVF cell lists).
  *
  * Scale shape per iteration: one broadcast of k centers (k·dim doubles),
  * one n×k broadcast-join scored with the codegen'd l2 kernel, one
  * map-side-combined argmin (min over a (dist, center) struct — no window,
  * no sort), one vecCentroid aggregate (a single dim-length buffer per
  * cluster through the shuffle). Nothing driver-side; centers stay a
  * DataFrame, eagerly checkpointed per round so lineage stays flat.
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

  /** Assign each vector to its nearest center (l2; ties break to the
    * lowest center_id via the struct ordering — deterministic under any
    * partitioning). Output: idCol, cluster_id, dist. */
  def assign(df: DataFrame, centers: DataFrame, vecCol: String = "embedding",
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
