package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PqExpressions

/** Product quantization: train sub-codebooks with the distributed k-means,
  * encode a collection to m-byte codes, and run asymmetric-distance (ADC)
  * top-k over the codes. Composes the engine's own primitives —
  * [[Clustering.fitCenters]] per subspace, a fused encode kernel
  * ([[graft.functions.PqEncodeExpr]]), and the broadcast-query scan shape
  * of [[Similarity.bruteForceTopK]].
  *
  * This is the memory format for ANN at 100 TB: 64-dim float32 embeddings
  * (256 B) compress to m=8 one-byte-ish codes, so the scan reads ~32× fewer
  * bytes and scoring is m table lookups per candidate instead of a d-dim
  * kernel. The reference migrates vectors verbatim and delegates search to
  * the target store (`adapters/qdrant.py:163-169`); here the index
  * quantizer itself is a first-class Spark pipeline.
  */
object Quantization {

  /** Train per-subspace codebooks: split `vecCol` into `m` contiguous
    * subvectors of dim/m components, run `iters` Lloyd's rounds on each
    * (deterministic lowest-id seeds — `iters = 1` IS the seed set, which
    * keeps the encode gate SQL-replayable), and collect the centers.
    *
    * Result shape: codebooks(s)(c) = codeword c of subspace s, where c is
    * the position in center-id order. Size m·ksub·(dim/m) doubles — a
    * bounded driver collect exactly like the IVF cell seeds. Training cost:
    * m independent fitCenters passes over an (id, subvector) projection;
    * each pass prunes to dim/m of the vector width, so the total bytes
    * scanned ≈ `iters` full-corpus reads regardless of m. */
  def pqTrain(df: DataFrame, m: Int, ksub: Int, iters: Int = 1,
              vecCol: String = "embedding", idCol: String = "vec_id"): Array[Array[Array[Double]]] = {
    require(m > 0 && ksub > 0 && iters > 0)
    val dim = Similarity.resolveDim(df, vecCol, -1)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    (0 until m).map { s =>
      val sub = df.select(col(idCol),
        slice(transform(col(vecCol), _.cast("double")), s * dsub + 1, dsub).as("sub"))
      Clustering.fitCenters(sub, ksub, iters, "sub", idCol)
        .orderBy("center_id")
        .select(transform(col("center"), _.cast("double")))
        .collect().map(_.getSeq[Double](0).toArray)
    }.toArray
  }

  /** struct(codes, recon_err) for each vector — one fused compiled pass
    * ([[graft.functions.PqEncodeExpr]]). */
  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    PqExpressions.pqEncode(v, codebooks)

  /** PQ reconstruction of a code array: concat of the selected codewords —
    * the decode side of the format, as a plain column expression over the
    * broadcast codebooks. */
  def pqDecode(codes: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val subs = codebooks.zipWithIndex.map { case (cb, s) =>
      element_at(typedLit(cb.map(_.toSeq).toSeq), element_at(codes, s + 1) + 1)
    }
    concat(subs: _*)
  }

  /** ADC top-k: encode the candidates once (a full scan producing the
    * narrow codes column), precompute each query's m×ksub distance table on
    * the driver (queries are FEW — same broadcast contract as
    * [[Similarity.bruteForceTopK]]), then score every (candidate, query)
    * with m lookups and keep the k nearest per query. Ties break to the
    * lowest candidate id. Output: (query_id, cand_id, dist, rk) — dist is
    * the asymmetric l2 approximation, rounded like the exact ops.
    *
    * The scan shape at scale: one narrow pass over the codes, a broadcast
    * nested-loop against the tiny query set, one shuffle for the per-query
    * top-k window — identical plan skeleton to brute force, but the scored
    * payload is m ints/candidate instead of the full vector. */
  /** @param reRank 0 = rank purely by ADC distance (dist is the l2
    *               approximation). > 0 = the standard two-stage recipe:
    *               shortlist `reRank` candidates per query by ADC, then
    *               re-score ONLY those against the original vectors and
    *               return the exact-l2 top-k — the quantization error
    *               cancels out of the final ranking while the full-width
    *               vector column is read for k·reRank rows, not the
    *               collection (on near-uniform data where distances
    *               concentrate, this is what restores recall). */
  def pqTopK(candidates: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, ksub: Int = 16, iters: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding",
             reRank: Int = 0): DataFrame = {
    val codebooks = pqTrain(candidates, m, ksub, iters, vecCol, idCol)
    val dsub = codebooks(0)(0).length

    val coded = candidates.select(col(idCol).as("cand_id"),
      pqEncode(col(vecCol), codebooks).getField("codes").as("codes"))

    // bounded collect: the query set (broadcast by contract), one l2² table
    // per query against every codeword
    val qRows = queries
      .select(col(idCol).cast("long"), transform(col(vecCol), _.cast("double")))
      .orderBy(col(idCol)).collect()
    require(qRows.nonEmpty, "empty query set")
    val tables: Array[Array[Array[Double]]] = qRows.map { r =>
      val qv = r.getSeq[Double](1).toArray
      codebooks.zipWithIndex.map { case (cb, s) =>
        cb.map { cw =>
          var acc = 0.0
          var i = 0
          val base = s * dsub
          val lim = math.min(dsub, math.max(qv.length - base, 0))
          while (i < lim) { val d = qv(base + i) - cw(i); acc += d * d; i += 1 }
          acc
        }
      }
    }
    val spark = candidates.sparkSession
    import spark.implicits._
    val qdf = qRows.zipWithIndex.map { case (r, i) => (r.getLong(0), i) }
      .toSeq.toDF("query_id", "query_idx")

    val w = Window.partitionBy("query_id").orderBy(col("dist").asc, col("cand_id").asc)
    val adc = coded.crossJoin(broadcast(qdf))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("dist",
        round(PqExpressions.pqAdcDistance(col("codes"), col("query_idx"), tables), 6))
      .withColumn("rk", row_number().over(w))

    if (reRank <= 0) {
      adc.filter(col("rk") <= k).select("query_id", "cand_id", "dist", "rk")
    } else {
      // two-stage: the ADC shortlist is tiny (queries × reRank rows), so
      // the exact re-score joins it back to the vectors — a broadcast of
      // the shortlist against the collection, one selective scan
      val shortlist = adc.filter(col("rk") <= math.max(k, reRank))
        .select("query_id", "cand_id")
      val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
      val cv = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"))
      shortlist.join(cv, Seq("cand_id"))
        .join(qv, Seq("query_id"))
        .withColumn("dist",
          round(graft.functions.VectorExpressions.l2(col("q_vec"), col("c_vec")), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select("query_id", "cand_id", "dist", "rk")
    }
  }
}
