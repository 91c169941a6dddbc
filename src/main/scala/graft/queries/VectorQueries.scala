package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Vector-math operator inventory over the `embeddings` table: the distance
  * metrics the reference only names when creating collections
  * (`adapters/qdrant.py:163-169` Cosine/Euclid/Dot) made first-class, plus
  * normalize and distributed centroids.
  */
object VectorQueries {

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b)))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vec_norms" -> ((s, dir) =>
      Tables(s, dir, "embeddings").select(
        col("vec_id"),
        round(l2Norm(col("embedding")), 6).as("l2"),
        dim(col("embedding")).as("d"))),

    // consecutive-id pairs: dot / cosine / l2 distance
    "q_vec_pair_metrics" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(
          col("id_a"),
          round(dotProduct(col("va"), col("vb")), 6).as("dot"),
          round(cosineSimilarity(col("va"), col("vb")), 6).as("cosine"),
          round(l2Distance(col("va"), col("vb")), 6).as("l2_dist"))
    }),

    "q_vec_normalize" -> ((s, dir) =>
      Tables(s, dir, "embeddings").select(
        col("vec_id"),
        round(element_at(normalize(col("embedding")), 1), 6).as("u1"),
        round(l2Norm(normalize(col("embedding"))), 6).as("unit_norm"))),

    // distributed centroid, explode formulation: posexplode → partial-agg
    // on (label, pos). Shuffles |labels|×dim rows.
    "q_vec_centroid" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(round(avg(col("v").cast("double")), 6).as("centroid_v"))
        .select(col("label"), (col("pos") + 1).as("pos"), col("centroid_v"))),

    // symmetric int8 quantization (4× smaller storage for big collections):
    // per-vector scale + quantized codes + worst-dim reconstruction error.
    // One codegen'd kernel pass emits all three as a struct; the struct
    // lands in its own projection (referenced 3×, so CollapseProject keeps
    // it — the kernel runs once per row, not once per output column).
    // Codes go out array_join'd (driver compare can't hash raw arrays).
    "q_vec_quantize" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          graft.functions.VectorExpressions.int8Quantize(col("embedding")).as("q"))
        .select(
          col("vec_id"),
          round(col("q.scale"), 6).as("q_scale"),
          array_join(transform(col("q.codes"), _.cast("string")), ",").as("q_str"),
          round(col("q.max_err"), 6).as("q_err"))),

    // one Lloyd's assignment step from deterministic seeds (k lowest ids):
    // broadcast centers, codegen'd l2, struct-min argmin — SQL-replayable
    "q_kmeans_assign" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      graft.ops.Clustering.assign(e, graft.ops.Clustering.initCenters(e, 8))
        .select(col("vec_id"), col("cluster_id"), round(col("dist"), 6).as("dist"))
    }),

    // the centroid update that follows it: avg per (cluster, dimension)
    "q_kmeans_centroids" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      graft.ops.Clustering.assign(e, graft.ops.Clustering.initCenters(e, 8))
        .join(e, "vec_id")
        .select(col("cluster_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cluster_id", "pos")
        .agg(round(avg(col("v").cast("double")), 6).as("centroid_v"))
        .select(col("cluster_id"), (col("pos") + 1).as("pos"), col("centroid_v"))
    }),

    // distributed centroid, custom-aggregate formulation: vec_sum is a
    // TypedImperativeAggregate with a double[] buffer — map-side combine
    // shrinks each partition's contribution to ONE dim-length buffer per
    // group BEFORE the shuffle (the 100 TB layout; the explode variant
    // above shuffles dim× more rows). Same oracle as q_vec_centroid.
    "q_vec_centroid_agg" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .groupBy("label")
        .agg(graft.functions.VectorAggFunctions.vecCentroid(col("embedding")).as("c"))
        .select(col("label"), posexplode(col("c")).as(Seq("pos", "cv")))
        .select(col("label"), (col("pos") + 1).as("pos"),
          round(col("cv"), 6).as("centroid_v"))),

    // product quantization, encode side: m=2 subspaces × ksub=4 codewords
    // trained at iters=1 (deterministic lowest-id seeds — the codebooks are
    // the subvector slices of vec_id < 4, which the oracle replays in SQL
    // exactly like the q_kmeans gates). Codes + the l2 reconstruction
    // error, all from ONE fused kernel pass.
    "q_vec_pq" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val cb = graft.ops.Quantization.pqTrain(e, m = 2, ksub = 4, iters = 1)
      e.select(col("vec_id"),
          graft.ops.Quantization.pqEncode(col("embedding"), cb).as("pq"))
        .select(col("vec_id"),
          element_at(col("pq.codes"), 1).as("code_0"),
          element_at(col("pq.codes"), 2).as("code_1"),
          round(col("pq.recon_err"), 6).as("pq_err"))
    }),

    // product quantization, search side: asymmetric-distance top-3 per
    // query over the SAME iters=1 codebooks — every stage (encode, per-query
    // distance tables, ADC ranking) is replayed by the oracle in SQL.
    "q_ann_pq" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      graft.ops.Quantization.pqTopK(e, e.filter(col("vec_id") < 5), k = 3,
        m = 2, ksub = 4, iters = 1)
    }),

    // binary (sign-bit) quantization: 1 bit per dimension packed into
    // 32-bit words — the 32× storage format behind Hamming retrieval. Pure
    // integer construction, so the oracle rebuilds every word with shifts
    // and sums; words go out joined (driver compare can't hash arrays).
    "q_vec_binarize" -> ((s, dir) =>
      Tables(s, dir, "embeddings").select(
        col("vec_id"),
        size(filter(col("embedding"), x => x > lit(0f))).as("n_pos"),
        array_join(transform(
          graft.functions.BinaryVectors.signBitsWords(col("embedding")), _.cast("string")),
          ",").as("words_str"))),

    // Hamming-distance top-3 over the sign-bit words: XOR+popcount per
    // candidate, ties on cand_id — fully integer, fully SQL-replayable
    "q_ann_hamming" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      graft.ops.Similarity.hammingTopK(e, e.filter(col("vec_id") < 5), k = 3)
    }),

    // blocked binary near-dup pairs: sign-prefix buckets + in-bucket
    // Hamming verify — the SimHash blocking recipe on embeddings, all
    // integer math, every stage replayed by the oracle
    "q_dedup_binary" -> ((s, dir) =>
      graft.ops.Dedup.binaryNearDupPairs(Tables(s, dir, "embeddings"),
        maxHamming = 24, prefixBits = 8)),

    // IVF-PQ (IVFADC): coarse cells from the 2 lowest-id seeds, PQ over
    // RESIDUALS (seeded by the 4 lowest-id residuals — the first two are
    // exactly zero since those vectors ARE the cell centers, which the
    // oracle reproduces too), exhaustive probe, per-(query, cell) ADC
    // tables. Every stage replayed in SQL; quality configs are spec-tested.
    "q_ann_ivfpq" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      graft.ops.Quantization.ivfPqTopK(e, e.filter(col("vec_id") < 5), k = 3,
        nCells = 2, nProbe = 2, m = 2, ksub = 4)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_vec_norms" ->
      ("SELECT vec_id, round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), " +
        "CAST(embedding AS DOUBLE[]))), 6) AS l2, CAST(len(embedding) AS INT) AS d FROM embeddings"),
    "q_vec_pair_metrics" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings) " +
        "SELECT a.vec_id AS id_a, " +
        // "+ 0.0": -0.0 → +0.0 to match Spark's BigDecimal round
        "round(list_dot_product(a.v, b.v), 6) + 0.0 AS dot, " +
        s"round(${cosSql("a.v", "b.v")}, 6) + 0.0 AS cosine, " +
        "round(sqrt(list_dot_product(list_transform(range(len(a.v)), i -> a.v[i+1]-b.v[i+1]), " +
        "list_transform(range(len(a.v)), i -> a.v[i+1]-b.v[i+1]))), 6) AS l2_dist " +
        "FROM e a JOIN e b ON b.vec_id = a.vec_id + 1"),
    "q_vec_normalize" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v, " +
        "sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n " +
        "FROM embeddings) " +
        "SELECT vec_id, round(CASE WHEN n = 0 THEN v[1] ELSE v[1]/n END, 6) + 0.0 AS u1, " +
        "round(CASE WHEN n = 0 THEN n ELSE sqrt(list_dot_product(" +
        "list_transform(v, x -> x/n), list_transform(v, x -> x/n))) END, 6) AS unit_norm " +
        "FROM e"),
    "q_vec_centroid" ->
      ("SELECT label, CAST(pos AS INT) AS pos, round(avg(v), 6) + 0.0 AS centroid_v FROM " +
        "(SELECT label, generate_subscripts(embedding, 1) AS pos, " +
        "unnest(CAST(embedding AS DOUBLE[])) AS v FROM embeddings) " +
        "GROUP BY label, pos"),
    "q_kmeans_assign" ->
      // same l2 element-order math as q_vec_pair_metrics; argmin via
      // row_number(dist, center_id) = Spark's min(struct(dist, center_id))
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        "c AS (SELECT vec_id AS center_id, v AS cv FROM e WHERE vec_id < 8), " +
        "s AS (SELECT e.vec_id, c.center_id, " +
        "sqrt(list_dot_product(list_transform(range(len(e.v)), i -> e.v[i+1]-c.cv[i+1]), " +
        "list_transform(range(len(e.v)), i -> e.v[i+1]-c.cv[i+1]))) AS dist " +
        "FROM e CROSS JOIN c) " +
        "SELECT vec_id, cluster_id, round(dist, 6) AS dist FROM " +
        "(SELECT vec_id, center_id AS cluster_id, dist, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY dist, center_id) AS rn FROM s) " +
        "WHERE rn = 1"),
    "q_kmeans_centroids" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        "c AS (SELECT vec_id AS center_id, v AS cv FROM e WHERE vec_id < 8), " +
        "s AS (SELECT e.vec_id, c.center_id, " +
        "sqrt(list_dot_product(list_transform(range(len(e.v)), i -> e.v[i+1]-c.cv[i+1]), " +
        "list_transform(range(len(e.v)), i -> e.v[i+1]-c.cv[i+1]))) AS dist " +
        "FROM e CROSS JOIN c), " +
        "a AS (SELECT vec_id, center_id AS cluster_id FROM " +
        "(SELECT vec_id, center_id, row_number() OVER (PARTITION BY vec_id " +
        "ORDER BY dist, center_id) AS rn FROM s) WHERE rn = 1) " +
        "SELECT cluster_id, CAST(pos AS INT) AS pos, round(avg(ev), 6) + 0.0 AS centroid_v FROM " +
        "(SELECT a.cluster_id, generate_subscripts(em.embedding, 1) AS pos, " +
        "unnest(CAST(em.embedding AS DOUBLE[])) AS ev " +
        "FROM a JOIN embeddings em ON a.vec_id = em.vec_id) " +
        "GROUP BY cluster_id, pos"),
    "q_vec_quantize" ->
      // floor(x/s + 0.5) rounding on both sides: Spark round() HALF_UPs,
      // DuckDB CAST rounds half-even — floor(+0.5) is the portable form
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        "s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / " +
        "CAST(127.0 AS DOUBLE) AS sc FROM e) " +
        "SELECT vec_id, round(sc, 6) AS q_scale, " +
        "array_to_string(list_transform(v, x -> CAST(CASE WHEN sc = 0 THEN 0 " +
        "ELSE CAST(floor(x / sc + CAST(0.5 AS DOUBLE)) AS INT) END AS VARCHAR)), ',') AS q_str, " +
        "round(list_max(list_transform(v, x -> abs(CAST(CASE WHEN sc = 0 THEN 0 " +
        "ELSE CAST(floor(x / sc + CAST(0.5 AS DOUBLE)) AS INT) END AS DOUBLE) * sc - x))), 6) " +
        "AS q_err FROM s"),
    "q_vec_centroid_agg" ->
      ("SELECT label, CAST(pos AS INT) AS pos, round(avg(v), 6) + 0.0 AS centroid_v FROM " +
        "(SELECT label, generate_subscripts(embedding, 1) AS pos, " +
        "unnest(CAST(embedding AS DOUBLE[])) AS v FROM embeddings) " +
        "GROUP BY label, pos"),
    "q_vec_binarize" ->
      (s"SELECT vec_id, CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos, " +
        s"array_to_string($signWordsSql, ',') AS words_str FROM embeddings"),
    "q_ann_hamming" ->
      (s"WITH wds AS (SELECT vec_id, $signWordsSql AS w FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, w AS qw FROM wds WHERE vec_id < 5), " +
        "c AS (SELECT vec_id AS cand_id, w AS cw FROM wds), " +
        "s AS (SELECT query_id, cand_id, CAST(list_aggregate(list_transform(range(len(qw)), " +
        "i -> bit_count(xor(qw[i+1], cw[i+1]))), 'sum') AS INT) AS hamming " +
        "FROM q JOIN c ON cand_id <> query_id) " +
        "SELECT query_id, cand_id, hamming, CAST(rn AS INT) AS rk FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY hamming, cand_id) AS rn " +
        "FROM s) WHERE rn <= 3"),
    "q_dedup_binary" ->
      (s"WITH wds AS (SELECT vec_id, $signWordsSql AS w FROM embeddings), " +
        "b AS (SELECT vec_id, w, w[1] % 256 AS blk FROM wds), " +
        "p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b, " +
        "CAST(list_aggregate(list_transform(range(len(a.w)), " +
        "i -> bit_count(xor(a.w[i+1], c.w[i+1]))), 'sum') AS INT) AS hamming " +
        "FROM b a JOIN b c ON a.blk = c.blk AND a.vec_id < c.vec_id) " +
        "SELECT id_a, id_b, hamming FROM p WHERE hamming <= 24"),
    "q_vec_pq" ->
      (s"WITH $pqCodeCtes " +
        "SELECT a0.vec_id, CAST(a0.code AS INT) AS code_0, CAST(a1.code AS INT) AS code_1, " +
        "round(sqrt(a0.d + a1.d), 6) AS pq_err " +
        "FROM a0 JOIN a1 ON a0.vec_id = a1.vec_id"),
    "q_ann_ivfpq" ->
      (s"WITH $ivfPqCtes, " +
        // query residual per (query, cell) — exhaustive probe, so every
        // cell gets a table; halves like the candidate residuals
        "q AS (SELECT e.vec_id AS query_id, c.center_id AS cell_id, " +
        "list_transform(range(len(e.v)), i -> e.v[i+1]-c.cv[i+1]) AS qres " +
        "FROM e CROSS JOIN c WHERE e.vec_id < 5), " +
        "qsub AS (SELECT query_id, cell_id, qres[1:len(qres)//2] AS q0, " +
        "qres[len(qres)//2+1:len(qres)] AS q1 FROM q), " +
        s"sc AS (SELECT qsub.query_id, cand.cand_id, " +
        s"round(sqrt(${l2sqSql("qsub.q0", "cand.w0")} + ${l2sqSql("qsub.q1", "cand.w1")}), 6) AS dist " +
        "FROM qsub JOIN cand ON qsub.cell_id = cand.cell_id AND cand.cand_id <> qsub.query_id) " +
        "SELECT query_id, cand_id, dist, CAST(rn AS INT) AS rk FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, cand_id) AS rn " +
        "FROM sc) WHERE rn <= 3"),
    "q_ann_pq" ->
      (s"WITH $pqCodeCtes, " +
        // candidate → its two codeword VECTORS (the PQ reconstruction)
        "cva AS (SELECT a0.vec_id AS cand_id, cb0.c0 AS w0, cb1.c1 AS w1 " +
        "FROM a0 JOIN a1 ON a0.vec_id = a1.vec_id " +
        "JOIN cb cb0 ON cb0.code = a0.code JOIN cb cb1 ON cb1.code = a1.code), " +
        "q AS (SELECT vec_id AS query_id, s0 AS q0, s1 AS q1 FROM sub WHERE vec_id < 5), " +
        // ADC distance: l2²(query subvector, candidate codeword), summed
        s"sc AS (SELECT q.query_id, cva.cand_id, " +
        s"round(sqrt(${l2sqSql("q.q0", "cva.w0")} + ${l2sqSql("q.q1", "cva.w1")}), 6) AS dist " +
        "FROM q CROSS JOIN cva WHERE cand_id <> query_id) " +
        "SELECT query_id, cand_id, dist, CAST(rn AS INT) AS rk FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, cand_id) AS rn " +
        "FROM sc) WHERE rn <= 3")
  )

  /** Sign-bit words of the embeddings table as a DuckDB list expression:
    * word wi = Σ_k (1 << k) over dimensions 32·wi + k that are > 0 — the
    * [[graft.functions.SignBitsWordsExpr]] twin (32-bit lanes keep every
    * word positive in int64, so plain shifts+sums reproduce them). */
  private def signWordsSql: String =
    "list_transform(range(0, (len(embedding)+31)//32), wi -> " +
      "CAST(list_aggregate(list_transform(range(0, least(CAST(32 AS BIGINT), len(embedding)-wi*32)), " +
      "k -> CASE WHEN embedding[wi*32+k+1] > 0 THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) " +
      "ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT))"

  /** l2² of two DuckDB double lists, same left-to-right accumulation as the
    * Spark kernels. */
  private def l2sqSql(a: String, b: String): String =
    s"list_dot_product(list_transform(range(len($a)), i -> $a[i+1]-$b[i+1]), " +
      s"list_transform(range(len($a)), i -> $a[i+1]-$b[i+1]))"

  /** IVF-PQ replay CTEs (nCells=2, m=2, ksub=4, iters=1): coarse centers =
    * the 2 lowest-id vectors; every vector's cell = argmin l2² (ties to the
    * lowest center id, like NearestResidualExpr); residual = v − center;
    * residual codebook = the residual halves of the 4 lowest-id vectors;
    * codes = per-subspace argmin; `cand` = each candidate's cell + selected
    * codeword VECTORS. */
  private def ivfPqCtes: String =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
      "c AS (SELECT vec_id AS center_id, v AS cv FROM e WHERE vec_id < 2), " +
      s"ad AS (SELECT e.vec_id, c.center_id, ${l2sqSql("e.v", "c.cv")} AS d " +
      "FROM e CROSS JOIN c), " +
      "a AS (SELECT vec_id, center_id AS cell_id FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY vec_id ORDER BY d, center_id) AS rn FROM ad) WHERE rn = 1), " +
      "r AS (SELECT e.vec_id, a.cell_id, " +
      "list_transform(range(len(e.v)), i -> e.v[i+1]-c.cv[i+1]) AS res " +
      "FROM e JOIN a ON a.vec_id = e.vec_id JOIN c ON c.center_id = a.cell_id), " +
      "rsub AS (SELECT vec_id, cell_id, res[1:len(res)//2] AS s0, " +
      "res[len(res)//2+1:len(res)] AS s1 FROM r), " +
      "rcb AS (SELECT vec_id AS code, s0 AS c0, s1 AS c1 FROM rsub WHERE vec_id < 4), " +
      s"rd0 AS (SELECT rsub.vec_id, rcb.code, ${l2sqSql("rsub.s0", "rcb.c0")} AS d " +
      "FROM rsub CROSS JOIN rcb), " +
      "ra0 AS (SELECT vec_id, code FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY vec_id ORDER BY d, code) AS rn FROM rd0) WHERE rn = 1), " +
      s"rd1 AS (SELECT rsub.vec_id, rcb.code, ${l2sqSql("rsub.s1", "rcb.c1")} AS d " +
      "FROM rsub CROSS JOIN rcb), " +
      "ra1 AS (SELECT vec_id, code FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY vec_id ORDER BY d, code) AS rn FROM rd1) WHERE rn = 1), " +
      "cand AS (SELECT ra0.vec_id AS cand_id, rsub.cell_id, cb0.c0 AS w0, cb1.c1 AS w1 " +
      "FROM ra0 JOIN ra1 ON ra0.vec_id = ra1.vec_id " +
      "JOIN rsub ON rsub.vec_id = ra0.vec_id " +
      "JOIN rcb cb0 ON cb0.code = ra0.code JOIN rcb cb1 ON cb1.code = ra1.code)"

  /** Shared PQ replay CTEs (m=2, ksub=4, iters=1): split each vector into
    * two halves, codebook = the halves of the 4 lowest-id vectors (code =
    * vec_id — exactly Clustering.initCenters' seed order), and a0/a1 = each
    * vector's argmin codeword per subspace (ties to the lowest code, like
    * PqEncodeExpr). */
  private def pqCodeCtes: String =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
      "sub AS (SELECT vec_id, v[1:len(v)//2] AS s0, v[len(v)//2+1:len(v)] AS s1 FROM e), " +
      "cb AS (SELECT vec_id AS code, s0 AS c0, s1 AS c1 FROM sub WHERE vec_id < 4), " +
      s"d0 AS (SELECT sub.vec_id, cb.code, ${l2sqSql("sub.s0", "cb.c0")} AS d " +
      "FROM sub CROSS JOIN cb), " +
      "a0 AS (SELECT vec_id, code, d FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY vec_id ORDER BY d, code) AS rn FROM d0) WHERE rn = 1), " +
      s"d1 AS (SELECT sub.vec_id, cb.code, ${l2sqSql("sub.s1", "cb.c1")} AS d " +
      "FROM sub CROSS JOIN cb), " +
      "a1 AS (SELECT vec_id, code, d FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY vec_id ORDER BY d, code) AS rn FROM d1) WHERE rn = 1)"
}
