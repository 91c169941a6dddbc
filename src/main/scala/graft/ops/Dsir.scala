package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashExpressions

/** DSIR-style data selection: importance weights from hashed-n-gram
  * likelihood ratios (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023 — public method). Given a small
  * TARGET sample (the distribution you want more of: curated text, a
  * domain, a language) and a SOURCE sample (the raw corpus), each
  * document's weight is its bag-of-hashed-tokens log likelihood ratio
  *
  *   lw(doc) = Σ_tokens [ ln p̂_target(bucket(tok)) − ln p̂_source(bucket(tok)) ]
  *
  * with Laplace-smoothed bucket unigram models p̂(b) = (count(b)+1)/(N+dim).
  * High-weight documents look like the target; selection composes with
  * [[Sampling.weightedSample]] (importance resampling) or a quantile cut.
  *
  * Scale shape (100 TB): the two bucket-count aggregates run over the
  * SAMPLES (explode → groupBy bucket, map-side combined, ≤ `dim` result
  * rows each — the only driver materialization, bounded by construction);
  * the learned `dim`-entry ratio table ships as a literal array, and
  * scoring the full corpus is ONE compiled pass (`aggregate` over the
  * token-hash array — no explode, no join, no shuffle).
  *
  * Portability (the oracle contract): bucket counts are exact integers;
  * each bucket's log-ratio is snapped to the 1e-6 grid as a LONG via
  * `floor(x·1e6 + 0.5)` (exact IEEE on every engine, no -0.0, no
  * round-function divergence); a document's weight is then an exact
  * integer SUM of its buckets' grid values — associative, so hash
  * equality holds under any partitioning, and DuckDB replays the whole
  * pipeline (`q_dsir_weights`).
  */
object Dsir {

  /** Null text scores like empty text (weight 0·grid = 0). */
  private def tokenHashes(text: Column): Column =
    coalesce(HashExpressions.portableTokenHashes(text),
      array().cast("array<bigint>"))

  /** The learned table: bucket b → `floor((ln p̂_t(b) − ln p̂_s(b))·1e6 +
    * 0.5)` as a LONG. Exactly `dim` entries — tiny by construction. */
  def logRatioTable(target: DataFrame, source: DataFrame, dim: Int = 64,
                    textCol: String = "text"): Array[Long] = {
    require(dim > 0)
    def bucketCounts(df: DataFrame): (Map[Long, Long], Long) = {
      // ≤ dim rows cross the seam — the ONLY collect in the op
      val rows = df
        .select(explode(transform(tokenHashes(col(textCol)),
          h => pmod(h, lit(dim.toLong)))).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect()
      val m = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
      (m, m.values.sum)
    }
    val (tc, t) = bucketCounts(target)
    val (sc, s) = bucketCounts(source)
    Array.tabulate(dim) { b =>
      // identical expression shape to the oracle: one ln per model, the
      // ratio formed before ln, floor(x*1e6 + 0.5) to the integer grid
      val x = math.log((tc.getOrElse(b.toLong, 0L) + 1L).toDouble / (t + dim)) -
        math.log((sc.getOrElse(b.toLong, 0L) + 1L).toDouble / (s + dim))
      math.floor(x * 1e6 + 0.5).toLong
    }
  }

  /** Per-document importance weights: `lw6` (BIGINT, the exact integer
    * grid sum) and `dsir_weight` (= lw6/1e6, the float face). One
    * compiled pass over `docs`; the ratio table broadcasts as a literal. */
  def importanceWeights(docs: DataFrame, target: DataFrame, source: DataFrame,
                        dim: Int = 64, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val table = logRatioTable(target, source, dim, textCol)
    weightsWithTable(docs, table, idCol, textCol)
  }

  /** Scoring face for a pre-trained table (fit once on samples, score the
    * full corpus — or a stream: the expression is stateless). */
  def weightsWithTable(docs: DataFrame, table: Array[Long],
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val dim = table.length
    val lrLit = typedlit(table.toSeq)
    docs.select(col(idCol),
      aggregate(tokenHashes(col(textCol)), lit(0L),
        (acc, h) => acc +
          element_at(lrLit, (pmod(h, lit(dim.toLong)) + 1L).cast("int")))
        .as("lw6"))
      .withColumn("dsir_weight", col("lw6").cast("double") / lit(1e6))
  }

  /** Importance-resampled selection: inclusion probability ∝ the true
    * likelihood ratio exp(lw), drawn via [[Sampling.weightedSample]]
    * (weighted reservoir). Weights are max-normalized — `exp((lw6−max)/
    * 1e6)` ∈ (0, 1] — so no overflow; deeply off-target docs underflow to
    * 0 and are excluded, which is the correct limit. Returns the k chosen
    * docs with ALL their original columns plus `lw6`/`dsir_weight` (the
    * chosen id set is k rows by construction, so the join back
    * broadcasts). */
  def select(docs: DataFrame, target: DataFrame, source: DataFrame, k: Int,
             dim: Int = 64, idCol: String = "doc_id", textCol: String = "text",
             seed: Long = 42L): DataFrame = {
    val w = importanceWeights(docs, target, source, dim, idCol, textCol)
    // scalar max via aggregate + broadcast (a global window would funnel
    // the corpus through one partition)
    val mx = w.agg(max(col("lw6")).as("__mx"))
    val ratio = w.crossJoin(broadcast(mx))
      .withColumn("__w", exp((col("lw6") - col("__mx")).cast("double") / lit(1e6)))
      .drop("__mx")
    val chosen = Sampling.weightedSample(ratio, "__w", k, idCol, seed).drop("__w")
    docs.join(broadcast(chosen), Seq(idCol))
  }
}
