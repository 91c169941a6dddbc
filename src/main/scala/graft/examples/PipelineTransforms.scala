package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Canonical
import graft.ops.Sampling

/** Loadable migration transforms surfacing the engine's training-data
  * pipeline ops through the reference's `--transform` CLI face
  * (`cli/migrate.py:66-93`), like [[DedupVectors]]/[[SemanticDedup]] do
  * for dedup. Each is a no-arg `DataFrame => DataFrame` over the
  * canonical frame `{id, vector, metadata}`.
  */

/** `--transform graft.examples.QuantizeVectors`: migrate vectors through
  * symmetric int8 quantization — each vector is replaced by its
  * dequantized reconstruction (code·scale) and the scale + worst-dim
  * error land in metadata, so the target store holds exactly what an
  * int8-code index would serve. One fused kernel pass per row
  * ([[graft.functions.Int8QuantizeExpr]]); records without a vector pass
  * through untouched. */
class QuantizeVectors extends (DataFrame => DataFrame) {
  override def apply(df: DataFrame): DataFrame = {
    val q = graft.functions.VectorExpressions.int8Quantize(col(Canonical.VECTOR))
    df.withColumn("__q", q)
      .withColumn(Canonical.VECTOR,
        when(col("__q").isNull, col(Canonical.VECTOR))
          .otherwise(transform(col("__q.codes"),
            c => (c.cast("double") * col("__q.scale")).cast("float"))))
      .withColumn(Canonical.METADATA,
        when(col("__q").isNull, col(Canonical.METADATA))
          .otherwise(map_concat(coalesce(col(Canonical.METADATA), map()),
            map(lit("q_scale"), col("__q.scale").cast("string"),
              lit("q_max_err"), col("__q.max_err").cast("string")))))
      .drop("__q")
  }
}

/** `--transform graft.examples.AssignSplit`: stamp a deterministic
  * 90/5/5 train/val/test split into metadata during migration. Membership
  * is a pure function of the record id ([[Sampling.split]]'s hash
  * bucket) — stable across runs, partitionings, and re-migrations, so
  * downstream consumers can rely on the split never silently moving. */
class AssignSplit extends (DataFrame => DataFrame) {
  override def apply(df: DataFrame): DataFrame =
    Sampling.split(df, Canonical.ID,
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .withColumn(Canonical.METADATA,
        map_concat(coalesce(col(Canonical.METADATA), map()),
          map(lit("split"), col("split"))))
      .drop("split")
}

/** Equalize a metadata stratum during migration: every value of `key` is
  * hash-downsampled to the SMALLEST stratum's count, so the migrated
  * collection is balanced. The rates are derived in-plan from a tiny
  * groupBy (|strata| rows, broadcast back) — no driver round-trip, the
  * same shape as [[Sampling.mixToTarget]]. Records missing the key are
  * dropped (inner join on the stratum — mixture semantics). */
abstract class BalanceByMetadataKey(key: String) extends (DataFrame => DataFrame) {
  override def apply(df: DataFrame): DataFrame = {
    val withSrc = df.withColumn("__src", element_at(col(Canonical.METADATA), key))
      .filter(col("__src").isNotNull)
    val counts = withSrc.groupBy(col("__src")).agg(count(lit(1)).cast("double").as("__n"))
    val minN = counts.agg(min(col("__n")).as("__min"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("__src"), (col("__min") / col("__n")).as("__rate"))
    val bucket = pmod(xxhash64(col(Canonical.ID), lit(42L)), lit(1000000L))
    withSrc.join(broadcast(rates), Seq("__src"))
      .filter(bucket < floor(col("__rate") * 1000000L).cast("long"))
      .drop("__src", "__rate")
  }
}

/** `--transform graft.examples.BalanceSources`: [[BalanceByMetadataKey]]
  * over the conventional `source` metadata key. */
class BalanceSources extends BalanceByMetadataKey("source")

/** `--transform graft.examples.PcaWhiten`: decorrelate the vector column
  * during migration — fit a PCA model on the migrating frame itself (one
  * `treeAggregate` pass, [[graft.ops.Pca.fit]]), then rewrite each vector
  * as its whitened projection (unit variance per axis, dimension
  * preserved): the preprocessing isotropic quantizers and cosine indexes
  * want, done in-flight so the target store holds index-ready geometry.
  * Records without a vector pass through untouched. */
class PcaWhiten extends (DataFrame => DataFrame) {
  override def apply(df: DataFrame): DataFrame = {
    val vecs = df.filter(col(Canonical.VECTOR).isNotNull)
    if (vecs.isEmpty) return df
    val model = graft.ops.Pca.fit(vecs, k = -1, vecCol = Canonical.VECTOR)
    val proj = graft.ops.Pca.transform(vecs, model, whiten = true,
      idCol = Canonical.ID, vecCol = Canonical.VECTOR)
    df.join(proj, Seq(Canonical.ID), "left_outer")
      .withColumn(Canonical.VECTOR,
        when(col("pca").isNull, col(Canonical.VECTOR))
          .otherwise(transform(col("pca"), _.cast("float"))))
      .drop("pca")
  }
}

/** `--transform graft.examples.ClusterBySimilarity`: lay the migrating
  * collection out by similarity — range-partition + sort on the
  * random-hyperplane LSH bucket ([[graft.ops.Layout.clusterBySimilarity]])
  * so cosine-similar vectors stream into the target together: vector-store
  * index builders (HNSW/IVF) insert near-neighbors locally instead of
  * thrashing, and parquet targets get file-level locality for blocked
  * similarity scans. Records without a vector sort first, preserved. */
class ClusterBySimilarity extends (DataFrame => DataFrame) {
  override def apply(df: DataFrame): DataFrame =
    if (df.filter(col(Canonical.VECTOR).isNotNull).isEmpty) df
    else graft.ops.Layout.clusterBySimilarity(df, bits = 8, vecCol = Canonical.VECTOR)
}

/** `--transform graft.examples.PrepareTrainingCorpus`: the whole
  * raw-documents-to-vector-collection recipe as ONE migration pass —
  * quality-gate (heuristic score over `metadata['text']`), exact-dedup
  * (portable rolling fingerprint of the token stream; lowest id survives,
  * so re-runs are stable), then chunk + embed via [[ChunkAndEmbed]].
  * Composing inside one transform means one read of the source and one
  * write to the sink; each stage is the already-probed operator, so the
  * 100 TB behavior is the sum of known parts (fingerprint group-by is the
  * only shuffle this adds). Records without text pass through untouched
  * (ChunkAndEmbed's rule). */
class PrepareTrainingCorpus extends (DataFrame => DataFrame) {
  private val minQuality = 0.35
  override def apply(df: DataFrame): DataFrame =
    (graft.ops.Transforms.qualityGate(minQuality)
      andThen graft.ops.Transforms.exactDedupByText()
      andThen graft.ops.Transforms.chunkAndEmbed())(df)
}

/** `--transform graft.examples.ChunkAndEmbed`: turn a document-shaped
  * collection (text in `metadata['text']`) into the chunk-level records a
  * vector store actually indexes — [[graft.ops.Chunking.chunkByTokens]]
  * windows (64 tokens, stride 48), one canonical record per chunk with
  * id `<parent>#<idx>`, the chunk text + provenance in metadata, and a
  * deterministic hashing-trick embedding
  * ([[graft.functions.TextFunctions.hashedTokenEmbedding]]) standing in
  * for a real encoder. Records without text pass through untouched —
  * re-running over a mixed collection is safe. */
class ChunkAndEmbed extends (DataFrame => DataFrame) {
  override def apply(df: DataFrame): DataFrame =
    graft.ops.Transforms.chunkAndEmbed(width = 64, stride = 48, dim = 64)(df)
}
