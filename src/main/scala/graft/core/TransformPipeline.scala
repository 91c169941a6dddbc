package graft.core

import org.apache.spark.sql.DataFrame
import graft.config.{ConfigException, TransformStep}
import graft.ops.{Sampling, Transforms}

/** Resolves a config's declarative `pipeline` block (a list of named
  * transforms with params) into one composed `DataFrame => DataFrame` —
  * the config face of the `--transform` hook, so a data team's whole
  * recipe (quality gate → dedup → chunk → embed → layout) is a reviewable
  * JSON block instead of a custom class per combination. Every step is a
  * declared DataFrame transform over the canonical frame, so the COMPOSED
  * pipeline is still ONE Catalyst plan: one read of the source, one write
  * to the sink, optimized as a whole.
  *
  * Unknown names and malformed params throw [[ConfigException]] at
  * resolve time (before any read) — a typo aborts the run upfront rather
  * than after an hour of extraction. The `class` step is the reflection
  * escape hatch, equivalent to `--transform <fqcn>` but inline in config.
  */
object TransformPipeline {

  private def dbl(p: Map[String, String], key: String, default: Double): Double =
    p.get(key).map(v => v.toDoubleOption.getOrElse(
      throw new ConfigException(s"pipeline param '$key' must be numeric, got '$v'")))
      .getOrElse(default)

  private def int(p: Map[String, String], key: String, default: Int): Int =
    p.get(key).map(v => v.toIntOption.getOrElse(
      throw new ConfigException(s"pipeline param '$key' must be an integer, got '$v'")))
      .getOrElse(default)

  private def lng(p: Map[String, String], key: String, default: Long): Long =
    p.get(key).map(v => v.toLongOption.getOrElse(
      throw new ConfigException(s"pipeline param '$key' must be an integer, got '$v'")))
      .getOrElse(default)

  private def req(p: Map[String, String], key: String, step: String): String =
    p.getOrElse(key, throw new ConfigException(s"pipeline step '$step' needs param '$key'"))

  private def bool(p: Map[String, String], key: String, default: Boolean): Boolean =
    p.get(key).map(v => v.toBooleanOption.getOrElse(
      throw new ConfigException(s"pipeline param '$key' must be true/false, got '$v'")))
      .getOrElse(default)

  /** Step catalog: name → (params → transform). */
  private val registry: Map[String, (Map[String, String]) => DataFrame => DataFrame] = Map(
    "add_source_tracking" -> (p => Transforms.addSourceTracking(
      req(p, "source_db", "add_source_tracking"),
      // timestamp is explicit config, never now(): deterministic pipelines
      req(p, "timestamp", "add_source_tracking"))),
    "filter" -> (p => Transforms.filterByMetadata(req(p, "predicate", "filter"))),
    "rename_metadata_key" -> (p => Transforms.renameMetadataKey(
      req(p, "from", "rename_metadata_key"), req(p, "to", "rename_metadata_key"))),
    "normalize_vectors" -> (_ => Transforms.normalizeVectors),
    "quality_gate" -> (p => Transforms.qualityGate(
      dbl(p, "min_score", 0.35), p.getOrElse("text_key", "text"))),
    "exact_dedup" -> (p => Transforms.exactDedupByText(p.getOrElse("text_key", "text"))),
    "canonicalize_urls" -> (p => Transforms.canonicalizeUrls(
      p.getOrElse("url_key", "url"), bool(p, "dedup", default = false))),
    "keep_best_dedup" -> (p => Transforms.keepBestDedup(
      p.getOrElse("text_key", "text"), p.getOrElse("score_key", ""))),
    // shares syntax: "web=0.6,books=0.4" — sources absent from it are dropped
    "mix_token_budget" -> { p =>
      // same ConfigException contract as every other param: a malformed
      // shares string or total must name the param, never leak a
      // MatchError/NumberFormatException into the run report
      val sharesRaw = req(p, "shares", "mix_token_budget")
      val shares = sharesRaw.split(',').map { kv =>
        kv.split('=') match {
          case Array(k, v) if v.trim.toDoubleOption.isDefined =>
            k.trim -> v.trim.toDouble
          case _ => throw new ConfigException(
            s"pipeline param 'shares' must be 'name=weight,...' pairs, got '$kv'")
        }
      }.toMap
      val total = req(p, "total_tokens", "mix_token_budget").toLongOption.getOrElse(
        throw new ConfigException("pipeline param 'total_tokens' must be an integer, " +
          s"got '${p("total_tokens")}'"))
      Transforms.mixTokenBudget(shares, total,
        p.getOrElse("source_key", "source"), p.getOrElse("text_key", "text"),
        int(p, "n_buckets", 1024))
    },
    // benchmark-leakage gates, both directions of the decontamination
    // family as pipeline verbs: lexical (n-gram COLLISION vs a benchmark
    // parquet — drop on >= min_hits shared ngram-grams, Bloom single-pass
    // fast path) and semantic (fused cosine argmax on the record vectors
    // — pure map, NaN fails closed)
    "decontaminate" -> (p => {
      // the round-12 semantics change (containment fraction -> n-gram
      // collision) renamed the knobs; an OLD config must abort loudly,
      // not silently run a different rule with different defaults
      Seq("threshold", "shingle_size").foreach(k => if (p.contains(k))
        throw new ConfigException(s"decontaminate no longer takes '$k': it " +
          "now drops records sharing >= min_hits word ngram-grams with the " +
          "benchmark (params: ngram, min_hits, fpp, bloom, expected_shingles)"))
      Transforms.decontaminate(
      req(p, "eval_path", "decontaminate"),
      int(p, "ngram", 8), int(p, "min_hits", 1),
      p.getOrElse("text_key", "text"), p.getOrElse("eval_text_key", "text"),
      bool(p, "bloom", default = true),
      lng(p, "expected_shingles", 1000000L),
      dbl(p, "fpp", 1e-6))
    }),
    "semantic_decontaminate" -> (p => Transforms.semanticDecontaminate(
      req(p, "eval_path", "semantic_decontaminate"),
      dbl(p, "threshold", 0.8),
      p.getOrElse("eval_id_key", "vec_id"), p.getOrElse("eval_vector_key", "embedding"))),
    "chunk_embed" -> (p => Transforms.chunkAndEmbed(
      int(p, "width", 64), int(p, "stride", 48), int(p, "dim", 64),
      p.getOrElse("text_key", "text"))),
    "assign_split" -> { p =>
      val splits = Seq("train" -> dbl(p, "train", 0.9),
        "val" -> dbl(p, "val", 0.05), "test" -> dbl(p, "test", 0.05))
      df => {
        import org.apache.spark.sql.functions._
        Sampling.split(df, graft.model.Canonical.ID, splits)
          .withColumn(graft.model.Canonical.METADATA,
            map_concat(coalesce(col(graft.model.Canonical.METADATA), map()),
              map(lit("split"), col("split"))))
          .drop("split")
      }
    },
    "quantize_vectors" -> (_ => new graft.examples.QuantizeVectors()),
    "pca_whiten" -> (_ => new graft.examples.PcaWhiten()),
    "balance_by_key" -> (p => new graft.examples.BalanceByMetadataKey(
      p.getOrElse("key", "source")) {}),
    "cluster_by_similarity" -> { p =>
      val bits = int(p, "bits", 8)
      df =>
        // the dim probe is a LIMIT-1 job (scan-until-first-hit), not the
        // full-corpus isEmpty pre-action this step used to run — the
        // composed pipeline stays one read + one write except in the
        // all-null-vector corner, where the probe itself must see the end
        try graft.ops.Layout.clusterBySimilarity(df, bits = bits,
          vecCol = graft.model.Canonical.VECTOR)
        catch {
          // typed, not message-matched: a reworded require message must
          // never silently revert vectorless corpora to hard failures
          case _: graft.ops.Similarity.NoVectorsException => df
        }
    },
    "prepare_corpus" -> (p =>
      Transforms.qualityGate(dbl(p, "min_score", 0.35), p.getOrElse("text_key", "text"))
        andThen Transforms.exactDedupByText(p.getOrElse("text_key", "text"))
        andThen Transforms.chunkAndEmbed(
          int(p, "width", 64), int(p, "stride", 48), int(p, "dim", 64),
          p.getOrElse("text_key", "text"))),
    // reflection escape hatch — unlike the CLI flag, a config-declared
    // class that fails to load is a hard error, not a warn-and-continue:
    // configs are reviewed artifacts, typos should abort
    "class" -> { p =>
      val cls = req(p, "class_name", "class")
      try Class.forName(cls).getDeclaredConstructor().newInstance()
        .asInstanceOf[DataFrame => DataFrame]
      catch {
        case e: Exception =>
          throw new ConfigException(s"pipeline step cannot load class $cls: ${e.getMessage}")
      }
    })

  def names: Seq[String] = registry.keys.toSeq.sorted

  def resolve(step: TransformStep): DataFrame => DataFrame =
    registry.getOrElse(step.name, throw new ConfigException(
      s"unknown pipeline transform '${step.name}' (valid: ${names.mkString(", ")})"))(step.params)

  /** Compose a config's steps in order; None when the block is absent. */
  def compose(steps: Seq[TransformStep]): Option[DataFrame => DataFrame] =
    if (steps.isEmpty) None
    else Some(steps.map(resolve).reduceLeft(_ andThen _))

  /** The EFFECTIVE transform of a run: the config's declarative pipeline
    * FIRST, then the programmatic/--transform hook. ONE definition shared
    * by [[Migrator.run]] (what gets written) and
    * [[Validator.validateMigration]] (what to expect) — the two once
    * drifted, and --validate compared every pipelined migration against
    * the raw source. */
  def effective(steps: Seq[TransformStep],
                hook: Option[DataFrame => DataFrame]): Option[DataFrame => DataFrame] =
    (compose(steps), hook) match {
      case (Some(p), Some(f)) => Some(p andThen f)
      case (p, f) => p.orElse(f)
    }
}
