package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, over a
  * `documents`-like table (`doc_id, text, lang, source, n_chars`).
  *
  * The reference has no text ops (its metadata values pass through opaque,
  * `core/adapter.py:33-42`); these are the engine-side extensions the
  * north-star plan calls for. Everything is built from codegen'd Spark
  * built-ins — `split`, `regexp_count`, `filter`, `aggregate` — so the hot
  * path stays inside whole-stage codegen at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens of the trimmed text (empty string → 0 tokens). */
  def tokens(text: Column): Column =
    // explicit null guard: without it tokens(null) is null, and under
    // legacy sizeOfNull a downstream size() yields -1 — which silently
    // skewed BM25's avgdl (dl = -1 rows) before this was centralized
    when(text.isNull || length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word chunks of <=4 chars plus standalone
    * digits/punctuation, approximating a byte-pair tokenizer's token count
    * without a vocab. Deterministic, regex-only. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation chars to total chars (0 for empty text). */
  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(length(text) === 0, 0.0).otherwise(punct.cast("double") / length(text))
  }

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that")

  /** Fraction of whitespace tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    val sw = size(filter(toks, t => lower(t).isInCollection(stopwords)))
    when(size(toks) === 0, 0.0).otherwise(sw.cast("double") / size(toks))
  }

  /** Mean token length in chars (0 for empty). */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: rewards mid-length documents with a
    * healthy stopword presence and low punctuation noise. Deterministic,
    * closed-form — mirrors the heuristics of public quality filters
    * (Gopher/C4 rules) without model inference. */
  def qualityScore(text: Column): Column = {
    val ntok = tokenCount(text).cast("double")
    val lengthScore = least(ntok / 16.0, lit(1.0)) // 16+ tokens → full marks
    val swScore = least(stopwordRatio(text) * 4.0, lit(1.0)) // 25%+ stopwords → full
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    round((lengthScore * 0.4 + swScore * 0.3 + punctPenalty * 0.3), 6)
  }

  /** Language-ID via marker-token voting: scores each candidate language by
    * counting occurrences of its most-frequent function words, picks the
    * argmax, `und` when nothing matches. N-gram-frequency heuristic in the
    * fastText/CLD tradition, reduced to codegen-able regex counts. */
  /** Ordered (language, marker words): order IS the tie-break priority. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "it" -> Seq("il", "la", "di", "che", "per"))

  def langId(text: Column): Column = {
    val toks = transform(tokens(text), lower(_))
    // struct(score, negIdx) max → deterministic tie-break by list order
    val scored = langMarkers.zipWithIndex.map { case ((lang, markers), i) =>
      struct(
        size(filter(toks, t => t.isInCollection(markers))).as("score"),
        lit(-i).as("tie"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Unicode NFC canonicalization (é as one codepoint vs e+combining
    * accent must dedup identically) — the normalization pass every text
    * pipeline runs before hashing. */
  def nfc(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NfcNormalizeExpr(org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Full cleaning pass: NFC → strip control chars → collapse whitespace →
    * trim. Deterministic, codegen-adjacent (one CodegenFallback for NFC,
    * the rest builtin regex). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(nfc(text), "\\p{Cntrl}", ""), "\\s+", " "))

  /** 64-bit FNV-1a content fingerprint of the exact text — exact-dedup key
    * with cheap comparison; xxhash64 is Spark-native and codegen'd. */
  def fingerprint(text: Column): Column = xxhash64(text)

  /** Rolling (Rabin-Karp-style) hash of the token stream: order-sensitive
    * polynomial hash, so token *reorderings* change the fingerprint while
    * whitespace differences do not. aggregate() keeps it codegen'd. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(1469598103934665603L),
      (acc, t) => acc * lit(1099511628211L) + xxhash64(t))

  /** Engine-PORTABLE rolling hash: the same order-sensitive polynomial
    * shape as [[rollingHash]], but over portable codepoint-hashed tokens
    * with all arithmetic mod 2^31-1 — so any SQL engine (the DuckDB
    * oracle included) reproduces it bit-exactly, where xxhash64 has no
    * cross-engine twin. Both kernels are compiled Catalyst expressions. */
  def rollingHashPortable(text: Column): Column =
    HashExpressions.polyFoldHash(HashExpressions.portableTokenHashes(text))

  /** Hashing-trick text embedding: L2-normalized bucket counts of the
    * PORTABLE token hashes — v[j] = |{t : hash(t) mod dim = j}| / ||v||.
    * The deterministic stand-in for a real sentence encoder in
    * chunk-embed-load pipelines (no model weights exist in this
    * environment), and a legitimate cheap baseline in its own right
    * (feature hashing: Weinberger et al., ICML'09). Portable math end to
    * end, so the DuckDB oracle reproduces every component bit-exactly.
    *
    * Executed by the fused [[FeatureExpressions.hashedBowEmbed]] kernel:
    * tokenize → hash → count → normalize in one pass, no per-token
    * allocation. (The HOF formulation of the same math — an
    * aggregate-transform fold — built a fresh dim-array per token in the
    * interpreted evaluator: 144.5 s vs 3.4 s for 208k chunks at the 30×
    * probe, a 43× win. [[hashedTokenEmbeddingReference]] keeps it as the
    * parity twin.) */
  def hashedTokenEmbedding(text: Column, dim: Int): Column =
    FeatureExpressions.hashedBowEmbed(text, dim)

  /** HOF reference formulation of [[hashedTokenEmbedding]] — O(tokens·dim)
    * interpreted allocations; exists to pin the kernel's semantics in the
    * parity spec, not for production use. */
  private[graft] def hashedTokenEmbeddingReference(text: Column, dim: Int): Column = {
    require(dim > 0, "dim > 0")
    val counts = aggregate(
      HashExpressions.portableTokenHashes(text),
      array_repeat(lit(0.0), dim),
      (acc, h) => transform(acc, (v, i) => v + when(pmod(h, lit(dim)) === i, 1.0).otherwise(0.0)))
    val norm = sqrt(aggregate(counts, lit(0.0), (a, x) => a + x * x))
    when(norm > 0, transform(counts, x => x / norm)).otherwise(counts)
  }

  /** Character n-gram shingles (lowercased, whitespace collapsed) — input to
    * MinHash / Jaccard dedup. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    val count = length(norm) - (n - 1)
    when(count < 1, array().cast("array<string>"))
      .otherwise(array_distinct(transform(sequence(lit(1), count), i => norm.substr(i, lit(n)))))
  }

  /** Word n-grams WITH multiplicity (lowercased) — unlike [[wordShingles]],
    * repeats are kept: repetition analysis needs the duplicate mass.
    * One-pass compiled kernel (r20): the HOF formulation re-evaluated the
    * whole tokenize subtree per window — O(len²) per doc (see
    * [[WordNgramsExpr]]); values byte-identical, property-pinned. */
  def wordNgrams(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WordNgramsExpr(org.apache.spark.sql.GraftColumnBridge.expression(text), n,
        distinct = false))

  /** PII redaction: emails, IPv4 addresses, then phone-shaped digit runs,
    * replaced by typed placeholder tags. Patterns are deliberately within
    * the RE2 subset (no lookaround), so any RE2-based engine — including
    * the DuckDB oracle — applies the exact same rewrites. Order matters:
    * emails before phones (an email's digits must not be half-eaten). */
  val piiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d[\\d\\- ]{7,}\\d" -> "<PHONE>")

  def redactPii(text: Column): Column =
    piiRules.foldLeft(text) { case (c, (pat, tag)) => regexp_replace(c, pat, tag) }

  /** Word n-gram shingles over whitespace tokens — input to n-gram Jaccard.
    * One-pass compiled kernel (r20, see [[wordNgrams]]); first-occurrence
    * dedup = array_distinct semantics. */
  def wordShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WordNgramsExpr(org.apache.spark.sql.GraftColumnBridge.expression(text), n,
        distinct = true))

  /** |A ∩ B| / |A ∪ B| over two string-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, 0.0).otherwise(inter / union)
  }
}

/** Unicode NFC normalization as a Catalyst expression (java.text.Normalizer
  * has no Spark builtin). CodegenFallback: compiled Scala eval per row. */
case class NfcNormalizeExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val n = if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    org.apache.spark.unsafe.types.UTF8String.fromString(n)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
