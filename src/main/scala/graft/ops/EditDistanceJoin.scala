package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT edit-distance similarity self-join (the Ed-Join family: Xiao,
  * Wang & Lin, VLDB'08): every pair of strings with Levenshtein distance
  * <= k, without the all-pairs cross join. The record-linkage /
  * typo-clustering primitive — fuzzy key matching across migrated stores,
  * near-identical title/name collapse in a training corpus — that Jaccard
  * machinery ([[SetSimilarityJoin]], [[Dedup]]) cannot express: edit
  * distance is positional, so token-set similarity over- and under-counts
  * transposed or shifted strings.
  *
  * Pruning lever, same shape as [[SetSimilarityJoin]]'s prefix filter: a
  * single edit (insert/delete/substitute) destroys at most `q` of a
  * string's character q-grams, so ed(a,b) <= k implies
  * `|G(a) \ G(b)| <= q*k` — and with every gram set ordered by one global
  * total order (rarest gram first), two such sets MUST share a gram inside
  * both (q*k + 1)-prefixes (if the first q*k+1 of `a` all miss `b`, the
  * set difference already exceeds q*k). Candidates therefore come from an
  * equi-join on PREFIX grams only — the frequency order keeps boilerplate
  * grams out of prefixes, so a hot gram never fans out unless it is
  * genuinely rare — plus the length filter `abs(len_a - len_b) <= k`.
  * Verification is the exact Levenshtein kernel (codegen'd built-in).
  *
  * Strings are padded with q-1 sentinel chars ( / ) on each
  * end, the standard trick that keeps the gram count at `len + q - 1` and
  * makes edits near the ends destroy the full q grams the bound assumes.
  *
  * Everything — grams, frequency order, prefixes, Levenshtein — is
  * portable, so a SQL oracle replays the ACTUAL algorithm end to end.
  *
  * Scale shape: per-string prefix ranking is a window over ONE string's
  * grams (bounded by string length); the candidate join is shuffle-on-gram
  * with df² fan-out only for grams rare enough to enter prefixes; verify
  * cost is output-bound. The reference has no similarity machinery at all.
  *
  * KNOWN LIMIT (measured, not theorized): prefix pruning power is gram
  * SELECTIVITY, so it collapses on low-entropy alphabets. A 450k-name
  * probe of `Customer#%09d` strings — digit 3-grams, ≲1100 distinct
  * grams, mean df ≈ 4500 — made even the rarest prefix grams hot enough
  * that the candidate join headed for billions of pairs (killed at 20
  * min). For ID/code/name-shaped corpora use
  * [[deletionNeighborhoodPairs]], whose join keys are near-full strings
  * and don't care about alphabet entropy; for natural-language tokens
  * (large gram alphabet) this prefix join is the general-k path.
  */
object EditDistanceJoin {

  /** Sentinel pad chars; sort below ASCII in both engines' binary order. */
  val LeftPad = "\u0001"
  val RightPad = "\u0002"

  /** Ceiling on the SHORT-STRING pool (strings with too few grams for the
    * prefix theorem — see below): its candidates come from a bounded
    * non-equi self-join, and the bound is what keeps the operator's
    * exactness claim from hiding a quadratic. */
  val MaxShortPool = 5000L

  /** All pairs with Levenshtein distance <= `maxDistance`, exactly.
    *
    * Exactness fine print: the prefix theorem needs a string to HAVE
    * q·k+1 grams — a string with fewer (len <= q·(k−1)+1) can be within
    * distance k of a partner while sharing NO gram at all (q=3, k=1:
    * "a" vs "b" — disjoint padded gram sets). Those strings form a SHORT
    * POOL whose pairs come from a direct length-filtered self-join
    * instead; the pool is tiny by construction (single chars at k=1) and
    * capped at [[MaxShortPool]] with a named error.
    *
    * @return (id_a, id_b, dist) with id_a < id_b.
    */
  def editDistancePairs(df: DataFrame, strCol: String, idCol: String,
                        maxDistance: Int = 1, q: Int = 3): DataFrame = {
    require(maxDistance >= 0 && q >= 2, "need maxDistance >= 0, q >= 2")
    val k = maxDistance
    val prefixLen = q * k + 1
    val shortLen = q * (k - 1) + 1 // fewer than prefixLen grams below this

    // one materialized (id, string) sliver: it feeds the gram explode AND
    // both verify sides — without it the plan re-scans the source per
    // consumer (measured: 6 scans, zero ReusedExchange; same staging as
    // the LSH shingle sliver)
    val base = Materialize(df.filter(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s")))
    // pad, then take every q-wide substring: len + q - 1 grams per string
    val padded = concat(lit(LeftPad * (q - 1)), col("__s"), lit(RightPad * (q - 1)))
    // materialized too: consumed by the df count AND the prefix rank
    val grams = Materialize(base
      .withColumn("__len", length(col("__s")))
      .withColumn("__g", explode(array_distinct(
        transform(sequence(lit(1), length(padded) - (q - 1)),
          i => padded.substr(i, lit(q))))))
      .select("__id", "__len", "__g"))

    // global document frequency per gram — the total order's major key;
    // (df, gram) is unique within a string after array_distinct, so the
    // rank below is deterministic
    val dfreq = grams.groupBy("__g").agg(count(lit(1)).as("__df"))
    val rn = row_number().over(Window.partitionBy(col("__id")).orderBy(col("__df"), col("__g")))
    val prefix = grams.join(dfreq, "__g")
      .withColumn("__rn", rn)
      .filter(col("__rn") <= prefixLen)
      .select("__g", "__id", "__len")

    val a = prefix.select(col("__g"), col("__id").as("id_a"), col("__len").as("len_a"))
    val b = prefix.select(col("__g"), col("__id").as("id_b"), col("__len").as("len_b"))
    val gramCands = a.join(b, "__g")
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("len_a") - col("len_b")) <= k)
      .select("id_a", "id_b")

    // short-pool candidates: any evading pair has min(len) <= shortLen and
    // max(len) <= shortLen + k, so BOTH members sit in this pool
    val candidates = (if (k == 0) gramCands else {
      val sp = base.select(col("__id"), length(col("__s")).as("__len"))
        .filter(col("__len") <= shortLen + k)
      val n = sp.count()
      require(n <= MaxShortPool,
        s"$n strings of length <= ${shortLen + k} exceed MaxShortPool " +
          s"($MaxShortPool): their pairs need a direct self-join the gram " +
          "prefixes cannot prune — collapse exact duplicates first or use " +
          "deletionNeighborhoodPairs for short low-entropy corpora")
      val shortCands = sp.select(col("__id").as("id_a"), col("__len").as("len_a"))
        .join(sp.select(col("__id").as("id_b"), col("__len").as("len_b")),
          col("id_a") < col("id_b") &&
            abs(col("len_a") - col("len_b")) <= k &&
            least(col("len_a"), col("len_b")) <= shortLen)
        .select("id_a", "id_b")
      gramCands.unionByName(shortCands)
    }).distinct()

    candidates
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("int"))
      .filter(col("dist") <= k)
      .select("id_a", "id_b", "dist")
  }

  /** All pairs with Levenshtein distance <= 1, exactly, via the deletion
    * neighborhood (FastSS / SymSpell family: Bocek et al., 2007): ed(a,b)
    * <= 1 implies `{a} ∪ del1(a)` and `{b} ∪ del1(b)` intersect (delete
    * the edited position on whichever side has it), so candidates come
    * from an equi-join on single-deletion variants — |s|+1 keys per
    * string, each a near-FULL string. Join selectivity therefore tracks
    * whole-string entropy, not q-gram entropy: this is the path for
    * short low-entropy strings (ids, codes, names, titles) where
    * [[editDistancePairs]]'s gram prefixes go hot (see the measured limit
    * above). Verification is the same exact Levenshtein kernel (sharing a
    * variant only bounds ed by 2).
    *
    * Scale shape: |s|+1 shuffle rows per string; per-key fan-out is df²
    * where df counts strings within one deletion of each other — output-
    * bound on real corpora. Exact-duplicate cliques are the one hot case
    * (every member shares every key): collapse exact dups first
    * ([[Dedup.exactDuplicates]]), the same staging the LSH pipeline uses.
    */
  def deletionNeighborhoodPairs(df: DataFrame, strCol: String, idCol: String): DataFrame = {
    // only the (id, string) sliver is materialized: it feeds the variant
    // explode + both verify sides (4 source scans, zero ReusedExchange
    // without it). The |s|+1-wide variant table is deliberately NOT
    // checkpointed — it is ~20× the sliver and MEASURED slower to write+
    // read back than to recompute from the materialized strings
    // (35.6 s vs 28.3 s at the 30× probe).
    val base = Materialize(df.filter(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s")))
    val s = col("__s")
    val variants = array_distinct(transform(
      sequence(lit(0), length(s)),
      i => when(i === 0, s)
        .otherwise(concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))
    val keyed = base
      .withColumn("__len", length(s))
      .withColumn("__v", explode(variants))
      .select("__id", "__len", "__v")

    val a = keyed.select(col("__v"), col("__id").as("id_a"), col("__len").as("len_a"))
    val b = keyed.select(col("__v"), col("__id").as("id_b"), col("__len").as("len_b"))
    val candidates = a.join(b, "__v")
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("len_a") - col("len_b")) <= 1)
      .select("id_a", "id_b").distinct()

    candidates
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("int"))
      .filter(col("dist") <= 1)
      .select("id_a", "id_b", "dist")
  }

  /** Typo-normalization table: connected components over the
    * [[deletionNeighborhoodPairs]] graph, each member mapped to its
    * cluster's canonical (lowest-id) form — the variant→canonical
    * rewrite used to collapse misspelled keys/names before a join or a
    * vocabulary count. Transitive by design: `ed(a,b) <= 1` chains unify
    * spelling families even when the extremes are many edits apart
    * (same recipe as [[Dedup.keepCanonical]] for documents).
    *
    * @return one row per string WITH at least one single-edit neighbor:
    *         (idCol, strCol, canonical_id, canonical); singletons are
    *         absent — they need no rewrite.
    */
  def canonicalVariants(df: DataFrame, strCol: String, idCol: String): DataFrame = {
    val pairs = deletionNeighborhoodPairs(df, strCol, idCol)
    val comps = Dedup.connectedComponents(pairs) // (id, comp), paired ids only
    val names = df.select(col(idCol).as("id"), col(strCol).as("__name"))
    comps.join(names, "id")
      .join(names.select(col("id").as("comp"), col("__name").as("__canon")), "comp")
      .select(col("id").as(idCol), col("__name").as(strCol),
        col("comp").as("canonical_id"), col("__canon").as("canonical"))
  }
}
