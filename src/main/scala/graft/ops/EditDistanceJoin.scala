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
  */
object EditDistanceJoin {

  /** Sentinel pad chars; sort below ASCII in both engines' binary order. */
  val LeftPad = "\u0001"
  val RightPad = "\u0002"

  /** All pairs with Levenshtein distance <= `maxDistance`, exactly.
    *
    * @return (id_a, id_b, dist) with id_a < id_b.
    */
  def editDistancePairs(df: DataFrame, strCol: String, idCol: String,
                        maxDistance: Int = 1, q: Int = 3): DataFrame = {
    require(maxDistance >= 0 && q >= 2, "need maxDistance >= 0, q >= 2")
    val k = maxDistance
    val prefixLen = q * k + 1

    val base = df.filter(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
    // pad, then take every q-wide substring: len + q - 1 grams per string
    val padded = concat(lit(LeftPad * (q - 1)), col("__s"), lit(RightPad * (q - 1)))
    val grams = base
      .withColumn("__len", length(col("__s")))
      .withColumn("__g", explode(array_distinct(
        transform(sequence(lit(1), length(padded) - (q - 1)),
          i => padded.substr(i, lit(q))))))
      .select("__id", "__len", "__g")

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
    val candidates = a.join(b, "__g")
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("len_a") - col("len_b")) <= k)
      .select("id_a", "id_b").distinct()

    candidates
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("int"))
      .filter(col("dist") <= k)
      .select("id_a", "id_b", "dist")
  }
}
