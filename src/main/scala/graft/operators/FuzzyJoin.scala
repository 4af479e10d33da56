package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) similarity join — classic record
  * linkage: candidate pairs come from equality on a cheap BLOCKING key
  * (a token, a phonetic code, a length bucket), and only candidates pay
  * the quadratic-ish string-distance verification. The all-pairs
  * cartesian never exists in the plan.
  *
  * Same discipline as the MinHash/LSH chain ([[Dedup.lshPairs]]) at a
  * different granularity: LSH blocks on hashed shingle bands for
  * document-scale near-dup; this blocks on an attribute key for
  * entity-scale linkage (names, titles, addresses), where the verifier
  * is character edit distance rather than set Jaccard.
  *
  * 100 TB: one shuffle on the blocking key; per-block work is
  * |block|², so the blocking function must bound block sizes —
  * real deployments compose several narrow keys (first token +
  * length/4) rather than one broad one. Distinct-first collapses
  * repeated attribute values before pairing (attribute cardinality,
  * not row count, drives cost). The verifier is Spark's codegen
  * `levenshtein`, so the verify stage stays in whole-stage codegen.
  */
object FuzzyJoin {

  /** Self-join `records` on `blockKey` equality, keep pairs with
    * `levenshtein(key_a, key_b) <= maxDist`, one row per unordered
    * pair of distinct `key` values.
    *
    * `records` columns: `key` (string, the attribute to link),
    * `blockKey` (string). Output: key_a, key_b, dist. */
  def selfLinkage(records: DataFrame, maxDist: Int): DataFrame = {
    val uniq = records.select("key", "blockKey").distinct()
    val a = uniq.select(col("key").as("key_a"), col("blockKey"))
    val b = uniq.select(col("key").as("key_b"), col("blockKey"))
    a.join(b, "blockKey")
      .filter(col("key_a") < col("key_b"))
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= maxDist)
      .select("key_a", "key_b", "dist")
  }
}
