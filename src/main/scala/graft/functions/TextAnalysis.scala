package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline extension:
  * tokenization, shingling (word and character n-grams), stopword /
  * quality features, and language-ID marker scoring. All pure Column
  * expressions (codegen'd, no UDFs) so they compose into distributed
  * scans without breaking whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace tokenization (the reference corpus is space-separated). */
  def words(text: Column): Column = split(text, " ")

  /** Word k-shingles: ["a b c", "b c d", ...]; empty array when the
    * document has fewer than k words. Backed by the codegen
    * [[WordGrams]] expression (the HOF spelling evaluates a lambda +
    * k boxed element_at calls per gram — interpreted, on the ingest
    * hot path). */
  def wordShingles(ws: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WordGrams(Bridge.expression(ws), k))
  }

  /** Character k-grams as an array, in document order. */
  def charShingles(text: Column, k: Int): Column =
    when(length(text) >= k,
      transform(sequence(lit(1), length(text) - (k - 1)),
        i => text.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))

  /** Seeded string hash used by MinHash: lexicographically comparable
    * md5 hex of "seed|value". min() over these is a valid minwise hash
    * and is reproducible in any engine with md5. */
  def seededHash(seed: Int, value: Column): Column =
    md5(concat(lit(s"$seed|"), value))

  /** Number of tokens belonging to `markers` (stopword / language-marker
    * hit count), as a long. Codegen set-membership kernel
    * ([[ArrayCountInSet]]) — one hash probe per token instead of an
    * interpreted lambda with a linear `isin` scan. */
  def markerCount(ws: Column, markers: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ArrayCountInSet(Bridge.expression(ws), markers))
  }
}
