package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Aho-Corasick multi-pattern string matching (Aho & Corasick, CACM
  * 1975): ONE linear pass over each document finds every occurrence of
  * every pattern in a dictionary — the blocklist/PII-literal/stop-
  * phrase scrubbing primitive at corpus scale, where the alternative
  * (|patterns| regex passes, or a regex alternation whose NFA blows up
  * on large dictionaries) is O(patterns × corpus).
  *
  * The automaton is built ONCE on the driver (trie + BFS failure
  * links, outputs merged through the fail chain) and ships to
  * executors as a broadcast-sized value object — it is DATA, like a
  * bloom filter or a codebook, typically a few MB for 10^5 patterns.
  * Matching is `mapPartitions`: one automaton reference per partition,
  * O(text + matches) per document, zero shuffle — the scan composes
  * with any downstream aggregation.
  */
class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  // trie as growable parallel arrays; child maps are small per node
  private val children = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.Map.empty[Char, Int])
  private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
  patterns.zipWithIndex.foreach { case (p, pi) =>
    var node = 0
    p.foreach { c =>
      node = children(node).getOrElseUpdate(c, {
        children += scala.collection.mutable.Map.empty[Char, Int]
        out += Nil
        children.size - 1
      })
    }
    out(node) ::= pi
  }
  private val fail = new Array[Int](children.size)
  // BFS: fail(child) = deepest proper suffix that is also a trie path;
  // outputs inherit through the fail link so every match is reported
  // at the node where it ends
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = if (children(f).contains(ch) && children(f)(ch) != v)
          children(f)(ch) else 0
        out(v) = out(v) ++ out(fail(v))
        queue += v
      }
    }
  }
  // frozen immutable forms (the mutable builders above never escape)
  private val childArr: Array[Map[Char, Int]] = children.map(_.toMap).toArray
  private val outArr: Array[List[Int]] = out.toArray

  /** All matches in `text` as (patternIndex, endOffsetExclusive). */
  def scan(text: String): Iterator[(Int, Int)] = new Iterator[(Int, Int)] {
    private var node = 0
    private var i = 0
    private var pending: List[Int] = Nil
    private var endPos = 0
    private def advance(): Unit = {
      while (pending.isEmpty && i < text.length) {
        val c = text.charAt(i)
        while (node != 0 && !childArr(node).contains(c)) node = fail(node)
        node = childArr(node).getOrElse(c, 0)
        i += 1
        if (outArr(node).nonEmpty) { pending = outArr(node); endPos = i }
      }
    }
    override def hasNext: Boolean = { advance(); pending.nonEmpty }
    override def next(): (Int, Int) = {
      advance()
      val h = pending.head
      pending = pending.tail
      (h, endPos)
    }
  }

  /** Per-pattern occurrence counts for `text` (all occurrences,
    * overlapping included). */
  def counts(text: String): Array[Long] = {
    val c = new Array[Long](patterns.size)
    scan(text).foreach { case (pi, _) => c(pi) += 1 }
    c
  }
}

object AhoCorasick {

  /** Per-document, per-pattern hit counts over (doc_id, text) rows:
    * one row per (doc, pattern) with n > 0. The automaton is built on
    * the driver and closure-broadcast; the scan is a zero-shuffle
    * mapPartitions. */
  def matchCounts(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ac = new AhoCorasick(patterns)
    val bc = spark.sparkContext.broadcast(ac)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val a = bc.value
        val pats = a.patterns.toArray
        it.flatMap { case (id, text) =>
          val t = if (text == null) "" else text
          val c = a.counts(t)
          c.indices.iterator.filter(c(_) > 0)
            .map(pi => (id, pats(pi), c(pi)))
        }
      }
      .toDF("doc_id", "pat", "n")
  }
}
