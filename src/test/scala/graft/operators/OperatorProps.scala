package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.TestSpark

/** Property-based invariants for the custom operators (SURVEY §5.2):
  * pandas-semantics edges that hand-picked examples can miss.
  */
object OperatorProps extends Properties("operators") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(12) // each trial runs Spark jobs; keep bounded

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genSeries: Gen[List[Option[Double]]] =
    Gen.chooseNum(4, 30).flatMap { n =>
      Gen.listOfN(n, Gen.frequency(
        3 -> Gen.chooseNum(0, 10000).map(v => Some(v / 100.0)),
        1 -> Gen.const(None)))
    }

  private def interp(vals: List[Option[Double]]): List[Option[Double]] = {
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }.toDF("k", "t", "v")
    Interpolation.interpolate(df, Seq("k"), "t", Seq("v"))
      .orderBy("t").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toList
  }

  property("interpolation: non-null samples pass through unchanged") =
    forAll(genSeries) { vals =>
      val out = interp(vals)
      vals.zip(out).forall {
        case (Some(x), Some(y)) => x == y
        case (Some(_), None) => false
        case (None, _) => true
      }
    }

  property("interpolation: null only before the first sample; interior bounded by neighbours") =
    forAll(genSeries) { vals =>
      val out = interp(vals)
      val firstIdx = vals.indexWhere(_.isDefined)
      out.zipWithIndex.forall { case (o, i) =>
        if (firstIdx < 0 || i < firstIdx) o.isEmpty
        else o.isDefined
      } && {
        // every interpolated value sits between SOME pair of original values
        val present = vals.flatten
        present.isEmpty || out.flatten.forall(v =>
          v >= present.min - 1e-9 && v <= present.max + 1e-9)
      }
    }

  property("interpolation: idempotent on dense series") =
    forAll(genSeries.map(_.map(v => v.orElse(Some(0.0))))) { vals =>
      interp(vals) == vals
    }

  private def triang(vals: List[Double], n: Int): List[Option[Double]] = {
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }.toDF("k", "t", "v")
    val w = Window.partitionBy("k").orderBy("t")
    df.select(col("t"), TriangularRolling.triangMean(col("v"), w, n).as("r"))
      .orderBy("t").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1))).toList
  }

  private val genDense: Gen[(List[Double], Int)] = for {
    len <- Gen.chooseNum(5, 25)
    vals <- Gen.listOfN(len, Gen.chooseNum(0, 10000).map(_ / 100.0))
    n <- Gen.oneOf(1, 3, 4, 5, 10)
  } yield (vals, n)

  property("rolling: constant series is constant after min_periods; null before") =
    forAll(Gen.chooseNum(1, 8), Gen.chooseNum(1, 20)) { (n, len0) =>
      val len = math.max(len0, n)
      val out = triang(List.fill(len)(42.0), n)
      out.zipWithIndex.forall { case (o, i) =>
        if (i < n - 1) o.isEmpty else o.exists(v => math.abs(v - 42.0) < 1e-9)
      }
    }

  property("rolling: result within [window min, window max]") =
    forAll(genDense) { case (vals, n) =>
      val out = triang(vals, n)
      out.zipWithIndex.forall {
        case (Some(v), i) =>
          val win = vals.slice(i - n + 1, i + 1)
          v >= win.min - 1e-9 && v <= win.max + 1e-9
        case (None, i) => i < n - 1
      }
    }

  property("rolling: window max never exceeds global max (peak-effort invariant)") =
    forAll(genDense) { case (vals, n) =>
      triang(vals, n).flatten.forall(_ <= vals.max + 1e-9)
    }

  // --- as-of join: the union+last formulation vs the naive definition ---

  /** Random left/right tables over few keys; right (key, ts) unique so
    * the expected match is well-defined. */
  private val genAsof: Gen[(List[(Long, Long)], List[(Long, Long, Long)])] = for {
    nl <- Gen.chooseNum(1, 15)
    left <- Gen.listOfN(nl, for {
      k <- Gen.chooseNum(1L, 3L); t <- Gen.chooseNum(0L, 40L)
    } yield (k, t))
    nr <- Gen.chooseNum(0, 15)
    rightRaw <- Gen.listOfN(nr, for {
      k <- Gen.chooseNum(1L, 3L); t <- Gen.chooseNum(0L, 40L)
    } yield (k, t))
  } yield {
    val right = rightRaw.distinct.zipWithIndex.map { case ((k, t), i) =>
      (k, t, 1000L + i)
    }
    (left.zipWithIndex.map { case ((k, t), i) => (k, t) }, right)
  }

  property("asof: union+last equals the naive latest-at-or-before definition") =
    forAll(genAsof) { case (left, right) =>
      val l = left.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val r = right.toDF("k", "t", "payload")
      val got = AsOfJoin.asof(l, r, Seq("k"), "t", "t",
        Seq("payload" -> "p"), inner = false)
        .select("lid", "p").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
        .toMap
      val expected = left.zipWithIndex.map { case ((k, t), i) =>
        val m = right.filter(e => e._1 == k && e._2 <= t)
        i.toLong -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.toMap
      got == expected
    }

  private val genDocs: Gen[List[(Long, String, String)]] =
    Gen.chooseNum(1, 20).flatMap { n =>
      Gen.sequence[List[(Long, String, String)], (Long, String, String)](
        (0 until n).map { i =>
          for {
            words <- Gen.chooseNum(1, 40)
            src <- Gen.oneOf("a", "b", "c")
          } yield (i.toLong, (1 to words).map(j => s"w$j").mkString(" "), src)
        })
    }

  property("packSequences: tokens conserved, interior sequences full") =
    forAll(genDocs, Gen.chooseNum(2L, 64L)) { (docs, cap) =>
      val df = docs.toDF("doc_id", "text", "lang")
      val packed = graft.functions.TextQuality.packSequences(df, cap, "lang")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val wordCount = docs.map { case (id, text, src) =>
        (src, id) -> text.split(" ").length.toLong }.toMap
      val perDoc = packed.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._4).sum)
      // every doc's tokens land somewhere, exactly once
      wordCount.forall { case (k, n) => perDoc.get(k).contains(n) } && {
        // per shard, every sequence except the last is exactly full
        packed.groupBy(_._1).forall { case (_, rows) =>
          val bySeq = rows.groupBy(_._3).view.mapValues(_.map(_._4).sum)
          val lastSeq = bySeq.keys.max
          bySeq.forall { case (s, tot) => s == lastSeq || tot == cap }
        }
      }
    }

  // ---- substring scrub (d20) vs an independent plain-Scala reference ----
  // random small corpora over a tiny vocabulary (so duplicated grams and
  // overlapping islands actually occur), compared against a brute-force
  // reimplementation of the contract: corpus-first gram election,
  // removable-start islands, covered-position union, ordered reassembly.
  private val genCorpus: Gen[List[(Long, String)]] =
    Gen.chooseNum(2, 5).flatMap { nDocs =>
      Gen.sequence[List[(Long, String)], (Long, String)](
        (1 to nDocs).map { id =>
          Gen.chooseNum(0, 14).flatMap { n =>
            Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(ws =>
              (id.toLong, ws.mkString(" ")))
          }
        }.toList)
    }

  private def refScrub(docs: List[(Long, String)], minRun: Int): Map[Long, (Long, String)] = {
    def toks(t: String) = if (t.isEmpty) List("") else t.split(" ", -1).toList
    val grams = for {
      (id, t) <- docs
      ws = toks(t)
      i <- 0 to ws.length - minRun
    } yield ((id, i), ws.slice(i, i + minRun).mkString(" "))
    val firstOf = grams.groupBy(_._2)
      .map { case (g, occ) => g -> occ.map(_._1).minBy(identity) }
    val removable = grams.collect {
      case ((id, i), g) if firstOf(g) != ((id, i)) => (id, i)
    }
    val covered = removable.groupBy(_._1).view.mapValues { starts =>
      // islands of consecutive starts -> cover [start, last + minRun - 1]
      val ss = starts.map(_._2).sorted
      val islands = ss.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      islands.flatMap { case (s, e) => s to (e + minRun - 1) }.toSet
    }.toMap
    docs.map { case (id, t) =>
      val ws = toks(t)
      val cov = covered.getOrElse(id, Set.empty)
      val kept = ws.zipWithIndex.collect { case (w, i) if !cov(i) => w }
      id -> ((ws.length - kept.length).toLong, kept.mkString(" "))
    }.toMap
  }

  property("substringScrub == brute-force reference on random corpora") =
    forAll(genCorpus) { docs =>
      val nonEmpty = docs.filter(_._2.nonEmpty)
      val minRun = 3
      val got = Dedup.substringScrub(nonEmpty.toDF("doc_id", "text"), minRun)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      val want = refScrub(nonEmpty, minRun)
      // operator emits one row per doc with >= 1 token; all nonEmpty qualify
      got == want
    }

  property("weightedMix: per-doc copies within [floor, ceil] of its weight") =
    forAll(genDocs) { docs =>
      val mw = Map("a" -> 2500L, "b" -> 700L, "c" -> 0L)
      val df = docs.toDF("doc_id", "text", "source")
      val out = Sampling.weightedMix(df, mw)
        .groupBy("doc_id", "source").count()
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val counts = out.map(r => (r._1, r._2) -> r._3).toMap
      docs.forall { case (id, _, src) =>
        val w = mw(src)
        val n = counts.getOrElse((id, src), 0L)
        n >= w / 1000 && n <= w / 1000 + (if (w % 1000 == 0) 0 else 1) &&
          (src != "c" || n == 0L)
      }
    }
}
