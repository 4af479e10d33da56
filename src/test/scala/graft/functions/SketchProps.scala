package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

/** Property-based invariants for the sketch kernels, driven through
  * the REAL aggregate code paths (update/merge/serialize via a bound
  * reference) — no Spark jobs, so trials are cheap and numerous. */
object SketchProps extends Properties("sketches") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(60)

  // ---- Bloom ----

  private val BloomBits = 1 << 12
  private val BloomHashes = 5
  private def bloomAgg = BloomBuild(
    BoundReference(0, StringType, nullable = true), BloomBits, BloomHashes)

  private def bloomOf(items: Seq[String]): Array[Byte] = {
    val agg = bloomAgg
    val buf = agg.createAggregationBuffer()
    items.foreach(s => agg.update(buf, InternalRow(UTF8String.fromString(s))))
    agg.serialize(buf)
  }

  private val genItems: Gen[List[String]] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumStr.map(_.take(12))))

  private val genSplit: Gen[Int] = Gen.chooseNum(1, 7)

  property("bloom: no false negatives under any merge split") =
    forAll(genItems, genSplit) { (items, k) =>
      val agg = bloomAgg
      val parts = items.grouped(math.max(1, (items.size + k - 1) / k)).toSeq
      val merged = parts.map { p =>
        val b = agg.createAggregationBuffer()
        p.foreach(s => agg.update(b, InternalRow(UTF8String.fromString(s))))
        b
      }.reduceOption(agg.merge).getOrElse(agg.createAggregationBuffer())
      val bytes = agg.serialize(merged)
      items.forall(s =>
        Bloom.mightContain(bytes, UTF8String.fromString(s), BloomHashes)) &&
        java.util.Arrays.equals(bytes, bloomOf(items))
    }

  // ---- Count-min ----

  private val Depth = 4
  private val Width = 32
  private def cmsAgg = CmsBuild(
    BoundReference(0, LongType, nullable = true), Depth, Width)

  private def cmsOf(keys: Seq[Long]): Array[Byte] = {
    val agg = cmsAgg
    val buf = agg.createAggregationBuffer()
    keys.foreach(k => agg.update(buf, InternalRow(k)))
    agg.serialize(buf)
  }

  private val genKeys: Gen[List[Long]] =
    Gen.chooseNum(0, 500).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 200L)))

  property("cms: merge split-invariant and estimates never undercount") =
    forAll(genKeys, genSplit) { (keys, k) =>
      val agg = cmsAgg
      val parts = keys.grouped(math.max(1, (keys.size + k - 1) / k)).toSeq
      val merged = parts.map { p =>
        val b = agg.createAggregationBuffer()
        p.foreach(x => agg.update(b, InternalRow(x)))
        b
      }.reduceOption(agg.merge).getOrElse(agg.createAggregationBuffer())
      val bytes = agg.serialize(merged)
      val truth = keys.groupBy(identity).map { case (x, v) => x -> v.size.toLong }
      java.util.Arrays.equals(bytes, cmsOf(keys)) &&
        truth.forall { case (x, n) =>
          CountMin.estimate(bytes, x, Depth, Width) >= n
        }
    }

  property("cms: inner product never undercounts the true join size") =
    forAll(genKeys, genKeys) { (a, b) =>
      val sa = cmsOf(a)
      val sb = cmsOf(b)
      val ca = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exact = ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
      CountMin.innerProduct(sa, sb, Depth, Width) >= exact
    }

  // ---- LogHistogram (quantile sketch) ----

  private val LhK = 5
  private def lhAgg = LogHistogram(
    BoundReference(0, LongType, nullable = true), LhK)

  private def lhContent(buf: scala.collection.mutable.HashMap[Long, Long]) =
    buf.toSeq.sortBy(_._1)

  private val genVals: Gen[List[Long]] =
    Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 1L << 40)))

  property("log-histogram: content split-invariant, counts conserved, error bounded") =
    forAll(genVals, genSplit) { (vals, k) =>
      val agg = lhAgg
      val parts = vals.grouped(math.max(1, (vals.size + k - 1) / k)).toSeq
      val merged = parts.map { p =>
        val b = agg.createAggregationBuffer()
        p.foreach(v => agg.update(b, InternalRow(v)))
        // serde round-trip on every partial, like a real exchange
        agg.deserialize(agg.serialize(b))
      }.reduceOption(agg.merge).getOrElse(agg.createAggregationBuffer())
      val single = agg.createAggregationBuffer()
      vals.foreach(v => agg.update(single, InternalRow(v)))
      lhContent(merged) == lhContent(single) &&
        merged.values.sum == vals.size &&
        vals.filter(_ > 0).forall { v =>
          val lo = LogHistogram.bucketFloor(v, LhK)
          lo <= v && (v - lo).toDouble <= lo.toDouble * math.pow(2, -LhK)
        }
    }

  // ---- Gramian (covariance second-moment aggregate) ----

  private val GD = 3
  private def gramAgg = GramianAgg(BoundReference(0,
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType), nullable = true), GD)

  // small-integer doubles: sums are exactly representable, so merge
  // order cannot perturb bits and split-invariance is BITWISE
  private val genVecs: Gen[List[List[Double]]] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(GD, Gen.chooseNum(-8, 8).map(_.toDouble))))

  property("gramian: bitwise split-invariant on exact inputs; short/null rows skipped") =
    forAll(genVecs, genSplit) { (vecs, k) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val agg = gramAgg
      def rowOf(v: List[Double]) =
        InternalRow(new GenericArrayData(v.toArray[Any]))
      val dirty: List[InternalRow] = InternalRow(null) ::
        rowOf(List(1.0)) :: vecs.map(rowOf) // null + short interleaved
      val parts = dirty.grouped(math.max(1, (dirty.size + k - 1) / k)).toSeq
      val merged = parts.map { p =>
        val b = agg.createAggregationBuffer()
        p.foreach(agg.update(b, _))
        agg.deserialize(agg.serialize(b))
      }.reduceOption(agg.merge).getOrElse(agg.createAggregationBuffer())
      val single = agg.createAggregationBuffer()
      dirty.foreach(agg.update(single, _))
      java.util.Arrays.equals(merged, single) &&
        merged(0) == vecs.size.toDouble && // null/short rows not counted
        merged(1) == vecs.map(_.head).sum
    }
}
