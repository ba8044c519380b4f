package graft

import graft.functions.FreqItems
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Property tests for the Misra–Gries kernel, driven at the aggregate level
  * (update/merge/serialize on InternalRows, no Spark jobs) so hundreds of
  * randomized partitionings and merge trees are cheap. The DataFrame-level
  * contracts live in FreqItemsSpec; these pin the ALGEBRA: arbitrary
  * partition splits and merge orders, serde roundtrips on every partial,
  * and the MG bounds on random streams. Samples are drawn from scalacheck
  * generators under fixed seeds (the scalatest+scalacheck bridge artifact
  * isn't in the offline cache, so the loop is explicit).
  */
class FreqItemsPropertySpec extends AnyFunSuite {

  private def agg(cap: Int) =
    FreqItems(BoundReference(0, StringType, nullable = true), Literal(cap, IntegerType))

  private def row(t: String) = InternalRow(UTF8String.fromString(t))

  /** Run the stream through a random partitioning + random merge tree. */
  private def sketch(
      a: FreqItems, stream: Seq[String], cuts: Seq[Int],
      rnd: scala.util.Random): Map[String, Long] = {
    val parts = (cuts.sorted.distinct :+ stream.length)
      .foldLeft((0, List.empty[Seq[String]])) {
        case ((from, acc), to) if to > from => (to, stream.slice(from, to) :: acc)
        case (st, _) => st
      }._2
    val bufs = mutable.Buffer(parts.map { p =>
      val b = a.createAggregationBuffer()
      p.foreach(t => a.update(b, row(t)))
      // serde roundtrip on every partial, as the shuffle would
      a.deserialize(a.serialize(b))
    }: _*)
    if (bufs.isEmpty) bufs += a.createAggregationBuffer()
    while (bufs.size > 1) {
      val i = rnd.nextInt(bufs.size - 1)
      val other = bufs.remove(i + 1)
      bufs(i) = a.merge(bufs(i), other)
    }
    a.eval(bufs.head) match {
      case arr: org.apache.spark.sql.catalyst.util.GenericArrayData =>
        arr.array.map { case r: InternalRow =>
          r.getUTF8String(0).toString -> r.getLong(1)
        }.toMap
    }
  }

  private val streamGen: Gen[(List[String], List[Int], Long)] = for {
    alphabet <- Gen.choose(1, 60)
    n <- Gen.choose(0, 400)
    toks <- Gen.listOfN(n, Gen.choose(0, alphabet - 1).map(i => s"t$i"))
    nCuts <- Gen.choose(0, 8)
    cuts <- Gen.listOfN(nCuts, Gen.choose(0, math.max(0, n)))
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (toks, cuts, seed)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("exact regime: any partitioning + merge tree reproduces exact counts") {
    val cases = samples(streamGen, 200)
    assert(cases.size > 150, "generator must actually produce samples")
    cases.foreach { case (toks, cuts, seed) =>
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cap = math.max(1, exact.size) // cap >= distinct -> exact
      val got = sketch(agg(cap), toks, cuts, new scala.util.Random(seed))
      assert(got == exact, s"seed=$seed n=${toks.size} cuts=$cuts")
    }
  }

  test("approx regime: lower bounds, n/cap error, guaranteed survivors") {
    val capGen = Gen.choose(1, 16)
    val cases = samples(streamGen.flatMap(s => capGen.map(c => (s, c))), 200)
    assert(cases.size > 150)
    cases.foreach { case ((toks, cuts, seed), cap) =>
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toLong
      val got = sketch(agg(cap), toks, cuts, new scala.util.Random(seed))
      got.foreach { case (t, c) =>
        assert(c <= exact(t), s"overestimate on $t (seed=$seed cap=$cap)")
        assert(exact(t) - c <= n / cap, s"error bound broken on $t (seed=$seed cap=$cap)")
      }
      exact.filter(_._2 > n / cap).keys.foreach { t =>
        assert(got.contains(t), s"heavy hitter $t evicted (n=$n cap=$cap seed=$seed)")
      }
    }
  }
}
