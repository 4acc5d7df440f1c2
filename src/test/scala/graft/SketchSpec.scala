package graft

import graft.functions.{MgState, TopKSketch}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the Misra–Gries summary — pure JVM, no
  * SparkSession: the guarantees must hold under ARBITRARY splits of the
  * stream into partials merged in arbitrary order, which is exactly
  * what Spark's partial aggregation does to it.
  */
object SketchSpec extends Properties("graft.topksketch") {

  private val token: Gen[String] = Gen.oneOf(
    (1 to 12).map(i => s"t$i"))

  // weighted stream with a deliberately skewed token distribution
  private val stream: Gen[List[(String, Long)]] =
    Gen.nonEmptyListOf(for {
      t <- Gen.frequency((8, Gen.const("hot")), (2, token))
      w <- Gen.choose(1L, 5L)
    } yield (t, w))

  private def exact(xs: List[(String, Long)]): Map[String, Long] =
    xs.groupMapReduce(_._1)(_._2)(_ + _)

  /** Fold the stream through the sketch with an arbitrary recursive
    * split/merge tree (seeded), mimicking partial aggregation.
    */
  private def runSplit(agg: TopKSketch, xs: List[(String, Long)],
                       seed: Long): MgState = {
    val rnd = new scala.util.Random(seed)
    def go(ys: List[(String, Long)]): MgState =
      if (ys.length <= 1 || rnd.nextBoolean())
        ys.foldLeft(agg.zero)(agg.reduce)
      else {
        val (l, r) = ys.splitAt(1 + rnd.nextInt(ys.length - 1))
        agg.merge(go(l), go(r))
      }
    go(xs)
  }

  property("bound holds under arbitrary split/merge trees") =
    forAll(stream, Gen.choose(1, 6), Gen.long) { (xs, k, seed) =>
      val agg = new TopKSketch(k)
      val s = runSplit(agg, xs, seed)
      val truth = exact(xs)
      val surviving = s.counters.toMap
      // ≤ k counters, est undercounts, bound covers the truth
      surviving.size <= k &&
      surviving.forall { case (t, est) =>
        val tc = truth.getOrElse(t, 0L)
        est <= tc && tc <= est + s.dec
      } &&
      // every token heavier than the error bound must survive
      truth.forall { case (t, tc) =>
        tc <= s.dec || surviving.contains(t)
      }
    }

  property("k above distinct-token count makes the summary exact") =
    forAll(stream, Gen.long) { (xs, seed) =>
      val agg = new TopKSketch(64)
      val s = runSplit(agg, xs, seed)
      s.dec == 0L && s.counters.toMap == exact(xs)
    }

  property("finish orders deterministically: est desc, then token") =
    forAll(stream, Gen.choose(1, 6), Gen.long) { (xs, k, seed) =>
      val agg = new TopKSketch(k)
      val items = agg.finish(runSplit(agg, xs, seed)).items
      items == items.sortBy(e => (-e.est, e.token))
    }
}
