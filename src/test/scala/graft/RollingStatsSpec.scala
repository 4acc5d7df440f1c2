package graft

import graft.streaming.RollingStats
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Algebraic properties of the rolling-statistics state (SURVEY §5 item
  * b): the O(1) incremental sum/sumSquares maintenance must equal a full
  * recomputation over the retained window, and median/MAD must match
  * their sorted-list definitions. Property-style via fixed-seed sampling.
  */
class RollingStatsSpec extends AnyFunSuite {

  private def samples(seed: Int): Seq[List[Double]] = {
    val rnd = new Random(seed)
    (0 until 200).map { _ =>
      List.fill(rnd.nextInt(40))(rnd.nextDouble() * 2e3 - 1e3)
    }
  }

  test("incremental sum/sumSquares equals recomputation over the ring") {
    for (xs <- samples(1)) {
      val st = xs.foldLeft(RollingStats(maxSize = 10))(_.add(_))
      val kept = xs.takeRight(10)
      assert(st.values == kept.toVector)
      assert(math.abs(st.sum - kept.sum) < 1e-6)
      assert(math.abs(st.sumSquares - kept.map(x => x * x).sum) < 1e-4)
    }
  }

  test("mean and population stddev match two-pass formulas") {
    for (xs <- samples(2) if xs.nonEmpty) {
      val st = xs.foldLeft(RollingStats(maxSize = 1000))(_.add(_))
      val mean = xs.sum / xs.size
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
      assert(math.abs(st.mean - mean) < 1e-9)
      assert(math.abs(st.stddev - math.sqrt(variance)) < 1e-6)
    }
  }

  test("median matches reference semantics (avg of two middles when even)") {
    assert(RollingStats().add(3).add(1).add(2).median == 2.0)
    assert(RollingStats().add(4).add(1).add(3).add(2).median == 2.5)
    for (xs <- samples(3) if xs.nonEmpty) {
      val st = xs.foldLeft(RollingStats(maxSize = 1000))(_.add(_))
      val s = xs.sorted.toIndexedSeq
      val n = s.size
      val expected =
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      assert(st.median == expected)
    }
  }

  test("MAD is the median of absolute deviations from the median") {
    // values 1..5: median 3, |dev| = [2,1,0,1,2] sorted [0,1,1,2,2] → 1
    val st = (1 to 5).foldLeft(RollingStats())((s, x) => s.add(x.toDouble))
    assert(st.mad == 1.0)
  }

  test("eviction keeps exactly maxSize most-recent values") {
    val st = (1 to 150).foldLeft(RollingStats())((s, x) => s.add(x.toDouble))
    assert(st.size == 100)
    assert(st.values.head == 51.0 && st.values.last == 150.0)
    assert(st.mean == (51 to 150).sum / 100.0)
  }
}
