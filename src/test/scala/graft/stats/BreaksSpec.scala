package graft.stats

import org.scalatest.funsuite.AnyFunSuite

/** Focused spec for the r8 parallel Fisher-Jenks DP: the threaded layer
  * sweep must be bit-identical to the serial dynamic program (same
  * first-minimum tie rule), above and below the 4096 parallel
  * threshold.
  */
class BreaksSpec extends AnyFunSuite {

  /** Straightforward serial Fisher-Jenks, kept deliberately naive — the
    * reference the production (parallel) implementation must match.
    */
  private def jenksSerial(sorted: Array[Double], k: Int): Seq[Double] = {
    val n = sorted.length
    if (k >= n) return sorted.drop(1).take(k - 1).toSeq
    val ps = new Array[Double](n + 1)
    val ps2 = new Array[Double](n + 1)
    for (i <- 0 until n) {
      ps(i + 1) = ps(i) + sorted(i)
      ps2(i + 1) = ps2(i) + sorted(i) * sorted(i)
    }
    def ssd(a: Int, b: Int): Double = {
      val s = ps(b) - ps(a)
      (ps2(b) - ps2(a)) - s * s / (b - a)
    }
    var prev = Array.tabulate(n + 1)(i => if (i == 0) 0.0 else ssd(0, i))
    val split = Array.ofDim[Int](k + 1, n + 1)
    for (c <- 2 to k) {
      val cur = Array.fill(n + 1)(Double.MaxValue)
      for (iEnd <- c to n) {
        var best = Double.MaxValue; var bestJ = c - 1
        for (j <- (c - 1) until iEnd) {
          val v = prev(j) + ssd(j, iEnd)
          if (v < best) { best = v; bestJ = j }
        }
        cur(iEnd) = best; split(c)(iEnd) = bestJ
      }
      prev = cur
    }
    val cuts = new Array[Int](k - 1)
    var end = n
    for (c <- k until 1 by -1) { cuts(c - 2) = split(c)(end); end = split(c)(end) }
    cuts.map(sorted(_)).toSeq
  }

  test("parallel jenks equals serial DP above the 4096 threshold") {
    // heavily tied integer-derived values — the tie-rule stress shape
    val vals = Array.tabulate(6000)(i => ((i * 31L) % 977).toDouble)
    java.util.Arrays.sort(vals)
    for (k <- Seq(2, 5, 7))
      assert(Breaks.jenks(vals, k) == jenksSerial(vals, k), s"k=$k")
  }

  test("parallel jenks equals serial DP below the threshold") {
    val vals = Array.tabulate(500)(i => ((i * 17L) % 131).toDouble)
    java.util.Arrays.sort(vals)
    for (k <- Seq(2, 4, 6))
      assert(Breaks.jenks(vals, k) == jenksSerial(vals, k), s"k=$k")
  }
}
