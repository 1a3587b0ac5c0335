package graft.stats

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Global Moran/Geary: the statistic itself is cross-checked against a
  * plain-Scala brute force, and the Cliff-Ord RANDOMIZATION moments are
  * validated empirically — 20k actual permutations of the value vector
  * must reproduce the closed-form expectation and variance. The
  * normality-assumption variance has no empirical twin (it assumes a
  * different null), so it is pinned by formula-independent brute
  * recomputation of S1/S2. External pin: the published GeoDa workbook
  * global I for Guerry Crm_prs over queen weights lives in GuerrySpec.
  */
class GlobalStatsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  // 5x6 grid, queen adjacency, deterministic values
  private val (nRows, nCols) = (5, 6)
  private val n = nRows * nCols
  private val edges: Seq[(Int, Int)] = for {
    r <- 0 until nRows; c <- 0 until nCols
    dr <- -1 to 1; dc <- -1 to 1
    if !(dr == 0 && dc == 0)
    r2 = r + dr; c2 = c + dc
    if r2 >= 0 && r2 < nRows && c2 >= 0 && c2 < nCols
  } yield (r * nCols + c, r2 * nCols + c2)
  private val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
  private val xs = Array.tabulate(n)(i => ((i * 37) % 13).toDouble + 0.25 * i)

  private def bruteMoran(x: Array[Double]): Double = {
    val mean = x.sum / n
    val z = x.map(_ - mean)
    val s0 = edges.map(e => 1.0 / deg(e._1)).sum
    val num = edges.map { case (i, j) => z(i) * z(j) / deg(i) }.sum
    n / s0 * num / z.map(v => v * v).sum
  }

  private def bruteGeary(x: Array[Double]): Double = {
    val mean = x.sum / n
    val z2 = x.map(v => (v - mean) * (v - mean)).sum
    val s0 = edges.map(e => 1.0 / deg(e._1)).sum
    val num = edges.map { case (i, j) =>
      val d = x(i) - x(j); d * d / deg(i)
    }.sum
    (n - 1) / (2.0 * s0) * num / z2
  }

  private def frames() = {
    import spark.implicits._
    val vals = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("gid", "value")
    val pairs = edges.map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("gid", "nbr")
    (vals, pairs)
  }

  test("mismatched edge/value universe fails loudly instead of biasing the statistic") {
    import spark.implicits._
    val (vals, pairs) = frames()
    // drop one value row whose gid still appears in the edge list —
    // its edges would silently vanish from the numerator while S0/S1/S2
    // kept counting them
    val holed = vals.filter(org.apache.spark.sql.functions.col("gid") =!= 7L)
    def rootMessages(e: Throwable): String = {
      val sb = new StringBuilder
      var t: Throwable = e
      while (t != null) { sb.append(t.getMessage).append('\n'); t = t.getCause }
      sb.toString
    }
    for (stat <- Seq(
        () => GlobalStats.moran(holed, pairs).head(),
        () => GlobalStats.geary(holed, pairs).head())) {
      val ex = intercept[Exception](stat())
      assert(rootMessages(ex).contains("no value row"), rootMessages(ex))
    }
    val bin = vals.select(org.apache.spark.sql.functions.col("gid"),
      (org.apache.spark.sql.functions.col("gid") % 2).cast("double")
        .as("value"))
    val exJc = intercept[Exception](GlobalStats.joinCount(
      bin.filter(org.apache.spark.sql.functions.col("gid") =!= 7L),
      pairs).head())
    assert(rootMessages(exJc).contains("no value row"), rootMessages(exJc))
  }

  test("Moran statistic matches brute force; randomization moments match 20k real permutations") {
    val (vals, pairs) = frames()
    val r = GlobalStats.moran(vals, pairs).head()
    val (i, ei, varNorm, varRand) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(4))
    assert(math.abs(i - bruteMoran(xs)) < 1e-12)
    assert(math.abs(ei - (-1.0 / (n - 1))) < 1e-15)
    assert(varNorm > 0 && varRand > 0)
    // empirical permutation distribution
    val rnd = new scala.util.Random(42)
    val perm = xs.clone()
    val samples = Array.fill(20000) {
      // Fisher-Yates
      var k = n - 1
      while (k > 0) {
        val j = rnd.nextInt(k + 1)
        val t = perm(k); perm(k) = perm(j); perm(j) = t
        k -= 1
      }
      bruteMoran(perm)
    }
    val m = samples.sum / samples.length
    val v = samples.map(s => (s - m) * (s - m)).sum / (samples.length - 1)
    assert(math.abs(m - ei) < 0.005, s"empirical mean $m vs E[I] $ei")
    assert(math.abs(v - varRand) / varRand < 0.05,
      s"empirical var $v vs var_rand $varRand")
  }

  test("Geary statistic matches brute force; randomization moments match 20k real permutations") {
    val (vals, pairs) = frames()
    val r = GlobalStats.geary(vals, pairs).head()
    val (c, varRand) = (r.getDouble(0), r.getDouble(4))
    assert(math.abs(c - bruteGeary(xs)) < 1e-12)
    assert(r.getDouble(1) === 1.0)
    val rnd = new scala.util.Random(4242)
    val perm = xs.clone()
    val samples = Array.fill(20000) {
      var k = n - 1
      while (k > 0) {
        val j = rnd.nextInt(k + 1)
        val t = perm(k); perm(k) = perm(j); perm(j) = t
        k -= 1
      }
      bruteGeary(perm)
    }
    val m = samples.sum / samples.length
    val v = samples.map(s => (s - m) * (s - m)).sum / (samples.length - 1)
    assert(math.abs(m - 1.0) < 0.01, s"empirical mean $m vs E[c] 1")
    assert(math.abs(v - varRand) / varRand < 0.05,
      s"empirical var $v vs var_rand $varRand")
  }

  test("global join count: statistic matches brute force; moments match 20k real permutations") {
    import spark.implicits._
    val ind = xs.map(v => if (v > 7.0) 1.0 else 0.0)
    def bruteBB(x: Array[Double]): Double =
      edges.map { case (i, j) => x(i) * x(j) }.sum / 2.0
    val vals = ind.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("gid", "value")
    val pairs = edges.map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("gid", "nbr")
    val r = GlobalStats.joinCount(vals, pairs).head()
    val (bb, eBB, varRand) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(bb === bruteBB(ind))
    val rnd = new scala.util.Random(777)
    val perm = ind.clone()
    val samples = Array.fill(20000) {
      var k = n - 1
      while (k > 0) {
        val j = rnd.nextInt(k + 1)
        val t = perm(k); perm(k) = perm(j); perm(j) = t
        k -= 1
      }
      bruteBB(perm)
    }
    val m = samples.sum / samples.length
    val v = samples.map(s => (s - m) * (s - m)).sum / (samples.length - 1)
    assert(math.abs(m - eBB) / eBB < 0.01, s"empirical mean $m vs E $eBB")
    assert(math.abs(v - varRand) / varRand < 0.05,
      s"empirical var $v vs var_rand $varRand")
    intercept[IllegalArgumentException] {
      GlobalStats.joinCount(
        xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
          .toSeq.toDF("gid", "value"), pairs).head()
    }
  }

  test("normality variance matches brute S-moment recomputation (binary, asymmetric kNN-like graph)") {
    import spark.implicits._
    // directed graph: i -> (i+1) % n and i -> (i*7+3) % n — reverse
    // edges mostly absent, exercising the one-directional S1 path
    val dEdges = (0 until n).flatMap(i =>
      Seq((i, (i + 1) % n), (i, (i * 7 + 3) % n))).filter(e => e._1 != e._2)
        .distinct
    val pairs = dEdges.map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("gid", "nbr")
    val vals = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("gid", "value")
    val r = GlobalStats.moran(vals, pairs, rowStandardized = false).head()
    // brute S-moments over the dense W matrix
    val wm = Array.ofDim[Double](n, n)
    dEdges.foreach { case (i, j) => wm(i)(j) = 1.0 }
    val s0 = wm.map(_.sum).sum
    var s1 = 0.0
    for (i <- 0 until n; j <- 0 until n)
      s1 += (wm(i)(j) + wm(j)(i)) * (wm(i)(j) + wm(j)(i))
    s1 /= 2.0
    val s2 = (0 until n).map { i =>
      val t = wm(i).sum + (0 until n).map(j => wm(j)(i)).sum
      t * t
    }.sum
    val ei = -1.0 / (n - 1)
    val want = (n * n * s1 - n * s2 + 3 * s0 * s0) /
      ((n * n - 1.0) * s0 * s0) - ei * ei
    assert(math.abs(r.getDouble(2) - want) < 1e-12,
      s"var_norm ${r.getDouble(2)} vs brute $want")
  }
}
