package graft.stats

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bivariate local Moran: with value2 == value it must reduce
  * BIT-IDENTICALLY to the univariate kernel (same draw stream), in
  * both permutation modes; with an anti-correlated second variable the
  * significant labels flip to the discordant quadrants.
  */
class BiMoranSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def grid() = {
    import spark.implicits._
    // 8x8 grid, rook adjacency as a weights frame (gid, nbrs, wts)
    val n = 64
    val nbrs = (0 until n).map { i =>
      val (r, c) = (i / 8, i % 8)
      val ns = Seq((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1))
        .filter { case (rr, cc) => rr >= 0 && rr < 8 && cc >= 0 && cc < 8 }
        .map { case (rr, cc) => (rr * 8 + cc).toLong }.sorted
      (i.toLong, ns, null.asInstanceOf[Seq[Seq[Double]]])
    }
    nbrs.toDF("gid", "nbrs", "wts")
  }

  private def vals(f: Int => Double) = {
    import spark.implicits._
    (0 until 64).map(i => (i.toLong, f(i))).toDF("gid", "value")
  }

  test("value2 == value reduces bit-identically to localMoran (both perm modes)") {
    val w = grid()
    val v = vals(i => ((i * 37) % 101).toDouble)
    for (mode <- Seq("complete", "lookup")) {
      val conf = Lisa.Conf(permutations = 199, permMethod = mode)
      val uni = Lisa.localMoran(v, w, conf).orderBy("gid").collect()
      val bi = Lisa.localBiMoran(v.withColumn("value2", col("value")),
        w, conf).orderBy("gid").collect()
      assert(uni.length === 64)
      uni.zip(bi).foreach { case (a, b) =>
        assert(a.getLong(0) === b.getLong(0))
        assert(a.getDouble(1) === b.getDouble(1), s"stat mode=$mode")
        assert(a.getDouble(2) === b.getDouble(2), s"p mode=$mode")
        assert(a.getDouble(3) === b.getDouble(3), s"cluster mode=$mode")
      }
    }
  }

  test("anti-correlated second variable lands in discordant quadrants") {
    val w = grid()
    // smooth gradient x; y = -x → z_y = -z_x, lag_y = -lag_x
    val v = vals(i => (i / 8 + i % 8).toDouble)
      .withColumn("value2", -col("value"))
    val bi = Lisa.localBiMoran(v, w, Lisa.Conf(permutations = 999))
      .collect()
    val sig = bi.filter(r => r.getDouble(2) <= 0.05 && r.getDouble(3) != 5.0)
    assert(sig.exists(r => r.getDouble(3) == 3.0) &&
      sig.exists(r => r.getDouble(3) == 4.0))
    // concordant labels (1 = high-high, 2 = low-low) are impossible
    // under y = -x; gradient-center rows with z_x exactly 0 keep
    // label 0 regardless of p
    assert(sig.forall(r => r.getDouble(3) == 3.0 || r.getDouble(3) == 4.0 ||
      (r.getDouble(3) == 0.0 && r.getDouble(1) == 0.0)),
      sig.map(_.toString).mkString(","))
  }
}
