package graft

import graft.stats.Lisa
import graft.weights.{ContiguityWeights, KnnWeights}
import org.scalatest.funsuite.AnyFunSuite

/** Regression goldens on a natregimes-style fixture (FIXTURES.md §2):
  * 7x7 grid of unit-square polygons with deterministic values, queen
  * contiguity + local Moran and centroid-kNN + G*. Values pinned from
  * this engine's §2.3-spec kernel (seed 123456789, 999 perms) — any
  * refactor that changes weights construction, standardization, the RNG
  * stream, or label assignment breaks these exact equalities.
  *
  * These are REGRESSION pins (self-produced); EXTERNAL validation lives
  * in GuerrySpec (reference-produced queen map on real WKB), the
  * C-pinned kernel toys (LisaKernelsSpec + tools/pin_reference_rng.c),
  * and the DuckDB statistic oracles (q30-q39).
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def fixture() = {
    import spark.implicits._
    val polys = (for (cy <- 0 until 7; cx <- 0 until 7) yield {
      val gid = (cy * 7 + cx + 1).toLong
      (gid, graft.core.Wkb.writePolygon(Array((cx * 1.0, cy * 1.0),
        (cx + 1.0, cy * 1.0), (cx + 1.0, cy + 1.0), (cx * 1.0, cy + 1.0))))
    }).toDF("gid", "geom")
    val vals = (1 to 49).map(i => (i.toLong, ((i * 37) % 101).toDouble))
      .toDF("gid", "value")
    (polys, vals)
  }

  test("queen + local Moran golden triples (seed 123456789, 999 perms)") {
    val (polys, vals) = fixture()
    val w = ContiguityWeights.build(polys, ContiguityWeights.Conf(queen = true))
    val moran = Lisa.localMoran(vals, w).orderBy("gid").collect()
    val want = Seq(
      (1L, -0.24407832135171267, 0.205, 0.0),
      (12L, -0.020325239567711855, 0.45, 0.0),
      (25L, -0.11540673700594033, 0.421, 0.0),
      (39L, -0.08219609861345815, 0.39, 0.0),
      (49L, -0.9251330696459236, 0.161, 0.0))
    want.foreach { case (gid, i, p, c) =>
      val r = moran((gid - 1).toInt)
      assert(r.getLong(0) == gid)
      assert(r.getDouble(1) == i, s"I at $gid")
      assert(r.getDouble(2) == p, s"p at $gid")
      assert(r.getDouble(3) == c, s"cluster at $gid")
    }
  }

  test("centroid kNN + G* golden triples") {
    import spark.implicits._
    val (polys, vals) = fixture()
    val pts = polys.as[(Long, Array[Byte])].map { case (g, wkb) =>
      val c = graft.core.Wkb.read(wkb).get.centroid
      (g, c._1, c._2)
    }.toDF("gid", "x", "y")
    val kw = KnnWeights.build(pts, KnnWeights.Conf(k = 4, cellSize = Some(1.0)))
    val gg = Lisa.localG(vals, kw, star = true).orderBy("gid").collect()
    val want = Seq(
      (1L, 0.09796081567373051, 0.472, 0.0),
      (25L, 0.11275489804078369, 0.171, 0.0),
      (49L, 0.11155537784886045, 0.396, 0.0))
    want.foreach { case (gid, g, p, c) =>
      val r = gg((gid - 1).toInt)
      assert(r.getLong(0) == gid)
      assert(r.getDouble(1) == g && r.getDouble(2) == p && r.getDouble(3) == c,
        s"G* at $gid")
    }
  }
}
