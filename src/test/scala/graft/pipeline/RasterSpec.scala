package graft.pipeline

import graft.SparkFixture
import graft.core.{Tiling, Wkb}
import org.scalatest.funsuite.AnyFunSuite

class RasterSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("rasterize points: counts per cell") {
    import spark.implicits._
    val pts = Seq((1L, 0.5, 0.5), (2L, 0.7, 0.2), (3L, 1.5, 0.5),
      (4L, 0.1, 1.9)).toDF("gid", "x", "y")
    val r = Raster.rasterizePoints(pts, 1.0).as[(Long, Long)].collect().toMap
    assert(r(Tiling.cellId(0.5, 0.5, 1.0)) == 2L)
    assert(r(Tiling.cellId(1.5, 0.5, 1.0)) == 1L)
    assert(r.size == 3)
  }

  test("vectorize roundtrip: cell polygons contain their cell centers") {
    import spark.implicits._
    val pts = Seq((1L, 0.5, 0.5), (2L, 5.5, 3.2)).toDF("gid", "x", "y")
    val raster = Raster.rasterizePoints(pts, 2.0)
    val vec = Raster.vectorize(raster, 2.0)
      .as[(Long, Array[Byte], Double, Double)].collect()
    assert(vec.length == 2)
    vec.foreach { case (cell, wkb, x0, y0) =>
      val p = Wkb.read(wkb).get.asInstanceOf[graft.core.GPolygon]
      assert(p.contains(x0 + 1.0, y0 + 1.0))
      assert(Tiling.cellId(x0 + 1.0, y0 + 1.0, 2.0) == cell)
    }
  }

  test("polygon rasterization: center-containment rule") {
    import spark.implicits._
    // a 2x1-cell rectangle covering cell centers (0.5,0.5) and (1.5,0.5)
    val polys = Seq((7L, Wkb.writePolygon(Array((0.0, 0.0), (2.0, 0.0),
      (2.0, 1.0), (0.0, 1.0))))).toDF("pid", "geom")
    val cells = Raster.rasterizePolygons(polys, 1.0)
      .as[(Long, Long)].collect().toSet
    assert(cells == Set((7L, Tiling.cellId(0.5, 0.5, 1.0)),
      (7L, Tiling.cellId(1.5, 0.5, 1.0))))
  }

  test("zonal stats: point counts per polygon zone") {
    import spark.implicits._
    val pts = Seq((1L, 0.4, 0.4), (2L, 0.6, 0.6), (3L, 1.4, 0.4),
      (4L, 9.0, 9.0)).toDF("gid", "x", "y")
    val polys = Seq((7L, Wkb.writePolygon(Array((0.0, 0.0), (2.0, 0.0),
      (2.0, 1.0), (0.0, 1.0))))).toDF("pid", "geom")
    val raster = Raster.rasterizePoints(pts, 1.0)
    val z = Raster.zonalStats(raster, polys, 1.0)
      .as[(Long, Long, Long)].collect()
    assert(z.length == 1)
    assert(z.head == ((7L, 3L, 2L))) // 3 points across 2 covered cells
  }
}
