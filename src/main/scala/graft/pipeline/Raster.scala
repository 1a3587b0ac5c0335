package graft.pipeline

import graft.core.{GPolygon, Tiling, Wkb}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raster ↔ vector conversion over the grid tiling (north-rule surface).
  *
  * A "raster" here is the engine's native gridded form: one row per cell
  * `(cell long, value double, n long)` at a given cell size — exactly the
  * layout Iceberg min/max stats prune on. Rasterize = groupBy(cell)
  * aggregation (one shuffle, map-side partial agg); vectorize = cells
  * back to WKB square polygons (embarrassingly parallel map); polygon
  * rasterization = bbox-cell explode + exact PIP refine on cell centers.
  */
object Raster {

  /** Points (gid, x, y [, value]) → raster (cell, n, sum_val, avg_val). */
  def rasterizePoints(points: DataFrame, cellSize: Double,
                      valueCol: Option[String] = None): DataFrame = {
    val withCell = points.withColumn("cell",
      Tiling.cellIdCol(col("x"), col("y"), cellSize))
    valueCol match {
      case Some(v) =>
        withCell.groupBy("cell").agg(count(lit(1)).as("n"),
          sum(col(v)).as("sum_val"), avg(col(v)).as("avg_val"))
      case None =>
        withCell.groupBy("cell").agg(count(lit(1)).as("n"))
    }
  }

  /** Polygons (pid, geom) → covered cells (pid, cell): bbox explode +
    * refine by cell-center containment (standard center-point
    * rasterization rule).
    */
  def rasterizePolygons(polys: DataFrame, cellSize: Double): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._
    polys.select(col("pid").cast("long"), col("geom"))
      .as[(Long, Array[Byte])]
      .flatMap { case (pid, wkb) =>
        Wkb.read(wkb) match {
          case Some(p: GPolygon) =>
            val (mnx, mny, mxx, mxy) = p.bbox
            Tiling.bboxCells(mnx, mny, mxx, mxy, cellSize).iterator
              .filter { c =>
                val cx = (Tiling.cellIx(c) + 0.5) * cellSize
                val cy = (Tiling.cellIy(c) + 0.5) * cellSize
                p.contains(cx, cy)
              }.map(c => (pid, c))
          case _ => Iterator.empty
        }
      }.toDF("pid", "cell")
  }

  /** Raster cells → vector square polygons (cell, geom WKB, x0, y0). */
  def vectorize(raster: DataFrame, cellSize: Double): DataFrame = {
    val spark = raster.sparkSession
    import spark.implicits._
    raster.select(col("cell").cast("long")).distinct()
      .as[Long]
      .map { c =>
        val ix = Tiling.cellIx(c); val iy = Tiling.cellIy(c)
        val x0 = ix * cellSize; val y0 = iy * cellSize
        (c, Wkb.writePolygon(Array((x0, y0), (x0 + cellSize, y0),
          (x0 + cellSize, y0 + cellSize), (x0, y0 + cellSize))),
          x0, y0)
      }.toDF("cell", "geom", "x0", "y0")
  }

  /** Zonal statistics: raster values aggregated per polygon zone —
    * rasterized zones joined to the point raster on cell (the raster
    * analogue of the PIP join; one equi-join shuffle).
    */
  def zonalStats(pointRaster: DataFrame, polys: DataFrame,
                 cellSize: Double): DataFrame = {
    val zones = rasterizePolygons(polys, cellSize)
    zones.join(pointRaster, Seq("cell"))
      .groupBy("pid")
      .agg(sum("n").as("n_points"), count(lit(1)).as("n_cells"))
  }
}
