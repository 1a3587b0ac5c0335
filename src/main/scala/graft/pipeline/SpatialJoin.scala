package graft.pipeline

import graft.core.{GPolygon, Tiling, Wkb}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-polygon spatial join (SURVEY §7, BASELINE.json north rule).
  *
  * Two physical strategies, chosen by polygon-side size:
  *   - broadcast: polygons are collected into a cell→polygon hash index
  *     and broadcast; points stream through `mapPartitions` — zero
  *     shuffle. The right plan for admin-boundary-sized layers.
  *   - partitioned: polygons explode to their bbox-overlapping cells,
  *     points carry their single cell, equi-join on cell, then exact
  *     ray-crossing refine. Shuffle is keyed by cell; dense cells are
  *     split by AQE (salting hook: append `gid % nSalt` to the key).
  * Matching the reference's semantics means edge-exact behavior is
  * undefined on boundaries (same as PostGIS GIST + ST_Contains refine
  * usage in `postgeoda/notes.md:174-200` — the candidate/refine split).
  */
object SpatialJoin {

  /** points(gid,x,y) × polys(pid, geom WKB) → (gid, pid).
    *
    * The broadcast/partitioned choice is BYTE-based: one cheap agg sums
    * the polygon WKB sizes, and broadcast is taken only while the layer
    * (plus the decoded-index overhead factor) fits a driver/executor-safe
    * budget — a 2M-multiring layer is GBs and must NOT collect, while 2M
    * tiny boxes may be fine. Default budget 256 MB ≈ Spark's own
    * autoBroadcastJoinThreshold philosophy scaled to a hash index.
    */
  def pip(points: DataFrame, polys: DataFrame, cellSize: Double,
          broadcastLimitBytes: Long = 256L * 1024 * 1024): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val sz = polys.agg(
      coalesce(sum(octet_length(col("geom"))), lit(0L)).cast("long"),
      count(lit(1))).head()
    val wkbBytes = sz.getLong(0)
    // decoded index ≈ WKB coords as doubles + per-cell fanout overhead 3x
    if (wkbBytes * 3 <= broadcastLimitBytes) {
      // broadcast cell index of decoded polygons
      val collected = polys.select(col("pid").cast("long"), col("geom"))
        .as[(Long, Array[Byte])].collect()
      val index = new scala.collection.mutable.HashMap[Long,
        scala.collection.mutable.ArrayBuffer[(Long, GPolygon)]]()
      collected.foreach { case (pid, wkb) =>
        Wkb.read(wkb) match {
          case Some(p: GPolygon) =>
            val (mnx, mny, mxx, mxy) = p.bbox
            Tiling.bboxCells(mnx, mny, mxx, mxy, cellSize).foreach { c =>
              index.getOrElseUpdate(c,
                scala.collection.mutable.ArrayBuffer.empty) += ((pid, p))
            }
          case _ =>
        }
      }
      val bIndex = spark.sparkContext.broadcast(
        index.map { case (k, v) => (k, v.toArray) }.toMap)
      points.select(col("gid").cast("long"), col("x"), col("y"))
        .as[(Long, Double, Double)]
        .flatMap { case (gid, x, y) =>
          val cell = Tiling.cellId(x, y, cellSize)
          bIndex.value.get(cell) match {
            case Some(cands) =>
              cands.iterator.filter(_._2.contains(x, y)).map(c => (gid, c._1))
            case None => Iterator.empty
          }
        }.toDF("gid", "pid")
    } else {
      // partitioned: explode polygons to cells, equi-join, exact refine
      val polyCells = polys.select(col("pid").cast("long"), col("geom"))
        .as[(Long, Array[Byte])]
        .flatMap { case (pid, wkb) =>
          Wkb.read(wkb) match {
            case Some(p: GPolygon) =>
              val (mnx, mny, mxx, mxy) = p.bbox
              Tiling.bboxCells(mnx, mny, mxx, mxy, cellSize)
                .map(c => (pid, c, wkb))
            case _ => Nil
          }
        }.toDF("pid", "pcell", "pgeom")
      val pts = points
        .withColumn("cell", Tiling.cellIdCol(col("x"), col("y"), cellSize))
      pts.join(polyCells, col("cell") === col("pcell"))
        .select(col("gid").cast("long"), col("x"), col("y"),
          col("pid"), col("pgeom"))
        .as[(Long, Double, Double, Long, Array[Byte])]
        .mapPartitions { it =>
          // memoize decodes per partition — polygons repeat across points
          val cache = new java.util.HashMap[Long, GPolygon]()
          it.flatMap { case (gid, x, y, pid, wkb) =>
            var poly = cache.get(pid)
            if (poly == null) {
              Wkb.read(wkb) match {
                case Some(p: GPolygon) => cache.put(pid, p); poly = p
                case _ =>
              }
            }
            if (poly != null && poly.contains(x, y)) Iterator.single((gid, pid))
            else Iterator.empty
          }
        }.toDF("gid", "pid")
    }
  }
}
