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
  *     split by AQE, and for pathological hotspots (one metro cell
  *     holding a large share of all points) `nSalt > 1` salts the
  *     shuffle key explicitly: the polygon side replicates each
  *     cell row nSalt times, the point side hashes gid into a salt,
  *     and the join key becomes (cell, salt) — each point still meets
  *     each candidate polygon exactly once, but a hot cell now spreads
  *     over nSalt shuffle partitions instead of one straggler.
  * Matching the reference's semantics means edge-exact behavior is
  * undefined on boundaries (same as PostGIS GIST + ST_Contains refine
  * usage in `postgeoda/notes.md:174-200` — the candidate/refine split).
  */
object SpatialJoin {

  /** Default polygon-layer byte budget for the broadcast path — one
    * source of truth for every caller (batch + streaming wrappers). */
  val DefaultBroadcastLimit: Long = 256L * 1024 * 1024

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
          broadcastLimitBytes: Long = DefaultBroadcastLimit,
          nSalt: Int = 1): DataFrame = {
    require(nSalt >= 1, s"nSalt must be >= 1, got $nSalt")
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
      val polyCells0 = polys.select(col("pid").cast("long"), col("geom"))
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
      // Explicit skew salt: replicate the (smaller) polygon-cell side
      // nSalt times; each point deterministically picks ONE salt from
      // its gid, so every (point, candidate-polygon) pair still meets
      // exactly once while a hot cell's points fan out over nSalt
      // shuffle partitions. nSalt == 1 keeps the original plan shape.
      val polyCells =
        if (nSalt == 1) polyCells0
        else polyCells0.withColumn("psalt",
          explode(sequence(lit(0), lit(nSalt - 1))))
      val pts0 = points
        .withColumn("cell", Tiling.cellIdCol(col("x"), col("y"), cellSize))
      val pts =
        if (nSalt == 1) pts0
        else pts0.withColumn("salt", pmod(hash(col("gid")), lit(nSalt)))
      val joinCond =
        if (nSalt == 1) col("cell") === col("pcell")
        else col("cell") === col("pcell") && col("salt") === col("psalt")
      pts.join(polyCells, joinCond)
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
