package graft.weights

import graft.core.{Dist, Tiling}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distance-band and kernel-distance spatial weights.
  *
  * Reference: `distance_weights(fid, geom, dist_thres [, power,
  * is_inverse, is_arc, is_mile])` and `kernel_weights(fid, geom,
  * bandwidth, kernel, ...)` (`postgeoda/src/weights_dist.c:57-335`,
  * `postgeoda/src/proxy.cpp:167-188`). Neighbors are all points within
  * the threshold (inclusive).
  *
  * Spark-first shape: grid cells of size = threshold, candidates from the
  * Chebyshev-radius-2 block (radius 2 guarantees coverage of distance
  * == threshold exactly, including boundary-sitting points), equi-join on
  * cell, filter by true distance. One shuffle keyed by cell; skewed dense
  * cells are handled by AQE (and can be salted — SURVEY §7.3).
  */
object DistanceWeights {

  case class Conf(
      threshold: Double,
      power: Double = 1.0,
      isInverse: Boolean = false,
      isArc: Boolean = false,
      isMile: Boolean = true,
      kernel: Option[String] = None,
      useKernelDiagonals: Boolean = false)

  private def planarDist(ax: Column, ay: Column, bx: Column, by: Column): Column =
    sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))

  private def arcDist(mile: Boolean)(ax: Column, ay: Column, bx: Column, by: Column): Column = {
    val r = lit(if (mile) Dist.EarthMiles else Dist.EarthKm)
    val la1 = radians(ay); val la2 = radians(by)
    val a = pow(sin((la2 - la1) / 2), 2) +
      cos(la1) * cos(la2) * pow(sin(radians(bx - ax) / 2), 2)
    lit(2.0) * r * asin(least(lit(1.0), sqrt(a)))
  }

  /** Exploded `(gid, nbr, dist)` pairs within threshold. For arc
    * distance the cell grid runs over degrees; the planar cell size is
    * derived from the arc threshold at the worst-case (equator) degree
    * length so the candidate block still covers the band.
    */
  def pairs(points: DataFrame, conf: Conf): DataFrame = {
    val cellSize =
      if (!conf.isArc) conf.threshold
      else {
        val degLen = (if (conf.isMile) Dist.EarthMiles else Dist.EarthKm) *
          math.Pi / 180.0 // one degree of latitude
        math.max(conf.threshold / degLen, 1e-9)
      }
    val pts = points.select(col("gid"), col("x"), col("y"))
      .withColumn("cell", Tiling.cellIdCol(col("x"), col("y"), cellSize))
    val deltas = (for (dx <- -2 to 2; dy <- -2 to 2)
      yield dx.toLong * Tiling.Mul + dy).toArray
    val d =
      if (conf.isArc) arcDist(conf.isMile)(col("x"), col("y"), col("bx"), col("by"))
      else planarDist(col("x"), col("y"), col("bx"), col("by"))
    pts
      .withColumn("__delta", explode(typedLit(deltas)))
      .withColumn("__ccell", col("cell") + col("__delta"))
      .join(pts.select(col("gid").as("bgid"), col("x").as("bx"),
        col("y").as("by"), col("cell").as("bcell")),
        col("__ccell") === col("bcell"))
      .filter(col("gid") =!= col("bgid"))
      .withColumn("dist", d)
      .filter(col("dist") <= conf.threshold)
      .select(col("gid"), col("bgid").as("nbr"), col("dist"))
  }

  /** Per-row weights; binary (wts null) unless inverse/power/kernel. */
  def build(points: DataFrame, conf: Conf): DataFrame = {
    val p = pairs(points, conf)
    val valued = conf.kernel.isDefined || conf.isInverse || conf.power != 1.0
    if (!valued) {
      p.groupBy("gid").agg(sort_array(collect_list(col("nbr"))).as("nbrs"))
        .select(col("gid"), col("nbrs"),
          lit(null).cast("array<double>").as("wts"))
    } else {
      val w = conf.kernel match {
        case Some(kname) =>
          val u = col("dist") / conf.threshold
          kname match {
            case "triangular"   => when(u >= 1, 0.0).otherwise(lit(1.0) - u)
            case "uniform"      => when(u >= 1, 0.0).otherwise(lit(0.5))
            case "epanechnikov" => when(u >= 1, 0.0).otherwise(lit(0.75) * (lit(1.0) - u * u))
            case "quartic"      => when(u >= 1, 0.0).otherwise(lit(15.0 / 16.0) * pow(lit(1.0) - u * u, 2))
            case "gaussian"     => exp(lit(-0.5) * u * u) / math.sqrt(2.0 * math.Pi)
            case other          => throw new IllegalArgumentException(s"kernel $other")
          }
        case None =>
          val pw = if (conf.power == 1.0) col("dist") else pow(col("dist"), conf.power)
          if (conf.isInverse) when(pw === 0.0, 0.0).otherwise(lit(1.0) / pw) else pw
      }
      p.withColumn("w", w)
        .groupBy("gid")
        .agg(sort_array(collect_list(struct(col("nbr"), col("w")))).as("__s"))
        .select(col("gid"), col("__s.nbr").as("nbrs"), col("__s.w").as("wts"))
    }
  }

  /** `min_distthreshold` aggregate (`postgeoda/src/weights_dist.c`,
    * `sql/weights_dist.sql:33-43`): the max over observations of each
    * observation's 1-NN distance — the smallest band with no isolates.
    * Two-stage agg over the kNN machinery (k=1); replaces the reference's
    * quadratic PostGIS query (`notes.md:180-200`).
    */
  def minDistThreshold(points: DataFrame, isArc: Boolean = false,
                       isMile: Boolean = true): Double = {
    val p1 = KnnWeights.pairs(points,
      KnnWeights.Conf(k = 1, isArc = isArc, isMile = isMile))
    p1.agg(max("dist")).head().getDouble(0)
  }
}
