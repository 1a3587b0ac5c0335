package graft.stats

import graft.core.Stat0
import graft.weights.KnnWeights
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Local neighbor match test (`postgeoda/src/neighbor_match.c:46-230`,
  * `proxy.cpp:502-565` → gda_neighbor_match_test [public]).
  *
  * Builds TWO k-nearest-neighbor structures — spatial (geometry) and
  * attribute-space (scaled variables, euclidean or manhattan) — and
  * reports per observation the overlap cardinality v and the
  * hypergeometric tail probability P(X >= v), X ~ Hypergeom(N-1, k, k).
  *
  * Spark shape: BOTH kNN sides run the cell-ring engine — the attribute
  * side reuses it directly for euclidean distance in ≤2 dimensions
  * (attribute values become coordinates), so there is no cross join and
  * no O(N²) stage anywhere on the common path; scaling moments come from
  * one aggregation, not a driver collect. Higher-dimensional or manhattan
  * attribute spaces fall back to a window top-k over a documented
  * cross join (rare; the reference itself is driver-bound there).
  * The hypergeometric p depends only on the overlap cardinality
  * v ∈ [0, k], so it's a k+1-element literal lookup — no UDF.
  */
object NeighborMatch {

  /** Upper-tail hypergeometric P(X >= v) with population N, K successes,
    * n draws. Exact summation in log space via lgamma.
    */
  def hypergeomUpperTail(v: Int, n: Int, k: Int, bigN: Int): Double = {
    if (v <= 0) return 1.0
    def lchoose(a: Int, b: Int): Double =
      if (b < 0 || b > a) Double.NegativeInfinity
      else lgammaD(a + 1.0) - lgammaD(b + 1.0) - lgammaD(a - b + 1.0)
    val denom = lchoose(bigN, n)
    var p = 0.0
    var x = v
    val hi = math.min(k, n)
    while (x <= hi) {
      val l = lchoose(k, x) + lchoose(bigN - k, n - x) - denom
      p += math.exp(l)
      x += 1
    }
    math.min(1.0, p)
  }

  private def lgammaD(x: Double): Double = {
    // Lanczos approximation (g=7, n=9) — standard public coefficients
    val c = Array(0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - lgammaD(1.0 - x)
    else {
      val x2 = x - 1.0
      var a = c(0)
      val t = x2 + 7.5
      var i = 1
      while (i < 9) { a += c(i) / (x2 + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (x2 + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Scale the `vals` array column per variable, distributively: moments
    * from ONE global aggregation, application as a codegen'd projection.
    * Methods per lisa.h:139-159; 'mad' needs exact medians and keeps a
    * driver-side path (rarely used).
    */
  private[stats] def scaleVals(values: DataFrame, nv: Int,
                               method: String): DataFrame = {
    val v = col("vals")
    method match {
      case "raw" =>
        values.select(col("gid").cast("long").as("gid"), v.as("sv"))
      case "standardize" | "demean" =>
        val aggs = (0 until nv).flatMap(i => Seq(
          avg(v(i)).as(s"m$i"), stddev_samp(v(i)).as(s"s$i")))
        val m = values.agg(aggs.head, aggs.tail: _*).head()
        val cols = (0 until nv).map { i =>
          val mu = m.getDouble(2 * i)
          val sd = if (method == "demean") 0.0 else m.getDouble(2 * i + 1)
          // GeoDa semantics (Stat0.standardize): sd == 0 → deviations
          if (sd != 0.0 && !sd.isNaN) (v(i) - mu) / sd else v(i) - mu
        }
        values.select(col("gid").cast("long").as("gid"),
          array(cols: _*).as("sv"))
      case "range_standardize" | "range_adjust" =>
        val aggs = (0 until nv).flatMap(i => Seq(
          min(v(i)).as(s"mn$i"), max(v(i)).as(s"mx$i")))
        val m = values.agg(aggs.head, aggs.tail: _*).head()
        val cols = (0 until nv).map { i =>
          val mn = m.getDouble(2 * i); val mx = m.getDouble(2 * i + 1)
          val r = mx - mn
          if (method == "range_standardize")
            (if (r == 0.0) v(i) - mn else (v(i) - mn) / r)
          else (if (r == 0.0) v(i) else v(i) / r)
        }
        values.select(col("gid").cast("long").as("gid"),
          array(cols: _*).as("sv"))
      case "mad" =>
        // exact per-variable median-absolute-deviation needs two median
        // passes; small-N driver path retained for parity
        val spark = values.sparkSession
        import spark.implicits._
        val rows = values.select(col("gid").cast("long"), col("vals"))
          .as[(Long, Seq[Double])].collect()
        val n = rows.length
        val mat = Array.ofDim[Double](nv, n)
        for (i <- rows.indices; vi <- 0 until nv) mat(vi)(i) = rows(i)._2(vi)
        val scaled = mat.map(Stat0.madScale)
        spark.createDataset(rows.indices.map(i =>
          (rows(i)._1, (0 until nv).map(vi => scaled(vi)(i)))))
          .toDF("gid", "sv")
      case other => throw new IllegalArgumentException(
        s"unknown scale method '$other' (lisa.h:139-159)")
    }
  }

  /** Exact attribute-space kNN pairs (gid, anbr). ≤2-dim euclidean runs
    * the cell-ring engine (no cross join); otherwise window top-k over a
    * cross join (documented fallback).
    */
  private[stats] def attrKnn(scaled: DataFrame, nv: Int, k: Int,
                             distType: String): DataFrame = {
    if (distType == "euclidean" && nv <= 2) {
      val pts = scaled.select(col("gid"), col("sv")(0).as("x"),
        (if (nv == 2) col("sv")(1) else lit(0.0)).as("y"))
      KnnWeights.pairs(pts, KnnWeights.Conf(k = k))
        .select(col("gid"), col("nbr").as("anbr"))
    } else {
      val manhattan = distType == "manhattan"
      val distExpr: Column =
        if (manhattan)
          aggregate(zip_with(col("a.sv"), col("b.sv"), (x, y) => abs(x - y)),
            lit(0.0), (acc, v) => acc + v)
        else
          sqrt(aggregate(zip_with(col("a.sv"), col("b.sv"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))
      scaled.as("a").crossJoin(scaled.as("b"))
        .filter(col("a.gid") =!= col("b.gid"))
        .select(col("a.gid").as("gid"), col("b.gid").as("anbr"),
          distExpr.as("adist"))
        .withColumn("rk", row_number().over(Window.partitionBy("gid")
          .orderBy(col("adist"), col("anbr"))))
        .filter(col("rk") <= k)
        .select(col("gid"), col("anbr"))
    }
  }

  /** points: (gid, x, y); values: (gid, vals array<double>).
    * Returns (gid, card, p). scaleMethod per lisa.h:139-159; distType
    * euclidean|manhattan per lisa.h:161-173.
    */
  def run(points: DataFrame, values: DataFrame, k: Int,
          scaleMethod: String = "standardize",
          distType: String = "euclidean",
          cellSize: Option[Double] = None): DataFrame = {
    // spatial kNN via the cell-ring engine
    val spatial = KnnWeights.pairs(points, KnnWeights.Conf(k = k,
        cellSize = cellSize))
      .select(col("gid"), col("nbr"))

    val nv = values.select(size(col("vals"))).head().getInt(0)
    val n = values.count()
    val scaled = scaleVals(values, nv, scaleMethod)
    val aknn = attrKnn(scaled, nv, k, distType)

    // overlap cardinality by inner join of the two neighbor sets
    val card = spatial.join(aknn,
        spatial("gid") === aknn("gid") && spatial("nbr") === aknn("anbr"))
      .groupBy(spatial("gid").as("gid")).agg(count(lit(1)).as("card"))
    // p depends only on card ∈ [0, k] → literal lookup, no UDF
    val bigN = (n - 1).toInt
    val pTable = (0 to k).map(v => hypergeomUpperTail(v, k, k, bigN))
    points.select(col("gid").cast("long"))
      .join(card, Seq("gid"), "left")
      .select(col("gid"),
        coalesce(col("card"), lit(0L)).cast("double").as("card"))
      .withColumn("p",
        element_at(typedlit(pTable), col("card").cast("int") + 1))
  }
}
