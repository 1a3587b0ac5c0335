package graft.stats

import graft.core.Stat0
import graft.weights.KnnWeights
import org.apache.spark.sql.DataFrame
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
  * Spark shape: the spatial kNN reuses the cell-ring engine; the
  * attribute kNN is a cross-join + per-gid window top-k (exact; fine to
  * ~10^5 rows per run). At web scale the attribute side becomes the
  * LSH-bucketed kNN of graft.pipeline.Similarity — same output contract,
  * documented approximation.
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

  /** points: (gid, x, y); values: (gid, vals array<double>).
    * Returns (gid, card, p). scaleMethod per lisa.h:139-159; distType
    * euclidean|manhattan per lisa.h:161-173.
    */
  def run(points: DataFrame, values: DataFrame, k: Int,
          scaleMethod: String = "standardize",
          distType: String = "euclidean",
          cellSize: Option[Double] = None): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    // spatial kNN via the cell-ring engine
    val spatial = KnnWeights.pairs(points, KnnWeights.Conf(k = k,
        cellSize = cellSize))
      .select(col("gid"), col("nbr"))

    // scale attribute columns globally (driver moments — exact sums),
    // then attribute kNN by cross join + window top-k
    val rows = values.select(col("gid").cast("long"), col("vals"))
      .orderBy("gid").collect()
    val n = rows.length
    val gids = rows.map(_.getLong(0))
    val nv = rows.head.getSeq[Double](1).length
    val mat = Array.ofDim[Double](nv, n)
    var i = 0
    while (i < n) {
      val s = rows(i).getSeq[Double](1)
      var v = 0
      while (v < nv) { mat(v)(i) = s(v); v += 1 }
      i += 1
    }
    val scaled = mat.map(v => Stat0.scale(v, scaleMethod))
    val attrRows = (0 until n).map(j =>
      (gids(j), (0 until nv).map(v => scaled(v)(j)).toArray))
    val attrDf = spark.createDataset(attrRows).toDF("gid", "sv")

    val manhattan = distType == "manhattan"
    val distExpr =
      if (manhattan)
        aggregate(zip_with(col("a.sv"), col("b.sv"), (x, y) => abs(x - y)),
          lit(0.0), (acc, v) => acc + v)
      else
        sqrt(aggregate(zip_with(col("a.sv"), col("b.sv"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))

    val attrPairs = attrDf.as("a").crossJoin(attrDf.as("b"))
      .filter(col("a.gid") =!= col("b.gid"))
      .select(col("a.gid").as("gid"), col("b.gid").as("anbr"),
        distExpr.as("adist"))
    val attrKnn = attrPairs
      .withColumn("rk", row_number().over(Window.partitionBy("gid")
        .orderBy(col("adist"), col("anbr"))))
      .filter(col("rk") <= k)
      .select(col("gid"), col("anbr"))

    // overlap cardinality by inner join of the two neighbor sets
    val card = spatial.join(attrKnn,
        spatial("gid") === attrKnn("gid") && spatial("nbr") === attrKnn("anbr"))
      .groupBy(spatial("gid").as("gid")).agg(count(lit(1)).as("card"))
    val bigN = n - 1
    val hyperUdf = udf((v: Long) =>
      hypergeomUpperTail(v.toInt, k, k, bigN))
    points.select(col("gid").cast("long"))
      .join(card, Seq("gid"), "left")
      .select(col("gid"),
        coalesce(col("card"), lit(0L)).cast("double").as("card"))
      .withColumn("p", hyperUdf(col("card").cast("long")))
      .select(col("gid"), col("card"), col("p"))
  }
}
