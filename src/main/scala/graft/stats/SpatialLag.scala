package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial lag and rate smoothers — the reference implements these as
  * plain per-row arithmetic over neighbor sums, no permutations
  * (`postgeoda/src/rates.c`, `postgeoda/src/proxy.cpp:567-661`).
  * Spark-first: explode the weights rows to (gid, nbr[, w]) edges, join
  * values on nbr, aggregate back by gid. Two shuffles (join + groupBy),
  * both keyed by gid; Catalyst plans map-side partial aggregation, and at
  * scale the value table join is a plain equi-join that AQE can turn into
  * a broadcast when the value side is small.
  */
object SpatialLag {

  /** Edges (gid, nbr, w) from a weights table; w defaults to 1.0. */
  def edges(weights: DataFrame): DataFrame = {
    val hasW = weights.columns.contains("wts")
    if (hasW)
      weights.select(col("gid"),
        posexplode_outer(col("nbrs")).as(Seq("pos", "nbr")),
        col("wts"))
        .withColumn("w",
          when(col("wts").isNull, lit(1.0)).otherwise(col("wts")(col("pos"))))
        .select(col("gid"), col("nbr"), col("w"))
    else
      weights.select(col("gid"), explode_outer(col("nbrs")).as("nbr"))
        .withColumn("w", lit(1.0))
  }

  /** `spatial_lag(val, w, is_binary, row_standardize, include_diagonal)`
    * (`postgeoda/src/rates.c:183-270`, kernel `proxy.cpp:581-631`):
    *   binary+rowStd      → mean of neighbor values
    *   binary, no rowStd  → sum of neighbor values
    *   valued+rowStd      → sum(w*x)/sum(w)
    *   valued, no rowStd  → sum(w*x)
    * `include_diagonal` adds the observation itself with weight 1.
    */
  def lag(values: DataFrame, weights: DataFrame, isBinary: Boolean = true,
          rowStandardize: Boolean = true,
          includeDiagonal: Boolean = false): DataFrame = {
    val e0 = edges(weights)
    val e = if (includeDiagonal)
      e0.unionByName(weights.select(col("gid"),
        col("gid").as("nbr"), lit(1.0).as("w")))
    else e0
    val v = values.select(col("gid").as("nbr"), col("value").cast("double").as("xv"))
    val joined = e.join(v, Seq("nbr"), "left")
    val agg = joined.groupBy("gid").agg(
      sum(when(col("w").isNotNull, col("w") * col("xv"))).as("swx"),
      sum(when(col("xv").isNotNull, col("w"))).as("sw"),
      count(col("xv")).as("cnt"))
    val lagCol =
      if (isBinary && rowStandardize)
        when(col("cnt") > 0, col("swx") / col("cnt")).otherwise(lit(0.0))
      else if (isBinary) coalesce(col("swx"), lit(0.0))
      else if (rowStandardize)
        when(col("sw") > 0, col("swx") / col("sw")).otherwise(lit(0.0))
      else coalesce(col("swx"), lit(0.0))
    agg.select(col("gid"), lagCol.as("lag"))
  }
}

/** Rate smoothers (`postgeoda/src/rates.c`, `proxy.cpp:567-661`).
  * Inputs: (gid, event, base). All are compositions of global aggregates
  * and neighbor-sum joins — no custom execution at all.
  */
object Rates {
  import SpatialLag.edges

  /** excess_risk = (e_i/b_i) / (sum(e)/sum(b)) — RateSmoother_ExcessRisk. */
  def excessRisk(df: DataFrame): DataFrame = {
    val tot = df.agg(sum(col("event").cast("double")).as("se"),
      sum(col("base").cast("double")).as("sb"))
    df.crossJoin(broadcast(tot))
      .select(col("gid"),
        (col("event") / col("base") / (col("se") / col("sb"))).as("risk"))
  }

  /** Empirical Bayes rate (RateSmoother_EBS [public]):
    * theta1 = sum(e)/sum(b); theta2 = max(0,
    *   sum(b_i*(r_i-theta1)^2)/sum(b) - theta1/(sum(b)/n));
    * w = theta2/(theta2 + theta1/b_i); ebs = w*r + (1-w)*theta1.
    */
  def ebRate(df: DataFrame): DataFrame = {
    val d = df.select(col("gid"), col("event").cast("double").as("e"),
      col("base").cast("double").as("b"))
    val tot = d.agg(sum("e").as("se"), sum("b").as("sb"),
      count(lit(1)).as("n"))
    val withT1 = d.crossJoin(broadcast(tot))
      .withColumn("r", col("e") / col("b"))
      .withColumn("t1", col("se") / col("sb"))
    val t2agg = withT1.agg(
      (sum(col("b") * (col("r") - col("t1")) * (col("r") - col("t1"))) /
        first(col("sb")) -
        first(col("t1")) / (first(col("sb")) / first(col("n")))).as("t2raw"))
    withT1.crossJoin(broadcast(t2agg))
      .withColumn("t2", greatest(col("t2raw"), lit(0.0)))
      .withColumn("wgt", col("t2") / (col("t2") + col("t1") / col("b")))
      .select(col("gid"),
        (col("wgt") * col("r") + (lit(1.0) - col("wgt")) * col("t1")).as("ebrate"))
  }

  /** spatial_rate = (e_i + sum_nbr e) / (b_i + sum_nbr b) —
    * RateSmoother_SRS [public] includes the observation itself.
    */
  def spatialRate(df: DataFrame, weights: DataFrame): DataFrame = {
    val e = edges(weights)
    val v = df.select(col("gid").as("nbr"), col("event").cast("double").as("ev"),
      col("base").cast("double").as("bv"))
    val nbrSums = e.join(v, Seq("nbr")).groupBy("gid").agg(
      sum("ev").as("sne"), sum("bv").as("snb"))
    df.select(col("gid"), col("event").cast("double").as("e"),
        col("base").cast("double").as("b"))
      .join(nbrSums, Seq("gid"), "left")
      .select(col("gid"),
        ((col("e") + coalesce(col("sne"), lit(0.0))) /
          (col("b") + coalesce(col("snb"), lit(0.0)))).as("srate"))
  }

  /** Spatial empirical Bayes (RateSmoother_SEBS [public]): EB shrinkage
    * with the reference rate/variance computed over each observation's
    * neighborhood (self included).
    */
  def spatialEb(df: DataFrame, weights: DataFrame): DataFrame = {
    val e = edges(weights)
    val v = df.select(col("gid").as("nbr"),
      col("event").cast("double").as("ev"), col("base").cast("double").as("bv"))
    val selfE = df.select(col("gid"), col("gid").as("nbr"))
    val withSelf = e.select(col("gid"), col("nbr"))
      .unionByName(selfE)
    val nb = withSelf.join(v, Seq("nbr"))
    // neighborhood totals and counts
    val hood = nb.groupBy("gid").agg(sum("ev").as("se"), sum("bv").as("sb"),
      count(lit(1)).as("n"))
    val withT1 = nb.join(hood, Seq("gid"))
      .withColumn("r", col("ev") / col("bv"))
      .withColumn("t1", col("se") / col("sb"))
    val t2 = withT1.groupBy("gid").agg(
      (sum(col("bv") * (col("r") - col("t1")) * (col("r") - col("t1"))) /
        first("sb") - first("t1") / (first("sb") / first("n"))).as("t2raw"),
      first("t1").as("t1"))
    df.select(col("gid"), col("event").cast("double").as("e"),
        col("base").cast("double").as("b"))
      .join(t2, Seq("gid"), "left")
      .withColumn("t2v", greatest(col("t2raw"), lit(0.0)))
      .withColumn("wgt", col("t2v") / (col("t2v") + col("t1") / col("b")))
      .select(col("gid"),
        (col("wgt") * (col("e") / col("b")) +
          (lit(1.0) - col("wgt")) * col("t1")).as("sebrate"))
  }
}
