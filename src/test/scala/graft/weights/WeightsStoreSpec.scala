package graft.weights

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WeightsStoreSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("bucketed weights join: one Exchange, same result as plain join") {
    import spark.implicits._
    val pts = (1 to 500).map { i =>
      (i.toLong, (i * 193 % 997) * 0.13, (i * 499 % 991) * 0.17)
    }.toDF("gid", "x", "y")
    val w = KnnWeights.build(pts, KnnWeights.Conf(k = 4, cellSize = Some(8.0)))
    val vals = (1 to 500).map(i => (i.toLong, (i * 37 % 101).toDouble))
      .toDF("gid", "value")
    // force sort-merge joins: a broadcast (tiny test frames) would hide
    // the exchange structure the spec is about
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      WeightsStore.saveBucketed(w, "wstore_spec", buckets = 4)
      val bucketed = WeightsStore.load(spark, "wstore_spec")

      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

      val joinB = bucketed.join(vals, "gid")
      val joinP = w.join(vals, "gid")
      // bucketed side reads pre-partitioned: only the values side
      // shuffles (sort-merge joins here; broadcast would hide the point)
      val bx = exchanges(joinB)
      val px = exchanges(joinP)
      assert(bx < px || (bx == 1 && px >= 1),
        s"bucketed=$bx plain=$px\n${joinB.queryExecution.executedPlan}")
      assert(bx == 1,
        s"expected exactly one Exchange (values side), got $bx\n" +
          joinB.queryExecution.executedPlan.toString)
      // result identity vs the plain-parquet join
      val a = joinB.select("gid", "nbrs", "value").orderBy("gid").collect()
      val b = joinP.select("gid", "nbrs", "value").orderBy("gid").collect()
      assert(a.sameElements(b))
      // and a full statistic runs unchanged over the bucketed frame
      val moranB = graft.stats.Lisa.localMoran(
        vals, bucketed).orderBy("gid").collect()
      val moranP = graft.stats.Lisa.localMoran(
        vals, w).orderBy("gid").collect()
      assert(moranB.sameElements(moranP))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS wstore_spec")
    }
  }
}
