package graft
import graft.weights.KnnWeights
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
object KnnProfile {
  def gcStats(): (Long, Long) = {
    val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
  }
  def main(args: Array[String]): Unit = {
    val n = 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val geo = spark.range(n).select(xxhash64(col("id")).as("gid"),
      (pmod(xxhash64(col("id"), lit(1)), lit(18000L))).cast("double") / 100.0 as "x",
      (pmod(xxhash64(col("id"), lit(2)), lit(18000L))).cast("double") / 100.0 as "y").cache()
    geo.count()
    def time[A](tag: String)(f: => A): A = {
      val (c0, t0) = gcStats(); val w0 = System.nanoTime()
      val r = f
      val (c1, t1) = gcStats()
      println(f"$tag: ${(System.nanoTime()-w0)/1e9}%.2f s wall, gc=${(t1-t0)/1000.0}%.1f s (${c1-c0} collections)")
      r
    }
    val cell = 180.0 / math.sqrt(n.toDouble / 10)
    val w = time("knn build+count") {
      val wdf = KnnWeights.build(geo, KnnWeights.Conf(k = 10, cellSize = Some(cell)))
      wdf.count(); wdf
    }
    time("knn recount (no cache)") { w.count() }
    spark.stop()
  }
}
