package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files — the
  * plan-evidence artifacts for optimization rounds (plans/rNN dir).
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> <suffix> [q13,q27,...]"
  * (no list = every query). Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS
  * like Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only = args.lift(2)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = only match {
      case Some(ps) => SparkEntry.queries.filter { case (n, _) =>
        ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
        try w.write(plan) finally w.close()
        println(s"[plandump] $name OK")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
