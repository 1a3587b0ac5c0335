package graft.pipeline

import graft.core.Wkb
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic spatial derivations over the driver-provided TPC-H-ish
  * parquet (TESTDATA.md). The testdata carries no geometry, so points and
  * polygons are minted from integer keys with arithmetic that is
  * expressible identically in ANSI SQL — which is what lets the DuckDB
  * oracle replicate every derivation bit-for-bit (integer modulo →
  * exact-double multiply).
  *
  * customer → points   (gid, x, y)  x=((key*193)%997)*0.13, y=((key*499)%991)*0.17
  * part     → polygons (gid, geom)  45-wide unit-grid squares, cell 4.0,
  *                                  origin shifted by -5e-4 so no derived
  *                                  point sits exactly on a boundary
  */
object SynthGeo {
  val CellW = 4.0
  val GridW = 45
  val Eps = 5e-4

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** (gid, x, y) points derived from customer keys. */
  def customerPoints(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(
      col("c_custkey").cast("long").as("gid"),
      ((col("c_custkey") * 193) % 997).cast("double") * 0.13 as "x",
      ((col("c_custkey") * 499) % 991).cast("double") * 0.17 as "y")

  /** (gid, value) attribute joined to the same keys. */
  def customerValues(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(
      col("c_custkey").cast("long").as("gid"),
      col("c_acctbal").cast("double").as("value"))

  /** (gid, event, base) synthetic rate inputs (integer-valued → the rate
    * algebra stays bit-exact between Spark and DuckDB).
    */
  def customerRates(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(
      col("c_custkey").cast("long").as("gid"),
      ((col("c_custkey") * 7) % 30 + 1).cast("double").as("event"),
      ((col("c_custkey") % 100) + 50).cast("double").as("base"))

  /** Grid coordinates for part keys: cx = key % 45, cy = floor(key/45). */
  def partGrid(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part").select(
      col("p_partkey").cast("long").as("gid"),
      (col("p_partkey") % GridW).cast("long").as("cx"),
      floor(col("p_partkey") / lit(45.0)).cast("long").as("cy"))

  /** (gid, geom WKB) square polygons on the grid — real geometry for the
    * contiguity/PIP operators to chew on.
    */
  def partPolygons(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    partGrid(spark, dir).select(col("gid"), col("cx"), col("cy"))
      .as[(Long, Long, Long)]
      .map { case (gid, cx, cy) =>
        val x0 = cx * CellW - Eps
        val x1 = (cx + 1) * CellW - Eps
        val y0 = cy * CellW - Eps
        val y1 = (cy + 1) * CellW - Eps
        (gid, Wkb.writePolygon(Array((x0, y0), (x1, y0), (x1, y1), (x0, y1))))
      }.toDF("gid", "geom")
  }
}
