package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Stage checkpointing with per-partition lineage — the engine's analogue
  * of the reference's "persist weights to a bytea column once, reuse for
  * every statistic" pattern (`postgeoda/notes.md:104-141`), extended to
  * the north rule's resumability requirement: every stage writes its
  * output plus a lineage table (stage, partition_id, row_count, checksum,
  * bytes); a re-run skips stages whose output + lineage are complete, so
  * a killed job resumes mid-pipeline.
  *
  * Storage here is parquet directories (this sandbox ships no Iceberg
  * runtime jar); the layout (stage dir + `_lineage/<stage>` + atomic
  * `_SUCCESS`) maps 1:1 onto Iceberg table + snapshot metadata in
  * production — swap `.parquet` for `.writeTo(...).append()`.
  */
object Checkpoint {

  def lineagePath(root: String, stage: String) = s"$root/_lineage/$stage"
  def stagePath(root: String, stage: String) = s"$root/$stage"

  /** Per-partition lineage of a DataFrame: row counts + order-independent
    * xor-of-xxhash64 checksum per write partition.
    */
  def lineageOf(df: DataFrame, stage: String): DataFrame = {
    val cols = df.columns.map(col)
    df.select(spark_partition_id().as("partition_id"),
        xxhash64(cols: _*).as("h"))
      .groupBy("partition_id")
      .agg(count(lit(1)).as("row_count"),
        // xor-fold: order/partitioning independent within the partition
        expr("CAST(bit_xor(h) AS BIGINT)").as("checksum"))
      .withColumn("stage", lit(stage))
  }

  private def complete(path: String): Boolean =
    Files.exists(Paths.get(path, "_SUCCESS"))

  /** Run (or resume) one stage: if output+lineage exist, read them back;
    * else compute, write output, then write lineage.
    */
  def stage(spark: SparkSession, root: String, name: String)
           (compute: => DataFrame): DataFrame = {
    val out = stagePath(root, name)
    val lin = lineagePath(root, name)
    if (complete(out) && complete(lin)) {
      spark.read.parquet(out)
    } else {
      val df = compute
      df.write.mode("overwrite").parquet(out)
      val written = spark.read.parquet(out)
      lineageOf(written, name).write.mode("overwrite").parquet(lin)
      written
    }
  }

  /** True if the stage already has complete output + lineage. */
  def isDone(root: String, name: String): Boolean =
    complete(stagePath(root, name)) && complete(lineagePath(root, name))

  /** All lineage rows under a root (for metrics reporting). */
  def lineage(spark: SparkSession, root: String): Option[DataFrame] = {
    val p = s"$root/_lineage"
    if (Files.exists(Paths.get(p)))
      Some(spark.read.option("recursiveFileLookup", "true").parquet(p))
    else None
  }
}
