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
  * a killed job resumes mid-pipeline. Alongside lineage, each stage
  * records per-file WRITE METRICS (rows from the data, bytes from
  * filesystem metadata) under `_metrics/<stage>` — the row-count/byte
  * half of the north rule's checkpoint contract, the numbers an
  * operator dashboards to spot a skewed or runaway stage.
  *
  * Storage here is parquet directories (this sandbox ships no Iceberg
  * runtime jar); the layout (stage dir + `_lineage/<stage>` +
  * `_metrics/<stage>` + atomic `_SUCCESS`) maps 1:1 onto Iceberg table
  * + snapshot metadata in production — swap `.parquet` for
  * `.writeTo(...).append()`.
  */
object Checkpoint {

  def lineagePath(root: String, stage: String) = s"$root/_lineage/$stage"
  def metricsPath(root: String, stage: String) = s"$root/_metrics/$stage"
  def stagePath(root: String, stage: String) = s"$root/$stage"

  /** Per-(file, partition) row counts + xor-of-xxhash64 checksums — the
    * ONE derivation both lineage (re-fold by partition) and write
    * metrics (re-fold by file) are built from, so the checksum
    * convention cannot drift between the two artifacts. xor re-folds
    * associatively, making both roll-ups exact.
    */
  private def perFilePartStats(df: DataFrame): DataFrame = {
    val cols = df.columns.map(col)
    df.select(element_at(split(input_file_name(), "/"), -1).as("file"),
        spark_partition_id().as("partition_id"),
        xxhash64(cols: _*).as("h"))
      .groupBy("file", "partition_id")
      .agg(count(lit(1)).as("row_count"),
        // xor-fold: order/partitioning independent within the group
        expr("CAST(bit_xor(h) AS BIGINT)").as("checksum"))
  }

  /** Per-partition lineage of a DataFrame: row counts + order-independent
    * xor-of-xxhash64 checksum per write partition.
    */
  def lineageOf(df: DataFrame, stage: String): DataFrame =
    perFilePartStats(df)
      .groupBy("partition_id")
      .agg(sum("row_count").as("row_count"),
        expr("CAST(bit_xor(checksum) AS BIGINT)").as("checksum"))
      .withColumn("stage", lit(stage))

  /** Per-file write metrics of a completed stage directory:
    * (stage, file, row_count, bytes) — rows counted from the data
    * itself, bytes from filesystem metadata, joined on the part-file
    * NAME (unique within a stage directory by Spark's task-UUID naming,
    * and scheme/authority-agnostic, unlike full URIs) so the numbers
    * can never drift from what is actually on disk. One scan of the
    * stage output + one driver-side directory listing (O(#files) rows —
    * never row-scale).
    */
  def metricsOf(spark: SparkSession, root: String, stage: String): DataFrame = {
    val out = stagePath(root, stage)
    val rows = spark.read.parquet(out)
      .groupBy(element_at(split(input_file_name(), "/"), -1).as("file"))
      .agg(count(lit(1)).as("row_count"))
    metricsFromCounts(spark, out, stage, rows)
  }

  /** Join precomputed per-file row counts with on-disk byte sizes. */
  private def metricsFromCounts(spark: SparkSession, out: String,
      stage: String, rowsPerFile: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.getName, st.getLen))
    val bytes = spark.createDataFrame(files).toDF("file", "bytes")
    // outer join: a file with rows but no bytes (or vice versa) must
    // surface as a null, not vanish
    rowsPerFile.join(bytes, Seq("file"), "full_outer")
      .select(lit(stage).as("stage"), col("file"),
        coalesce(col("row_count"), lit(0L)).as("row_count"), col("bytes"))
  }

  private def complete(path: String): Boolean =
    Files.exists(Paths.get(path, "_SUCCESS"))

  /** Run (or resume) one stage: if output+lineage exist, read them back;
    * else compute, write output, then write lineage + write metrics.
    *
    * Lineage and metrics come from ONE scan of the written output (a
    * tiny per-(file, partition) intermediate feeds both aggregates —
    * xor checksums re-fold associatively), not two: a 1 TB stage is
    * read back once, not twice. Metrics are derivable from the on-disk
    * output at any time, so a resume that finds output+lineage complete
    * but metrics missing (crash between the two writes) BACKFILLS the
    * metrics instead of skipping them forever.
    */
  def stage(spark: SparkSession, root: String, name: String)
           (compute: => DataFrame): DataFrame = {
    val out = stagePath(root, name)
    val lin = lineagePath(root, name)
    val met = metricsPath(root, name)
    if (complete(out) && complete(lin)) {
      if (!complete(met)) // crash landed between lineage + metrics writes
        metricsOf(spark, root, name).write.mode("overwrite").parquet(met)
      spark.read.parquet(out)
    } else {
      val df = compute
      df.write.mode("overwrite").parquet(out)
      val written = spark.read.parquet(out)
      val perFilePart = perFilePartStats(written).cache()
      try {
        perFilePart
          .groupBy("partition_id")
          .agg(sum("row_count").as("row_count"),
            expr("CAST(bit_xor(checksum) AS BIGINT)").as("checksum"))
          .withColumn("stage", lit(name))
          .write.mode("overwrite").parquet(lin)
        metricsFromCounts(spark, out, name,
            perFilePart.groupBy("file").agg(sum("row_count").as("row_count")))
          .write.mode("overwrite").parquet(met)
      } finally perFilePart.unpersist(blocking = false)
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

  /** All write-metrics rows under a root (operator dashboard feed). */
  def metrics(spark: SparkSession, root: String): Option[DataFrame] = {
    val p = s"$root/_metrics"
    if (Files.exists(Paths.get(p)))
      Some(spark.read.option("recursiveFileLookup", "true").parquet(p))
    else None
  }
}
