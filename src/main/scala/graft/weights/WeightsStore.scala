package graft.weights

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistence for weights frames — the co-location story for
  * REPEATED analysis over one weights build (the reference's
  * save-weights-once / run-many-statistics workflow,
  * `postgeoda/sql/weights.sql:56-69`).
  *
  * A weights build is read by every subsequent LISA/lag/rate call, and
  * each call joins it to a values frame on `gid` — an exchange of BOTH
  * sides per statistic when the weights live in plain parquet. Writing
  * them `bucketBy(gid)` once means every later equi-join on `gid` reads
  * the weights side pre-partitioned: Catalyst drops the weights-side
  * Exchange and only the (much thinner) values side shuffles — at
  * 10^12 rows that halves the shuffle volume of every statistic run
  * after the first (WeightsStoreSpec asserts the single-Exchange plan).
  *
  * Pick `buckets` ≈ the cluster's target partition count for the
  * weights row volume (rows × ~16B × nbrs/row ÷ 128MB); the values side
  * is shuffled to the bucket count automatically.
  */
object WeightsStore {

  /** Persist a weights frame (gid, nbrs[, wts]) bucketed + sorted by
    * gid as a catalog table. Overwrites `table`.
    */
  def saveBucketed(w: DataFrame, table: String, buckets: Int = 64): Unit =
    w.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "gid").sortBy("gid")
      .saveAsTable(table)

  /** Load a bucketed weights table; joins on `gid` against this frame
    * skip the weights-side shuffle.
    */
  def load(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
