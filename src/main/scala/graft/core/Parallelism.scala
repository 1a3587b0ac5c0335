package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive widening for compute-dense per-row stages.
  *
  * A per-row operator (regex scrubbing, trigram statistics, image
  * decode) inherits the parallelism of its upstream scan. At warehouse
  * scale that is one task per ~128 MB split — plenty. But a SMALL file
  * (or a single-row-group parquet, which cannot split at all) plans as
  * ONE task, so a compute-bound stage serializes on one core while the
  * rest idle — the r8 probes measured 1-3 s single-task stages behind
  * kilobyte scans.
  *
  * [[widen]] repartitions ONLY when the planned parallelism is below
  * the session's shuffle width, so at real scale it is a no-op and the
  * corpus is never shuffled for it (guide §2: derive partitioning from
  * the input, don't constant-tune; §2.3: shuffle fewer bytes). Call it
  * on SCAN-ROOTED frames only — probing the partition count of a frame
  * with exchanges underneath would trigger AQE stage execution.
  */
object Parallelism {

  def widen(df: DataFrame, key: Column): DataFrame = {
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    val planned = df.queryExecution.toRdd.getNumPartitions
    if (planned >= width) df else df.repartition(4 * width, key)
  }
}
