package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-corpus curation operators: deterministic sampling for
  * dataset mixing. A 100 TB corpus is never trained on whole — pipelines
  * draw per-stratum quotas (per language × source, per domain, per
  * quality bucket), and the draw must be reproducible run-to-run so
  * ablations compare the same documents.
  */
object Curation {

  /** Deterministic per-row sampling key: Lehmer-style multiplicative
    * hash `(id * 48271) mod (2^31 - 1)` — uniform-ish, engine-agnostic
    * (replays in ANSI SQL integer arithmetic, unlike a 64-bit mixer
    * whose multiply overflows non-wrapping SQL engines). Collisions are
    * possible above 2^31 ids; the sampler breaks ties by id, so the
    * result stays deterministic regardless.
    */
  def sampleKey(id: Column): Column =
    pmod(id.cast("long") * lit(48271L), lit(2147483647L))

  /** Deterministic stratified sample: the `quota` rows with the
    * smallest [[sampleKey]] per stratum (ties by id). Returns
    * (strataCols..., sample_id, rk) with rk 1-based per stratum.
    *
    * Scale shape: ONE hash-aggregate keyed by the strata — per-stratum
    * selection runs through the partial top-k `Aggregator`
    * ([[graft.catalyst.TopKAgg]]), so map-side partials keep ~quota rows
    * per (partition, stratum) and the shuffle never carries the corpus,
    * unlike a `row_number().over(partitionBy(strata))` window, which
    * sorts every row. Equivalent output to the window formulation
    * (ORDER BY key, id) row-for-row.
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], quota: Int,
                       idCol: String): DataFrame = {
    require(strataCols.nonEmpty, "stratifiedSample needs >= 1 stratum col")
    val scored = df.select(
      strataCols.map(col) ++ Seq(
        sampleKey(col(idCol)).cast("double").as("__h"),
        col(idCol).cast("long").as("__id")): _*)
    scored.groupBy(strataCols.map(col): _*)
      .agg(graft.catalyst.TopKAgg.topk(quota)(
        negate(col("__h")), col("__id")).as("top"))
      .select(strataCols.map(col) :+ posexplode(col("top")): _*)
      .select(strataCols.map(col) ++ Seq(
        col("col._2").as("sample_id"),
        (col("pos") + 1).cast("long").as("rk")): _*)
  }
}
