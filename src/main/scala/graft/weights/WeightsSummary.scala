package graft.weights

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GeoDa Weights-Manager-style connectivity summary of a spatial
  * weights graph — the panel a reference user reads before trusting a
  * LISA run (GeoDa "weights summary": #observations, min/max/mean/
  * median neighbors, % non-zero, islands). postgeoda exposes the graph
  * itself (`geoda_weights_*`, `postgeoda/sql/weights.sql`); the summary
  * here is its standard companion view.
  *
  * One partial-aggregated pass over the pair list: degrees are a
  * node-keyed count, islands come from the node-universe left join
  * (degree 0), the median is Spark's exact `median` aggregate. No
  * collect, no window — a 10^12-edge graph reduces map-side to one row
  * per node and then to one summary row.
  */
object WeightsSummary {

  /** One-row summary over directed pairs `(gidCol, nbrCol)` (both
    * directions present, as [[ContiguityWeights.adjacency]] emits) and
    * the node universe `nodes(nodeGid)` — nodes absent from every pair
    * are islands.
    */
  def summary(pairs: DataFrame, nodes: DataFrame,
              gidCol: String = "gid", nbrCol: String = "nbr",
              nodeGid: String = "gid"): DataFrame = {
    val deg = nodes.select(col(nodeGid).cast("long").as("gid")).distinct()
      .join(pairs.groupBy(col(gidCol).cast("long").as("gid"))
          .agg(count(lit(1)).as("d")),
        Seq("gid"), "left")
      .select(coalesce(col("d"), lit(0L)).as("deg"))
    deg.agg(
        count(lit(1)).as("n_obs"),
        sum(col("deg")).as("n_nonzero"),
        min(col("deg")).as("min_nbrs"),
        max(col("deg")).as("max_nbrs"),
        avg(col("deg")).as("mean_raw"),
        expr("median(deg)").cast("double").as("median_nbrs"),
        sum((col("deg") === 0L).cast("long")).as("n_islands"))
      .select(col("n_obs"), col("n_nonzero"), col("min_nbrs"),
        col("max_nbrs"), round(col("mean_raw"), 6).as("mean_nbrs"),
        col("median_nbrs"),
        round(col("n_nonzero") * lit(100.0) /
          (col("n_obs") * col("n_obs")), 6).as("pct_nonzero"),
        col("n_islands"))
  }

  /** Connectivity components of the weights graph (GeoDa's
    * connected-component check generalizing island detection): `(gid,
    * component)` with component = min member gid. Distributed
    * large-star/small-star, see [[graft.cluster.Components]].
    */
  def components(pairs: DataFrame, nodes: DataFrame,
                 gidCol: String = "gid", nbrCol: String = "nbr",
                 nodeGid: String = "gid"): DataFrame =
    graft.cluster.Components.connected(pairs, gidCol, nbrCol,
      nodes = Some(nodes.select(col(nodeGid).as("gid"))), nodeCol = "gid")
}
