package graft.weights

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class WeightsSummarySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("summary: degrees, median, islands on a hand graph") {
    import spark.implicits._
    // 1-2, 1-3 connected; 4 and 5 are islands
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("gid", "nbr")
    val nodes = (1L to 5L).toDF("gid")
    val r = WeightsSummary.summary(pairs, nodes).head()
    assert(r.getLong(0) === 5L)        // n_obs
    assert(r.getLong(1) === 4L)        // n_nonzero
    assert(r.getLong(2) === 0L)        // min_nbrs
    assert(r.getLong(3) === 2L)        // max_nbrs
    assert(r.getDouble(4) === 0.8)     // mean_nbrs
    assert(r.getDouble(5) === 1.0)     // median_nbrs
    assert(r.getDouble(6) === 16.0)    // pct_nonzero = 4/25*100
    assert(r.getLong(7) === 2L)        // n_islands
  }

  test("components: weights-graph connectivity with isolates") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("gid", "nbr")
    val nodes = (1L to 5L).toDF("gid")
    val got = WeightsSummary.components(pairs, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }
}
