package graft.stats

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class NeighborMatchSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("hypergeometric tail: exact small cases") {
    // N=4, K=2 draws... P(X>=1) with n=2,k=2,N=4: 1 - C(2,0)C(2,2)/C(4,2)
    // = 1 - 1/6
    val p = NeighborMatch.hypergeomUpperTail(1, 2, 2, 4)
    assert(math.abs(p - (1.0 - 1.0 / 6.0)) < 1e-12)
    // P(X>=2) = C(2,2)C(2,0)/C(4,2) = 1/6
    val p2 = NeighborMatch.hypergeomUpperTail(2, 2, 2, 4)
    assert(math.abs(p2 - 1.0 / 6.0) < 1e-12)
    assert(NeighborMatch.hypergeomUpperTail(0, 2, 2, 4) == 1.0)
  }

  test("neighbor match: identical attribute = coordinates → full overlap") {
    import spark.implicits._
    val pts = (1 to 30).map { i =>
      (i.toLong, (i * 193 % 97) * 0.5, (i * 499 % 89) * 0.5)
    }.toDF("gid", "x", "y")
    // attributes ARE the coordinates → attribute kNN == spatial kNN
    val vals = (1 to 30).map { i =>
      (i.toLong, Seq((i * 193 % 97) * 0.5, (i * 499 % 89) * 0.5))
    }.toDF("gid", "vals")
    val r = NeighborMatch.run(pts, vals, k = 4, scaleMethod = "raw")
      .as[(Long, Double, Double)].collect()
    assert(r.length == 30)
    r.foreach { case (g, card, p) =>
      assert(card == 4.0, s"gid $g card $card")
      assert(p < 0.01, s"gid $g p $p") // full overlap is highly significant
    }
  }

  test("neighbor match: unrelated attributes → low overlap on average") {
    import spark.implicits._
    val pts = (1 to 60).map { i =>
      (i.toLong, (i * 193 % 97) * 0.5, (i * 499 % 89) * 0.5)
    }.toDF("gid", "x", "y")
    val vals = (1 to 60).map { i =>
      (i.toLong, Seq((i * 37 % 101).toDouble, (i * 53 % 97).toDouble))
    }.toDF("gid", "vals")
    val r = NeighborMatch.run(pts, vals, k = 4)
      .as[(Long, Double, Double)].collect()
    val meanCard = r.map(_._2).sum / r.length
    // expected overlap under independence ≈ k*k/(N-1) = 16/59 ≈ 0.27
    assert(meanCard < 1.5, s"mean overlap $meanCard")
  }

  test("attribute kNN: cell-ring engine equals brute-force window at 4k rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 4000
    val vals = (1 to n).map { i =>
      (i.toLong, Seq((i * 7919 % 10007).toDouble, (i * 104729 % 9973).toDouble))
    }.toDF("gid", "vals")
    val scaled = NeighborMatch.scaleVals(vals, 2, "standardize").cache()
    val fast = NeighborMatch.attrKnn(scaled, 2, 6, "euclidean")
      .withColumn("key", concat_ws(":", col("gid"), col("anbr")))
      .select("key").as[String].collect().toSet
    // brute: the >2-dim fallback path IS the cross-join window — force it
    // by lying about nv (the sv arrays are still 2-dim)
    val brute = NeighborMatch.attrKnn(scaled, 3, 6, "euclidean")
      .withColumn("key", concat_ws(":", col("gid"), col("anbr")))
      .select("key").as[String].collect().toSet
    assert(fast == brute,
      s"cell-ring vs brute diff: ${(fast diff brute).take(5)} / ${(brute diff fast).take(5)}")
    // and the plan of the fast path must not contain a cartesian product
    val plan = NeighborMatch.attrKnn(scaled, 2, 6, "euclidean")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), "fast attr kNN must not cross join")
  }
}
