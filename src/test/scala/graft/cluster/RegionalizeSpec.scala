package graft.cluster

import graft.SparkFixture
import graft.core.Wkb
import graft.weights.ContiguityWeights
import org.scalatest.funsuite.AnyFunSuite

class RegionalizeSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  /** 6x1 strip of squares with a sharp value break between cells 3 and 4:
    * skater k=2 must cut exactly there.
    */
  test("skater: first cut lands on the value discontinuity") {
    import spark.implicits._
    val polys = (0 until 6).map { cx =>
      ((cx + 1).toLong, Wkb.writePolygon(Array((cx * 1.0, 0.0),
        (cx + 1.0, 0.0), (cx + 1.0, 1.0), (cx * 1.0, 1.0))))
    }.toDF("gid", "geom")
    val w = ContiguityWeights.build(polys, ContiguityWeights.Conf(queen = true))
    val vals = Seq((1L, Seq(1.0)), (2L, Seq(1.1)), (3L, Seq(0.9)),
      (4L, Seq(10.0)), (5L, Seq(10.2)), (6L, Seq(9.8)))
      .toDF("gid", "vals")
    val r = Regionalize.run(vals, w, Regionalize.Conf(k = 2))
      .orderBy("gid").as[(Long, Int)].collect()
    val c1 = r.take(3).map(_._2).toSet
    val c2 = r.drop(3).map(_._2).toSet
    assert(c1.size == 1 && c2.size == 1 && c1 != c2)
    assert(r.map(_._2).toSet == Set(1, 2))
  }

  test("all fullorder linkages produce k contiguous regions") {
    import spark.implicits._
    val polys = (for (cy <- 0 until 4; cx <- 0 until 4) yield {
      ((cy * 4 + cx + 1).toLong, Wkb.writePolygon(Array((cx * 1.0, cy * 1.0),
        (cx + 1.0, cy * 1.0), (cx + 1.0, cy + 1.0), (cx * 1.0, cy + 1.0))))
    }).toDF("gid", "geom")
    val w = ContiguityWeights.build(polys, ContiguityWeights.Conf(queen = true))
    val vals = (1 to 16).map(i => (i.toLong,
      Seq((i % 4).toDouble, (i * 7 % 5).toDouble))).toDF("gid", "vals")
    for (m <- Seq("firstorder-singlelinkage", "fullorder-singlelinkage",
        "fullorder-completelinkage", "fullorder-averagelinkage",
        "fullorder-wardlinkage")) {
      val r = Regionalize.run(vals, w,
        Regionalize.Conf(k = 3, method = m)).as[(Long, Int)].collect()
      assert(r.map(_._2).toSet == Set(1, 2, 3), s"method $m")
      // labels ordered by region size descending
      val sizes = r.groupBy(_._2).view.mapValues(_.length).toMap
      assert(sizes(1) >= sizes(2) && sizes(2) >= sizes(3), s"method $m sizes")
    }
  }

  test("disconnected weights raise (skater.c:165-168 parity)") {
    import spark.implicits._
    val w = Seq((1L, Seq(2L), null.asInstanceOf[Seq[Double]]),
      (2L, Seq(1L), null.asInstanceOf[Seq[Double]]),
      (3L, Seq.empty[Long], null.asInstanceOf[Seq[Double]]))
      .toDF("gid", "nbrs", "wts")
    val vals = Seq((1L, Seq(1.0)), (2L, Seq(2.0)), (3L, Seq(3.0)))
      .toDF("gid", "vals")
    val ex = intercept[Exception] {
      Regionalize.run(vals, w, Regionalize.Conf(k = 2)).collect()
    }
    assert(ex.getMessage.contains("disconnected"))
  }

  test("min region size constraint respected") {
    import spark.implicits._
    val polys = (0 until 8).map { cx =>
      ((cx + 1).toLong, Wkb.writePolygon(Array((cx * 1.0, 0.0),
        (cx + 1.0, 0.0), (cx + 1.0, 1.0), (cx * 1.0, 1.0))))
    }.toDF("gid", "geom")
    val w = ContiguityWeights.build(polys, ContiguityWeights.Conf(queen = true))
    // outlier at one end would tempt a size-1 cut
    val vals = Seq((1L, Seq(100.0)), (2L, Seq(1.0)), (3L, Seq(1.1)),
      (4L, Seq(0.9)), (5L, Seq(1.0)), (6L, Seq(1.2)), (7L, Seq(0.8)),
      (8L, Seq(1.0))).toDF("gid", "vals")
    val r = Regionalize.run(vals, w,
      Regionalize.Conf(k = 2, minRegionSize = 3)).as[(Long, Int)].collect()
    val sizes = r.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.values.forall(_ >= 3))
  }
}
