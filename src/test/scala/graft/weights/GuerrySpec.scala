package graft.weights

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** EXTERNAL golden: queen contiguity on the Guerry dataset (85 French
  * departments, real multipolygon WKB — public data) validated against
  * the reference's own regression expectation
  * (`postgeoda/test/test_weights_queen.sql:140`, the `-- expect` neighbor
  * map for `geoda_queenweights_b` over guerry). This is produced by the
  * reference implementation, not by this engine — a true external pin
  * for W1 on real geometry (the synthetic-grid oracles only cover
  * cell-adjacency layouts).
  *
  * Fixture extraction: `src/test/resources/guerry.tsv` carries
  * (ogc_fid, wkb hex, Crm_prs, Crm_prp, Litercy) pulled verbatim from the
  * reference test's COPY block; `guerry_queen_expected.txt` is the
  * `-- expect` comment. gid = ogc_fid - 1 (the reference map keys are
  * 0-based window positions in ogc_fid order).
  */
class GuerrySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def hexToBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  private def resourceLines(name: String): Array[String] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing test resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
    finally in.close()
  }

  private lazy val guerry: Array[(Long, Array[Byte], Double, Double, Double)] =
    resourceLines("/guerry.tsv").drop(1).map { l =>
      val f = l.split('\t')
      (f(0).toLong - 1, hexToBytes(f(1)), f(2).toDouble, f(3).toDouble,
        f(4).toDouble)
    }

  private lazy val expectedQueen: Map[Long, Set[Long]] = {
    val txt = resourceLines("/guerry_queen_expected.txt").mkString
    val entry = """(\d+):\{([^}]*)\}""".r
    entry.findAllMatchIn(txt).map { m =>
      val gid = m.group(1).toLong
      val nbrs = m.group(2).split(',').filter(_.nonEmpty)
        .map(_.split(':')(0).toLong).toSet
      gid -> nbrs
    }.toMap
  }

  test("queen weights on Guerry match the reference's expected neighbor map") {
    import spark.implicits._
    val polys = guerry.toSeq.map(t => (t._1, t._2)).toDF("gid", "geom")
    val adj = ContiguityWeights.adjacency(polys,
        ContiguityWeights.Conf(queen = true))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (g, arr) => g -> arr.map(_._2).toSet }
    assert(expectedQueen.size == 85)
    (0L until 85L).foreach { g =>
      assert(adj.getOrElse(g, Set.empty) == expectedQueen(g),
        s"gid $g: got ${adj.getOrElse(g, Set.empty).toSeq.sorted} " +
          s"expected ${expectedQueen(g).toSeq.sorted}")
    }
  }

  /** Expected (stat, p, cluster) triples for moran/g/gstar/geary from the
    * independent C harness `tools/pin_guerry_lisa.c` (reference
    * 'complete' permutation scheme, 999 perms, seed 123456789, cutoff
    * 0.05) — regenerate with
    * `gcc -O2 -o /tmp/pin tools/pin_guerry_lisa.c -lm && /tmp/pin >
    * src/test/resources/guerry_lisa_expected.tsv`.
    */
  private lazy val expectedLisa: Map[Long, Array[Double]] =
    resourceLines("/guerry_lisa_expected.tsv").drop(1).map { l =>
      val f = l.split('\t')
      f(0).toLong -> f.drop(1).map(_.toDouble)
    }.toMap

  test("Guerry LISA triples (I/G/G*/Geary + p + cluster) match the C harness exactly") {
    import spark.implicits._
    val polys = guerry.toSeq.map(t => (t._1, t._2)).toDF("gid", "geom")
    val w = ContiguityWeights.build(polys,
      ContiguityWeights.Conf(queen = true)).cache()
    val vals = guerry.toSeq.map(t => (t._1, t._3)).toDF("gid", "value")
    def check(df: org.apache.spark.sql.DataFrame, off: Int, what: String): Unit = {
      val r = df.as[(Long, Double, Double, Double)].collect()
      assert(r.length == 85)
      r.foreach { case (g, stat, p, c) =>
        val e = expectedLisa(g)
        assert(stat == e(off) && p == e(off + 1) && c == e(off + 2),
          s"$what gid $g: got ($stat,$p,$c) " +
            s"want (${e(off)},${e(off + 1)},${e(off + 2)})")
      }
    }
    check(graft.stats.Lisa.localMoran(vals, w), 0, "moran")
    // 'lookup' permutation mode (the reference's own default): same
    // statistics, p/cluster from the shared draw table. Harness data
    // cols: moran 26-27, g 28-29, gstar 30-31, geary 32-33 (stat is
    // mode-independent — compare against the complete-mode stat col).
    val confLk = graft.stats.Lisa.Conf(permMethod = "lookup")
    def checkLk(df: org.apache.spark.sql.DataFrame, statOff: Int,
                pOff: Int, what: String): Unit = {
      val r = df.as[(Long, Double, Double, Double)].collect()
      assert(r.length == 85)
      r.foreach { case (g, stat, p, c) =>
        val e = expectedLisa(g)
        assert(stat == e(statOff) && p == e(pOff) && c == e(pOff + 1),
          s"$what-lookup gid $g: got ($stat,$p,$c) " +
            s"want (${e(statOff)},${e(pOff)},${e(pOff + 1)})")
      }
    }
    checkLk(graft.stats.Lisa.localMoran(vals, w, confLk), 0, 26, "moran")
    checkLk(graft.stats.Lisa.localG(vals, w, star = false, confLk), 3, 28, "g")
    checkLk(graft.stats.Lisa.localG(vals, w, star = true, confLk), 6, 30, "gstar")
    checkLk(graft.stats.Lisa.localGeary(vals, w, confLk), 9, 32, "geary")
    check(graft.stats.Lisa.localG(vals, w, star = false), 3, "g")
    check(graft.stats.Lisa.localG(vals, w, star = true), 6, "gstar")
    check(graft.stats.Lisa.localGeary(vals, w), 9, "geary")
    // multivariate Geary over (crm_prs, litercy), harness cols 19-21
    val mvals = guerry.toSeq.map(t => (t._1, Seq(t._3, t._5)))
      .toDF("gid", "vals")
    check(graft.stats.Lisa.localMultiGeary(mvals, w), 19, "multigeary")
    // bivariate Moran (crm_prs × litercy), both permutation modes:
    // harness data cols 41-43 (complete) and 44-45 (lookup p/cluster)
    val bmVals = guerry.toSeq.map(t => (t._1, t._3, t._5))
      .toDF("gid", "value", "value2")
    check(graft.stats.Lisa.localBiMoran(bmVals, w), 41, "bimoran")
    checkLk(graft.stats.Lisa.localBiMoran(bmVals, w, confLk), 41, 44,
      "bimoran")
    w.unpersist()
  }

  test("Guerry global Moran's I matches the published GeoDa workbook value") {
    import spark.implicits._
    val polys = guerry.toSeq.map(t => (t._1, t._2)).toDF("gid", "geom")
    val w = ContiguityWeights.build(polys,
      ContiguityWeights.Conf(queen = true))
    val vals = guerry.toSeq.map(t => (t._1, t._3)).toDF("gid", "value")
    val r = graft.stats.Lisa.localMoran(vals, w,
      graft.stats.Lisa.Conf(permutations = 9)) // I is RNG-independent
      .as[(Long, Double, Double, Double)].collect()
    // Global I (row-standardized) = mean(local I) * n/(n-1) under
    // sample-sd standardization. The GeoDa workbook/tutorial reports
    // Moran's I = 0.411 for Crm_prs over queen weights [public].
    val globalI = r.map(_._2).sum / r.length * 85.0 / 84.0
    assert(math.abs(globalI - 0.411) < 1e-3, s"global I $globalI")
  }

  test("GlobalStats.moran on Guerry reproduces the workbook value with significant inference") {
    import spark.implicits._
    val polys = guerry.toSeq.map(t => (t._1, t._2)).toDF("gid", "geom")
    val adj = ContiguityWeights.adjacency(polys,
      ContiguityWeights.Conf(queen = true))
    val vals = guerry.toSeq.map(t => (t._1, t._3)).toDF("gid", "value")
    val r = graft.stats.GlobalStats.moran(vals, adj).head()
    // GeoDa workbook: Moran's I = 0.411 for Crm_prs over queen [public]
    assert(math.abs(r.getDouble(0) - 0.411) < 1e-3, s"I ${r.getDouble(0)}")
    // strong positive autocorrelation → z-scores far beyond critical
    assert(r.getDouble(3) > 5.0 && r.getDouble(5) > 5.0)
  }

  test("Guerry join-count family (uni/bi/co-location) matches the C harness exactly") {
    import spark.implicits._
    val polys = guerry.toSeq.map(t => (t._1, t._2)).toDF("gid", "geom")
    val w = ContiguityWeights.build(polys,
      ContiguityWeights.Conf(queen = true)).cache()
    // same indicators as the harness: x1 = crm_prs > 20000, x2 = 1-x1,
    // co-location product x1 * (litercy > 38)
    def x1(t: (Long, Array[Byte], Double, Double, Double)): Double =
      if (t._3 > 20000.0) 1.0 else 0.0
    def x3(t: (Long, Array[Byte], Double, Double, Double)): Double =
      if (t._5 > 38.0) 1.0 else 0.0
    val jcGot = graft.stats.Lisa.localJoinCount(
      guerry.toSeq.map(t => (t._1, x1(t))).toDF("gid", "value"), w)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val bjcGot = graft.stats.Lisa.localBiJoinCount(
      guerry.toSeq.map(t => (t._1, x1(t), 1.0 - x1(t)))
        .toDF("gid", "value", "value2"), w)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val mjcGot = graft.stats.Lisa.localMultiJoinCount(
      guerry.toSeq.map(t => (t._1, Seq(x1(t), x3(t)))).toDF("gid", "vals"), w)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // quantile LISA: top quintile of crm_prs (k=5, q=5), harness cols 22-23
    val qlGot = graft.stats.Lisa.quantileLisa(5, 5,
      guerry.toSeq.map(t => (t._1, t._3)).toDF("gid", "value"), w)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // multiquantile LISA: above-median crm_prs AND below-median litercy
    // (ks=[2,2], qs=[2,1]), harness data cols 24-25
    val mqGot = graft.stats.Lisa.multiQuantileLisa(Array(2, 2), Array(2, 1),
      guerry.toSeq.map(t => (t._1, Seq(t._3, t._5))).toDF("gid", "vals"), w)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (0L until 85L).foreach { g =>
      val e = expectedLisa(g) // cols 12.. = jc, jc_p, bjc, bjc_p, mjc, mjc_p, nn
      assert(jcGot(g) == ((e(12), e(13), e(18))),
        s"jc gid $g: got ${jcGot(g)} want (${e(12)},${e(13)},${e(18)})")
      assert(bjcGot(g) == ((e(14), e(15))),
        s"bjc gid $g: got ${bjcGot(g)} want (${e(14)},${e(15)})")
      assert(mjcGot(g) == ((e(16), e(17))),
        s"mjc gid $g: got ${mjcGot(g)} want (${e(16)},${e(17)})")
      assert(qlGot(g) == ((e(22), e(23))),
        s"ql gid $g: got ${qlGot(g)} want (${e(22)},${e(23)})")
      assert(mqGot(g) == ((e(24), e(25))),
        s"mq gid $g: got ${mqGot(g)} want (${e(24)},${e(25)})")
    }
    // 'lookup' permutation mode for the same five statistics (harness
    // cols: jc_lkp 34, bjc_lkp 35, mjc_lkp 36, ql_lkp 37, mq_lkp 38) —
    // stat columns are mode-independent, so only p changes
    val confLk = graft.stats.Lisa.Conf(permMethod = "lookup")
    def lkMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Double, Double)] =
      df.as[(Long, Double, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val jcLk = lkMap(graft.stats.Lisa.localJoinCount(
      guerry.toSeq.map(t => (t._1, x1(t))).toDF("gid", "value"), w, confLk))
    val bjcLk = lkMap(graft.stats.Lisa.localBiJoinCount(
      guerry.toSeq.map(t => (t._1, x1(t), 1.0 - x1(t)))
        .toDF("gid", "value", "value2"), w, confLk))
    val mjcLk = lkMap(graft.stats.Lisa.localMultiJoinCount(
      guerry.toSeq.map(t => (t._1, Seq(x1(t), x3(t)))).toDF("gid", "vals"),
      w, confLk))
    val qlLk = lkMap(graft.stats.Lisa.quantileLisa(5, 5,
      guerry.toSeq.map(t => (t._1, t._3)).toDF("gid", "value"), w, confLk))
    val mqLk = lkMap(graft.stats.Lisa.multiQuantileLisa(Array(2, 2),
      Array(2, 1),
      guerry.toSeq.map(t => (t._1, Seq(t._3, t._5))).toDF("gid", "vals"),
      w, confLk))
    (0L until 85L).foreach { g =>
      val e = expectedLisa(g)
      assert(jcLk(g) == ((e(12), e(34))),
        s"jc-lookup gid $g: got ${jcLk(g)} want (${e(12)},${e(34)})")
      assert(bjcLk(g) == ((e(14), e(35))),
        s"bjc-lookup gid $g: got ${bjcLk(g)} want (${e(14)},${e(35)})")
      assert(mjcLk(g) == ((e(16), e(36))),
        s"mjc-lookup gid $g: got ${mjcLk(g)} want (${e(16)},${e(36)})")
      assert(qlLk(g) == ((e(22), e(37))),
        s"ql-lookup gid $g: got ${qlLk(g)} want (${e(22)},${e(37)})")
      assert(mqLk(g) == ((e(24), e(38))),
        s"mq-lookup gid $g: got ${mqLk(g)} want (${e(24)},${e(38)})")
    }
    // lookup-mode multivariate Geary (harness cols mg 19, mg_lkp 39,
    // mg_lkc 40)
    val mvalsLk = guerry.toSeq.map(t => (t._1, Seq(t._3, t._5)))
      .toDF("gid", "vals")
    graft.stats.Lisa.localMultiGeary(mvalsLk, w, confLk)
      .as[(Long, Double, Double, Double)].collect()
      .foreach { case (g, stat, p, c) =>
        val e = expectedLisa(g)
        assert(stat == e(19) && p == e(39) && c == e(40),
          s"multigeary-lookup gid $g: got ($stat,$p,$c) " +
            s"want (${e(19)},${e(39)},${e(40)})")
      }
    w.unpersist()
  }

  /** Expected SKATER / REDCAP (k=5, 3 vars standardized, euclidean)
    * cluster labels from the independent C harness
    * `tools/pin_guerry_skater.c` — regenerate with
    * `gcc -O2 -o /tmp/pin tools/pin_guerry_skater.c -lm && /tmp/pin >
    * src/test/resources/guerry_skater_expected.tsv`.
    */
  test("Guerry SKATER + REDCAP k=5 labels match the independent C harness") {
    import spark.implicits._
    val expected = resourceLines("/guerry_skater_expected.tsv").drop(1).map { l =>
      val f = l.split('\t'); f(0).toLong -> (f(1).toInt, f(2).toInt, f(3).toInt)
    }.toMap
    val polys = guerry.toSeq.map(t => (t._1, t._2)).toDF("gid", "geom")
    val w = ContiguityWeights.build(polys,
      ContiguityWeights.Conf(queen = true)).cache()
    val vals = guerry.toSeq.map(t => (t._1, Seq(t._3, t._4, t._5)))
      .toDF("gid", "vals")
    def labels(method: String): Map[Long, Int] =
      graft.cluster.Regionalize.run(vals, w,
        graft.cluster.Regionalize.Conf(k = 5, method = method))
        .as[(Long, Int)].collect().toMap
    val skater = labels("firstorder-singlelinkage")
    val ward = labels("fullorder-wardlinkage")
    val avg = labels("fullorder-averagelinkage")
    (0L until 85L).foreach { g =>
      val (es, ew, ea) = expected(g)
      assert(skater(g) == es, s"skater gid $g: got ${skater(g)} want $es")
      assert(ward(g) == ew, s"redcap-ward gid $g: got ${ward(g)} want $ew")
      assert(avg(g) == ea, s"redcap-avg gid $g: got ${avg(g)} want $ea")
    }
    w.unpersist()
  }

  test("local Moran on Guerry Crm_prs over queen weights: positive autocorrelation") {
    import spark.implicits._
    val polys = guerry.toSeq.map(t => (t._1, t._2)).toDF("gid", "geom")
    val w = ContiguityWeights.build(polys,
      ContiguityWeights.Conf(queen = true))
    val vals = guerry.toSeq.map(t => (t._1, t._3)).toDF("gid", "value")
    val r = graft.stats.Lisa.localMoran(vals, w)
      .as[(Long, Double, Double, Double)].collect()
    assert(r.length == 85)
    // Crm_prs is known to be positively spatially autocorrelated on the
    // queen graph (GeoDa workbook result [public]): the average local
    // Moran is clearly positive and significant clusters exist
    val meanI = r.map(_._2).sum / r.length
    assert(meanI > 0.2, s"mean local Moran $meanI")
    assert(r.count(_._3 <= 0.05) > 10, "expected significant clusters")
  }
}
