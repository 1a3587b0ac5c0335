package graft.stats

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FDR/Bonferroni correction: the bucketed global ranking must equal
  * the naive single-window Benjamini-Hochberg on random p-values with
  * heavy ties (the LISA p-grid k/1000), and undefined-p rows (join
  * count convention, p = -1) stay out of n and out of significance.
  */
class SignificanceSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def bruteBH(ps: Seq[Double], alpha: Double): Option[Double] = {
    val valid = ps.filter(_ >= 0.0).sorted
    val n = valid.length.toDouble
    val ok = valid.zipWithIndex.filter { case (p, i) =>
      p <= (i + 1) * alpha / n
    }
    if (ok.isEmpty) None else Some(ok.map(_._1).max)
  }

  test("bucketed BH cutoff equals brute force (ties, several alphas)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    // LISA-like grid: p = k/1000 with heavy ties + a few -1 undefined
    val ps = (0 until 4000).map { i =>
      if (i % 97 == 0) -1.0 else (rnd.nextInt(1000) + 1) / 1000.0
    }
    val df = ps.zipWithIndex.map { case (p, i) => (i.toLong, p, (i % 5).toDouble) }
      .toDF("gid", "p", "c")
    for (alpha <- Seq(0.01, 0.05, 0.2)) {
      val got = Significance.fdrCutoff(df, alpha)
      assert(got === bruteBH(ps, alpha), s"alpha $alpha")
    }
  }

  test("adjust: labels survive only under the corrected cutoff; undefined p never significant") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.0001, 1.0), (2L, 0.002, 2.0), (3L, 0.4, 3.0),
      (4L, -1.0, 4.0), (5L, 0.04, 1.0)).toDF("gid", "p", "c")
    val fdr = Significance.adjust(df, alpha = 0.05).orderBy("gid")
      .select("gid", "c_adj").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // n=4 valid; sorted p: 1e-4<=0.0125 ok, 0.002<=0.025 ok, 0.04<=0.0375
    // FAILS, 0.4 fails -> cutoff 0.002
    assert(fdr === Map(1L -> 1.0, 2L -> 2.0, 3L -> 0.0, 4L -> 0.0, 5L -> 0.0))
    val bon = Significance.adjust(df, alpha = 0.05, method = "bonferroni")
      .orderBy("gid").select("gid", "c_adj").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // alpha/n = 0.0125 -> only p=1e-4 and 0.002 pass
    assert(bon === Map(1L -> 1.0, 2L -> 2.0, 3L -> 0.0, 4L -> 0.0, 5L -> 0.0))
    val raw = Significance.adjust(df, alpha = 0.05, method = "raw")
      .orderBy("gid").select("gid", "c_adj").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(raw === Map(1L -> 1.0, 2L -> 2.0, 3L -> 0.0, 4L -> 0.0, 5L -> 1.0))
    // caller-supplied n skips the count pass entirely and must match the
    // plan-folded default (n = 4 valid rows here)
    val bonN = Significance.adjust(df, alpha = 0.05,
        method = "bonferroni", n = 4L)
      .orderBy("gid").select("gid", "c_adj").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bonN === bon)
    // the plan-folded bonferroni keeps the original columns (the helper
    // __sig_n column never leaks) and exactly the one added c_adj
    assert(Significance.adjust(df, 0.05, "bonferroni").columns.toSeq ===
      df.columns.toSeq :+ "c_adj")
  }

  test("no significant rows: cutoff None, all labels zeroed") {
    import spark.implicits._
    val df = Seq((1L, 0.9, 1.0), (2L, 0.8, 2.0)).toDF("gid", "p", "c")
    assert(Significance.fdrCutoff(df, 0.05) === None)
    assert(Significance.adjust(df, 0.05).select("c_adj")
      .collect().forall(_.getDouble(0) == 0.0))
  }
}
