package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-budget mixture draw: the bucketed prefix sum must reproduce
  * the naive running-sum window row-for-row, including the boundary
  * bucket's partial admit, across strata and budgets.
  */
class TokenBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def corpus(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    (0 until n).map { i =>
      val lang = Seq("en", "de", "fr")(i % 3)
      val words = 1 + rnd.nextInt(30)
      (i.toLong, lang, Seq.fill(words)("w" + rnd.nextInt(50)).mkString(" "))
    }.toDF("doc_id", "lang", "text")
  }

  private def naive(df: org.apache.spark.sql.DataFrame, budget: Long) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(Curation.sampleKey(col("doc_id")), col("doc_id"))
    df.select(col("lang"), col("doc_id"),
        size(filter(split(coalesce(col("text"), lit("")), " "),
          t => length(t) > 0)).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") - col("n_tokens") < budget)
      .select(col("lang"), col("doc_id").as("sample_id"), col("n_tokens"))
  }

  test("row-identical to the naive window at several budgets") {
    val df = corpus(3000)
    for (budget <- Seq(1L, 100L, 5000L, 1000000L)) {
      val got = Curation.tokenBudgetSample(df, Seq("lang"), budget, "doc_id")
      val want = naive(df, budget)
      assert(got.count() === want.count(), s"budget $budget")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"budget $budget mismatch")
    }
  }

  test("budget larger than the corpus admits everything; zero admits nothing") {
    val df = corpus(300)
    assert(Curation.tokenBudgetSample(df, Seq("lang"), 10000000L, "doc_id")
      .count() === 300L)
    assert(Curation.tokenBudgetSample(df, Seq("lang"), 0L, "doc_id")
      .count() === 0L)
  }

  test("zero-token docs ride free before exhaustion, not after") {
    import spark.implicits._
    // Lehmer order = doc_id order here; doc 1 (empty) costs 0, doc 2
    // overshoots the budget of 2, doc 3 (null text, 0 tokens) comes
    // after exhaustion (before-tokens 3 >= 2) and is excluded — same
    // greedy rule as the window oracle
    val df = Seq((1L, "en", ""), (2L, "en", "a b c"), (3L, "en", null))
      .toDF("doc_id", "lang", "text")
    val got = Curation.tokenBudgetSample(df, Seq("lang"), 2L, "doc_id")
      .collect().map(r => r.getLong(1)).toSet
    assert(got === Set(1L, 2L))
    // with the budget above the corpus total, the null-text doc is in
    val all = Curation.tokenBudgetSample(df, Seq("lang"), 4L, "doc_id")
      .collect().map(r => r.getLong(1)).toSet
    assert(all === Set(1L, 2L, 3L))
  }
}
