package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hashed linear quality scorer: with uniform weights the hash layout
  * cancels (score = bias + 0.5 * n_tokens), empty docs and empty
  * models fall back to the bias, and bucket assignment replays the
  * md5-prefix formula exactly.
  */
class CurationScoreSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("uniform weights reduce to bias + w * token count") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "a b c"), (3L, "x  y"), (4L, null))
      .toDF("doc_id", "text")
    val w = spark.range(64).select(col("id").as("bucket"),
      lit(0.5).as("weight"))
    val got = Curation.hashedLinearScore(docs, w, dim = 64, bias = 0.1)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got(1L)._1 === 0.1)
    assert(got(2L)._1 === 1.6)   // 0.1 + 3*0.5
    assert(got(3L)._1 === 1.1)   // double space -> 2 tokens
    assert(got(4L)._1 === 0.1)   // null text
    val sig = (x: Double) =>
      BigDecimal(1.0 / (1.0 + math.exp(-x)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(2L)._2 === sig(1.6))
  }

  test("empty model scores every doc at the bias") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val w = spark.range(0).select(col("id").as("bucket"),
      lit(0.0).as("weight"))
    val got = Curation.hashedLinearScore(docs, w, dim = 16, bias = -2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> -2.0, 2L -> -2.0))
  }

  test("bucket assignment matches the md5-prefix formula") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    val tok = "quality"
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val bucket = java.lang.Long.parseLong(hex, 16) % 32
    // weight 1 only on that bucket: a one-token doc must score 1
    val docs = Seq((1L, tok)).toDF("doc_id", "text")
    val w = spark.range(32).select(col("id").as("bucket"),
      when(col("id") === bucket, 1.0).otherwise(0.0).as("weight"))
    val got = Curation.hashedLinearScore(docs, w, dim = 32)
      .head().getDouble(1)
    assert(got === 1.0)
  }
}
