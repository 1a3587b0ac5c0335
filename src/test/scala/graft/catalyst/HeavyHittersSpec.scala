package graft.catalyst

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  import HeavyHittersAgg.MGSketch

  /** Deterministic (entries, max_err) view of a sketch for assertions. */
  private def entries(s: MGSketch): (Seq[(String, Long)], Long) = {
    val r = s.result()
    val arr = r.getArray(0)
    val es = (0 until arr.numElements()).map { i =>
      val e = arr.getStruct(i, 2)
      (e.getUTF8String(0).toString, e.getLong(1))
    }
    (es, r.getLong(1))
  }

  private def utf8(s: String) =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  test("MG sketch: exact when distinct cardinality <= capacity") {
    val s = new MGSketch(8)
    val stream = Seq("a", "b", "a", "c", "a", "b", "d")
    stream.foreach(t => s.add(utf8(t), 1L))
    val (es, err) = entries(s)
    assert(err == 0L)
    assert(es == Seq("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
  }

  test("MG sketch: shed keeps the lower-bound + presence guarantees") {
    // 3 heavies (freq 50) + 400 singletons through capacity 16:
    // every count is a lower bound with error <= max_err, max_err <=
    // N/(capacity+1), and every token with true > max_err survives
    val rng = new scala.util.Random(7)
    val stream = rng.shuffle(
      Seq.fill(50)("hot1") ++ Seq.fill(50)("hot2") ++ Seq.fill(50)("hot3")
        ++ (0 until 400).map(i => s"tail$i"))
    val s = new MGSketch(16)
    stream.foreach(t => s.add(utf8(t), 1L))
    val truth = stream.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val (es, err) = entries(s)
    val n = stream.size.toLong
    assert(err > 0L && err <= n / 17)
    assert(es.size <= 16)
    es.foreach { case (tok, est) =>
      val t = truth(tok)
      assert(est <= t, s"$tok overestimated: $est > $t")
      assert(t - est <= err, s"$tok error ${t - est} exceeds max_err $err")
    }
    val present = es.map(_._1).toSet
    truth.foreach { case (tok, t) =>
      if (t > err) assert(present.contains(tok),
        s"$tok (true count $t > max_err $err) missing from sketch")
    }
  }

  test("MG sketch: serialize/deserialize roundtrip preserves the state") {
    val s = new MGSketch(16)
    (0 until 300).foreach(i => s.add(utf8(s"t${i % 23}"), 1L))
    val back = MGSketch.fromBytes(16, s.toBytes)
    assert(entries(back) == entries(s))
  }

  test("MG sketch: merge matches the mergeable-summaries bound") {
    // two shards of a common stream; the merged sketch must hold the
    // lower-bound + bound-sum guarantee against GLOBAL truth
    val r = new java.util.Random(11)
    val shardA = (0 until 3000).map(_ =>
      if (r.nextInt(10) < 4) s"hh${r.nextInt(5)}" else s"za${r.nextInt(900)}")
    val shardB = (0 until 3000).map(_ =>
      if (r.nextInt(10) < 4) s"hh${r.nextInt(5)}" else s"zb${r.nextInt(900)}")
    val a = new MGSketch(64); shardA.foreach(t => a.add(utf8(t), 1L))
    val b = new MGSketch(64); shardB.foreach(t => b.add(utf8(t), 1L))
    val merged = a.mergeIn(b)
    val truth = (shardA ++ shardB).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val (es, err) = entries(merged)
    assert(es.size <= 64)
    assert(err <= 6000L / 65)
    es.foreach { case (tok, est) =>
      assert(est <= truth(tok) && truth(tok) - est <= err)
    }
    val present = es.map(_._1).toSet
    truth.foreach { case (tok, t) =>
      if (t > err) assert(present.contains(tok)) }
    // the five planted heavies (~240 hits each vs bound ~92) must all
    // survive with near-exact counts
    (0 until 5).foreach(i => assert(present.contains(s"hh$i")))
  }

  test("heavy_hitters aggregate: exact regime equals groupBy, " +
      "invariant to partitioning") {
    import spark.implicits._
    val docs = (0 until 500).map { i =>
      (i.toLong, (0 until 20).map(j => s"w${(i * 7 + j * 13) % 37}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val exact = graft.pipeline.Curation.vocabTopK(docs, k = 37).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    Seq(1, 13).foreach { p =>
      val got = graft.pipeline.Curation.vocabTopKSketch(
        docs.repartition(p), k = 37, capacity = 64).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq == exact.toSeq, s"parallelism $p")
    }
  }

  test("heavy_hitters aggregate: distributed compressed regime keeps " +
      "the MG guarantee over a high-cardinality corpus") {
    import spark.implicits._
    // 40k near-unique tokens + 8 heavies through capacity 512: the
    // distributed merge tree (partials per partition) must preserve
    // presence of everything above the bound
    val corpus = spark.range(40000).select(
      concat(lit("u"), col("id")).as("token"))
      .union(spark.range(8 * 700).select(
        concat(lit("heavy"), col("id") % 8).as("token")))
      .repartition(16)
    val n = 40000L + 8 * 700
    val got = corpus.agg(
      HeavyHittersAgg.heavyHitters(512)(col("token")).as("hh"))
      .select(col("hh.max_err"), col("hh.entries")).head()
    val err = got.getLong(0)
    assert(err <= n / 513)
    val es = got.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    (0 until 8).foreach { i =>
      val est = es.getOrElse(s"heavy$i",
        fail(s"heavy$i missing (true 700 > bound $err)"))
      assert(est <= 700L && 700L - est <= err)
    }
  }

  test("heavy_hitters via SQL: registered aggregate matches the " +
      "Column API, non-literal capacity rejected at analysis") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = (0 until 300).map(i => s"t${(i * 3) % 29}").toDF("token")
    docs.createOrReplaceTempView("hh_toks")
    val viaSql = spark.sql(
      """SELECT e.token, e.count AS n
         FROM (SELECT explode(hh.entries) AS e FROM
           (SELECT heavy_hitters(token, 64) AS hh FROM hh_toks))
         ORDER BY n DESC, token""").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val viaCol = docs.agg(
        HeavyHittersAgg.heavyHitters(64)(col("token")).as("hh"))
      .select(explode(col("hh.entries")).as("e"))
      .select(col("e.token"), col("e.count").as("n"))
      .orderBy(col("n").desc, col("token")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql.sameElements(viaCol) && viaSql.length == 29)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT heavy_hitters(token, length(token)) FROM hh_toks").collect()
    }
    assert(err.getMessage.contains("heavy_hitters"))
  }

  test("weighted MG: exact regime equals groupBy-sum, invariant to " +
      "partitioning, null/non-positive weights ignored") {
    import spark.implicits._
    val rows = (0 until 900).map { i =>
      (s"host${i % 23}", ((i * 37) % 500 - 50).toLong) } ++
      Seq(("hostX", 0L), (null.asInstanceOf[String], 99L))
    val df = rows.toDF("key", "w")
    val truth = rows.filter(r => r._1 != null && r._2 > 0)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    Seq(1, 11).foreach { p =>
      val got = graft.pipeline.Curation.heavyKeysSketch(
          df.repartition(p), "key", "w", k = 100, capacity = 64)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == truth, s"parallelism $p")
    }
  }

  test("weighted MG: compressed regime keeps the W/(capacity+1) bound " +
      "and surfaces the by-volume heavies") {
    import spark.implicits._
    // 5000 near-unique keys of weight ~100 + 6 heavies carrying 50x a
    // tail key's mass each, capacity 128 — by-volume heavies must
    // survive with bounded underestimates
    val tail = (0 until 5000).map(i => (s"t$i", 100L + i % 7))
    val heavy = (0 until 6).map(i => (s"H$i", 5000L * (i + 1)))
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(3))
      .shuffle(tail ++ heavy).toDF("key", "w").repartition(13)
    val bigW = tail.map(_._2).sum + heavy.map(_._2).sum
    val got = df.agg(graft.catalyst.HeavyHittersAgg
        .heavyHittersWeighted(128)(col("key"), col("w")).as("hh"))
      .select(col("hh.max_err"), col("hh.entries")).head()
    val err = got.getLong(0)
    assert(err > 0 && err <= bigW / 129)
    val es = got.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    heavy.foreach { case (k, w) =>
      val est = es.getOrElse(k, fail(s"$k (weight $w > bound $err) missing"))
      assert(est <= w && w - est <= err)
    }
  }

  test("heavy_hitters_w via SQL matches the Column API") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = (0 until 400).map(i => (s"k${i % 19}", (i % 50 + 1).toLong))
      .toDF("key", "w")
    df.createOrReplaceTempView("hhw_rows")
    val viaSql = spark.sql(
      """SELECT e.token AS key, e.count AS total
         FROM (SELECT explode(hh.entries) AS e FROM
           (SELECT heavy_hitters_w(key, w, 64) AS hh FROM hhw_rows))
         ORDER BY total DESC, key""").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val viaCol = graft.pipeline.Curation.heavyKeysSketch(
        df, "key", "w", k = 100, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql.sameElements(viaCol) && viaSql.length == 19)
  }

  test("heavyKeysSketch plan: sketches cross the exchange, not keys") {
    import spark.implicits._
    val df = (0 until 300).map(i => (s"h${i % 31}", (i % 9 + 1).toLong))
      .toDF("key", "w").repartition(5)
    val plan = graft.pipeline.Curation
      .heavyKeysSketch(df, "key", "w", k = 10, capacity = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("hashpartitioning(key"), plan)
  }

  test("heavy_hitters aggregate: grouped per-key sketches") {
    import spark.implicits._
    val rows = (0 until 600).map { i =>
      (s"lang${i % 3}", s"tok${(i * 11) % (20 + i % 3)}") }
    val df = rows.toDF("lang", "token").repartition(7)
    val got = df.groupBy("lang")
      .agg(HeavyHittersAgg.heavyHitters(64)(col("token")).as("hh"))
      .select(col("lang"), explode(col("hh.entries")).as("e"))
      .select(col("lang"), col("e.token"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == truth) // <= 23 distinct tokens per lang: exact
  }
}
