package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PQSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  /** Collected codebook as (sub, cid) -> cvec for driver-side checks. */
  private def cbMap(cb: org.apache.spark.sql.DataFrame)
      : Map[(Int, Int), Seq[Double]] =
    cb.collect().map(r => (r.getInt(0), r.getInt(1)) ->
      r.getSeq[Double](2)).toMap

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dp = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    dp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("PQ exact regime: <= ksub distinct unit subvectors per subspace " +
      "reconstruct exactly, codes deterministic") {
    import spark.implicits._
    // vector i = concat of one-hot((i+j) % 4) per subspace j: every
    // vector has norm sqrt(2), so the UNIT subvector pool per subspace
    // is exactly 4 patterns, and the first 4 vectors (the seed draw)
    // cover all of them — after one Lloyd sweep each centroid is its
    // pattern and quantization is lossless
    val m = 2; val ksub = 4; val dsub = 4
    val rows = (0 until 64).map { i =>
      val v = Array.fill(m * dsub)(0.0f)
      (0 until m).foreach(j => v(j * dsub + (i + j) % 4) = 1.0f)
      (i.toLong, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(emb, m, ksub)
    val codes = Similarity.pqEncode(emb, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.foreach { case (i, _) =>
      assert(codes(i) == Seq((i % 4).toInt, (i % 4).toInt), s"id $i")
    }
    val book = cbMap(cb)
    val inv = 1.0 / math.sqrt(2.0)
    book.foreach { case ((sub, cid), cvec) =>
      // centroid cid in subspace sub is one-hot((cid+sub) % 4) / sqrt(2)
      val want = (0 until dsub).map(p =>
        if (p == (cid + sub) % 4) inv else 0.0)
      cvec.indices.foreach(p =>
        assert(math.abs(cvec(p) - want(p)) < 1e-12, s"($sub,$cid,$p)"))
    }
  }

  /** Deterministic pseudo-random embedding corpus (id-hash floats in
    * [-1, 1]), the shape of the testdata embeddings table.
    */
  private def synthEmb(n: Int, dim: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map { d =>
        val h = (i.toLong * 2654435761L + d * 40503L) & 0xffffL
        (h.toDouble / 0x8000L - 1.0).toFloat
      })
    }.toDF("vec_id", "embedding")
  }

  test("PQ encode is partitioning-invariant given a codebook") {
    val emb = synthEmb(500, 32)
    val cb = Similarity.pqTrain(emb, m = 4, ksub = 8)
    val a = Similarity.pqEncode(emb.repartition(1), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Similarity.pqEncode(emb.repartition(13), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b && a.size == 500)
  }

  test("PQ reconstruction error shrinks as ksub grows") {
    val emb = synthEmb(600, 32)
    def mse(ksub: Int): Double = {
      val cb = cbMap(Similarity.pqTrain(emb, m = 4, ksub = ksub))
      val codes = Similarity.pqEncode(emb, Similarity.pqTrain(emb, 4, ksub))
      val units = Similarity.normalized(emb).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      codes.collect().map { r =>
        val recon = r.getSeq[Int](1).zipWithIndex
          .flatMap { case (c, j) => cb((j, c)) }
        val u = units(r.getLong(0))
        u.indices.map(i => math.pow(u(i) - recon(i), 2)).sum
      }.sum / 600
    }
    val coarse = mse(2); val fine = mse(16)
    assert(fine < coarse,
      s"ksub=16 mse $fine should beat ksub=2 mse $coarse")
    assert(fine < 0.5, s"unit-vector mse $fine unreasonably large")
  }

  test("IVFADC: planted near-duplicates found through probed cells; " +
      "full probe covers the corpus exactly once") {
    import spark.implicits._
    val rng = new java.util.Random(97)
    val dim = 64
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val bases = (0 until 30).map(_ =>
      unit(Array.fill(dim)(rng.nextGaussian())))
    val partners = bases.map(b =>
      unit(b.map(x => x + 0.05 * rng.nextGaussian())))
    val noise = (0 until 300).map(_ =>
      unit(Array.fill(dim)(rng.nextGaussian())))
    val corpus = (bases.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      partners.zipWithIndex.map { case (v, i) => (1000L + i, v) } ++
      noise.zipWithIndex.map { case (v, i) => (2000L + i, v) })
      .map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 30)
    // near-identical partners share the coarse cell with their base
    // (max-cosine assignment), so even nprobe=4/16 must surface them
    val top = Similarity.ivfAdcTopK(corpus, queries, k = 3,
        nCells = 16, nprobe = 4, m = 8, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val hits = (0 until 30).count { i =>
      top.get(i.toLong).exists(_.exists(_._2 == 1000L + i))
    }
    assert(hits >= 27, s"only $hits/30 planted partners in IVFADC top-3")
    // full probe: every corpus id except the query scored exactly once
    // (cells partition the corpus), so top-(n) returns all 359 others
    val full = Similarity.ivfAdcTopK(corpus, queries.limit(2), k = 400,
        nCells = 8, nprobe = 8, m = 8, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perQ = full.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2) }
    perQ.foreach { case (q, ids) =>
      assert(ids.length == 359 && ids.distinct.length == 359, s"query $q")
      assert(!ids.contains(q))
    }
  }

  test("IVFADC rerank: full probe + full shortlist reduces to exact " +
      "brute-force top-k, bit-for-bit") {
    import spark.implicits._
    val emb = synthEmb(350, 32)
    val queries = emb.filter(col("vec_id") < 4)
    val idx = Similarity.ivfAdcIndex(emb, nCells = 8, m = 4, ksub = 8)
    // every cell probed + shortlist covers the corpus → candidate
    // generation is lossless, so the exact re-scoring pass must equal
    // brute force row-for-row including the cosine bits and tie order
    val rer = Similarity.ivfAdcRerank(idx, emb, queries, k = 10,
        shortlist = 400, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).sorted
    val brute = Similarity.bruteTopK(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).sorted
    idx.release()
    assert(rer.length == 40 && rer.sameElements(brute))
  }

  test("PQ encode is stateless: identical codes on a stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val emb = synthEmb(300, 32)
    val cb = Similarity.pqTrain(emb, m = 4, ksub = 8).cache()
    cb.count()
    val batch = Similarity.pqEncode(emb, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    mem.addData(emb.as[(Long, Seq[Float])].collect().toSeq)
    val q = Similarity.pqEncode(
        mem.toDF().toDF("vec_id", "embedding"), cb)
      .writeStream.format("memory").queryName("pqcodes")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("pqcodes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    cb.unpersist(false)
    assert(streamed == batch && streamed.size == 300)
  }

  test("ADC top-k finds planted near-duplicates through the codes") {
    import spark.implicits._
    val rng = new java.util.Random(31)
    val dim = 64
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val bases = (0 until 40).map(_ =>
      unit(Array.fill(dim)(rng.nextGaussian())))
    val partners = bases.map(b =>
      unit(b.map(x => x + 0.05 * rng.nextGaussian())))
    val noise = (0 until 400).map(_ =>
      unit(Array.fill(dim)(rng.nextGaussian())))
    // ids: bases 0..39 (the queries), partners 1000..1039, noise 2000+
    val corpus = (bases.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      partners.zipWithIndex.map { case (v, i) => (1000L + i, v) } ++
      noise.zipWithIndex.map { case (v, i) => (2000L + i, v) })
      .map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(corpus, m = 8, ksub = 16)
    val codes = Similarity.pqEncode(corpus, cb)
    val queries = corpus.filter(col("vec_id") < 40)
    val top = Similarity.pqTopK(codes, queries, cb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val hits = (0 until 40).count { i =>
      top.get(i.toLong).exists(_.exists(_._2 == 1000L + i))
    }
    // cosine(base, partner) ~ 0.99+ vs random ~ +-0.15: ADC
    // quantization noise at m=8/ksub=16 must leave nearly all planted
    // partners inside the top 3
    assert(hits >= 36, s"only $hits/40 planted partners in ADC top-3")
  }
}
