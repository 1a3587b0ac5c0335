package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpus curation. All are
  * shuffle-by-key designs: exact dedup groups by content hash; MinHash
  * LSH groups by band signature; SimHash groups by rotated prefix —
  * every variant is an equi-join problem, never an all-pairs compare,
  * which is what keeps them viable at 10^12 documents.
  */
object Dedup {

  /** Exact duplicate groups by md5(text): (h, keep_id, n). */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** 64-bit deterministic string hash (FNV-1a). */
  @inline private[pipeline] def fnv1a(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Word shingles of size w. */
  private[pipeline] def shingles(text: String, w: Int): Array[String] = {
    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (words.length < w) {
      if (words.isEmpty) Array.empty else Array(words.mkString(" "))
    } else
      (0 to words.length - w).map(i => words.slice(i, i + w).mkString(" ")).toArray
  }

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline private[pipeline] def mix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
    x ^= (x >>> 27); x *= 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** One 64-bit hash per w-word shingle: per-word FNV-1a hashes combined
    * by a rolling FNV polynomial over the window. Identical shingle-SET
    * semantics to [[shingles]] (same tokenization, same short-text
    * rule), but each character is hashed exactly ONCE and no shingle
    * string is ever materialized — the per-row cost drops from
    * O(len × w) to O(len + words × w). Any consistent 64-bit shingle
    * hash family is equivalent for LSH/simhash purposes.
    */
  private[pipeline] def shingleHashes(text: String, w: Int): Array[Long] = {
    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val nw = words.length
    if (nw == 0) return Array.emptyLongArray
    val wh = new Array[Long](nw)
    var i = 0
    while (i < nw) { wh(i) = fnv1a(words(i), 0L); i += 1 }
    if (nw < w) {
      var h = 0xcbf29ce484222325L
      i = 0
      while (i < nw) { h = (h ^ wh(i)) * 0x100000001b3L; i += 1 }
      return Array(h)
    }
    val out = new Array[Long](nw - w + 1)
    i = 0
    while (i <= nw - w) {
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < i + w) { h = (h ^ wh(j)) * 0x100000001b3L; j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** MinHash signature: one rolling hash per shingle, then numHashes
    * universal permutations `mix64(h ⊕ seed_i)` — 64 mixes per shingle
    * instead of 64 full string re-hashes (the dominant dedup cost at
    * corpus scale; see BENCH.md round 4).
    */
  private[pipeline] def minhash(text: String, w: Int, numHashes: Int): Array[Long] = {
    val sh = shingleHashes(text, w)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val seeds = new Array[Long](numHashes)
    var h = 0
    while (h < numHashes) {
      seeds(h) = mix64(0x9E3779B97F4A7C15L * (h + 1)); h += 1
    }
    var i = 0
    while (i < sh.length) {
      val h0 = sh(i)
      h = 0
      while (h < numHashes) {
        val v = mix64(h0 ^ seeds(h))
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  /** MinHash + LSH near-duplicate pairs: shingle → minhash(numBands ×
    * rowsPerBand) → band buckets → candidate pairs within a bucket →
    * verified by estimated Jaccard (signature agreement) ≥ threshold.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    */
  def minhashLsh(docs: DataFrame, shingleSize: Int = 3, numBands: Int = 16,
                 rowsPerBand: Int = 4, threshold: Double = 0.7,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val numHashes = numBands * rowsPerBand
    val sigs = docs.select(col(idCol).cast("long").as("id"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, minhash(text, shingleSize, numHashes)) }
      .toDF("id", "sig")
      .cache()
    // band key = hash of the band's signature slice
    val banded = sigs.as[(Long, Seq[Long])].flatMap { case (id, sig) =>
      (0 until numBands).iterator.map { b =>
        val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        (id, b, slice.hashCode.toLong ^ (b.toLong << 32))
      }
    }.toDF("id", "band", "bkey")
    // candidate pairs via bucket SELF-JOIN, deliberately not a
    // groupBy+collect_list pair expansion: a duplicate-heavy corpus (the
    // primary dedup workload) puts entire dup clusters into one bucket,
    // and collect_list would materialize that cluster as a single
    // in-memory array row (2 GB row limit / OOM), whereas the sort-merge
    // self-join spills and streams the identical quadratic pair output.
    val cand = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bkey" === $"b.bkey" &&
          $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b")).distinct()
    // verify candidates on full signatures
    val withSig = cand
      .join(sigs.select($"id".as("id_a"), $"sig".as("sig_a")), "id_a")
      .join(sigs.select($"id".as("id_b"), $"sig".as("sig_b")), "id_b")
    val out = withSig.select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0),
          (acc, v) => acc + v).cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    graft.core.Materialize.releasing(out, Seq(sigs))
  }

  /** 64-bit SimHash over word shingles (rolling shingle hashes +
    * mix64 for per-bit diffusion; no shingle strings materialized).
    */
  private[pipeline] def simhash(text: String, w: Int): Long = {
    val sh = shingleHashes(text, w)
    val acc = new Array[Int](64)
    var i = 0
    while (i < sh.length) {
      val h = mix64(sh(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Public simhash entry for reuse outside the batch pipeline (the
    * streaming dedup keys state by it).
    */
  def simhashOf(text: String, shingleSize: Int = 2): Long =
    simhash(text, shingleSize)

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, found by
    * the rotate-and-prefix-bucket trick (each of `tables` rotations
    * buckets on the top `prefixBits` bits → candidates share a bucket in
    * ≥1 rotation) — the standard web-dedup sharding, no all-pairs.
    */
  def simhashDup(docs: DataFrame, maxHamming: Int = 3, shingleSize: Int = 2,
                 tables: Int = 8, prefixBits: Int = 16,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs.select(col(idCol).cast("long").as("id"), col(textCol))
      .as[(Long, String)]
      .map { case (id, t) => (id, simhash(t, shingleSize)) }
      .toDF("id", "sh").cache()
    val rotated = hashed.as[(Long, Long)].flatMap { case (id, h) =>
      (0 until tables).iterator.map { r =>
        val rot = java.lang.Long.rotateLeft(h, r * (64 / tables))
        (id, h, r, rot >>> (64 - prefixBits))
      }
    }.toDF("id", "sh", "rot", "bucket")
    val out = rotated.as("a").join(rotated.as("b"),
        $"a.rot" === $"b.rot" && $"a.bucket" === $"b.bucket" &&
          $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        $"a.sh".as("sha"), $"b.sh".as("shb")).distinct()
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
    graft.core.Materialize.releasing(out, Seq(hashed))
  }

  /** Exact n-gram Jaccard similarity for candidate pairs (id_a, id_b):
    * explode shingles, count intersections via join — used as the
    * verifier stage after LSH banding.
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, shingleSize: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = docs.select(col(idCol).cast("long").as("id"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, t) => shingles(t, shingleSize).distinct.map((id, _)) }
      .toDF("id", "sh")
    val counts = sh.groupBy("id").agg(count(lit(1)).as("nsh"))
    val inter = pairs
      .join(sh.select($"id".as("id_a"), $"sh"), "id_a")
      .join(sh.select($"id".as("id_b"), $"sh".as("sh2")), "id_b")
      .filter($"sh" === $"sh2")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("ninter"))
    pairs.join(inter, Seq("id_a", "id_b"), "left")
      .join(counts.select($"id".as("id_a"), $"nsh".as("na")), "id_a")
      .join(counts.select($"id".as("id_b"), $"nsh".as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (coalesce(col("ninter"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("ninter"), lit(0L))))
          .as("jaccard"))
  }

  /** Embedding cosine near-duplicates: normalize, LSH-bucket by
    * random-hyperplane sign bits, verify candidates exactly.
    * (gid, vec) → (id_a, id_b, cosine) with cosine >= threshold.
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double = 0.95,
                       planes: Int = 12, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    // deterministic pseudo-random hyperplanes
    val hp = Array.tabulate(planes, dim) { (p, d) =>
      val h = fnv1a(s"$p:$d", 0x51ed270b9L)
      (h.toDouble / Long.MaxValue.toDouble)
    }
    val bHp = spark.sparkContext.broadcast(hp)
    val sigs = emb.select(col(idCol).cast("long").as("id"), col(vecCol))
      .as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val arr = v.toArray
        val n = math.sqrt(arr.map(x => x.toDouble * x).sum)
        val unit = if (n == 0) arr.map(_ => 0.0) else arr.map(_ / n)
        var sig = 0L
        val planesArr = bHp.value
        for (p <- planesArr.indices) {
          var dot = 0.0
          var d = 0
          while (d < dim) { dot += planesArr(p)(d) * unit(d); d += 1 }
          if (dot >= 0) sig |= (1L << p)
        }
        (id, unit, sig)
      }.toDF("id", "unit", "sig").cache()
    val out = sigs.as("a").join(sigs.as("b"),
        $"a.sig" === $"b.sig" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        graft.catalyst.GraftFunctions.dot_arr($"a.unit", $"b.unit")
          .as("cosine"))
      .filter(col("cosine") >= threshold)
    graft.core.Materialize.releasing(out, Seq(sigs))
  }
}
