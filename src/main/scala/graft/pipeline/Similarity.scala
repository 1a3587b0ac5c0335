package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the corpus, dot products via `zip_with`/`aggregate`
  * higher-order functions (stays in Catalyst, no UDF), per-query window
  * top-k.
  *
  * Scale path: IVF-style coarse quantization — k-means-ish centroid
  * assignment with deterministic seeding; corpus bucketed by nearest
  * centroid (the "inverted file"); queries probe `nprobe` nearest
  * centroids; candidates scored exactly within probed buckets. All
  * shuffles keyed by centroid id.
  */
object Similarity {

  // codegen'd fused inner-product loop (bit-identical to the HOF chain
  // `aggregate(zip_with(_*_), 0.0, _+_)` it replaced — same
  // left-to-right accumulation — at a fraction of the per-row cost)
  private def dot(a: String, b: String) =
    graft.catalyst.GraftFunctions.dot_arr(col(a), col(b))

  /** L2-normalize the vector column into `unit` (array<double>). */
  def normalized(emb: DataFrame, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("norm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0),
          (acc, x) => acc + x)))
      .withColumn("unit",
        when(col("norm") === 0.0, col("v"))
          .otherwise(transform(col("v"), x => x / col("norm"))))
      .select("id", "unit")

  /** Rank scored rows per query: partial top-k aggregate (map-side
    * k-slot buffers, ~k rows per partition reach the shuffle) instead
    * of a whole-stream `row_number()` window sort. Row-identical to
    * `orderBy(cosine desc, id asc)` ranking.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(graft.catalyst.TopKAgg.topk(k)(col("cosine"), col("id")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col._2").as("id"),
        col("col._1").as("cosine"), (col("pos") + 1).cast("int").as("rk"))

  /** Brute-force cosine top-k: queries × corpus (queries broadcast).
    * Returns (qid, id, cosine, rk).
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = normalized(corpus)
    val q = normalized(queries).select(col("id").as("qid"),
      col("unit").as("qunit"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), dot("unit", "qunit").as("cosine"))
    rankTopK(scored, k)
  }

  /** Nearest-centroid assignment WITHOUT a window: per-id argmax via
    * `max_by` over a lexicographic (sim, -cid) struct — a partial-agg
    * hash aggregate instead of a full sort shuffle (the old
    * `Window.partitionBy(id)` sorted corpus×centroid rows twice).
    * Tie rule identical: max sim, then min cid.
    */
  private[graft] def assignNearest(c: DataFrame, cents: DataFrame): DataFrame =
    c.crossJoin(broadcast(cents))
      .select(col("id"), col("unit"), col("cid"),
        dot("unit", "cunit").as("sim"))
      .groupBy("id")
      .agg(max_by(col("cid"), struct(col("sim"), negate(col("cid")))).as("cid"),
        first(col("unit")).as("unit"))

  /** Deterministic IVF centroids: pick nCentroids seeds by id order, one
    * refinement sweep (mean of assigned vectors). Returns centroid DF
    * (cid, cunit).
    */
  def ivfCentroids(corpus: DataFrame, nCentroids: Int): DataFrame =
    lloydCentroids(corpus, nCentroids, scattered = false)

  /** Centroids with HASH-SCATTERED seeds — for cluster-partitioned
    * workloads (semantic dedup) where seed placement decides recall:
    * id-order seeding puts consecutive ids (often near-duplicates of
    * each other) on separate centroids, splitting exactly the groups
    * the caller wants co-clustered; ordering by xxhash64(id) scatters
    * the seed draw across the corpus. IVF keeps id-order seeding (its
    * queries probe several centroids anyway, and the q57b SQL oracle
    * replays that seeding verbatim).
    */
  def scatteredCentroids(corpus: DataFrame, nCentroids: Int): DataFrame =
    lloydCentroids(corpus, nCentroids, scattered = true)

  /** Euclidean k-means over RAW (unnormalized) vectors — for residual
    * quantization, where cosine assignment is wrong: two near-identical
    * vectors close to their coarse centroid have tiny residuals whose
    * DIRECTIONS diverge arbitrarily (normalization amplifies the
    * difference), while their Euclidean nearest residual-centroid stays
    * shared. argmin |r−c|² = argmax (r·c − ½|c|²); ties by min cid.
    * Input (id, vec: array<double>); returns (cid, cvec, cn2).
    */
  def euclidCentroids(frame: DataFrame, nCentroids: Int): DataFrame = {
    val f = frame.select(col("id"), col("vec")).cache()
    val ord = Seq(xxhash64(col("id")), col("id"))
    val seeds = f.orderBy(ord: _*).limit(nCentroids)
      .withColumn("cid", row_number().over(Window.orderBy(ord: _*)) - 1)
      .select(col("cid"), col("vec").as("cvec"))
      .withColumn("cn2", aggregate(transform(col("cvec"), x => x * x),
        lit(0.0), (a, x) => a + x))
    val assigned = assignNearestEuclid(f, seeds)
    val dim = f.select(size(col("vec"))).head().getInt(0)
    val out = assigned.groupBy("cid")
      .agg(array((0 until dim).map(i => avg(col("vec")(i))): _*).as("cvec"))
      .withColumn("cn2", aggregate(transform(col("cvec"), x => x * x),
        lit(0.0), (a, x) => a + x))
    graft.core.Materialize.releasing(out, Seq(f))
  }

  /** Euclidean nearest-centroid assignment: max_by over
    * (r·c − ½|c|², −cid) — the same windowless partial-agg shape as
    * [[assignNearest]]. Input (id, vec); centroids (cid, cvec, cn2).
    * `probes` > 1 emits the top-`probes` cells per id (multi-probe:
    * candidate-generation recall at Voronoi boundaries; the partial
    * top-k aggregate keeps the same tie rule, score desc then min cid)
    * and returns ONLY (id, cid) — its caller keys the probe cells back
    * to the full rows by id, so threading the vector through the top-k
    * aggregate and the explode would shuffle and duplicate d doubles
    * per probe for nothing. probes = 1 keeps (id, cid, vec): the Lloyd
    * mean recompute consumes the vector in the very next aggregate.
    */
  private[graft] def assignNearestEuclid(f: DataFrame,
      cents: DataFrame, probes: Int = 1): DataFrame = {
    if (probes <= 1)
      f.crossJoin(broadcast(cents))
        .select(col("id"), col("vec"), col("cid"),
          (graft.catalyst.GraftFunctions.dot_arr(col("vec"), col("cvec"))
            - lit(0.5) * col("cn2")).as("score"))
        .groupBy("id")
        .agg(max_by(col("cid"), struct(col("score"), negate(col("cid"))))
          .as("cid"),
          first(col("vec")).as("vec"))
    else
      f.crossJoin(broadcast(cents))
        .select(col("id"), col("cid"),
          (graft.catalyst.GraftFunctions.dot_arr(col("vec"), col("cvec"))
            - lit(0.5) * col("cn2")).as("score"))
        .groupBy("id")
        .agg(graft.catalyst.TopKAgg.topk(probes)(
          col("score"), col("cid").cast("long")).as("top"))
        .select(col("id"), explode(col("top")).as("t"))
        .select(col("id"), col("t._2").cast("int").as("cid"))
  }

  private def lloydCentroids(corpus: DataFrame, nCentroids: Int,
      scattered: Boolean): DataFrame = {
    val c = normalized(corpus).cache()
    // TakeOrdered heap either way — never a global sort
    val ord =
      if (scattered) Seq(xxhash64(col("id")), col("id")) else Seq(col("id"))
    val seeds = c.orderBy(ord: _*).limit(nCentroids)
      .withColumn("cid", row_number().over(Window.orderBy(ord: _*)) - 1)
      .select(col("cid"), col("unit").as("cunit"))
    // one Lloyd sweep: assign to nearest seed, recompute means. The
    // per-dimension avg columns stay inside ONE codegen'd hash aggregate
    // with map-side partials (dim fixed, small).
    val assigned = assignNearest(c, seeds)
    val dim = c.select(size(col("unit"))).head().getInt(0)
    val out = assigned.groupBy("cid")
      .agg(array((0 until dim).map(i =>
        avg(col("unit")(i))): _*).as("cunit"))
    graft.core.Materialize.releasing(out, Seq(c))
  }

  /** IVF ANN: bucket corpus by nearest centroid; queries probe the
    * `nprobe` nearest centroids; exact scoring within probed buckets.
    * Returns (qid, id, cosine, rk) — approximate top-k.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = ivfCentroids(corpus, nCentroids).cache()
    val c = normalized(corpus)
    val cBucketed = assignNearest(c, cents)
      .select(col("id"), col("unit"), col("cid"))
    val q = normalized(queries).select(col("id").as("qid"),
      col("unit").as("qunit"))
    val qProbes = q.crossJoin(broadcast(cents))
      .select(col("qid"), col("qunit"), col("cid"),
        dot("qunit", "cunit").as("sim"))
      .withColumn("rk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("cid"))))
      .filter(col("rk") <= nprobe)
      .select(col("qid"), col("qunit"), col("cid"))
    val scored = qProbes.join(cBucketed, "cid")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), dot("unit", "qunit").as("cosine"))
    graft.core.Materialize.releasing(rankTopK(scored, k), Seq(cents))
  }
}
