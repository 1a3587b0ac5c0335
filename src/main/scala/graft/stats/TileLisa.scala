package graft.stats

import graft.core.{Stat0, Tiling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-tile LISA — the 10^12-row execution mode (SURVEY §7.5 option i).
  *
  * Broadcast-mode LISA needs the full z-vector on every executor, which
  * caps out around ~10^8 rows. Beyond that the engine partitions space
  * into super-tiles and runs the statistic independently per tile with
  * the reference's own window-trim semantics (`binweight.cpp:128-207`,
  * SURVEY §1.4): LISA over a sub-window DROPS neighbors outside the
  * window, RENUMBERS observations to window positions 0..N-1, and
  * standardizes over the window — so per-tile output is reference-defined
  * behavior (each tile IS a window), not an approximation of the global
  * statistic. The same argument extends to every window-level derivation:
  * quantile bins are computed over the window's values, multivariate
  * scaling per window, join-count binary validation per window row.
  *
  * Shape: one shuffle keyed by tile; within each tile group the same
  * LisaKernels run as in broadcast mode. Tiles are independent → no
  * broadcast, no global state, arbitrarily many tiles.
  *
  * All 12 reference LISA statistics are supported (the univariate five
  * — moran, g, g-star, geary, joincount — via [[run]]; the multivariate
  * and quantile families via [[runMulti]]).
  */
object TileLisa {

  sealed trait Stat extends Serializable
  case object Moran extends Stat
  case object G extends Stat
  case object GStar extends Stat
  case object Geary extends Stat
  case object JoinCount extends Stat
  /** Multivariate Geary over `vals: array<double>` (q39 semantics). */
  case object MultiGeary extends Stat
  /** Bivariate Moran over vals = [x, y]: z_x × lag(z_y), both
    * standardized per window (window-trim semantics).
    */
  case object BiMoran extends Stat
  /** Bivariate join count over vals = [x1, x2]; errors on co-location
    * per window row (`postgeoda/src/joincount.c:193-197`).
    */
  case object BiJoinCount extends Stat
  /** Co-location join count over `vals: array<double>` of binary vars. */
  case object MultiJoinCount extends Stat
  /** Quantile LISA: per-WINDOW quantile binning (breaks at percentiles
    * 100*i/k over the window's values — the window-trim analogue of
    * `quantilelisa.c:37-140`), then local join count.
    */
  final case class Quantile(k: Int, q: Int) extends Stat
  /** Multivariate quantile LISA: AND of per-variable per-window bin
    * indicators, then join count (`quantilelisa.c:143-300`).
    */
  final case class MultiQuantile(ks: Seq[Int], qs: Seq[Int]) extends Stat

  /** Tiles per window target, used when `tileSize <= 0`. */
  val DefaultTileRows = 100000L

  /** Derive a tile edge from point density: square tiles sized so a
    * tile holds ~`targetRows` points under uniform density —
    * `s = sqrt(w·h·target/n)` over the bounding box, the same density
    * rule `NeighborMatch.attrKnnHighDim` uses for its candidate cells.
    * 100k rows/window keeps the per-window kernel (O(rows × k × perms))
    * and its lookup table comfortably inside one task while leaving
    * ~n/100k tiles of parallelism; callers with strong window-semantics
    * opinions (each tile IS a reference window) should pass an explicit
    * `tileSize` instead.
    */
  def autoTileSize(points: DataFrame,
                   targetRows: Long = DefaultTileRows): Double = {
    val b = points.agg(min(col("x")), max(col("x")),
      min(col("y")), max(col("y")), count(lit(1))).head()
    require(!b.isNullAt(0), "autoTileSize over empty points")
    val w = math.max(b.getDouble(1) - b.getDouble(0), 1e-9)
    val h = math.max(b.getDouble(3) - b.getDouble(2), 1e-9)
    val n = b.getLong(4)
    math.max(math.sqrt(w * h * targetRows.toDouble / math.max(1L, n)), 1e-9)
  }

  /** Per-tile LISA for any univariate statistic.
    * points:  (gid, x, y) — tile assignment source
    * values:  (gid, value)
    * weights: (gid, nbrs)
    * tileSize: super-tile edge length (in coordinate units);
    *           <= 0 auto-sizes from point density ([[autoTileSize]]).
    * Output: (gid, tile, stat, p, c).
    */
  def run(stat: Stat, points: DataFrame, values: DataFrame,
          weights: DataFrame, tileSize: Double,
          conf: Lisa.Conf = Lisa.Conf()): DataFrame =
    runMulti(stat, points,
      values.select(col("gid"), array(col("value").cast("double")).as("vals")),
      weights, tileSize, conf)

  /** Per-tile LISA over a multivariate value frame (gid, vals:
    * array<double>). Univariate statistics read vals(0).
    *
    * Execution: ONE shuffle — `repartition(tile)` +
    * `sortWithinPartitions(tile, gid)` — then a raw InternalRow pass
    * that slices consecutive same-tile runs into windows (arrays read
    * straight out of UnsafeRows; no boxed Seq encoders on the
    * 10^12-row path). Window order is gid-ascending by the sort, which
    * is exactly the order the kernels' per-row seed stream requires, so
    * output is bit-identical under any partitioning.
    */
  def runMulti(stat: Stat, points: DataFrame, values: DataFrame,
               weights: DataFrame, tileSize: Double,
               conf: Lisa.Conf = Lisa.Conf()): DataFrame = {
    val spark = points.sparkSession
    val ts = if (tileSize > 0) tileSize else autoTileSize(points)
    val tiles = points.select(col("gid").cast("long"),
      Tiling.cellIdCol(col("x"), col("y"), ts).as("tile"))
    val joined = tiles
      .join(values.select(col("gid").cast("long"),
        col("vals").cast("array<double>").as("vals")), Seq("gid"))
      .join(weights.select(col("gid").cast("long"), col("nbrs")), Seq("gid"))
      .select(col("tile"), col("gid").cast("long").as("gid"), col("vals"),
        col("nbrs"))
      // 4× the session's shuffle width (the KnnWeights group-pass
      // convention): the kernel stage is compute-bound (O(rows × k ×
      // permutations) per window), and hashing a modest tile count into
      // exactly `numShufflePartitions` partitions stacks 2-3 windows on
      // one task while other cores idle — at 20 tiles / 32 partitions
      // the r8 probe measured the kernel job at ~0.9 s vs ~0.35 s of
      // max-window work. Wider hashing separates the windows; values
      // are partitioning-independent (per-window seed streams), so the
      // output is bit-identical under any width.
      .repartition(
        4 * points.sparkSession.sessionState.conf.numShufflePartitions,
        col("tile"))
      .sortWithinPartitions("tile", "gid")

    val permutations = conf.permutations
    val seed = conf.seed
    val cutoff = conf.cutoff
    val permMethod = conf.permMethod
    val scaleMethod = conf.scaleMethod
    val which = stat

    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val outRdd = org.apache.spark.sql.graftshim.ColumnShim
      .toInternalRdd(joined)
      .mapPartitions { it =>
        val rowsIt = it.buffered
        new Iterator[InternalRow] {
          private var window: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = {
            while (!window.hasNext && rowsIt.hasNext) window = nextWindow()
            window.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            window.next()
          }
          /** Consume one consecutive same-tile run into a window. */
          private def nextWindow(): Iterator[InternalRow] = {
            val tile = rowsIt.head.getLong(0)
            val gidsB = Array.newBuilder[Long]
            val valsB = Array.newBuilder[Array[Double]]
            val nbrsB = Array.newBuilder[Array[Long]]
            while (rowsIt.hasNext && rowsIt.head.getLong(0) == tile) {
              val row = rowsIt.next()
              // the raw pass reads tile/gid with getLong, which would
              // silently decode a null slot as 0 and contaminate tile 0
              // — reject nulls loudly (the typed-Dataset decode this
              // pass replaced failed loudly on them)
              require(!row.isNullAt(0),
                "null tile in TileLisa input (null x/y in points?)")
              require(!row.isNullAt(1), "null gid in TileLisa input")
              val gid = row.getLong(1)
              gidsB += gid
              // the raw pass skips typed-Dataset decoding, so null
              // elements must be rejected here — toDoubleArray would
              // silently read a null slot as 0.0
              valsB += (if (row.isNullAt(2)) Array.emptyDoubleArray
                        else {
                          val arr = row.getArray(2)
                          var k = 0
                          val m = arr.numElements()
                          while (k < m) {
                            require(!arr.isNullAt(k),
                              s"null element in vals array at gid $gid")
                            k += 1
                          }
                          arr.toDoubleArray()
                        })
              nbrsB += (if (row.isNullAt(3)) Array.emptyLongArray
                        else row.getArray(3).toLongArray())
            }
            windowKernel(which, permutations, seed, cutoff, permMethod,
              scaleMethod)(tile, gidsB.result(), valsB.result(),
              nbrsB.result())
          }
        }
      }
    val out = org.apache.spark.sql.graftshim.ColumnShim.internalDf(spark, outRdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("gid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("tile",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("stat",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.DoubleType))))
    // materialize the kernel output ONCE (5 fixed-width columns per
    // row — tiny next to the permutation work that produced it): every
    // caller of this 10^12-row path sorts or joins the result, and a
    // range-partitioned sort SAMPLES its child first — without this the
    // O(rows × k × permutations) kernel executes twice per query (the
    // r8 job-listener probe measured 2 × ~0.85 s of an ~2.1 s tile
    // query inside the duplicated kernel jobs; guide §1.4/§2.4)
    graft.core.Materialize.releasing(out, Nil)
  }

  /** Run one tile window (rows already gid-sorted). Everything the
    * broadcast engine derives globally is derived over the window here
    * (window-trim semantics, see object doc).
    */
  private def windowKernel(which: Stat, permutations: Int, seed: Int,
      cutoff: Double, permMethod: String, scaleMethod: String)(
      tile: Long, gids: Array[Long], rowVals: Array[Array[Double]],
      nbrGids: Array[Array[Long]])
      : Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val n = gids.length
    if (n == 0) return Iterator.empty
    // column-major value matrix for this window
    val nv = rowVals(0).length
    require(nv > 0, s"empty vals array at gid ${gids(0)}")
    val mat = Array.ofDim[Double](nv, n)
    var mi = 0
    while (mi < n) {
      val vs = rowVals(mi)
      require(vs.length == nv,
        s"ragged vals array at gid ${gids(mi)} ($nv vs ${vs.length})")
      var v = 0
      while (v < nv) { mat(v)(mi) = vs(v); v += 1 }
      mi += 1
    }
      def requireBinary(x: Array[Double], what: String): Unit = {
        var j = 0
        while (j < n) {
          require(x(j) == 0.0 || x(j) == 1.0,
            s"$what must be binary 0/1 (joincount.c semantics); " +
              s"found ${x(j)} at gid ${gids(j)}")
          j += 1
        }
      }
      // per-window preparation + kernel selection — everything that the
      // broadcast engine derives globally is derived over the window here
      // (window-trim semantics, see object doc)
      val kernelOf: (Int, Array[Int], LisaKernels.Scratch) => LisaKernels.Triple =
        which match {
          case Moran =>
            val z = mat(0).clone(); Stat0.standardize(z)
            (idx, nbrs, s) => LisaKernels.moran(idx, nbrs, z, permutations,
              seed, cutoff, s)
          case Geary =>
            val z = mat(0).clone(); Stat0.standardize(z)
            (idx, nbrs, s) => LisaKernels.geary(idx, nbrs, z, permutations,
              seed, cutoff, s)
          case G =>
            val x = mat(0)
            var sumAll = 0.0; x.foreach(sumAll += _)
            (idx, nbrs, s) => LisaKernels.localG(idx, nbrs, x, sumAll,
              permutations, seed, cutoff, s)
          case GStar =>
            val x = mat(0)
            var sumAll = 0.0; x.foreach(sumAll += _)
            (idx, nbrs, s) => LisaKernels.localGStar(idx, nbrs, x, sumAll,
              permutations, seed, cutoff, s)
          case JoinCount =>
            val x = mat(0)
            requireBinary(x, "tile join count variable")
            (idx, nbrs, s) => LisaKernels.joinCount(idx, nbrs, x,
              permutations, seed, s)
          case MultiGeary =>
            val zs = mat.map(v => Stat0.scale(v, scaleMethod))
            (idx, nbrs, s) => LisaKernels.multiGeary(idx, nbrs, zs,
              permutations, seed, cutoff, s)
          case BiMoran =>
            require(nv == 2, s"tile bimoran needs 2 variables, got $nv")
            val zx = mat(0).clone(); Stat0.standardize(zx)
            val zy = mat(1).clone(); Stat0.standardize(zy)
            (idx, nbrs, s) => LisaKernels.biMoran(idx, nbrs, zx, zy,
              permutations, seed, cutoff, s)
          case BiJoinCount =>
            require(nv == 2, s"tile bijoincount needs 2 variables, got $nv")
            val x1 = mat(0); val x2 = mat(1)
            requireBinary(x1, "tile bijoincount first variable")
            requireBinary(x2, "tile bijoincount second variable")
            var j = 0
            while (j < n) {
              require(x1(j) != x2(j),
                "local bivariate join count works only when two events " +
                  "cannot happen in the same location " +
                  s"(joincount.c:193-197); x1 == x2 at gid ${gids(j)}")
              j += 1
            }
            (idx, nbrs, s) => LisaKernels.biJoinCount(idx, nbrs, x1, x2,
              permutations, seed, s)
          case MultiJoinCount =>
            mat.zipWithIndex.foreach { case (v, vi) =>
              requireBinary(v, s"tile multijoincount variable $vi") }
            val prods = new Array[Double](n)
            var j = 0
            while (j < n) {
              var p = 1.0; var v = 0
              while (v < nv) { p *= mat(v)(j); v += 1 }
              prods(j) = p; j += 1
            }
            (idx, nbrs, s) => LisaKernels.multiJoinCount(idx, nbrs, prods,
              permutations, seed, s)
          case Quantile(k, q) =>
            val x = Lisa.quantileIndicator(mat(0), k, q)
            (idx, nbrs, s) => LisaKernels.joinCount(idx, nbrs, x,
              permutations, seed, s)
          case MultiQuantile(ks, qs) =>
            require(ks.length == nv && qs.length == nv,
              "ks/qs/vars arity mismatch")
            val ind = mat.zipWithIndex.map { case (v, vi) =>
              Lisa.quantileIndicator(v, ks(vi), qs(vi)) }
            val prods = new Array[Double](n)
            var j = 0
            while (j < n) {
              var p = 1.0; var v = 0
              while (v < nv) { p *= ind(v)(j); v += 1 }
              prods(j) = p; j += 1
            }
            (idx, nbrs, s) => LisaKernels.joinCount(idx, nbrs, prods,
              permutations, seed, s)
        }
      // window-trim all rows first: drop neighbors not present in this
      // tile (binweight.cpp:153-183 semantics), remap to window
      // positions — and learn the window's max degree so 'lookup' mode
      // can size its shared draw table (per window, exactly as the
      // broadcast engine sizes it globally)
      val trimmed = nbrGids.map { nbrs =>
        nbrs.iterator
          .map(nb => java.util.Arrays.binarySearch(gids, nb))
          .filter(_ >= 0).toArray
      }
      var maxK = 0
      trimmed.foreach(a => if (a.length > maxK) maxK = a.length)
      val lt =
        if (permMethod == "lookup" && maxK > 0 && maxK < n - 1)
          new LisaKernels.LookupTable(n, maxK, permutations, seed)
        else null // dense/tiny window: 'complete' fallback, as in runKernel
      val scratch = new LisaKernels.Scratch(n, 65536, lt)
      Iterator.range(0, n).map { idx =>
        val t = kernelOf(idx, trimmed(idx), scratch)
        new GenericInternalRow(
          Array[Any](gids(idx), tile, t.stat, t.p, t.c)): InternalRow
      }
  }

  /** Local Moran per tile (back-compat entry point). */
  def localMoran(points: DataFrame, values: DataFrame, weights: DataFrame,
                 tileSize: Double, conf: Lisa.Conf = Lisa.Conf()): DataFrame =
    run(Moran, points, values, weights, tileSize, conf)
}
