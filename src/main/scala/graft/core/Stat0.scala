package graft.core

/** Scalar statistical primitives shared by the weights + LISA kernels.
  *
  * Standardization follows the reference's `GenUtils::StandardizeData`
  * semantics (libgeoda [public]; invoked at
  * `postgeoda/src/proxy.cpp:370-372`): subtract the mean, then divide by
  * the *sample* standard deviation sqrt(ssq/(n-1)).
  *
  * The six scale methods mirror `postgeoda/src/lisa.h:139-159`.
  */
object Stat0 {

  /** Exact (order-independent) sum of doubles via BigDecimal partials.
    * Used for global moments so that results are bit-identical under any
    * partitioning — the key distributed-determinism property (SURVEY §5.3).
    */
  final class ExactSum extends Serializable {
    private var acc: java.math.BigDecimal = java.math.BigDecimal.ZERO
    def add(v: Double): Unit =
      if (!v.isNaN && !v.isInfinite)
        acc = acc.add(new java.math.BigDecimal(v))
    def merge(o: ExactSum): ExactSum = { acc = acc.add(o.acc); this }
    def value: Double = acc.doubleValue()
    def raw: java.math.BigDecimal = acc
  }

  /** mean + sample sd, sequential accumulation in array order —
    * deterministic because callers pass gid-sorted vectors, and
    * bit-matching the reference's GenUtils double accumulation.
    * sd = sqrt(sum((x-mean)^2)/(n-1)).
    */
  def meanSd(xs: Array[Double]): (Double, Double) = {
    val n = xs.length
    if (n == 0) return (0.0, 0.0)
    var s = 0.0
    var i = 0
    while (i < n) { s += xs(i); i += 1 }
    val mean = s / n
    if (n == 1) return (mean, 0.0)
    var s2 = 0.0
    i = 0
    while (i < n) { val d = xs(i) - mean; s2 += d * d; i += 1 }
    (mean, math.sqrt(s2 / (n - 1)))
  }

  /** In-place z-standardize (GeoDa semantics; sd==0 leaves deviations). */
  def standardize(xs: Array[Double]): Unit = {
    if (xs.length <= 1) return
    val (mean, sd) = meanSd(xs)
    var i = 0
    while (i < xs.length) { xs(i) -= mean; i += 1 }
    if (sd != 0.0) {
      i = 0
      while (i < xs.length) { xs(i) /= sd; i += 1 }
    }
  }

  /** z-standardize with precomputed global moments (distributed path). */
  @inline def z(x: Double, mean: Double, sd: Double): Double =
    if (sd == 0.0) x - mean else (x - mean) / sd

  /** Median absolute deviation scaling; `mad` method of lisa.h:149. */
  def madScale(xs: Array[Double]): Array[Double] = {
    val sorted = xs.clone(); java.util.Arrays.sort(sorted)
    val med = medianSorted(sorted)
    val dev = xs.map(v => math.abs(v - med))
    val devS = dev.clone(); java.util.Arrays.sort(devS)
    val mad = medianSorted(devS)
    if (mad == 0.0) xs.map(_ - med) else xs.map(v => (v - med) / mad)
  }

  def medianSorted(sorted: Array[Double]): Double = {
    val n = sorted.length
    if (n == 0) 0.0
    else if (n % 2 == 1) sorted(n / 2)
    else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
  }

  /** demean only. */
  def demean(xs: Array[Double]): Array[Double] = {
    val (mean, _) = meanSd(xs)
    xs.map(_ - mean)
  }

  /** range standardize: (x-min)/(max-min). */
  def rangeStandardize(xs: Array[Double]): Array[Double] = {
    if (xs.isEmpty) return xs
    val mn = xs.min; val mx = xs.max
    val r = mx - mn
    if (r == 0.0) xs.map(_ - mn) else xs.map(v => (v - mn) / r)
  }

  /** range adjust: x/(max-min). */
  def rangeAdjust(xs: Array[Double]): Array[Double] = {
    if (xs.isEmpty) return xs
    val r = xs.max - xs.min
    if (r == 0.0) xs.clone() else xs.map(_ / r)
  }

  /** Scale-method dispatch, names per `postgeoda/src/lisa.h:139-159`. */
  def scale(xs: Array[Double], method: String): Array[Double] =
    method match {
      case "raw"               => xs.clone()
      case "standardize"       => val a = xs.clone(); standardize(a); a
      case "demean"            => demean(xs)
      case "mad"               => madScale(xs)
      case "range_standardize" => rangeStandardize(xs)
      case "range_adjust"      => rangeAdjust(xs)
      case other => throw new IllegalArgumentException(
        s"unknown scale method '$other' (lisa.h:139-159)")
    }

  /** GeoDa percentile convention (GenUtils::percentile [public]):
    * plotting positions p_i = 100*(i+0.5)/n over the sorted sample,
    * linear interpolation between, clamped to the extremes.
    */
  def percentileSorted(x: Double, sorted: Array[Double]): Double = {
    val n = sorted.length
    require(n > 0, "percentile of empty")
    val nd = n.toDouble
    val p0 = (100.0 / nd) * 0.5
    val pN = (100.0 / nd) * (nd - 0.5)
    if (x <= p0) return sorted(0)
    if (x >= pN) return sorted(n - 1)
    // find i with p_i <= x < p_{i+1}
    val idx = x * nd / 100.0 - 0.5
    val i = math.floor(idx).toInt
    val frac = idx - i
    if (i >= n - 1) sorted(n - 1)
    else sorted(i) + frac * (sorted(i + 1) - sorted(i))
  }
}
