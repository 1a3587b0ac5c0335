package graft.catalyst

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Bounded top-k by (score desc, id asc tie-break) as a typed
  * `Aggregator` UDAF — the canonical replacement for
  * `row_number().over(Window.partitionBy(key))` top-k ranking at scale.
  *
  * The window form shuffles and sorts EVERY scored row (queries ×
  * corpus for ANN); the aggregate form keeps a k-slot insertion buffer
  * per key with map-side partial aggregation, so only ~k rows per
  * (partition, key) reach the shuffle. Order inside the buffer is
  * identical to `orderBy(score.desc, id.asc)` row-for-row, INCLUDING
  * non-finite scores: comparisons go through [[TopKAgg.cmpDouble]],
  * which mirrors Spark SQL's double ordering (NaN greater than
  * everything and equal to itself, -0.0 == 0.0), so a NaN-scored row
  * ranks first under desc exactly as the window formulation ranks it.
  *
  * The partial buffer crosses the exchange as a plain
  * struct<ds: array<double>, ids: array<long>, n: int> (case-class
  * `ExpressionEncoder`, primitive arrays) — native Tungsten layout, not
  * an opaque Kryo blob.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), TopKAgg.Buf, Seq[(Double, Long)]] {
  require(k > 0, "top-k needs k > 0")
  override def zero: TopKAgg.Buf =
    TopKAgg.Buf(new Array[Double](k), new Array[Long](k), 0)
  override def reduce(b: TopKAgg.Buf, a: (Double, Long)): TopKAgg.Buf = {
    b.insert(a._1, a._2); b
  }
  override def merge(a: TopKAgg.Buf, b: TopKAgg.Buf): TopKAgg.Buf = {
    var i = 0
    while (i < b.n) { a.insert(b.ds(i), b.ids(i)); i += 1 }
    a
  }
  override def finish(b: TopKAgg.Buf): Seq[(Double, Long)] =
    (0 until b.n).map(i => (b.ds(i), b.ids(i)))
  override def bufferEncoder: Encoder[TopKAgg.Buf] =
    ExpressionEncoder[TopKAgg.Buf]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  /** Spark SQL's double total order (SQLOrderingUtil semantics):
    * `x == y` first so -0.0 equals 0.0, then `java.lang.Double.compare`
    * so NaN sorts greater than every value and equal to itself.
    */
  @inline def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** k-slot insertion buffer, sorted by (score desc, id asc). A case
    * class so the buffer encodes as a native struct of primitive arrays.
    */
  final case class Buf(ds: Array[Double], ids: Array[Long], var n: Int) {
    def insert(d: Double, id: Long): Unit = {
      val k = ds.length
      val last = if (n == 0) 0 else cmpDouble(d, ds(n - 1))
      if (n < k || last > 0 || (last == 0 && id < ids(n - 1))) {
        var i = math.min(n, k - 1)
        while (i > 0 && {
                 val c = cmpDouble(ds(i - 1), d)
                 c < 0 || (c == 0 && ids(i - 1) > id)
               }) {
          ds(i) = ds(i - 1); ids(i) = ids(i - 1); i -= 1
        }
        ds(i) = d; ids(i) = id
        if (n < k) n += 1
      }
    }
  }

  /** `topk(score, id)` column function; result is
    * array<struct<_1: score, _2: id>> sorted by (score desc, id asc).
    */
  def topk(k: Int)(score: Column, id: Column): Column =
    functions.udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)
}
