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
  * identical to `orderBy(score.desc, id.asc)`, so emitted ranks match
  * the window formulation row-for-row.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), TopKAgg.Buf, Seq[(Double, Long)]] {
  require(k > 0, "top-k needs k > 0")
  override def zero: TopKAgg.Buf =
    new TopKAgg.Buf(new Array[Double](k), new Array[Long](k), 0)
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
    Encoders.kryo[TopKAgg.Buf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  /** k-slot insertion buffer, sorted by (score desc, id asc). */
  final class Buf(val ds: Array[Double], val ids: Array[Long], var n: Int)
      extends Serializable {
    def insert(d: Double, id: Long): Unit = {
      val k = ds.length
      if (n < k || d > ds(n - 1) || (d == ds(n - 1) && id < ids(n - 1))) {
        var i = math.min(n, k - 1)
        while (i > 0 && (ds(i - 1) < d || (ds(i - 1) == d && ids(i - 1) > id))) {
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
