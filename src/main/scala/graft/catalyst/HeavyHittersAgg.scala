package graft.catalyst

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary: at most `capacity` (token,
  * count-lower-bound) counters whose per-token error is bounded by
  * `max_err` ≤ N/(capacity+1) over a stream of N tokens, maintained in
  * O(capacity) memory regardless of the distinct-token cardinality
  * (Misra & Gries 1982; the merge rule — sum counters, then subtract
  * the (capacity+1)-th largest and drop non-positives — is the
  * mergeable-summaries form of Agarwal et al., PODS 2012, which keeps
  * the same bound under arbitrary partial-aggregation trees).
  *
  * Why a sketch when `vocabTopK`'s groupBy already partial-aggregates
  * map-side: partial aggregation bounds the shuffle at ~one row per
  * DISTINCT token per partition. A web corpus's token cardinality is
  * effectively unbounded (typos, URLs, unicode), so at 100 TB that
  * exchange — and the reduce-side hash tables behind it — still scale
  * with the vocabulary. This aggregate crosses the exchange as ONE
  * serialized `capacity`-entry buffer per partition (per group), so
  * exchange volume and aggregation memory are fixed by configuration,
  * not by the data; the price is the documented underestimate bound,
  * which is zero whenever the distinct cardinality never exceeds
  * `capacity` (no shed ever fires and every count is exact).
  *
  * Catalyst integration is a raw [[TypedImperativeAggregate]] — the
  * buffer lives as a JVM hash map for the whole partition and is
  * byte-serialized ONLY at exchange boundaries (an `Aggregator`/udaf
  * buffer must round-trip through its encoder and so cannot safely
  * carry a live index). Update cost is amortized O(1): a shed subtracts
  * the minimum count m from all capacity+1 counters, removing
  * ≥ (capacity+1)·m of total mass, and inserts add N mass in total, so
  * sheds cost O(N) over the stream.
  *
  * Output: `struct<entries: array<struct<token string, count long>>,
  * max_err: long>`, entries sorted (count desc, token asc — binary
  * UTF8 order, Spark's default collation). For every token,
  * `count ≤ true ≤ count + max_err`, and every token with
  * `true > max_err` is present. Null tokens are ignored; empty strings
  * count (mirroring `split`/`unnest` semantics so the DuckDB oracle
  * replays bit-for-bit).
  */
case class HeavyHittersAgg(child: Expression, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAgg.MGSketch]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(capacity > 0, "heavy_hitters needs capacity > 0")

  import HeavyHittersAgg.MGSketch

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHittersAgg.outType
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): MGSketch = new MGSketch(capacity)

  override def update(b: MGSketch, input: InternalRow): MGSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String], 1L)
    b
  }

  override def merge(b: MGSketch, o: MGSketch): MGSketch = b.mergeIn(o)

  override def eval(b: MGSketch): Any = b.result()

  override def serialize(b: MGSketch): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): MGSketch =
    MGSketch.fromBytes(capacity, bytes)

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Weighted Misra-Gries: `heavy_hitters_w(key, weight)` — the same
  * [[HeavyHittersAgg.MGSketch]] with per-row weight `w` instead of 1
  * (total-bytes-per-domain style telemetry: at 100 TB "which hosts
  * dominate the corpus BY VOLUME" matters more than by page count).
  * All MG guarantees carry with N replaced by the total weight W:
  * counts are lower bounds, per-key error ≤ `max_err` ≤ W/(capacity+1)
  * (the shed-mass argument is identical — each shed removes ≥
  * (capacity+1)·m of weight), exact whenever distinct keys ≤ capacity.
  * Null keys, null weights, and weights ≤ 0 are ignored.
  */
case class HeavyHittersWeightedAgg(left: Expression, right: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAgg.MGSketch]
  with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(capacity > 0, "heavy_hitters_w needs capacity > 0")

  import HeavyHittersAgg.MGSketch

  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHittersAgg.outType
  override def prettyName: String = "heavy_hitters_w"

  override def createAggregationBuffer(): MGSketch = new MGSketch(capacity)

  override def update(b: MGSketch, input: InternalRow): MGSketch = {
    val k = left.eval(input)
    val w = right.eval(input)
    if (k != null && w != null && w.asInstanceOf[Long] > 0L)
      b.add(k.asInstanceOf[UTF8String], w.asInstanceOf[Long])
    b
  }

  override def merge(b: MGSketch, o: MGSketch): MGSketch = b.mergeIn(o)
  override def eval(b: MGSketch): Any = b.result()
  override def serialize(b: MGSketch): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): MGSketch =
    MGSketch.fromBytes(capacity, bytes)

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersWeightedAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersWeightedAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object HeavyHittersAgg {

  private[catalyst] val outType: DataType = StructType(Seq(
    StructField("entries", ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("max_err", LongType, nullable = false)))

  /** `heavyHitters(capacity)(token)` aggregate Column. Works grouped
    * (`groupBy(lang).agg(...)`) as well as global — ObjectHashAggregate
    * keeps one live sketch per group.
    */
  def heavyHitters(capacity: Int)(tok: Column): Column =
    ColumnShim.column(
      HeavyHittersAgg(ColumnShim.expression(tok), capacity)
        .toAggregateExpression())

  /** `heavyHittersWeighted(capacity)(key, weight)` — weighted variant
    * ([[HeavyHittersWeightedAgg]]); weight must be a long column.
    */
  def heavyHittersWeighted(capacity: Int)(key: Column,
                                          weight: Column): Column =
    ColumnShim.column(
      HeavyHittersWeightedAgg(ColumnShim.expression(key),
        ColumnShim.expression(weight), capacity)
        .toAggregateExpression())

  /** The live buffer. Counts are 1-element arrays so a hit mutates in
    * place with no box churn; keys are cloned on FIRST insert only (the
    * incoming UTF8String may point into a reused scan buffer — a hit
    * compares bytes without needing a copy).
    */
  final class MGSketch(val capacity: Int) {
    // pre-size for capacity entries without resize churn, clamped so a
    // huge configured capacity can't overflow the Int ctor argument
    private[HeavyHittersAgg] val map =
      new java.util.HashMap[UTF8String, Array[Long]](
        math.min(capacity.toLong * 2, 1L << 30).toInt)
    private[HeavyHittersAgg] var err: Long = 0L

    def add(tok: UTF8String, w: Long): Unit = {
      val c = map.get(tok)
      if (c != null) c(0) += w
      else {
        map.put(tok.clone(), Array(w))
        if (map.size > capacity) shedMin()
      }
    }

    /** Per-row overflow (size = capacity+1): subtract the minimum count
      * from every counter and drop the non-positive — classic MG.
      */
    private def shedMin(): Unit = {
      var m = Long.MaxValue
      val vs = map.values().iterator()
      while (vs.hasNext) { val v = vs.next()(0); if (v < m) m = v }
      shed(m)
    }

    private def shed(m: Long): Unit = {
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue()(0) - m
        if (v <= 0) it.remove() else e.getValue()(0) = v
      }
      err += m
    }

    /** Mergeable-summaries combine: sum counters (≤ 2·capacity live),
      * then one shed by the (capacity+1)-th largest count.
      */
    def mergeIn(o: MGSketch): MGSketch = {
      val it = o.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = map.get(e.getKey)
        if (c != null) c(0) += e.getValue()(0)
        else map.put(e.getKey, e.getValue) // o is never reused after merge
      }
      err += o.err
      if (map.size > capacity) {
        val vals = new Array[Long](map.size)
        var i = 0
        val vs = map.values().iterator()
        while (vs.hasNext) { vals(i) = vs.next()(0); i += 1 }
        java.util.Arrays.sort(vals)
        shed(vals(vals.length - capacity - 1)) // (capacity+1)-th largest
      }
      this
    }

    def result(): InternalRow = {
      val es = new Array[(UTF8String, Long)](map.size)
      var i = 0
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); es(i) = (e.getKey, e.getValue()(0)); i += 1
      }
      java.util.Arrays.sort(es, new java.util.Comparator[(UTF8String, Long)] {
        override def compare(a: (UTF8String, Long),
                             b: (UTF8String, Long)): Int = {
          val c = java.lang.Long.compare(b._2, a._2)
          if (c != 0) c else a._1.compareTo(b._1)
        }
      })
      InternalRow(
        new GenericArrayData(es.map(e => InternalRow(e._1, e._2))), err)
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeLong(err)
      out.writeInt(map.size)
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val bytes = e.getKey.getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
        out.writeLong(e.getValue()(0))
      }
      out.flush()
      bos.toByteArray
    }
  }

  object MGSketch {
    def fromBytes(capacity: Int, bytes: Array[Byte]): MGSketch = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val s = new MGSketch(capacity)
      s.err = in.readLong()
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val tb = new Array[Byte](len)
        in.readFully(tb)
        s.map.put(UTF8String.fromBytes(tb), Array(in.readLong()))
        i += 1
      }
      s
    }
  }
}
