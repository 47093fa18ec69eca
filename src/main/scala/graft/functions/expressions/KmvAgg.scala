package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextAnalysis

/** `graft_kmv(value, k)` — K-Minimum-Values distinct-count sketch as a
  * first-class Catalyst AGGREGATE (Bar-Yossef et al., RANDOM'02): keep the
  * `k` smallest distinct hash values seen; if fewer than `k` were ever
  * held, that count IS the exact distinct count, otherwise the k-th
  * smallest hash `h_k` estimates the cardinality as `(k−1)·2⁶³ / h_k`
  * (hashes uniform on [0, 2⁶³)). Standard error ≈ 1/√(k−2) — ~13% at the
  * default k=64 for 520 bytes of state.
  *
  * The scale contract mirrors [[MinHashAgg]]: `merge` (union, re-trim to
  * the k smallest) is associative and commutative, so Catalyst plans
  * partial_kmv → shuffle-by-group → final_kmv and the shuffle carries one
  * ≤k-long buffer per group per map partition — where `count(DISTINCT x)`
  * shuffles every distinct value. The same property makes it legal in
  * streaming aggregations.
  *
  * Differential gate: the hash is [[TextAnalysis.md5Low64]] masked to 63
  * bits — DuckDB's `md5_number_lower(v) % 2⁶³` exactly — and the estimate
  * arithmetic is one exact integer-product double division, so this
  * APPROXIMATE sketch hash-matches its SQL oracle bit for bit (the
  * dedup_minhash philosophy: approximate in cost, exact in check). */
case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k >= 2, s"graft_kmv needs k >= 2, got $k")

  // registered for arbitrary SQL use: coerce (or reject) non-string input
  // at ANALYSIS time instead of a ClassCastException at execution — the
  // update path blindly reads the child as UTF8String
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], hv: Long): Unit = {
    buf.add(hv)
    if (buf.size > k) buf.pollLast() // keep the k smallest
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null)
      add(buf, TextAnalysis.md5Low64(v.asInstanceOf[UTF8String].toString) & Long.MaxValue)
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * 9223372036854775808.0 / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

/** `graft_kmv_state(value, k)` / `graft_kmv_merge(hash, k)` — the
  * [[KmvAgg]] sketch with its STATE as the result (the sorted `≤k`
  * smallest 63-bit hashes, ascending `array<bigint>`), which is what makes
  * KMV a MERGEABLE SUMMARY (Agarwal et al., PODS'12): a per-group sketch
  * persisted as data can later roll up to any coarser grouping without
  * touching the raw corpus again, because the k smallest of a union are
  * found among the union of the per-set k smallest. `graft_kmv_state`
  * hashes raw string values (first level, over the corpus);
  * `graft_kmv_merge` consumes ALREADY-HASHED longs (rollup level, over
  * exploded persisted sketches) — two names so analysis-time input typing
  * stays strict instead of silently re-hashing a hash.
  *
  * Scale contract: identical to [[KmvAgg]] — partial-agg'd ≤k-long
  * buffers in every shuffle; the rollup level's input is
  * |groups|·k rows of sketch state, never corpus rows. */
case class KmvStateAgg(
    child: Expression,
    k: Int,
    hashed: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k >= 2, s"graft_kmv_state needs k >= 2, got $k")

  override def inputTypes: Seq[DataType] =
    Seq(if (hashed) LongType else StringType)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], hv: Long): Unit = {
    buf.add(hv)
    if (buf.size > k) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hv =
        if (hashed) v.asInstanceOf[Long]
        else TextAnalysis.md5Low64(v.asInstanceOf[UTF8String].toString) & Long.MaxValue
      add(buf, hv)
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = if (hashed) "graft_kmv_merge" else "graft_kmv_state"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvStateAgg =
    copy(child = newChild)
}
