package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextAnalysis

/** `graft_hll_state(value, p)` / `graft_hll_merge(state, p)` — HyperLogLog
  * registers as the third mergeable-summary pair next to [[KmvStateAgg]]
  * (distinct) and [[HistAgg]] (quantile): the industry-standard
  * register sketch (Flajolet et al., AofA'07) whose state is a dense
  * `array<bigint>` of `m = 2^p` registers, each the MAX leading-zero rank
  * seen in its substream. Register MAX is associative, commutative and
  * idempotent, so states over ARBITRARY (even overlapping — unlike the
  * additive histogram) row sets merge by element-wise max into exactly the
  * state a direct pass over the union would build, bit for bit. KMV at
  * k=64 costs 520 bytes for ~13% error; HLL at p=8 costs the same 256
  * registers for ~6.5% (1.04/√m) — the space/error point every production
  * distinct-count pipeline actually ships.
  *
  * Differential gate (the [[KmvAgg]] philosophy — approximate in cost,
  * exact in check): the item hash is [[TextAnalysis.md5Low64]] masked to
  * 63 bits = DuckDB's `md5_number_lower(v) % 2⁶³`; bucket = `h % m`, and
  * the rank is INTEGER bit-length arithmetic on `w = h // m`
  * (`rho = (63 − p) − bitlen(w) + 1`, `bitlen` = `length(bin(w))` — the
  * perplexity_score bits discipline), so the whole register table
  * replays in SQL integer-exactly; only the final estimate touches
  * doubles, through one shared formula rounded at the output edge.
  *
  * `graft_hll_state` consumes raw string values; `graft_hll_merge`
  * consumes persisted state arrays — two names so analysis-time typing
  * stays strict (the kmv_state/kmv_merge discipline). A merge input of
  * the wrong width throws: a state built at another `p` is a different
  * sketch, and silently maxing it in would corrupt, not error.
  *
  * Scale contract: partial → shuffle-by-group → final with one fixed
  * `m`-long buffer per group per map partition regardless of row mass;
  * max-merge also makes it legal in streaming aggregations. */
case class HllAgg(
    child: Expression,
    p: Int,
    merging: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(p >= 4 && p <= 16, s"graft_hll_state needs 4 <= p <= 16, got $p")

  private val m = 1 << p

  override def inputTypes: Seq[DataType] =
    Seq(if (merging) ArrayType(LongType) else StringType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      if (merging) {
        val arr = v.asInstanceOf[ArrayData]
        require(arr.numElements() == m,
          s"graft_hll_merge: state has ${arr.numElements()} registers, p=$p expects $m")
        var i = 0
        while (i < m) { buf(i) = math.max(buf(i), arr.getLong(i)); i += 1 }
      } else {
        val h = TextAnalysis.md5Low64(v.asInstanceOf[UTF8String].toString) & Long.MaxValue
        val bucket = (h % m).toInt
        val w = h / m // 63 - p significant bits
        // rho = (63 - p) - bitlen(w) + 1; bitlen(0) treated as 0 so an
        // all-zero substream value gets the max rank, as the paper defines
        val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(w)
        val rho = (63 - p) - bitlen + 1
        if (rho > buf(bucket)) buf(bucket) = rho.toLong
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = if (merging) "graft_hll_merge" else "graft_hll_state"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}
