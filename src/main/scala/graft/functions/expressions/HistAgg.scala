package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_hist_state(bin, bins)` / `graft_hist_merge(state, bins)` — the
  * equi-width HISTOGRAM counterpart of [[KmvStateAgg]]'s mergeable-summary
  * pair (Agarwal et al., "Mergeable Summaries", PODS'12): the sketch STATE
  * is a dense `array<bigint>` of `bins` per-bin counts, and because
  * per-bin counts add, states over disjoint row sets merge by ELEMENT-WISE
  * ADDITION into exactly the state a direct pass over the union would
  * build — bit-for-bit, since everything is integer. That is what lets a
  * pipeline persist one ≤`bins`-long histogram per (source, day, …) cell
  * and later answer ANY coarser quantile rollup from the stored states
  * alone, never rescanning the corpus (the quantile twin of the KMV
  * distinct-count cube; reference scope: the reference has only global
  * sorted output, `/root/reference/seq/sequential.go:44-46`).
  *
  * `graft_hist_state` consumes BIN IDS (long, precomputed from the shared
  * global bounds — the grid must be common across cells or states are not
  * mergeable); `graft_hist_merge` consumes persisted state arrays. Two
  * names so analysis-time typing stays strict (the kmv_state/kmv_merge
  * discipline — a state array silently re-binned as an id would corrupt,
  * not error). Out-of-range bins throw: a bin id outside the grid means
  * the caller's bounds drifted from the persisted grid, which must
  * surface, not wrap.
  *
  * Scale contract: `merge` is associative/commutative, so Catalyst plans
  * partial → shuffle-by-group → final and every shuffle carries one
  * fixed-size `bins`-long buffer per group per map partition, regardless
  * of row mass. */
case class HistAgg(
    child: Expression,
    bins: Int,
    merging: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(bins >= 1 && bins <= 65536,
    s"graft_hist_state needs 1 <= bins <= 65536, got $bins")

  override def inputTypes: Seq[DataType] =
    Seq(if (merging) ArrayType(LongType) else LongType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      if (merging) {
        val arr = v.asInstanceOf[ArrayData]
        require(arr.numElements() == bins,
          s"graft_hist_merge: state has ${arr.numElements()} bins, grid expects $bins")
        var i = 0
        while (i < bins) { buf(i) += arr.getLong(i); i += 1 }
      } else {
        val bin = v.asInstanceOf[Long]
        require(bin >= 0 && bin < bins,
          s"graft_hist_state: bin $bin outside [0, $bins) — bounds drifted from the grid")
        buf(bin.toInt) += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { b1(i) += b2(i); i += 1 }
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
  override def prettyName: String = if (merging) "graft_hist_merge" else "graft_hist_state"

  override def withNewMutableAggBufferOffset(newOffset: Int): HistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistAgg =
    copy(child = newChild)
}
