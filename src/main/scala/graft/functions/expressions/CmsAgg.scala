package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextAnalysis

/** Shared hash for the Count-Min sketch: row `i`'s bucket for value `v` is
  * `md5_number_lower(i || ':' || v) mod 2⁶³ mod width` — the [[KmvAgg]]
  * hash convention with a row-index salt, so every cell of the sketch is
  * SQL-oracle-expressible. Static object so whole-stage codegen calls
  * straight into bytecode. */
object CmsKernel {
  def bucket(v: UTF8String, row: Int, width: Int): Int =
    ((TextAnalysis.md5Low64(row.toString + ":" + v.toString) & Long.MaxValue) % width).toInt
}

/** `graft_cms_bucket(value, row, width) → int` — the probe-side twin of the
  * aggregate's update hash: estimation reads cell `row·width + bucket` of
  * the materialized grid, and this expression is what guarantees the read
  * uses the exact hash the build used. */
case class CmsBucket(child: Expression, row: Int, width: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(row >= 0, s"graft_cms_bucket row must be >= 0, got $row")
  require(width > 0, s"graft_cms_bucket width must be > 0, got $width")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_cms_bucket"

  override def nullSafeEval(input: Any): Any =
    CmsKernel.bucket(input.asInstanceOf[UTF8String], row, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CmsKernel.bucket($c, $row, $width)")

  override protected def withNewChildInternal(newChild: Expression): CmsBucket =
    copy(child = newChild)
}

/** `graft_cms(value, weight, depth, width)` — Count-Min frequency sketch
  * (Cormode & Muthukrishnan, J. Algorithms '05) as a first-class Catalyst
  * AGGREGATE: a `depth × width` grid of counters; each update adds `weight`
  * to one counter per row (bucket = salted hash of `value`), and a key's
  * estimated count is the MIN over its `depth` cells — always ≥ the true
  * count, over by at most ε·N with probability 1−δ (ε = e/width,
  * δ = e^−depth). The missing member of the engine's sketch suite: KMV
  * answers "how many distinct", Misra–Gries "which keys are frequent",
  * the histogram sketch "what are the quantiles" — CMS answers "how often
  * does THIS key occur" for any key, from fixed state.
  *
  * The scale contract mirrors [[KmvAgg]]: `merge` (elementwise counter sum)
  * is associative and commutative, so Catalyst plans partial_cms →
  * shuffle-by-group → final_cms and the shuffle carries one fixed
  * `depth·width`-long grid per group per map partition — where an exact
  * per-key count shuffles every distinct key. The same property makes it
  * legal as STREAMING state, and makes weighted updates over pre-aggregated
  * `(key, count)` rows produce the bit-identical grid raw weight-1 updates
  * produce — the batch form exploits the former, the streaming form feeds
  * the latter, and one oracle serves both.
  *
  * Differential gate: buckets are [[CmsKernel]]'s md5-parity hash and
  * counters are exact long sums, so the APPROXIMATE sketch hash-matches
  * the SQL oracle that replays the grid as a GROUP BY — the dedup_minhash
  * philosophy: approximate in cost, exact in check. */
case class CmsAgg(
    left: Expression,
    right: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with BinaryLike[Expression] with ImplicitCastInputTypes {

  require(depth >= 1 && depth <= 16, s"graft_cms needs 1 <= depth <= 16, got $depth")
  require(width >= 2, s"graft_cms needs width >= 2, got $width")

  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    val wt = right.eval(input)
    if (v != null && wt != null) {
      val s = v.asInstanceOf[UTF8String]
      val w = wt.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        buf(i * width + CmsKernel.bucket(s, i, width)) += w
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsAgg =
    copy(left = newLeft, right = newRight)
}
