package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{Dedup, TextAnalysis}

/** `graft_minhash(shingle)` — MinHash signature as a first-class Catalyst
  * AGGREGATE over a shingle column: `update` folds one shingle into the
  * running signature, `merge` is elementwise min.
  *
  * The merge being associative+commutative is the point: Catalyst plans
  * partial_minhash → shuffle-by-group → final_minhash, so the shuffle
  * carries one `numHashes`-long signature per group per map partition
  * instead of the group's shingle set — the map-side combine the reference
  * engine fundamentally lacked (SURVEY.md §4.1), applied to sketching. The
  * same property makes it usable in streaming aggregations.
  *
  * Hash family: identical parameters to [[Dedup.minhashParams]] (fixed
  * seed), so signatures equal [[Dedup.minhashSignature]]'s bit for bit.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  @transient private lazy val params = Dedup.minhashParams(numHashes)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      Dedup.minhashUpdate(buf, v.asInstanceOf[UTF8String].toString, params)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

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
  override def prettyName: String = "graft_minhash"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

/** Compiled kernel for the per-ROW signature form: the whole shingle array
  * of one document folded in a single call. Hash-family parameters are the
  * same fixed-seed [[Dedup.minhashParams]] as the aggregate, cached per
  * signature width, so `graft_minhash_arr(shingles, k)` ==
  * `graft_minhash(shingle, k)` aggregated over the exploded array. */
object MinHashRowKernel {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long)]]()
  def signature(arr: ArrayData, numHashes: Int): ArrayData = {
    val params = cache.computeIfAbsent(numHashes, k => Dedup.minhashParams(k))
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      // null elements are skipped, mirroring the aggregate's null handling
      val s = arr.getUTF8String(i)
      if (s != null) Dedup.minhashUpdate(sig, s.toString, params)
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** `graft_minhash_arr(shingle_array, numHashes)` — MinHash signature as a
  * per-row SCALAR over a document's shingle array. The streaming-ingest
  * form: a stream computes each arriving document's signature with zero
  * state and zero shuffle (the aggregate form would be a stateful streaming
  * aggregation, which cannot precede the pipeline's one allowed stateful
  * dedup operator). */
case class MinHashArr(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_arr"

  override def nullSafeEval(input: Any): Any =
    MinHashRowKernel.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinHashRowKernel.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashArr =
    copy(child = newChild)
}

/** `graft_bands(signature, numBands, rowsPerBand)` — LSH band hashes of a
  * MinHash signature: band b hashes signature rows [b·r, (b+1)·r). Compiled
  * kernel call from codegen (Java long wrap-around arithmetic — an
  * expression-tree formulation would trip ANSI overflow checks). */
object BandKernel {
  def bandHashes(sig: ArrayData, numBands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      var h = 1125899906842597L
      var r = 0
      while (r < rowsPerBand) { h = h * 31 + sig.getLong(b * rowsPerBand + r); r += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class BandHashes(child: Expression, numBands: Int, rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bands"

  override def nullSafeEval(input: Any): Any =
    BandKernel.bandHashes(input.asInstanceOf[ArrayData], numBands, rowsPerBand)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.BandKernel.bandHashes($c, $numBands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}
