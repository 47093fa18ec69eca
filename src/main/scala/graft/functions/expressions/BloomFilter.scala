package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextAnalysis

/** Shared Bloom-filter kernel: the bit addressing used by BOTH the build
  * aggregate ([[BloomAgg]]) and the membership probe ([[BloomMightContain]])
  * — one definition, so build and probe can never disagree on a bit.
  *
  * Probes use Kirsch–Mitzenmacher double hashing (their Lemma 2: two base
  * hashes suffice for asymptotically optimal FPR): the repo's canonical
  * deterministic 64-bit content hash [[TextAnalysis.md5Low64]] is split
  * into two 32-bit halves, `h2` forced odd so successive probes never
  * cycle within a power-of-two bit space. Bits address a plain byte array
  * (bit `i` = byte `i >>> 3`, mask `1 << (i & 7)`), which is exactly the
  * serialized form — the probe side reads the aggregate's output bytes
  * with zero deserialization.
  */
object BloomFns {
  /** Set the probe bits of `value` in `bits` (mutates). */
  def add(bits: Array[Byte], value: String, numHashes: Int): Unit = {
    val hv = TextAnalysis.md5Low64(value)
    val h1 = hv & 0xFFFFFFFFL
    val h2 = ((hv >>> 32) | 1L) & 0xFFFFFFFFL
    val nBits = bits.length.toLong << 3
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i.toLong * h2) % nBits).toInt
      bits(bit >>> 3) = (bits(bit >>> 3) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  /** True iff every probe bit of `value` is set — no false negatives ever;
    * false positives at the configured rate. Static and allocation-free so
    * whole-stage codegen can call it straight off the scan. */
  def mightContain(bits: Array[Byte], value: UTF8String, numHashes: Int): Boolean = {
    val hv = TextAnalysis.md5Low64(value.toString)
    val h1 = hv & 0xFFFFFFFFL
    val h2 = ((hv >>> 32) | 1L) & 0xFFFFFFFFL
    val nBits = bits.length.toLong << 3
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i.toLong * h2) % nBits).toInt
      if ((bits(bit >>> 3) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `graft_bloom(value, numBits, numHashes)` — Bloom-filter build as a
  * first-class Catalyst AGGREGATE returning the filter as `binary`.
  *
  * Scale contract (the [[MinHashAgg]]/[[KmvAgg]] discipline): `merge` is a
  * bytewise OR — associative and commutative — so Catalyst plans
  * partial_bloom → shuffle → final_bloom and the shuffle carries one
  * fixed-size byte buffer per map partition, never the key set itself. At
  * the default 2²⁰ bits the whole filter is 128 KiB: small enough to
  * collect to the driver and re-broadcast as a LITERAL scan predicate
  * (see `Relational.bloomJoin`), the explicit form of Spark's own
  * runtime-filter injection. */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] with ExpectsInputTypes {

  require(numBits >= 8 && (numBits & 7) == 0,
    s"graft_bloom needs a byte-aligned bit count >= 8, got $numBits")
  require(numHashes >= 1, s"graft_bloom needs numHashes >= 1, got $numHashes")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits >>> 3)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomFns.add(buf, v.asInstanceOf[UTF8String].toString, numHashes)
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `graft_bloom_might_contain(filter, value, numHashes)` — membership probe
  * against a built filter, compiled into whole-stage codegen so it runs
  * INSIDE the scan stage: with the filter as a literal, Catalyst keeps the
  * predicate in the scan's `Filter` and the fact rows that cannot join die
  * before the shuffle ever sees them (semi-join reduction). `numHashes`
  * must match the build — both sides address bits through [[BloomFns]]. */
case class BloomMightContain(filter: Expression, value: Expression, numHashes: Int)
    extends Expression with BinaryLike[Expression] with ExpectsInputTypes {

  override def left: Expression = filter
  override def right: Expression = value
  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_might_contain"

  override def eval(input: InternalRow): Any = {
    val f = filter.eval(input)
    val v = value.eval(input)
    if (f == null || v == null) false
    else BloomFns.mightContain(f.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String], numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fGen = filter.genCode(ctx)
    val vGen = value.genCode(ctx)
    // Static forwarder, NOT `BloomFns.MODULE$`: Janino rejects MODULE$ on
    // the forwarder class, and the silent interpreted fallback would tax
    // every fact row of the 100 TB scan this predicate exists to prune.
    // CodegenCompileSpec now makes that fallback a hard test failure.
    val fns = BloomFns.getClass.getName.stripSuffix("$")
    ev.copy(code = code"""
      ${fGen.code}
      ${vGen.code}
      boolean ${ev.value} = false;
      if (!${fGen.isNull} && !${vGen.isNull}) {
        ${ev.value} = $fns.mightContain(${fGen.value}, ${vGen.value}, $numHashes);
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(filter = newLeft, value = newRight)
}
