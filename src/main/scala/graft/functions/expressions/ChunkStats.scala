package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextAnalysis

/** Rolling-hash chunk fingerprint kernel (Karp–Rabin over the token stream,
  * the chunk-level-dedup fingerprint family): hash every `window`-token
  * chunk with h = fold((a,b) → (a·B + b) mod 2³²) over per-token hashes,
  * and summarize the chunk-hash multiset as (count, min, max, sum).
  *
  * Arithmetic is pinned to 32-bit values in 64-bit signed space and the
  * token hash to `md5_number_lower mod 2³²`, so the whole fingerprint is
  * exactly expressible in DuckDB (`list_reduce` over `md5_number_lower`) —
  * the summaries are differentially checked, not just row-counted.
  */
object ChunkKernel {
  final val Base = 1000003L
  final val Mod = 4294967296L // 2^32

  def tokenHash(w: String): Long = {
    val h = TextAnalysis.md5Low64(w) % Mod
    if (h < 0) h + Mod else h
  }

  /** (n_chunks, min, max, sum) of the rolling chunk hashes; nulls when the
    * document has fewer than `window` tokens. */
  def chunkStats(text: UTF8String, window: Int): InternalRow = {
    val ws = graft.functions.TextFunctions.tokenizeScala(text.toString)
    if (ws.length < window) return new GenericInternalRow(Array[Any](0L, null, null, null))
    val hs = ws.map(tokenHash)
    var n = 0L; var min = Long.MaxValue; var max = Long.MinValue; var sum = 0L
    var i = 0
    val last = hs.length - window
    while (i <= last) {
      var h = 0L
      var j = 0
      while (j < window) { h = (h * Base + hs(i + j)) % Mod; j += 1 }
      if (h < min) min = h
      if (h > max) max = h
      sum += h
      n += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](n, min, max, sum))
  }
}

object ChunkKernel2 {
  /** The ordered chunk-hash SERIES (one hash per window position) — the
    * per-chunk form [[ChunkKernel.chunkStats]] summarizes; shared
    * arithmetic, so the two are oracle-compatible by construction. */
  def chunkHashes(text: UTF8String, window: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    import ChunkKernel.{Base, Mod, tokenHash}
    val ws = graft.functions.TextFunctions.tokenizeScala(text.toString)
    if (ws.length < window)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.emptyLongArray)
    val hs = ws.map(tokenHash)
    val out = new Array[Long](hs.length - window + 1)
    var i = 0
    while (i < out.length) {
      var h = 0L
      var j = 0
      while (j < window) { h = (h * Base + hs(i + j)) % Mod; j += 1 }
      out(i) = h
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** `graft_chunks(text, window)` → array<long> of every `window`-token
  * chunk's rolling hash, in order — the per-chunk layout cross-document
  * passage mining groups on. */
case class ChunkHashes(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_chunks"

  override def nullSafeEval(input: Any): Any =
    ChunkKernel2.chunkHashes(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ChunkKernel2.chunkHashes($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): ChunkHashes =
    copy(child = newChild)
}

/** `graft_chunkstats(text, window)` → struct(n_chunks, fp_min, fp_max,
  * fp_sum): whole-stage-codegen call into [[ChunkKernel]]. */
case class ChunkStats(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chunks", LongType, nullable = false),
    StructField("fp_min", LongType),
    StructField("fp_max", LongType),
    StructField("fp_sum", LongType)))
  override def prettyName: String = "graft_chunkstats"

  override def nullSafeEval(input: Any): Any =
    ChunkKernel.chunkStats(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ChunkKernel.chunkStats($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): ChunkStats =
    copy(child = newChild)
}
