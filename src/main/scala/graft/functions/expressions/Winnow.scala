package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WINNOWING document fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): over the Karp–Rabin chunk-hash chain
  * (shared arithmetic with [[ChunkKernel]], so DuckDB replays it exactly),
  * slide a window of `w` consecutive chunk hashes and select the minimum of
  * each window, rightmost position on ties. The selected (position, hash)
  * set is the document's fingerprint sample: expected density 2/(w+1) of
  * the full chunk chain, with the GUARANTEE that any shared passage of at
  * least `window + w − 1` tokens contributes at least one selected
  * fingerprint to both documents — sampling with a coverage proof, which
  * random sampling of chunk hashes cannot give.
  *
  * Why it matters at 100 TB: `common_passages`-style mining indexes EVERY
  * overlapping chunk hash — O(tokens) index rows per document. Winnowing
  * cuts the indexed rows by ~(w+1)/2 (4× at w = 7) while preserving
  * detection of every passage above the guarantee length, which is exactly
  * the trade MOSS ships for plagiarism detection at registry scale.
  *
  * Kernel detail: with the rightmost-on-ties rule the selected position is
  * non-decreasing as the window slides (the previous pick stays minimal
  * until it either falls out of the window or a new ≤ value enters to its
  * right — both move the pick right), so de-duplicating against only the
  * LAST selected position yields the distinct selected set in order. */
object WinnowKernel {

  /** Ordered distinct selected fingerprints as (pos, fp) rows; `pos` is the
    * 1-based chunk index, matching DuckDB list indexing in the oracle.
    * Empty when fewer than `w` chunks exist (no winnow window fits). */
  def winnow(text: UTF8String, window: Int, w: Int): ArrayData = {
    import ChunkKernel.{Base, Mod, tokenHash}
    val ws = graft.functions.TextFunctions.tokenizeScala(text.toString)
    if (ws.length < window + w - 1) return new GenericArrayData(Array.empty[Any])
    val hs = ws.map(tokenHash)
    val m = hs.length - window + 1
    val ch = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < window) { h = (h * Base + hs(i + j)) % Mod; j += 1 }
      ch(i) = h
      i += 1
    }
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastPos = -1
    i = 0
    val lastWin = m - w
    while (i <= lastWin) {
      var p = i
      var mn = ch(i)
      var j = i + 1
      while (j < i + w) {
        if (ch(j) <= mn) { mn = ch(j); p = j } // <= keeps the RIGHTMOST min
        j += 1
      }
      if (p != lastPos) {
        buf += new GenericInternalRow(Array[Any]((p + 1).toLong, mn))
        lastPos = p
      }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Winnowed-set summary struct — the scan-side one-pass form (no array
    * materialization in the plan, no projection-collapse re-evaluation):
    * (n_fp, fp_min, fp_max, fp_sum, pos_sum) over the selected set. */
  def winnowStats(text: UTF8String, window: Int, w: Int): InternalRow = {
    val sel = winnow(text, window, w)
    val n = sel.numElements()
    if (n == 0) return new GenericInternalRow(Array[Any](0L, null, null, null, null))
    var min = Long.MaxValue; var max = Long.MinValue; var sum = 0L; var posSum = 0L
    var i = 0
    while (i < n) {
      val r = sel.getStruct(i, 2)
      val fp = r.getLong(1)
      if (fp < min) min = fp
      if (fp > max) max = fp
      sum += fp
      posSum += r.getLong(0)
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, min, max, sum, posSum))
  }
}

/** `graft_winnow(text, window, w)` → array<struct<pos:long, fp:long>> of the
  * winnowed fingerprint selection — the exploded layout cross-document
  * match mining joins on. */
case class Winnow(child: Expression, window: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.winnow(input.asInstanceOf[UTF8String], window, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.WinnowKernel.winnow($c, $window, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** `graft_winnowstats(text, window, w)` → struct(n_fp, fp_min, fp_max,
  * fp_sum, pos_sum): the per-document summary in one codegen'd pass. */
case class WinnowStats(child: Expression, window: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", LongType, nullable = false),
    StructField("fp_min", LongType),
    StructField("fp_max", LongType),
    StructField("fp_sum", LongType),
    StructField("pos_sum", LongType)))
  override def prettyName: String = "graft_winnowstats"

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.winnowStats(input.asInstanceOf[UTF8String], window, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.WinnowKernel.winnowStats($c, $window, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowStats =
    copy(child = newChild)
}
