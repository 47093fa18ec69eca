package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled shingling kernel: tokenize (the engine's `[^\p{L}]+`-split,
  * lowercase, drop-empties tokenizer) and emit the DISTINCT space-joined
  * word n-grams of a document in one pass. Kept in a static object so the
  * generated whole-stage code calls straight into compiled bytecode — the
  * pattern for hot scalar kernels that are awkward as expression trees.
  */
object ShingleKernel {
  private val splitter = java.util.regex.Pattern.compile("[^\\p{L}]+")

  /** Distinct n-gram shingles, first-occurrence order. */
  def distinctShingles(text: UTF8String, n: Int): ArrayData = {
    val ws = splitter.split(text.toString.toLowerCase(java.util.Locale.ROOT))
    val out = new java.util.LinkedHashSet[String]
    // splitter keeps a leading empty token when text starts with a delimiter
    var start = 0
    while (start < ws.length && ws(start).isEmpty) start += 1
    val m = ws.length - start
    if (m >= n) {
      var i = start
      val last = ws.length - n
      while (i <= last) {
        val sb = new java.lang.StringBuilder(ws(i))
        var j = 1
        while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}

/** `graft_shingles(text, n)`: distinct word n-grams of `text` as
  * `array<string>`. Codegen emits a direct static call into
  * [[ShingleKernel]], so the operator stays inside WholeStageCodegen with no
  * interpreted expression-tree walk (the HOF formulation this replaces was
  * re-evaluating the tokenizer once per shingle). */
case class ShingleArray(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.distinctShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ShingleKernel.distinctShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}
