package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled SimHash kernel: tokenize (the engine's `[^\p{L}]+`-split,
  * lowercase, drop-empties tokenizer) and fold every token's 64-bit MD5
  * lower half ([[graft.operators.TextAnalysis.md5Low64]] == DuckDB
  * `md5_number_lower`, which keeps the sketch SQL-oracle-expressible) into
  * per-bit majority votes, all in one compiled pass per document. Static
  * object so whole-stage codegen calls straight into bytecode — same
  * pattern as [[ShingleKernel]].
  */
object SimHashKernel {
  private val splitter = java.util.regex.Pattern.compile("[^\\p{L}]+")

  /** 64-bit SimHash of the document's token MULTISET (repeated tokens vote
    * repeatedly) — bit-identical to `Dedup.simhash64(tokenizeScala(text))`,
    * the library form the tests pin. */
  def simhash64(text: UTF8String): Long = {
    val ws = splitter.split(text.toString.toLowerCase(java.util.Locale.ROOT))
    val votes = new Array[Int](64)
    var t = 0
    while (t < ws.length) {
      val w = ws(t)
      if (!w.isEmpty) {
        val h = graft.operators.TextAnalysis.md5Low64(w)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }
}

/** `graft_simhash(text)`: 64-bit SimHash signature of `text` as `bigint`.
  * Replaces the typed `Dataset.map` formulation, which deserialized every
  * row to `(Long, String)` and ran interpreted Scala outside
  * WholeStageCodegen (`DeserializeToObject` in the plan); this form keeps
  * the signature computation fused into the scan. */
case class SimHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SimHashKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}
