package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[Hash64]] — the repo-wide deterministic 64-bit
  * content hash ([[graft.operators.TextAnalysis.md5Low64]] masked
  * non-negative), exposed at column level. Equals DuckDB
  * `md5_number_lower(s) % 9223372036854775808`, the convention every
  * hash-replayable oracle in this repo already uses (KMV, CMS, bloom,
  * SimHash token hash). Static object so whole-stage codegen calls
  * straight into bytecode ([[SimHashKernel]] pattern). */
object Hash64Kernel {
  def hash64(s: UTF8String): Long =
    graft.operators.TextAnalysis.md5Low64(s.toString) & Long.MaxValue
}

/** `graft_hash64(s)`: non-negative deterministic 64-bit hash of a string
  * as `bigint` — the column form of the engine/oracle shared hash, for
  * operators that need replayable pseudo-randomness (seeded noise,
  * deterministic sampling) without a UDF. */
case class Hash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"

  override def nullSafeEval(input: Any): Any =
    Hash64Kernel.hash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Hash64Kernel.hash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash64 =
    copy(child = newChild)
}
