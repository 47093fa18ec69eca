package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[NfcNormalize]] — Unicode NFC via the JDK's
  * `java.text.Normalizer` (both it and DuckDB's `nfc_normalize` implement
  * the same Unicode normalization algorithm, so the oracle replays this
  * expression exactly). The ASCII fast path skips the Normalizer call
  * entirely: NFC is the identity on ASCII, and for a crawl corpus the
  * overwhelmingly common case must not pay a quick-check walk over a
  * copied java.lang.String. Static object so whole-stage codegen calls
  * straight into bytecode ([[Hash64Kernel]] pattern). */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}

/** `graft_nfc(s)`: Unicode NFC normalization as a codegen'd `string →
  * string` expression — the canonicalization pass a text pipeline runs
  * BEFORE any content hashing (decomposed `e` + U+0301 and precomposed
  * `é` are byte-distinct but canonically equal: exact dedup, shingle
  * dedup and fingerprints all silently miss such pairs unless every
  * document is normalized to one form first). Spark ships no
  * normalization builtin; a Scala UDF would box every row — this is the
  * (b)-tier custom-Expression form the project prefers. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
