package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Feature-hashing document embedder (the "hashing trick", Weinberger et
  * al. 2009): each token's 32-bit hash picks a dimension (`h mod d`) and a
  * sign (`(h div d) mod 2` — the sign bit is what keeps the estimator
  * unbiased under collisions), and the document's embedding is the signed
  * token-count vector. One O(tokens) pass per document, fixed d-long
  * integer state, zero shuffle — the deterministic text→vector bridge that
  * lets every vector operator (clustering, ANN, semdedup) run on a corpus
  * that ships no precomputed embeddings. Integer-exact by construction:
  * the token hash is the same `md5_number_lower mod 2³²` chain the chunk
  * fingerprints pin, so the whole embedding replays in DuckDB SQL.
  */
object HashEmbedKernel {
  def hashEmbed(text: UTF8String, dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val ws = graft.functions.TextFunctions.tokenizeScala(text.toString)
    val acc = new Array[Long](dim)
    var i = 0
    while (i < ws.length) {
      val h = ChunkKernel.tokenHash(ws(i))
      val d = (h % dim).toInt
      acc(d) += (if ((h / dim) % 2 == 0L) 1L else -1L)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(acc)
  }
}

/** `graft_hash_embed(text, dim)` → array<long>: signed hashed
  * bag-of-words projection of the tokenized text into `dim` dimensions. */
case class HashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0, "graft_hash_embed: dim must be positive")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash_embed"

  override def nullSafeEval(input: Any): Any =
    HashEmbedKernel.hashEmbed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HashEmbedKernel.hashEmbed($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}
