package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NumericFunctions.duckRound
import graft.functions.TextFunctions
import graft.sources.Tables

/** Lexical relevance ranking over the document corpus: TF-IDF term
  * weighting and BM25 retrieval — the scoring layer between the inverted
  * index (CoreQueries.ii) and a search/training-data pipeline.
  *
  * Scale design: both operators are built from two aggregates over the
  * exploded (doc, term) postings — per-doc term frequencies and per-term
  * document frequencies — plus a broadcast join of the tiny corpus-level
  * statistics row. The postings explode is the same map-side shape as
  * word count; nothing here materializes a matrix. At 100 TB the df/N
  * statistics become a periodically refreshed broadcast table rather than
  * a same-query subaggregate (two scans of the corpus is the one-off cost
  * here; a production index would persist `tf` as the postings list).
  *
  * Float discipline (differential gate): scores use `ln` on both engines
  * with an IDENTICAL operation tree, so both evaluate the same IEEE
  * doubles; sums across query terms are written as fixed-order explicit
  * additions (never a float SUM over an unordered group), and outputs are
  * rounded at the edge.
  */
object Ranking {

  /** (doc_id, word, tf) — per-document term frequencies of the letter-run
    * tokenizer, one shuffle on (doc_id, word). */
  private def termFreqs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextFunctions.tokenize(col("text"))).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))

  /** Top-k TF-IDF terms per document: tf × ln(N / df), ranked per doc.
    * df comes from re-aggregating the tf frame (rows are already distinct
    * per (doc, word), so `count` == document frequency); the vocabulary-
    * sized df table broadcasts to the postings join. */
  def tfidfTerms(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val tf = termFreqs(spark, sfDir)
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("word").asc)
    tf.join(broadcast(df), "word")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") * log(col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("word"), col("tf"),
              duckRound(col("tfidf"), 6).as("tfidf"))
      .orderBy("doc_id", "rnk")
  }

  // BM25 parameters: k1 = 1.2, b = 0.75 (the standard defaults), written
  // inline as literals below so both engines parse the identical decimals.
  private val QueryTerms = Seq("stream", "join", "window")

  /** BM25 top-k retrieval for a fixed conjunctive-ish query. Per-term
    * contributions land in one column each (pivoted with `max(when)`), so
    * the final score is a FIXED-ORDER sum — float addition order never
    * depends on partitioning. Doc length normalization uses corpus avgdl
    * from the same broadcast statistics row (exact: integer-valued double
    * sums are order-independent below 2^53). */
  def bm25Search(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val dl = docs.select(col("doc_id"),
      size(TextFunctions.tokenize(col("text"))).cast("bigint").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
                       avg(col("dl").cast("double")).as("avgdl"))
    val tf = termFreqs(spark, sfDir)
      .filter(col("word").isin(QueryTerms: _*))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    // idf and the tf-saturation quotient, written once; the same Column
    // tree instantiates per query term so the op order is identical.
    val scored = tf.join(broadcast(df), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
              (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        // constants written as plain decimal literals (2.2, 1.2, 0.25,
        // 0.75) in BOTH engines — no compile-time folding whose rounding
        // the SQL oracle can't reproduce
        col("idf") * ((col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") +
            lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl")))))
    val perDoc = scored.groupBy("doc_id")
      .pivot("word", QueryTerms)
      .agg(max(col("contrib")))
      .na.fill(0.0)
    val score = QueryTerms.map(t => col(s"`$t`")).reduceLeft(_ + _)
    val ranked = perDoc
      .withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    ranked
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id").asc)).cast("bigint"))
      .select(col("rnk"), col("doc_id"), duckRound(col("score"), 4).as("score"))
      .orderBy("rnk")
  }
}
