package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Tables

/** BPE tokenizer induction over the corpus — the vocabulary-training step
  * of an LLM data pipeline: learn the `merges` highest-count byte-pair
  * merge rules from corpus word frequencies (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016).
  *
  * Scale shape: the DISTRIBUTED work is the corpus word count (the same
  * map-side-combined aggregate as `wc`); every merge round then operates
  * on the VOCABULARY (words × current symbol splits), which is orders of
  * magnitude smaller than the corpus and shrinks no further — so rounds
  * cost one vocabulary-sized aggregate each, never a corpus re-scan. The
  * per-round argmax is a 1-row frame crossJoined back (broadcast), keeping
  * the loop fully declarative — no driver-side collect. Lineage is
  * truncated per round via the shared [[Dedup.RoundCheckpointer]]
  * (config-selectable local/disk/reliable, like connected components).
  *
  * Determinism (differential gate): pair counts are integer sums; the
  * winning pair breaks ties by (count desc, p1 asc, p2 asc); merges apply
  * via literal string `replace` on the space-joined symbol sequence, whose
  * left-to-right non-overlapping semantics are identical in Java and
  * DuckDB — so greedy overlap resolution (`a a a` + rule `a a` → `aa a`)
  * agrees bit for bit and the whole training loop is SQL-oracle-checkable
  * (unrolled CTEs, one block per round — same technique as the k-means
  * oracle).
  *
  * Output: one row per learned rule `(step, p1, p2, pcnt)`. */
object Bpe {

  def bpeTrain(spark: SparkSession, sfDir: String, merges: Int = 6): DataFrame = {
    val wc = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokenize(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("wcnt"))
    bpeTrainFromCounts(wc, merges)
  }

  /** Apply the learned merges back to the vocabulary: each word's subword
    * segmentation after `merges` rounds — the encode half of the
    * tokenizer, `(word, wcnt, n_subwords, seg)`. Shares the training
    * CTE chain in the oracle (the segmentation IS the final round's
    * state), so it is exactly checked too. */
  def bpeEncode(spark: SparkSession, sfDir: String, merges: Int = 6): DataFrame = {
    val wc = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokenize(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("wcnt"))
    trainLoop(wc, merges)._2
      .select(col("word"), col("wcnt"),
        size(split(trim(col("seq")), " ")).cast("bigint").as("n_subwords"),
        trim(col("seq")).as("seg"))
      .orderBy("word")
  }

  /** Core loop over an explicit `(word, wcnt)` frame — the form tests and
    * bring-your-own-counts pipelines call. */
  def bpeTrainFromCounts(wc: DataFrame, merges: Int): DataFrame =
    trainLoop(wc, merges)._1

  /** Runs the merge loop; returns (learned rules, final symbol state). */
  private def trainLoop(wc: DataFrame, merges: Int): (DataFrame, DataFrame) = {
    val ckpt = new Dedup.RoundCheckpointer(wc.sparkSession)
    // symbol sequence per word: characters space-joined, wrapped in single
    // spaces so a merge rule ' p1 p2 ' matches on symbol boundaries only
    var seqs = ckpt(wc.select(col("word"), col("wcnt"),
      concat(lit(" "),
        trim(regexp_replace(col("word"), "(.)", "$1 ")),
        lit(" ")).as("seq")))
    var rules: DataFrame = null
    val byWord = Window.partitionBy("word").orderBy("i")
    for (step <- 1 to merges) {
      val pairs = seqs
        .select(col("word"), col("wcnt"), posexplode(split(trim(col("seq")), " ")))
        .toDF("word", "wcnt", "i", "t")
        .withColumn("nxt", lead("t", 1).over(byWord))
        .filter(col("nxt").isNotNull)
        .groupBy("t", "nxt")
        .agg(sum("wcnt").as("pcnt"))
      val top = pairs
        .orderBy(col("pcnt").desc, col("t").asc, col("nxt").asc)
        .limit(1)
        .select(col("t").as("p1"), col("nxt").as("p2"), col("pcnt"))
      val ruleRow = top.withColumn("step", lit(step).cast("bigint"))
      rules = if (rules == null) ruleRow else rules.union(ruleRow)
      seqs = ckpt(seqs.crossJoin(broadcast(top))
        .withColumn("seq",
          expr("replace(seq, concat(' ', p1, ' ', p2, ' '), concat(' ', p1, p2, ' '))"))
        .select("word", "wcnt", "seq"))
    }
    (rules.select(col("step"), col("p1"), col("p2"), col("pcnt"))
       .orderBy("step"),
     seqs)
  }

  /** Shared CTE chain of the DuckDB oracle — generated, one block per
    * merge round, mirroring the engine's operation order. */
  private def bpeCtes(merges: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), w -> w <> '')) AS word FROM documents),
             |wc AS (SELECT word, count(*) AS wcnt FROM toks GROUP BY word),
             |s0 AS (SELECT word, wcnt, ' ' || trim(regexp_replace(word, '(.)', '\1 ', 'g')) || ' ' AS seq FROM wc)""".stripMargin
    for (k <- 1 to merges) {
      sb ++= s""",
                |p$k AS (SELECT lst[i] AS a, lst[i+1] AS b, CAST(sum(wcnt) AS BIGINT) AS pcnt
                |  FROM (SELECT wcnt, string_split(trim(seq), ' ') AS lst FROM s${k - 1}) x
                |  CROSS JOIN range(1, 1000) r(i) WHERE i < len(lst) GROUP BY 1, 2),
                |t$k AS (SELECT a, b, pcnt FROM p$k ORDER BY pcnt DESC, a, b LIMIT 1),
                |s$k AS (SELECT word, wcnt, replace(seq, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS seq FROM s${k - 1}, t$k)""".stripMargin
    }
    sb.result()
  }

  /** The [[bpeTrain]] oracle: the learned rule list. */
  def bpeOracle(merges: Int = 6): String =
    bpeCtes(merges) + (1 to merges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS step, a AS p1, b AS p2, pcnt FROM t$k")
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY step")

  /** The [[bpeEncode]] oracle: the final round's segmentation state. */
  def bpeEncodeOracle(merges: Int = 6): String =
    bpeCtes(merges) +
      s"""
         |SELECT word, wcnt, CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_subwords,
         |  trim(seq) AS seg
         |FROM s$merges ORDER BY word""".stripMargin
}
