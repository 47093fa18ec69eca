package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Reference-parity queries: word count and inverted index — the two
  * plugin queries of the reference MapReduce framework
  * (`/root/reference/plugins/wc/wc.go`, `/root/reference/plugins/ii/ii.go`),
  * re-expressed as declarative DataFrame plans so Catalyst provides
  * partial aggregation, shuffle planning and codegen.
  *
  * Scale notes:
  *  - `wc` is a classic map-side-combinable aggregate: Catalyst plans
  *    partial_count → shuffle-by-word → final_count, so shuffle volume is
  *    O(distinct words), not O(tokens) — exactly the combiner the reference
  *    lacks (SURVEY.md §4.1).
  *  - `ii` uses `collect_set`, which also runs partially per map task; doc-id
  *    lists shuffle deduplicated.
  */
object CoreQueries {

  /** Word count (`/root/reference/plugins/wc/wc.go:11-26`):
    * tokenize → lower → count per word → order by word. */
  def wc(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(tokenize(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Inverted index (`/root/reference/plugins/ii/ii.go:11-41`):
    * word → sorted distinct comma-joined doc ids. Doc id = `documents.doc_id`
    * (sidesteps `input_file_name()` URI normalization, SURVEY.md §7.4.3).
    * Doc ids sort lexicographically as strings for parity with the
    * reference's `sort.Strings` (`ii.go:38`). */
  def ii(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("string").as("doc"), explode(tokenize(col("text"))).as("word"))
      .groupBy("word")
      .agg(concat_ws(",", sort_array(collect_set(col("doc")))).as("docs"))
      .orderBy("word")

  /** Filter/grep over documents: rows whose text matches a pattern —
    * generalizes the reference's tokenizer-as-filter to a real predicate.
    * Pushed down to the parquet scan by Catalyst. */
  def grepFilter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("text").contains("spark") && col("text").contains("stream"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  /** Top-k words by count (sort + limit on top of wc). The limit is pushed
    * into a TakeOrderedAndProject — no global sort at scale. */
  def topkWords(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(tokenize(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(k)
}
