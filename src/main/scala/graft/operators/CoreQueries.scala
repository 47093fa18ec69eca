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

  /** Build (or fingerprint-validated reuse) the persisted INVERTED
    * POSTINGS index `(word, doc_id)` over the corpus, bucketed by word —
    * the text-selection accelerator: an equality filter on the bucket
    * column reads ONE bucket of the index (bucket pruning, plan-asserted),
    * so a term lookup is a point read instead of a corpus scan. */
  def ensurePostingsIndex(spark: SparkSession, sfDir: String,
                          buckets: Int = 8): String = {
    val sf = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_")
    // bucket count in BOTH the name and the fingerprint (the full-identity
    // rule of Warehouse.ensureDerivedTables): a later call with a different
    // count must get its own table, not silently reuse this layout — the
    // bucket-pruning plan contract depends on the count it was built with
    val table = s"graft_textidx_${sf}_${graft.sources.Warehouse.pathToken(sfDir)}_x${buckets}_postings"
    val fp = graft.sources.Warehouse.sourceFingerprint(sfDir, "documents") + s"|x$buckets"
    graft.sources.Warehouse.ensureDerivedTables(spark, Seq(table), fp) {
      graft.sources.Warehouse.writeBucketed(
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), explode(tokenize(col("text"))).as("word"))
          .distinct(),
        Seq("word"), table, buckets)
    }
    table
  }

  /** Index-accelerated multi-term SEARCH: documents containing EVERY query
    * term as a token, answered from the persisted postings index — each
    * term lookup bucket-prunes to one index bucket, the per-term posting
    * lists intersect on doc_id, and only the (tiny) surviving id set
    * touches the documents table. At 100 TB this is the difference between
    * a full-corpus substring scan ([[grepFilter]] — still the right tool
    * for arbitrary substrings) and reading two posting lists. TOKEN
    * semantics, not substring: 'spark' matches the word, not 'sparkly' —
    * which is what makes posting-list candidates exact, not heuristic. */
  def grepIndexed(spark: SparkSession, sfDir: String,
                  terms: Seq[String] = Seq("spark", "stream")): DataFrame = {
    val idx = spark.table(ensurePostingsIndex(spark, sfDir))
    val hits = terms
      .map(t => idx.filter(col("word") === t).select("doc_id"))
      .reduce((a, b) => a.join(b, Seq("doc_id")))
    Tables.documents(spark, sfDir)
      .join(hits, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

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
