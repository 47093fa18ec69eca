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

  /** Build (or fingerprint-validated reuse) the POSITIONS-extended
    * postings index `(word, doc_id, pos)`, bucketed by word — what
    * [[ensurePostingsIndex]] cannot answer: ORDER. Same bucket-pruned
    * point-read property per term; ~tokens rows instead of ~distinct
    * (word, doc) pairs, the standard positional-index trade. */
  def ensurePositionsIndex(spark: SparkSession, sfDir: String,
                           buckets: Int = 8): String = {
    val sf = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_")
    val table = s"graft_textidx_${sf}_${graft.sources.Warehouse.pathToken(sfDir)}_x${buckets}_positions"
    val fp = graft.sources.Warehouse.sourceFingerprint(sfDir, "documents") + s"|pos|x$buckets"
    graft.sources.Warehouse.ensureDerivedTables(spark, Seq(table), fp) {
      graft.sources.Warehouse.writeBucketed(
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), posexplode(tokenize(col("text"))))
          .toDF("doc_id", "pos", "word"),
        Seq("word"), table, buckets)
    }
    table
  }

  /** Exact PHRASE search off the positions index: each term's posting list
    * is one bucket-pruned point read, shifted by its offset in the phrase
    * (`pos − i`), and the occurrence join intersects on (doc_id, start) —
    * a phrase occurrence IS an aligned start across every term. At 100 TB
    * this reads k posting lists (bucket-pruned) and joins them on
    * (doc_id, start) — join size tracks TERM FREQUENCY, not corpus size —
    * and the documents table is touched only by surviving doc_ids.
    * Output: `(doc_id, lang, n_occ)` per matching document. */
  def phraseSearch(spark: SparkSession, sfDir: String,
                   phrase: Seq[String] = Seq("table", "hash")): DataFrame = {
    val idx = spark.table(ensurePositionsIndex(spark, sfDir))
    val aligned = phrase.zipWithIndex
      .map { case (t, i) => idx.filter(col("word") === t)
        .select(col("doc_id"), (col("pos") - i).as("start")) }
      .reduce((a, b) => a.join(b, Seq("doc_id", "start")))
    val occ = aligned.groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
    Tables.documents(spark, sfDir)
      .join(occ, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_occ"))
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

  /** Full BOOLEAN retrieval off the postings index — the general query form
    * the AND-only [[grepIndexed]] and sequence-only [[phraseSearch]] are
    * special cases of: `(ANY of any) AND (ALL of all) AND (NONE of none)`.
    * Every branch is answered from posting lists, each term one
    * bucket-pruned point read: OR is a posting-list UNION (distinct on
    * doc_id), AND the usual intersection join, and NOT an ANTI-join against
    * the union of the excluded terms' lists — exclusion never scans the
    * corpus, it reads exactly the excluded terms' postings. At 100 TB the
    * whole query touches k posting lists and the surviving doc_ids; the
    * documents table contributes only the final semi-join projection.
    * Token semantics throughout (the [[grepIndexed]] exactness contract). */
  def booleanSearch(spark: SparkSession, sfDir: String,
                    any: Seq[String] = Seq("spark", "vector"),
                    all: Seq[String] = Seq("table", "join"),
                    none: Seq[String] = Seq("slow")): DataFrame = {
    val idx = spark.table(ensurePostingsIndex(spark, sfDir))
    def posting(t: String) = idx.filter(col("word") === t).select("doc_id")
    val anyHits = any.map(posting).reduce(_.union(_)).distinct()
    val withAll = all.map(posting).foldLeft(anyHits)((acc, p) => acc.join(p, Seq("doc_id")))
    val excluded = none.map(posting).reduce(_.union(_))
    Tables.documents(spark, sfDir)
      .join(withAll.join(excluded, Seq("doc_id"), "left_anti"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }
}
