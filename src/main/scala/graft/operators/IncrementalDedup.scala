package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Tables, Warehouse}

/** Incremental near-dup detection against a PERSISTED index — the daily-use
  * shape of production dedup: the corpus's fingerprints live in a bucketed
  * store written once; each incoming delta shard joins against that store
  * bucket-locally and only the delta pays a shuffle. One-shot self-join
  * dedup ([[Dedup]]) re-pays the whole corpus's shuffle on every run; at
  * 100 TB the index is the amortization that makes daily ingest affordable.
  *
  * Store layout (all via [[Warehouse.writeBucketed]], so every table's
  * bucket hash IS the later join's partitioning — zero Exchange on the
  * store side, plan-asserted in WarehouseSpec):
  *
  *  - `graft_corpus_bands(band, bhash, doc_id)` bucketed by (band, bhash):
  *    the MinHash-LSH candidate index (b=32 bands × r=4 rows, the
  *    [[Dedup.minhashLshPairs]] configuration — detection probability at
  *    J=0.8 is 1−5·10⁻⁸, which is what lets the exact-join oracle stand).
  *  - `graft_corpus_postings(doc_id, s)` bucketed by (doc_id, s): shingle
  *    postings for exact-Jaccard verification of candidates.
  *  - `graft_corpus_sizes(doc_id, n_sh)` bucketed by doc_id: per-doc
  *    distinct-shingle counts for the Jaccard denominator.
  *
  * The delta/corpus split is deterministic (`doc_id % 10 == 0` is the
  * incoming delta) so the result is DuckDB-oracle-checkable: the output
  * equals the exact cross-split trigram-Jaccard join at the threshold.
  */
object IncrementalDedup {

  private val DeltaMod = 10

  /** Index tables are named by corpus + parameters, so an existing index is
    * reused (the production semantics — the build amortizes over every
    * ingest) and a different corpus/config can never be silently read.
    * Catalog entries are session-scoped (in-memory catalog), so a fresh JVM
    * rebuilds once; [[Warehouse.writeBucketed]] clears orphaned locations. */
  private def tableName(base: String, sfDir: String, n: Int,
                        numBands: Int, rowsPerBand: Int, buckets: Int): String = {
    val sf = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_")
    s"${base}_${sf}_n${n}b${numBands}r${rowsPerBand}x$buckets"
  }

  /** Distinct word-n-gram postings of one side of the split. */
  private def postingsOf(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(call_function("graft_shingles", col("text"), lit(n))).as("s"))

  /** LSH band-bucket stream `(band, bhash, doc_id)` from a postings stream:
    * `graft_minhash` aggregate (map-side partials — the shuffle carries
    * 128-long sketches, not shingles) → `graft_bands` → posexplode. */
  private def bandsOf(postings: DataFrame, numBands: Int, rowsPerBand: Int): DataFrame =
    postings
      .groupBy("doc_id")
      .agg(call_function("graft_minhash", col("s"),
             lit(numBands * rowsPerBand)).as("sig"))
      .select(col("doc_id"),
              posexplode(call_function("graft_bands", col("sig"),
                lit(numBands), lit(rowsPerBand))))
      .toDF("doc_id", "band", "bhash")

  /** Build (or rebuild) the persisted corpus index: everything that is NOT
    * the delta shard, fingerprinted once, bucketed on its future join keys.
    * In production this runs at corpus-build time and is amortized over
    * every later ingest; here it runs in-query so the driver contract stays
    * self-contained. */
  def buildIndex(spark: SparkSession, sfDir: String, n: Int = 3,
                 numBands: Int = 32, rowsPerBand: Int = 4,
                 buckets: Int = 8): Unit = {
    def name(base: String) = tableName(base, sfDir, n, numBands, rowsPerBand, buckets)
    val allExist = Seq("graft_corpus_bands", "graft_corpus_postings", "graft_corpus_sizes")
      .forall(b => spark.catalog.tableExists(name(b)))
    if (allExist) return // this exact corpus+config is already indexed
    val corpus = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % DeltaMod =!= 0)
    val postings = postingsOf(corpus, n)
    Warehouse.writeBucketed(bandsOf(postings, numBands, rowsPerBand),
      Seq("band", "bhash"), name("graft_corpus_bands"), buckets)
    // Bucketed on BOTH columns: the verification join's keys are exactly
    // (doc_id, s), and Spark only plans a bucket-local join when the bucket
    // columns equal the join keys (a subset match makes the planner disable
    // the bucketed read and shuffle the store).
    Warehouse.writeBucketed(postings, Seq("doc_id", "s"), name("graft_corpus_postings"), buckets)
    Warehouse.writeBucketed(
      postings.groupBy("doc_id").agg(count(lit(1)).as("n_sh")),
      Seq("doc_id"), name("graft_corpus_sizes"), buckets)
  }

  /** The delta-vs-store near-dup join, given an already-built index:
    *
    *  1. delta band hashes join `graft_corpus_bands` on (band, bhash) —
    *     the store side reads its buckets in place;
    *  2. candidate pairs verified to exact Jaccard against
    *     `graft_corpus_postings`/`graft_corpus_sizes` (store side again
    *     bucket-local on doc_id), delta postings computed on the fly.
    *
    * Output: `(doc_a = delta id, doc_b = corpus id, jaccard)`, J ≥ t. */
  def deltaAgainstIndex(spark: SparkSession, sfDir: String, n: Int = 3,
                        numBands: Int = 32, rowsPerBand: Int = 4,
                        threshold: Double = 0.8, buckets: Int = 8): DataFrame = {
    def name(base: String) = tableName(base, sfDir, n, numBands, rowsPerBand, buckets)
    val delta = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % DeltaMod === 0)
    val dPostings = postingsOf(delta, n)
    val dBands = bandsOf(dPostings, numBands, rowsPerBand)

    val candidates = dBands.as("d")
      .join(spark.table(name("graft_corpus_bands")).as("c"), Seq("band", "bhash"))
      .select(col("d.doc_id").as("doc_a"), col("c.doc_id").as("doc_b"))
      .distinct()

    val inter = candidates
      .join(dPostings.as("pa"), col("doc_a") === col("pa.doc_id"))
      .join(spark.table(name("graft_corpus_postings")).as("pb"),
        col("doc_b") === col("pb.doc_id") && col("pa.s") === col("pb.s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))

    val dSizes = dPostings.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    inter
      .join(dSizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(spark.table(name("graft_corpus_sizes")).as("sb"),
        col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
              (col("inter").cast("double") /
               (col("sa.n_sh") + col("sb.n_sh") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** Driver-contract form: build the index, then run the delta against it. */
  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    buildIndex(spark, sfDir)
    deltaAgainstIndex(spark, sfDir)
  }
}
