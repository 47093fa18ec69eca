package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-interchange sources — JSONL and CSV, the formats corpora actually
  * ARRIVE in (crawler dumps, vendor deliveries, log exports) before they
  * are converted once into parquet/bucketed layouts.
  *
  * Two rules carried from the 100 TB design:
  *
  *  - **Schema-explicit reads, never `inferSchema`**: inference is a full
  *    extra pass over the data (2× the scan before any work happens) and
  *    it type-guesses per file — two shards can disagree. The schema is
  *    declared once here.
  *  - **Round-trip is the correctness bar**: a format reader that "mostly"
  *    parses is a silent corruption engine (CSV quoting/escaping is where
  *    text corpora with embedded quotes, commas and newlines die). The
  *    driver queries (`jsonl_scan`, `csv_scan`) hash every document's text
  *    THROUGH the staged encoding against the parquet oracle, so both
  *    codecs are proven byte-faithful on the whole corpus, not sampled.
  *
  * Staging: the driver testdata is parquet-only, so each format is staged
  * once per (corpus, format) under a fingerprint-named directory — the
  * same reuse gate as every derived artifact (a regenerated corpus gets a
  * fresh directory; a warm re-run reuses files, mirroring how interchange
  * files exist ONCE in production and are read many times). */
object Formats {

  /** The documents interchange schema, declared once (column order matches
    * the parquet layout so round-trip comparisons are positional-safe). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Dialect revision — part of the staging identity: a change to the
    * writer options (quoting, whitespace handling) must invalidate staged
    * files, or a reader with the new dialect silently consumes files
    * written under the old one. */
  private val DialectRev = "d2"

  private def stageDir(sfDir: String, format: String): java.io.File =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_fmt_${format}${DialectRev}_${Warehouse.pathToken(sfDir)}_" +
        Warehouse.sourceFingerprint(sfDir, "documents").take(8))

  /** Stage `documents` as the given text format, once per corpus state:
    * the fingerprint in the directory name is the reuse gate (stale stage
    * of a regenerated corpus can never be read), `_SUCCESS` is the
    * completed-write marker. Deterministic layout: sorted by doc_id,
    * single file — interchange files are produced once, so write cost is
    * not on any steady-state path. */
  private def ensureStaged(spark: SparkSession, sfDir: String, format: String)
                          (write: (DataFrame, String) => Unit): String = {
    val dir = stageDir(sfDir, format)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val docs = Tables.documents(spark, sfDir)
        .select(documentsSchema.fieldNames.map(col).toSeq: _*)
        .orderBy("doc_id").coalesce(1)
      write(docs, dir.getPath)
    }
    dir.getPath
  }

  /** Staged JSONL path for `sfDir`'s documents. */
  def stageDocumentsJsonl(spark: SparkSession, sfDir: String): String =
    ensureStaged(spark, sfDir, "jsonl") { (docs, path) =>
      docs.write.mode(SaveMode.Overwrite).json(path)
    }

  /** Staged CSV path (header, everything quoted, `"`-doubling escapes —
    * RFC-4180 form, the dialect DuckDB and every loader agree on). */
  def stageDocumentsCsv(spark: SparkSession, sfDir: String): String =
    ensureStaged(spark, sfDir, "csv") { (docs, path) =>
      docs.write.mode(SaveMode.Overwrite)
        .option("header", "true").option("quoteAll", "true")
        .option("escape", "\"")
        // Spark's CSV codec TRIMS field whitespace by default on BOTH
        // sides — silent text corruption for a corpus (trailing spaces are
        // data); disabled explicitly wherever this dialect is used
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    }

  /** Schema-explicit JSONL read. */
  def readDocumentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(documentsSchema).json(path)

  /** Schema-explicit CSV read, same RFC-4180 dialect as the writer.
    * `multiLine` makes quoted embedded newlines parse correctly — the
    * scale trade is real (a multiline CSV file cannot be split mid-file),
    * which is exactly why interchange CSV is converted to parquet once and
    * never used as the working layout. */
  def readDocumentsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(documentsSchema)
      .option("header", "true").option("quote", "\"")
      .option("escape", "\"").option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Staged ORC path — the columnar interchange sibling (Hive-ecosystem
    * deliveries arrive as ORC the way crawler dumps arrive as JSONL).
    * Spark's ORC support is native; the staging/reuse contract is the
    * same fingerprint gate as the text formats. */
  def stageDocumentsOrc(spark: SparkSession, sfDir: String): String =
    ensureStaged(spark, sfDir, "orc") { (docs, path) =>
      docs.write.mode(SaveMode.Overwrite).orc(path)
    }

  /** Schema-explicit ORC read. */
  def readDocumentsOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(documentsSchema).orc(path)

  /** Driver query: every document read THROUGH the staged JSONL, reduced
    * to `(doc_id, lang, text_md5)` — the md5 travels through the JSON
    * string codec, so a hash match against the parquet-side oracle proves
    * byte-faithful text round-trip for the whole corpus. */
  def jsonlScan(spark: SparkSession, sfDir: String): DataFrame =
    readDocumentsJsonl(spark, stageDocumentsJsonl(spark, sfDir))
      .select(col("doc_id"), col("lang"), md5(col("text")).as("text_md5"))
      .orderBy("doc_id")

  /** Driver query: the CSV twin of [[jsonlScan]] (quote/escape codec under
    * test instead of JSON string escapes), plus `n_chars` so a numeric
    * column crosses the text format too. */
  def csvScan(spark: SparkSession, sfDir: String): DataFrame =
    readDocumentsCsv(spark, stageDocumentsCsv(spark, sfDir))
      .select(col("doc_id"), col("source"), col("n_chars"),
              md5(col("text")).as("text_md5"))
      .orderBy("doc_id")

  /** Driver query: the ORC member of the round-trip family — binary
    * columnar codec under test (string encoding + dictionary paths)
    * instead of text quoting; every column type crosses the format. */
  def orcScan(spark: SparkSession, sfDir: String): DataFrame =
    readDocumentsOrc(spark, stageDocumentsOrc(spark, sfDir))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
              md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
}
