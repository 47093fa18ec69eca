package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver's TPC-H-ish testdata layout
  * (`/root/testdata/sf*`, see FIXTURES.md). One parquet directory per table.
  *
  * Scale note: `spark.read.parquet` gives Spark's vectorized reader, predicate
  * pushdown and column pruning for free — at 100 TB these tables would be
  * partitioned directories and everything here still applies unchanged.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.ts` has shipped in three vintages (see FIXTURES.md):
    *   1. TIMESTAMP(NANOS) parquet — Spark 4 can't map nanos to its µs
    *      TimestampType, so sessions set
    *      `spark.sql.legacy.parquet.nanosAsLong=true` and it arrives as
    *      LongType nanos → convert with µs floor division (matching DuckDB's
    *      TIMESTAMP_NS → TIMESTAMP cast, so oracles agree at µs precision);
    *   2. TIMESTAMP_NTZ (µs, no timezone) — cast to TimestampType: sessions
    *      pin UTC, so NTZ → LTZ is instant-preserving and DuckDB (whose
    *      TIMESTAMP is naive) agrees bit-for-bit at µs precision;
    *   3. plain TIMESTAMP — pass through.
    * All event-time queries downstream (`window`, `session_window`,
    * watermarks, `unix_micros`) require TimestampType, so this loader is the
    * single normalization point for every vintage. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTs(table(spark, sfDir, "events"))

  /** Normalize any `ts` vintage to TimestampType; see [[events]]. */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _                => df
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
