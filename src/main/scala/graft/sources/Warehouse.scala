package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout sinks — the storage-side half of the 100 TB design:
  *
  *  - **Bucketed tables**: pre-shuffle a fact table by its join key once at
  *    write time; every later equi-join/aggregation on that key reads
  *    co-located buckets and plans with NO Exchange. This is how repeated
  *    joins amortize their shuffle at scale (the plan-level proof lives in
  *    WarehouseSpec: SortMergeJoin over two bucketed scans, zero shuffles).
  *  - **Partitioned layout**: directory partitioning by a low-cardinality
  *    column; predicate → partition pruning at planning time, so a filter on
  *    the partition column reads only its directories.
  */
object Warehouse {

  /** Write `df` as a bucketed+sorted managed table on `key` — the join key
    * pays its shuffle exactly once, here. */
  def writeBucketed(df: DataFrame, key: String, table: String, buckets: Int = 8): Unit =
    writeBucketed(df, Seq(key), table, buckets)

  /** Multi-column bucketing: a bucket-local join requires the bucket
    * columns to EQUAL the join keys (the planner disables the bucketed read
    * on a subset match), so index tables bucket on the full key tuple. */
  def writeBucketed(df: DataFrame, keys: Seq[String], table: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // A fresh session doesn't know tables a previous JVM wrote: the catalog
    // entry is gone but the managed location survives, and CTAS refuses a
    // non-empty location. Drop whatever the catalog has, then clear any
    // orphaned directory, so Overwrite means overwrite across sessions too.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join of two tables bucketed on the join keys: with matching
    * bucket counts Catalyst plans bucket-local SortMergeJoin, no Exchange
    * on either side. */
  def cogroupJoin(spark: SparkSession, left: String, right: String,
                  leftKey: String, rightKey: String): DataFrame = {
    // bind each side once: the join condition must reference the SAME
    // Dataset instances that feed the join (fresh spark.table calls would
    // only resolve via the relation cache keeping exprIds stable)
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Write `df` directory-partitioned by `partCol`. */
  def writePartitioned(df: DataFrame, partCol: String, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)
}
