package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's native I/O surface, Spark-first:
  *
  *  - source: a directory of text files, one document per file, document id
  *    = file name (`/root/reference/cmd/worker/worker.go:41-48` reads one
  *    whole file per map task; `plugins/ii/ii.go:20-21` uses the filename as
  *    provenance). Read via `wholeTextFiles` — one file = one record, the
  *    exact analogue of the reference's one-file-per-map-task granularity
  *    (see `readDocumentsDir` for why a line read + regroup would not
  *    preserve line order).
  *  - sink: `"key value"` lines sorted ascending by key
  *    (`worker.go:121-132,171-182` — the `mr-out-*` format).
  */
object TextFiles {

  /** `(doc_id, text)` per file in `dir` — doc_id is the bare file name.
    * `wholeTextFiles` (one file = one record) is the exact analogue of the
    * reference's one-file-per-map-task granularity, byte-faithful contents
    * included — the rare justified RDD use (a DataFrame line read +
    * `collect_list` would not guarantee line order for files split across
    * partitions). Documents are bounded (they must fit one task's memory in
    * the reference too), so record size is not a scale hazard; at 100 TB the
    * file CATALOG is the scaled dimension and that partitions fine. */
  def readDocumentsDir(spark: SparkSession, dir: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(dir)
      .map { case (path, text) => (path.substring(path.lastIndexOf('/') + 1), text) }
      .toDS()
  }

  /** Write a 2-column DataFrame as the reference's final-output format:
    * `"<key> <value>"` text lines, globally sorted ascending by the first
    * column. `orderBy` + single text file ≅ merged `mr-out-*`; at scale drop
    * the coalesce and the per-part files stay range-ordered. */
  def writeSortedKV(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val cols = df.columns
    val out = df
      .orderBy(col(cols(0)).asc)
      .select(concat_ws(" ", col(cols(0)), col(cols(1))).as("value"))
    (if (singleFile) out.coalesce(1) else out)
      .write.mode("overwrite").text(path)
  }
}
