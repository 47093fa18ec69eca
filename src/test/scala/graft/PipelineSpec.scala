package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** The export WRITER's contract: the files on disk — not the frame that
  * produced them — are the deliverable a training data loader consumes. */
class PipelineSpec extends SparkSpecBase {

  test("writeExportShards: one file per shard directory, files round-trip the export") {
    val out = java.nio.file.Files.createTempDirectory("graft_export_spec").toString
    val nShards = 16
    Pipeline.writeExportShards(spark, sf0001, out, nShards)
    // layout: every shard directory holds exactly ONE parquet file — the
    // repartition-on-shard write contract (a loader maps shard -> file)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).toSeq
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val files = d.listFiles().count(f => f.isFile && f.getName.startsWith("part-"))
      assert(files === 1, s"${d.getName}: expected 1 file, found $files")
    }
    // content: the written rows are EXACTLY the export — same doc set, same
    // quality values, shard consistent with doc_id
    val written = spark.read.parquet(out)
    val expected = Pipeline.corpusExport(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val got = written.select("doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(got === expected)
    assert(written.filter(col("shard") =!= col("doc_id") % nShards).count() === 0)
    // the written files carry the loader's payload columns
    assert(Seq("doc_id", "quality", "text", "bpe_tokens", "shard")
      .forall(written.columns.contains))
    // and the accounting recomputed from the files equals exportShards'
    val fromFiles = Pipeline.exportWrite(spark, sf0001, nShards)
      .collect().map(_.toString).toSeq
    val accounted = Pipeline.exportShards(spark, sf0001, nShards)
      .collect().map(_.toString).toSeq
    assert(fromFiles === accounted)
  }
}
