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

  test("writeSortedExport: buckets are disjoint ranges, each file internally sorted, split balanced") {
    val out = java.nio.file.Files.createTempDirectory("graft_sorted_spec").toString
    val buckets = 8
    Pipeline.writeSortedExport(spark, sf0001, out, buckets)
    val bucketDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket=")).toSeq
    assert(bucketDirs.nonEmpty)
    // one sorted file group per bucket directory
    bucketDirs.foreach { d =>
      val files = d.listFiles().count(f => f.isFile && f.getName.startsWith("part-"))
      assert(files === 1, s"${d.getName}: expected 1 file, found $files")
    }
    // each file is internally ASCENDING in the sort key — the property a
    // range reader relies on (read row order as written, no re-sort)
    val perBucket = bucketDirs.map { d =>
      val b = d.getName.stripPrefix("bucket=").toLong
      val ts = spark.read.parquet(d.getPath).select("ts_us")
        .collect().map(_.getLong(0)).toSeq
      assert(ts === ts.sorted, s"bucket $b not written in ts order")
      b -> ts
    }.sortBy(_._1)
    // bucket key ranges are totally ordered and non-overlapping: a range
    // prune can bisect on per-file [min,max] metadata
    perBucket.sliding(2).foreach {
      case Seq((a, tsA), (b, tsB)) =>
        assert(tsA.max <= tsB.min, s"buckets $a and $b overlap")
      case _ =>
    }
    // no written row lost, and the histogram cuts split the mass within
    // sketch resolution: no bucket exceeds 2x the ideal share
    val sizes = perBucket.map(_._2.length)
    val total = sizes.sum
    assert(total === spark.read.parquet(s"$sf0001/events.parquet").count())
    val ideal = total.toDouble / buckets
    assert(sizes.max <= 2 * ideal,
      s"split unbalanced: sizes=$sizes vs ideal=$ideal")
  }
}
