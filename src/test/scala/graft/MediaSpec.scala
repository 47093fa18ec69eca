package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media

class MediaSpec extends SparkSpecBase {

  test("decode plumbing: meta is the deterministic function of payload bytes") {
    val out = Media.mediaMeta(spark, sf0001)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(out.count() === docs.count())
    // Cross-check one row end-to-end against the FakeDecoder contract.
    val r = out.filter(col("media_id") === 7).collect()(0)
    val text = docs.filter(col("doc_id") === 7).select("text").collect()(0).getString(0)
    val len = text.getBytes("UTF-8").length.toLong
    assert(r.getAs[Long]("n_bytes") === len)
    assert(r.getAs[Int]("width") === (64 + (len * 7) % 1216).toInt)
    assert(r.getAs[Int]("height") === (64 + (len * 13) % 656).toInt)
    assert(r.getAs[String]("kind") === Seq("image", "audio", "video")((7 % 3).toInt))
  }

  test("decoder runs once per partition stream (mapPartitions shape)") {
    import spark.implicits._
    val assets = Media.assetsFromDocuments(spark, sf0001).repartition(3)
    val metas = Media.decodeAll(assets, Media.FakeDecoder)
    assert(metas.count() === 500)
    assert(metas.filter(_.kind == "image").head().n_frames === 1)
  }

  test("media stats rolls up by kind") {
    val rows = Media.mediaStats(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === Set("image", "audio", "video"))
    assert(rows.map(_.getLong(1)).sum === 500)
  }
}
