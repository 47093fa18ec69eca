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

  test("resize preserves aspect ratio and fits the target box") {
    val rows = Media.mediaResize(spark, sf0001, target = 224).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ow <= 224 && oh <= 224 && ow >= 1 && oh >= 1)
      assert(math.max(ow, oh) === 224 ||
             (w * 224) / math.max(w, h) === ow) // integer-floor contract
      // aspect preserved within integer rounding: each output dim is a
      // floor, so the cross-multiplied error is bounded by w + h exactly.
      assert(math.abs(ow * h - w * oh) <= w + h)
    }
  }

  test("frame sampling: k spread frames per video, strictly increasing, in range") {
    val byVideo = Media.mediaFrames(spark, sf0001, k = 4).collect()
      .groupBy(_.getLong(0))
    assert(byVideo.nonEmpty)
    byVideo.foreach { case (_, rows) =>
      val n = rows.head.getLong(1)
      val idxs = rows.map(_.getLong(2)).toSeq
      assert(idxs === idxs.sorted && idxs.distinct === idxs)
      assert(idxs.forall(i => i >= 0 && i < n))
      if (n > 4) {
        assert(idxs.size === 4)
        assert(idxs.head === 0L && idxs.last === n - 1) // endpoints sampled
      } else assert(idxs.size === n)
    }
  }

  test("byte-histogram feature: buckets sum to payload length") {
    val assets = Media.assetsFromDocuments(spark, sf0001)
    val hists = Media.byteHistogram(assets).collect().toMap
    val lens = assets.collect().map(a => a.media_id -> a.payload.length.toLong).toMap
    assert(hists.keySet === lens.keySet)
    hists.foreach { case (id, h) =>
      assert(h.length === 32)
      assert(h.sum === lens(id))
    }
  }

  test("media stats rolls up by kind") {
    val rows = Media.mediaStats(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === Set("image", "audio", "video"))
    assert(rows.map(_.getLong(1)).sum === 500)
  }
}
