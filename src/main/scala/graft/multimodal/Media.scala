package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time with
  * `mapPartitions` (the Scala analogue of `mapInPandas` — one decoder
  * instance per partition, rows streamed through it, no per-row
  * setup cost).
  *
  * The actual codec is STUBBED (`FakeDecoder`): no image/audio libraries
  * exist in this environment, so decode derives deterministic pseudo-metadata
  * from the bytes. The Spark-side plumbing — schema, binary column handling,
  * partition-wise batching, decoder lifecycle — is real and tested; swapping
  * `FakeDecoder` for a JNI/javacv decoder is a one-class change.
  */
object Media {

  /** One media asset: opaque payload + envelope metadata. */
  final case class MediaAsset(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata (what a real decoder would surface). */
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                             width: Int, height: Int, n_frames: Int)

  /** Decoder contract: one instance per partition, rows streamed through.
    * Implementations may hold native handles; `close` runs per partition. */
  trait MediaDecoder extends Serializable {
    def decode(asset: MediaAsset): MediaMeta
    def close(): Unit = ()
  }

  /** Deterministic stand-in for a real codec: metadata is a pure function of
    * payload length and kind, so tests (and the SQL oracle) can predict it.
    * width = 64 + 7·len mod 1216, height = 64 + 13·len mod 656,
    * frames = 1 for images else 1 + len mod 240. */
  object FakeDecoder extends MediaDecoder {
    def decode(a: MediaAsset): MediaMeta = {
      val len = a.payload.length.toLong
      MediaMeta(a.media_id, a.kind, len,
        width = (64 + (len * 7) % 1216).toInt,
        height = (64 + (len * 13) % 656).toInt,
        n_frames = if (a.kind == "image") 1 else (1 + len % 240).toInt)
    }
  }

  /** Build a media-asset table from the driver's documents table: payload =
    * UTF-8 bytes of the text (an opaque blob as far as this module is
    * concerned), kind cycled deterministically. Stands in for
    * `spark.read.format("binaryFile")` at scale. */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
              element_at(typedLit(Seq("image", "audio", "video")),
                         (col("doc_id") % 3 + 1).cast("int")).as("kind"),
              col("text").cast("binary").as("payload"))
      .as[MediaAsset]
  }

  /** Decode a partition of assets with one decoder instance — the
    * mapPartitions batch shape a real codec needs (amortized init, streamed
    * rows, explicit close). */
  def decodeAll(assets: Dataset[MediaAsset], decoder: MediaDecoder): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // close on TASK COMPLETION, not on iterator exhaustion: a plan that
      // stops early (limit/take, mid-partition failure) abandons the
      // iterator without draining it, and exhaustion-triggered close would
      // leak a real codec's native handles — while repeated hasNext polls
      // after the end would double-close a non-idempotent decoder. The
      // completion listener fires exactly once per task either way.
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => decoder.close())
      it.map(decoder.decode)
    }
  }

  /** End-to-end media metadata query (driver-verified): decode every asset,
    * emit envelope + decoded dims, ordered by id. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    decodeAll(assetsFromDocuments(spark, sfDir), FakeDecoder)
      .toDF()
      .orderBy("media_id")

  /** Resize plan for image assets: fit into `target`×`target` preserving
    * aspect ratio, integer-exact (`out = dim·target div max(w,h)`), so the
    * transform is oracle-checkable. A real pipeline feeds (payload, out_w,
    * out_h) to the codec; the geometry is the Spark-side contract. */
  def mediaResize(spark: SparkSession, sfDir: String, target: Int = 224): DataFrame =
    decodeAll(assetsFromDocuments(spark, sfDir), FakeDecoder)
      .toDF()
      .filter(col("kind") === "image")
      .select(col("media_id"), col("width").cast("bigint").as("width"),
              col("height").cast("bigint").as("height"),
              expr(s"(width * $target) div greatest(width, height)").as("out_w"),
              expr(s"(height * $target) div greatest(width, height)").as("out_h"))
      .orderBy("media_id")

  /** Uniform frame sampling for video assets: k frames spread over
    * [0, n_frames): all frames when n ≤ k, else idx_i = ⌊i·(n−1)/(k−1)⌋ —
    * integer-exact and strictly increasing for n > k. One row per sampled
    * frame (the batch shape a frame decoder consumes). */
  def mediaFrames(spark: SparkSession, sfDir: String, k: Int = 4): DataFrame =
    decodeAll(assetsFromDocuments(spark, sfDir), FakeDecoder)
      .toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames").cast("bigint").as("n_frames"))
      .select(col("media_id"), col("n_frames"),
        explode(when(col("n_frames") <= k,
            sequence(lit(0L), col("n_frames") - 1))
          .otherwise(transform(sequence(lit(0), lit(k - 1)),
            i => floor(i.cast("bigint") * (col("n_frames") - 1) /
                       lit((k - 1).toDouble)).cast("bigint"))))
          .as("frame_idx"))
      .orderBy("media_id", "frame_idx")

  /** Feature extraction: 32-bucket byte-value histogram per asset, one
    * decoder pass per partition (`mapPartitions` batch shape). The histogram
    * IS the (stub) feature vector a real extractor would emit. */
  def byteHistogram(assets: Dataset[MediaAsset]): Dataset[(Long, Seq[Long])] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val hist = new Array[Long](32)
        a.payload.foreach(b => hist((b & 0xff) >> 3) += 1)
        (a.media_id, hist.toSeq)
      }
    }
  }

  /** Per-kind rollup over decoded metadata. */
  def mediaStats(spark: SparkSession, sfDir: String): DataFrame =
    decodeAll(assetsFromDocuments(spark, sfDir), FakeDecoder)
      .toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n_assets"),
           sum("n_bytes").as("total_bytes"),
           max("width").as("max_width"),
           max("n_frames").as("max_frames"))
      .orderBy("kind")
}
