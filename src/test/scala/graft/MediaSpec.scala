package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media

class MediaSpec extends SparkSpecBase {

  test("decode plumbing: header fields parsed back out of real container bytes") {
    val out = Media.mediaMeta(spark, sf0001)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(out.count() === docs.count())
    def lenOf(id: Long): Long = docs.filter(col("doc_id") === id)
      .select("text").collect()(0).getString(0).getBytes("UTF-8").length.toLong
    // PNG image (even id, id%3==0): dims from IHDR, 57 container bytes
    val png = out.filter(col("media_id") === 6).collect()(0)
    val lp = lenOf(6)
    assert(png.getAs[String]("kind") === "image")
    assert(png.getAs[Long]("n_bytes") === lp + 57)
    assert(png.getAs[Int]("width") === (64 + (lp * 7) % 1216).toInt)
    assert(png.getAs[Int]("height") === (64 + (lp * 13) % 656).toInt)
    // JPEG image (odd id, id%3==0): dims from the SOF0 scan, 41 bytes
    val jpg = out.filter(col("media_id") === 3).collect()(0)
    val lj = lenOf(3)
    assert(jpg.getAs[Long]("n_bytes") === lj + 41)
    assert(jpg.getAs[Int]("width") === (64 + (lj * 7) % 1216).toInt)
    // WAV audio (id%3==1): 44-byte canonical header, sample frames =
    // data size / block align (8-bit mono ⇒ = data size), no raster dims
    val wav = out.filter(col("media_id") === 7).collect()(0)
    val lw = lenOf(7)
    assert(wav.getAs[String]("kind") === "audio")
    assert(wav.getAs[Long]("n_bytes") === lw + 44)
    assert(wav.getAs[Int]("width") === 0 && wav.getAs[Int]("height") === 0)
    assert(wav.getAs[Int]("n_frames") === lw.toInt)
    // AVI video (id%3==2): avih dwTotalFrames/dwWidth/dwHeight, 100 bytes
    val avi = out.filter(col("media_id") === 8).collect()(0)
    val la = lenOf(8)
    assert(avi.getAs[String]("kind") === "video")
    assert(avi.getAs[Long]("n_bytes") === la + 100)
    assert(avi.getAs[Int]("n_frames") === (1 + la % 240).toInt)
    assert(avi.getAs[Int]("width") === (64 + (la * 7) % 1216).toInt)
  }

  test("decoder runs once per partition stream (mapPartitions shape)") {
    import spark.implicits._
    val assets = Media.assetsFromDocuments(spark, sf0001).repartition(3)
    val metas = Media.decodeAll(assets, Media.HeaderDecoder)
    assert(metas.count() === 500)
    assert(metas.filter(_.kind == "image").head().n_frames === 1)
  }

  test("HeaderDecoder reads a genuine in-the-wild PNG, not just its own encoder's output") {
    // canonical 1×1 transparent PNG as produced by real tooling — proves
    // the IHDR walk parses foreign files (different color type, real IDAT)
    val realPng = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val m = Media.HeaderDecoder.decode(Media.MediaAsset(1L, "image", realPng))
    assert(m.width === 1 && m.height === 1 && m.n_frames === 1)
    assert(m.n_bytes === realPng.length.toLong)
  }

  test("HeaderDecoder scans JPEG marker segments it did not emit: DQT/COM before progressive SOF2") {
    // segment order and SOF flavor differ from encodeJpeg's APP0+SOF0
    // layout, so only a real marker walk (skip-by-length, SOFn range
    // check) finds the dimensions
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val com = Array(0xff, 0xfe).map(_.toByte) ++ be16(9) ++ "comment".getBytes("US-ASCII")
    val dqt = Array(0xff, 0xdb).map(_.toByte) ++ be16(67) ++ Array.fill[Byte](65)(1)
    val sof2 = Array(0xff, 0xc2).map(_.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(123) ++ be16(321) ++ Array[Byte](1, 1, 0x11, 0)
    val bytes = Array(0xff, 0xd8).map(_.toByte) ++ com ++ dqt ++ sof2 ++
      Array(0xff, 0xd9).map(_.toByte)
    val m = Media.HeaderDecoder.decode(Media.MediaAsset(2L, "image", bytes))
    assert(m.width === 321 && m.height === 123)
  }

  test("HeaderDecoder walks RIFF chunk trees with foreign chunks and odd-size padding") {
    // WAV with a LIST chunk ahead of fmt, and an ODD-sized extra chunk
    // (RIFF pads to even — an off-by-one walk would desync and miss data)
    def ascii(s: String) = s.getBytes("US-ASCII")
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val junk = ascii("LIST") ++ le32(5) ++ ascii("INFO") ++ Array[Byte](7) ++
      Array[Byte](0) // 5-byte chunk + 1 pad byte
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(176400) ++ le16(4) ++ le16(16) // stereo 16-bit: block align 4
    val data = ascii("data") ++ le32(20) ++ Array.fill[Byte](20)(0)
    val body = junk ++ fmt ++ data
    val wav = ascii("RIFF") ++ le32(4 + body.length) ++ ascii("WAVE") ++ body
    val m = Media.HeaderDecoder.decode(Media.MediaAsset(3L, "audio", wav))
    assert(m.n_frames === 5, s"20 bytes / block align 4 must be 5 frames: $m") // 20 / 4
    assert(m.width === 0 && m.height === 0)
  }

  test("corrupt containers THROW instead of returning silent zero metadata") {
    // a real pipeline must quarantine undecodable assets, which requires
    // the decode error to surface — not a (0, 0, 0) row that aggregates
    def deco(bytes: Array[Byte]) =
      Media.HeaderDecoder.decode(Media.MediaAsset(9L, "image", bytes))
    // unknown magic
    intercept[IllegalArgumentException](deco("not a media file".getBytes))
    // PNG signature but the chunk stream never reaches an IHDR
    intercept[IllegalArgumentException](deco(
      Media.encodePng(4, 4, "x".getBytes).take(8) ++ "garbagegarbage".getBytes))
    // JPEG SOI but truncated before any SOF marker
    intercept[IllegalArgumentException](deco(Array(0xff, 0xd8).map(_.toByte)))
    // RIFF/WAVE missing its fmt/data chunks
    intercept[IllegalArgumentException](deco(
      "RIFF".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "WAVE".getBytes))
    // NEGATIVE declared chunk lengths (high bit set) must throw, not spin:
    // a zero/backwards walk stride would hang the executor task forever
    val negPng = Media.encodePng(4, 4, "x".getBytes).take(8) ++
      Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xf4.toByte) ++
      "JUNK".getBytes ++ Array.fill[Byte](8)(0)
    intercept[IllegalArgumentException](deco(negPng))
    val negWav = "RIFF".getBytes ++ Array[Byte](40, 0, 0, 0) ++ "WAVE".getBytes ++
      "junk".getBytes ++ Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      Array.fill[Byte](8)(0)
    intercept[IllegalArgumentException](deco(negWav))
    // JPEG truncated INSIDE the SOF header: the contracted error type,
    // not an ArrayIndexOutOfBounds from an unguarded field read
    intercept[IllegalArgumentException](deco(
      Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte)))
  }

  test("HeaderDecoder tolerates spec-legal JPEG fill bytes before markers") {
    // ITU T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    // marker — in-the-wild encoders emit them, a naive walk desyncs
    val base = Media.encodeJpeg(77, 55, "x".getBytes)
    val padded = base.take(2) ++ Array.fill[Byte](3)(0xff.toByte) ++ base.drop(2)
    val m = Media.HeaderDecoder.decode(Media.MediaAsset(4L, "image", padded))
    assert(m.width === 77 && m.height === 55)
  }

  test("encode/decode round-trips dimensions exactly at the format boundaries") {
    val cases = Seq((1, 1), (1279, 719), (64, 656), (800, 600))
    cases.foreach { case (w, h) =>
      val p = Media.HeaderDecoder.decode(
        Media.MediaAsset(0L, "image", Media.encodePng(w, h, "x".getBytes)))
      assert((p.width, p.height) === ((w, h)), s"png $w x $h")
      val j = Media.HeaderDecoder.decode(
        Media.MediaAsset(0L, "image", Media.encodeJpeg(w, h, "x".getBytes)))
      assert((j.width, j.height) === ((w, h)), s"jpeg $w x $h")
      val a = Media.HeaderDecoder.decode(
        Media.MediaAsset(0L, "video", Media.encodeAvi(w, h, 239, "x".getBytes)))
      assert((a.width, a.height, a.n_frames) === ((w, h, 239)), s"avi $w x $h")
    }
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

  test("mediaDedup: digest grouping finds exactly the planted re-uploads") {
    val out = Media.mediaDedup(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val expected = docs.filter(col("doc_id") % 9 === 4).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out.map(_.getAs[Long]("canonical_id")).toSeq === expected)
    assert(out.forall(_.getAs[Long]("n_copies") == 2L))
  }

  test("mediaDedup: one flipped payload byte breaks the pair (the digest reads bytes)") {
    import spark.implicits._
    val a = Media.assetsFromDocuments(spark, sf0001)
      .filter(_.media_id == 4).head()
    val flipped = a.payload.clone()
    flipped(flipped.length - 1) = (flipped(flipped.length - 1) ^ 1).toByte
    val assets = Seq(
      a,
      a.copy(media_id = a.media_id + 1000),                    // exact re-upload
      a.copy(media_id = a.media_id + 2000, payload = flipped)  // 1-bit variant
    ).toDS()
    val groups = Media.dedupAssets(assets).collect()
    assert(groups.length === 1, "only the byte-identical pair groups")
    assert(groups(0).getAs[Long]("canonical_id") === a.media_id)
    assert(groups(0).getAs[Long]("n_copies") === 2L)
  }

  test("mediaNearDup: planted bit-perturbed copy is caught; unrelated same-size asset is not") {
    import spark.implicits._
    // base payload long enough to guarantee the distance bound holds
    val data = Array.tabulate(2000)(i => ((i * 7) % 256).toByte)
    val a = Media.encodeWav(data)
    // replicate the fixture's perturbation: bit 3 of every 251st byte from 64
    val aPert: Array[Byte] = a.clone()
    locally { var i = 64; while (i < aPert.length) { aPert(i) = (aPert(i) ^ 8).toByte; i += 251 } }
    // unrelated asset, SAME container and SAME byte length (shares the
    // block), but a very different byte distribution
    val b = Media.encodeWav(Array.fill(2000)(0x41.toByte))
    assert(!java.util.Arrays.equals(a, aPert), "perturbation must change bytes (md5-invisible to mediaDedup)")
    val files = Seq(("asset_00001.bin", a), ("asset_00002.bin", aPert),
                    ("asset_00003.bin", b)).toDS()
    val pairs = Media.nearDupFromFeatures(Media.nearDupFeatures(files)).collect()
    assert(pairs.map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("dup_id"))).toSeq
      === Seq((1L, 2L)), "exactly the perturbed pair, not the same-size stranger")
    val l1 = pairs(0).getAs[Long]("l1")
    assert(l1 > 0 && l1 * 64 <= a.length, "perturbed distance is nonzero and under threshold")
  }

  test("mediaNearDup end-to-end: every planted perturbed pair caught; extras are natural originals") {
    val out = Media.mediaNearDup(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val mx = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val planted = docs.filter(col("doc_id") % 13 === 6).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val pairs = out.map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("dup_id"))).toSet
    // recall = 1 on the planted perturbation class
    assert(planted.forall(d => pairs.contains((d, d + mx))),
      "every planted bit-perturbed re-upload must be recovered")
    // anything else the metric surfaces must be a NATURAL pair between two
    // original assets (e.g. same-size docs with close byte mixes) — never a
    // spurious match against a re-upload of a DIFFERENT asset
    val extras = pairs.filterNot { case (c, d) => d == c + mx && planted(c) }
    assert(extras.forall { case (c, d) => c <= mx && d <= mx },
      s"non-planted pairs must pair originals with originals, got $extras")
    assert(extras.size < planted.size, "natural near-dups stay a small minority of the pair set")
  }

  test("mediaDupPadded: padded copy invisible to size blocking, caught by prefix blocking") {
    import spark.implicits._
    val data = Array.tabulate(2000)(i => ((i * 7) % 256).toByte)
    val a = Media.encodeWav(data)
    val aPad: Array[Byte] = a ++ Array.fill[Byte](37)(0)
    // same 256-byte prefix, divergent tail mass: blocked together by the
    // prefix digest but must FAIL the permille verify
    val tailDiverged: Array[Byte] = a.clone()
    locally { var i = 256; while (i < tailDiverged.length) { tailDiverged(i) = 0x41; i += 1 } }
    val files = Seq(("asset_00001.bin", a), ("asset_00002.bin", aPad),
                    ("asset_00003.bin", tailDiverged)).toDS()
    // size blocking (mediaNearDup's core) cannot pair a with aPad...
    val sizeBlocked = Media.nearDupFromFeatures(Media.nearDupFeatures(files)).collect()
      .map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("dup_id"))).toSet
    assert(!sizeBlocked.contains((1L, 2L)),
      "size blocking must be blind to the padded copy (that is this op's reason to exist)")
    // ...prefix blocking catches it, and kills the tail-diverged impostor
    val got = Media.paddedDupFromFeatures(Media.paddedDupFeatures(files)).collect()
    assert(got.map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("dup_id"))).toSeq
      === Seq((1L, 2L)), "exactly the padded pair; the same-prefix diverged tail is rejected")
    val l1p = got(0).getAs[Long]("l1p")
    assert(l1p <= 250L, s"planted permille distance $l1p must sit under the threshold")
  }

  test("mediaDupPadded end-to-end: every planted padded pair caught; extras are originals") {
    val out = Media.mediaDupPadded(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val mx = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val planted = docs.filter(col("doc_id") % 13 === 8).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val pairs = out.map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("dup_id"))).toSet
    assert(planted.forall(d => pairs.contains((d, d + mx))),
      "every planted trailer-padded re-upload must be recovered")
    val extras = pairs.filterNot { case (c, d) => d == c + mx && planted(c) }
    assert(extras.forall { case (c, d) => c <= mx && d <= mx },
      s"non-planted pairs must pair originals with originals, got $extras")
  }

  test("mediaDupEncoded: re-encoded copy invisible to BOTH prior blockers, caught by fingerprints") {
    import spark.implicits._
    val data = Array.tabulate(2000)(i => ((i * 7) % 256).toByte)
    val a = Media.encodeWav(data)
    // replicate the fixture's re-encode: drop every 101st byte from 64
    val aEnc: Array[Byte] = {
      val out = new Array[Byte](a.length)
      var i = 0; var o = 0
      while (i < a.length) {
        if (!(i >= 64 && (i - 64) % 101 == 0)) { out(o) = a(i); o += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(out, o)
    }
    assert(aEnc.length < a.length, "the edit must change the size")
    assert(!java.util.Arrays.equals(a.take(256), aEnc.take(256)),
      "the edit must change the 256-byte prefix (drops start inside it)")
    // impostor: shares a's first 500 bytes (plenty of winnow runs → blocked
    // together) but a completely different tail distribution — must be
    // rejected by the permille verify, not the blocking
    val impostor: Array[Byte] = a.take(500) ++ Array.fill[Byte](1500)(0x41)
    // stranger: same container, no shared content at all
    val stranger = Media.encodeWav(Array.fill(2000)(0x42.toByte))
    val files = Seq(("asset_00001.bin", a), ("asset_00002.bin", aEnc),
                    ("asset_00003.bin", impostor), ("asset_00004.bin", stranger)).toDS()
    // both prior blockers are structurally blind to the re-encode:
    val sizeBlocked = Media.nearDupFromFeatures(Media.nearDupFeatures(files)).collect()
      .map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("dup_id"))).toSet
    assert(!sizeBlocked.contains((1L, 2L)),
      "size blocking must be blind to a size-changing re-encode")
    val prefixBlocked = Media.paddedDupFromFeatures(Media.paddedDupFeatures(files)).collect()
      .map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("dup_id"))).toSet
    assert(!prefixBlocked.contains((1L, 2L)),
      "prefix blocking must be blind to an edit inside the prefix")
    // the fingerprint blocker catches exactly the re-encoded pair — the
    // shared-prefix impostor is blocked WITH a but fails the L1 verify
    val got = Media.encodedDupFromFeatures(Media.encodedDupFeatures(files)).collect()
    assert(got.map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("dup_id"))).toSeq
      === Seq((1L, 2L)), "exactly the re-encoded pair; impostor and stranger rejected")
    val row = got(0)
    assert(row.getAs[Long]("n_shared") >= Media.EncodedMinShared,
      "the clean-run floor must hold on a 2000-byte payload")
    assert(row.getAs[Long]("l1p") <= Media.PermilleL1Max)
  }

  test("mediaDupEncoded end-to-end: every planted re-encoded pair caught; extras pair originals") {
    val out = Media.mediaDupEncoded(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val mx = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val planted = docs.filter(col("doc_id") % 13 === 11).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val pairs = out.map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("dup_id"))).toSet
    // recall = 1 on the planted class: ≥512-byte payloads via the dropped-
    // byte copy, shorter ones via the byte-identical re-upload (which
    // shares every fingerprint and sits at l1p = 0)
    assert(planted.forall(d => pairs.contains((d, d + mx))),
      "every planted re-encoded re-upload must be recovered")
    // Unlike the size/prefix blocks, fingerprint blocking sees CONTENT, so
    // extras legitimately include a text-duplicate original paired with
    // ANOTHER document's re-encoded copy. The invariant that must hold:
    // mapped back to their source documents, every extra connects two
    // DISTINCT documents — the only self-pairs are the planted identity
    // mappings asserted above.
    val orig = (x: Long) => if (x > mx) x - mx else x
    val extras = pairs.filterNot { case (c, d) => d == c + mx && planted(c) }
    assert(extras.forall { case (c, d) => orig(c) != orig(d) },
      s"an asset may pair with its own copy only via the planted mapping")
    // and every extra member that IS a re-upload must come from the
    // planted class (re-uploads of other classes don't exist in this
    // universe — a violation means the staging leaked a foreign file)
    assert(extras.forall { case (c, d) =>
      (c <= mx || planted(c - mx)) && (d <= mx || planted(d - mx)) })
    // plan: the postings self-join and both feature joins are equi-keyed
    val plan = Media.mediaDupEncoded(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"media_dup_encoded joins must stay equi-keyed:\n$plan")
  }

  test("packed grain equals file grain row for row, for ALL THREE copy-class catchers") {
    // same universes (shared definition tags), same kernels, same pair
    // cores — only the landing grain differs, so each pair of results
    // must be identical, proven on non-empty outputs
    val pairs = Seq[(String, () => Seq[org.apache.spark.sql.Row], () => Seq[org.apache.spark.sql.Row])](
      ("encoded", () => Media.mediaDupEncoded(spark, sf0001).collect().toSeq,
                  () => Media.mediaDupEncodedPacked(spark, sf0001).collect().toSeq),
      ("near_dup", () => Media.mediaNearDup(spark, sf0001).collect().toSeq,
                   () => Media.mediaNearDupPacked(spark, sf0001).collect().toSeq),
      ("padded", () => Media.mediaDupPadded(spark, sf0001).collect().toSeq,
                 () => Media.mediaDupPaddedPacked(spark, sf0001).collect().toSeq))
    pairs.foreach { case (name, fileGrain, packed) =>
      val f = fileGrain(); val p = packed()
      assert(p === f, s"$name: packed-grain must be byte-for-byte the file-grain result")
      assert(p.nonEmpty, s"$name: the equivalence must be proven on a non-empty result")
    }
  }

  test("mediaFilesScan: binaryFile ingest sniffs every container from bytes alone") {
    val rows = Media.mediaFilesScan(spark, sf0001).collect()
    val idx = rows.head.schema.fieldNames.zipWithIndex.toMap
    assert(rows.length ===
      graft.sources.Tables.documents(spark, sf0001).count().toInt)
    // extension-free filenames: kind is provable only by magic bytes —
    // every file must resolve, and to the kind its media_id encodes
    rows.foreach { r =>
      val id = r.getString(idx("file_name")).stripPrefix("asset_").stripSuffix(".bin").toLong
      val expected = (id % 3, id % 2) match {
        case (0, 0) => "png"
        case (0, _) => "jpeg"
        case (1, _) => "wav"
        case (_, _) => "avi"
      }
      assert(r.getString(idx("container")) === expected,
        s"container sniff failed for ${r.getString(idx("file_name"))}")
      assert(r.getLong(idx("n_bytes")) > 0)
    }
    // the staged bytes are the encoder's bytes: digest a sampled file
    val sample = rows.head
    val path = new java.io.File(Media.AssetFilesRoot,
      sample.getString(idx("file_name")))
    val bytes = java.nio.file.Files.readAllBytes(path.toPath)
    val hexStr = bytes.map("%02X".format(_)).mkString
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(hexStr.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sample.getString(idx("content_md5")) === dig)
  }

  test("mediaFilter: per-rule flags re-derive from parsed metadata, gate discriminates per kind") {
    val meta = Media.mediaMeta(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5)))).toMap
    val rows = Media.mediaFilter(spark, sf0001).collect()
    assert(rows.length === meta.size)
    val idx = rows.head.schema.fieldNames.zipWithIndex.toMap
    rows.foreach { r =>
      val id = r.getLong(idx("media_id"))
      val (kind, bytes, w, h, frames) = meta(id)
      assert(r.getString(idx("kind")) === kind)
      val expRes = if (kind != "audio") (w >= 128 && h >= 128) else frames >= 300
      val expAsp = kind == "audio" || math.max(w, h) <= math.min(w, h) * 3
      val expSize = bytes >= 256
      assert(r.getInt(idx("pass_resolution")) === (if (expRes) 1 else 0), s"res @ $id")
      assert(r.getInt(idx("pass_aspect")) === (if (expAsp) 1 else 0), s"aspect @ $id")
      assert(r.getInt(idx("pass_size")) === (if (expSize) 1 else 0), s"size @ $id")
      assert(r.getInt(idx("keep")) ===
        (if (expRes && expAsp && expSize) 1 else 0), s"keep @ $id")
    }
    // every kind sees both verdicts on the fixture — no rule is vacuous
    Seq("image", "audio", "video").foreach { k =>
      val keeps = rows.filter(_.getString(idx("kind")) == k).map(_.getInt(idx("keep"))).toSet
      assert(keeps === Set(0, 1), s"gate degenerate for kind $k: $keeps")
    }
    // the streaming twin over the drop equals the batch gate restricted
    // to the drop — kinds sniffed from magic bytes, not envelopes
    val streamed = graft.streaming.EventStreams
      .streamMediaFilterQuery(spark, sf0001).collect().map(_.toSeq).toSet
    val batchDrop = rows.filter(_.getLong(idx("media_id")) % 10 == 0)
      .map(_.toSeq).toSet
    assert(streamed === batchDrop)
    assert(streamed.nonEmpty)
    // the per-kind report re-aggregates the gate exactly
    val report = Media.mediaReport(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    report.foreach { case (k, (na, nk, cr, ca, cs, rate)) =>
      val of = rows.filter(_.getString(idx("kind")) == k)
      assert(na === of.length.toLong)
      assert(nk === of.count(_.getInt(idx("keep")) == 1).toLong)
      assert(cr === of.count(_.getInt(idx("pass_resolution")) == 0).toLong)
      assert(ca === of.count(_.getInt(idx("pass_aspect")) == 0).toLong)
      assert(cs === of.count(_.getInt(idx("pass_size")) == 0).toLong)
      assert(math.abs(rate - nk.toDouble / na) <= 5e-5 + 1e-9)
    }
    assert(report.keySet === Set("image", "audio", "video"))
  }

  test("gate fails ALL rules for kind 'unknown' (malformed assets surface, not pattern-match)") {
    // The streaming gate sniffs kind from magic bytes, so a corrupt asset
    // arrives as 'unknown' — it must fail every rule explicitly rather
    // than falling into the visual branch (which could PASS it on
    // garbage width/height fields, and would make batch and stream
    // diverge on malformed drops).
    import spark.implicits._
    val meta = Seq(
      (1L, "unknown", 10000L, 4096, 4096, 999),  // would pass every visual rule
      (2L, "image", 10000L, 4096, 4096, 1)       // control: same fields, real kind
    ).toDF("media_id", "kind", "n_bytes", "width", "height", "n_frames")
    val got = Media.gateFlags(meta).orderBy("media_id").collect()
    assert(got(0).getInt(2) === 0 && got(0).getInt(3) === 0 && got(0).getInt(4) === 0,
      s"unknown kind passed a gate rule: ${got(0)}")
    assert(got(0).getAs[Int]("keep") === 0)
    assert(got(1).getAs[Int]("keep") === 1, s"control image should pass: ${got(1)}")
  }

  test("compactionPlan: contiguous groups, full coverage, bounded overshoot") {
    import org.apache.spark.sql.functions._
    val plan = graft.multimodal.Media.compactionPlan(spark, sf0001, targetBytes = 1024L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    val dir = graft.multimodal.Media.ensureAssetFiles(spark, sf0001)
    val files = spark.read.format("binaryFile").load(dir)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("f"), col("length"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // coverage: every file in exactly one group, byte totals reconcile
    assert(plan.map(_._2).sum === files.length.toLong)
    assert(plan.map(_._3).sum === files.map(_._2).sum)
    // contiguity: name ranges are ordered and disjoint across groups
    plan.sortBy(_._1).sliding(2).foreach {
      case Array((ga, _, _, _, lastA), (gb, _, _, firstB, _)) =>
        assert(ga < gb && lastA < firstB, s"groups $ga/$gb interleave: $lastA vs $firstB")
      case _ =>
    }
    // bounded overshoot: a multi-file group exceeds the target by at most
    // its last file (the start-offset binning contract)
    val sizeByName = files.toMap
    plan.filter(_._2 > 1).foreach { case (g, _, total, _, last) =>
      assert(total - sizeByName(last) < 1024L,
        s"group $g overfilled before its last file: $total")
    }
    // non-degenerate at this target: multiple groups, some multi-file
    assert(plan.length > 1 && plan.exists(_._2 > 1))
  }

  test("media index: indexed catcher ≡ per-run catcher; plan reads the store, never the bytes") {
    import graft.multimodal.MediaIndex
    val direct = Media.mediaDupEncodedPacked(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val indexed = MediaIndex.mediaDupIndexed(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(indexed.nonEmpty && indexed.toSeq === direct.toSeq,
      "store-fed pairs must equal the per-run feature pairs row for row")
    // ZERO store-side re-fingerprint: after the (fingerprint-gated) build,
    // the query plan is pure relational reads of the two store tables —
    // no typed feature kernel (SerializeFromObject) and no scan of the
    // staged payload shards
    val plan = MediaIndex.mediaDupIndexed(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject"),
      s"indexed catcher re-ran the feature kernel:\n$plan")
    assert(!plan.contains("graft_media_encpacked"),
      s"indexed catcher re-scanned the staged payload shards:\n$plan")
    assert(plan.contains("graft_mediaidx_"),
      s"indexed catcher did not read the store tables:\n$plan")
  }

  test("media_near_dup_lsh: catches the re-encode class the size block is blind to") {
    import graft.multimodal.MediaIndex
    val dir = Media.ensurePackedEncoded(spark, sf0001)
    val universe = spark.read.parquet(dir)
    val mx = spark.read.parquet(s"$sf0001/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0)
    val lens = universe.select(col("media_id"), length(col("payload")).cast("long").as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the planted MODIFIED re-encodes: byte-dropped copies (length changed)
    val planted = lens.keys.filter(b => b <= mx && b % 13 == 11 &&
      lens.contains(b + mx) && lens(b) != lens(b + mx))
      .map(b => (b, b + mx)).toSet
    assert(planted.nonEmpty, "fixture must contain modified re-encodes")
    val lsh = MediaIndex.mediaNearDupLsh(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(lsh),
      s"LSH missed planted re-encodes: ${(planted -- lsh).take(5)}")
    // the (container, exact-size) block cannot pair a size-changed copy
    val sizeBlocked = Media.nearDupFromFeatures(Media.nearDupFeaturesPacked(universe))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((planted & sizeBlocked).isEmpty,
      "a size-changed copy appeared under exact-size blocking — fixture broken")
    // histogram cost only, served from the store: no per-byte kernel, no
    // payload re-scan in the query plan
    val plan = MediaIndex.mediaNearDupLsh(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject") &&
           !plan.contains("graft_media_encpacked"),
      s"LSH catcher must read features from the store:\n$plan")
  }

  test("media_dup_cycle: corpus-build + drop-append ≡ whole-build; steady state re-serves without feature work") {
    import graft.multimodal.MediaIndex
    import graft.sources.Warehouse
    val cycle = MediaIndex.mediaDupCycle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val whole = MediaIndex.mediaDupIndexed(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(cycle.nonEmpty && cycle.toSeq === whole.toSeq,
      "append-extended store must serve the whole-build pair set row for row")
    // steady state: stamps read cyc-full and a re-run appends nothing —
    // table row mass unchanged (a second append would double the drop)
    val prefix = MediaIndex.indexPrefix(sf0001, "cyc")
    val featRows = spark.table(s"${prefix}_feats").count()
    val again = MediaIndex.mediaDupCycle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(again.toSeq === cycle.toSeq)
    assert(spark.table(s"${prefix}_feats").count() === featRows,
      "steady-state cycle re-run must not re-append the drop")
    // crash mid-append: the in-flight marker must force full recovery,
    // and the recovered store serves the same answer
    Warehouse.stampFingerprint(spark, s"${prefix}_feats",
      graft.operators.IncrementalDedup.InFlightMarker)
    val recovered = MediaIndex.mediaDupCycle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(recovered.toSeq === cycle.toSeq,
      "marker recovery must rebuild to the same served answer")
    assert(spark.table(s"${prefix}_feats").count() === featRows)
  }

  test("media index maintenance: append extends to the full answer; compaction preserves it") {
    import graft.multimodal.MediaIndex
    import graft.sources.Warehouse
    val prefix = MediaIndex.buildIndex(spark, sf0001, "corp")
    try {
      val dir = Media.ensurePackedEncoded(spark, sf0001)
      val delta = spark.read.parquet(dir)
        .filter(col("media_id") % MediaIndex.DeltaMod === 0)
      MediaIndex.appendToMediaIndex(delta, prefix)
      MediaIndex.requireNotMidAppend(spark, prefix)
      def pairsFromStore() = Media.encodedPairCore(
          spark.table(s"${prefix}_postings"),
          spark.table(s"${prefix}_feats").select("media_id", "container", "permille"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      val full = MediaIndex.mediaDupIndexed(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      assert(pairsFromStore().toSeq === full.toSeq,
        "corpus index + appended delta must answer exactly like the full-universe index")
      // appends accumulate files; compaction resets to one per bucket and
      // must not change a single pair
      Warehouse.compactBucketed(spark, s"${prefix}_postings", Seq("fp"), MediaIndex.Buckets)
      Warehouse.compactBucketed(spark, s"${prefix}_feats", Seq("media_id"), MediaIndex.Buckets)
      assert(Warehouse.dataFileCount(spark, s"${prefix}_postings") === MediaIndex.Buckets)
      assert(pairsFromStore().toSeq === full.toSeq,
        "compaction changed the answer")
      // a crash mid-append leaves the in-flight marker: serving must refuse
      Warehouse.stampFingerprint(spark, s"${prefix}_feats",
        graft.operators.IncrementalDedup.InFlightMarker)
      intercept[IllegalArgumentException] {
        MediaIndex.requireNotMidAppend(spark, prefix)
      }
    } finally
      // the appended 'corp' store now holds full-universe content under the
      // corpus stamp — drop it so later consumers rebuild instead of
      // silently reading the polluted spec state
      MediaIndex.tableNames(prefix).foreach(Warehouse.dropTableAndLocation(spark, _))
  }

  test("media release: waterfall reconciles with the export; export reads only persisted artifacts") {
    import graft.multimodal.MediaIndex
    val report = MediaIndex.mediaReleaseReport(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                           r.getLong(3), r.getLong(4)))
    assert(report.map(_._2).toSeq ===
      Seq("quality_gate", "exact_dedup", "copy_catchers", "takedown"))
    // sequential waterfall: each stage's n_in is the previous n_out,
    // drops are non-negative, and every gate does real work on the
    // all-copy-class universe (a stage with zero drops means its planted
    // class is missing)
    report.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 === a._5, s"stage ${b._2} n_in must equal ${a._2} n_out") }
    report.foreach { case (_, stage, nin, ndrop, nout) =>
      assert(ndrop >= 0L && nout === nin - ndrop)
      assert(ndrop > 0L, s"stage $stage dropped nothing — planted class missing")
    }
    // final n_out is exactly the export's row count
    val export = MediaIndex.mediaExport(spark, sf0001)
    assert(export.count() === report.last._5,
      "export row count must equal the waterfall's final n_out")
    // the export must not contain any takedown-requested id
    val reqIds = export.filter(
      col("media_id") % MediaIndex.TakedownMod === MediaIndex.TakedownRes).count()
    assert(reqIds === 0L, "a takedown-requested asset survived the export")
    // store-fed, plan-asserted (the media_dup_indexed discipline): after
    // the gated build, the export plan is pure relational reads of the
    // release tables — no typed payload kernel, no staged-shard scan
    val plan = MediaIndex.mediaExport(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject"),
      s"export re-ran a payload kernel:\n$plan")
    assert(!plan.contains("graft_media_release"),
      s"export re-scanned the staged release shards:\n$plan")
    assert(plan.contains("graft_mediaidx_"),
      s"export did not read the persisted release tables:\n$plan")
  }

  test("media takedown closure: component removal is leak-free; a one-hop manifest is caught") {
    import graft.multimodal.MediaIndex
    // the shipped closure is a theorem: both endpoints of any pair share
    // a component, so no pair can cross the removal boundary
    assert(MediaIndex.mediaTakedownVerify(spark, sf0001).count() === 0L,
      "component-closed removal leaked a verified copy pair")
    // breach injection (the takedownVerify discipline): rebuild the
    // BROKEN one-hop manifest by hand — requests plus direct partners
    // only — and show the gate catches the transitive chains it leaks
    val prefix = MediaIndex.buildReleaseIndex(spark, sf0001)
    val pairs = spark.table(s"${prefix}_pairs")
      .select("canonical_id", "dup_id").distinct()
    val req = spark.table(s"${prefix}_meta")
      .filter(col("media_id") % MediaIndex.TakedownMod === MediaIndex.TakedownRes)
      .select("media_id")
    val oneHop = req
      .unionByName(pairs.join(req.withColumnRenamed("media_id", "canonical_id"),
          Seq("canonical_id")).select(col("dup_id").as("media_id")))
      .unionByName(pairs.join(req.withColumnRenamed("media_id", "dup_id"),
          Seq("dup_id")).select(col("canonical_id").as("media_id")))
      .distinct()
    val leaks = MediaIndex.takedownViolations(pairs, oneHop).count()
    assert(leaks > 0L,
      "the fixture has no transitive copy chain through a request — " +
        "the closure upgrade is unobservable; strengthen the universe")
  }

  test("media_release_cycle: corpus-build + drop-append serves the whole-build export; steady state appends nothing") {
    import graft.multimodal.MediaIndex
    val cycle = MediaIndex.mediaReleaseCycle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val whole = MediaIndex.mediaExport(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(cycle.nonEmpty && cycle.toSeq === whole.toSeq,
      "append-extended release store must serve the whole-build export row for row")
    // steady state: stamps read relc-full and a re-run appends nothing —
    // scan-table row mass unchanged (a second append would double-count
    // the drop in every digest group and pair)
    val prefix = MediaIndex.indexPrefix(sf0001, "relc")
    val featRows = spark.table(s"${prefix}_feats").count()
    val metaRows = spark.table(s"${prefix}_meta").count()
    val again = MediaIndex.mediaReleaseCycle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSeq === cycle.toSeq)
    assert(spark.table(s"${prefix}_feats").count() === featRows &&
           spark.table(s"${prefix}_meta").count() === metaRows,
      "steady-state cycle re-run must not re-append the drop")
  }

  test("media_split: no verified copy pair crosses a split boundary; proportions near 80/10/10") {
    import graft.multimodal.MediaIndex
    val split = MediaIndex.mediaSplit(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val prefix = MediaIndex.buildReleaseIndex(spark, sf0001)
    val pairs = spark.table(s"${prefix}_pairs")
      .select("canonical_id", "dup_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) === split(b),
        s"copy pair ($a, $b) split across ${split(a)}/${split(b)} — leakage")
    }
    val byTier = split.values.groupBy(identity).view.mapValues(_.size).toMap
    val n = split.size.toDouble
    assert(byTier("train") / n > 0.6 && byTier("train") / n < 0.95)
    assert(byTier.keySet === Set("train", "val", "test"))
  }

  test("media_lsh_recall: planted class reads the catch-window theorem 1000‰; detected ⊆ truth") {
    import graft.multimodal.MediaIndex
    val rows = MediaIndex.mediaLshRecall(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("loose", "planted"),
      "both declared classes must row out even when empty")
    // planted pairs (L1 <= 8) sit inside the deterministic <=1-bucket
    // probe window — recall is a theorem, and the instrument must read it
    assert(rows("planted").getLong(3) === 1000L,
      s"planted recall must be 1000: ${rows("planted")}")
    rows.values.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) || r.getLong(1) === 0L,
        s"detected must be a subset of the exact truth: $r")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000L, s"$r")
    }
  }

  test("compactionRun: every group's compacted bytes equal the originals, and the plan is covered") {
    val rows = Media.compactionRun(spark, sf0001).collect()
    assert(rows.length >= 2, s"fixture must produce several groups: ${rows.length}")
    rows.foreach { r =>
      assert(r.getBoolean(4),
        s"compacted object content differs from its input files: $r")
      assert(r.getLong(2) === r.getLong(3),
        s"compacted byte total must equal the plan's: $r")
    }
    // the run covers exactly the plan's groups with the plan's masses
    val plan = Media.compactionPlan(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq === plan.toSeq)
  }

  test("compactionRun crash re-entry: debris, a lost pointer, and a lost version all converge") {
    val green = Media.compactionRun(spark, sf0001).collect()
    val root = java.nio.file.Paths.get(Media.CompactedFilesRoot)
    val parent = root.getParent.toFile
    def versions() = parent.listFiles()
      .filter(f => f.getName.startsWith(root.getFileName.toString + ".v")).toSeq
    assert(versions().nonEmpty)
    // (a) in-flight build debris from a crashed writer is ignored
    val debris = new java.io.File(parent, root.getFileName.toString + ".tmp-crashed")
    debris.mkdirs()
    java.nio.file.Files.write(debris.toPath.resolve("half.bin"), Array[Byte](1, 2, 3))
    assert(Media.compactionRun(spark, sf0001).collect() === green)
    assert(debris.isDirectory, "foreign in-flight debris is vacuum's job, not the reader's")
    debris.toPath.resolve("half.bin").toFile.delete(); debris.delete()
    // (b) crash between version rename and pointer flip: link missing
    java.nio.file.Files.deleteIfExists(root)
    assert(Media.compactionRun(spark, sf0001).collect() === green)
    assert(java.nio.file.Files.isSymbolicLink(root), "pointer must be re-flipped")
    // (c) version lost entirely: full rebuild converges to the same state
    java.nio.file.Files.deleteIfExists(root)
    versions().foreach { v =>
      v.listFiles().foreach(_.delete()); v.delete()
    }
    assert(Media.compactionRun(spark, sf0001).collect() === green)
  }
}
