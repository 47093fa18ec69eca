package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** PERSISTED media feature index — the media analogue of the text dedup
  * index ([[graft.operators.IncrementalDedup]]'s five-table discipline):
  * every media copy-class catcher needs the same per-asset features
  * (container sniff, byte length, 256-byte prefix digest, 32-bin histogram
  * + integer permille form, byte-winnow fingerprints), and recomputing them
  * from the staged bytes PER RUN is the one cost that cannot amortize —
  * at 100 TB the feature pass is the corpus scan itself (8 hash-mults per
  * byte for the winnow alone). This store pays that scan ONCE per corpus
  * state, and every catcher reads fixed-width feature rows instead of
  * payloads (plan-assertable: a store-fed query contains no payload scan
  * and no per-byte kernel — MediaSpec gates exactly that).
  *
  * Store layout (both via [[Warehouse.writeBucketed]] — the bucket hash IS
  * the later join's partitioning):
  *
  *  - `<prefix>_feats(media_id, container, n_bytes, prefix_md5, hist,
  *    permille, fps)` bucketed by media_id: one row per asset with every
  *    feature the catcher family consumes (the histogram/permille are 32
  *    longs, fps ~2n/(w+1) longs — the fps ARRAY is the streaming
  *    verification layout, the `_sharr` analogue: one codegen'd
  *    `array_intersect` per candidate instead of a stateful count).
  *  - `<prefix>_postings(fp, media_id)` bucketed by fp: the exploded
  *    winnow postings — the equi-join route to candidates; the hot-fp
  *    document-frequency cut and the postings self-join both run
  *    bucket-local on fp.
  *
  * Index identity: prefix carries the corpus token + universe split +
  * winnow params; tables are stamped with the source-parquet fingerprint
  * plus the staged-universe definition tag ([[Media.ensurePackedEncoded]]'s
  * `-drop101v1`), so neither regenerated data nor a generator change can be
  * silently reused ([[Warehouse.ensureDerivedTables]] gate).
  *
  * Maintenance follows [[graft.operators.IncrementalDedup.appendToIndex]]
  * verbatim: deltas append as new per-bucket files (nothing rewritten, the
  * bucket-local join property preserved), the append window is guarded by
  * the in-flight fingerprint marker (a crash mid-append fails the reuse
  * gate and rebuilds — loud, never a half-extended index served), and
  * [[Warehouse.compactBucketed]] resets read fan-in after many appends.
  */
object MediaIndex {

  private[graft] val Buckets = 8

  /** The universe split an index instance covers: the FULL staged encoded
    * universe (`all` — what [[mediaDupIndexed]] reads, so its output equals
    * `media_dup_encoded` on the same universe) or the CORPUS side of the
    * mod-10 ingest split (`corp` — what the streaming drop is checked
    * against, the [[graft.operators.IncrementalDedup.DeltaMod]]
    * convention). */
  private[graft] val DeltaMod = 10L

  def indexPrefix(sfDir: String, split: String): String = {
    val sf = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_")
    s"graft_mediaidx_${sf}_${Warehouse.pathToken(sfDir)}_${split}" +
      s"_k${Media.EncodedWinnowK}w${Media.EncodedWinnowW}"
  }

  private val TableSuffixes = Seq("feats", "postings")

  /** The two table names of one index instance. */
  def tableNames(prefix: String): Seq[String] = TableSuffixes.map(s => s"${prefix}_$s")

  /** One streamed feature pass over packed-grain assets `(media_id,
    * payload)`: every feature the catcher family consumes, in one
    * `mapPartitions`-shaped scan — payloads never leave it. */
  private[graft] def fullFeatures(assets: DataFrame): DataFrame = {
    import assets.sparkSession.implicits._
    assets.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        (id, Media.HeaderDecoder.sniffContainer(bytes), bytes.length.toLong,
         Media.prefixMd5Hex(bytes),
         Media.hist32(bytes).toSeq, Media.permille32(bytes).toSeq,
         Media.byteWinnow(bytes, Media.EncodedWinnowK, Media.EncodedWinnowW).toSeq)
      }.toDF("media_id", "container", "n_bytes", "prefix_md5",
             "hist", "permille", "fps")
  }

  /** The two per-table writes of one index extension, shared by build and
    * append. The feature frame is computed ONCE (localCheckpoint — both
    * tables consume it, and the per-byte winnow kernel must never run
    * twice); `_postings` explodes from the truncated frame, not from a
    * re-scan. Write order is load-bearing the same way the text index's
    * ledger is: `_feats` — the table the streaming verify path and any
    * replay reads per-asset — commits LAST, so a crash between the writes
    * leaves postings without feats (candidates that fail to verify → a
    * re-run, surfaced by the fingerprint gate), never feats without
    * postings (assets that silently stop producing candidates). */
  private def writeIndexTables(rawFeats: DataFrame, prefix: String,
                               append: Boolean): Unit = {
    val feats = rawFeats.localCheckpoint(true)
    def write(df: DataFrame, keys: Seq[String], table: String): Unit =
      if (append) Warehouse.appendBucketed(df, keys, table, Buckets)
      else Warehouse.writeBucketed(df, keys, table, Buckets)
    write(feats.select(col("media_id"), explode(col("fps")).as("fp"))
            .select(col("fp"), col("media_id")),
          Seq("fp"), s"${prefix}_postings")
    write(feats, Seq("media_id"), s"${prefix}_feats")
  }

  /** Build (or fingerprint-validated reuse) the media feature index over
    * `sfDir`'s staged encoded universe at the given split. Returns the
    * table prefix. The build IS the one full feature scan; every later
    * consumer reads the store. */
  def buildIndex(spark: SparkSession, sfDir: String,
                 split: String = "all"): String = {
    val dir = Media.ensurePackedEncoded(spark, sfDir)
    val prefix = indexPrefix(sfDir, split)
    val fp = Warehouse.sourceFingerprint(sfDir, "documents") +
      s"-drop101v1|$split|k${Media.EncodedWinnowK}w${Media.EncodedWinnowW}x$Buckets"
    Warehouse.ensureDerivedTables(spark, tableNames(prefix), fp) {
      val universe = spark.read.parquet(dir)
      val assets =
        if (split == "corp") universe.filter(col("media_id") % DeltaMod =!= 0)
        else universe
      writeIndexTables(fullFeatures(assets), prefix, append = false)
    }
    prefix
  }

  /** Append a delta's features INTO the index — the maintenance half of
    * the media ingest cycle (land → dedup-against-store → extend store).
    * Bucketed appends: new files per bucket, bucket-local joins untouched.
    * The in-flight marker discipline is
    * [[graft.operators.IncrementalDedup.appendToIndex]]'s: stamps cleared
    * to a marker first, restored only after both appends commit, so a
    * crash mid-append fails the reuse gate and rebuilds instead of serving
    * a half-extended index. */
  def appendToMediaIndex(assets: DataFrame, prefix: String): Unit = {
    val spark = assets.sparkSession
    val tables = tableNames(prefix)
    val missing = tables.filterNot(spark.catalog.tableExists)
    require(missing.isEmpty,
      s"appendToMediaIndex: index '$prefix' is incomplete (missing " +
        s"${missing.mkString(", ")}) — build it first (buildIndex)")
    val stamps = tables.map(t => t -> Warehouse.storedFingerprint(spark, t)).toMap
    tables.foreach(t => Warehouse.stampFingerprint(spark, t,
      graft.operators.IncrementalDedup.InFlightMarker))
    writeIndexTables(fullFeatures(assets), prefix, append = true)
    tables.foreach(t =>
      Warehouse.stampFingerprint(spark, t, stamps(t).getOrElse("unstamped")))
  }

  /** Refuse to serve an index left mid-append by a crash (the
    * [[graft.operators.IncrementalDedup.requireNotMidAppend]] contract for
    * the media tables). */
  def requireNotMidAppend(spark: SparkSession, prefix: String): Unit = {
    val marked = tableNames(prefix)
      .filter(t => spark.catalog.tableExists(t) &&
        Warehouse.storedFingerprint(spark, t)
          .contains(graft.operators.IncrementalDedup.InFlightMarker))
    require(marked.isEmpty,
      s"media index '$prefix' has a half-committed append (in-flight marker " +
        s"on ${marked.mkString(", ")}) — rebuild before serving")
  }

  /** Driver-verified: [[Media.mediaDupEncoded]] served ENTIRELY from the
    * persisted feature store — the scale answer that op's doc comment
    * promises: candidates from the bucketed `_postings` table (hot-fp cut
    * and the pair self-join both bucket-local on fp), verification from
    * the `_feats` table's container/permille columns. ZERO store-side
    * re-fingerprint: the plan contains no payload scan and no per-byte
    * kernel (MediaSpec asserts no SerializeFromObject and no packed-root
    * path in the executed plan) — at 100 TB every run after the first
    * pays candidate generation + a 32-element fold per candidate, never
    * the 8-hash-mults-per-byte corpus scan. Output ≡ `media_dup_encoded`
    * on the same universe (the oracle IS that op's oracle chain over the
    * same staged shards), so the store's correctness is hash-proven, not
    * assumed. */
  def mediaDupIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    val prefix = buildIndex(spark, sfDir, "all")
    requireNotMidAppend(spark, prefix)
    Media.encodedPairCore(
      spark.table(s"${prefix}_postings"),
      spark.table(s"${prefix}_feats").select("media_id", "container", "permille"))
  }
}
