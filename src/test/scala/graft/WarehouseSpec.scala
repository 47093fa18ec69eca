package graft

import org.apache.spark.sql.functions._
import graft.sources.{Tables, Warehouse}

/** Plan-level proof of the storage-side scale features: bucketed joins run
  * with zero Exchange, partitioned layouts prune at planning time. */
class WarehouseSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key plans with NO Exchange") {
    Warehouse.writeBucketed(
      Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey", "orders_b")
    Warehouse.writeBucketed(
      Tables.customer(spark, sf0001).select("c_custkey", "c_mktsegment"),
      "c_custkey", "customer_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Warehouse.cogroupJoin(spark, "orders_b", "customer_b",
        "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      assert(joined.count() ===
        Tables.orders(spark, sf0001).join(Tables.customer(spark, sf0001),
          col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

  // AQE nests finalized stages as leaf nodes — flatten through them.
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case _ => p.children
  }).flatMap(flatten)

  // A store scan is "before a join" if it is reachable without passing
  // through a join node — i.e. the store STREAM itself, pre-join.
  private def storeScanBeforeJoin(p: SparkPlan,
                                  marker: String = "graft_corpus_"): Boolean = p match {
    case j if j.nodeName.contains("Join") => false
    case s if s.nodeName.contains("Scan") &&
      s.toString.contains(marker) => true
    case a: AdaptiveSparkPlanExec => storeScanBeforeJoin(a.executedPlan, marker)
    case q: QueryStageExec => storeScanBeforeJoin(q.plan, marker)
    case r: ReusedExchangeExec => storeScanBeforeJoin(r.child, marker)
    case other => other.children.exists(storeScanBeforeJoin(_, marker))
  }

  // Shuffling a JOIN RESULT (candidate dedup, final sort) is the
  // delta/candidate side paying its cost — fine. A shuffle between a
  // store scan and its consuming join means the bucketed layout failed
  // to carry its partitioning into the join.
  private def assertNoStoreSideShuffle(df: org.apache.spark.sql.DataFrame,
                                       marker: String = "graft_corpus_"): Unit = {
    df.collect() // finalize the AQE plan before reading it
    val offenders = flatten(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeLike if storeScanBeforeJoin(e.child, marker) => e
    }
    assert(offenders.isEmpty,
      s"store-side shuffle present:\n${offenders.map(_.treeString).mkString}")
  }

  test("merge_upsert: the bucketed snapshot side of the merge never shuffles") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so the assert exercises the bucketed layout, not the
      // tiny-data broadcast path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.operators.Pipeline.mergeUpsert(spark, sf0001)
      assertNoStoreSideShuffle(df, "graft_orders_snap_")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("agg_incremental: the bucketed view side of the IVM merge never shuffles") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.operators.Pipeline.aggIncremental(spark, sf0001)
      assertNoStoreSideShuffle(df, "graft_custagg_snap_")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("incremental dedup store side reads bucket-local: no Exchange above a store scan") {
    graft.operators.IncrementalDedup.buildIndex(spark, sf0001)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force SMJ so the assert exercises the bucketed layout, not the
      // tiny-data broadcast path.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.operators.IncrementalDedup.deltaAgainstIndex(spark, sf0001)
      assertNoStoreSideShuffle(df)
      assert(df.count() > 0) // the split plants cross-split near-dups
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("appendToIndex closes the ingest loop: delta 2 detects a near-dup of delta 1") {
    import spark.implicits._
    import graft.operators.IncrementalDedup
    import graft.operators.IncrementalDedup.IndexParams
    val p = IndexParams(buckets = 4)
    // prefix matches the storeScanBeforeJoin "graft_corpus_" marker
    val prefix = "graft_corpus_apploop"
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    IncrementalDedup.buildIndexFrom(base, prefix, p)
    val text1 = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val delta1 = Seq((100L, text1)).toDF("doc_id", "text")
    // nothing in the base corpus resembles delta 1
    assert(IncrementalDedup.deltaAgainst(spark, delta1, prefix, p, 0.8).count() === 0)
    IncrementalDedup.appendToIndex(delta1, prefix, p)
    val delta2 = Seq((200L, text1)).toDF("doc_id", "text")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val r2 = IncrementalDedup.deltaAgainst(spark, delta2, prefix, p, 0.8)
      // appended files keep the bucket layout: still no store-side Exchange
      assertNoStoreSideShuffle(r2)
      val pairs = r2.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pairs === Seq((200L, 100L)))
      // the STREAMING verification table extended too — an appended doc's
      // shingle array must be joinable or the stream silently misses it
      assert(spark.table(s"${prefix}_sharr")
        .filter(col("doc_id") === 100L).count() === 1)
      // and the CONTAINMENT band table: an eval probe containing delta-1
      // text must route through _cbands against the APPENDED document
      val evalDocs = Seq((500L, text1)).toDF("doc_id", "text")
      val cont = IncrementalDedup
        .decontaminateAgainstIndex(spark, evalDocs, prefix, p, 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(cont.toSeq === Seq((500L, 100L)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("compactBucketed: appends pile up files, compaction returns to one per bucket") {
    import spark.implicits._
    val buckets = 4
    val t = "compact_t"
    def chunk(from: Int, to: Int) =
      (from until to).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Warehouse.writeBucketed(chunk(0, 100), Seq("k"), t, buckets)
    Warehouse.appendBucketed(chunk(100, 200), Seq("k"), t, buckets)
    Warehouse.appendBucketed(chunk(200, 300), Seq("k"), t, buckets)
    val before = Warehouse.dataFileCount(spark, t)
    assert(before > buckets, s"appends should add files per bucket, got $before")
    val expected = spark.table(t).collect().map(_.toString).sorted
    Warehouse.compactBucketed(spark, t, Seq("k"), buckets)
    val after = Warehouse.dataFileCount(spark, t)
    assert(after === buckets, s"expected one file per bucket, got $after")
    // contents identical, and the bucket layout still joins with no Exchange
    assert(spark.table(t).collect().map(_.toString).sorted.toSeq === expected.toSeq)
    Warehouse.writeBucketed(chunk(0, 50), Seq("k"), "compact_probe", buckets)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Warehouse.cogroupJoin(spark, t, "compact_probe", "k", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"), plan)
      assert(joined.count() === 50)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("compactPartitioned: appended partition files collapse to one per directory") {
    import spark.implicits._
    val t = "compact_part_t"
    def chunk(from: Int, to: Int) =
      (from until to).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "v", "k")
    Warehouse.writePartitionedTable(chunk(0, 100), "k", t)
    chunk(100, 200).write.mode(org.apache.spark.sql.SaveMode.Append).insertInto(t)
    chunk(200, 300).write.mode(org.apache.spark.sql.SaveMode.Append).insertInto(t)
    def filesPerPartition: Seq[Int] = {
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t.toLowerCase)
      loc.listFiles().filter(_.isDirectory).toSeq
        .map(_.listFiles().count(f => f.isFile && f.getName.startsWith("part-")))
    }
    assert(filesPerPartition.exists(_ > 1), s"appends should add files, got $filesPerPartition")
    val expected = spark.table(t).collect().map(_.toString).sorted.toSeq
    Warehouse.compactPartitioned(spark, t, "k")
    assert(filesPerPartition === Seq(1, 1, 1, 1), s"got $filesPerPartition")
    assert(spark.table(t).collect().map(_.toString).sorted.toSeq === expected)
    // partition pruning still applies after the rewrite
    val one = spark.table(t).filter(col("k") === 2)
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(k"),
      one.queryExecution.executedPlan.toString)
    assert(one.count() === 75)
  }

  test("compaction crash between DROP and RENAME recovers by rename, not rebuild") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    val t = "crash_compact_t"
    val buckets = 4
    Warehouse.writeBucketed(
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"), Seq("k"), t, buckets)
    Warehouse.stampFingerprint(spark, t, "fp1")
    val expected = spark.table(t).collect().map(_.toString).sorted.toSeq
    // Simulate compactBucketed dying INSIDE its DROP→RENAME window: the
    // twin is fully written and fingerprint-stamped (compactBucketed stamps
    // before the DROP for exactly this reason), the canonical entry is gone.
    Warehouse.writeBucketed(
      spark.table(t).repartition(buckets, pmod(hash(col("k")), lit(buckets))),
      Seq("k"), s"${t}__compact", buckets)
    Warehouse.stampFingerprint(spark, s"${t}__compact", "fp1")
    spark.sql(s"DROP TABLE `$t`")
    assert(!spark.catalog.tableExists(t))
    // the shared reuse gate recovers — the build closure must NOT run
    var rebuilt = false
    Warehouse.ensureDerivedTables(spark, Seq(t), "fp1") { rebuilt = true }
    assert(!rebuilt, "recovery must complete the rename, not rebuild")
    assert(Warehouse.storedFingerprint(spark, t).contains("fp1"))
    assert(spark.table(t).collect().map(_.toString).sorted.toSeq === expected)
    assert(Warehouse.dataFileCount(spark, t) === buckets)
    assert(!spark.catalog.tableExists(s"${t}__compact"))
  }

  test("partitioned compaction crash recovery repairs partition locations") {
    import spark.implicits._
    val t = "crash_compact_part_t"
    Warehouse.writePartitionedTable(
      (0 until 100).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "v", "k"), "k", t)
    Warehouse.stampFingerprint(spark, t, "fp2")
    val expected = spark.table(t).collect().map(_.toString).sorted.toSeq
    Warehouse.writePartitionedTable(
      spark.table(t).repartition(col("k")), "k", s"${t}__compact")
    Warehouse.stampFingerprint(spark, s"${t}__compact", "fp2")
    spark.sql(s"DROP TABLE `$t`")
    assert(Warehouse.recoverStrandedCompaction(spark, t))
    // partition entries must point at the RENAMED location: a stale-located
    // partition scans zero files, so row equality is the real proof
    assert(spark.table(t).collect().map(_.toString).sorted.toSeq === expected)
    assert(Warehouse.storedFingerprint(spark, t).contains("fp2"))
    assert(spark.table(t).filter(col("k") === 2).count() === 25)
    // a twin next to a LIVE canonical is pre-DROP debris: not recovered
    Warehouse.writePartitionedTable(
      spark.table(t).repartition(col("k")), "k", s"${t}__compact")
    assert(!Warehouse.recoverStrandedCompaction(spark, t))
    spark.sql(s"DROP TABLE `${t}__compact`")
  }

  test("maintenanceReport flags append fan-in and clears after compaction") {
    import spark.implicits._
    val buckets = 4
    val t = "health_t"
    def chunk(from: Int, to: Int) =
      (from until to).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Warehouse.writeBucketed(chunk(0, 40), Seq("k"), t, buckets)
    // five appends: fan-in grows to ~6 files per bucket — past factor 4
    (1 to 5).foreach(i => Warehouse.appendBucketed(chunk(i * 40, i * 40 + 40), Seq("k"), t, buckets))
    val before = Warehouse.maintenanceReport(spark, Seq(t)).head
    assert(before.units === buckets)
    assert(before.compactRecommended, s"$before")
    Warehouse.compactBucketed(spark, t, Seq("k"), buckets)
    val after = Warehouse.maintenanceReport(spark, Seq(t)).head
    assert(!after.compactRecommended && after.files === buckets, s"$after")
    // partitioned tables report live partition count as their unit
    val pt = "health_part_t"
    Warehouse.writePartitionedTable(
      (0 until 40).map(i => (i.toLong, i % 4)).toDF("id", "k"), "k", pt)
    val p = Warehouse.maintenanceReport(spark, Seq(pt)).head
    assert(p.units === 4 && !p.compactRecommended, s"$p")
  }

  test("partitioned parquet layout prunes partitions for a partition-column filter") {
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    Warehouse.writePartitioned(
      Tables.events(spark, sf0001).select("event_id", "event_type", "value"),
      "event_type", path)
    val one = spark.read.parquet(path).filter(col("event_type") === "click")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan)
    val expected = Tables.events(spark, sf0001)
      .filter(col("event_type") === "click").count()
    assert(one.count() === expected)
    // only the click directory is read
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.contains("event_type=click"))
  }

  // ---- versioned staged-root vacuum --------------------------------

  /** Build a synthetic version/symlink root exactly as Media.ensureVersioned
    * lays it out: version dirs `<root>.v<fp>` each holding one payload file,
    * symlink `<root>` → the named live version. Returns the root path. */
  private def stageFakeRoot(dir: java.nio.file.Path, versions: Seq[String],
                            live: String): String = {
    import java.nio.file.{Files, Paths}
    val root = dir.resolve("asset_root").toString
    versions.zipWithIndex.foreach { case (fp, i) =>
      val v = Paths.get(s"$root.v$fp")
      Files.createDirectories(v)
      Files.write(v.resolve("payload.bin"), Array.fill[Byte](16)(i.toByte))
      // deterministic recency order: later list entries are newer
      v.toFile.setLastModified(1000000L + i * 60000L)
    }
    Files.createSymbolicLink(Paths.get(root), Paths.get(s"$root.v$live"))
    root
  }

  test("vacuumVersionedRoot: drops superseded versions, pins the live target even when oldest") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_vac")
    // live is the OLDEST version — recency must not outrank the symlink
    val root = stageFakeRoot(dir, Seq("aaa", "bbb", "ccc"), live = "aaa")
    val before = Warehouse.versionedRootReport(Seq(root)).head
    assert(before.versions === 3 && before.deadVersions === 2 &&
      before.liveVersion === "asset_root.vaaa", s"$before")
    val res = Warehouse.vacuumVersionedRoot(root, keep = 1, debrisGraceMs = 0L)
    assert(res.deletedVersions === 1 && res.keptDead === 1, s"$res")
    // live target intact with its bytes; newest dead kept; oldest dead gone
    assert(Files.isDirectory(Paths.get(s"$root.vaaa")) &&
      Files.exists(Paths.get(s"$root.vaaa/payload.bin")))
    assert(Files.isDirectory(Paths.get(s"$root.vccc")))
    assert(!Files.exists(Paths.get(s"$root.vbbb")))
    assert(Files.readSymbolicLink(Paths.get(root)).toString.endsWith(".vaaa"))
    val after = Warehouse.versionedRootReport(Seq(root)).head
    assert(after.versions === 2 && after.deadVersions === 1, s"$after")
    // keep=0 empties the dead stock but never the live version
    Warehouse.vacuumVersionedRoot(root, keep = 0, debrisGraceMs = 0L)
    assert(Files.isDirectory(Paths.get(s"$root.vaaa")) &&
      !Files.exists(Paths.get(s"$root.vccc")))
  }

  test("vacuumVersionedRoot: debris sweep respects grace; stale .lnk is unlinked, not followed") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_vac")
    val root = stageFakeRoot(dir, Seq("aaa"), live = "aaa")
    // stale flip leftover: a SYMLINK into the live version — sweeping it
    // must unlink the link, never recurse into (and delete) live data.
    // A symlink's own mtime cannot be aged portably, so the stale case
    // runs with a negative grace (everything out-of-grace).
    val staleLnk = Paths.get(s"$root.lnk-stale")
    Files.createSymbolicLink(staleLnk, Paths.get(s"$root.vaaa"))
    val res = Warehouse.vacuumVersionedRoot(root, keep = 0, debrisGraceMs = -1L)
    assert(res.sweptDebris === 1, s"$res")
    assert(!Files.exists(staleLnk, java.nio.file.LinkOption.NOFOLLOW_LINKS))
    assert(Files.exists(Paths.get(s"$root.vaaa/payload.bin")),
      "sweeping the stale .lnk symlink must not follow it into live data")
    // fresh in-flight build: inside grace, must survive
    val freshTmp = Paths.get(s"$root.tmp-fresh")
    Files.createDirectories(freshTmp)
    Files.write(freshTmp.resolve("building.bin"), Array[Byte](1))
    Warehouse.vacuumVersionedRoot(root, keep = 0, debrisGraceMs = 3600000L)
    assert(Files.isDirectory(freshTmp), "in-grace tmp build must survive")
  }

  test("vacuumVersionedRoot: a DANGLING .lnk (target already vacuumed) is swept, not leaked") {
    import java.nio.file.{Files, LinkOption, Paths}
    val dir = Files.createTempDirectory("graft_vac")
    val root = stageFakeRoot(dir, Seq("aaa"), live = "aaa")
    // crashed-flip debris pointing at a version dir that no longer exists:
    // File.exists() follows the link and reads false, which would skip the
    // sweep forever — the NOFOLLOW existence check is what catches it
    val dangling = Paths.get(s"$root.lnk-dangling")
    Files.createSymbolicLink(dangling, Paths.get(s"$root.vgone"))
    val res = Warehouse.vacuumVersionedRoot(root, keep = 0, debrisGraceMs = -1L)
    assert(res.sweptDebris === 1, s"dangling link must be swept: $res")
    assert(!Files.exists(dangling, LinkOption.NOFOLLOW_LINKS),
      "the dangling .lnk entry itself must be gone")
    assert(Files.exists(Paths.get(s"$root.vaaa/payload.bin")), "live data intact")
  }

  test("vacuumVersionedRoot: a FRESH .lnk whose TARGET is old survives grace (NOFOLLOW mtime)") {
    import java.nio.file.{Files, Paths}
    // the mid-flip race: Media.ensureVersioned reuses an hours-old staged
    // version dir and has just created its .lnk-* aside-link (fresh);
    // judging the link by its TARGET's mtime would sweep it mid-flip and
    // fail the writer's atomic rename
    val dir = Files.createTempDirectory("graft_vac")
    val root = stageFakeRoot(dir, Seq("aaa"), live = "aaa")
    Paths.get(s"$root.vaaa").toFile.setLastModified(0L) // hours-old target
    val freshLnk = Paths.get(s"$root.lnk-inflight")
    Files.createSymbolicLink(freshLnk, Paths.get(s"$root.vaaa")) // created NOW
    val res = Warehouse.vacuumVersionedRoot(root, keep = 0, debrisGraceMs = 3600000L)
    assert(res.sweptDebris === 0, s"$res")
    assert(Files.exists(freshLnk, java.nio.file.LinkOption.NOFOLLOW_LINKS),
      "a fresh in-flight flip link must be judged by its OWN mtime, not its target's")
  }

  test("vacuumVersionedRoot: kill mid-vacuum leaves no reusable half-version; rerun recovers") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_vac")
    val root = stageFakeRoot(dir, Seq("aaa", "bbb"), live = "bbb")
    // simulate the crash window: vacuum renamed the dead version to trash
    // (step 1) and died before deleting contents (step 2)
    val trash = Paths.get(s"$root.trash-killed")
    Files.move(Paths.get(s"$root.vaaa"), trash, StandardCopyOption.ATOMIC_MOVE)
    // THE invariant: the .v name is gone, so the writer's isDirectory
    // reuse gate can never adopt a half-deleted version as complete
    assert(!Files.exists(Paths.get(s"$root.vaaa")))
    assert(Files.exists(trash.resolve("payload.bin")), "contents still pending delete")
    // rerun: trash is swept unconditionally (no grace), live untouched
    val res = Warehouse.vacuumVersionedRoot(root, keep = 0, debrisGraceMs = 3600000L)
    assert(res.sweptDebris === 1 && res.deletedVersions === 0, s"$res")
    assert(!Files.exists(trash))
    assert(Files.exists(Paths.get(s"$root.vbbb/payload.bin")))
  }

  test("streamingCheckpointReport: a real checkpoint parses; a planted orphan surfaces") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt_spec")
    root.toFile.deleteOnExit()
    // a REAL stateful query checkpointed under root/q1 — proves the
    // recognizer matches Spark's actual layout, not a hand-drawn one
    val src = java.nio.file.Files.createTempDirectory("graft_ckpt_src")
    src.toFile.deleteOnExit()
    spark.range(20).selectExpr("id % 5 AS k").write.mode("overwrite")
      .parquet(src.toString)
    val q = spark.readStream.schema("k BIGINT").parquet(src.toString)
      .dropDuplicates("k")
      .writeStream.format("memory").queryName("ckpt_spec_sink")
      .option("checkpointLocation", s"$root/q1")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.catalog.dropTempView("ckpt_spec_sink")
    // a PLANTED orphan under root/q2: offsets ahead of commits (mid-batch
    // crash signature) with state on disk
    def touch(p: String, bytes: Int = 0): Unit = {
      val f = new java.io.File(root.toFile, p)
      f.getParentFile.mkdirs()
      val os = new java.io.FileOutputStream(f)
      try os.write(new Array[Byte](bytes)) finally os.close()
    }
    Seq("q2/offsets/0", "q2/offsets/1", "q2/offsets/2",
        "q2/commits/0", "q2/commits/1").foreach(touch(_))
    touch("q2/state/0/0/1.delta", 2048)
    val report = Warehouse.streamingCheckpointReport(root.toString)
      .map(h => new java.io.File(h.dir).getName -> h).toMap
    assert(report.keySet === Set("q1", "q2"))
    val q1 = report("q1")
    assert(q1.latestOffset >= 0L && q1.latestCommit === q1.latestOffset,
      s"finished query must be fully committed: $q1")
    assert(!q1.inFlight)
    assert(q1.stateBytes > 0L && q1.stateFiles > 0,
      s"dropDuplicates state must be on disk: $q1")
    val q2 = report("q2")
    assert(q2.inFlight && q2.latestOffset === 2L && q2.latestCommit === 1L,
      s"planted orphan not surfaced: $q2")
    assert(q2.stateBytes === 2048L && q2.stateFiles === 1)
    assert(report.values.forall(_.ageMs >= 0L))
  }

  test("vacuumStagedRoots covers every media root; live staged universes survive") {
    // stage at least one real root, then vacuum everything Media manages
    graft.multimodal.Media.ensureAssetFiles(spark, sf0001)
    val results = graft.multimodal.Media.vacuumStagedRoots(keep = 1)
    // derive the expected count from the module's own root list (a
    // hard-coded count baked in the round-10 omission of the encoded
    // root: a NEW staged root must enlarge this list or leak forever)
    assert(results.length === graft.multimodal.Media.stagedRoots.length)
    assert(results.map(_.root).toSet === graft.multimodal.Media.stagedRoots.toSet)
    // the live asset universe is still there and non-empty
    val live = new java.io.File("/tmp/graft_media_files").listFiles()
    assert(live != null && live.nonEmpty)
  }

  test("adjudicated registry: SURVEY §6.1.a parses; known trades carry sane bounds") {
    val adj = graft.tools.Adjudicated.load()
    // the rows both gates depend on — a silently-shrunk registry would
    // turn adjudicated trades back into red flags
    Seq("dedup_ngram", "decontaminate", "interval_join",
        "semdedup_recall", "media_lsh_recall").foreach { q =>
      assert(adj.contains(q), s"registry lost $q")
      assert(adj(q).maxWarmSlope.exists(s => s > 1.0 && s < 20.0), s"${adj.get(q)}")
    }
    val band = adj("compaction_plan").bandSec
    assert(band.exists { case (lo, hi) => lo < hi && hi <= 5.0 }, s"$band")
    adj.values.foreach { e =>
      assert(e.maxWarmSlope.nonEmpty || e.bandSec.nonEmpty,
        s"adjudicated row binds neither gate: $e")
      assert(e.reason.nonEmpty, s"adjudication without a reason: $e")
    }
  }

  test("pre-seal hygiene: tmpBytes sees a planted probe dir, sweep removes it, bytes drop") {
    // the r12 phantom-flag lesson as a gate: a leftover ×10-probe corpus
    // must be (a) visible in the measured tmp bytes and (b) gone after the
    // sweep Bench now runs before pass 1 — structurally, not by hand
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val probe = new java.io.File(tmp, "graft_scale_x9test")
    probe.mkdirs()
    val payload = new java.io.FileOutputStream(new java.io.File(probe, "part-0.parquet"))
    try payload.write(new Array[Byte](1 << 20)) finally payload.close()
    val before = Warehouse.tmpBytes()
    assert(before >= (1 << 20).toLong, s"planted 1MB probe not visible: $before")
    val swept = Warehouse.sweepScaleProbeDirs()
    assert(swept >= 1, "the planted probe dir must be swept")
    assert(!probe.exists(), "probe dir still on disk after sweep")
    val after = Warehouse.tmpBytes()
    assert(after <= before - (1 << 20).toLong,
      s"tmp bytes must drop by at least the planted payload: $before -> $after")
    // symlinks count zero: a staged root's live link must not double-count
    val target = new java.io.File(tmp, "graft_lnktest.v1")
    target.mkdirs()
    val link = new java.io.File(tmp, "graft_lnktest")
    java.nio.file.Files.deleteIfExists(link.toPath)
    java.nio.file.Files.createSymbolicLink(link.toPath, target.toPath)
    try {
      val os = new java.io.FileOutputStream(new java.io.File(target, "d"))
      try os.write(new Array[Byte](4096)) finally os.close()
      val withLink = Warehouse.tmpBytes("graft_lnktest")
      assert(withLink === 4096L, s"symlink must count zero, got $withLink")
    } finally {
      java.nio.file.Files.deleteIfExists(link.toPath)
      new java.io.File(target, "d").delete(); target.delete()
    }
  }

  test("stale derived-store retirement: old generations reported and vacuumed, live kept (r13 task 7)") {
    import spark.implicits._
    val mk = (name: String) =>
      Seq((1L, "x")).toDF("k", "v").write.mode("overwrite").saveAsTable(name)
    val current = "fp_current_abc123"
    try {
      mk("graft_staletest_idx_cells"); mk("graft_staletest_idx_rb_cells")
      mk("graft_staletest_idx_stats"); mk("graft_staletest_unstamped")
      // live store: any lifecycle stamp embedding the current fingerprint
      Warehouse.stampFingerprint(spark, "graft_staletest_idx_cells", s"$current|auto-full|i3")
      // a superseded generation: stamped against a PREVIOUS source fingerprint
      Warehouse.stampFingerprint(spark, "graft_staletest_idx_rb_cells", "fp_old_999|auto-rebuilt")
      // an in-flight stamp from a dead process: also not the current generation
      Warehouse.stampFingerprint(spark, "graft_staletest_idx_stats", "append-in-flight")
      val stale = Warehouse.staleTableReport(spark, "graft_staletest_", current)
      assert(stale.map(_.table).sorted ===
        Seq("graft_staletest_idx_rb_cells", "graft_staletest_idx_stats"),
        s"report must flag exactly the non-current stamped generation: $stale")
      val dropped = Warehouse.vacuumStaleTables(spark, "graft_staletest_", current)
      assert(dropped.sorted === Seq("graft_staletest_idx_rb_cells", "graft_staletest_idx_stats"))
      assert(spark.catalog.tableExists("graft_staletest_idx_cells"),
        "the live generation must survive the vacuum")
      assert(spark.catalog.tableExists("graft_staletest_unstamped"),
        "tables without a graft stamp are not ours to judge")
      assert(Warehouse.staleTableReport(spark, "graft_staletest_", current).isEmpty)
      // guard: an empty token would flag every stamped table
      intercept[IllegalArgumentException] {
        Warehouse.staleTableReport(spark, "graft_staletest_", "")
      }
    } finally {
      Seq("graft_staletest_idx_cells", "graft_staletest_idx_rb_cells",
          "graft_staletest_idx_stats", "graft_staletest_unstamped")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  test("orphaned probe tables: gone staged dir -> dropped; live staged dir -> kept") {
    import spark.implicits._
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val liveDir = new java.io.File(tmp, "graft_scale_x777001")
    val mk = (name: String) =>
      Seq((1L, "x")).toDF("k", "v").write.mode("overwrite").saveAsTable(name)
    try {
      liveDir.mkdirs()
      mk("graft_probetest_graft_scale_x777001_aa_feats") // staged dir exists
      mk("graft_probetest_graft_scale_x777002_bb_feats") // staged dir gone
      val orphans = Warehouse.orphanedProbeTables(spark)
        .filter(_.startsWith("graft_probetest_"))
      assert(orphans === Seq("graft_probetest_graft_scale_x777002_bb_feats"),
        s"only the gone-dir generation is an orphan: $orphans")
      Warehouse.vacuumOrphanedProbeTables(spark)
      assert(spark.catalog.tableExists("graft_probetest_graft_scale_x777001_aa_feats"),
        "a live probe corpus's tables must survive")
      assert(!spark.catalog.tableExists("graft_probetest_graft_scale_x777002_bb_feats"))
    } finally {
      liveDir.delete()
      Seq("graft_probetest_graft_scale_x777001_aa_feats",
          "graft_probetest_graft_scale_x777002_bb_feats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }
}
