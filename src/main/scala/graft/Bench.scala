package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. A warmup pass at sf0.001 runs every query first so
  * the timed numbers measure the operators, not JVM/codegen JIT warmup
  * (the generated code per plan is identical across scale factors). */
object Bench {

  /** Release session state one query can leave behind for the next — the
    * r5 bench-tail diagnosis: queries are correct and their plans are
    * gated, but a single shared session accumulates (a) RDD-level persisted
    * blocks from `localCheckpoint` lineage truncation (invisible to
    * `catalog.clearCache`, which only tracks Dataset-level persists),
    * (b) memory-sink tables pinning full streaming results in the driver,
    * and (c) loaded streaming state-store providers plus their maintenance
    * thread. In the 8 GiB bench JVM that pushes the heap into sustained GC,
    * taxing every query that runs AFTER the accumulation — which in sorted
    * order is exactly the alphabetical tail behind the `stream_*` block.
    * Isolation makes each query's time a function of the query, not of its
    * position in the run order. */
  def isolateQueryState(spark: SparkSession): Unit = {
    // stray streams (defensive: queries run AvailableNow to termination)
    spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
    // memory-sink temp views — each pins a materialized result
    graft.streaming.EventStreams.dropSinkTables(spark)
    // Dataset-level cache entries, then RDD-level persists (localCheckpoint
    // blocks live ONLY here — they never register with the CacheManager)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    // unload state-store providers and park the maintenance thread; the
    // next streaming query restarts both lazily
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }

  /** Fixed CPU workload, timed — the host-noise detector: bench numbers
    * from a contended host (CPU steal, co-tenant load) inflate uniformly
    * and are indistinguishable from code regressions after the fact
    * (measured drift up to 1.4× across identical-code runs). A
    * deterministic busy-loop timed at run START and END puts the machine
    * state in the output: calib ≈ its quiet-host value ⇒ trust the run;
    * calib inflated ⇒ scale expectations accordingly. `threads` > 1 probes
    * parallel contention the way the local[n] executor experiences it.
    * Quiet-host reference on this image: ~0.55–0.65s single / ~1.0s at 16. */
  private def calibrate(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => {
        var s = 0L; var i = 0L
        while (i < 1500000000L) { s += i; i += 1 }
        if (s == 42L) System.err.print("") // defeat dead-code elimination
      })
      t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }
  private def usedHeapMb: Long =
    java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getUsed >> 20

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Diagnosis knobs (both observable in stderr telemetry):
    //  ORDER=reversed runs the sorted key list backwards — if a "slow" query
    //  is only slow because of what ran before it, reversing the order moves
    //  the slowness, proving position-dependence.
    //  ISOLATE=0 disables the per-query state release (default on).
    val reversed = sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("reversed")
    val isolate = !sys.env.get("SPARK_GRAFT_BENCH_ISOLATE").contains("0")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    if (isolate) isolateQueryState(spark)
    val calibStart1 = calibrate(1)
    val calibStart16 = calibrate(16)
    // A failing query must be VISIBLE in the output, not a fast time: its
    // entry becomes "err:<class>" and the failure count is reported at the
    // top level, so a regression can't masquerade as a speedup.
    //
    // Sorted-key order + min-of-2 per query: a plain Map's iteration order
    // shifts whenever an entry is added, so one-time costs (first parquet
    // footer read, broadcast warmup) would land on different queries each
    // round, and a single timing can't tell transient machine interference
    // from a real regression. Sorted order makes rounds comparable; the min
    // of two back-to-back runs suppresses one-off interference spikes.
    val ordered0 = SparkEntry.queries.toSeq.sortBy(_._1)
    val ordered = if (reversed) ordered0.reverse else ordered0
    val results = ordered.map { case (name, fn) =>
      def once(): (Option[String], Double) = {
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None }
                  catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        (err, (System.nanoTime() - t0) / 1e9)
      }
      val gc0 = gcMillis
      val (e1, t1) = once()
      val (err, t, flaky) = if (e1.isDefined) (e1, t1, false) else {
        val (e2, t2) = once()
        // a failing SECOND run must not mask the successful first one —
        // that would convert the very interference min-of-2 exists to
        // suppress into a reported failure. It must not vanish either: a
        // consistently-flaky query surfaces through the `flaky` count.
        if (e2.isDefined) {
          System.err.println(s"[bench] $name: second run failed (${e2.get}); reporting first-run time")
          (None, t1, true)
        } else (None, math.min(t1, t2), false)
      }
      // per-query telemetry BEFORE isolation, so the cost a query leaves
      // behind (heap growth, GC tax it caused) is attributed to it
      System.err.println(f"[bench] $name%-28s t=$t%7.3fs gc=+${gcMillis - gc0}%4dms heap=${usedHeapMb}%5dMB")
      if (isolate) isolateQueryState(spark)
      (name, err, t, flaky)
    }
    val qs = results.map {
      case (k, None, v, _) => s"\"" + k + "\":" + v
      case (k, Some(e), _, _) => s"\"" + k + "\":\"err:" + e + "\""
    }.mkString("{", ",", "}")
    val failed = results.count(_._2.isDefined)
    val flaky = results.count(_._4)
    val total = results.collect { case (_, None, v, _) => v }.sum
    val calibEnd1 = calibrate(1)
    val calib = f""""calib":{"start1":$calibStart1%.3f,"start16":$calibStart16%.3f,"end1":$calibEnd1%.3f}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"flaky":$flaky,$calib,"queries":$qs,"sf":"$sfDir"}""")
    // Compact trailer for harnesses that capture only the LAST lines of
    // output (the per-query map above can exceed a log tail's budget).
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"flaky":$flaky,$calib,"sf":"$sfDir"}""")
    spark.stop()
  }
}
