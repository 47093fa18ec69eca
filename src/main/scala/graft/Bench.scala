package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. A warmup pass at sf0.001 runs every query first so
  * the timed numbers measure the operators, not JVM/codegen JIT warmup
  * (the generated code per plan is identical across scale factors). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Option[String], Double) = {
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None }
                  catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        (err, (System.nanoTime() - t0) / 1e9)
      }
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
      (name, err, t, flaky)
    }
    val qs = results.map {
      case (k, None, v, _) => s"\"" + k + "\":" + v
      case (k, Some(e), _, _) => s"\"" + k + "\":\"err:" + e + "\""
    }.mkString("{", ",", "}")
    val failed = results.count(_._2.isDefined)
    val flaky = results.count(_._4)
    val total = results.collect { case (_, None, v, _) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"flaky":$flaky,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
