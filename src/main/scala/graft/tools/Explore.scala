package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time and explain a single SparkEntry query.
  * Usage: runMain graft.tools.Explore <queryName> [sfDir] [explain|time|both]
  */
object Explore {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val mode = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    if (mode == "explain" || mode == "both") fn(spark, sfDir).explain("formatted")
    // "exec": the FINAL adaptive plan — AQE defers exchange reuse to
    // runtime, so ReusedExchange/stage dedup is only visible here, never
    // in the static formatted explain.
    if (mode == "exec") {
      val df = fn(spark, sfDir)
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    }
    if (mode == "time" || mode == "both") {
      // two timed runs: first includes JIT/codegen warmup, second is steady state
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[explore] $name run$i: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
