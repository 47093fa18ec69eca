package graft.tools

/** Dump `explain("formatted")` of named SparkEntry queries to files —
  * the before/after plan evidence the optimization rounds commit under
  * `plans/r<N>/`. Usage:
  *   runMain graft.tools.PlanDump <outDir> <suffix> <query> [query ...]
  * writes `<outDir>/<query>_<suffix>.txt` per query. Env:
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as usual. Note: for queries that
  * run driver-side decision collects or streaming replays internally, the
  * dumped plan is the FINAL returned frame's (the part a plan can show). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.localSession(cpus)
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      try {
        val df = fn(spark, sfDir)
        // run it so AQE finalizes and the executed plan is the real one
        df.count()
        val formatted = {
          // explain("formatted") prints; capture via the same API it uses
          val qe = df.queryExecution
          qe.explainString(org.apache.spark.sql.execution.FormattedMode)
        }
        val executed = df.queryExecution.executedPlan.toString
        val text = s"== explain(formatted), initial plan ==\n$formatted\n" +
          s"== executedPlan (AQE-final) ==\n$executed\n"
        java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          text.getBytes("UTF-8"))
        println(s"[plandump] wrote ${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      graft.Bench.isolateQueryState(spark)
    }
    spark.stop()
  }
}
