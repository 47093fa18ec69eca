package graft.tools


/** Time ONE named SparkEntry query N times — the per-query drill-down the
  * full Bench can't give (it pays the whole 94-query sweep to re-measure
  * one): `runMain graft.tools.QueryTimer <name> [reps]` with the usual
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS env. Prints per-rep wall time and
  * the same gc/heap telemetry as Bench, with Bench's per-query state
  * isolation between reps. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QueryTimer <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.Bench.localSession(cpus)
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[timer] $name rep $i: $t%7.3fs rows=$n")
      graft.Bench.isolateQueryState(spark)
    }
    spark.stop()
  }
}
