package graft.tools
import graft.{Bench, SparkEntry}

/** Single-query timing adjudicator for BenchDiff/SlopeCheck flags — the
  * documented procedure (SURVEY §6.3): a gate flag on UNCHANGED code is
  * re-probed alone; a real cost-curve regression REPRODUCES in the
  * steady-state passes, host-interference jitter does not. Three timed
  * passes after the standard sf0.001 warm pass: pass 1 carries one-time
  * builds (codebook fits, broadcast warmup), passes 2–3 are the
  * steady-state reads compared against the flagged baseline.
  *
  * Usage: runMain graft.tools.AdjProbe <query> [sfDir] */
object AdjProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AdjProbe <query> [sfDir]")
    val name = args(0)
    require(SparkEntry.queries.contains(name),
      s"unknown query '$name' — declared: ${SparkEntry.queries.keySet.toSeq.sorted.mkString(", ")}")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Bench.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    // warm like Bench: one pass at sf0.001 first. NonFatal only — an OOM
    // or linkage error must surface, not read as "warmup done"; and a
    // skipped warm pass makes pass-1 timings incomparable to the flagged
    // baseline, so say so loudly instead of silently measuring cold.
    try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
    catch {
      case scala.util.control.NonFatal(e) =>
        println(s"[adj] WARNING: warm pass skipped (${e.getClass.getSimpleName}: " +
          s"${e.getMessage}) — pass 1 runs COLD; compare passes 2-3 only")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).collect()
      println(f"[adj] $name pass$i = ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }
}
