package graft.tools

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Orchestration profile of one or more SparkEntry queries: how many
  * sequential JOBS a query submits (every driver-side `.collect()` is a
  * scheduling barrier), how many STAGES (each non-reused exchange adds
  * one), task count, and shuffle bytes. At bench scale the data is tiny,
  * so job/stage count IS the cost model — and at 100 TB the same numbers
  * are the pass/shuffle count the optimization guide (§1.2, §2.4) says to
  * minimize first. Usage:
  *   runMain graft.tools.JobProfile <query> [query ...]   (or `all`)
  * with the usual SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS env. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.localSession(cpus)
    val names =
      if (args.isEmpty || args.sameElements(Array("all")))
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shuffleRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    // one warm rep first so fingerprint-gated stores exist and JIT is warm,
    // then the measured rep — mirrors Bench's warmup-then-time discipline
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      graft.Bench.isolateQueryState(spark)
      jobs.set(0); stages.set(0); tasks.set(0); shuffleRead.set(0); shuffleWrite.set(0)
      val t0 = System.nanoTime()
      val res = try { Right(fn(spark, sfDir).count()) }
                catch { case e: Throwable => Left(e.getClass.getSimpleName) }
      val t = (System.nanoTime() - t0) / 1e9
      // drain listener bus so the counters cover the whole query
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
          .foreach(m => try m.invoke(bus) catch { case _: Throwable => () })
      } catch { case _: Throwable => () }
      res match {
        case Right(n) =>
          println(f"[profile] $name%-30s t=$t%7.3fs jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d shufR=${shuffleRead.get >> 10}%8dKB shufW=${shuffleWrite.get >> 10}%8dKB rows=$n")
        case Left(e) =>
          println(f"[profile] $name%-30s t=$t%7.3fs FAILED $e")
      }
      graft.Bench.isolateQueryState(spark)
    }
    spark.stop()
  }
}
