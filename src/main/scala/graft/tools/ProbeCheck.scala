package graft.tools
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One-query diagnostic for the Bench memory probe: runs a single declared
  * query with a StreamingQueryListener attached and prints every progress
  * event's state-operator byte count plus the flushed peak — the tool that
  * verifies the listener plumbing end-to-end when a bench row's
  * `peak_state_kb` looks wrong (validated here: stream_sessions at sf0.001
  * reports 384 state bytes — sub-KB, so the bench column rounds to 0; the
  * probe is working, the state is just small at toy scale).
  *
  * Usage: runMain graft.tools.ProbeCheck [queryName] */
object ProbeCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.localSession("8")
    @volatile var n = 0
    @volatile var peak = 0L
    spark.streams.addListener(new StreamingQueryListener {
      import StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        n += 1
        val s = e.progress.stateOperators.map(_.memoryUsedBytes).sum
        System.err.println(s"[probecheck] batch=${e.progress.batchId} ops=${e.progress.stateOperators.length} bytes=$s")
        peak = math.max(peak, s)
      }
    })
    val q = if (args.nonEmpty) args(0) else "stream_sessions"
    graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
    val sc = spark.sparkContext
    val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
    bus.getClass.getMethods.find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0).foreach(_.invoke(bus))
    System.err.println(s"[probecheck] query=$q nProgress=$n peakStateBytes=$peak")
    spark.stop()
  }
}
