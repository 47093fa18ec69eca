package graft.tools

/** Operational entry point for the warehouse retirement passes (r13
  * VERDICT task 7): drop derived tables stranded by swept ×10-probe
  * corpora and report what remains. The per-family stale-generation
  * vacuum ([[graft.sources.Warehouse.vacuumStaleTables]]) stays a
  * library call — it needs the family's live fingerprint, which only the
  * owning module can compute.
  *
  * Usage: runMain graft.tools.Vacuum
  */
object Vacuum {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    if (graft.sources.Warehouse.probeMarkerLive()) {
      println("[vacuum] SKIPPED: live ScaleProbe marker held")
    } else {
      val dropped = graft.sources.Warehouse.vacuumOrphanedProbeTables(spark)
      println(s"[vacuum] orphaned probe tables dropped: ${dropped.size}")
      dropped.take(12).foreach(t => println(s"[vacuum]   $t"))
      if (dropped.size > 12) println(s"[vacuum]   ... and ${dropped.size - 12} more")
      val staged = graft.multimodal.Media.vacuumStagedRoots(keep = 1)
      println(s"[vacuum] staged roots vacuumed: ${staged.size}")
    }
    spark.stop()
  }
}
