package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan hygiene audit: one summary line per SparkEntry query — exchange
  * count, join strategies, codegen span count, scan pushdown — to spot
  * plans that would not survive a 100× scale-up (cartesian products,
  * missed broadcasts, unpushed filters). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // collect() drives THIS df's QueryExecution, so AQE finalizes it and
        // WholeStageCodegen stage markers (*) appear in the string.
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).size
        val flags = Seq(
          if (n("CartesianProduct") > 0) "CARTESIAN!" else "",
          if (n("BroadcastNestedLoopJoin") > 0) "BNLJ" else "",
          s"xchg=${n("Exchange") - n("ReusedExchange") - n("BroadcastExchange")}",
          s"bcast=${n("BroadcastExchange")}",
          s"smj=${n("SortMergeJoin")}",
          s"bhj=${n("BroadcastHashJoin")}",
          // ops inside WholeStageCodegen render as "*(stageId) Op"
          s"wsc=${n("\\*\\(\\d+\\)")}",
          if (plan.contains("PushedFilters: [")
              && !plan.replaceAll("PushedFilters: \\[\\]", "").contains("PushedFilters: [")) ""
          else if (plan.contains("PushedFilters")) "pushed" else "")
        println(f"$name%-22s ${flags.filter(_.nonEmpty).mkString(" ")}")
      } catch { case e: Throwable => println(f"$name%-22s ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
