package graft

import org.apache.spark.sql.functions._
import graft.sources.{Tables, Warehouse}

/** Plan-level proof of the storage-side scale features: bucketed joins run
  * with zero Exchange, partitioned layouts prune at planning time. */
class WarehouseSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key plans with NO Exchange") {
    Warehouse.writeBucketed(
      Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey", "orders_b")
    Warehouse.writeBucketed(
      Tables.customer(spark, sf0001).select("c_custkey", "c_mktsegment"),
      "c_custkey", "customer_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Warehouse.cogroupJoin(spark, "orders_b", "customer_b",
        "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      assert(joined.count() ===
        Tables.orders(spark, sf0001).join(Tables.customer(spark, sf0001),
          col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partitioned parquet layout prunes partitions for a partition-column filter") {
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    Warehouse.writePartitioned(
      Tables.events(spark, sf0001).select("event_id", "event_type", "value"),
      "event_type", path)
    val one = spark.read.parquet(path).filter(col("event_type") === "click")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan)
    val expected = Tables.events(spark, sf0001)
      .filter(col("event_type") === "click").count()
    assert(one.count() === expected)
    // only the click directory is read
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.contains("event_type=click"))
  }
}
