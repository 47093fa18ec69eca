package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends SparkSpecBase {

  test("windowRank emits at most 3 rows per customer, rank 1 is the max price") {
    val out = Relational.windowRank(spark, sf0001)
    val perCust = out.groupBy("o_custkey").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(perCust <= 3)
    val top = out.filter(col("rnk") === 1)
    val joined = top.as("t").join(Tables.orders(spark, sf0001).as("o"), "o_custkey")
      .groupBy(col("o_custkey"), col("t.totalprice").as("tp"))
      .agg(max("o.o_totalprice").as("mx"))
      .filter(col("mx") > col("tp") + 0.01)
    assert(joined.count() === 0)
  }

  test("sessionize conserves events and bounds sessions") {
    val out = Relational.sessionize(spark, sf0001).agg(
      sum("n_events"), sum("n_sessions"), min("n_sessions")).collect()(0)
    val total = Tables.events(spark, sf0001).count()
    assert(out.getLong(0) === total)
    assert(out.getLong(2) >= 1)       // every active user has ≥1 session
    assert(out.getLong(1) <= total)   // sessions cannot exceed events
  }

  test("tumbling window counts sum to the event count") {
    val out = Relational.tumblingWindow(spark, sf0001)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(out === Tables.events(spark, sf0001).count())
  }

  test("multiJoinAgg revenue per nation is positive and covers all nations with orders") {
    val rows = Relational.multiJoinAgg(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(1) > 0))
  }

  test("events loader yields proper timestamps from nanos parquet") {
    val ts = Tables.events(spark, sf0001).select("ts")
    assert(ts.schema("ts").dataType.typeName === "timestamp")
    val r = ts.agg(min("ts").cast("string"), max("ts").cast("string")).collect()(0)
    assert(r.getString(0).startsWith("2024-01-01"))
  }
}
