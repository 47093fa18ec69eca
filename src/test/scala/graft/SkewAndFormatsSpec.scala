package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

class SkewAndFormatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted collect_list equals direct collect_list (hot-key split is lossless)") {
    // one pathologically hot key + normal keys
    val df = ((1 to 5000).map(i => ("hot", s"v$i")) ++
              (1 to 50).map(i => (s"k$i", s"w$i"))).toDF("k", "v")
    val salted = Skew.saltedCollectList(df, col("k"), col("v"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    val direct = df.groupBy("k").agg(sort_array(collect_list("v")).as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(salted === direct)
    assert(salted("hot").length === 5000)
  }

  test("salted exact distinct count equals count_distinct") {
    val ev = Tables.events(spark, sf0001)
    val salted = Skew.saltedCountDistinct(ev, col("event_type"), col("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type").agg(count_distinct(col("user_id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // The runtime half of skew control (operators.Skew salting is the
    // static half): one hot key dominating a shuffle partition is split by
    // OptimizeSkewedJoin into sub-partitions, each joined against a
    // duplicated copy of the other side. Thresholds are lowered so the
    // small fixture trips the same code path a 100 TB hot key would.
    import spark.implicits._
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      val pad = "x" * 200
      val fact = (0 until 40000)
        .map(i => (if (i % 2 == 0) 0L else (i % 97).toLong, s"$pad$i"))
        .toDF("k", "v")
      val dim = (0L until 97L).map(k => (k, s"d$k")).toDF("k", "d")
      val joined = fact.join(dim, "k")
      // collect() drives THIS df's QueryExecution (count() would spawn a
      // fresh one whose AQE plan never finalizes on `joined`)
      assert(joined.collect().length === 40000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed-user event-time join (skew=true on real events data)") {
    // Directive-7 gate (VERDICT r7): the synthetic-hot-key case above proves
    // the mechanism; this case proves it on EVENT-TIME data — a skewed-user
    // replica of the real events table driving a per-user click⋈purchase
    // join (the join-shaped as-of candidate generator). Note the SHIPPED
    // event-time queries don't have this shape on purpose: asof_join /
    // rolling_features are single-shuffle window passes and event_funnel /
    // cohort_retention collapse to one row per user BEFORE joining, so no
    // fact⋈fact user join exists to skew. AQE skew-split is the runtime
    // backstop for pipelines users write themselves on top of the library.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      // Skewed-user replica: 80% of events remapped to user 1 (deterministic
      // via event_id mod). The pad must be INCOMPRESSIBLE — shuffle
      // partition sizes are post-compression, and a run of constant bytes
      // deflates below any threshold (hash chains don't).
      // repartition(16): AQE splits a skewed REDUCE partition into ranges
      // of MAP outputs, so the skewed stage needs >1 mapper — the sf0.01
      // table is one parquet file (one mapper), which makes every skewed
      // partition unsplittable no matter its size. At 100 TB the input is
      // thousands of files and this is automatic; the repartition stands in
      // for that. (Found the hard way: without it AQE silently coalesces
      // and the hot partition rides one task.)
      val ev = Tables.events(spark, "/root/testdata/sf0.01")
        .repartition(16)
        .withColumn("user_id",
          when(col("event_id") % 5 < 4, lit(1L)).otherwise(col("user_id")))
        .withColumn("pad", concat(sha2(col("event_id").cast("string"), 256),
                                  sha2(concat(col("event_id").cast("string"), lit("b")), 256),
                                  sha2(concat(col("event_id").cast("string"), lit("c")), 256)))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("pad"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"))
      val joined = clicks.join(purchases,
        clicks("user_id") === purchases("user_id") &&
          col("purchase_ts") <= col("click_ts"))
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("csv and json sinks round-trip the events table") {
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
    ev.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    ev.write.mode("overwrite").json(s"$base/json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$base/csv")
    val json = spark.read.json(s"$base/json")
    assert(csv.count() === ev.count())
    assert(json.count() === ev.count())
    val expectedSum = ev.agg(sum("user_id")).collect()(0).getLong(0)
    assert(csv.agg(sum("user_id")).collect()(0).getLong(0) === expectedSum)
    assert(json.agg(sum("user_id")).collect()(0).getLong(0) === expectedSum)
  }

  test("malformed ingest: PERMISSIVE mode routes corrupt rows to _corrupt_record") {
    // Real ingest is never clean: the engine must keep good rows, quarantine
    // bad ones for inspection, and never silently drop or crash — Spark's
    // PERMISSIVE parse mode with a corrupt-record column is that contract.
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt")
    java.nio.file.Files.write(dir.resolve("data.json"),
      """{"id": 1, "v": 10.5}
        |{"id": 2, "v": "not-a-number"}
        |{broken json!!
        |{"id": 4, "v": 2.25}
        |""".stripMargin.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record queries require a materialized parse
    try {
      val good = df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
      val bad = df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
      assert(good.count() === 2) // rows 1 and 4
      assert(bad.count() === 2)  // type mismatch + broken syntax, both preserved
      assert(good.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 4L))
      assert(bad.collect().forall(r => r.getString(2) != null))
    } finally df.unpersist()
  }

  test("orc sink round-trips the events table losslessly (schema included)") {
    // ORC keeps types in-file (unlike csv/json), so compare full row sets,
    // not just counts and sums.
    val base = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("user_id"),
              col("value"), col("ts"))
    ev.write.mode("overwrite").orc(s"$base/orc")
    val orc = spark.read.orc(s"$base/orc")
    assert(orc.schema === ev.schema)
    assert(orc.exceptAll(ev).count() === 0)
    assert(ev.exceptAll(orc).count() === 0)
  }

  test("aggSkewAuto: both regimes answer identically; route matches the audit") {
    import spark.implicits._
    import graft.operators.Relational
    // the hot regime: one user owns 90% of the rows — the straggler task
    // a plain holistic aggregate would serialize on
    val hot = (1 to 900).map(i => (7L, s"t${i % 5}")) ++
      (1 to 100).map(i => (100L + i, s"t${i % 5}"))
    val ev = hot.toDF("user_id", "event_type")
    val plain = ev.groupBy("user_id")
      .agg(count_distinct(col("event_type")).as("n_distinct"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val salted = Skew.saltedCountDistinct(ev, col("user_id"), col("event_type"))
      .select(col("k"), col("n_distinct"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(plain.sameElements(salted),
      s"salted holistic distinct diverged: ${plain.take(3).toSeq} vs ${salted.take(3).toSeq}")
    // the production query's route agrees with the audit's verdict
    val route = Relational.aggSkewAuto(spark, sf0001)
      .select("route").distinct().collect()
    val audit = Relational.joinSkewAudit(spark, sf0001).collect()(0).getString(5)
    assert(route.length === 1 && route(0).getString(0) === audit)
  }
}
