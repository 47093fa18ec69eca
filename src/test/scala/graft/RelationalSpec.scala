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

  test("sessionWindowDynamic: per-type gaps merge by running max end; exact touch merges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mn = 60L * 1000000 // one minute in µs
    // user 1: purchase@0 (45m gap) holds the session open past click@40m
    // (10m gap) and error@49m (5m); end = running max of event ends = 54m.
    // view@56m starts fresh (56 > 54). user 3: view@55m does NOT (55 < 54
    // is false but 55 > 54 too)... so user 3 probes the boundary: an event
    // AT exactly the running-max end (54m, error gap chain) must MERGE —
    // the measured Spark merge-iterator rule this spec exists to pin
    // (µs-grained corpus fixtures never touch exactly, so the oracle hash
    // cannot falsify the boundary; this micro fixture can). user 2: click@0
    // ends at 10m; click@EXACTLY 10m merges into [0, 20m).
    val rows = Seq(
      (1L, 0L, "purchase"), (1L, 40 * mn, "click"), (1L, 49 * mn, "error"),
      (1L, 56 * mn, "view"),
      (2L, 0L, "click"), (2L, 10 * mn, "click"),
      (3L, 0L, "purchase"), (3L, 45 * mn, "error"))
    val events = rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = events
      .groupBy(col("user_id"),
               session_window(col("ts"), graft.operators.Relational.dynamicGapCol))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("s"),
              unix_micros(col("session_window.end")).as("e"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq(
      (1L, 0L, 54 * mn, 3L),          // max(45, 40+10, 49+5) = 54
      (1L, 56 * mn, 76 * mn, 1L),     // view gap 20m, strictly past 54
      (2L, 0L, 20 * mn, 2L),          // exact touch at 10m MERGES
      (3L, 0L, 50 * mn, 2L)))         // error@45m touches purchase end: merges
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

  test("asofJoin: every click matched to the latest purchase at or before it") {
    val out = Relational.asofJoin(spark, sf0001).collect()
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val purchasesByUser = ev.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._3).sorted.toSeq).toMap
    val clicks = ev.count(_._2 == "click")
    assert(out.length === clicks)
    out.foreach { r =>
      val (user, clickUs) = (r.getLong(1), r.getLong(2))
      val expected = purchasesByUser.getOrElse(user, Seq.empty[Long])
        .filter(_ <= clickUs).lastOption
      val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(got === expected, s"user=$user click=$clickUs")
    }
  }

  test("rollupPricing: subtotals and grand total are consistent") {
    val rows = Relational.rollupPricing(spark, sf0001).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    val leafCount = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
      .map(_.getLong(4)).sum
    assert(grand(0).getLong(4) === leafCount)
    assert(grand(0).getLong(4) === Tables.lineitem(spark, sf0001).count())
  }

  test("langId: deterministic integer scores, argmax prediction") {
    val rows = graft.operators.TextAnalysis.langId(spark, sf0001).collect()
    assert(rows.length === spark.read.parquet(s"$sf0001/documents.parquet").count())
    rows.foreach { r =>
      val scores = Map("en" -> r.getLong(1), "es" -> r.getLong(2),
                       "de" -> r.getLong(3), "fr" -> r.getLong(4))
      val best = scores.values.max
      assert(scores(r.getString(5)) === best, s"pred not argmax in $r")
    }
  }

  test("events loader normalizes every ts vintage to TimestampType") {
    // The driver has shipped events.ts as long-nanos, TIMESTAMP_NTZ, and
    // plain TIMESTAMP across testdata regenerations (FIXTURES.md); the
    // loader must yield µs TimestampType for all of them so event-time
    // queries (window/session_window/watermark) analyze.
    import org.apache.spark.sql.types._
    val raw = spark.read.parquet(s"$sf0001/events.parquet").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType).contains(raw),
      s"unknown events.ts vintage $raw — extend Tables.normalizeEventTs")
    val ts = Tables.events(spark, sf0001).select("ts")
    assert(ts.schema("ts").dataType === TimestampType)
    val r = ts.agg(min("ts").cast("string"), max("ts").cast("string")).collect()(0)
    assert(r.getString(0).startsWith("2024-01-01"))
    // Instant preservation: the NTZ→LTZ cast under the session's pinned UTC
    // must not shift values — cross-check against a tz-independent read.
    val rawMicros = graft.sources.Tables.normalizeEventTs(
      spark.read.parquet(s"$sf0001/events.parquet"))
      .agg(min(unix_micros(col("ts")))).collect()(0).getLong(0)
    assert(rawMicros >= 1704067200000000L, s"min ts $rawMicros before 2024-01-01 UTC")
  }

  test("hamming1Pairs equals brute force on adversarial strings (odd lengths, low entropy)") {
    // Low-entropy alphabet + shared prefixes + odd/even lengths — exactly
    // the regimes where position-subset blocking schemes silently lose
    // recall. Differential oracle: the O(n²) scan.
    val rnd = new scala.util.Random(7)
    val strs = (0 until 120).map { i =>
      val len = 3 + rnd.nextInt(6) // 3..8, mixed parity
      val body = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (i.toLong, if (i % 2 == 0) "id#" + body else body)
    }
    import spark.implicits._
    val df = strs.toDF("id", "s")
    val got = Relational.hamming1Pairs(df, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lev1(a: String, b: String): Boolean =
      a.length == b.length && a.zip(b).count { case (x, y) => x != y } <= 1
    val want = (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && lev1(sa, sb)
    } yield (ia, ib)).toSet
    assert(got === want)
  }

  test("peakConcurrency: the bucketed sweep equals a single global sweep over the intervals") {
    import org.apache.spark.sql.functions._
    val out = Relational.peakConcurrency(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // true sweep: collect the session intervals and replay globally
    val sessions = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("session_window.start")),
              unix_micros(col("session_window.end")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bounds = (sessions.map(s => (s._2, 1L, s._1)) ++
                  sessions.map(s => (s._3, -1L, s._1)))
      .sortBy(t => (t._1, t._2, t._3))
    var conc = 0L
    val peaks = scala.collection.mutable.Map.empty[Long, Long]
    val changes = scala.collection.mutable.Map.empty[Long, Long]
    bounds.foreach { case (us, d, _) =>
      conc += d
      val b = us / 3600000000L
      peaks(b) = math.max(peaks.getOrElse(b, Long.MinValue), conc)
      changes(b) = changes.getOrElse(b, 0L) + 1
    }
    val expected = peaks.keys.toSeq.sorted
      .map(b => (b * 3600000000L, changes(b), peaks(b)))
    assert(out.toSeq === expected)
    // conservation: the sweep closes every interval it opens
    assert(bounds.map(_._2).sum === 0L)
    // the fixture actually overlaps: some hour has >1 concurrent session
    assert(out.exists(_._3 > 1), "no concurrency on the fixture — degenerate")
  }

  test("skewProfile: ratio and evenness read the fixture's real shape") {
    val rows = graft.operators.Relational.skewProfile(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(rows.keySet === Set("events.user_id", "events.event_type",
      "lineitem.l_orderkey", "lineitem.l_suppkey", "orders.o_custkey"))
    rows.values.foreach { case (n, k, mx, ratio, ev) =>
      assert(n > 0 && k > 0 && mx >= 1)
      assert(ratio >= 1.0 - 1e-9, s"max/avg below 1: $ratio")  // max ≥ avg always
      assert(ev >= 0.0 && ev <= 1.0 + 1e-9)
    }
    // event_type is a handful of near-uniform categories: tiny key count,
    // near-1 evenness; user_id spreads over many keys
    val (_, kTypes, _, _, evTypes) = rows("events.event_type")
    assert(kTypes <= 10L && evTypes > 0.9, s"event_type shape unexpected: $kTypes, $evTypes")
    assert(rows("events.user_id")._2 > kTypes)
  }

  test("intervalJoinSessions: bucketed pair join equals the scalar quadratic replay") {
    import spark.implicits._
    val H = 3600000000L // 1h in µs
    // adversarial layout: touching endpoints (zero-length overlap counts),
    // a session spanning three buckets, the same user pair overlapping via
    // two distinct session pairs, and non-overlapping decoys
    val sess = Seq(
      (1L, 0L * H + 100L, 0L * H + 500L),        // u1 s1
      (2L, 0L * H + 500L, 0L * H + 900L),        // touches u1 s1 at 500 → overlap 0
      (3L, 0L * H + 200L, 2L * H + 700L),        // spans buckets 0..2
      (1L, 2L * H + 100L, 2L * H + 400L),        // u1 s2 overlaps u3's long session
      (2L, 5L * H, 5L * H + 10L),                // decoy, alone in bucket 5
      (4L, 1L * H + 50L, 1L * H + 60L),          // inside u3's span, bucket 1
      (3L, 5L * H + 5L, 5L * H + 8L)             // second (u2,u3) overlap, different pair
    ).toDF("user_id", "st", "en")
    // scalar quadratic ground truth
    val rows = Seq(
      (1L, 100L, 500L), (2L, 500L, 900L), (3L, 200L, 2 * H + 700L),
      (1L, 2 * H + 100L, 2 * H + 400L), (2L, 5 * H, 5 * H + 10L),
      (4L, H + 50L, H + 60L), (3L, 5 * H + 5L, 5 * H + 8L))
    val expected = (for {
      (ua, sa, ea) <- rows; (ub, sb, eb) <- rows
      if ua < ub && sa <= eb && sb <= ea
    } yield ((ua, ub), math.min(ea, eb) - math.max(sa, sb)))
      .groupBy(_._1).map { case ((a, b), vs) =>
        (a, b, vs.size.toLong, vs.map(_._2).sum) }
      .toSeq.sortBy { case (a, b, _, ov) => (-ov, a, b) }
    val got = graft.operators.Relational.intervalJoinSessions(sess, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    // the layout exercises what it claims
    assert(expected.exists(_._4 == 0L), "no touching pair in the fixture")
    assert(expected.exists(_._3 == 2L), "no pair overlapping twice")
    // partitioning-invariant
    val again = graft.operators.Relational.intervalJoinSessions(sess.repartition(5), 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === got.toSeq)
  }

  test("q3Shipping: scalar replay of the funnel, tie order total, top-k plan") {
    val df = graft.operators.Relational.q3Shipping(spark, sf0001)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // independent scalar replay from the raw tables (dates as ISO strings —
    // lexicographic order IS date order, and it sidesteps the NTZ/LTZ
    // timestamp-class split across parquet vintages)
    val cut = "1998-01-01"
    val bldg = Tables.customer(spark, sf0001).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"), col("o_orderpriority"))
      .collect()
      .filter(r => bldg(r.getLong(1)) && r.getString(2) < cut)
      .map(r => r.getLong(0) -> ((r.getString(2), r.getString(3)))).toMap
    val rev = scala.collection.mutable.Map[Long, Long]()
    Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("sd"))
      .collect()
      .foreach { r =>
        val ok = r.getLong(0)
        if (orders.contains(ok) && r.getString(3) > cut) {
          val cents = math.round(r.getDouble(1) * 100)
          val disc = math.round(r.getDouble(2) * 100)
          rev(ok) = rev.getOrElse(ok, 0L) + cents * (100 - disc)
        }
      }
    val expected = rev.toSeq.map { case (ok, rv) =>
      val (d, p) = orders(ok); (ok, d, p, rv)
    }.sortBy(t => (-t._4, t._2, t._1)).take(10)
    assert(got.toSeq === expected)
    assert(got.length === 10 && got.map(_._4).toSeq === got.map(_._4).sortBy(-_).toSeq)
    // plan: top-k never global-sorts; the customer slice joins broadcast
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"q3 top-k is a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"q3 customer slice not broadcast:\n$plan")
  }

  test("bigSpenders: scalar replay of the HAVING-rejoin, one fact scan, top-k plan") {
    val df = graft.operators.Relational.bigSpenders(spark, sf0001)
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5)))
    // independent scalar replay from the raw tables
    val qty = scala.collection.mutable.Map[Long, Long]()
    Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity").collect()
      .foreach(r => qty(r.getLong(0)) = qty.getOrElse(r.getLong(0), 0L) + math.round(r.getDouble(1)))
    val names = Tables.customer(spark, sf0001).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"), col("o_totalprice"))
      .collect()
      .filter(r => qty.getOrElse(r.getLong(0), 0L) > 250L)
      .map { r =>
        (names(r.getLong(1)), r.getLong(1), r.getLong(0), r.getString(2),
         math.round(r.getDouble(3) * 100), qty(r.getLong(0)))
      }
      .sortBy(t => (-t._5, t._4, t._3)).take(100)
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty, "floor 250 must qualify some orders at sf0.001")
    // the shape exercises what it claims: every output group exceeds the floor
    assert(got.forall(_._6 > 250L))
    // plan: the group filter is the rejoin of the aggregated frame — never a
    // window over detail rows; lineitem is scanned exactly once (3 scans
    // total: lineitem, orders, customer); top-k is TakeOrderedAndProject
    val plan = df.queryExecution.executedPlan.toString
    val finalOnly = plan.split("== Initial Plan ==").head
    assert(!finalOnly.contains("Window"),
      s"group filter must be a rejoin of the aggregate, not a window:\n$finalOnly")
    val scans = "Scan parquet".r.findAllIn(finalOnly).size
    assert(scans <= 3, s"expected one scan per table (<=3), got $scans:\n$finalOnly")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k is a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"customer not broadcast:\n$plan")
  }

  test("lapsedBigAccounts: scalar replay, integer-exact threshold, anti-join plan") {
    val df = graft.operators.Relational.lapsedBigAccounts(spark, sf0001)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // scalar replay: cross-multiplied threshold + lapsed anti-set
    val custs = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    val pos = custs.map(_._3).filter(_ > 0L)
    val (nPos, sumPos) = (pos.length.toLong, pos.sum)
    val cutoffUs = java.time.LocalDate.parse("2000-07-01")
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val activeSince = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .collect().filter(_.getLong(1) >= cutoffUs).map(_.getLong(0)).toSet
    val expected = custs
      .filter(c => !activeSince(c._1) && c._3 * nPos > sumPos)
      .groupBy(_._2).view.mapValues(cs => (cs.length.toLong, cs.map(_._3).sum))
      .toSeq.map { case (seg, (n, tot)) => (seg, n, tot) }.sortBy(_._1)
    assert(got.toSeq === expected)
    assert(got.map(_._2).sum > 0, "some lapsed big accounts must exist at sf0.001")
    // plan: the threshold is a broadcast 1-row frame (never a correlated
    // per-row subquery), the NOT EXISTS is a LeftAnti join, the date
    // filter reaches the orders scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the 1-row threshold frame must broadcast:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")
      || plan.contains("2000-07-01"),
      s"date filter must reach the orders scan:\n$plan")
  }

  test("waitingSuppliers: scalar quantifier replay, one fact scan, reduced-grain window") {
    val df = graft.operators.Relational.waitingSuppliers(spark, sf0001)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // independent scalar replay of the EXISTS / NOT-EXISTS semantics
    val odate = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lines = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(t => odate.contains(t._1))
    val lateUs = 90L * 24 * 3600 * 1000000L
    val byOrder = lines.groupBy(_._1)
    val numwait = scala.collection.mutable.Map[Long, Long]()
    byOrder.foreach { case (ok, ls) =>
      val supps = ls.map(_._2).distinct
      val lateSupps = ls.filter(t => t._3 > odate(ok) + lateUs).map(_._2).distinct
      if (supps.length > 1 && lateSupps.length == 1) {
        val culprit = lateSupps.head
        val lateLines = ls.count(t => t._2 == culprit && t._3 > odate(ok) + lateUs)
        numwait(culprit) = numwait.getOrElse(culprit, 0L) + lateLines
      }
    }
    val names = Tables.supplier(spark, sf0001).select("s_suppkey", "s_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = numwait.toSeq.map { case (sk, n) => (names(sk), sk, n) }
      .sortBy(t => (-t._3, t._1)).take(25)
    assert(got.toSeq === expected)
    assert(got.nonEmpty, "some supplier must be a sole late culprit at sf0.001")
    // plan: both quantifiers fold into counts — ONE lineitem scan (3 scans
    // total: lineitem, orders, supplier — the textbook form re-scans the
    // fact for each EXISTS); the window partitions by order key over the
    // reduced order×supplier grain; dims broadcast; top-k never global-sorts
    val plan = df.queryExecution.executedPlan.toString
    val finalOnly = plan.split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(finalOnly).size
    assert(scans <= 3, s"quantifiers must not re-scan the fact (<=3 scans), got $scans:\n$finalOnly")
    assert(finalOnly.contains("Window"), s"expected the reduced-grain window:\n$finalOnly")
    assert(!finalOnly.contains("No Partition Defined") &&
      finalOnly.contains("windowspecdefinition(l_orderkey"),
      s"window must partition by order key:\n$finalOnly")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k is a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dims not broadcast:\n$plan")
  }

  test("unpivotMetrics: long-form sums reconstruct the wide aggregates") {
    val got = graft.operators.Relational.unpivotMetrics(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val flags = li.select("l_returnflag").distinct().collect().map(_.getString(0))
    assert(got.size === flags.length * 4, "grid must be |flags| × 4 measures")
    // expected: per-row cents rounding THEN summation, same as the melt
    val wide = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_quantity") * 100).cast("bigint")).as("q"),
        sum(round(col("l_extendedprice") * 100).cast("bigint")).as("e"),
        sum(round(col("l_discount") * 100).cast("bigint")).as("d"),
        sum(round(col("l_tax") * 100).cast("bigint")).as("t"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    flags.foreach { f =>
      val (n, q, e, d, t) = wide(f)
      assert(got((f, "l_quantity")) === ((n, q)), s"quantity mismatch for $f")
      assert(got((f, "l_extendedprice")) === ((n, e)))
      assert(got((f, "l_discount")) === ((n, d)))
      assert(got((f, "l_tax")) === ((n, t)))
    }
  }

  test("groupingSetsPricing: exactly the asymmetric set list, totals consistent") {
    val rows = graft.operators.Relational.groupingSetsPricing(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val total = li.count()
    val statuses = li.select("l_linestatus").distinct().collect().map(_.getString(0)).toSet
    val detail = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    val perStatus = rows.filter(r => r._1 == "ALL" && r._2 != "ALL")
    val perFlag = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(perFlag.isEmpty, "per-flag slice belongs to ROLLUP/CUBE, not this set list")
    assert(perStatus.map(_._2).toSet === statuses, "one subtotal per status")
    assert(grand.length === 1 && grand.head._5 === total)
    assert(detail.map(_._5).sum === total, "detail counts partition the table")
    assert(perStatus.map(_._5).sum === total, "status subtotals partition the table")
    // each status subtotal equals the sum of its detail slots
    statuses.foreach { st =>
      assert(perStatus.find(_._2 == st).get._5 === detail.filter(_._2 == st).map(_._5).sum)
    }
  }

  // ---- round-10 extension: the remaining classic warehouse shapes ----

  /** Exact per-line revenue units (10⁻⁴ dollars), the q3 discipline. */
  private def revE4(price: Double, disc: Double): Long =
    math.round(price * 100) * (100L - math.round(disc * 100))

  test("q7NationVolume: scalar replay of both directions, broadcast star plan") {
    val df = Relational.q7NationVolume(spark, sf0001)
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // scalar replay from the raw tables
    val nat = Tables.nation(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sf0001).collect()
      .map(r => r.getLong(0) -> nat(r.getInt(2))).toMap
    val custNat = Tables.customer(spark, sf0001).collect()
      .map(r => r.getLong(0) -> nat(r.getInt(2))).toMap
    val ordCust = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pair = Set(Relational.Q7NationA, Relational.Q7NationB)
    val cells = scala.collection.mutable.Map[(String, String, Long), (Long, Long)]()
    Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount"), year(col("l_shipdate")).as("y"))
      .collect().foreach { r =>
        val (sn, cn) = (suppNat(r.getLong(1)), custNat(ordCust(r.getLong(0))))
        val y = r.getInt(4).toLong
        if (pair(sn) && pair(cn) && sn != cn &&
            y >= Relational.Q7StartYear && y <= Relational.Q7EndYear) {
          val k = (sn, cn, y)
          val (rev, n) = cells.getOrElse(k, (0L, 0L))
          cells(k) = (rev + revE4(r.getDouble(2), r.getDouble(3)), n + 1)
        }
      }
    val expected = cells.toSeq.map { case ((sn, cn, y), (rev, n)) => (sn, cn, y, rev, n) }
      .sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq === expected)
    assert(got.map(_._1).toSet === pair && got.map(_._2).toSet === pair,
      "both directions must appear at sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("BroadcastHashJoin"), s"dimension chain must broadcast:\n$plan")
  }

  test("q8MarketShare: exact integer sums, share is the one rounded division") {
    val rows = Relational.q8MarketShare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (num, den, share) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(num >= 0L && num <= den, "nation slice must be within the total")
      assert(share === (math.rint(num.toDouble / den.toDouble * 10000) / 10000),
        "share must be exactly the rounded ratio of the integer sums")
    }
    // every year in the window with qualifying rows appears
    val years = rows.map(_.getLong(0))
    assert(years.forall(y => y >= Relational.Q8StartYear && y <= Relational.Q8EndYear))
  }

  test("q12LateLines: high/low partition the late lines, totals replay") {
    val rows = Relational.q12LateLines(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // scalar replay of the join + lateness predicate
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val lateUs = Relational.Q12LateDays * 86400000000L
    val hi = Relational.Q12HighPriorities.toSet
    val cells = scala.collection.mutable.Map[String, (Long, Long)]()
    Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linestatus"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("us"),
        year(col("l_shipdate")).as("y"))
      .collect().foreach { r =>
        val y = r.getInt(3)
        val (odUs, pri) = ord(r.getLong(0))
        if (y >= Relational.Q12StartYear && y <= Relational.Q12EndYear &&
            r.getLong(2) > odUs + lateUs) {
          val (h, l) = cells.getOrElse(r.getString(1), (0L, 0L))
          cells(r.getString(1)) = if (hi(pri)) (h + 1, l) else (h, l + 1)
        }
      }
    val expected = cells.toSeq.map { case (st, (h, l)) => (st, h, l) }.sortBy(_._1)
    assert(rows.toSeq === expected)
    assert(rows.map(r => r._2 + r._3).sum > 0, "some late lines must exist")
  }

  test("q14PromoShare: pct is exactly the rounded promo fraction of the window") {
    val r = Relational.q14PromoShare(spark, sf0001).collect()(0)
    val (promo, total, pct) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(promo > 0L && promo < total, "promo slice must be a proper subset at sf0.001")
    assert(pct === (math.rint(100.0 * promo.toDouble / total.toDouble * 10000) / 10000))
  }

  test("q17SmallOrders: window rewrite equals the correlated-subquery replay; brand slice broadcasts") {
    val df = Relational.q17SmallOrders(spark, sf0001)
    val r = df.collect()(0)
    // scalar replay of the textbook correlated form
    val brandParts = Tables.part(spark, sf0001)
      .filter(col("p_brand") === Relational.Q17Brand)
      .collect().map(_.getLong(0)).toSet
    val lines = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .filter(x => brandParts(x.getLong(0)))
      .map(x => (x.getLong(0), math.round(x.getDouble(1)), math.round(x.getDouble(2) * 100)))
    val byPart = lines.groupBy(_._1).view
      .mapValues(ls => (ls.length.toLong, ls.map(_._2).sum)).toMap
    val small = lines.filter { case (pk, qty, _) =>
      val (n, sumQty) = byPart(pk); qty * 5 * n < sumQty
    }
    assert(r.getLong(0) === small.length.toLong)
    assert(r.getLong(1) === small.map(_._3).sum)
    assert(small.nonEmpty, "some small-quantity lines must qualify at sf0.001")
    // plan: the brand slice broadcasts BEFORE the window, so the window
    // shuffles only the brand sliver; lineitem scanned once
    val plan = df.queryExecution.executedPlan.toString
    val finalOnly = plan.split("== Initial Plan ==").head
    assert(finalOnly.contains("Window"), s"per-part moments must ride a window:\n$finalOnly")
    assert(plan.contains("BroadcastHashJoin"), s"brand slice must broadcast:\n$plan")
    val scans = "Scan parquet".r.findAllIn(finalOnly).size
    assert(scans <= 2, s"expected one scan per table (<=2), got $scans:\n$finalOnly")
  }

  test("q19Brackets: disjunct replay; equi-join survives, envelope reaches the fact scan") {
    val df = Relational.q19Brackets(spark, sf0001)
    val r = df.collect()(0)
    // scalar replay of the textbook OR-of-ANDs
    val parts = Tables.part(spark, sf0001)
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getInt(2))).toMap
    val hits = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").collect()
      .flatMap { x =>
        val (brand, size) = parts(x.getLong(0))
        val qty = math.round(x.getDouble(1))
        val ok = Relational.Q19Brackets.exists { case (b, sz, lo, hi) =>
          brand == b && size >= 1 && size <= sz && qty >= lo && qty <= hi
        }
        if (ok) Some(revE4(x.getDouble(2), x.getDouble(3))) else None
      }
    assert(r.getLong(0) === hits.length.toLong)
    assert(r.getLong(1) === hits.sum)
    assert(hits.nonEmpty, "brackets must match some lines at sf0.001")
    // plan: the partkey EQUI-join survives the disjunct (no nested loop),
    // and the derived quantity envelope is pushed to the lineitem scan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"disjunct degraded the join to a nested loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"bracket-sliced part side must broadcast:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_quantity") || plan.contains("IsNotNull(l_quantity"),
      s"quantity envelope must reach the lineitem scan:\n$plan")
  }

  test("q4PriorityExists: semi-join counts each order once, never per late line") {
    val df = Relational.q4PriorityExists(spark, sf0001)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1)))
    // scalar replay of the EXISTS semantics
    val lateUs = Relational.WaitingLateDays * 86400000000L
    val lateLines = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), unix_micros(col("l_shipdate").cast("timestamp")).as("us"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).max).toMap
    val startUs = java.time.LocalDate.parse(Relational.Q4StartDate)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val endUs = java.time.LocalDate.parse(Relational.Q4EndDate)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val expected = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_orderpriority"))
      .collect()
      .filter { r =>
        val us = r.getLong(1)
        us >= startUs && us < endUs &&
          lateLines.get(r.getLong(0)).exists(_ > us + lateUs)
      }
      .groupBy(_.getString(2)).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    assert(got.toSeq === expected)
    // an inner join would overcount: total late LINES in-window exceeds orders
    assert(got.map(_._2).sum > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$plan")
    assert(!plan.split("== Initial Plan ==").head.contains("HashAggregate(keys=[o_orderkey"),
      s"semi join must not be a join+distinct:\n$plan")
  }

  test("q6Forecast: scalar replay; all three predicates reach the parquet scan") {
    val df = Relational.q6Forecast(spark, sf0001)
    val r = df.collect()(0)
    val y0 = java.time.LocalDate.of(Relational.Q6Year, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val y1 = java.time.LocalDate.of(Relational.Q6Year + 1, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val hits = Tables.lineitem(spark, sf0001)
      .select(unix_micros(col("l_shipdate").cast("timestamp")).as("us"),
        col("l_discount"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .filter(x => x.getLong(0) >= y0 && x.getLong(0) < y1 &&
        x.getDouble(1) >= Relational.Q6DiscLo && x.getDouble(1) <= Relational.Q6DiscHi &&
        x.getDouble(2) < Relational.Q6QtyCap)
      .map(x => math.round(x.getDouble(3) * 100) * math.round(x.getDouble(1) * 100))
    assert(r.getLong(0) === hits.sum)
    assert(r.getLong(1) === hits.length.toLong)
    assert(hits.nonEmpty, "the Q6 band must select some lines at sf0.001")
    // the pushdown claim: discount, quantity AND shipdate all reach the
    // scan — read the scan node's metadata (the rendered plan truncates
    // long PushedFilters lists, so a string match would miss them)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }).flatMap(flatten)
    val pushed = flatten(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s.metadata("PushedFilters") }
      .mkString(";")
    Seq("GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity", "GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate")
      .foreach(f => assert(pushed.contains(f),
        s"Q6 predicate $f must reach the parquet scan; pushed = $pushed"))
  }

  test("q10Returns: scalar replay of the returned-revenue top-k; plan broadcasts dims") {
    val df = Relational.q10Returns(spark, sf0001)
    val got = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val s0 = java.time.LocalDate.parse(Relational.Q10StartDate)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val s1 = java.time.LocalDate.parse(Relational.Q10EndDate)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val ordIn = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .collect().filter(r => r.getLong(2) >= s0 && r.getLong(2) < s1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nat = Tables.nation(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val cust = Tables.customer(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getString(1), nat(r.getInt(2)), math.round(r.getDouble(3) * 100))).toMap
    val perCust = scala.collection.mutable.Map[Long, (Long, Long)]()
    Tables.lineitem(spark, sf0001)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount").collect()
      .foreach { r =>
        ordIn.get(r.getLong(0)).foreach { ck =>
          val (rev, n) = perCust.getOrElse(ck, (0L, 0L))
          perCust(ck) = (rev + revE4(r.getDouble(1), r.getDouble(2)), n + 1)
        }
      }
    val expected = perCust.toSeq.map { case (ck, (rev, n)) =>
      val (name, nation, bal) = cust(ck); (ck, name, nation, bal, rev, n)
    }.sortBy(t => (-t._5, t._1)).take(Relational.Q10TopK)
    assert(got.toSeq === expected)
    assert(got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k is a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"customer/nation must broadcast:\n$plan")
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"return-flag filter must reach the lineitem scan:\n$plan")
  }

  test("q13OrderCounts: outer join keeps the zero bucket; distribution partitions customers") {
    // real-table form: every customer appears exactly once in the distribution
    val dist = Relational.q13OrderCounts(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(dist.map(_._2).sum === Tables.customer(spark, sf0001).count(),
      "custdist must partition ALL customers (outer-join contract)")
    // excluded-priority orders are not counted
    val perCust = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") =!= Relational.Q13ExcludedPriority)
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Tables.customer(spark, sf0001).select("c_custkey").collect()
      .map(r => perCust.getOrElse(r.getLong(0), 0L))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(t => (-t._2, -t._1))
    assert(dist.toSeq === expected)
    // planted fixture: a customer with zero qualifying orders lands in c_count=0
    import spark.implicits._
    val c = Seq(1L, 2L, 3L).toDF("c_custkey")
    val o = Seq((10L, 1L, "5-LOW"), (11L, 1L, "5-LOW"),
                (12L, 2L, Relational.Q13ExcludedPriority))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val planted = Relational.q13OrderCountsFrom(c, o).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(planted === Map(0L -> 2L, 2L -> 1L),
      "customer 3 (no orders) and customer 2 (only excluded orders) must land in the zero bucket")
  }

  test("q15TopRevenue: equality over exact integers; the max is a broadcast, not a re-scan") {
    val df = Relational.q15TopRevenue(spark, sf0001)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val s0 = java.time.LocalDate.parse(Relational.Q15StartDate)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val s1 = java.time.LocalDate.parse(Relational.Q15EndDate)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val perSupp = scala.collection.mutable.Map[Long, Long]()
    Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey"), unix_micros(col("l_shipdate").cast("timestamp")).as("us"),
        col("l_extendedprice"), col("l_discount"))
      .collect().foreach { r =>
        if (r.getLong(1) >= s0 && r.getLong(1) < s1)
          perSupp(r.getLong(0)) = perSupp.getOrElse(r.getLong(0), 0L) +
            revE4(r.getDouble(2), r.getDouble(3))
      }
    val mx = perSupp.values.max
    val names = Tables.supplier(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = perSupp.toSeq.filter(_._2 == mx)
      .map { case (sk, rev) => (sk, names(sk), rev) }.sortBy(_._1)
    assert(got.toSeq === expected)
    // one lineitem scan: the max branch REUSES the per-supplier aggregate
    // stage (the explicit isNotNull makes both consumers canonical-equal),
    // so the final plan has exactly lineitem + supplier scans plus a
    // ReusedExchange — never a second fact scan
    val finalOnly = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(finalOnly).size
    assert(scans <= 2, s"expected lineitem + supplier scans only, got $scans:\n$finalOnly")
    assert(finalOnly.contains("ReusedExchange"),
      s"the max branch must reuse the per-supplier aggregate stage:\n$finalOnly")
  }

  test("freqRollup: merged grid is bit-identical to the direct grid; est >= exact") {
    import org.apache.spark.sql.functions.call_function
    val (depth, width) = (Relational.FreqRollupDepth, Relational.FreqRollupWidth)
    val ev = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
    val direct = ev.agg(call_function("graft_cms",
        col("uid"), lit(1L), lit(depth), lit(width)).as("grid"))
      .collect()(0).getSeq[Long](0)
    val merged = ev.groupBy("event_type")
      .agg(call_function("graft_cms", col("uid"), lit(1L), lit(depth), lit(width)).as("grid"))
      .collect().map(_.getSeq[Long](1))
      .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    assert(merged === direct,
      "elementwise sum of per-type grids must equal the grid built over all events")
    // the declared query's estimates: always >= exact (CMS only overcounts)
    val rows = Relational.freqRollup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS estimate below exact for uid=${r.getString(0)}"))
  }

  test("joinSizeEstimate: exact F2 replayed scalar-side; signed-sketch estimate unbiased-close; signs actually matter") {
    val row = Relational.joinSizeEstimate(spark, sf0001).collect()
    assert(row.length === 1)
    val (exact, est, err) = (row(0).getLong(0), row(0).getLong(1), row(0).getLong(2))
    // scalar replay of the truth: F2 = sum of squared per-key counts —
    // and it IS the self-join size, counted by an actual join
    val counts = Tables.lineitem(spark, sf0001)
      .groupBy("l_partkey").agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    assert(exact === counts.map(c => c * c).sum)
    val li = Tables.lineitem(spark, sf0001).select(col("l_partkey").as("k"))
    assert(exact === li.as("a").join(li.as("b"), "k").count(),
      "F2 must equal the materialized self-join row count")
    assert(err === (est - exact) * 1000L / exact)
    // the estimator's statistical contract at width 1024: the measured
    // median-of-5 sits within ~4 sigma of truth (sigma ~ sqrt(2/width))
    assert(math.abs(err) < 200,
      s"signed-sketch F2 estimate off by ${err} permille (exact=$exact est=$est)")
    // signs are the load-bearing part: the UNSIGNED read-out of the same
    // cells (every count positive) inflates by the collision mass —
    // replayed scalar-side from the same hash convention
    val (depth, width) = (Relational.JoinSizeDepth, Relational.JoinSizeWidth)
    val unsignedRows = (0 until depth).map { i =>
      val cells = new Array[Long](width)
      Tables.lineitem(spark, sf0001).select(col("l_partkey").cast("string"))
        .collect().map(_.getString(0)).foreach { pk =>
        val h = graft.operators.TextAnalysis.md5Low64(s"$i:$pk") & Long.MaxValue
        cells((h % width).toInt) += 1L
      }
      cells.map(c => c * c).sum
    }.sorted
    val unsignedMedian = unsignedRows(depth / 2)
    assert(unsignedMedian > exact,
      "the unsigned read-out is biased ABOVE truth by the collision mass")
    assert(unsignedMedian - exact > math.abs(est - exact),
      s"the unsigned bias (+${unsignedMedian - exact}) must dominate the " +
        s"signed deviation (${est - exact}) — otherwise signs bought nothing")
  }

  test("joinSizeCross: exact equals the materialized cross join; estimate within the 4-sigma AMS bound") {
    val row = Relational.joinSizeCross(spark, sf0001).collect()
    assert(row.length === 1)
    val (exact, est, err) = (row(0).getLong(0), row(0).getLong(1), row(0).getLong(2))
    // truth, by a structurally different computation: the real fact join
    val ev = Tables.events(spark, sf0001).filter(col("user_id").isNotNull)
      .select(col("user_id").cast("string").as("pk"))
    val ords = Tables.orders(spark, sf0001)
      .select(col("o_custkey").cast("string").as("pk"))
    assert(exact === ev.join(ords, "pk").count(),
      "sum of count products must equal the materialized join size")
    assert(exact > 0, "no key overlap between events and orders — fixture degenerate")
    assert(err === (est - exact) * 1000L / exact)
    // AMS theorem gate: per-row variance <= F2(A)*F2(B)/width, median of 5
    // within 4 sigma with overwhelming margin
    def f2(df: org.apache.spark.sql.DataFrame) = df.groupBy("pk").count()
      .collect().map(r => { val c = r.getLong(1); c * c }).sum
    val sigma = math.sqrt(f2(ev).toDouble * f2(ords).toDouble /
                          Relational.JoinSizeCrossWidth)
    assert(math.abs(est - exact).toDouble <= 4.0 * sigma,
      s"estimate off by ${est - exact} with sigma=$sigma — outside the AMS bound")
  }

  test("advisorCycle: base-build + delta-append serves the whole-build verdicts row for row") {
    val cycle = Relational.advisorCycle(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val whole = Relational.planAdvisor(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(cycle === whole,
      "appended sketch store must be indistinguishable from the full build")
    // steady state: a second call must not re-append (the fpFull stamp) —
    // verdicts stay identical, which a double-append would break (cells
    // doubled on the delta shard keys)
    val again = Relational.advisorCycle(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(again === whole, "re-run must serve the same store, not re-append")
  }

  test("joinOrderAdvisor: the store picks dim_first on this schema; both orders count-equal") {
    import graft.sources.Tables
    val row = Relational.joinOrderAdvisor(spark, sf0001).collect()(0)
    assert(row.getString(3) === "dim_first",
      s"|O⋈C| ≈ |orders| must price under |L⋈O| ≈ |lineitem|: $row")
    assert(row.getLong(1) > row.getLong(2),
      s"est_lo must exceed est_oc on this schema: $row")
    // order invariance: the chain's cardinality is the same either way
    val l = Tables.lineitem(spark, sf0001).select(col("l_orderkey"))
    val o = Tables.orders(spark, sf0001).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, sf0001).select(col("c_custkey"))
    val factFirst = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey")).count()
    val dimFirst = l.join(o.join(c, col("o_custkey") === col("c_custkey")),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(factFirst === dimFirst && row.getLong(4) === dimFirst,
      s"join order changed the answer: $factFirst / $dimFirst / $row")
  }

  test("chainDpVerdict: dims-first wins on this schema's shape; tie-break is deterministic") {
    // the sf0.001 shape: |L⋈O| ≈ 6000, |O⋈C| ≈ 1500, |C⋈N| ≈ 150
    val (order, cost) = Relational.chainDpVerdict(
      est = Seq(6000L, 1500L, 150L), nDiv = Seq(1500L, 150L))
    assert(order === "cn_ocn", s"got $order at cost $cost")
    assert(cost === BigInt(150 + 1500 * 150 / 150), s"cost must be card(C,N)+card(O,C,N): $cost")
    // equal costs resolve by name — engine and oracle can never disagree
    val (tied, _) = Relational.chainDpVerdict(Seq(0L, 0L, 0L), Seq(1L, 1L))
    assert(tied === "cn_ocn", "alphabetical tie-break")
    // negative estimates clamp to 0, degenerate divisors to 1 — no throw
    val (_, clamped) = Relational.chainDpVerdict(Seq(-5L, -5L, -5L), Seq(0L, 0L))
    assert(clamped === BigInt(0))
  }

  test("joinOrderDp: executes the DP's winner and the order never changes the answer") {
    val row = Relational.joinOrderDp(spark, sf0001).collect()(0)
    assert(row.getString(4) === "cn_ocn",
      s"the DP must pick dims-first on this schema: $row")
    val l = Tables.lineitem(spark, sf0001).select(col("l_orderkey"))
    val o = Tables.orders(spark, sf0001).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, sf0001).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, sf0001).select(col("n_nationkey"))
    val factFirst = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey")).count()
    assert(row.getLong(6) === factFirst,
      s"DP order changed the chain cardinality: $row vs $factFirst")
  }

  test("joinOrderDp flips when a tightened filter collapses the fact edge (r13 task 3)") {
    def side(df: org.apache.spark.sql.DataFrame, k: String) =
      df.select(col(k).cast("string").as("pk")).filter(col("pk").isNotNull)
        .groupBy("pk").agg(count(lit(1)).as("w"))
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    val c = Tables.customer(spark, sf0001)
    val n = Tables.nation(spark, sf0001)
    val estOc = Relational.pairEstimate(side(o, "o_custkey"), side(c, "c_custkey"))
    val estCn = Relational.pairEstimate(side(c, "c_nationkey"), side(n, "n_nationkey"))
    val nDiv = Seq(o.count(), c.count())
    // untightened: the fact edge dominates -> dims first
    val estLo = Relational.pairEstimate(side(li, "l_orderkey"), side(o, "o_orderkey"))
    val (loose, _) = Relational.chainDpVerdict(Seq(estLo, estOc, estCn), nDiv)
    assert(loose === "cn_ocn", s"unfiltered chain must start at the dims: $loose")
    // tightened: a highly selective lineitem filter re-prices the fact
    // edge to a handful of pairs — the DP must now START at the fact join
    val estLoTight = Relational.pairEstimate(
      side(li.filter(col("l_orderkey") <= 3), "l_orderkey"), side(o, "o_orderkey"))
    val (tight, _) = Relational.chainDpVerdict(Seq(estLoTight, estOc, estCn), nDiv)
    assert(tight === "lo_loc",
      s"tightening the filter must flip the DP to fact-first: estLoTight=$estLoTight -> $tight")
  }

  test("graphDpVerdict: dims-first wins on this schema; a selective events edge flips the start") {
    // sf0.01-shaped inputs: edges priced ~ their exact cardinalities
    val est = Map("customer_nation_dim" -> 1500L, "events_orders_mn" -> 100000L,
      "lineitem_orders_fk" -> 60000L, "lineitem_part_dim" -> 60000L,
      "orders_customer_dim" -> 15000L)
    val n = Map("customer" -> 1500L, "events" -> 10000L, "lineitem" -> 60000L,
      "nation" -> 25L, "orders" -> 15000L, "part" -> 2000L)
    val (order, cost) = Relational.graphDpVerdict(est, n)
    assert(order.mkString(">") === "customer>nation>orders>lineitem>part>events",
      s"dims-outward, fact edges late, the M:N edge last: $order at $cost")
    // a highly selective events predicate re-prices the M:N edge to a
    // handful of pairs — the DP must now lead with it instead of saving it
    val (flipped, _) = Relational.graphDpVerdict(est + ("events_orders_mn" -> 5L), n)
    assert(flipped.take(2).toSet === Set("events", "orders"),
      s"a tiny events edge must start the order: $flipped")
    // subset cards are order-free (the DP's premise): the closed form
    // depends only on the subset
    val s = Set("lineitem", "orders", "customer")
    assert(Relational.graphCard(s, est, n) ===
      BigInt(60000L) * 15000L / 15000L)
  }

  test("joinGraphDp: executes the winner; the order never changes the six-way cardinality") {
    val row = Relational.joinGraphDp(spark, sf0001).collect()(0)
    assert(row.getString(1).endsWith(">events"),
      s"the M:N edge must join last on this schema: $row")
    val exact = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf0001), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
      .join(Tables.events(spark, sf0001), col("user_id") === col("o_custkey"))
      .count()
    assert(row.getLong(3) === exact,
      s"DP order changed the graph cardinality: $row vs $exact")
  }

  test("graphCardRecall: count-vector exact sides equal the materialized joins; M:N composition priced") {
    val rows = Relational.graphCardRecall(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("events_orders_customer", "events_orders_lineitem"))
    // the count-vector arithmetic IS the join count (cross-checked by
    // materializing the pair mass once, at fixture scale only)
    val eoc = Tables.events(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("user_id") === col("o_custkey"))
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .count()
    val eol = Tables.events(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("user_id") === col("o_custkey"))
      .join(Tables.lineitem(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(rows(0).getLong(1) === eoc, s"EOC count-vector sum diverged: ${rows(0)} vs $eoc")
    assert(rows(1).getLong(1) === eol, s"EOL count-vector sum diverged: ${rows(1)} vs $eol")
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, s"M:N subsets must be non-empty on driver data: $r")
      assert(math.abs(r.getLong(3)) <= 500L,
        s"composed M:N estimate beyond 500 permille on ${r.getString(0)}: $r")
    }
  }

  test("chainCardRecall: the composed (independence) estimates priced against exact chain counts") {
    val rows = Relational.chainCardRecall(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("lineitem_orders_customer", "orders_customer_nation"))
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, s"exact chain count must be positive: $r")
      // FK chains make the independence composition near-exact here: each
      // order has one customer, each customer one nation — so the
      // instrument's error is the sketch error, not the model's
      assert(math.abs(r.getLong(3)) <= 500L,
        s"composed estimate beyond 500 permille on ${r.getString(0)}: $r")
    }
  }

  test("advisorRecall: every candidate priced, truth side positive, error bounded") {
    val rows = Relational.advisorRecall(spark, sf0001).collect()
    assert(rows.length === Relational.AdvisorJoins.length)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, s"exact side must be a real join count: $r")
      assert(math.abs(r.getLong(3)) <= 500L,
        s"store error beyond 500 permille on ${r.getString(0)}: $r")
    }
  }

  test("joinSkewAuto: plain and salted regimes give identical answers; route follows the cut") {
    import spark.implicits._
    // planted hot key: user 7 owns 900 of 1000 rows (share 900 permille)
    val hot = (1 to 900).map(i => (7L, s"t${i % 3}", i.toLong)) ++
      (1 to 100).map(i => (100L + i, s"t${i % 3}", 10000L + i))
    val evHot = hot.toDF("user_id", "event_type", "event_id")
    val ords = ((1 to 20).map(_ => 7L) ++ (101L to 150L)).toDF("o_custkey")
    val plain = Relational.joinSkewJoined(evHot, ords, "plain")
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    val salted = Relational.joinSkewJoined(evHot, ords, "salted")
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(plain.sameElements(salted),
      s"salting changed the join result: ${plain.toSeq} vs ${salted.toSeq}")
    assert(plain.map(_._2).sum === 900L * 20 + 50,
      s"hot key must fan out 900x20 plus one row per cold match: ${plain.toSeq}")
    // the route decisions under the declared 50 permille cut
    assert(Relational.joinSkewRouteOf(1000L, 900L) === "salted")
    assert(Relational.joinSkewRouteOf(1000L, 50L) === "plain") // 50 permille is NOT over the cut
    assert(Relational.joinSkewRouteOf(1000L, 51L) === "salted")
    assert(Relational.joinSkewRouteOf(0L, 0L) === "plain")
  }

  test("joinSkewAudit evidence row matches the stats the router read") {
    val row = Relational.joinSkewAudit(spark, sf0001).collect()(0)
    val (n, keys, maxc) = Relational.joinSkewStats(spark, sf0001)
    assert(row.getLong(0) === n && row.getLong(1) === keys && row.getLong(2) === maxc)
    assert(row.getLong(3) === maxc * 1000L / n)
    assert(row.getString(5) === Relational.joinSkewRouteOf(n, maxc))
    // joinSkewAuto's route column agrees with the audit
    val auto = Relational.joinSkewAuto(spark, sf0001).select("route").distinct().collect()
    assert(auto.length === 1 && auto(0).getString(0) === row.getString(5))
  }
}
