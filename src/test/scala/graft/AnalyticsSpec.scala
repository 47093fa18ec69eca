package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Ranking, TextAnalysis}

/** Behavioral-analytics and ranking operators: invariants that don't need
  * the DuckDB oracle (the differential gate covers exact values; these
  * specs pin the semantic properties that must survive refactors). */
class AnalyticsSpec extends SparkSpecBase {

  test("quantileSketch: binned estimates track exact percentiles within one bin width") {
    import spark.implicits._
    val est = Analytics.quantileSketch(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(est.keySet === Set(50, 90, 95, 99))
    val prices = graft.sources.Tables.lineitem(spark, sf0001)
      .select("l_extendedprice").as[Double].collect().sorted
    val n = prices.length
    val width = (prices.last - prices.head) / 1024
    est.foreach { case (q, e) =>
      // same target rank the sketch uses: smallest index with cum ≥ ⌈qn/100⌉
      val exact = prices(((q * n + 99) / 100 - 1).max(0).min(n - 1))
      assert(math.abs(e - exact) <= width + 0.01,
        s"q$q: est $e vs exact $exact exceeds bin width $width")
    }
    // determinism: the sketch is integer-exact, so re-runs are identical
    val again = Analytics.quantileSketch(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(again === est)
  }

  test("quantileRollup: merged state ≡ direct state bit-for-bit; read-out matches a scalar replay") {
    import spark.implicits._
    // hand grid: two cells over a 10-bin grid with overlapping bins
    val rows = Seq(("a", 1L), ("a", 5L), ("a", 9L), ("b", 1L), ("b", 2L), ("b", 9L), ("b", 9L))
    val df = rows.toDF("cell", "bin")
    val perCell = df.groupBy("cell")
      .agg(call_function("graft_hist_state", col("bin"), lit(10)).as("h"))
    // THE mergeable-summary claim, exact: element-wise merge of the stored
    // states equals the state a direct pass over the union builds
    val merged = perCell
      .agg(call_function("graft_hist_merge", col("h"), lit(10)))
      .head().getSeq[Long](0)
    val direct = df
      .agg(call_function("graft_hist_state", col("bin"), lit(10)))
      .head().getSeq[Long](0)
    assert(merged === direct)
    assert(direct === Seq(0L, 2L, 1L, 0L, 0L, 1L, 0L, 0L, 0L, 3L))
    // partitioning invariance: the aggregate is commutative
    val shuffled = df.repartition(7).groupBy("cell")
      .agg(call_function("graft_hist_state", col("bin"), lit(10)).as("h"))
      .agg(call_function("graft_hist_merge", col("h"), lit(10)))
      .head().getSeq[Long](0)
    assert(shuffled === direct)

    // full query: scalar replay at sf0.001 — per-scope quantiles from the
    // raw cents, same grid/target/midpoint arithmetic
    val got = Analytics.quantileRollup(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val mn = ev.map(_._2).min; val mx = ev.map(_._2).max
    val scopes = ev.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) } +
      ("__all__" -> ev.map(_._2))
    val expected = for {
      (scope, cs) <- scopes
      bins = cs.map(c => (c - mn) * 1024 / (mx - mn + 1)).sorted
      q <- Seq(50, 90, 95, 99)
    } yield {
      val bin = bins((((q * cs.length + 99) / 100) - 1).max(0))
      (scope, q) -> ((mn + (2 * bin + 1) * (mx - mn + 1) / 2048).toDouble / 100.0)
    }
    assert(got === expected.toMap)
    // the plan partial-aggregates: the shuffle carries one fixed-size
    // state per (cell, map partition), never raw rows
    val qdf = Analytics.quantileRollup(spark, sf0001)
    qdf.collect()
    val plan = qdf.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_hist_state"),
      s"histogram state lost its map-side combine:\n$plan")
  }

  test("dsirWeights/dsirSample: scalar replay of the bit-weight chain; target source ranks high; threshold rule exact") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // scalar replay — independent Scala implementation of the declared chain
    val B = 1024
    def grams(t: String): Seq[String] = {
      val ws = t.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq
      ws ++ ws.sliding(2).filter(_.size == 2).map(p => s"${p(0)} ${p(1)}")
    }
    def bucket(g: String): Int =
      ((TextAnalysis.md5Low64(g) & Long.MaxValue) % B).toInt
    val perDoc = docs.map { case (id, src, t) =>
      (id, src, grams(t).groupBy(bucket).map { case (b, gs) => b -> gs.size.toLong })
    }
    val cp = new Array[Long](B); val cq = new Array[Long](B)
    perDoc.foreach { case (_, src, f) => f.foreach { case (b, c) =>
      cp(b) += c; if (src == "src0") cq(b) += c } }
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val cal = bitlen(cp.sum + B) - bitlen(cq.sum + B)
    val expW = perDoc.map { case (id, _, f) =>
      val nf = f.values.sum
      id -> (nf, f.map { case (b, c) => c * (bitlen(cq(b) + 1) - bitlen(cp(b) + 1)) }.sum + nf * cal)
    }.toMap
    val got = TextAnalysis.dsirWeights(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expW, "engine w_bits must equal the scalar replay")
    // the SELECTION signal: target-source docs must dominate the ranking
    // (their own n-grams define q̂, so their weights sit at the top)
    val bySrc = docs.map(d => d._1 -> d._2).toMap
    val ranked = got.toSeq.sortBy(-_._2._2).map(_._1)
    val k = math.max(1, docs.count(_._2 == "src0") / 2)
    val topK = ranked.take(k)
    val share = topK.count(id => bySrc(id) == "src0").toDouble / k
    val base = docs.count(_._2 == "src0").toDouble / docs.length
    assert(share > 2 * base,
      s"target share in top-$k is $share, base rate $base — no selection signal")
    // sample: exactly the >= T set for the largest T with |{>= T}| >= ceil(N/10)
    val n = docs.length
    val kSel = (n + 9) / 10
    val ws = got.values.map(_._2).toSeq.sorted(Ordering[Long].reverse)
    val t = ws(kSel - 1)
    val expSel = got.filter(_._2._2 >= t).keySet
    val gotSel = TextAnalysis.dsirSample(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(gotSel === expSel)
    assert(gotSel.size >= kSel, "boundary ties must be included, never cut")
  }

  test("hllRollup: max-merge ≡ direct bit-for-bit, idempotent on overlap; estimate tracks exact") {
    import spark.implicits._
    val vals = (1 to 500).map(i => (if (i % 2 == 0) "a" else "b", s"u$i"))
    val df = vals.toDF("cell", "v")
    val perCell = df.groupBy("cell")
      .agg(call_function("graft_hll_state", col("v"), lit(8)).as("h"))
    val merged = perCell
      .agg(call_function("graft_hll_merge", col("h"), lit(8)))
      .head().getSeq[Long](0)
    val direct = df
      .agg(call_function("graft_hll_state", col("v"), lit(8)))
      .head().getSeq[Long](0)
    // THE register-max mergeable claim, exact
    assert(merged === direct)
    // IDEMPOTENCE — what max has over KMV-trim and histogram-add:
    // a re-ingested (overlapping) shard cannot move the union state
    val overlap = df.union(df.filter(col("cell") === "a")).repartition(7)
      .agg(call_function("graft_hll_state", col("v"), lit(8)))
      .head().getSeq[Long](0)
    assert(overlap === direct)
    // width mismatch must throw, not silently corrupt
    val ex = intercept[Exception] {
      perCell.agg(call_function("graft_hll_merge", col("h"), lit(9))).collect()
    }
    assert(ex.getMessage.contains("registers") || ex.getMessage != null)

    // full query at sf0.001: estimates within the 3-sigma band of exact
    // (sigma = 1.04/sqrt(256) ≈ 6.5%), every scope
    val got = Analytics.hllRollup(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id").cast("string").as("uid")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exact = ev.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.length } +
      ("__all__" -> ev.map(_._2).distinct.length)
    exact.foreach { case (scope, n) =>
      val (_, _, est) = got(scope)
      assert(math.abs(est - n) <= 0.195 * n + 3,
        s"$scope: hll est $est vs exact $n outside 3-sigma")
    }
    // scalar register replay: same hash → bucket → rank chain, per scope
    val mByScope = ev.map { case (t, u) =>
      val h = graft.operators.TextAnalysis.md5Low64(u) & Long.MaxValue
      (t, (h % 256).toInt, math.max(1, 56 - (64 - java.lang.Long.numberOfLeadingZeros(h / 256))))
    }
    val expZero = mByScope.groupBy(_._1).map { case (t, rs) =>
      t -> (256 - rs.map(_._2).distinct.length).toLong
    }
    expZero.foreach { case (scope, z) =>
      assert(got(scope)._1 === z, s"$scope: n_zero ${got(scope)._1} != scalar $z")
    }
    // map-side combine survives in the plan
    val qdf = Analytics.hllRollup(spark, sf0001)
    qdf.collect()
    val plan = qdf.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_hll_state"),
      s"hll state lost its map-side combine:\n$plan")
  }

  test("packSequencesSharded: per-lang ids dense from 0, shard blocks contiguous and disjoint") {
    val rows = TextAnalysis.packSequencesSharded(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      // every shard owns one contiguous id block; blocks tile [0, total)
      val blocks = rs.groupBy(_._2).values
        .map(ss => (ss.map(_._5).min, ss.map(_._6).max)).toSeq.sorted
      assert(blocks.head._1 === 0L, s"$lang ids must start at 0: $blocks")
      blocks.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          assert(s2 === e1 + 1, s"$lang shard blocks not abutting: $blocks")
        case _ =>
      }
      // within a shard, consecutive docs abut or share a boundary sequence
      rs.groupBy(_._2).values.foreach { ss =>
        ss.sortBy(_._3).toSeq.sliding(2).foreach {
          case Seq(a, b) => assert(b._5 - a._6 <= 1 && b._5 >= a._5,
            s"$lang shard ${a._2}: doc ranges tear between $a and $b")
          case _ =>
        }
      }
    }
    // doc set and token counts agree with the unsharded form
    val unsharded = graft.operators.TextAnalysis.packSequences(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rows.map(r => (r._1, r._3, r._4)).sorted.toSeq === unsharded)
  }

  test("range_join tiers partition orders completely and disjointly") {
    val n = graft.sources.Tables.orders(spark, sf0001).count()
    val tiers = Analytics.rangeJoinTiers(spark, sf0001).collect()
    assert(tiers.map(_.getLong(1)).sum == n,
      "every order lands in exactly one tier (cover + disjoint)")
  }

  test("event_funnel stages are monotonically non-increasing") {
    val r = Analytics.eventFunnel(spark, sf0001).collect().head
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel must narrow: $v >= $c >= $p")
    assert(v > 0, "fixture has viewers")
  }

  test("ntile quartiles are balanced within each priority class") {
    val rows = Analytics.ntileSpend(spark, sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, qs) =>
      val counts = qs.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, "ntile splits differ by at most 1")
      // quartile value ranges must not overlap: q(i).max <= q(i+1).min
      val ordered = qs.sortBy(_.getLong(1))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(4) <= b.getDouble(3) + 0.011,
            "quartiles ordered by value (rounding slack)")
        case _ =>
      }
    }
  }

  test("user_paths emits at most 10 steps, comma-joined, per user") {
    val rows = Analytics.userPaths(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val path = r.getString(1)
      val n = r.getLong(2)
      assert(n <= 10 && path.split(",").length.toLong == n)
    }
  }

  test("top_supplier agrees with a brute-force argmax") {
    val suppliers = graft.sources.Tables.supplier(spark, sf0001)
      .join(graft.sources.Tables.nation(spark, sf0001),
        col("s_nationkey") === col("n_nationkey"))
      .select("n_name", "s_name", "s_acctbal", "s_suppkey").collect()
    val expected = suppliers.groupBy(_.getString(0)).map { case (nn, rs) =>
      nn -> rs.maxBy(r => (r.getDouble(2), r.getLong(3)))
    }
    Analytics.topSupplierPerNation(spark, sf0001).collect().foreach { r =>
      assert(expected(r.getString(0)).getString(1) == r.getString(1))
    }
  }

  test("order_gaps: only multi-order customers, non-negative gaps") {
    val rows = Analytics.orderGaps(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getDouble(3) >= r.getDouble(2) - 1e-9, "max gap >= avg gap")
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("tfidf: rank-1 term per doc has the doc's max tf*idf; ranks dense") {
    val rows = Ranking.tfidfTerms(spark, sf0001).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length).toSeq)
      // scores non-increasing down the ranks
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) >= b.getDouble(4) - 1e-6)
        case _ =>
      }
    }
  }

  test("bm25: exactly top-10, scores non-increasing, all positive") {
    val rows = Ranking.bm25Search(spark, sf0001).collect()
    assert(rows.length == 10)
    val scores = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    scores.sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-9)
      case _ =>
    }
    assert(scores.forall(_ > 0.0), "query terms occur in the corpus")
  }

  test("mixtureWeights: α=0.5 flattens — boost anti-monotone in size, shares sum to 1") {
    val rows = TextAnalysis.mixtureWeights(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val idx = rows.head.schema.fieldNames.zipWithIndex.toMap
    val parsed = rows.map { r =>
      (r.getString(idx("source")), r.getLong(idx("n_tokens")), r.getLong(idx("weight")),
       r.getDouble(idx("sample_share")), r.getDouble(idx("natural_share")),
       r.getDouble(idx("boost")), r.getDouble(idx("expected_epochs")))
    }
    parsed.foreach { case (_, nt, wt, ss, ns, boost, epochs) =>
      assert(wt === math.sqrt(nt.toDouble).floor.toLong)
      assert(ss > 0 && ns > 0 && boost > 0 && epochs > 0)
      // boost reconciles with the emitted shares at rounding tolerance
      assert(math.abs(boost - ss / ns) <= 0.02 * boost)
    }
    assert(math.abs(parsed.map(_._4).sum - 1.0) <= 1e-4, "sample shares must sum to 1")
    assert(math.abs(parsed.map(_._5).sum - 1.0) <= 1e-4, "natural shares must sum to 1")
    // the flattening property: smaller sources get strictly larger boosts
    // (up to floor-quantization of the integer weights)
    val bySize = parsed.sortBy(_._2)
    bySize.sliding(2).foreach {
      case Array(small, large) if small._2 < large._2 =>
        assert(small._6 >= large._6 - 0.02,
          s"boost must not grow with size: $small vs $large")
      case _ =>
    }
    // and at least one source is genuinely up-sampled, one down-sampled
    assert(parsed.exists(_._6 > 1.0) && parsed.exists(_._6 < 1.0),
      "temperature sampling is degenerate on the fixture")
  }

  test("ngramNovelty: re-derives from the shingle sets; exact duplicates score zero") {
    val rows = TextAnalysis.ngramNovelty(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.nonEmpty)
    val sets = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> graft.operators.Dedup.shinglesScala(r.getString(1), 3).toSet)
      .filter(_._2.nonEmpty).toMap
    assert(rows.keySet === sets.keySet)
    val dfc = sets.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    sets.foreach { case (id, s) =>
      val (ng, nu, nov) = rows(id)
      assert(ng === s.size.toLong)
      assert(nu === s.count(g => dfc(g) == 1).toLong)
      assert(math.abs(nov - nu.toDouble / ng) <= 5e-5 + 1e-9)
    }
    // structural: any doc sharing its FULL shingle set with another
    // (exact near-dup) has novelty 0; and some doc contributes novelty
    val dups = sets.toSeq.groupBy(_._2).values.filter(_.size > 1).flatMap(_.map(_._1))
    dups.foreach(id => assert(rows(id)._3 === 0.0, s"duplicate doc $id has novelty"))
    assert(rows.values.exists(_._3 > 0.0), "corpus has zero novelty — degenerate")
  }

  test("sourceNovelty: pools the per-doc novelty exactly, totals tile") {
    import org.apache.spark.sql.functions.col
    val rollup = TextAnalysis.sourceNovelty(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val perDoc = TextAnalysis.ngramNovelty(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val src = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = perDoc.toSeq.groupBy { case (id, _) => src(id) }
      .view.mapValues { docs =>
        (docs.size.toLong, docs.map(_._2._1).sum, docs.map(_._2._2).sum)
      }.toMap
    assert(rollup.keySet === expected.keySet)
    rollup.foreach { case (s, (nd, tg, ug, rate)) =>
      val (end, etg, eug) = expected(s)
      assert((nd, tg, ug) === ((end, etg, eug)), s"rollup drift at $s")
      assert(math.abs(rate - ug.toDouble / tg) <= 5e-5 + 1e-9)
    }
    assert(rollup.values.map(_._1).sum === perDoc.size.toLong)
  }

  test("qualityCalibration: cells tile the scored corpus and re-derive from both metrics") {
    val cells = TextAnalysis.qualityCalibration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells.nonEmpty)
    val q = TextAnalysis.qualityScore(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.schema.fieldIndex("quality"))).toMap
    val p = TextAnalysis.perplexityScore(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.schema.fieldIndex("ppl_bits"))).toMap
    val expected = q.keys.filter(p.contains).toSeq
      .map(id => (math.min(math.floor(q(id) * 10).toLong, 9L),
                  math.min(math.floor(p(id)).toLong, 15L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(cells === expected)
    assert(cells.values.sum === q.keys.count(p.contains).toLong,
      "contingency must tile every doc scored by both metrics")
    cells.keys.foreach { case (qb, pb) =>
      assert(qb >= 0 && qb <= 9 && pb >= 0 && pb <= 15)
    }
  }

  test("packingReport: reconciles with pack_sequences' actual layout per language") {
    val report = TextAnalysis.packingReport(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    // the real layout: per lang, the last sequence id + 1 is the count
    val packed = TextAnalysis.packSequences(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val byLang = packed.groupBy(_._1)
    assert(report.keySet === byLang.keySet)
    byLang.foreach { case (lang, rows) =>
      val (nd, nt, ns, pad, util) = report(lang)
      assert(nd === rows.length.toLong)
      assert(nt === rows.map(_._3).sum)
      assert(ns === rows.map(_._4).max + 1,
        s"$lang sequence count disagrees with the layout's last sequence id")
      assert(pad === ns * 2048 - nt && pad >= 0 && pad < 2048)
      assert(math.abs(util - nt.toDouble / (ns * 2048)) <= 5e-5 + 1e-9)
      assert(util > 0 && util <= 1)
    }
  }

  test("tokenLengthHistogram: bins are exact log2, totals tile, every doc in range") {
    import org.apache.spark.sql.functions.col
    val rows = TextAnalysis.tokenLengthHistogram(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val toks = graft.sources.Tables.documents(spark, sf0001)
      .select(graft.functions.TextFunctions.bpeTokenCount(col("text")).as("t"))
      .collect().map(_.getLong(0))
    val expected = toks.groupBy(t =>
        if (t <= 0) -1L else (63 - java.lang.Long.numberOfLeadingZeros(t)).toLong)
      .view.mapValues(v => (v.length.toLong, v.sum)).toMap
    assert(rows.map(_.getLong(0)).toSet === expected.keySet)
    rows.foreach { r =>
      val (bin, lo, nd, nt) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert((nd, nt) === expected(bin))
      if (bin >= 0) {
        assert(lo === (1L << bin))
        // every token count in this bin really lies in [2^bin, 2^(bin+1))
        toks.filter(t => t > 0 && 63 - java.lang.Long.numberOfLeadingZeros(t) == bin)
          .foreach(t => assert(t >= lo && t < lo * 2))
      } else assert(lo === 0L)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    }
    assert(rows.map(_.getLong(2)).sum === toks.length.toLong)
    assert(rows.map(_.getLong(3)).sum === toks.sum)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) <= 1e-3)
  }

  test("quotaSample: per-source maximal digest-ordered prefix within the integer budget") {
    import org.apache.spark.sql.functions.{col, expr}
    val budget = 20000L
    val out = TextAnalysis.quotaSample(spark, sf0001, budget).collect()
    assert(out.nonEmpty)
    val idx = out.head.schema.fieldNames.zipWithIndex.toMap
    // replay: per-doc token counts in md5 order per source
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.bpeTokenCount(col("text")).as("toks"),
        expr("md5(cast(doc_id as string))").as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .filter(_._3 > 0)
    val bySource = docs.groupBy(_._2)
    val weights = bySource.view.mapValues(ds =>
      math.sqrt(ds.map(_._3).sum.toDouble).floor.toLong).toMap
    val sumw = weights.values.sum
    val expected = bySource.toSeq.flatMap { case (src, ds) =>
      val b = weights(src) * budget / sumw
      var cum = 0L
      ds.sortBy(d => (d._4, d._1)).toSeq.flatMap { d =>
        cum += d._3
        if (cum <= b) Some((src, d._1, d._3, cum, b)) else None
      }
    }.toSet
    val got = out.map(r => (r.getString(idx("source")), r.getLong(idx("doc_id")),
      r.getLong(idx("n_tokens")), r.getLong(idx("cum_tokens")), r.getLong(idx("budget")))).toSet
    assert(got === expected)
    // the budget actually cuts, and no source exceeds it
    assert(got.size < docs.length, "quota did not gate anything")
    got.foreach { case (_, _, _, cum, b) => assert(cum <= b) }
  }

  test("hybridSearch: RRF fusion equals an independent replay of both candidate lists") {
    val out = Ranking.hybridSearch(spark, sf0001).collect()
    assert(out.length == 10)
    val idx = out.head.schema.fieldNames.zipWithIndex.toMap
    // replay: lexical ranks from bm25 at kEach=20
    val lex = Ranking.bm25Search(spark, sf0001, 20).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    // semantic ranks from the hashed embeddings vs the query pseudo-doc
    val embs = TextAnalysis.embedDocuments(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val qh = graft.functions.expressions.HashEmbedKernel
      .hashEmbed(org.apache.spark.unsafe.types.UTF8String.fromString("stream join window"), 64)
      .toLongArray()
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val sem = embs.map { case (id, e) => (id, cos(e, qh)) }
      .sortBy { case (id, c) => (-c, id) }.take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val expected = (lex.keySet ++ sem.keySet).toSeq.map { id =>
      val rrf = lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
                sem.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, rrf)
    }.sortBy { case (id, r) => (-r, id) }.take(10)
    out.sortBy(_.getLong(idx("rnk"))).zip(expected).foreach { case (row, (id, rrf)) =>
      assert(row.getLong(idx("doc_id")) === id)
      assert(math.abs(row.getDouble(idx("rrf")) - rrf) <= 5e-7 + 1e-12)
      // the reported source ranks are the replayed ones (nulls for absent)
      assert(Option(row.get(idx("rnk_lex"))).map(_.asInstanceOf[Long]) === lex.get(id))
      assert(Option(row.get(idx("rnk_sem"))).map(_.asInstanceOf[Long]) === sem.get(id))
    }
  }

  test("triangleCountEdges: known graphs count exactly, orientation counts each triangle once") {
    import spark.implicits._
    // K4 (4 triangles, 6 edges, every triple closed) + a pendant path that
    // adds edges/wedges but no triangles
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val path = Seq((3L, 10L), (10L, 11L))
    val out = graft.operators.Ranking.triangleCountEdges(
      (k4 ++ path).toDF("a", "b")).head()
    assert((out.getLong(0), out.getLong(2)) === (8L, 4L),
      s"K4+path: edges/triangles wrong: $out")
    // brute-force differential on the derived corpus graph: every triple
    // (x<y<z) with all three edges present, counted from the full edge set
    val docs = (0L until 60L).toDF("doc_id")
    val oriented = graft.operators.Ranking.triangleCountFrom(docs).head()
    val n = 60L
    val es = (0L until n).flatMap { s =>
      Seq((s * 7 + 3) % n, (s * 13 + 5) % n) ++
        (if (s % 3 == 0) Seq((s * 31 + 11) % n) else Nil) map (d => (s, d))
    }.filter { case (s, d) => s != d }
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }.toSet
    val brute = (for {
      x <- 0L until n; y <- (x + 1) until n; z <- (y + 1) until n
      if es((x, y)) && es((x, z)) && es((y, z))
    } yield 1).size.toLong
    assert(oriented.getLong(2) === brute,
      s"oriented count ${oriented.getLong(2)} != brute $brute")
    assert(oriented.getLong(0) === es.size.toLong)
  }

  test("linkRank equals an exact scalar fixed-point replication, any partitioning") {
    import spark.implicits._
    // 40 docs — the scalar model mirrors the engine's integer arithmetic
    // operation for operation, so equality is EXACT, not approximate.
    val n = 40L
    val ids = (0L until n)
    val scale = 1099511627776L
    val base = scale / n
    val edges = ids.flatMap { i =>
      Seq((i * 7 + 3) % n, (i * 13 + 5) % n) ++
        (if (i % 3 == 0) Seq((i * 31 + 11) % n) else Seq())
    }.zip(ids.flatMap(i => Seq.fill(if (i % 3 == 0) 3 else 2)(i)))
      .map { case (dst, src) => (src, dst) }.filter { case (s, d) => s != d }
      .distinct
    val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = ids.map(_ -> base).toMap
    for (_ <- 1 to 3) {
      val inflow = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / odeg(s) }.sum
      }
      r = ids.map(i => i -> (15L * base + 85L * inflow.getOrElse(i, 0L)) / 100L).toMap
    }
    val indeg = edges.groupBy(_._2).map { case (d, es) => d -> es.size.toLong }
    val expected = ids.map(i => (i, indeg.getOrElse(i, 0L), r(i))).toSet
    val docs = ids.toDF("doc_id")
    val got = graft.operators.Ranking.linkRankFrom(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got === expected)
    val again = graft.operators.Ranking.linkRankFrom(docs.repartition(7)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(again === expected)
    // sanity: damping floor holds and rank mass is conserved up to
    // integer-floor leakage (flooring only ever loses mass)
    assert(r.values.forall(_ >= (15L * base) / 100L))
    assert(r.values.sum <= scale)
    // the graph must actually differentiate documents
    assert(r.values.toSet.size > 1)
  }

  test("linkCommunities equals scalar union-find ground truth; structure non-degenerate") {
    import spark.implicits._
    val n = 200L
    val ids = (0L until n)
    // scalar ground truth: union-find over the same-host affine edges
    val parent = scala.collection.mutable.ArrayBuffer.tabulate(n.toInt)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }; r }
    ids.foreach { s =>
      val dsts = Seq((s * 7 + 3) % n, (s * 13 + 5) % n) ++
        (if (s % 3 == 0) Seq((s * 31 + 11) % n) else Seq())
      dsts.filter(d => d != s && d % 5 == s % 5).foreach { d =>
        val (ra, rb) = (find(s.toInt), find(d.toInt)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    // min-id labels + sizes from the union-find
    val label = ids.map(i => i -> find(i.toInt).toLong).toMap
    val size = label.values.groupBy(identity).map { case (l, vs) => l -> vs.size.toLong }
    val expected = ids.map(i => (i, label(i), size(label(i)))).toSet
    val got = graft.operators.Ranking.linkCommunitiesFrom(ids.toDF("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // partitioning-invariant
    val again = graft.operators.Ranking.linkCommunitiesFrom(ids.toDF("doc_id").repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === expected)
    // non-degenerate: many communities, and real multi-member farms exist
    val sizes = size.values.toSeq
    assert(size.size > 10, s"degenerate: only ${size.size} communities")
    assert(sizes.max > 2, s"no multi-member farm (max size ${sizes.max})")
    assert(sizes.count(_ == 1) > 0, "no singletons — gating structure lost")

    // --- rollup over the same graph reconciles with the scalar model ---
    val hostE = (for {
      s <- ids
      d <- Seq((s * 7 + 3) % n, (s * 13 + 5) % n) ++
        (if (s % 3 == 0) Seq((s * 31 + 11) % n) else Seq())
      if d != s && d % 5 == s % 5
    } yield (math.min(s, d), math.max(s, d))).distinct
    val fullE = (for {
      s <- ids
      d <- Seq((s * 7 + 3) % n, (s * 13 + 5) % n) ++
        (if (s % 3 == 0) Seq((s * 31 + 11) % n) else Seq())
      if d != s
    } yield (s, d)).distinct
    val inDeg = fullE.groupBy(_._2).map { case (d, es) => d -> es.size.toLong }
    val farms = label.groupBy(_._2).filter(_._2.size >= 2)
    val expRoll = farms.map { case (l, ms) =>
      val mem = ms.keySet
      val ie = hostE.count { case (a, b) => mem(a) && mem(b) }
      (l, ms.size.toLong, ie.toLong,
       mem.toSeq.map(m => inDeg.getOrElse(m, 0L)).sum)
    }.toSet
    val gotRoll = graft.operators.Ranking.communityRollupFrom(ids.toDF("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    assert(gotRoll === expRoll)
    // density sanity: every community's density in (0, 1]; at least one
    // non-clique (density < 1) so the column discriminates
    val dens = graft.operators.Ranking.communityRollupFrom(ids.toDF("doc_id"))
      .collect().map(_.getDouble(3))
    assert(dens.forall(d => d > 0.0 && d <= 1.0))
    assert(dens.exists(_ < 1.0), "every farm a clique — density column vacuous on fixture")
  }

  test("url dedup: canonical forms are lowercase-host, no tracking debris") {
    val rows = TextAnalysis.urlDedup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getString(0)
      assert(u.startsWith("https://shard"), s"scheme+host lowercased: $u")
      assert(!u.contains("www.") && !u.contains(":443") &&
             !u.contains("utm_") && !u.contains("#") && !u.endsWith("/"), u)
    }
    assert(rows.exists(_.getLong(2) > 1), "crawl variants collapsed")
    // canonicalization is idempotent on the synthetic corpus: variant count
    // equals the documents count
    assert(rows.map(_.getLong(2)).sum ==
      graft.sources.Tables.documents(spark, sf0001).count())
  }

  test("qualityFilter: 0/1 flags, keep is their conjunction, rules discriminate") {
    val rows = TextAnalysis.qualityFilter(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val idx = rows.head.schema.fieldNames.zipWithIndex.toMap
    val flagCols = Seq("pass_words", "pass_word_len", "pass_stopwords", "pass_repetition")
    rows.foreach { r =>
      val flags = flagCols.map(c => r.getInt(idx(c)))
      flags.foreach(f => assert(f == 0 || f == 1, s"flag out of {0,1}: $r"))
      assert(r.getInt(idx("keep")) === flags.product,
        s"keep must be the conjunction of the rule flags: $r")
      assert((r.getInt(idx("pass_words")) == 1) === (r.getLong(idx("n_words")) >= 10))
    }
    // the filter must actually cut: both verdicts occur on the corpus
    val keeps = rows.map(_.getInt(idx("keep"))).toSet
    assert(keeps === Set(0, 1), s"filter is degenerate on the corpus: $keeps")
  }

  test("sourceMix: shares sum to 1, doc/token totals reconcile with the corpus") {
    val rows = TextAnalysis.sourceMix(spark, sf0001).collect()
    val idx = rows.head.schema.fieldNames.zipWithIndex.toMap
    assert(rows.map(_.getString(idx("source"))).distinct.length === rows.length)
    assert(rows.map(_.getLong(idx("n_docs"))).sum ===
      graft.sources.Tables.documents(spark, sf0001).count())
    // per-source shares of the exact token sums re-add to 1 (4dp rounding
    // leaves at most n_sources × 5e-5 of drift)
    val shareSum = rows.map(_.getDouble(idx("token_share"))).sum
    assert(math.abs(shareSum - 1.0) <= rows.length * 5e-5 + 1e-9, s"share sum $shareSum")
    // token mass equals the token_count operator's corpus total
    val direct = TextAnalysis.tokenCount(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("bpe_tokens")).head().getLong(0)
    assert(rows.map(_.getLong(idx("total_tokens"))).sum === direct)
  }

  test("docChunks: the stride grid tiles every document exactly, fingerprints replay md5") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = TextAnalysis.docChunks(spark, sf0001).collect()
    val idx = chunks.head.schema.fieldNames.zipWithIndex.toMap
    val byDoc = chunks.groupBy(_.getLong(idx("doc_id")))
    assert(byDoc.keySet === docs.filter(_._2.nonEmpty).keySet, "every non-empty doc is chunked")
    byDoc.foreach { case (id, cs) =>
      val len = docs(id).length
      val sorted = cs.sortBy(_.getLong(idx("chunk_id")))
      assert(sorted.length === (len - 1) / 48 + 1, s"doc $id chunk count")
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(idx("chunk_id")) === i.toLong)
        assert(r.getLong(idx("chunk_start")) === i.toLong * 48 + 1)
        assert(r.getLong(idx("chunk_len")) === math.min(64L, len - i.toLong * 48))
      }
      // last chunk reaches exactly the end of the document
      val last = sorted.last
      assert(last.getLong(idx("chunk_start")) + last.getLong(idx("chunk_len")) - 1 === len.toLong)
    }
    // fingerprints are the md5 of the same substring slice (spot-check)
    val md = java.security.MessageDigest.getInstance("MD5")
    chunks.take(50).foreach { r =>
      val text = docs(r.getLong(idx("doc_id")))
      val s = (r.getLong(idx("chunk_start")) - 1).toInt
      val slice = text.substring(s, math.min(s + 64, text.length))
      val hex = md.digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(idx("chunk_fp")) === hex, s"fp mismatch at doc ${r.getLong(0)}")
    }
  }

  test("docChunks: CHARACTER semantics on multi-byte text (code points, not bytes)") {
    import spark.implicits._
    // 100 two-byte chars: byte-based slicing would see 200 "chars" (5
    // chunks) or split a é in half; char-based sees 100 → 3 chunks
    val accented = "é" * 100
    val mixed = "añología ünïcode δοκιμή " * 6 // 144 chars, mixed widths
    val rows = TextAnalysis.docChunksFrom(
        Seq((1L, accented), (2L, mixed)).toDF("doc_id", "text"))
      .collect()
    val idx = rows.head.schema.fieldNames.zipWithIndex.toMap
    val byDoc = rows.groupBy(_.getLong(idx("doc_id")))
    assert(byDoc(1L).length === (100 - 1) / 48 + 1)
    assert(byDoc(2L).length === (mixed.length - 1) / 48 + 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    byDoc.foreach { case (id, cs) =>
      val text = if (id == 1L) accented else mixed
      cs.foreach { r =>
        val s = (r.getLong(idx("chunk_start")) - 1).toInt
        val slice = text.substring(s, math.min(s + 64, text.length))
        assert(r.getLong(idx("chunk_len")) === slice.length.toLong)
        val hex = md.digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(r.getString(idx("chunk_fp")) === hex,
          s"unicode fp drift at doc $id chunk ${r.getLong(idx("chunk_id"))}")
      }
    }
  }

  test("kanonSuppress: retained cells all >= k, suppressed complement all < k, k discriminates") {
    val k = 5
    val rows = TextAnalysis.kanonSuppress(spark, sf0001, k).collect()
    assert(rows.nonEmpty)
    val idx = rows.head.schema.fieldNames.zipWithIndex.toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val trueCells = docs.groupBy(d => (d._2, d._3)).view.mapValues(_.length.toLong).toMap
    // every retained row reports its TRUE cell size, and that size >= k
    rows.foreach { r =>
      val cell = (r.getString(idx("lang")), r.getString(idx("source")))
      assert(r.getLong(idx("cell_size")) === trueCells(cell))
      assert(r.getLong(idx("cell_size")) >= k)
    }
    // the suppressed complement is EXACTLY the docs in cells below k
    val retained = rows.map(_.getLong(idx("doc_id"))).toSet
    docs.foreach { case (id, lang, source) =>
      assert(retained(id) === (trueCells((lang, source)) >= k),
        s"doc $id mis-classified for cell ($lang, $source)")
    }
    // the threshold discriminates on this corpus: both verdicts occur
    assert(retained.nonEmpty && retained.size < docs.length,
      "k-anonymity gate is degenerate on the fixture")
  }

  test("noisedRelease: scalar noise replay, geometric magnitudes, true count absent") {
    val k = 5; val cap = 16L
    val rows = TextAnalysis.noisedRelease(spark, sf0001, k).collect()
    assert(rows.nonEmpty)
    // the TRUE count must not be a column — the noisy value is the release
    assert(!rows.head.schema.fieldNames.contains("n"))
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("lang", "source").collect().map(r => (r.getString(0), r.getString(1)))
    val trueCells = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.length === trueCells.size, "one release row per cell")
    var perturbed = 0
    rows.foreach { r =>
      val (lang, source) = (r.getString(0), r.getString(1))
      // scalar replay of the seeded mechanism from the shared hash
      val h = TextAnalysis.md5Low64(s"$lang:$source") & Long.MaxValue
      val g = h >> 1
      val sign = if ((h & 1L) == 1L) 1L else -1L
      val mag = math.min(java.lang.Long.numberOfTrailingZeros(g).toLong, cap)
      val expected = math.max(trueCells((lang, source)) + sign * mag, 0L)
      assert(r.getLong(2) === expected, s"cell ($lang, $source)")
      assert(r.getInt(3) === (if (expected >= k) 1 else 0))
      if (mag != 0L) perturbed += 1
    }
    // the mechanism actually perturbs: Geometric(1/2) magnitudes are
    // nonzero for ~half the cells (P(mag=0) = 1/2)
    assert(perturbed > 0, "noise degenerate: every cell drew magnitude 0")
  }

  test("vocabGrowth: growing and saturating vocabularies both measured exactly") {
    import spark.implicits._
    // OPEN vocabulary: doc i contributes a fresh word ("w<i>") plus a
    // shared one — the curve must keep growing, one new type per slice
    // beyond the shared word.
    // letter-only fresh words — the tokenizer splits on non-letters, so a
    // digit suffix would collapse every "w<i>" into the same type "w"
    val open = (0L until 40L).map(i =>
      (i, s"shared w${('a' + i / 26).toChar}${('a' + i % 26).toChar}")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.vocabGrowthFrom(open, slices = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 4 slices × 10 docs; slice 0 introduces 'shared' + 10 fresh = 11
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(got(0)._4 === 11L)
    assert(got.drop(1).forall(_._4 === 10L), s"open vocab must add 10 types/slice: ${got.toSeq}")
    assert(got(3)._5 === 41L && got(3)._3 === 80L && got(3)._2 === 40L)
    // CLOSED vocabulary: every doc reuses the same two words — new_types
    // collapses to slice 0 and the cumulative curve is flat.
    val closed = (0L until 40L).map(i => (i, "alpha beta")).toDF("doc_id", "text")
    val flat = graft.operators.TextAnalysis.vocabGrowthFrom(closed, slices = 4)
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(flat.head === ((2L, 2L)))
    assert(flat.drop(1).forall(_._1 == 0L) && flat.forall(_._2 == 2L))
  }

  test("sourceDivergence: known JS vectors — identical 0, disjoint 1, skewed mid") {
    import spark.implicits._
    val docs = Seq(
      ("same_a", "alpha beta alpha beta"),
      ("same_b", "beta alpha beta alpha"),      // identical distribution → JS 0
      ("other", "gamma delta gamma delta"),     // disjoint vocab vs same_* → JS 1
      ("skew", "alpha alpha alpha beta")        // same support as same_*, skewed
    ).toDF("source", "text")
    val got = graft.operators.TextAnalysis.sourceDivergenceFrom(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("same_a", "same_b")) === ((2L, 0.0)))
    assert(got(("other", "same_a")) === ((0L, 1.0)) || got(("same_a", "other")) === ((0L, 1.0)))
    // hand-computed: p=(.5,.5), q=(.75,.25) → JS = 1 - 0.5*(H-terms)…
    // = 0.5*[.5·log2(2·.5/1.25) + .5·log2(2·.5/.75) + .75·log2(2·.75/1.25) + .25·log2(2·.25/.75)]
    val expSkew = 0.5 * (0.5 * math.log(1.0 / 1.25) / math.log(2) +
      0.5 * math.log(1.0 / 0.75) / math.log(2) +
      0.75 * math.log(1.5 / 1.25) / math.log(2) +
      0.25 * math.log(0.5 / 0.75) / math.log(2))
    val gotSkew = got.find { case ((a, b), _) => Set(a, b) == Set("same_a", "skew") }.get._2._2
    assert(math.abs(gotSkew - expSkew) < 1e-4, s"$gotSkew vs $expSkew")
    // bounds hold everywhere
    got.values.foreach { case (_, js) => assert(js >= 0.0 && js <= 1.0) }
  }

  test("userLifecycle: verdicts match hand-placed users around the horizon") {
    import spark.implicits._
    val day = 86400000000L
    // corpus max at day 30; horizon = 7 days → boundary at day 23
    val rows = Seq(
      (1L, Seq(0L, 10L, 30L)),        // spans everything → active
      (2L, Seq(29L, 30L)),            // first event day 29 > 23 → new
      (3L, Seq(0L, 5L)),              // last event day 5 < 23 → churned
      (4L, Seq(0L, 23L)),             // last exactly AT the boundary → active (strict <)
      (5L, Seq(23L, 23L, 23L))        // first AT boundary → not new (strict >), active
    ).flatMap { case (u, ds) => ds.map(d => (u, d * day)) }
    val events = rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        lit(0L).as("event_id"), lit("view").as("event_type"), lit(0.0).as("value"),
        lit("{}").as("props"))
    // route through the operator core by staging a temp sfDir-like parquet
    val dir = java.nio.file.Files.createTempDirectory("lifecycle_spec").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Analytics.userLifecycle(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(got(1L) === ((0L, 30L * day, 3L, 3L, "active")))
    assert(got(2L)._5 === "new")
    assert(got(3L)._5 === "churned")
    assert(got(4L)._5 === "active", "a user whose last event sits exactly at the boundary is not churned")
    assert(got(5L)._5 === "active", "a user whose first event sits exactly at the boundary is not new")
    assert(got(5L)._4 === 1L, "three same-day events are one active day")
  }

  test("revenueRankDelta: ranks dense per quarter, deltas telescope, firsts pinned") {
    val rows = graft.operators.Analytics.revenueRankDelta(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // per quarter: ranks are exactly 1..n and revenue is non-increasing
    rows.groupBy(_._1).foreach { case (q, qs) =>
      val byRank = qs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1L to qs.length.toLong).toSeq, s"ranks not dense in q$q")
      assert(byRank.map(_._3).toSeq === byRank.map(_._3).sortBy(-_).toSeq,
        s"revenue not monotone in rank in q$q")
    }
    // per nation: deltas telescope (sum of deltas = first rank − last rank)
    // and is_first marks exactly the earliest quarter
    rows.groupBy(_._2).foreach { case (n, ns) =>
      val byQ = ns.sortBy(_._1)
      assert(byQ.map(_._5).sum === byQ.head._4 - byQ.last._4, s"$n deltas don't telescope")
      assert(byQ.head._6 === 1L && byQ.tail.forall(_._6 == 0L), s"$n is_first misplaced")
    }
    // the leaderboard actually moves on the fixture
    assert(rows.exists(_._5 != 0L), "no rank movement — degenerate")
  }

  test("basketAffinity: fixture replay matches a scalar Apriori pass; ranking total") {
    import spark.implicits._
    val baskets = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = baskets.groupBy(_._1).map { case (_, xs) => xs.map(_._2).distinct.sorted }
    val itemCnt = baskets.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val nOrders = byOrder.size.toLong
    val sup = scala.collection.mutable.Map[(Long, Long), Long]()
    byOrder.foreach { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        sup((ps(i), ps(j))) = sup.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val expected = sup.toSeq.collect { case ((a, b), s) if s >= 3L =>
      val lift = math.round(s.toDouble * nOrders / (itemCnt(a).toDouble * itemCnt(b)) * 10000.0) / 10000.0
      (a, b, s, itemCnt(a), itemCnt(b), lift)
    }.sortBy { case (a, b, _, _, _, l) => (-l, a, b) }.take(50)
    val got = graft.operators.Analytics.basketAffinity(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === expected)
    assert(got.nonEmpty, "no pair clears the support floor — degenerate fixture")
    // lift is computed against chance: the top pair must actually beat it
    assert(got.head._6 > 1.0)
  }

  test("langConfusion: cells reconcile with langId row-by-row, shares sum to 1") {
    import spark.implicits._
    val preds = graft.operators.TextAnalysis.langId(spark, sf0001)
      .select("doc_id", "pred").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val actual = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = actual.toSeq.map { case (id, a) => (a, preds(id)) }
      .groupBy(identity).map { case ((a, p), xs) => (a, p, xs.size.toLong) }.toSet
    val got = graft.operators.TextAnalysis.langConfusion(spark, sf0001).collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet === expected)
    // per-actual recall shares sum to 1 (4-dp rounding tolerance)
    got.groupBy(_.getString(0)).foreach { case (a, rows) =>
      val sum = rows.map(_.getDouble(3)).sum
      assert(math.abs(sum - 1.0) < 2e-3, s"$a shares sum to $sum")
    }
    // the instrument must measure something non-trivial: >1 actual lang,
    // and at least one off-diagonal cell OR a perfect diagonal — either
    // way the matrix shape is reported, not assumed
    assert(got.map(_.getString(0)).distinct.length > 1)
  }

  test("docEntropy: hand-computed H on known distributions, guards and bounds hold") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),   // uniform over 4 → H = 2 bits, evenness 1
      (1L, "alpha alpha alpha alpha"),  // single type → H = 0, evenness guard 1
      (2L, "alpha alpha beta beta alpha alpha beta beta"), // uniform over 2 → H = 1
      (3L, "alpha alpha alpha beta")    // skewed: H = 2 − (3·log2 3)/4
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.docEntropyFrom(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0L) === ((4L, 4L, 2.0, 1.0)))
    assert(got(1L) === ((4L, 1L, 0.0, 1.0)))
    assert(got(2L) === ((8L, 2L, 1.0, 1.0)))
    val h3 = 2.0 - 3.0 * (math.log(3.0) / math.log(2.0)) / 4.0
    assert(math.abs(got(3L)._3 - math.round(h3 * 10000.0) / 10000.0) < 1e-9)
    assert(got(3L)._4 === got(3L)._3) // evenness = H / log2(2) = H
    // bounds: 0 ≤ H ≤ log2(types), 0 ≤ evenness ≤ 1
    got.values.foreach { case (_, types, h, e) =>
      assert(h >= 0.0 && h <= math.log(types.toDouble) / math.log(2.0) + 1e-9)
      assert(e >= 0.0 && e <= 1.0)
    }
  }

  test("zipfSlope: exact power law fits -1, flat profile 0, guards hold") {
    import spark.implicits._
    // exact Zipf: word r appears floor(1200/r) times → slope ≈ −1, high R²
    val letters = "abcdefghijklmnopqrstuvwxyz"
    def wordFor(r: Int) = s"w${letters(r / 26)}${letters(r % 26)}"
    val zipf = (1 to 20).flatMap(r => Seq.fill(1200 / r)(wordFor(r)))
    val flat = (1 to 15).flatMap(r => Seq.fill(10)(wordFor(r)))
    val docs = Seq(
      ("zipf", zipf.mkString(" ")),
      ("flat", flat.mkString(" ")),
      ("single", "word word word")          // one type → no rank spread
    ).toDF("source", "text")
    val got = graft.operators.TextAnalysis.zipfSlopeFrom(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (nZ, sZ, r2Z) = got("zipf")
    assert(nZ === 20L)
    assert(math.abs(sZ + 1.0) < 0.05, s"Zipf slope $sZ should be ≈ −1")
    assert(r2Z > 0.99, s"power-law fit should be near-perfect, got $r2Z")
    // flat: y constant → slope exactly 0 and R² guarded to 0
    assert(got("flat") === ((15L, 0.0, 0.0)))
    // single type: no rank spread → both guarded to 0
    assert(got("single") === ((1L, 0.0, 0.0)))
  }

  test("hitsScores equals the scalar mutual recursion; scores differentiate") {
    import spark.implicits._
    val n = 200L
    val ids = (0L until n)
    val edges = ids.flatMap { s =>
      (Seq((s * 7 + 3) % n, (s * 13 + 5) % n) ++
        (if (s % 3 == 0) Seq((s * 31 + 11) % n) else Seq()))
        .filter(_ != s).map(d => (s, d))
    }.distinct
    val seed = 1L << 20
    var hub = ids.map(_ -> seed).toMap
    var auth = ids.map(_ -> seed).toMap
    for (_ <- 1 to 2) {
      auth = ids.map(v => v -> edges.filter(_._2 == v).map(e => hub(e._1)).sum).toMap
      hub = ids.map(u => u -> edges.filter(_._1 == u).map(e => auth(e._2)).sum).toMap
    }
    val expected = ids.map(v => (v, auth(v), hub(v))).toSeq
    val got = graft.operators.Ranking.hitsScoresFrom(ids.toDF("doc_id"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected)
    // the graph must differentiate pages on both axes
    assert(got.map(_._2).toSet.size > 10 && got.map(_._3).toSet.size > 10)
    // partitioning-invariant (exact integer sums)
    val again = graft.operators.Ranking.hitsScoresFrom(ids.toDF("doc_id").repartition(7), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === got.toSeq)
  }

  test("paretoFrontier: two-level skyline equals brute-force dominance; ties kept") {
    import spark.implicits._
    // layout: strict dominance, same-quality length ties, duplicate points,
    // and a low-quality-but-shortest doc that must survive
    val docs = Seq(
      (0L, 100L, 0.9), (1L, 100L, 0.9),   // duplicate points — both kept
      (2L, 150L, 0.9),                    // same quality, longer → dominated by 0/1
      (3L, 100L, 0.8),                    // same words, lower quality → dominated
      (4L, 50L, 0.7),                     // shorter than all better docs → frontier
      (5L, 50L, 0.6),                     // same words as 4, lower q → dominated
      (6L, 20L, 0.1),                     // shortest overall → frontier
      (7L, 200L, 1.0)                     // best quality → frontier
    ).toDF("doc_id", "n_words", "quality")
    val pts = Seq((0L, 100L, 0.9), (1L, 100L, 0.9), (2L, 150L, 0.9), (3L, 100L, 0.8),
      (4L, 50L, 0.7), (5L, 50L, 0.6), (6L, 20L, 0.1), (7L, 200L, 1.0))
    val expected = pts.filter { case (_, w, q) =>
      !pts.exists { case (_, w2, q2) => q2 >= q && w2 <= w && (q2 > q || w2 < w) }
    }.sortBy { case (id, w, q) => (-q, w, id) }
    val got = graft.operators.TextAnalysis.paretoFrontierFrom(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === expected)
    assert(got.map(_._1).toSet === Set(0L, 1L, 4L, 6L, 7L))
    val again = graft.operators.TextAnalysis.paretoFrontierFrom(docs.repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq === got.toSeq)
  }

  test("anomalyHours: integer-exact median/MAD verdict, threshold strict") {
    import spark.implicits._
    // 9 hours with counts 10,10,10,12,12,14,14,20,41 → median 12,
    // D = |2c−24| = 4,4,4,0,0,4,4,16,58 → median(D) = 4 → T2 = 8.
    // flag iff 2D > 24: hour with c=20 (D=16 → 32) and c=41 (D=58 → 116).
    val counts = Seq(10, 10, 10, 12, 12, 14, 14, 20, 41)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => (h.toLong * 3600000000L + i * 1000L))
    }
    val events = rows.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val got = graft.operators.Analytics.anomalyHoursFrom(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((7L, 20L, 24L, 16L, 8L), (8L, 41L, 24L, 58L, 8L)))
    // strictness: a deviation exactly AT the threshold is not an anomaly —
    // 2·D = 3·T2 requires D = 12, i.e. c = 6 or 18 with this median...
    val rows2 = (counts :+ 18).zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => (h.toLong * 3600000000L + i * 1000L))
    }
    val events2 = rows2.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    // counts now {10,10,10,12,12,14,14,20,41,18} → median 13 → M2=26,
    // D sorted 2,2,2,2,6,6,6,10,14,56 → median(D)=6 → T2=12; threshold
    // 2D > 36 ⟺ D > 18: only c=41 (D=56, hour 8). c=20 (D=14) inside.
    val got2 = graft.operators.Analytics.anomalyHoursFrom(events2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got2.toSeq === Seq((8L, 41L)))
  }

  test("readability: hand-computed Flesch on punctuated text; floors and filters hold") {
    import spark.implicits._
    val docs = Seq(
      (0L, "Hello world. It works! Right?"), // 3 sentences, 5 words, 6 vowel groups
      (1L, "alpha beta"),                    // unpunctuated → floor 1 sentence, 2 words, 4 groups
      (2L, "rhythm"),                        // y counts as vowel → 1 syllable
      (3L, "!!! ???"),                       // no words → dropped
      (4L, "Word.")                          // trailing separator → still 1 sentence
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.readabilityFrom(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(!got.contains(3L), "wordless doc must be dropped")
    assert(got(0L)._1 === 3L && got(0L)._2 === 5L && got(0L)._3 === 6L)
    val exp0 = math.round((206.835 - 1.015 * (5.0 / 3.0) - 84.6 * (6.0 / 5.0)) * 10000.0) / 10000.0
    assert(math.abs(got(0L)._4 - exp0) < 1e-9, s"${got(0L)._4} vs $exp0")
    assert(got(1L) === ((1L, 2L, 4L,
      math.round((206.835 - 1.015 * 2.0 - 84.6 * 2.0) * 10000.0) / 10000.0)))
    assert(got(2L)._3 === 1L, "y must count as a vowel group")
    assert(got(4L)._1 === 1L)
  }

  test("cocitation equals the scalar pair replay; top order deterministic") {
    import spark.implicits._
    val n = 300L
    val ids = (0L until n)
    // scalar ground truth over the affine edge derivation
    val edges = ids.flatMap { s =>
      (Seq((s * 7 + 3) % n, (s * 13 + 5) % n) ++
        (if (s % 3 == 0) Seq((s * 31 + 11) % n) else Seq()))
        .filter(_ != s).map(d => (s, d))
    }.distinct
    val inDeg = edges.groupBy(_._2).map { case (d, es) => d -> es.size.toLong }
    val byCiter = edges.groupBy(_._1).map { case (_, es) => es.map(_._2).sorted }
    val cocite = scala.collection.mutable.Map[(Long, Long), Long]()
    byCiter.foreach { ds =>
      for (i <- ds.indices; j <- (i + 1) until ds.size)
        cocite((ds(i), ds(j))) = cocite.getOrElse((ds(i), ds(j)), 0L) + 1L
    }
    val expectedTop = cocite.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(50)
      .map { case ((a, b), c) =>
        val (ia, ib) = (inDeg(a), inDeg(b))
        (a, b, c, ia, ib, math.round(c.toDouble / (ia + ib - c) * 10000.0) / 10000.0)
      }
    val got = graft.operators.Ranking.cocitationFrom(ids.toDF("doc_id"), 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === expectedTop.toSeq)
    // non-degenerate: the graph must produce genuinely co-cited pairs
    assert(got.head._3 >= 2L, s"no pair co-cited twice: ${got.head}")
    // partitioning-invariant (the orderBy+limit tiebreak is total)
    val again = graft.operators.Ranking.cocitationFrom(ids.toDF("doc_id").repartition(7), 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(again.toSeq === got.toSeq)
  }

  test("trianglesPerNode equals brute-force enumeration over the dense-class graph") {
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    // scalar reference: naive triangle enumeration over the same edges
    val und = scala.collection.mutable.Set[(Long, Long)]()
    def add(s: Long, d: Long): Unit =
      if (s != d) und += ((math.min(s, d), math.max(s, d)))
    for (i <- 0L until n) {
      add(i, (i * 7 + 3) % n); add(i, (i * 13 + 5) % n)
      if (i % 3 == 0) add(i, (i * 31 + 11) % n)
      if (i % 10 == 7) (1 to 5).foreach(j => add(i, (i + 10L * j) % n))
    }
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    und.foreach { case (a, b) => adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    val expected = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    und.foreach { case (a, b) =>
      (adj(a) intersect adj(b)).foreach { c =>
        // attribute once per triangle: only when (a, b) is its lowest edge
        if (a < c && b < c) Seq(a, b, c).foreach(v => expected(v) += 1)
      }
    }
    val got = graft.operators.Ranking.trianglesPerNode(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected.toMap)
    assert(got.nonEmpty, "planted ring must contribute triangles")
    // the degree-ordered orientation counted each triangle exactly once:
    // total participation = 3 × triangle count
    assert(got.values.sum % 3 === 0)
    // density, not degree: the planted ring class dominates participation
    val ringMass = got.filter(_._1 % 10 == 7).values.sum
    assert(ringMass * 2 > got.values.sum,
      "ring class should carry most triangle mass")
    // plan: the wedge and closing joins are equi-joins (rank inequality is
    // a residual predicate, never a nested-loop driver)
    val plan = graft.operators.Ranking.trianglesPerNode(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle joins must stay equi-keyed:\n$plan")
  }

  test("kcore equals a scalar peel replay; planted ring is the exact core") {
    import spark.implicits._
    // scalar reference: the same parallel peel over the same derived edges
    def scalarKcore(n: Int, k: Int, rounds: Int): Map[Long, (Long, Long, Long)] = {
      val und = scala.collection.mutable.Set[(Long, Long)]()
      for (i <- 0L until n) {
        val ds = Seq((i * 7 + 3) % n, (i * 13 + 5) % n) ++
          (if (i % 3 == 0) Seq((i * 31 + 11) % n) else Seq()) ++
          (if (i % 10 == 7) (1 to 5).map(j => (i + 10L * j) % n) else Seq())
        ds.filter(_ != i).foreach { d => und += ((i, d)); und += ((d, i)) }
      }
      var alive = (0L until n).toSet
      val removedAt = scala.collection.mutable.Map[Long, Long]()
      for (r <- 1 to rounds) {
        val deg = und.toSeq.filter(e => alive(e._1) && alive(e._2))
          .groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val rem = alive.filter(v => deg.getOrElse(v, 0L) < k)
        rem.foreach(v => removedAt(v) = r.toLong)
        alive --= rem
      }
      val coreDeg = und.toSeq.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).view.mapValues(_.size.toLong).toMap
      (0L until n).map { v =>
        v -> ((if (alive(v)) 1L else 0L, removedAt.getOrElse(v, 0L),
               if (alive(v)) coreDeg.getOrElse(v, 0L) else 0L))
      }.toMap
    }
    val n = 200
    val got = graft.operators.Ranking.kcoreFrom((0L until n).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === scalarKcore(n, 5, 6))
    // fixture: the peel converges (nothing removed in the declared last
    // round), exactly the planted ring survives, every survivor keeps ≥ k
    val real = graft.operators.Ranking.kcore(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(!real.exists(_._3 == 6L), "round-6 removal means the peel did not converge")
    assert(real.filter(_._2 == 1L).map(_._1).toSet ===
      real.map(_._1).filter(_ % 10 == 7).toSet, "core must be exactly the planted ring")
    assert(real.filter(_._2 == 1L).forall(_._4 >= 5L), "a core member below k survived")
    assert(real.count(_._2 == 0L) > 0 && real.map(_._3).distinct.length > 2,
      "peel must actually cascade over multiple rounds")
  }

  test("seedRank equals a scalar fixed-point replay; mass flows out from seeds only") {
    import spark.implicits._
    import graft.operators.Ranking
    def scalarPpr(n: Long, iters: Int): Map[Long, Long] = {
      val edges = (0L until n).flatMap { i =>
        (Seq((i * 7 + 3) % n, (i * 13 + 5) % n) ++
          (if (i % 3 == 0) Seq((i * 31 + 11) % n) else Seq()))
          .filter(_ != i).distinct.map(d => (i, d))
      }.distinct
      val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
      val nSeeds = (0L until n).count(_ % Ranking.SeedHopsSeedMod == 0).toLong
      val sm = 1099511627776L / nSeeds
      def rst(v: Long) = if (v % Ranking.SeedHopsSeedMod == 0) sm else 0L
      var r = (0L until n).map(v => v -> rst(v)).toMap
      for (_ <- 1 to iters) {
        val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for ((s, d) <- edges) inflow(d) += r(s) / odeg(s)
        r = (0L until n).map(v => v -> (15L * rst(v) + 85L * inflow(v)) / 100L).toMap
      }
      r
    }
    val n = 200L
    val docs = (0L until n).toDF("doc_id")
    val got = Ranking.seedRankFrom(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exp = scalarPpr(n, 3)
    assert(got.view.mapValues(_._2).toMap === exp, "PPR diverged from the scalar replay")
    // partitioning invariance (integer sums are order-independent)
    assert(Ranking.seedRankFrom(docs.repartition(7)).collect().toSeq ===
      Ranking.seedRankFrom(docs).collect().toSeq)
    // trust decays from the seeds: seeds carry the restart floor, and a
    // positive-rank non-seed exists (propagation happened) while total
    // non-seed mass stays below the seeds' (damping contracts)
    val seeds = got.filter(_._2._1 == 1L)
    val nonSeeds = got.filter(_._2._1 == 0L)
    assert(seeds.nonEmpty && seeds.values.forall(_._2 >= 15L * (1099511627776L / seeds.size) / 100L))
    assert(nonSeeds.values.exists(_._2 > 0L), "no mass propagated beyond the seeds")
    // mass is bounded by the injected teleport total (damping + dangling
    // + integer truncation only LOSE mass, never create it)
    assert(got.values.map(_._2).sum <= 1099511627776L,
      "total PPR mass exceeded the restart injection — mass created from nothing")
    // a vertex no ≤3-hop walk from any seed can touch must hold rank 0
    val adj = (0L until n).map { i =>
      i -> (Seq((i * 7 + 3) % n, (i * 13 + 5) % n) ++
        (if (i % 3 == 0) Seq((i * 31 + 11) % n) else Seq())).filter(_ != i).distinct
    }.toMap
    var reach = (0L until n).filter(_ % Ranking.SeedHopsSeedMod == 0).toSet
    for (_ <- 1 to 3) reach = reach ++ reach.flatMap(adj)
    got.foreach { case (v, (_, r)) =>
      if (!reach.contains(v)) assert(r === 0L, s"unreachable vertex $v holds mass $r")
    }
  }

  test("constraintAudit: every constraint catches exactly the planted corrupted shard") {
    val nCorrupt = graft.sources.Tables.orders(spark, sf0001)
      .filter(col("o_orderkey") % 1000 === 0).count()
    assert(nCorrupt > 0, "fixture degenerate: no orderkey divisible by 1000 — nothing planted")
    val nOrders = graft.sources.Tables.orders(spark, sf0001).count()
    val out = Analytics.constraintAudit(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet === Set("complete_orderdate", "domain_orderstatus",
      "range_totalprice_positive", "ri_custkey_in_customer", "unique_orderkey"))
    out.foreach { case (c, (viol, nRows, status)) =>
      assert(nRows === nOrders + nCorrupt, s"$c: audited batch size wrong")
      assert(viol === nCorrupt, s"$c: expected exactly the planted shard, got $viol")
      assert(status === "fail", s"$c: nonzero violations must read fail")
    }
  }

  test("seed_costs equals a scalar hop-indexed DP replay; cheapest diverges from shortest") {
    import spark.implicits._
    import graft.operators.Ranking
    // independent reference: the textbook hop-indexed DP d[h][v] = min
    // cost over walks of <= h hops (a structurally DIFFERENT shape from
    // the engine's improved-frontier relaxation)
    def scalarCosts(n: Long, maxHops: Int): Map[Long, Long] = {
      val INF = Long.MaxValue
      val adj = (0L until n).map { i =>
        val ds = (Seq((i * 7 + 3) % n, (i * 13 + 5) % n) ++
          (if (i % 3 == 0) Seq((i * 31 + 11) % n) else Seq()))
          .filter(_ != i).distinct
        i -> ds.map(d => d -> ((i + d) % 7 + 1))
      }.toMap
      var d = (0L until n).map(v =>
        v -> (if (v % Ranking.SeedHopsSeedMod == 0) 0L else INF)).toMap
      for (_ <- 1 to maxHops) {
        val next = scala.collection.mutable.Map(d.toSeq: _*)
        for ((u, vs) <- adj; (v, w) <- vs)
          if (d(u) != INF && d(u) + w < next(v)) next(v) = d(u) + w
        d = next.toMap
      }
      d.map { case (v, c) => v -> (if (c == INF) -1L else c) }
    }
    val n = 200L
    val docs = (0L until n).toDF("doc_id")
    for (h <- Seq(0, 1, Ranking.SeedHopsMaxHops)) {
      val got = Ranking.seedCostsFrom(docs, h)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === scalarCosts(n, h), s"horizon $h diverged from the DP replay")
    }
    // partitioning invariance: relaxation order must not change any label
    val base = Ranking.seedCostsFrom(docs).collect().toSeq
    assert(Ranking.seedCostsFrom(docs.repartition(7)).collect().toSeq === base)
    // weights must MATTER: some vertex's cheapest bounded walk is cheaper
    // than every min-hop walk would allow if it had to stop at the BFS
    // distance — i.e. cost improves strictly between two horizons even
    // though the vertex was already reachable (a longer-but-cheaper path)
    val hShort = Ranking.seedCostsFrom(docs, Ranking.SeedHopsMaxHops - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hFull = Ranking.seedCostsFrom(docs, Ranking.SeedHopsMaxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until n).exists(v =>
      hShort(v) >= 0L && hFull(v) >= 0L && hFull(v) < hShort(v)),
      "fixture degenerate: no vertex has a longer-but-cheaper path — weights are not exercised")
  }

  test("seed_hops equals a scalar shortest-path replay; horizon, invariance, plan") {
    import spark.implicits._
    import graft.operators.Ranking
    // independent reference: full Bellman-Ford relaxation to the true
    // shortest distances (a structurally DIFFERENT algorithm from the
    // engine's frontier BFS), then the horizon clamp applied after the
    // fact — distances beyond maxHops read -1 by definition
    def scalarHops(n: Long, maxHops: Int): Map[Long, Long] = {
      val INF = Long.MaxValue
      val adj = (0L until n).map { i =>
        val ds = Seq((i * 7 + 3) % n, (i * 13 + 5) % n) ++
          (if (i % 3 == 0) Seq((i * 31 + 11) % n) else Seq())
        i -> ds.filter(_ != i).distinct
      }.toMap
      val d = scala.collection.mutable.Map((0L until n).map(v =>
        v -> (if (v % Ranking.SeedHopsSeedMod == 0) 0L else INF)): _*)
      var changed = true
      while (changed) {
        changed = false
        for ((u, vs) <- adj; v <- vs)
          if (d(u) != INF && d(u) + 1 < d(v)) { d(v) = d(u) + 1; changed = true }
      }
      (0L until n).map(v => v -> (if (d(v) > maxHops) -1L else d(v))).toMap
    }
    val n = 200L
    val docs = (0L until n).toDF("doc_id")
    for (h <- Seq(0, 1, Ranking.SeedHopsMaxHops)) {
      val got = Ranking.seedHopsFrom(docs, h)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === scalarHops(n, h), s"horizon $h diverged from the replay")
    }
    // partitioning invariance: frontier rounds must not depend on layout
    val base = Ranking.seedHopsFrom(docs).collect().toSeq
    assert(Ranking.seedHopsFrom(docs.repartition(7)).collect().toSeq === base)
    // seeds label 0, everything else is a positive hop or -1
    val real = Ranking.seedHops(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(real.filter(_._2 == 0L).map(_._1).toSet ===
      real.map(_._1).filter(_ % Ranking.SeedHopsSeedMod == 0).toSet,
      "hops = 0 must be exactly the seed class")
    assert(real.forall { case (_, h) => h >= -1L && h <= Ranking.SeedHopsMaxHops })
    assert(real.exists(_._2 > 0L), "fixture must actually propagate")
    // plan: every round is a vertex-keyed equi-join, never a nested loop
    val plan = Ranking.seedHops(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"seed_hops joins must stay equi-keyed:\n$plan")
  }

  test("link_cycles equals a scalar Tarjan replay; rings recovered, bulk singleton") {
    import spark.implicits._
    import graft.operators.Ranking
    // independent reference: textbook iterative Tarjan (a structurally
    // DIFFERENT algorithm from the engine's FW-BW min-label propagation,
    // with no acyclic-bulk/closed-ring assumption), over an independently
    // re-derived edge set. SCC label = min member id.
    def scalarTarjan(n: Long): Map[Long, (Long, Long)] = {
      val ringSz = Ranking.SccRingSize
      val q = if (n >= 8) (n - 8) / 10 + 1 else 0L
      val adj = scala.collection.mutable.Map[Long, List[Long]]()
        .withDefaultValue(Nil)
      for (i <- 0L until n) {
        val bulk = (Seq((i * 7 + 3) % n, (i * 13 + 5) % n) ++
            (if (i % 3 == 0) Seq((i * 31 + 11) % n) else Seq()))
          .filter(d => d < i && i % 10 != 7 && d % 10 != 7)
        val ring = if (i % 10 == 7) {
          val qi = (i - 7) / 10; val g = qi / ringSz; val p = qi % ringSz
          val gsz = math.min(ringSz, q - g * ringSz)
          val d = (g * ringSz + (p + 1) % gsz) * 10 + 7
          if (d != i) Seq(d) else Seq()
        } else Seq()
        adj(i) = (bulk ++ ring).distinct.toList
      }
      // iterative Tarjan (explicit stack — no recursion depth limits)
      val index = scala.collection.mutable.Map[Long, Int]()
      val low = scala.collection.mutable.Map[Long, Int]()
      val onStack = scala.collection.mutable.Set[Long]()
      val stack = scala.collection.mutable.Stack[Long]()
      var counter = 0
      val sccOf = scala.collection.mutable.Map[Long, Long]()
      for (root <- 0L until n if !index.contains(root)) {
        val work = scala.collection.mutable.Stack[(Long, List[Long])]((root, adj(root)))
        index(root) = counter; low(root) = counter; counter += 1
        stack.push(root); onStack += root
        while (work.nonEmpty) {
          val (v, rest) = work.pop()
          rest match {
            case w :: tail =>
              work.push((v, tail))
              if (!index.contains(w)) {
                index(w) = counter; low(w) = counter; counter += 1
                stack.push(w); onStack += w
                work.push((w, adj(w)))
              } else if (onStack(w)) low(v) = math.min(low(v), index(w))
            case Nil =>
              if (work.nonEmpty) {
                val (p, _) = work.top
                low(p) = math.min(low(p), low(v))
              }
              if (low(v) == index(v)) {
                var members = List.empty[Long]
                var w = -1L
                while ({ w = stack.pop(); onStack -= w; members ::= w; w != v }) ()
                val m = members.min
                members.foreach(x => sccOf(x) = m)
              }
          }
        }
      }
      val sizes = sccOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
      (0L until n).map(v => v -> ((sccOf(v), sizes(sccOf(v))))).toMap
    }
    val n = 200L
    val docs = (0L until n).toDF("doc_id")
    val got = Ranking.linkCyclesFrom(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ref = scalarTarjan(n)
    assert(got === ref, "FW-BW labels diverged from the Tarjan replay")
    // partitioning invariance: hash-min rounds must not depend on layout
    assert(Ranking.linkCyclesFrom(docs.repartition(7))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap === got)
    // fixture: every planted ring is exactly recovered (multi-member SCCs
    // are precisely the class-7 ring groups) and the acyclic bulk is all
    // singletons
    val real = Ranking.linkCycles(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val multi = real.filter(_._3 >= 2L)
    assert(multi.nonEmpty, "fixture must contain planted rings")
    assert(multi.forall(_._1 % 10 == 7), "a bulk vertex joined a ring SCC")
    assert(real.filter(_._1 % 10 == 7).forall(_._3 >= 2L),
      "a planted ring member was left singleton")
    assert(real.filter(r => r._1 % 10 != 7).forall(r => r._2 == r._1 && r._3 == 1L),
      "the acyclic bulk must be all singletons labeled by themselves")
    // each ring's label is its own min member (group arithmetic)
    multi.groupBy(_._2).foreach { case (label, ms) =>
      assert(ms.map(_._1).min == label, s"ring $label not labeled by its min member")
    }
    // plan: every round is a vertex-keyed equi-join, never a nested loop
    val plan = Ranking.linkCycles(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"link_cycles joins must stay equi-keyed:\n$plan")
  }

  test("gapFill: absent buckets materialize as zero rows, grid is dense") {
    import spark.implicits._
    val hr = 3600000000L
    // type A fires in hours 0 and 2 (hour 1 is a gap); type B only hour 1
    val rows = Seq(("A", 0L, 1.25), ("A", 2L, 2.00), ("A", 2L, 0.50), ("B", 1L, 3.00))
    val events = rows.toDF("event_type", "h", "value")
      .select(col("event_type"), timestamp_micros(col("h") * hr + 60L).as("ts"),
        col("value"), lit(0L).as("event_id"), lit(0L).as("user_id"), lit("{}").as("props"))
    val dir = java.nio.file.Files.createTempDirectory("gapfill_spec").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.gapFill(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size === 6, "2 types × hours 0..2")
    assert(got(("A", 0L)) === ((1L, 125L, 0L)))
    assert(got(("A", 1L)) === ((0L, 0L, 1L)), "A's silent hour must be an explicit zero row")
    assert(got(("A", 2L)) === ((2L, 250L, 0L)))
    assert(got(("B", 0L)) === ((0L, 0L, 1L)))
    assert(got(("B", 1L)) === ((1L, 300L, 0L)))
    assert(got(("B", 2L)) === ((0L, 0L, 1L)))
    // fixture data: grid complete, masses conserved, is_gap ⇔ n_events = 0
    val real = Analytics.gapFill(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val ev = graft.sources.Tables.events(spark, sf0001)
    val types = ev.select("event_type").distinct().count()
    val span = real.map(_._2).max - real.map(_._2).min + 1
    assert(real.length === types * span, "dense grid at fixture scale")
    assert(real.map(_._3).sum === ev.count(), "event mass conserved")
    assert(real.forall(r => (r._5 == 1L) == (r._3 == 0L)), "is_gap ⇔ empty bucket")
    assert(real.exists(_._5 == 1L), "fixture must actually contain gaps")
  }

  test("metricCorr: exact ±1 on constructed linear metrics, guards on zero variance") {
    import spark.implicits._
    // lin: tokens "ab" repeated k times → chars = 3k−1, tokens = k (exactly
    // linear → corr +1); types constant 1 → tokens↔types guarded to 0
    val lin = Seq(5, 9, 14, 20).map(k => ("lin", Seq.fill(k)("ab").mkString(" ")))
    // anti: (tokens, types) = (3,3), (4,2), (5,1) — exactly linear, negative
    val anti = Seq(("anti", "aa bb cc"), ("anti", "aa aa bb bb"), ("anti", "aa aa aa aa aa"))
    // lone: single doc → no variance at all → both guarded to 0
    val lone = Seq(("lone", "xx yy"))
    val got = TextAnalysis.metricCorrFrom((lin ++ anti ++ lone).toDF("source", "text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("lin") === ((4L, 1.0, 0.0)))
    assert(got("anti")._3 === -1.0, "anti-correlated tokens↔types must hit exactly −1")
    assert(got("lone") === ((1L, 0.0, 0.0)))
    // fixture data: bounds hold and the two correlations are not degenerate
    val real = TextAnalysis.metricCorr(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(real.map(_._1).sum === graft.sources.Tables.documents(spark, sf0001).count())
    real.foreach { case (_, a, b) =>
      assert(a >= -1.0 && a <= 1.0 && b >= -1.0 && b <= 1.0)
    }
  }

  test("ewmaHoursFrom: isolated hour = own cents; adjacent hours weight 2:1; gaps never dilute") {
    import spark.implicits._
    val events = Seq(
      ("a", "2026-01-01 00:10:00", 1.00),  // hour H:   100 cents
      ("a", "2026-01-01 00:40:00", 0.50),  // same hour: +50 -> 150
      ("a", "2026-01-01 01:10:00", 2.00),  // hour H+1: 200 cents
      ("b", "2026-01-03 07:10:00", 3.00))  // isolated hour, own type
      .toDF("event_type", "tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = Analytics.ewmaHoursFrom(events).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val hA = out.keys.filter(_._1 == "a").map(_._2).min
    // first hour has no lookback history: EWMA = its own cents
    val (n0, num0, den0, e0) = out(("a", hA))
    assert(n0 === 1L && e0 === 150L && num0 === 150L * (1L << 19) && den0 === (1L << 19))
    // second hour: weights 2^19 (self) and 2^18 (1 back) -> (2*200+150)/3 = 183
    val (n1, num1, den1, e1) = out(("a", hA + 1))
    assert(n1 === 2L)
    assert(num1 === 200L * (1L << 19) + 150L * (1L << 18))
    assert(den1 === (1L << 19) + (1L << 18))
    assert(e1 === (2L * 200L + 150L) / 3L)
    // the isolated type-b hour: denominator sums only PRESENT hours, so
    // two silent days of gap do not drag the average toward zero
    val bKey = out.keys.find(_._1 == "b").get
    assert(out(bKey)._4 === 300L, "gap hours must not dilute the EWMA")
    // decay direction: hour H+1's EWMA sits strictly between the raw
    // hourly values, closer to the newer one
    assert(e1 > 150L && e1 < 200L && (200L - e1) < (e1 - 150L))
  }

  test("quantileRecall: exact order statistics match a local full sort; every estimate within the theorem bound") {
    val out = Analytics.quantileRecall(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(out.map(_._1).toSeq === Seq(50L, 90L, 95L, 99L))
    // scalar truth: a LOCAL full sort (structurally different from the
    // engine's bin-pruned selection)
    val cents = graft.sources.Tables.lineitem(spark, sf0001)
      .select(round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    out.foreach { case (q, exact, est, err, bound, within) =>
      val r = ((q * n + 99) / 100).toInt
      assert(exact === cents(r - 1), s"bin-pruned order statistic wrong at q=$q")
      assert(err === est - exact)
      assert(bound >= 1L)
      assert(within === 1L,
        s"estimate outside the theorem bound at q=$q: err=$err bound=$bound")
    }
  }

  test("attributionTouchFrom: hand sessions credit the opening channel; corpus session count reconciles with sessionize") {
    import spark.implicits._
    val t0 = 1700000000000000L // µs
    def us(offsetMin: Long) = t0 + offsetMin * 60000000L
    val events = Seq(
      // user 1, session A: opened by a view, converts twice
      (1L, 10L, "view", us(0), 0.0),
      (1L, 11L, "purchase", us(5), 2.00),
      (1L, 12L, "purchase", us(10), 3.00),
      // user 1, session B (>30 min gap): opened by a click, no conversion
      (1L, 13L, "click", us(120), 0.0),
      // user 2: a lone purchase IS its own session and its own touch
      (2L, 20L, "purchase", us(0), 7.50))
      .toDF("user_id", "event_id", "event_type", "tsus", "value")
      .withColumn("ts", timestamp_micros(col("tsus")))
    val out = Analytics.attributionTouchFrom(events).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === Map(
      "view" -> ((1L, 1L, 2L, 500L)),
      "click" -> ((1L, 0L, 0L, 0L)),
      "purchase" -> ((1L, 1L, 1L, 750L))))
    // the exact-gap boundary: an event at EXACTLY gap microseconds later
    // stays in the session (the > comparison, mirrored in the oracle)
    val edge = Seq(
      (1L, 1L, "view", t0, 0.0),
      (1L, 2L, "purchase", t0 + 1800L * 1000000L, 1.00))
      .toDF("user_id", "event_id", "event_type", "tsus", "value")
      .withColumn("ts", timestamp_micros(col("tsus")))
    val e = Analytics.attributionTouchFrom(edge).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(e === Map("view" -> 1L), "exact-gap event must not open a new session")
    // corpus reconciliation: attribution partitions sessionize's sessions —
    // per-channel session counts sum to the total session count
    val attributed = Analytics.attributionTouch(spark, sf0001)
      .collect().map(_.getLong(1)).sum
    val totalSessions = graft.operators.Relational.sessionize(spark, sf0001)
      .collect().map(_.getLong(1)).sum
    assert(attributed === totalSessions,
      "every session must be attributed to exactly one channel")
  }

  test("winsorizeStats: bounds replay from a scalar histogram; clamping bites both tails and only the tails") {
    val out = Analytics.winsorizeStats(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
                                   r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out.nonEmpty)
    // scalar replay: per-type bounds from the same bin arithmetic over
    // collected data, then the clamp statistics recomputed independently
    val rows = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val mn = rows.map(_._2).min
    val mx = rows.map(_._2).max
    val r = mx - mn + 1
    rows.groupBy(_._1).foreach { case (tpe, trs) =>
      val cents = trs.map(_._2)
      val n = cents.length.toLong
      val byBin = cents.groupBy(c => (c - mn) * 1024L / r)
        .map { case (b, vs) => b -> vs.length.toLong }
      val sortedBins = byBin.toSeq.sortBy(_._1)
      def boundAt(q: Long): Long = {
        val target = (q * n + 99L) / 100L
        var cum = 0L
        val bin = sortedBins.collectFirst {
          case (b, c) if { cum += c; cum >= target } => b
        }.get
        mn + (2L * bin + 1L) * r / 2048L
      }
      val (lo, hi) = (boundAt(1), boundAt(99))
      val (gn, gLo, gHi, gLoB, gHiB, gSum) = out(tpe)
      assert(gn === n && gLoB === lo && gHiB === hi, s"type $tpe bounds")
      assert(gLo === cents.count(_ < lo).toLong)
      assert(gHi === cents.count(_ > hi).toLong)
      assert(gSum === cents.map(c => math.max(lo, math.min(hi, c))).sum)
      // the clamp is a TAIL treatment: each side touches under 3% of rows
      // (1% target + bin-midpoint slack), and the band is non-degenerate
      assert(lo < hi)
      assert(gLo * 100 <= 3 * n && gHi * 100 <= 3 * n,
        s"type $tpe clamps too much: lo=$gLo hi=$gHi of $n")
    }
  }

  test("attributionLinear: integer split conserves every cent; hand session splits with remainder on the touch") {
    import spark.implicits._
    val t0 = 1700000000000000L
    def us(offsetMin: Long) = t0 + offsetMin * 60000000L
    // one session: view (touch) -> click -> purchase of 10.01 = 1001 cents
    // over 3 distinct channels: 333 each, remainder 2 to the touch (view)
    val events = Seq(
      (1L, 10L, "view", us(0), 0.0),
      (1L, 11L, "click", us(5), 0.0),
      (1L, 12L, "purchase", us(10), 10.01))
      .toDF("user_id", "event_id", "event_type", "tsus", "value")
      .withColumn("ts", timestamp_micros(col("tsus")))
    val out = Analytics.attributionLinearFrom(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(
      "view" -> ((1L, 1L, 335L)),    // 333 + remainder 2
      "click" -> ((1L, 1L, 333L)),
      "purchase" -> ((1L, 1L, 333L))))
    // conservation on the corpus: linear credits sum to EXACTLY the
    // first-touch totals (both equal total purchase cents)
    val linear = Analytics.attributionLinear(spark, sf0001)
      .collect().map(_.getLong(3)).sum
    val firstTouch = Analytics.attributionTouch(spark, sf0001)
      .collect().map(_.getLong(4)).sum
    assert(linear === firstTouch,
      "the integer split must conserve every cent of purchase value")
  }

  test("cusumFrom: closed-form windows equal the sequential recurrence; sustained shift alarms, stationary never") {
    import spark.implicits._
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val base = java.time.LocalDateTime.of(2026, 1, 1, 0, 30)
    // type x: 40 quiet hours at 100 cents, then a SUSTAINED shift to 300 —
    // each shifted hour is one ordinary event (the count-based pointwise
    // monitor sees a perfectly flat 1-event/hour series), but the
    // cumulative cents drift grows without bound. type y: stationary.
    val rows =
      (0 until 60).map { i =>
        ("x", base.plusHours(i).format(fmt), if (i < 40) 1.00 else 3.00)
      } ++ (0 until 60).map { i => ("y", base.plusHours(i).format(fmt), 1.00) }
    val events = rows.toDF("event_type", "tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = Analytics.cusumFrom(events).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(out.size === 120)
    // scalar replay: the SEQUENTIAL recurrence S = max(0, S + c - mu - kap)
    // (a structurally different algorithm from the two-window closed form)
    for (tpe <- Seq("x", "y")) {
      val cents = (0 until 60).map(i =>
        if (tpe == "x" && i >= 40) 300L else 100L)
      val n = cents.length
      val s = cents.sum
      val mu = s / n
      val kap = s / (4L * n)
      var st = 0L
      val hours = out.keys.filter(_._1 == tpe).map(_._2).toSeq.sorted
      assert(hours.size === 60)
      hours.zipWithIndex.foreach { case (h, i) =>
        st = math.max(0L, st + cents(i) - mu - kap)
        val (c, m, k, cs, alarm) = out((tpe, h))
        assert(c === cents(i) && m === mu && k === kap)
        assert(cs === st, s"closed form diverged from recurrence at $tpe hour $i")
        assert(alarm === (if (st > 8L * kap) 1L else 0L))
      }
    }
    // the shift is caught: alarms fire only in the shifted segment, and
    // by the end the statistic is far beyond the threshold
    val xHours = out.keys.filter(_._1 == "x").map(_._2).toSeq.sorted
    val alarms = xHours.map(h => out(("x", h))._5)
    assert(alarms.take(40).forall(_ == 0L), "no alarm before the shift")
    assert(alarms.drop(45).forall(_ == 1L), "sustained shift must alarm")
    // the stationary type never alarms (deviation is always -kap <= 0)
    assert(out.keys.filter(_._1 == "y").forall(k => out(k)._5 == 0L))
    assert(out.keys.filter(_._1 == "y").forall(k => out(k)._4 == 0L))
    // complementarity, made concrete: the count-based pointwise monitor
    // (anomaly_hours) sees NOTHING in this fixture — every hour has
    // exactly two events (one per type), so counts are dead flat while
    // the cents CUSUM alarms.
    assert(Analytics.anomalyHoursFrom(events).count() === 0L)
    // corpus smoke: full trajectory (one row per grid cell), stat >= 0
    val corpus = Analytics.cusumShift(spark, sf0001).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getLong(5) >= 0L)
      assert(r.getLong(6) === 0L || r.getLong(6) === 1L)
    }
  }

  test("KLL sketch: merged-from-state equals direct, bit for bit; level budget holds") {
    import spark.implicits._
    // three disjoint shards with VERY different sizes and value ranges, so
    // per-shard levels differ — the regime where a shared-grid sketch
    // (the histogram member) needs up-front coordination and this one
    // doesn't
    val rows = (0 until 9000).map { i =>
      val shard = if (i < 6000) "a" else if (i < 8500) "b" else "c"
      (shard, s"k:$i", (i.toLong * 37) % 100000L + (if (shard == "c") 10000000L else 0L))
    }.toDF("scope", "rkey", "cents")
    val k = 256
    val strat = Analytics.kllRows(rows)
    // DIRECT: one scope over the union
    val stratU = strat.withColumn("scope", lit("u"))
    val lvlU = Analytics.kllLevel(spark, Analytics.kllHist(stratU), k)
    val direct = Analytics.kllSurvivors(stratU, lvlU)
      .select("cents", "tz").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    // MERGED: per-shard states (histogram + survivors at the shard's own
    // level), then the union level from SUMMED histograms and survivors
    // re-filtered from the per-shard SURVIVOR state alone
    val histPer = Analytics.kllHist(strat)
    val lvlPer = Analytics.kllLevel(spark, histPer, k)
    val survPer = Analytics.kllSurvivors(strat, lvlPer)
    val histSum = histPer.groupBy("tz").agg(sum("c").as("c"))
      .select(lit("u").as("scope"), col("tz"), col("c"))
    val lvlM = Analytics.kllLevel(spark, histSum, k)
    val merged = survPer.select(lit("u").as("scope"), col("cents"), col("tz"))
      .join(lvlM, Seq("scope")).filter(col("tz") >= col("lvl"))
      .select("cents", "tz").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(merged === direct,
      "state-only merge must reconstruct the direct sketch exactly (nesting)")
    // level arithmetic: the chosen level fits the budget and is minimal
    val lu = lvlU.collect()(0)
    val (lvl, n) = (lu.getLong(1), lu.getLong(2))
    assert(n === 9000L)
    assert(direct.size <= k, s"survivors ${direct.size} exceed budget $k")
    if (lvl > 0L) {
      val below = strat.filter(col("tz") >= lvl - 1L).count()
      assert(below > k, s"level $lvl not minimal: level ${lvl - 1} kept $below <= $k")
    }
    // per-shard levels can only be <= the merged level (counts add)
    val perLvls = lvlPer.collect().map(r => r.getLong(1))
    val lm = lvlM.collect()(0).getLong(1)
    assert(lm === lvl)
    assert(perLvls.forall(_ <= lm))
    // partitioning invariance: the same sketch on any layout
    val again = Analytics.kllSurvivors(stratU.repartition(13), lvlU)
      .select("cents", "tz").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(again === direct)
  }


  test("winsorizeKll: rank-bounded cuts agree with the histogram form's tails on the corpus") {
    val kll = Analytics.winsorizeKll(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
                                   r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(kll.nonEmpty)
    kll.foreach { case (tpe, (n, lo, hi, loC, hiC, wsum)) =>
      // each tail clamps about 1% — never more than 3% (the bound the
      // histogram form also gates), and the band is ordered
      assert(lo <= n * 3 / 100, s"$tpe clamps ${lo} of $n at the low tail")
      assert(hi <= n * 3 / 100, s"$tpe clamps ${hi} of $n at the high tail")
      assert(loC <= hiC, s"$tpe band inverted: $loC > $hiC")
      // the winsorized sum is confined to the band
      assert(wsum >= loC * n && wsum <= hiC * n)
    }
    // the two winsorizations see the same corpus: identical scopes and
    // row counts, and the KLL band sits inside (or equal to) a slightly
    // widened histogram band — both target the same 1%/99% ranks, the
    // histogram reads bin MIDPOINTS (up to one bin width off), the KLL
    // reads actual sample values within a rank bound
    val hist = Analytics.winsorizeStats(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4), r.getLong(5))).toMap
    assert(hist.keySet === kll.keySet)
    kll.foreach { case (tpe, (n, _, _, _, _, _)) =>
      assert(hist(tpe)._1 === n, s"$tpe row counts differ between the two forms")
    }
  }

  test("kllRecall: every quantile within the range-free rank bound; exact when n <= k") {
    val rows = Analytics.kllRecall(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(50L, 90L, 95L, 99L))
    rows.foreach { r =>
      val (rank, lo, hi) = (r.getLong(1), r.getLong(3), r.getLong(4))
      val (err, bound, within) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(lo <= hi, "rank interval must be ordered")
      assert(err === math.max(0L, math.max(lo - rank, rank - hi)))
      assert(within === 1L, s"q=${r.getLong(0)} rank error $err exceeds the 8-sigma bound $bound")
    }
    // n <= k degenerates to level 0 = the exact order statistic: the
    // sketch IS the data and the target rank lies inside the interval
    import spark.implicits._
    val small = (0 until 500).map(i => ("all", s"r:$i", (i * 7919L) % 100000L))
      .toDF("scope", "rkey", "cents")
    val strat = Analytics.kllRows(small)
    val lvl = Analytics.kllLevel(spark, Analytics.kllHist(strat), 1024)
    assert(lvl.collect()(0).getLong(1) === 0L, "n <= k must pick level 0")
    assert(Analytics.kllSurvivors(strat, lvl).count() === 500L)
  }
}
