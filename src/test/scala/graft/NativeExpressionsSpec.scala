package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Differential tests of the native codegen expressions against their
  * reference formulations (the interpreted HOF compositions they replaced).
  * Bit-exact equality is the contract — the DuckDB oracle hashes rely on it. */
class NativeExpressionsSpec extends SparkSpecBase {

  test("native graft_cosine is bit-identical to the HOF fold on real embeddings") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(200)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(5000)
    val diff = pairs.select(
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        VectorFunctions.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .filter(col("native") =!= col("hof"))  // bitwise double inequality
      .count()
    assert(diff === 0L)
  }

  test("native graft_shingles equals the HOF shingleSet on the corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val diff = docs.select(
        call_function("graft_shingles", col("text"), lit(3)).as("native"),
        TextFunctions.shingleSet(col("text"), 3).as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(diff === 0L)
  }

  test("native graft_simhash equals the library simhash on the corpus + edge cases") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text").cast("string").as("t"))
      .union(Seq("", "!!!", "one two one", "  a b c  ").toDF("t"))
    val diff = docs
      .select(col("t"), call_function("graft_simhash", col("t")).as("native"))
      .as[(String, Long)]
      .collect()
      .count { case (t, native) =>
        native != graft.operators.Dedup.simhash64(TextFunctions.tokenizeScala(t).toSeq)
      }
    assert(diff === 0)
  }

  test("graft_shingles edge cases: short docs, leading punctuation, empty") {
    val rows = Seq("", "!!!", "one two", "  a b c  ", "x!y?z", "a a a a")
    import spark.implicits._
    val got = rows.toDF("text")
      .select(call_function("graft_shingles", col("text"), lit(3)).as("s"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) === Nil)                       // empty text
    assert(got(1) === Nil)                       // delimiters only
    assert(got(2) === Nil)                       // fewer than n tokens
    assert(got(3) === List("a b c"))             // leading/trailing delimiters
    assert(got(4) === List("x y z"))             // punctuation as separators
    assert(got(5) === List("a a a"))             // distinct-set semantics
  }

  test("graft_minhash aggregate equals the library signature, with partial aggregation") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val params = Dedup.minhashParams(16)
    val agg = Dedup.shinglePostings(spark, sf0001, 3)
      .groupBy("doc_id")
      .agg(call_function("graft_minhash", col("s"), lit(16)).as("sig"))
    // partial aggregation planned (ObjectHashAggregate partial + final)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_minhash"), s"no partial agg in:\n$plan")
    agg.collect().take(50).foreach { r =>
      val expected = Dedup.minhashSignature(
        Dedup.shinglesScala(docs(r.getLong(0)), 3), params).toSeq
      assert(r.getSeq[Long](1).toSeq === expected, s"doc ${r.getLong(0)}")
    }
  }

  test("graft_minhash_arr per-row scalar equals the graft_minhash aggregate") {
    // The streaming-ingest path computes signatures per row from the
    // shingle ARRAY; the batch index aggregates exploded shingles. Both
    // must emit bit-identical signatures or the stream would probe the
    // wrong LSH buckets.
    val viaAgg = graft.operators.Dedup.shinglePostings(spark, sf0001, 3)
      .groupBy("doc_id")
      .agg(call_function("graft_minhash", col("s"), lit(128)).as("sig"))
    val viaRow = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        call_function("graft_minhash_arr",
          call_function("graft_shingles", col("text"), lit(3)), lit(128)).as("sig"))
    assert(viaAgg.join(viaRow, "doc_id")
      .filter(viaAgg("sig") =!= viaRow("sig")).count() === 0)
    // empty shingle set → all-MaxValue signature, not null/crash
    import spark.implicits._
    val empty = Seq("???").toDF("text")
      .select(call_function("graft_minhash_arr",
        call_function("graft_shingles", col("text"), lit(3)), lit(4)).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(empty === Seq.fill(4)(Long.MaxValue))
  }

  test("graft_kmv: exact below k, within error bound above, partitioning-independent") {
    import spark.implicits._
    def est(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy("g").agg(call_function("graft_kmv", col("v"), lit(64)).as("e"))
        .collect().head.getAs[Double]("e")
    // below k the buffer holds every distinct hash → the count is EXACT
    val small = (1 to 40).flatMap(i => Seq(("g", s"u$i"), ("g", s"u$i"))).toDF("g", "v")
    assert(est(small) === 40.0)
    // above k: KMV standard error ≈ 1/√62 ≈ 13%; assert a ~3σ bound
    val big = (1 to 5000).map(i => ("g", s"user$i")).toDF("g", "v")
    val e = est(big)
    assert(math.abs(e / 5000.0 - 1.0) < 0.4, s"estimate $e too far from 5000")
    // merge is associative+commutative: any partitioning gives the same
    // buffer, so the estimate is bit-identical across shuffles
    assert(est(big.repartition(13)) === e)
    assert(est(big.repartition(3)) === e)
    // ImplicitCastInputTypes: a non-string argument coerces at ANALYSIS
    // (pre-fix this threw ClassCastException at execution)
    val ints = (1 to 40).map(i => ("g", i)).toDF("g", "v")
    assert(est(ints) === 40.0)
  }

  test("graft_kmv_state/merge: rollup of per-group sketches equals the direct sketch") {
    import spark.implicits._
    // 5 groups, heavily overlapping membership (every user in 2–3 groups):
    // distinct counts do NOT add across groups, sketches must merge
    val rows = (1 to 2000).flatMap { u =>
      val gs = Seq(u % 5, (u * 7 + 1) % 5) ++ (if (u % 2 == 0) Seq((u * 3 + 2) % 5) else Seq())
      gs.distinct.map(g => (s"g$g", s"user$u"))
    }
    val df = rows.toDF("g", "v")
    val k = 64
    // level 1: per-group sketch states
    val per = df.groupBy("g")
      .agg(call_function("graft_kmv_state", col("v"), lit(k)).as("sk"))
    val states = per.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // each state is sorted ascending, ≤k long, 63-bit non-negative
    states.values.foreach { s =>
      assert(s.size <= k && s == s.sorted && s.forall(_ >= 0L))
    }
    // level 2: merge over ONLY the sketch rows
    val merged = per.select(explode(col("sk")).as("hv"))
      .agg(call_function("graft_kmv_merge", col("hv"), lit(k)).as("sk"))
      .collect().head.getSeq[Long](0)
    // direct sketch over every raw value, group-blind
    val direct = df.agg(call_function("graft_kmv_state", col("v"), lit(k)).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(merged === direct,
      "merged per-group sketches must equal the sketch built directly over the union")
    // the merge is partitioning-independent
    val mergedAgain = per.select(explode(col("sk")).as("hv")).repartition(11)
      .agg(call_function("graft_kmv_merge", col("hv"), lit(k)).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(mergedAgain === merged)
    // non-degenerate: the rollup estimate differs from the per-group SUM
    // (overlapping membership) — the exact property sketches exist for
    val est = (s: Seq[Long]) =>
      if (s.size < k) s.size.toDouble else (k - 1).toDouble * math.pow(2, 63) / s.last.toDouble
    val sumOfGroups = states.values.map(est).sum
    assert(est(merged) < 0.7 * sumOfGroups,
      s"rollup ${est(merged)} should be far below the invalid per-group sum $sumOfGroups")
    assert(math.abs(est(merged) / 2000.0 - 1.0) < 0.4, s"estimate ${est(merged)} too far from 2000")
  }

  test("graft_cms: overestimates only, weighted == raw build, partitioning-independent") {
    import spark.implicits._
    import graft.functions.expressions.CmsKernel
    import org.apache.spark.unsafe.types.UTF8String
    val depth = 4; val width = 64
    def grid(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(call_function("graft_cms", col("v"), col("wt"), lit(depth), lit(width)).as("g"))
        .collect().head.getSeq[Long](0)
    // a skewed vocabulary: word i appears i times (letter-suffix fixture —
    // the tokenizer convention, though the aggregate sees values verbatim)
    val raw = (1 to 60).flatMap(i => Seq.fill(i)(s"word${('a' + i % 26).toChar}$i"))
    val rawDf = raw.map(v => (v, 1L)).toDF("v", "wt")
    val weightedDf = raw.groupBy(identity).map { case (v, vs) => (v, vs.size.toLong) }
      .toSeq.toDF("v", "wt")
    val g = grid(rawDf)
    assert(g.length === depth * width)
    // counter addition is associative: pre-aggregated weighted updates and
    // raw weight-1 updates build the IDENTICAL grid (what lets the batch
    // and streaming forms share one oracle), under any partitioning
    assert(grid(weightedDf) === g)
    assert(grid(rawDf.repartition(13)) === g)
    assert(grid(weightedDf.repartition(3)) === g)
    // each row's cells sum to the total mass; estimates never undercount
    val total = raw.size.toLong
    (0 until depth).foreach { i =>
      assert(g.slice(i * width, (i + 1) * width).sum === total)
    }
    val exact = raw.groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    exact.foreach { case (v, cnt) =>
      val est = (0 until depth).map { i =>
        g(i * width + CmsKernel.bucket(UTF8String.fromString(v), i, width))
      }.min
      assert(est >= cnt, s"CMS undercounted $v: $est < $cnt")
    }
    // width 2 forces collisions: SOME estimate must strictly overcount —
    // proves the sketch is a real lossy summary, not an exact count
    val tiny = grid(rawDf.withColumn("wt", lit(1L)))
    assert(tiny.length === depth * width)
    val tinyG = rawDf.agg(call_function("graft_cms", col("v"), col("wt"), lit(4), lit(2)).as("g"))
      .collect().head.getSeq[Long](0)
    val overcounts = exact.count { case (v, cnt) =>
      (0 until 4).map(i => tinyG(i * 2 + CmsKernel.bucket(UTF8String.fromString(v), i, 2))).min > cnt
    }
    assert(overcounts > 0, "width-2 grid cannot count 60 keys exactly")
    // graft_cms_bucket (the probe-side read hash) equals the kernel's
    val b = rawDf.limit(10)
      .select(col("v"), call_function("graft_cms_bucket", col("v"), lit(2), lit(width)).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    b.foreach { case (v, bk) =>
      assert(bk === CmsKernel.bucket(UTF8String.fromString(v), 2, width))
    }
  }

  test("tokenizer unicode parity: \\p{L} keeps accented/non-latin letters") {
    import graft.functions.TextFunctions
    val t = "Über café naïve 東京 word2vec łódź!"
    val scalaToks = TextFunctions.tokenizeScala(t).toSeq
    assert(scalaToks === Seq("über", "café", "naïve", "東京", "word", "vec", "łódź"))
    // column tokenizer and compiled shingle kernel agree on the same text
    import spark.implicits._
    val colToks = Seq(t).toDF("text")
      .select(TextFunctions.tokenize(col("text")).as("ws"))
      .collect()(0).getSeq[String](0).toSeq
    assert(colToks === scalaToks)
  }

  test("spark.sql entry point: SQL wc equals the DataFrame wc") {
    spark.read.parquet(s"$sf0001/documents.parquet")
      .createOrReplaceTempView("documents_v")
    val sqlWc = spark.sql(
      """SELECT word, count(*) AS cnt
        |FROM (SELECT explode(filter(split(lower(text), '[^\\p{L}]+'), w -> length(w) > 0)) AS word
        |      FROM documents_v)
        |GROUP BY word ORDER BY word""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val dfWc = graft.operators.CoreQueries.wc(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(sqlWc === dfWc)
  }

  test("graft_bloom: zero false negatives, FPR tracks the sizing formula") {
    import spark.implicits._
    import graft.functions.expressions.BloomFns
    val keys = (0 until 2000).map(i => s"key$i")
    def build(numBits: Int): Array[Byte] = keys.toDF("k")
      .agg(call_function("graft_bloom", col("k"), lit(numBits), lit(5)).as("f"))
      .head().getAs[Array[Byte]](0)
    // tight filter (8 KiB bits for 2000 keys): every inserted key MUST hit
    val tight = build(8192)
    val misses = keys.count(k =>
      !BloomFns.mightContain(tight, org.apache.spark.unsafe.types.UTF8String.fromString(k), 5))
    assert(misses === 0, s"$misses false negatives — the filter contract is broken")
    // FPR on 20k absent keys: theory (1-e^{-kn/m})^k ≈ 0.17 here; bound loosely
    val absent = (0 until 20000).map(i => s"other$i")
    val fpTight = absent.count(k =>
      BloomFns.mightContain(tight, org.apache.spark.unsafe.types.UTF8String.fromString(k), 5))
    assert(fpTight < 6000, s"tight-filter FPR implausibly high: $fpTight/20000")
    assert(fpTight > 0, "tight filter shows zero false positives — hashing suspect")
    // production sizing (2^20 bits): FPR collapses to ~1e-10
    val wide = build(1 << 20)
    val fpWide = absent.count(k =>
      BloomFns.mightContain(wide, org.apache.spark.unsafe.types.UTF8String.fromString(k), 5))
    assert(fpWide === 0, s"wide-filter false positives: $fpWide/20000")
  }

  test("graft_bloom_might_contain codegen path agrees with the driver-side kernel") {
    import spark.implicits._
    import graft.functions.expressions.BloomFns
    val keys = (0 until 500).map(i => s"doc$i")
    val filter = keys.toDF("k")
      .agg(call_function("graft_bloom", col("k"), lit(8192), lit(5)).as("f"))
      .head().getAs[Array[Byte]](0)
    val probes = (0 until 500).map(i => s"doc$i") ++ (0 until 500).map(i => s"miss$i")
    val sqlSide = probes.toDF("k")
      .select(col("k"), call_function("graft_bloom_might_contain",
        lit(filter), col("k"), lit(5)).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probes.foreach { k =>
      val direct = BloomFns.mightContain(
        filter, org.apache.spark.unsafe.types.UTF8String.fromString(k), 5)
      assert(sqlSide(k) === direct, s"codegen/driver disagree on $k")
    }
  }

  test("graft_hash_embed: deterministic, order-blind, and identical for exact-duplicate docs") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val emb = graft.operators.TextAnalysis.embedDocuments(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // 1. dimension + mass bounds: |emb|_1 <= token count (each token moves
    //    exactly one coordinate by ±1)
    val tokens = docs.select(col("doc_id"),
        size(graft.functions.TextFunctions.tokenize(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    emb.foreach { case (id, v) =>
      assert(v.length === 64)
      assert(v.map(math.abs).sum <= tokens(id).toLong, s"doc $id mass exceeds token count")
    }
    // 2. exact-duplicate texts embed identically (planted pair — the
    //    sf0.001 corpus has no exact dups), and distinct real docs rarely
    //    collide: the corpus must produce >1 distinct embedding
    val planted = docs.limit(1).select(col("text")).collect()(0).getString(0)
    val pair = Seq((1L, planted), (2L, planted)).toDF("doc_id", "text")
      .select(call_function("graft_hash_embed", col("text"), lit(64)).as("emb"))
      .collect().map(_.getSeq[Long](0))
    assert(pair(0) === pair(1), "exact duplicates must embed identically")
    assert(emb.values.map(_.toVector).toSet.size > 1,
      "distinct documents should produce distinct embeddings")
    // 3. a BAG (multiset) embedding is token-ORDER-blind: shuffling words
    //    preserves it (the property minhash/shingle features do NOT have)
    val t = "alpha beta gamma delta alpha beta"
    val shuffled = "beta alpha delta gamma beta alpha"
    val two = Seq((1L, t), (2L, shuffled)).toDF("doc_id", "text")
      .select(col("doc_id"),
              call_function("graft_hash_embed", col("text"), lit(64)).as("emb"))
      .collect().map(_.getSeq[Long](1))
    assert(two(0) === two(1))
  }

  test("native expressions are SQL-callable via GraftExtensions") {
    spark.read.parquet(s"$sf0001/embeddings.parquet").limit(2)
      .createOrReplaceTempView("emb_tmp")
    val n = spark.sql(
      "SELECT graft_cosine(a.embedding, b.embedding) c FROM emb_tmp a, emb_tmp b").count()
    assert(n === 4)
  }
}
