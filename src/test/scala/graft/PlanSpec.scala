package graft

/** Plan-regression gate over the most expensive queries: the plan shapes
  * the 100 TB design depends on — no cartesian products, dimension joins
  * broadcast, filters reaching the parquet scan, top-k as
  * TakeOrderedAndProject — are asserted here, so a regression fails
  * `sbt test` instead of only showing up in a benchmark read.
  *
  * Plans are read AFTER `collect()`: AQE only finalizes a plan when the
  * DataFrame itself executes, so the string rendered before execution
  * would show the un-replanned initial stages.
  */
class PlanSpec extends SparkSpecBase {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // The load-bearing batch queries (streaming plans carry micro-batch
  // machinery and are covered by StreamingSpec's semantic equalities).
  private val heavy = Seq(
    "dedup_simhash", "dedup_ngram", "dedup_minhash", "dedup_incremental",
    "dedup_clusters", "decontaminate", "decontaminate_indexed", "fuzzy_names",
    "join_orders_customers", "q5_region", "multi_join_agg", "brand_revenue",
    "similarity_ivf", "similarity_ivf_indexed", "knn_join", "tfidf_terms",
    "bm25_search", "grep_filter", "grep_indexed", "topk_words", "corpus_export",
    "cluster_sample", "embed_clusters")

  private lazy val plans: Map[String, String] =
    heavy.map(n => n -> finalPlan(n)).toMap

  test("bloom_join: the membership predicate filters the fact scan BELOW the shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }).flatMap(flatten)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle join: the claim under test is that the bloom
      // probe kills fact rows before the Exchange, not that AQE broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.operators.Relational.bloomJoin(spark, sf0001)
      df.collect()
      val reduced = flatten(df.queryExecution.executedPlan).exists {
        case e: ShuffleExchangeLike =>
          val sub = e.child.toString
          sub.contains("graft_bloom_might_contain") && sub.contains("orders")
        case _ => false
      }
      assert(reduced, "bloom predicate not below the fact-side Exchange:\n" +
        df.queryExecution.executedPlan.toString)
      // exact-in-result: bloomed plan equals the plain join, row for row
      val plain = graft.sources.Tables.orders(spark, sf0001)
        .join(graft.sources.Tables.customer(spark, sf0001)
          .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
        .count()
      assert(df.agg(org.apache.spark.sql.functions.sum("n_orders")).head().getLong(0) === plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("quantile_sketch combines map-side: the shuffle carries the sketch, not the rows") {
    val plan = finalPlan("quantile_sketch")
    assert(plan.contains("partial_count"),
      s"bin histogram lost its partial aggregation (every row would shuffle):\n$plan")
  }

  test("perplexity_score: LM training aggregates combine map-side, scoring join is not cartesian") {
    val plan = finalPlan("perplexity_score")
    assert(plan.contains("partial_count"),
      s"bigram model lost its partial aggregation (every token pair would shuffle raw):\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"perplexity scoring join degenerated to a cartesian product:\n$plan")
  }

  test("collocations: n-gram counts combine map-side, totals broadcast, top-k never global-sorts") {
    val plan = finalPlan("collocations")
    assert(plan.contains("partial_count"),
      s"bigram/unigram counting lost its map-side combine (raw token pairs would shuffle):\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k degenerated to a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row totals join must broadcast, not cartesian:\n$plan")
  }

  test("heavy_hitters: candidate semi-join broadcasts, recount combines map-side") {
    val plan = finalPlan("heavy_hitters")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"candidate filter must be a broadcast semi-join (candidates are <= s*partitions rows):\n$plan")
    assert(plan.contains("partial_count"),
      s"exact recount lost its map-side combine:\n$plan")
  }

  test("common_passages: chunk-hash aggregation combines map-side") {
    val plan = finalPlan("common_passages")
    assert(plan.contains("partial_count"),
      s"passage grouping lost its partial aggregation (every chunk row would shuffle raw):\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("dedup_passages: coverage explode joins on the chunk hash, aggregates combine map-side") {
    val plan = finalPlan("dedup_passages")
    assert(!plan.contains("CartesianProduct"),
      s"duplicated-fp join degenerated to a cartesian product:\n$plan")
    assert(plan.contains("partial_count"),
      s"reach/coverage aggregation lost its map-side combine:\n$plan")
  }

  test("freq_sketch: the CMS grid partial-aggregates, estimation broadcasts the one-row grid") {
    val plan = finalPlan("freq_sketch")
    assert(plan.contains("partial_graft_cms"),
      s"the CMS aggregate lost partial aggregation (every word-count row would shuffle raw " +
        s"instead of one fixed grid per map partition):\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the one-row grid must broadcast to the probes:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("excise_passages: rewrite joins on the chunk hash, no cartesian, aggregates combine") {
    val plan = finalPlan("excise_passages")
    assert(!plan.contains("CartesianProduct"),
      s"coverage join degenerated to a cartesian product:\n$plan")
    assert(plan.contains("partial_count"),
      s"duplicated-fp aggregation lost its map-side combine:\n$plan")
  }

  test("cluster_canonical: argmax is a hash aggregate over the persisted labels, not a window") {
    val plan = finalPlan("cluster_canonical")
    assert(!plan.contains("Window"),
      s"survivor argmax must be max(struct(...)), not a per-cluster window sort:\n$plan")
    assert(plan.contains("partial_max") || plan.contains("partial_count"),
      s"argmax aggregate lost its map-side combine:\n$plan")
    assert(plan.contains("graft_clusters"),
      s"must read the persisted cluster-label table:\n$plan")
  }

  test("pq_search: codes join the broadcast distance table, folds aggregate partially") {
    val plan = finalPlan("pq_search")
    assert(!plan.contains("CartesianProduct"),
      s"ADC lookup degenerated to a cartesian product:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the (probes x m x k) distance table must broadcast against the code scan:\n$plan")
    assert(plan.contains("graft_pq"),
      s"search must read the persisted code/codebook tables, not retrain:\n$plan")
  }

  test("outlier_events: stats broadcast onto the scan, the fact table never sort-merge-joins") {
    val plan = finalPlan("outlier_events")
    assert(plan.contains("BroadcastHashJoin"),
      s"per-group stats (a handful of rows) must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the fact table must not shuffle for the stats join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"stats aggregation lost its map-side combine:\n$plan")
  }

  test("cohort_retention / triangle_count / knn_classify: equi-join shapes, no cartesian, partial aggs") {
    Seq("cohort_retention", "triangle_count", "knn_classify").foreach { q =>
      val plan = finalPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
      assert(plan.contains("partial_count") || plan.contains("partial_min") ||
             plan.contains("partial_sum"),
        s"$q lost map-side partial aggregation:\n$plan")
    }
  }

  test("profile_table: one scan, sketches combine map-side, no per-column re-scan") {
    val plan = finalPlan("profile_table")
    assert(plan.contains("partial_graft_kmv"),
      s"per-column KMV sketches lost map-side partial aggregation:\n$plan")
    // one source scan: a per-column profiler would show one FileScan per
    // column; this one reads the parquet exactly once (count the FINAL
    // plan only — the AQE string repeats the tree under "Initial Plan")
    val finalOnly = plan.split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(finalOnly).size
    assert(scans == 1, s"expected ONE events scan, got $scans:\n$finalOnly")
  }

  test("rolling_features: one user shuffle feeds the window, the rollup combines map-side") {
    val df = SparkEntry.queries("rolling_features")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // exactly two hash exchanges: user_id -> window, event_type -> rollup
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 shuffles (window + rollup), got $exchanges:\n$plan")
    assert(plan.contains("partial_count"),
      s"final rollup lost its map-side combine:\n$plan")
  }

  test("ewma_hours: the lookback is an equi-join on the exploded offset key, never a range join") {
    val plan = finalPlan("ewma_hours")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"the 20-hour lookback must stay an equi-join (exploded offset key):\n$plan")
    assert(plan.contains("partial_sum"),
      s"hourly grid aggregation lost its map-side combine:\n$plan")
  }

  test("boilerplate_lines: the surviving dictionary broadcasts onto the line stream") {
    val plan = finalPlan("boilerplate_lines")
    assert(plan.contains("BroadcastHashJoin"),
      s"the boilerplate dictionary (tiny by definition) must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in the cleaning join:\n$plan")
  }

  test("constraint_audit: all five constraints ride ONE aggregate; RI is a broadcast mark") {
    val plan = finalPlan("constraint_audit")
    assert(plan.contains("BroadcastHashJoin"),
      s"the customer dimension must broadcast for the RI mark:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the fact side must never shuffle for the dimension join:\n$plan")
    // one aggregate pass: distinct-count expands, but there is exactly one
    // final single-row aggregate chain, not one scan per constraint
    val finalOnly = plan.split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(finalOnly).size
    // orders appears twice by construction (batch + corrupted shard union)
    // plus the broadcast customer scan: anything beyond that means a
    // constraint re-reads the fact table
    assert(scans <= 3, s"expected <=3 scans (orders x2 union + customer), got $scans:\n$finalOnly")
  }

  test("hard_negatives: shingle verification joins hash on doc ids, never all-pairs") {
    val plan = finalPlan("hard_negatives")
    assert(!plan.contains("CartesianProduct"), s"all-pairs leak:\n$plan")
    // the ONLY nested-loop is the declared probe broadcast (tiny build
    // side); count the FINAL plan only — the AQE string repeats the tree
    // under "Initial Plan"
    val finalOnly = plan.split("== Initial Plan ==").head
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(finalOnly).size
    assert(nlj <= 1, s"only the probe broadcast may nested-loop, got $nlj:\n$finalOnly")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"candidate-pair shingle lookups must be equi-joins:\n$plan")
  }

  test("no expensive query plans a CartesianProduct") {
    plans.foreach { case (name, plan) =>
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("BroadcastNestedLoopJoin appears only where a tiny frame is the build side") {
    // probe sets / one-row stats frames crossJoin the corpus by design;
    // anywhere else a BNLJ is a missed equi-join key.
    val allowed = Set("similarity_ivf", "similarity_ivf_indexed",
      "tfidf_terms", "bm25_search")
    plans.foreach { case (name, plan) =>
      if (!allowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected BNLJ:\n$plan")
    }
  }

  test("dimension and candidate joins broadcast the small side") {
    val wantBhj = Seq("join_orders_customers", "q5_region", "multi_join_agg",
      "brand_revenue", "fuzzy_names", "dedup_ngram", "dedup_minhash",
      "dedup_incremental", "dedup_simhash", "dedup_clusters", "decontaminate")
    wantBhj.foreach { name =>
      assert(plans(name).contains("BroadcastHashJoin"),
        s"$name lost its broadcast join:\n${plans(name)}")
    }
  }

  test("filters reach the parquet scan (PushedFilters non-empty)") {
    val wantPushed = Seq("grep_filter", "q5_region", "join_orders_customers",
      "brand_revenue")
    wantPushed.foreach { name =>
      val plan = plans(name)
      val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan)
      assert(pushed.isDefined, s"$name pushes no filters to its scan:\n$plan")
    }
  }

  test("top-k is a TakeOrderedAndProject, not a global sort") {
    assert(plans("topk_words").contains("TakeOrderedAndProject"),
      plans("topk_words"))
  }

  test("cluster_sample pushes its quota below the per-cell sort (WindowGroupLimit)") {
    assert(plans("cluster_sample").contains("WindowGroupLimit"),
      s"per-cell quota not pushed down:\n${plans("cluster_sample")}")
  }

  test("embed_clusters aggregates without a window and reads the persisted cells store") {
    val plan = plans("embed_clusters")
    assert(plan.contains("graft_ivf_"),
      s"embed_clusters does not read the persisted index:\n$plan")
    assert(!plan.contains("Window"),
      s"embed_clusters must argmax via max(struct), not a window pass:\n$plan")
  }

  test("ranking queries read persisted statistics tables, not corpus re-scans") {
    Seq("tfidf_terms", "bm25_search").foreach { name =>
      assert(plans(name).contains("graft_rankstats_"),
        s"$name does not scan the persisted stats tables:\n${plans(name)}")
    }
  }

  test("index-routed decontamination reads the persisted containment band store") {
    assert(plans("decontaminate_indexed").contains("graft_corpus_"),
      s"decontaminate_indexed does not scan the persisted index:\n${plans("decontaminate_indexed")}")
  }

  test("corpus_export reads persisted exclusion tables, not the dedup pipeline") {
    val plan = plans("corpus_export")
    assert(plan.contains("graft_export_") && plan.contains("graft_clusters_"),
      s"corpus_export does not scan the persisted artifacts:\n$plan")
    // the expensive stages must NOT be in the export plan: no LSH band
    // self-join (graft_bands kernel) and no CC-round machinery
    assert(!plan.contains("graft_bands"),
      s"corpus_export still computes LSH bands inline:\n$plan")
  }

  test("dedup_clusters reads the persisted label table, not a CC re-run") {
    val plan = plans("dedup_clusters")
    assert(plan.contains("graft_clusters_"),
      s"dedup_clusters does not scan the persisted labels:\n$plan")
    assert(!plan.contains("graft_bands"),
      s"dedup_clusters still computes LSH bands inline:\n$plan")
  }

  test("report operators read persisted stores, never re-run their pipelines") {
    val dr = finalPlan("dedup_report").split("== Initial Plan ==").head
    assert(dr.contains("graft_clusters_"),
      s"dedup_report does not scan the persisted labels:\n$dr")
    assert(!dr.contains("graft_bands"),
      s"dedup_report recomputes LSH bands inline:\n$dr")
    val cr = finalPlan("contamination_report").split("== Initial Plan ==").head
    assert(cr.contains("graft_corpus_"),
      s"contamination_report does not ride the persisted containment index:\n$cr")
  }

  test("indexed grep bucket-prunes each term lookup to one index bucket") {
    // The text-selection accelerator at scale: an equality filter on the
    // bucketed word column must read ONE bucket of the postings index,
    // not scan it — a term lookup is a point read.
    val plan = plans("grep_indexed")
    assert("SelectedBucketsCount: 1 out of \\d+".r.findFirstIn(plan).isDefined,
      s"grep_indexed does not bucket-prune its index scans:\n$plan")
  }

  test("phrase search bucket-prunes each term's positional lookup") {
    // Same point-read contract as grep_indexed, on the positional index:
    // every phrase term's posting-list read is one bucket.
    val plan = finalPlan("phrase_search")
    assert("SelectedBucketsCount: 1 out of \\d+".r.findFirstIn(plan).isDefined,
      s"phrase_search does not bucket-prune its index scans:\n$plan")
    // and the result is non-trivial on the fixture corpus
    assert(SparkEntry.queries("phrase_search")(spark, sf0001).count() > 0)
  }

  test("boolean search answers every branch from bucket-pruned posting reads") {
    // The general retrieval form: OR/AND/NOT must all be posting-list
    // reads — FIVE term lookups (2 any + 2 all + 1 none), each pruned to
    // one bucket, and the NOT branch an anti-join, never a corpus scan.
    val df = SparkEntry.queries("boolean_search")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val pruned = "SelectedBucketsCount: 1 out of \\d+".r.findAllIn(plan).size
    assert(pruned >= 5, s"expected >=5 bucket-pruned term reads, got $pruned:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT branch is not an anti-join:\n$plan")
  }

  test("indexed IVF search prunes cell partitions dynamically") {
    // The IVF property at scale: the corpus scan must carry a runtime
    // partition filter fed by the probed cells, so a query reads nprobe
    // directories — not everything-then-filter.
    val plan = finalPlan("similarity_ivf_indexed")
    assert(plan.contains("dynamicpruning"),
      s"cell scan is not dynamically pruned:\n$plan")
  }

  test("similar_docs prunes the TEXT index's cell partitions dynamically") {
    // The text-retrieval twin of the IVF property: the persisted hashed-
    // embedding store is partitioned by cell, and the probe's ranked cells
    // must arrive as a runtime partition filter.
    val plan = finalPlan("similar_docs")
    assert(plan.contains("graft_tivf_"),
      s"similar_docs does not read the persisted text index:\n$plan")
    assert(plan.contains("dynamicpruning"),
      s"text cell scan is not dynamically pruned:\n$plan")
  }

  test("ivfpq_search reads nprobe cells of the partitioned CODE table, pruned dynamically") {
    val plan = finalPlan("ivfpq_search")
    assert(plan.contains("graft_ivfpq"),
      s"must read the persisted cell-partitioned code table:\n$plan")
    assert(plan.contains("dynamicpruning"),
      s"code scan is not dynamically pruned to the probed cells:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("media_dedup: the shuffle carries digests, never payload bytes") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }).flatMap(flatten)
    val df = SparkEntry.queries("media_dedup")(spark, sf0001)
    df.collect()
    val exchanges = flatten(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.nonEmpty, "expected the digest group-by shuffle")
    exchanges.foreach { e =>
      val carried = e.output.map(_.name)
      assert(!carried.contains("payload"),
        s"payload bytes cross an Exchange: $carried") }
  }

  test("train_shuffle: the permutation window is per-shard, never single-partition") {
    val plan = finalPlan("train_shuffle")
    // the row_number window must partition by shard...
    assert(plan.contains("row_number"), s"missing the window:\n$plan")
    assert("hashpartitioning\\(shard".r.findFirstIn(plan).isDefined,
      s"window shuffle is not hash-partitioned on shard:\n$plan")
    // ...and nothing in the plan may collapse to one partition except the
    // driver-side presentation sort (rangepartitioning), which at scale is
    // the per-shard file write instead.
    assert(!plan.contains("SinglePartition"),
      s"a single-partition Exchange would serialize the permutation:\n$plan")
  }

  test("snapshot_diff: the diff join moves fingerprints, never document text") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }).flatMap(flatten)
    val df = SparkEntry.queries("snapshot_diff")(spark, sf0001)
    df.collect()
    flatten(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
      .foreach { e =>
        val carried = e.output.map(_.name)
        assert(!carried.contains("text"),
          s"document text crosses an Exchange: $carried") }
  }

  test("quality_filter / doc_chunks stay scan-shaped: no hash shuffle before the sort") {
    Seq("quality_filter", "doc_chunks").foreach { name =>
      val plan = finalPlan(name).split("== Initial Plan ==").head
      // per-row exprs ride the one scan; the only Exchange allowed is the
      // rangepartitioning of the presentation sort
      assert(!plan.contains("Exchange hashpartitioning"),
        s"$name grew a data shuffle — the rules must stay per-row on the scan:\n$plan")
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans == 1, s"$name expected ONE documents scan, got $scans:\n$plan")
    }
  }

  test("winnow_fingerprints stays scan-shaped; kanon_suppress broadcasts the cell list") {
    val wf = finalPlan("winnow_fingerprints").split("== Initial Plan ==").head
    // one codegen'd kernel pass on the scan; only the presentation sort's
    // range exchange is allowed
    assert(!wf.contains("Exchange hashpartitioning"),
      s"winnow_fingerprints grew a data shuffle — the kernel must ride the scan:\n$wf")
    assert("Scan parquet".r.findAllIn(wf).size == 1,
      s"expected ONE documents scan:\n$wf")
    val ks = finalPlan("kanon_suppress").split("== Initial Plan ==").head
    // the retained-cell list is |cells|-sized: it must broadcast back onto
    // the corpus scan, never shuffle the corpus on the cell key
    assert(ks.contains("BroadcastHashJoin"),
      s"kanon_suppress lost its broadcast cell join:\n$ks")
    assert(ks.contains("partial_count"),
      s"cell sizes lost their map-side combine:\n$ks")
  }

  test("hybrid_search: both candidate generators stay top-k, fusion is not cartesian") {
    val plan = finalPlan("hybrid_search").split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"fusion grew a cartesian:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"a candidate side lost its map-side top-k:\n$plan")
  }

  test("peak_concurrency: the sweep window is hour-partitioned, not single-partition") {
    val plan = finalPlan("peak_concurrency").split("== Initial Plan ==").head
    // the boundary-stream running sum must be partitioned by the hour
    // bucket; only the metadata-sized carry window may be global
    assert(plan.contains("windowspecdefinition(b#") ||
           plan.contains("windowspecdefinition(b,"),
      s"per-bucket running sum lost its hour partitioning:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("winnow_matches_indexed reads the persisted registry, re-fingerprints only probes") {
    val plan = finalPlan("winnow_matches_indexed").split("== Initial Plan ==").head
    assert(plan.contains("graft_winnowidx_"),
      s"indexed winnow lookup does not read the persisted postings:\n$plan")
    // exactly one documents scan (the probe shard); the registry side must
    // come from the store, not a second corpus fingerprint pass
    val docScans = plan.split("\n").count(l =>
      l.contains("Scan parquet") && l.contains("documents"))
    assert(docScans == 1, s"expected ONE documents scan (probes only), got $docScans:\n$plan")
  }

  test("corpus_overlap and winnow_matches shuffle compact keys, never document text") {
    Seq("corpus_overlap", "winnow_matches").foreach { name =>
      val plan = finalPlan(name).split("== Initial Plan ==").head
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
      // every Exchange must carry ids/hashes only — text stays at the scan
      val exchanges = plan.split("\n").filter(_.contains("Exchange hashpartitioning"))
      exchanges.foreach { line =>
        assert(!line.contains("text"), s"$name shuffles document text:\n$line")
      }
    }
  }

  test("source_mix: one corpus scan, partial-agg'd; the share pass sees |sources| rows") {
    val plan = finalPlan("source_mix").split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected ONE documents scan, got $scans:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"per-source totals lost their map-side combine:\n$plan")
    // the global-total window runs AFTER the aggregate (|sources| rows),
    // never over per-document rows: the single-partition Exchange must sit
    // above a HashAggregate, not above the scan
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx >= 0 && winIdx < aggIdx,
      s"share window must consume the aggregated frame:\n$plan")
  }

  // ----- the r8 expensive tail (VERDICT r8 directive 6): the 4 priciest
  // ----- previously un-gated queries, each asserted to its claimed shape.

  // Shape claims are asserted on the INITIAL physical plan: at this
  // fixture scale AQE's empty-relation propagation legitimately collapses
  // subtrees (an empty hot-hash set erases the anti-join; takedown_verify's
  // correct-EMPTY result collapses to EmptyRelation), so the final plan
  // under-reports the compiled shape. No-cartesian is asserted on BOTH.
  private def bothPlans(name: String): (String, String) = {
    val whole = finalPlan(name)
    val parts = whole.split("== Initial Plan ==")
    (parts.head, if (parts.length > 1) parts(1) else parts.head)
  }

  test("winnow_recall: truth join is equi-keyed on fp, hot filter partial-agg'd, no cartesian") {
    val (fin, init) = bothPlans("winnow_recall")
    Seq(fin, init).foreach(p => assert(!p.contains("CartesianProduct"),
      s"winnow_recall plans a cartesian (the 1-row final stats crossJoin must broadcast):\n$p"))
    // r16: the cold postings and the truth pair set are localCheckpoint-
    // truncated (each fed 2-3 plan references that re-ran the chunk
    // explode), so the hot-hash anti-join and its partial-agg'd df count
    // now execute in the truncation's pre-job and are invisible in the
    // returned frame's plan — the returned plan must instead show the
    // truncated scans. The anti-join SEMANTICS stay gated by the DuckDB
    // oracle differential (and the LeftAnti shape by the winnowRecall
    // source, where the exclusion is a plain left_anti join).
    assert(init.contains("ExistingRDD"),
      s"winnow_recall lost its truth/cold truncation (expected LogicalRDD scans):\n$init")
    // detection is a semi-join over the truncated truth — it must survive
    // (a rewrite to an inner join would change semantics AND explode the
    // pair mass at scale)
    assert(init.contains("LeftSemi"), s"detection lost its semi-join:\n$init")
  }

  test("takedown_verify: manifest joins broadcast as compact ids, pair pass not cartesian") {
    val (fin, init) = bothPlans("takedown_verify")
    Seq(fin, init).foreach(p =>
      assert(!p.contains("CartesianProduct"), s"takedown_verify plans a cartesian:\n$p"))
    // both manifest sides (ra, rb) are explicitly broadcast: the planned
    // joins must be BroadcastHashJoin LeftOuter, not a pair-stream SMJ
    val bhjOuter = "BroadcastHashJoin [^\n]*LeftOuter".r.findAllIn(init).size
    assert(bhjOuter >= 2,
      s"both manifest sides (ra, rb) must broadcast-join the pair stream, got $bhjOuter:\n$init")
    // the manifest travels as doc ids — no Exchange may carry text
    init.split("\n").filter(_.contains("Exchange hashpartitioning")).foreach { line =>
      assert(!line.contains("text"), s"takedown_verify shuffles document text:\n$line")
    }
  }

  test("text_recall: approx side reads the persisted text-IVF store; truth broadcast is the probe set") {
    val (fin, init) = bothPlans("text_recall")
    Seq(fin, init).foreach(p => assert(!p.contains("CartesianProduct"),
      s"text_recall plans a true cartesian (brute force must broadcast the <=10 probes):\n$p"))
    assert(init.contains("graft_tivf"),
      s"approx side re-clustered instead of reading the persisted IVF store:\n$init")
    assert(init.contains("BroadcastNestedLoopJoin") || init.contains("BroadcastHashJoin"),
      s"brute-force truth side must broadcast the probe set:\n$init")
  }

  test("dedup_threshold_curve: one LSH pair pass feeds all curve points, no cartesian") {
    val (fin, init) = bothPlans("dedup_threshold_curve")
    Seq(fin, init).foreach(p =>
      assert(!p.contains("CartesianProduct"), s"dedup_threshold_curve plans a cartesian:\n$p"))
    assert(init.contains("partial_count"),
      s"curve aggregate lost its map-side combine:\n$init")
    // ONE pair generation feeds all 6 curve points: the curve's plan must
    // contain EXACTLY the pair generator's corpus scans and not one more —
    // a per-threshold re-join would multiply them by |thresholds|. (The
    // initial plan pre-dates AQE exchange reuse, so the generator itself
    // shows its sides un-deduplicated; the ratio is what's gated.)
    val scans = "Scan parquet".r.findAllIn(init).size
    val pairScans = "Scan parquet".r.findAllIn(
      graft.operators.Dedup.minhashPairsUnordered(spark, sf0001, 3,
          numBands = 64, rowsPerBand = 2, threshold = 0.7)
        .queryExecution.executedPlan.toString).size
    assert(scans == pairScans,
      s"curve adds corpus scans beyond the single pair pass ($scans vs $pairScans):\n$init")
    init.split("\n").filter(_.contains("Exchange hashpartitioning")).foreach { line =>
      assert(!line.contains("text"), s"dedup_threshold_curve shuffles document text:\n$line")
    }
  }

  test("interval_join: the overlap join is the bucketed EQUI-join, never a nested loop") {
    val plan = finalPlan("interval_join")
    // a raw range-predicate self-join plans BroadcastNestedLoopJoin /
    // CartesianProduct — the bucket rewrite must keep it hash-keyed
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval_join fell back to a quadratic join strategy:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
           plan.contains("BroadcastHashJoin"),
      s"no equi-join in the interval_join plan:\n$plan")
    // pair aggregate combines map-side; top-k never global-sorts
    assert(plan.contains("partial_count"), s"pair aggregate lost map-side combine:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k is a global sort:\n$plan")
  }

  test("unpivot/grouping-sets melt in one Expand pass; gap_fill stitches broadcast over metadata") {
    val up = finalPlan("unpivot_metrics")
    // the melt is an Expand projection fused into the scan stage — never a
    // 4-scan Union, and the long-form aggregate keeps map-side combine
    assert(up.contains("Expand"), s"unpivot lost the Expand strategy:\n$up")
    assert(!up.contains("Union"), s"unpivot planned as a multi-scan Union:\n$up")
    assert(up.contains("partial_sum"), s"long-form sum lost map-side combine:\n$up")
    val gs = finalPlan("grouping_sets_pricing")
    assert(gs.contains("Expand"), s"grouping sets lost the Expand strategy:\n$gs")
    assert(!gs.contains("Union"), s"grouping sets re-scans per set:\n$gs")
    assert(gs.contains("partial_sum"), s"grouping-set aggregate lost map-side combine:\n$gs")
    val gf = finalPlan("gap_fill")
    // fact rows partial-agg before anything else; the dense spine is
    // GENERATEd (explode of sequence), and the zero-fill stitch joins the
    // metadata-sized counts broadcast — no fact-mass shuffle for the join
    assert(gf.contains("partial_count"), s"gap_fill counts lost map-side combine:\n$gf")
    assert(gf.contains("Generate"), s"gap_fill spine is not generated (explode+sequence):\n$gf")
    assert(gf.contains("BroadcastHashJoin"), s"gap_fill stitch join is not broadcast:\n$gf")
    assert(!gf.contains("SortMergeJoin"), s"gap_fill shuffles data mass for the stitch:\n$gf")
    val mc = finalPlan("metric_corr")
    // one scan, one shuffle: the moment sums combine map-side and nothing
    // joins — the Pearson arithmetic runs over |sources| rows
    assert(mc.contains("partial_sum"), s"metric_corr moments lost map-side combine:\n$mc")
    assert(!mc.contains("Join"), s"metric_corr should be join-free:\n$mc")
  }

  test("cocitation / sketch_rollup: equi-joins only, sketches and pairs combine map-side") {
    val coc = finalPlan("cocitation")
    assert(!coc.contains("CartesianProduct") && !coc.contains("BroadcastNestedLoopJoin"),
      s"cocitation plans a quadratic join:\n$coc")
    assert(coc.contains("partial_count"), s"cocitation pair counts lost map-side combine:\n$coc")
    assert(coc.contains("TakeOrderedAndProject"), s"cocitation top-k is a global sort:\n$coc")
    val pf = finalPlan("pareto_frontier")
    // corpus mass shuffles once (quality-level partial min); the level
    // table joins back broadcast — no second corpus-mass exchange
    assert(pf.contains("partial_min"), s"pareto_frontier lost map-side min:\n$pf")
    assert(pf.contains("BroadcastHashJoin"),
      s"pareto_frontier's level table must join back broadcast:\n$pf")
    val sk = finalPlan("sketch_rollup")
    // level 1 must partial-agg the ≤k-long sketch buffers in the shuffle;
    // level 2's input is |groups|·k longs — metadata-sized
    assert(sk.contains("partial_graft_kmv_state"),
      s"per-group KMV state lost map-side partial aggregation:\n$sk")
    assert(sk.contains("partial_graft_kmv_merge"),
      s"the rollup merge lost map-side partial aggregation:\n$sk")
  }

  test("round-11 extension plans: mrr has no Window, attribution reuses one user sort, sketches stay metadata-sized") {
    // mrr_eval: the whole point of the counting rewrite is that NO window
    // node appears — the rank is two partial-agg'd aggregates with the
    // probe/best frames broadcast
    val mrr = finalPlan("mrr_eval")
    assert(!mrr.contains("Window"), s"mrr_eval regressed to a windowed rank:\n$mrr")
    assert(mrr.contains("BroadcastNestedLoopJoin") || mrr.contains("BroadcastHashJoin"),
      s"mrr_eval probe side must broadcast:\n$mrr")
    assert(mrr.contains("partial_"), s"mrr_eval aggregates lost map-side combine:\n$mrr")
    // attribution_touch: lag, the running session sum and the per-session
    // aggregate all share ONE user_id exchange+sort — a second sort on the
    // same keys would mean the window chain broke apart
    val at = finalPlan("attribution_touch").split("== Initial Plan ==").head
    val userSorts = "hashpartitioning\\(user_id".r.findAllIn(at).size
    assert(userSorts <= 1, s"attribution_touch shuffles on user_id $userSorts times:\n$at")
    assert(!at.contains("CartesianProduct") && !at.contains("BroadcastNestedLoopJoin"),
      s"attribution_touch plans a quadratic join:\n$at")
    // cusum_shift: ONE fact scan; everything after the hourly grid is
    // metadata-sized window arithmetic
    val cu = finalPlan("cusum_shift").split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(cu).size === 1,
      s"cusum_shift re-scans the fact table:\n$cu")
    assert(cu.contains("partial_sum"), s"cusum grid lost map-side combine:\n$cu")
    // join_size_estimate: both the exact side and the sketch side
    // partial-aggregate; no join of fact mass anywhere (the sketch's whole
    // point is answering |A ⋈ B| WITHOUT the join)
    val js = finalPlan("join_size_estimate")
    assert(!js.contains("SortMergeJoin"),
      s"join_size_estimate joins fact mass:\n$js")
    assert(js.contains("partial_count") || js.contains("partial_sum"),
      s"join_size_estimate lost map-side combine:\n$js")
    // normalize_text: scan-side codegen only — the single exchange is the
    // presentation sort's range partitioning
    val nt = finalPlan("normalize_text").split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(nt).size === 1,
      s"normalize_text re-scans documents:\n$nt")
    assert(!nt.contains("hashpartitioning"),
      s"normalize_text shuffles before the presentation sort:\n$nt")
    assert(nt.contains("*("),
      s"normalize_text fell out of whole-stage codegen (no *(n) spans):\n$nt")
  }

  test("compaction_plan: the per-file running sum is block-partitioned, never a global window") {
    // r11 item 7: the manifest window was the one remaining window whose
    // single partition grew with the corpus. After the two-level split,
    // every window ordered by file_name must be partitioned by the
    // name-prefix block; the only unpartitioned window is the |blocks|
    // carry (ordered by blk — metadata grain).
    val plan = finalPlan("compaction_plan")
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"no window in the plan?\n$plan")
    windowLines.filter(_.contains("file_name")).foreach { l =>
      assert(l.contains("blk"),
        s"a per-file window runs without block partitioning:\n$l\n$plan")
    }
  }

  test("plan_advisor: the sketch verdicts match what Spark actually plans, both directions") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Relational
    import graft.sources.Tables
    // Threshold 16 KiB at sf0.001 splits the candidates BOTH ways under
    // the advisor's 64-bytes-per-row model (nation/customer/part sides
    // fit; orders/events sides don't) AND under Spark's file-size
    // statistic (the staged parquet sizes straddle 16 KiB the same way) —
    // the alignment point where the declared model meets the real
    // planner. AQE off so the static planner verdict is what's read (the
    // advisor models the planner, not runtime re-planning).
    val conf = spark.conf
    val oldThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "16384")
      conf.set("spark.sql.adaptive.enabled", "false")
      val advice = Relational.planAdvisor(spark, sf0001)
        .collect().map(r => r.getString(0) -> r.getString(4)).toMap
      assert(advice("customer_nation_dim") === "broadcast")
      assert(advice("orders_customer_dim") === "broadcast")
      assert(advice("lineitem_part_dim") === "broadcast")
      assert(advice("lineitem_orders_fk") === "shuffle")
      assert(advice("events_orders_mn") === "shuffle")
      def planOf(l: org.apache.spark.sql.DataFrame, lk: String,
                 r: org.apache.spark.sql.DataFrame, rk: String): String = {
        val df = l.join(r, l(lk) === r(rk))
        df.collect()
        df.queryExecution.executedPlan.toString
      }
      // a broadcast-size candidate really broadcasts...
      val bc = planOf(Tables.orders(spark, sf0001), "o_custkey",
                      Tables.customer(spark, sf0001), "c_custkey")
      assert(bc.contains("BroadcastHashJoin"),
        s"advice said broadcast but Spark planned:\n$bc")
      // ...and a shuffle-size candidate really shuffles
      val sh = planOf(Tables.lineitem(spark, sf0001), "l_orderkey",
                      Tables.orders(spark, sf0001), "o_orderkey")
      assert(!sh.contains("BroadcastHashJoin") &&
             (sh.contains("SortMergeJoin") || sh.contains("ShuffledHashJoin")),
        s"advice said shuffle but Spark planned:\n$sh")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  test("advised_join: executed plans follow the advice both directions; hints never change results") {
    import graft.operators.Relational
    import graft.sources.Tables
    val conf = spark.conf
    val oldThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      // the plan_advisor alignment point: 16 KiB splits the five
      // candidates 3 broadcast / 2 shuffle under both the declared model
      // and Spark's own statistic
      conf.set("spark.sql.autoBroadcastJoinThreshold", "16384")
      conf.set("spark.sql.adaptive.enabled", "false")
      val df = Relational.advisedJoin(spark, sf0001)
      val rows = df.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
      val plan = df.queryExecution.executedPlan.toString
      // one executed join per candidate, each on its advised path
      assert("BroadcastHashJoin".r.findAllIn(plan).size === 3,
        s"3 broadcast-advised candidates must broadcast:\n$plan")
      assert("SortMergeJoin".r.findAllIn(plan).size === 2,
        s"2 shuffle-advised candidates must sort-merge:\n$plan")
      assert(rows("customer_nation_dim")._2 === "broadcast")
      assert(rows("lineitem_orders_fk")._2 === "shuffle")
      assert(rows("events_orders_mn")._2 === "shuffle")
      // a hint changes the plan, never the answer: counts equal the plain
      // unhinted joins
      def unhinted(lt: org.apache.spark.sql.DataFrame, lk: String,
                   rt: org.apache.spark.sql.DataFrame, rk: String): Long =
        lt.filter(lt(lk).isNotNull).join(rt, lt(lk) === rt(rk)).count()
      assert(rows("customer_nation_dim")._1 ===
        unhinted(Tables.customer(spark, sf0001), "c_nationkey",
                 Tables.nation(spark, sf0001), "n_nationkey"))
      assert(rows("lineitem_orders_fk")._1 ===
        unhinted(Tables.lineitem(spark, sf0001), "l_orderkey",
                 Tables.orders(spark, sf0001), "o_orderkey"))
      assert(rows("events_orders_mn")._1 ===
        unhinted(Tables.events(spark, sf0001), "user_id",
                 Tables.orders(spark, sf0001), "o_custkey"))
      // the r12 ADVICE fix: "-1" (broadcast disabled — the value Spark
      // itself accepts) must yield shuffle everywhere, not throw
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val disabled = Relational.planAdvisor(spark, sf0001).collect()
      assert(disabled.length === 5 && disabled.forall(_.getString(4) === "shuffle"),
        "threshold -1 must read as 'shuffle' for every candidate")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  test("join_order_dp: the executed join tree follows the DP's winning order") {
    import graft.operators.Relational
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = Relational.joinOrderDp(spark, sf0001)
    assert(df.collect()(0).getString(4) === "cn_ocn")
    // left-deep tree: pre-order collect puts the DEEPEST join last; under
    // cn_ocn that first-built join must be customer x nation, and the
    // chain must build dims-outward (nation deepest, lineitem topmost)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size === 3, s"chain must execute as three binary joins: ${joins.size}")
    val innermostTables = joins.last.collectLeaves().map(_.toString).mkString
    assert(innermostTables.contains("c_custkey") &&
           innermostTables.contains("n_nationkey") &&
           !innermostTables.contains("l_orderkey"),
      s"DP said cn_ocn but the deepest executed join reads:\n$innermostTables")
    val topTables = joins.head.collectLeaves().map(_.toString).mkString
    assert(topTables.contains("l_orderkey"),
      "the fact table must join last under the dims-first order")
  }
}
