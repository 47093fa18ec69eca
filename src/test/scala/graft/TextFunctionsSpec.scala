package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.TextAnalysis

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tok(s: String): Seq[String] = {
    val df = Seq(s).toDF("text").select(TextFunctions.tokenize(col("text")).as("t"))
    df.collect()(0).getSeq[String](0)
  }

  test("column tokenizer and Scala tokenizer are bit-identical") {
    val cases = Seq("hola don pepito", "HOla dON!  seniOR", ",,hola!!. chau!$$",
                    "", "   ", "único niño café", "a1b2c3", "ñandú über")
    cases.foreach { s =>
      assert(tok(s) === TextFunctions.tokenizeScala(s).toSeq, s"input: '$s'")
    }
  }

  test("tokenizer drops empties and non-letters, keeps unicode letters") {
    assert(tok("hola,,, hola!!. chau!$$") === Seq("hola", "hola", "chau"))
    assert(tok("único ñandú") === Seq("único", "ñandú"))
    assert(tok("12 34") === Seq.empty)
  }

  test("shingles: n-grams of the token sequence") {
    val df = Seq("a b c d").toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("s"))
    assert(df.collect()(0).getSeq[String](0) === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("s"))
    assert(short.collect()(0).getSeq[String](0) === Seq.empty)
  }

  test("bpe token count: ceil(len/4) per word") {
    val df = Seq("abcd abcde a").toDF("text")
      .select(TextFunctions.bpeTokenCount(col("text")).as("n"))
    assert(df.collect()(0).getLong(0) === (1 + 2 + 1))
  }

  test("rolling hashes: shifted windows share hashes, changed content doesn't") {
    val t1 = "one two three four five six".split(" ").toIndexedSeq
    val t2 = ("zero " + t1.mkString(" ")).split(" ").toIndexedSeq // shifted by 1
    val h1 = TextAnalysis.rollingHashes(t1, 3)
    val h2 = TextAnalysis.rollingHashes(t2, 3)
    assert((h1 intersect h2) === h1) // every window of t1 appears in t2
    val t3 = "one two CHANGED four five six".split(" ").toIndexedSeq
    val h3 = TextAnalysis.rollingHashes(t3, 3)
    assert((h1 intersect h3).size < h1.size)
    assert(TextAnalysis.rollingHashes(IndexedSeq("a"), 3) === Set.empty[Long])
  }

  test("stringHash64 is deterministic and spreads") {
    assert(TextAnalysis.stringHash64("hola") === TextAnalysis.stringHash64("hola"))
    val hs = (1 to 1000).map(i => TextAnalysis.stringHash64(s"w$i")).toSet
    assert(hs.size === 1000)
  }

  test("perplexity_score: boilerplate scores predictable, natural text scores surprising") {
    // The LM signal the rule-based quality filters can't see: boilerplate
    // is WELL-FORMED (passes length/stopword/word-shape rules) but its
    // bigrams repeat across the corpus, so a corpus-trained bigram LM
    // assigns it low surprisal. 20 boilerplate docs share one template
    // sentence; 20 natural docs each use distinct word pairs.
    import spark.implicits._
    val boiler = (0 until 20).map { i =>
      (i.toLong, "click here to subscribe to our newsletter and never miss an update from our team")
    }
    val vocabA = Seq("river", "mountain", "quiet", "sudden", "amber", "glass",
      "window", "harbor", "letter", "evening", "stone", "garden", "winter",
      "copper", "signal", "meadow", "lantern", "orchard", "timber", "harvest")
    val natural = (0 until 20).map { i =>
      // rotate the vocabulary so each doc's adjacent PAIRS are distinct
      val ws = (0 until 14).map(j => vocabA((i * 7 + j * (i + 3)) % vocabA.length))
      (100L + i, ws.mkString(" "))
    }
    val docs = (boiler ++ natural).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityScoreFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val boilerAvg = boiler.map(b => out(b._1)).sum / boiler.size
    val naturalAvg = natural.map(n => out(n._1)).sum / natural.size
    assert(boilerAvg < naturalAvg - 1.0,
      s"boilerplate must score ≥1 bit/token more predictable: boiler=$boilerAvg natural=$naturalAvg")
    // the template doc's bigrams each occur ≥20 times out of ≤a-few-dozen
    // context occurrences: near-zero whole-bit surprisal
    assert(boilerAvg < 1.5, s"shared-template surprisal should be near 0 bits, got $boilerAvg")
  }

  test("heavy_hitters: output is exact and invariant to partitioning (MG candidates are a superset)") {
    import spark.implicits._
    // 3 planted heavy words + a long tail of singletons; s=50 → threshold
    // = total/50. Misra-Gries candidate sets differ per partitioning, but
    // the exact-recount output must not.
    // tail words are LETTER-ONLY: a digit suffix would be stripped by the
    // tokenizer and collapse the whole tail into one (heavy!) token
    val words = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(120)("gamma") ++
      (0 until 400).map(i => s"t${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val docs = words.grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val total = words.length // 1020; threshold cnt*50 > 1020 → cnt >= 21
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.heavyHittersFrom(df, s = 50).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = Seq(("alpha", 300L), ("beta", 200L), ("gamma", 120L))
    assert(run(docs) === expected)
    assert(run(docs.repartition(7)) === expected)
    assert(run(docs.repartition(1)) === expected)
    // the exact threshold semantics: a word at exactly total/s does NOT
    // qualify (strict >); verify against a full exact count
    val exact = docs.select(explode(graft.functions.TextFunctions.tokenize(col("text"))).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.foreach { case (w, c) => assert(exact(w) === c && c * 50 > total) }
  }

  test("common_passages: shared passages found across docs, within-doc repeats excluded") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    val docs = Seq(
      (1L, s"intro one two three $passage outro closing words here now"),
      (2L, s"different opening sentence entirely $passage and a different ending too"),
      // doc 3 repeats ITS OWN passage twice — n_docs is 1, must not appear
      (3L, "self repeat block lorem ipsum dolor sit amet consectetur " +
           "self repeat block lorem ipsum dolor sit amet consectetur"),
      (4L, "wholly unrelated content with no shared chunks at all whatsoever")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.commonPassagesFrom(docs, window = 8, minDocs = 2).collect()
    assert(out.nonEmpty, "the planted cross-doc passage must surface")
    // every reported passage spans docs 1 and 2 only (n_docs = 2,
    // first_doc = 1); doc 3's self-repeat never reaches the output
    out.foreach { r =>
      assert(r.getLong(1) === 2L && r.getLong(3) === 1L, r.toString)
    }
    // the planted 8-token passage is ONE window: its chunk hash appears
    // with exactly 2 occurrences across the two docs; and the result is
    // partitioning-invariant
    assert(out.exists(_.getLong(2) === 2L))
    val again = TextAnalysis.commonPassagesFrom(docs.repartition(5), 8, 2).collect()
    assert(again.map(_.toString).sorted === out.map(_.toString).sorted)
  }

  test("dedup_passages: coverage is the UNION of overlapping duplicated windows") {
    import spark.implicits._
    // A 10-token passage shared by docs 1 and 2: its 3 interior 8-token
    // chunks overlap, so covered tokens must count 10 — not 3 × 8 = 24.
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"unique opening words here $passage closing"), // 4 + 10 + 1 = 15 tokens
      (2L, s"different prefix tokens completely unlike $passage another suffix"),
      // doc 3 repeats ITS OWN 8-token block — single-doc chunks are not dups
      (3L, "selfrepeat block lorem ipsum dolor sit amet consectetur " +
           "selfrepeat block lorem ipsum dolor sit amet consectetur"),
      (4L, "tiny doc") // below the window: zero chunks, zero coverage
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupPassagesFrom(docs, window = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((15L, 10L, 0.6667)))
    assert(out(2L)._2 === 10L)
    assert(out(3L)._2 === 0L, "within-doc repeats must not count as duplicated passages")
    assert(out(4L) === ((2L, 0L, 0.0)))
    // partitioning-invariant (the distinct-position union is exact)
    val again = TextAnalysis.dedupPassagesFrom(docs.repartition(5), 8, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(again === out)
  }

  test("excise_passages: removes exactly the shared passage, preserves order, keeps clean docs intact") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"unique opening words here $passage closing"),
      (2L, s"different prefix tokens completely unlike $passage another suffix"),
      // self-repeats are not cross-doc duplicates: doc 3 must be untouched
      (3L, "selfrepeat block lorem ipsum dolor sit amet consectetur " +
           "selfrepeat block lorem ipsum dolor sit amet consectetur"),
      (4L, "tiny doc"),
      // doc 5 IS the passage and nothing else — excises to empty
      (5L, passage)
    ).toDF("doc_id", "text")
    // doc 5 makes the passage 3-doc duplicated; its own 3 chunks all dup
    val out = TextAnalysis.excisePassagesFrom(docs, window = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) === ((5L, "unique opening words here closing")),
      "surviving tokens must keep original order across the excised gap")
    assert(out(2L) === ((7L, "different prefix tokens completely unlike another suffix")))
    assert(out(3L)._2 === docs.filter($"doc_id" === 3L)
      .select(concat_ws(" ", graft.functions.TextFunctions.tokenize($"text")))
      .head().getString(0), "no cross-doc dup: the token stream is unchanged")
    assert(out(4L) === ((2L, "tiny doc")))
    assert(out(5L) === ((0L, "")), "a fully-duplicated doc excises to empty")
    val again = TextAnalysis.excisePassagesFrom(docs.repartition(5), 8, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(again === out)
  }

  test("collocations: planted phrase tops the lift ranking; independent pairs score near 1") {
    import spark.implicits._
    // "zig zag" ALWAYS co-occur (the collocation); "aa"/"bb" are frequent
    // both together and apart (independent pair — lift stays small); the
    // lone "qq ww" bigram sits below minCount and must be pruned.
    // Counts: zig=zag=20, aa=bb=100, N=242 tokens (incl. qq ww).
    //   lift(zig,zag) = 242·20/(20·20)  = 12.1   (the planted phrase)
    //   lift(aa,bb)   = 242·100/(100·100) = 2.42
    //   lift(bb,aa)   = 242·80/(100·100)  = 1.936
    //   lift(zag,aa)  = 242·20/(20·100)   = 2.42  (doc-boundary bigram)
    val docs = ((0 until 20).map(i => (i.toLong, "zig zag " + "aa bb " * 5)) :+
      (99L, "qq ww")).toDF("doc_id", "text")
    val out = TextAnalysis.collocationsFrom(docs, minCount = 5, k = 50).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.head === (("zig", "zag", 20L, 12.1)),
      s"the always-adjacent pair must rank first: ${out.toSeq}")
    val byPair = out.map(t => (t._1, t._2) -> t._4).toMap
    assert(byPair(("aa", "bb")) === 2.42, "independent frequent pair scores ~ N·c/(c·c)")
    assert(!byPair.contains(("qq", "ww")), "sub-minCount bigram must be pruned")
    assert(out.map(_._4).toSeq === out.map(_._4).sortBy(-_).toSeq, "descending lift order")
    // equal-lift ties break on (w1, w2): (aa,bb) sorts before (zag,aa) at 2.42
    val ties = out.filter(_._4 == 2.42).map(t => (t._1, t._2)).toSeq
    assert(ties === Seq(("aa", "bb"), ("zag", "aa")), s"tie order: $ties")
    // partitioning-invariant (the whole pipeline is agg/join, no order dependence)
    val again = TextAnalysis.collocationsFrom(docs.repartition(7), 5, 50).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("winnow_fingerprints: a sample of the chunk chain — bounds against chunk_fingerprint") {
    val winnow = TextAnalysis.winnowFingerprints(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r).toMap
    val chunks = TextAnalysis.chunkFingerprint(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(winnow.keySet === chunks.keySet)
    var selected = 0L; var total = 0L
    winnow.foreach { case (id, wr) =>
      val cr = chunks(id)
      val (nFp, nCh) = (wr.getLong(1), cr.getLong(1))
      assert(nFp <= nCh, s"doc $id selected more fingerprints than chunks")
      if (nCh >= 4) {
        // at least one per disjoint w-window (coverage), at most all
        assert(nFp >= (nCh - 3 + 3) / 4, s"doc $id under the coverage floor")
        // selected fps live inside the chunk chain's value range
        assert(wr.getLong(2) >= cr.getLong(2) && wr.getLong(3) <= cr.getLong(3))
        selected += nFp; total += nCh
      } else assert(nFp === 0L, s"doc $id: no window fits but fingerprints selected")
    }
    // expected density 2/(w+1) = 0.4 at w=4 — the whole point of winnowing;
    // allow generous slack for the synthetic corpus's hash ties
    val density = selected.toDouble / total
    assert(density > 0.25 && density < 0.6, s"winnow density off: $density")
  }

  test("winnow_matches: planted shared passage detected, self-repeat and boilerplate excluded") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda" // 11 tokens = window+w-1
    val boiler = "standard footer text appears everywhere identically always repeated constantly forever more"
    val docs = Seq(
      (1L, s"intro one two three $passage outro closing words here now"),
      (2L, s"different opening sentence entirely $passage and a different ending too"),
      (3L, "self repeat block lorem ipsum dolor sit amet consectetur " +
           "self repeat block lorem ipsum dolor sit amet consectetur"),
      (4L, "wholly unrelated content with no shared chunks at all whatsoever"),
      (5L, s"five unique words precede the footer $boiler"),
      (6L, s"totally different opening for the footer $boiler")
    ).toDF("doc_id", "text")
    // maxDocFreq=1 drops EVERY cross-doc hash -> no matches survive the cap
    assert(TextAnalysis.winnowMatchesFrom(docs, 8, 4, maxDocFreq = 1, minShared = 1).collect().isEmpty)
    val out = TextAnalysis.winnowMatchesFrom(docs, 8, 4, maxDocFreq = 50, minShared = 1).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    // the guarantee: an 11-token shared passage at window=8, w=4 MUST match
    assert(pairs.contains((1L, 2L)), s"planted passage pair missed: $pairs")
    assert(pairs.contains((5L, 6L)), "shared boilerplate pair missed")
    // no pair involves the self-repeater or the unrelated doc
    out.foreach { r =>
      assert(!Set(3L, 4L).contains(r.getLong(0)) && !Set(3L, 4L).contains(r.getLong(1)))
      val containment = r.getDouble(3)
      assert(containment > 0.0 && containment <= 1.0)
    }
    // partitioning-invariant
    val again = TextAnalysis.winnowMatchesFrom(docs.repartition(5), 8, 4, 50, 1).collect()
    assert(again.map(_.toString).sorted === out.map(_.toString).sorted)
  }

  test("winnowRecall: bounds hold and the detection guarantee is corpus-verified") {
    import org.apache.spark.unsafe.types.UTF8String
    val row = TextAnalysis.winnowRecall(spark, sf0001).collect().head
    val (nTruth, nDet, recall) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(nTruth > 0, "no chunk-sharing pairs on the fixture — degenerate")
    assert(nDet <= nTruth && recall >= 0.0 && recall <= 1.0)
    assert(math.abs(recall - nDet.toDouble / nTruth) <= 5e-5 + 1e-9)
    // THE GUARANTEE, verified corpus-wide: every cold-chunk-sharing pair
    // whose shared content includes w=4 CONSECUTIVE chunks must be
    // detected by the winnowed pass
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def chain(t: String): Array[Long] = {
      val hs = graft.functions.TextFunctions.tokenizeScala(t)
        .map(graft.functions.expressions.ChunkKernel.tokenHash)
      if (hs.length < 8) Array.emptyLongArray
      else Array.tabulate(hs.length - 7) { i =>
        var h = 0L; var j = 0
        while (j < 8) { h = (h * 1000003L + hs(i + j)) % 4294967296L; j += 1 }
        h
      }
    }
    val chains = docs.view.mapValues(chain).toMap
    val postings = chains.toSeq.flatMap { case (id, ch) => ch.distinct.map(f => (f, id)) }
    val hot = postings.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 50).keySet
    val truthPairs = postings.filterNot(p => hot(p._1)).groupBy(_._1).values
      .flatMap(ps => for { a <- ps.map(_._2); b <- ps.map(_._2); if a < b } yield (a, b))
      .toSet
    val approx = TextAnalysis.winnowMatchesFrom(
        graft.sources.Tables.documents(spark, sf0001), 8, 4, 50, 1)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def sharesRun(a: Long, b: Long): Boolean = {
      val (ca, cb) = (chains(a), chains(b))
      val windowsB = cb.sliding(4).filter(_.length == 4).map(_.toSeq).toSet
      ca.sliding(4).filter(_.length == 4).exists(w => windowsB.contains(w.toSeq))
    }
    truthPairs.filter { case (a, b) => sharesRun(a, b) }.foreach { p =>
      assert(approx.contains(p), s"guaranteed pair $p missed by the winnowed pass")
    }
  }

  test("winnowMatchesIndexed: the registry lookup equals a local replay of the split") {
    import org.apache.spark.unsafe.types.UTF8String
    val out = TextAnalysis.winnowMatchesIndexed(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out.nonEmpty, "no cross-split winnow matches — fixture degenerate")
    val sel = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect().map { r =>
        val arr = graft.functions.expressions.WinnowKernel
          .winnow(UTF8String.fromString(r.getString(1)), 8, 4)
        r.getLong(0) ->
          (0 until arr.numElements()).map(i => arr.getStruct(i, 2).getLong(1)).toSet
      }.toMap
    val reg = sel.filter(_._1 % 10 != 0)
    val hot = reg.toSeq.flatMap(_._2).groupBy(identity)
      .filter(_._2.size > 50).keySet
    val probes = sel.filter(_._1 % 10 == 0).view.mapValues(_ -- hot).toMap
    val expected = (for {
      (p, pf) <- probes.toSeq
      (m, mf) <- reg.toSeq
      shared = pf.intersect(mf -- hot)
      if shared.size >= 2
    } yield {
      val c = BigDecimal(shared.size.toDouble / pf.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      (p, m, shared.size.toLong, c)
    }).toSet
    // compare pairs and shared counts exactly; containment to rounding slack
    assert(out.map(t => (t._1, t._2, t._3)) === expected.map(t => (t._1, t._2, t._3)))
    val expC = expected.map(t => (t._1, t._2) -> t._4).toMap
    out.foreach { case (p, m, _, c) =>
      assert(math.abs(c - expC((p, m))) <= 1.1e-4, s"containment drift at ($p,$m)")
    }
  }

  test("ppsSample: membership and p_permille replay exactly from the integer PPS formula") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars"),
        expr("cast(conv(substring(md5(lower(trim(regexp_replace(text, '\\\\s+', ' ')))), 1, 8), 16, 10) as bigint)").as("u32"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wTotal = docs.map(_._2).sum
    val expected = docs
      .filter { case (_, w, u) => u < (64L * w * 4294967296L) / wTotal }
      .map { case (id, w, _) =>
        (id, math.min(1000L, 64L * w * 1000L / wTotal)) }.toMap
    val out = TextAnalysis.ppsSample(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === expected, "PPS membership or inclusion probability drifted from the scalar replay")
    // the draw is calibrated: expected size 64, and weights genuinely vary
    assert(out.size > 16 && out.size < 256, s"sample size ${out.size} wildly off target 64")
    assert(expected.values.toSet.size > 1, "fixture degenerate: all docs same inclusion probability")
  }

  test("boilerplateLinesFrom: >= half-coverage boundary exact; cleaned text rebuilt in order") {
    // source s1: 4 docs — header in all 4 (caught), promo in exactly 2
    // (df*2 == n_docs: AT the boundary -> caught), rare in 1 (kept).
    // source s2: 1 doc sharing s1's header text — per-source scoping
    // means it is NOT boilerplate there (df 1 of 1 -> caught actually:
    // 1*2 >= 1! singleton sources catch everything — assert that too:
    // the rule is coverage-relative, and a 1-doc source is all-boiler).
    val pages = Seq(
      (0L, "s1", "nav menu\nbody zero\npromo line"),
      (1L, "s1", "nav menu\nbody one\npromo line"),
      (2L, "s1", "nav menu\nbody two\nrare line"),
      (3L, "s1", "nav menu\nbody three"),
      (4L, "s2", "nav menu\nbody four")).toDF("doc_id", "source", "page")
    val out = TextAnalysis.boilerplateLinesFrom(pages).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    def fp(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out === Seq(
      (0L, 3L, 2L, fp("body zero")),   // nav + promo stripped
      (1L, 3L, 2L, fp("body one")),
      (2L, 3L, 1L, fp("body two\nrare line")), // rare (1 of 4) kept, order preserved
      (3L, 2L, 1L, fp("body three")),
      (4L, 2L, 2L, fp(""))))           // singleton source: everything >= half
  }

  test("normalizeText: NFC composes the decomposed suffix, r=0 docs are identity, fp replays via the JDK Normalizer") {
    val docs = Seq((0L, "plain ascii"), (1L, "one unit"), (2L, "two units"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.normalizeTextFrom(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def jdkNfc(s: String) =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val unit = TextAnalysis.NfcSuffixUnit
    // the suffix really is decomposed in source (combining marks present)
    assert(unit.exists(c => c == '\u0301' || c == '\u0303'),
      "suffix unit lost its combining marks — someone normalized the source file")
    // r = 0: identity — no change, no codepoint delta, fp of the raw text
    val (c0, b0, a0, f0) = out(0L)
    assert(c0 === 0L && b0 === a0 && f0 === md5hex("plain ascii"))
    // r = 1: each unit composes two marks away -> 2 codepoints shorter
    val (c1, b1, a1, f1) = out(1L)
    assert(c1 === 1L && a1 === b1 - 2L)
    assert(f1 === md5hex(jdkNfc("one unit" + unit)),
      "expression output must equal the scalar JDK Normalizer replay")
    // r = 2: deltas scale with the repeat count
    val (c2, b2, a2, f2) = out(2L)
    assert(c2 === 1L && a2 === b2 - 4L)
    assert(f2 === md5hex(jdkNfc("two units" + unit + unit)))
    // idempotence: the normalized form is already NFC
    assert(java.text.Normalizer.isNormalized(jdkNfc("one unit" + unit),
      java.text.Normalizer.Form.NFC))
  }
}
