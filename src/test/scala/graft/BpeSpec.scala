package graft

import graft.operators.Bpe

/** Known-vector test of the BPE training loop: a two-word vocabulary whose
  * merge sequence is hand-computable, exercising both subtleties the
  * differential oracle depends on — greedy left-to-right overlap
  * resolution ("a a a" + rule (a,a) → "aa a", NOT "a aa") and the
  * lexicographic tie-break between equal-count pairs. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("bpe merges follow counts, greedy overlap, and lexicographic ties") {
    val wc = Seq(("aaab", 4L), ("aab", 3L)).toDF("word", "wcnt")
    val got = Bpe.bpeTrainFromCounts(wc, merges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: pairs (a,a)=2*4+1*3=11, (a,b)=4+3=7 → merge (a,a)
    //   "a a a b"→"aa a b" (greedy: leftmost pair only), "a a b"→"aa b"
    // round 2: (aa,a)=4, (a,b)=4, (aa,b)=3 → count tie, "a" < "aa" → (a,b)
    //   rule rewrites " a b "→" ab ": "aa a b"→"aa ab", "aa b" unchanged
    // round 3: (aa,ab)=4, (aa,b)=3 → (aa,ab)
    assert(got === Seq(
      (1L, "a", "a", 11L),
      (2L, "a", "b", 4L),
      (3L, "aa", "ab", 4L)))
  }

  test("bpe merges a repeated-symbol run fully within one round") {
    // "a a a a" + rule (a,a): the first replace pass leaves the second
    // occurrence unmerged (its leading space was consumed), the second
    // pass completes it → "aa aa", matching canonical greedy BPE.
    val wc = Seq(("aaaa", 1L)).toDF("word", "wcnt")
    val rules = Bpe.bpeTrainFromCounts(wc, merges = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(rules === Seq((1L, "a", "a", 3L))) // 3 adjacent positions counted
    val seg = Bpe.bpeSegmentsFromCounts(wc, merges = 1).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3))).toSeq
    assert(seg === Seq(("aaaa", 2L, "aa aa")))
  }

  test("bpe stops early when pairs are exhausted instead of wiping the vocabulary") {
    val wc = Seq(("ab", 2L)).toDF("word", "wcnt")
    // round 1 merges (a,b); round 2 has no pairs left → stop, state intact
    val rules = Bpe.bpeTrainFromCounts(wc, merges = 3).collect()
    assert(rules.length === 1)
    val seg = Bpe.bpeSegmentsFromCounts(wc, merges = 3).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3))).toSeq
    assert(seg === Seq(("ab", 1L, "ab")))
    // merges = 0 is a no-op training run, not an error
    assert(Bpe.bpeTrainFromCounts(wc, merges = 0).collect().isEmpty)
  }

  test("driver and distributed merge loops are in lockstep at merges=64") {
    // The production-vocab strategy: the driver loop (incremental pair
    // counts + lazy-deletion heap) must produce EXACTLY the distributed
    // loop's rules and final segmentations, deep into the merge sequence
    // where exhaustion, ties and run-merging have all occurred. The
    // distributed loop is what the SQL oracle mirrors, so this equality
    // extends the oracle's reach to the driver path at any merge count.
    import org.apache.spark.sql.functions.{col, count, explode, lit}
    val wc = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(graft.functions.TextFunctions.tokenize(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("wcnt"))
    val (dRules, dState) = Bpe.trainLoopDriver(wc, 64)
    val (xRules, xState) = Bpe.trainLoopDistributed(wc, 64)
    val dr = dRules.collect().map(_.toString).toSeq
    assert(dr === xRules.collect().map(_.toString).toSeq)
    assert(dr.nonEmpty)
    assert(dState.orderBy("word").collect().map(_.toString).toSeq ===
           xState.orderBy("word").collect().map(_.toString).toSeq)
  }

  test("bpe_train on the corpus is deterministic across invocations") {
    val a = Bpe.bpeTrain(spark, sf0001, merges = 4).collect().map(_.toString).toSeq
    val b = Bpe.bpeTrain(spark, sf0001, merges = 4).collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.length === 4)
  }

  test("bpe_fertility reconciles with the segment table and tiles the corpus") {
    import org.apache.spark.sql.functions.{col, explode}
    val rows = Bpe.bpeFertility(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val idx = rows.head.schema.fieldNames.zipWithIndex.toMap
    // replay from bpeEncode + per-(lang, word) counts
    val pieces = Bpe.bpeEncode(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val lw = graft.sources.Tables.documents(spark, sf0001)
      .select(col("lang"),
        explode(graft.functions.TextFunctions.tokenize(col("text"))).as("word"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byLang = lw.groupBy(_._1)
    rows.foreach { r =>
      val lang = r.getString(idx("lang"))
      val ws = byLang(lang).map(_._2)
      assert(r.getLong(idx("n_words")) === ws.length.toLong)
      assert(r.getLong(idx("n_pieces")) === ws.map(pieces).sum)
      assert(r.getLong(idx("n_chars")) === ws.map(_.length.toLong).sum)
      val fert = r.getDouble(idx("fertility"))
      assert(fert >= 1.0, "every word is at least one piece")
      assert(math.abs(fert - ws.map(pieces).sum.toDouble / ws.length) <= 5e-5)
      assert(r.getDouble(idx("chars_per_piece")) >= 1.0, "a piece has at least one char")
    }
    // every corpus token is attributed to exactly one language row
    assert(rows.map(_.getLong(idx("n_words"))).sum === lw.length.toLong)
  }

  test("bpeCoverage: byte-fallback fires on a foreign alphabet; merge coverage on known text") {
    import org.apache.spark.sql.functions._
    // train: latin text with one dominant bigram so a merge IS learned;
    // eval: one doc reusing the train alphabet (covered by merges, zero
    // fallback) and one doc in a foreign alphabet (every char unseen →
    // pure byte fallback, costed in UTF-8 bytes).
    val train = Seq((1L, "en", "abab abab abab cd"), (2L, "en", "abab cd cd"))
      .toDF("doc_id", "lang", "text")
    val eval = Seq((10L, "en", "abab abab"), (20L, "ru", "жжж жжж"))
      .toDF("doc_id", "lang", "text")
    val got = Bpe.bpeCoverageFrom(train, eval, merges = 6)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    // 'en' eval: "abab" fully merged after (a,b)->(ab)->(abab)-style rounds
    val (enPieces, enChars, enCov, enFb, enFbRate) = got("en")
    assert(enChars === 8L)
    assert(enCov === 1.0, s"train-alphabet text must be fully merge-covered, got $enCov")
    assert(enFb === 0L && enFbRate === 0.0)
    // 'ru' eval: no char of 'ж' ever seen in train → every piece is a
    // single unseen char; UTF-8 'ж' is 2 bytes, 6 chars → 12 bytes
    val (ruPieces, ruChars, ruCov, ruFb, ruFbRate) = got("ru")
    assert(ruPieces === 6L && ruChars === 6L)
    assert(ruCov === 0.0)
    assert(ruFb === 12L, s"expected 12 fallback bytes (6 × 2-byte ж), got $ruFb")
    assert(ruFbRate === 1.0)
  }
}
