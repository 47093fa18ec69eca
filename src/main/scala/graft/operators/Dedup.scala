package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import graft.sources.Tables

/** Deduplication operators for training-data pipelines: exact (hash groupBy),
  * exact n-gram Jaccard (prefix-filtered similarity self-join), MinHash+LSH,
  * SimHash, and embedding-cosine near-dup.
  *
  * Scale design (100 TB): every variant here is join-based on a compact key
  * (digest, shingle, band hash, sign bucket) — there is NO all-pairs
  * comparison and NO driver-side collect anywhere. Candidate generation
  * shuffles O(docs × shingles-or-bands) small rows; verification touches only
  * candidate pairs. The exact Jaccard join additionally applies the
  * prefix-filtering principle (SSJoin/AllPairs/PPJoin family): only the
  * rarest `|x| - ceil(t·|x|) + 1` shingles of each document are indexed, so
  * hot shingles — the quadratic skew risk — almost never enter the join.
  *
  * Engine note: shingles are built from a posexplode'd token stream with
  * window `lead`, NOT from nested array higher-order functions. Catalyst's
  * array lambdas (`transform`/`filter`/`slice`) evaluate interpreted and are
  * re-evaluated per enclosing expression copy; the token-stream form keeps
  * the per-document tokenizer to exactly one evaluation and stays inside
  * codegen'd window/join operators. (Measured 28s → sub-second at sf0.1.)
  */
object Dedup {

  /** Exact dedup: group by content fingerprint, keep the smallest doc_id as
    * canonical. Shuffles 32-byte digests, not documents. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), fingerprintMd5(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups", "fp")
      .orderBy("keep_id")

  /** Distinct word-`n`-gram postings `(doc_id, s)` of every document:
    * scan → `graft_shingles` (native codegen kernel, one compiled pass per
    * document, already distinct) → explode. Zero shuffles — the postings
    * stream comes straight off the scan. */
  private[graft] def shinglePostings(spark: SparkSession, sfDir: String, n: Int): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
              explode(call_function("graft_shingles", col("text"), lit(n))).as("s"))

  /** Exact Jaccard ≥ threshold from candidate pairs + the postings stream:
    * |A∩B| counted via a two-step hash join on (doc, shingle) — no document
    * arrays are materialized, only candidate pairs are touched. */
  private def verifyByPostings(candidates: DataFrame, postings: DataFrame,
                               sizes: DataFrame, threshold: Double): DataFrame = {
    val inter = candidates
      .join(postings.as("pa"), col("doc_a") === col("pa.doc_id"))
      .join(postings.as("pb"),
        col("doc_b") === col("pb.doc_id") && col("pa.s") === col("pb.s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
              (col("inter").cast("double") /
               (col("sa.n_sh") + col("sb.n_sh") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact word-trigram Jaccard near-dup pairs, prefix-filtered:
    *
    *  1. postings (doc, shingle) → document-frequency per shingle;
    *  2. canonical order = (df asc, shingle asc): rarest shingles first;
    *  3. index only each doc's prefix of length |x| − ⌈t·|x|⌉ + 1 — any pair
    *     with J ≥ t must collide inside the prefixes (prefix-filtering
    *     principle), so the candidate set is provably lossless;
    *  4. size-compatibility pruning (t·|A| ≤ |B| ≤ |A|/t);
    *  5. exact Jaccard verification on candidates only.
    *
    * The ε slack on t·|x| guards against binary-float rounding of the
    * threshold pushing ceil/compare the wrong way — it can only ADD
    * candidates, never drop a true pair. Ground truth for the approximate
    * variants; `dedup_minhash` shares its oracle. */
  def ngramJaccardPairs(spark: SparkSession, sfDir: String, n: Int = 3,
                        threshold: Double = 0.8): DataFrame =
    ngramPairsUnordered(spark, sfDir, n, threshold).orderBy("doc_a", "doc_b")

  /** [[ngramJaccardPairs]] without the presentation sort — the form other
    * operators (clustering) consume, so no global sort runs below a join. */
  private[graft] def ngramPairsUnordered(spark: SparkSession, sfDir: String, n: Int = 3,
                                         threshold: Double = 0.8): DataFrame = {
    val eps = 1e-9
    val postings = shinglePostings(spark, sfDir, n)
    val sizes = postings.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val df = postings.groupBy("s").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)
    val prefix = postings
      .join(df, "s")
      .withColumn("rk", row_number().over(byRarity))
      .join(sizes, "doc_id")
      .filter(col("rk") <= col("n_sh") - ceil(lit(threshold) * col("n_sh") - eps) + 1)
      .select("doc_id", "s", "n_sh")
    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n_sh").cast("double") >= lit(threshold) * col("a.n_sh") - eps &&
          col("a.n_sh").cast("double") >= lit(threshold) * col("b.n_sh") - eps)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyByPostings(candidates, postings, sizes, threshold)
  }

  // ---------------------------------------------------------------- MinHash

  /** Deterministic MinHash permutation parameters: h_i(x) = (a_i·x + b_i)
    * mod p over a 64-bit base hash of the shingle. Fixed seed → stable
    * signatures across runs and executors. */
  private val MinhashPrime = 2305843009213693951L // 2^61 - 1
  private[graft] def minhashParams(numHashes: Int, seed: Long = 42L): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)((math.abs(rnd.nextLong()) % (MinhashPrime - 1) + 1,
                           math.abs(rnd.nextLong()) % MinhashPrime))
  }

  /** Fold ONE shingle into a running MinHash signature (the `update` step of
    * the `graft_minhash` Catalyst aggregate — elementwise min keeps it
    * associative/commutative for partial aggregation). */
  private[graft] def minhashUpdate(sig: Array[Long], s: String,
                                   params: Array[(Long, Long)]): Unit = {
    val h = TextAnalysis.stringHash64(s) & Long.MaxValue
    var i = 0
    while (i < params.length) {
      val (a, b) = params(i)
      var v = mulModMersenne61(a, h % MinhashPrime) + b
      if (v >= MinhashPrime) v -= MinhashPrime
      if (v < sig(i)) sig(i) = v
      i += 1
    }
  }

  /** MinHash signature of a shingle set (library form, used by tests and the
    * typed API). */
  private[graft] def minhashSignature(shingles: Iterable[String],
                                          params: Array[(Long, Long)]): Array[Long] = {
    val sig = Array.fill(params.length)(Long.MaxValue)
    shingles.foreach(minhashUpdate(sig, _, params))
    sig
  }

  /** (a·b) mod (2^61-1) without overflow. For p = 2^61-1, 2^61 ≡ 1 (mod p),
    * so reduce the 128-bit product by folding its high bits: x mod p =
    * (x & (2^61-1)) + (x >> 61), repeated. */
  private def mulModMersenne61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a,b < 2^61 → product < 2^122
    val lo = a * b                   // low 64 bits
    val low61 = lo & MinhashPrime                  // x mod 2^61
    val high = (lo >>> 61) | (hi << 3)             // x >> 61 (< 2^61)
    var s = low61 + high
    if (s >= MinhashPrime) s -= MinhashPrime
    s
  }

  /** Distinct word-n-gram shingles computed in compiled Scala — the typed
    * counterpart of `shinglePostings` for per-document signature functions
    * (bit-identical tokenization: `tokenizeScala` == `tokenize`). */
  private[graft] def shinglesScala(text: String, n: Int): Array[String] = {
    val ws = tokenizeScala(text)
    if (ws.length < n) Array.empty
    else {
      val seen = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i + n <= ws.length) {
        val sb = new StringBuilder(ws(i))
        var j = 1
        while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
        seen += sb.result()
        i += 1
      }
      seen.toArray
    }
  }

  /** MinHash + LSH banding near-dup pairs:
    * shingle postings → `graft_minhash` AGGREGATE (per-doc signature with
    * map-side partial aggregation — the shuffle carries 128-long sketches,
    * not shingles) → `graft_bands` band hashes → bucket join → exact
    * Jaccard verification on the candidate pairs only.
    * With b=32, r=4 the detection probability at j=0.8 is
    * 1-(1-0.8⁴)³² ≈ 1 − 5·10⁻⁸ — effectively exhaustive at the threshold
    * while examining a tiny fraction of the n² pair space (the scale path
    * when even the prefix-filtered exact join is too wide).
    *
    * `maxBucket` is the skew guard for degenerate band buckets. The pair
    * OUTPUT of a duplicate cluster is inherently quadratic (the exact
    * oracle's too), so the default cap is high enough never to engage on
    * realistic duplication — which is what keeps this query's output equal
    * to the exact n-gram join (the shared-oracle precondition). Lowering it
    * bounds worst-case work on adversarial corpora at the cost of dropping
    * the capped buckets' pairs. */
  def minhashLshPairs(spark: SparkSession, sfDir: String, n: Int = 3,
                      numBands: Int = 32, rowsPerBand: Int = 4,
                      threshold: Double = 0.8, maxBucket: Int = 100000): DataFrame = {
    val postings = shinglePostings(spark, sfDir, n)

    // (band, bandHash, doc_id) — the LSH bucket stream, fully relational:
    // aggregate to signatures, band-hash with the compiled kernel, explode.
    val bands = postings
      .groupBy("doc_id")
      .agg(call_function("graft_minhash", col("s"),
             lit(numBands * rowsPerBand)).as("sig"))
      .select(col("doc_id"),
              posexplode(call_function("graft_bands", col("sig"),
                lit(numBands), lit(rowsPerBand))))
      .toDF("doc_id", "band", "bhash")

    // Guard against degenerate buckets before the self-join (skew control).
    val bounded = bands
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy("band", "bhash")))
      .filter(col("bsize") <= maxBucket)
      .drop("bsize")

    val candidates = bounded.as("x")
      .join(bounded.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sizes = postings.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    verifyByPostings(candidates, postings, sizes, threshold)
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------- Connected components

  /** Connected components of an undirected edge list: every vertex labeled
    * with the smallest vertex id reachable from it. Iterative minimum-label
    * propagation — each round is one shuffle join (neighbor labels) plus one
    * shuffle aggregate (per-vertex min), and convergence is detected with a
    * distributed count of changed labels, never a collect. Lineage is
    * truncated per round (`localCheckpoint`) so the plan doesn't grow with
    * the iteration count — the standard requirement for iterative DataFrame
    * algorithms (on a cluster, `spark.cleaner` reclaims the shipped blocks).
    *
    * Rounds are bounded by the component diameter. Near-dup graphs are
    * clique-ish (diameter 2–3) so this converges in a handful of rounds; for
    * adversarial long-chain graphs, the same per-round join shape extends to
    * the large-star/small-star rounds of Kiveris et al., "Connected
    * Components in MapReduce and Beyond" (SoCC'14), which need O(log² n)
    * rounds. Throws if `maxIter` is hit before fixpoint rather than return
    * a wrong labeling. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
    // Materialize the edge list BEFORE the symmetrizing self-union: `e`
    // appears twice in the union, and without this the (possibly expensive)
    // upstream pair join would execute twice.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val sym = e.union(e.select(col("dst"), col("src")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("l", col("v"))
      .localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxIter) {
      val nbrMin = sym.join(labels, col("dst") === col("v"))
        .groupBy("src").agg(min("l").as("nl"))
      val step = labels.join(nbrMin, col("v") === col("src"), "left")
        .select(col("v"), col("l"),
                least(col("l"), coalesce(col("nl"), col("l"))).as("l2"))
        .localCheckpoint(true)
      changed = step.filter(col("l2") < col("l")).count()
      labels = step.select(col("v"), col("l2").as("l"))
      rounds += 1
    }
    require(changed == 0, s"connectedComponents: no fixpoint after $maxIter rounds")
    labels
  }

  /** Duplicate-cluster assignment — the step after pair finding in any real
    * dedup pipeline: connected components over the exact near-dup pair graph
    * ([[ngramJaccardPairs]]), every document labeled with its cluster's
    * canonical representative (smallest reachable doc_id; edge-less
    * documents are their own singleton cluster) and the cluster size. */
  def dedupClusters(spark: SparkSession, sfDir: String, n: Int = 3,
                    threshold: Double = 0.8): DataFrame = {
    val pairs = ngramPairsUnordered(spark, sfDir, n, threshold)
    val labels = connectedComponents(pairs, "doc_a", "doc_b")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"))
      .join(labels, col("doc_id") === col("v"), "left")
      .select(col("doc_id"), coalesce(col("l"), col("doc_id")).as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash of a token multiset: per-bit vote of the tokens' MD5
    * lower halves (`md5Low64` == DuckDB `md5_number_lower`, which makes the
    * whole sketch SQL-oracle-expressible). Deterministic. */
  private[graft] def simhash64(tokens: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = TextAnalysis.md5Low64(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** SimHash near-dup pairs: 64-bit signature, bucketed by its four 16-bit
    * bands (pigeonhole: any pair within Hamming distance 3 agrees exactly on
    * at least one band), verified with `bit_count(a^b) <= maxHamming` — a
    * built-in, codegen'd popcount.
    *
    * `maxBucket` caps a band bucket before the self-join (skew guard). The
    * pair OUTPUT of any within-distance cluster is inherently quadratic (the
    * oracle's too), so the default cap is high enough to never engage on
    * realistic duplication; lowering it trades completeness (and oracle
    * equality) for bounded work on adversarial corpora. */
  def simhashPairs(spark: SparkSession, sfDir: String,
                   maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame = {
    import spark.implicits._
    val sigs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, simhash64(tokenizeScala(text))) }
      .toDF("doc_id", "sig")

    // Band key must be the UNSIGNED low 16 bits: a signed `% 65536` would
    // give negative keys for negative signatures in band 0 (shift 0 is a
    // no-op), silently dropping qualifying pairs that differ in bit 63.
    val bands = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
               shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bhash"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bhash").as("bhash"))

    val bounded = bands
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy("band", "bhash")))
      .filter(col("bsize") <= maxBucket)
      .drop("bsize")

    val pairs = bounded.as("x")
      .join(bounded.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .distinct()

    pairs
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------------- Embeddings

  /** Embedding-cosine near-dup pairs, sign-bucket blocked: vectors are
    * bucketed by the sign pattern of their leading dimensions (an exact,
    * deterministic blocking key), cosine is computed only within buckets.
    * Semantics: all same-bucket pairs with cosine ≥ threshold. */
  def embeddingDedupPairs(spark: SparkSession, sfDir: String,
                          signBits: Int = 8, threshold: Double = 0.3): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
              VectorFunctions.signBucket(col("embedding"), signBits).as("bkt"))
    e.as("a")
      .join(e.as("b"), col("a.bkt") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
              VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
