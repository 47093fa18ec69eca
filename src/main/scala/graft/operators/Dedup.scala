package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import graft.sources.Tables

/** Deduplication operators for training-data pipelines: exact (hash groupBy),
  * exact n-gram Jaccard (inverted-index join), MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design (100 TB): every variant here is join-based on a compact key
  * (digest, shingle, band hash, sign bucket) — there is NO all-pairs
  * comparison and NO driver-side collect anywhere. Candidate generation
  * shuffles O(docs × shingles-or-bands) small rows; verification touches only
  * candidate pairs. Hot shingles/buckets are the skew risk at scale: cap
  * bucket width (`maxBucket`) so a degenerate key cannot produce a quadratic
  * bucket — the standard guard in production LSH dedup.
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

  /** Exact word-trigram Jaccard near-dup pairs via inverted-index join:
    * doc→shingle exploded, self-joined on shingle (the "inverted index"),
    * intersection counted per pair, Jaccard from set sizes. Exact — the
    * ground truth the approximate variants are measured against.
    * Jaccard is a ratio of exact integers → deterministic double. */
  def ngramJaccardPairs(spark: SparkSession, sfDir: String, n: Int = 3,
                        threshold: Double = 0.8): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingleSet(col("text"), n).as("sh"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).cast("bigint").as("n_sh"))
    val exploded = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    val inter = exploded.as("a")
      .join(exploded.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
              (col("inter").cast("double") /
               (col("sa.n_sh") + col("sb.n_sh") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
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

  /** MinHash signature of a shingle set (library form, used by tests and the
    * typed API). */
  private[graft] def minhashSignature(shingles: Iterable[String],
                                          params: Array[(Long, Long)]): Array[Long] = {
    val sig = Array.fill(params.length)(Long.MaxValue)
    shingles.foreach { s =>
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

  /** MinHash + LSH banding near-dup pairs:
    * shingle → minhash signature (numBands × rowsPerBand) → band hash →
    * bucket join → Jaccard verification on the candidate pairs only.
    * With b=32, r=4 the detection probability at j=0.8 is
    * 1-(1-0.8⁴)³² ≈ 0.9999 — effectively exhaustive at the threshold while
    * examining a tiny fraction of the n² pair space. */
  def minhashLshPairs(spark: SparkSession, sfDir: String, n: Int = 3,
                      numBands: Int = 32, rowsPerBand: Int = 4,
                      threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    import spark.implicits._
    val params = minhashParams(numBands * rowsPerBand)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingleSet(col("text"), n).as("sh"))
      .as[(Long, Seq[String])]

    // (band, bandHash, doc_id) — the LSH bucket stream.
    val bands = docs.flatMap { case (id, sh) =>
      val sig = minhashSignature(sh, params)
      (0 until numBands).iterator.map { b =>
        var h = 1125899906842597L
        var r = 0
        while (r < rowsPerBand) { h = h * 31 + sig(b * rowsPerBand + r); r += 1 }
        (b, h, id)
      }
    }.toDF("band", "bhash", "doc_id")

    // Guard against degenerate buckets before the self-join (skew control).
    val bounded = bands
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bhash")))
      .filter(col("bsize") <= maxBucket)
      .drop("bsize")

    val candidates = bounded.as("x")
      .join(bounded.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    verifyJaccard(spark, sfDir, candidates, n, threshold)
  }

  /** Join candidate pairs back to their shingle sets and keep those at or
    * above the Jaccard threshold (array_intersect is codegen'd). */
  private def verifyJaccard(spark: SparkSession, sfDir: String, candidates: DataFrame,
                            n: Int, threshold: Double): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingleSet(col("text"), n).as("sh"))
    candidates
      .join(docs.as("da"), col("doc_a") === col("da.doc_id"))
      .join(docs.as("db"), col("doc_b") === col("db.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("da.sh"), col("db.sh"))).cast("double") /
         (size(col("da.sh")) + size(col("db.sh"))
           - size(array_intersect(col("da.sh"), col("db.sh")))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash of a token multiset: per-bit vote of FNV-1a token
    * hashes. Deterministic. */
  private[graft] def simhash64(tokens: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = TextAnalysis.stringHash64(t)
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
    * bands (any pair within Hamming distance 3 shares at least one exact
    * band by pigeonhole... with 4 bands distance ≤3 guarantees a match),
    * verified with `bit_count(a^b) <= maxHamming` — a built-in, codegen'd
    * popcount. */
  def simhashPairs(spark: SparkSession, sfDir: String,
                   maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokenize(col("text")).as("ws"))
      .as[(Long, Seq[String])]
    val sigs = docs.map { case (id, ws) => (id, simhash64(ws)) }.toDF("doc_id", "sig")

    val bands = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), (shiftrightunsigned(col("sig"), b * 16) % 65536).as("bhash"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bhash").as("bhash"))

    val pairs = bands.as("x")
      .join(bands.as("y"),
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
