package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.sources.Tables

/** Similarity search over the `embeddings` table
  * (`embedding: ArrayType(FloatType)`, 64-dim).
  *
  * Two paths, per the standard ANN playbook:
  *  - `knnBrute`: exact top-k for a (small, broadcast) probe set — cost is
  *    O(|probes| × N), embarrassingly parallel over the corpus, and the
  *    correctness baseline for everything else. At 100 TB the corpus side
  *    streams; only probes and the per-partition top-k heaps move.
  *  - `annHyperplane`: LSH-bucketed approximate search — random-hyperplane
  *    sign buckets shrink the scanned fraction to ~1/2^bits per probe;
  *    recall measured against `knnBrute` in the test suite.
  */
object Similarity {

  /** Exact cosine top-k for each probe vector (probes = lowest `numProbes`
    * vec_ids, a stand-in for an external query set). The probe side is tiny
    * → broadcast; the join is a BroadcastNestedLoopJoin over the corpus with
    * rank pruned per probe partition. Self-matches excluded. */
  def knnBrute(spark: SparkSession, sfDir: String,
               numProbes: Int = 10, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    val scored = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
              VectorFunctions.cosine(col("probe_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .orderBy("probe_id", "rnk")
  }

  /** IVF (inverted-file) approximate nearest neighbors — the classic
    * coarse-quantizer ANN layout: every vector is assigned to its nearest
    * centroid cell (centroids = the first `numCentroids` vectors, a
    * deterministic training-free codebook); a probe scans only its own cell.
    * At scale the corpus is partitioned BY cell, so a probe touches one
    * partition instead of the whole corpus — the standard billion-vector
    * layout (IVF from the FAISS lineage). nprobe=1 here; recall vs
    * `knnBrute` is measured in the test suite. Fully deterministic
    * (cosine ties broken by centroid id, then vec_id) → SQL-oracle-checked. */
  def ivfSearch(spark: SparkSession, sfDir: String,
                numProbes: Int = 10, k: Int = 5, numCentroids: Int = 16): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val cents = e.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    val byVec = Window.partitionBy("vec_id")
      .orderBy(col("cc").desc, col("cent_id").asc)
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
              VectorFunctions.cosine(col("embedding"), col("cent_emb")).as("cc"))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    val probes = assigned.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"), col("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
              VectorFunctions.cosine(col("probe_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .orderBy("probe_id", "rnk")
  }

  /** Approximate nearest neighbors via random-hyperplane LSH: corpus and
    * probes are bucketed by the sign pattern of `bits` random projections
    * (deterministic seed); each probe scans only its bucket
    * (~N/2^bits vectors) and takes exact cosine top-k within it.
    * Trades recall for a 2^bits scan reduction — the scale path when the
    * probe set is itself large. */
  /** The fixed random-hyperplane codebook (deterministic seed). Shared by
    * `annHyperplane` and the DuckDB oracle generator in SparkEntry, which
    * embeds these exact doubles as SQL literals (shortest round-trip
    * decimal form), so both engines compute identical sign buckets. */
  def hyperplanes(bits: Int = 6, dim: Int = 64, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  def annHyperplane(spark: SparkSession, sfDir: String,
                    numProbes: Int = 10, k: Int = 5,
                    bits: Int = 6, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(bits, dim, seed)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
              VectorFunctions.hyperplaneBucket(col("embedding"), planes).as("bkt"))
    val probes = e.filter(col("vec_id") < numProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"), col("bkt"))
    val scored = e.join(broadcast(probes), Seq("bkt"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
              VectorFunctions.cosine(col("probe_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .orderBy("probe_id", "rnk")
  }
}
