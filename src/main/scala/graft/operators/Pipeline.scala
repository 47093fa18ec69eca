package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-set export — the composition every operator in the
  * dedup/quality/decontamination family exists to serve, as ONE query:
  *
  *  1. start from the train shard (`doc_id % 10 != 0`; the eval shard is
  *     held out by definition);
  *  2. keep one canonical document per near-dup cluster
  *     ([[Dedup.dedupClusters]] — LSH candidates + exact verification +
  *     connected components, canonical = smallest reachable doc_id);
  *  3. apply the quality floor ([[TextAnalysis.qualityScore]], on the
  *     rounded score so both engines compare identical values);
  *  4. drop benchmark-contaminated documents
  *     ([[Dedup.decontaminationPairs]] — train docs containing ≥ 60% of
  *     any eval doc's n-grams).
  *
  * Every stage is itself an oracle-checked operator, so the composition's
  * oracle is the same CTEs joined — one WITH chain, nested-WITH blocks for
  * the self-contained stages. Output: `(doc_id, quality)` of the export.
  *
  * Scale: the stages share scan shapes but no operator here adds anything
  * beyond its standalone plan — clusters and containment are
  * candidate-bounded joins, quality is scan-side, and the final exclusion
  * joins are broadcast-able key sets. */
object Pipeline {

  def corpusExport(spark: SparkSession, sfDir: String,
                   qualityMin: Double = 0.7): DataFrame = {
    // Non-canonical = labeled with a smaller reachable doc_id. Using the
    // raw component labels (not dedupClusters' presentation output) skips
    // a full-corpus cluster_size window this query would discard.
    val pairs = Dedup.minhashPairsUnordered(spark, sfDir)
    val nonCanonical = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .filter(col("l") =!= col("v"))
      .select(col("v").as("doc_id"))
    // unordered stage forms throughout: presentation sorts below the
    // export's joins/distinct would be pure wasted work
    val quality = TextAnalysis.qualityUnordered(spark, sfDir)
    val contaminated = Dedup.decontaminationUnordered(spark, sfDir)
      .select(col("train_id").as("doc_id"))
      .distinct()
    quality
      .filter(col("doc_id") % 10 =!= 0)
      .filter(col("quality") >= qualityMin)
      .join(nonCanonical, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }
}
