package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine column function matches a scalar double fold") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-3.0f, 2.0f, 0.5f)
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    val got = df.collect()(0).getDouble(0)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.zip(b).foreach { case (x, y) =>
      dot += x.toDouble * y.toDouble
      na += x.toDouble * x.toDouble
      nb += y.toDouble * y.toDouble
    }
    assert(got === dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  test("knnBrute: k neighbors per probe, ranked by descending cosine, no self") {
    val out = Similarity.knnBrute(spark, sf0001, numProbes = 5, k = 3).collect()
    val byProbe = out.groupBy(_.getLong(0))
    assert(byProbe.keySet === (0L until 5L).toSet)
    byProbe.values.foreach { rows =>
      assert(rows.length === 3)
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getDouble(2)).toSeq === sorted.map(_.getDouble(2)).sortBy(-_).toSeq)
      assert(!rows.exists(r => r.getLong(1) === r.getLong(0))) // self excluded
    }
  }

  test("annHyperplane: results are a subset of correct cosine ordering, decent recall") {
    val exact = Similarity.knnBrute(spark, sf0001, numProbes = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annHyperplane(spark, sf0001, numProbes = 10, k = 5, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann intersect exact).size.toDouble / exact.size
    // 4-bit buckets scan ~1/16 of the corpus; random-vector recall is modest
    // but must be far above chance (500 vecs → chance ≈ 5/500 = 1%).
    assert(recall > 0.15, s"ANN recall $recall suspiciously low")
    assert(ann.nonEmpty)
  }

  test("ivfSearch: trained codebook + nprobe=2 beats the untrained nprobe=1 recall") {
    val exact = Similarity.knnBrute(spark, sf0001, numProbes = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(iters: Int, nprobe: Int): Double = {
      val got = Similarity.ivfSearch(spark, sf0001, numProbes = 10, k = 5,
          iters = iters, nprobe = nprobe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect exact).size.toDouble / exact.size
    }
    // nprobe=2 must recover neighbors a single cell misses (same codebook).
    val oneCell = recallOf(iters = 3, nprobe = 1)
    val twoCells = recallOf(iters = 3, nprobe = 2)
    assert(twoCells >= oneCell,
      s"nprobe=2 regressed recall: $twoCells < $oneCell")
    assert(twoCells > 0.3, s"trained IVF recall $twoCells suspiciously low")

    // Training must BALANCE the partition: the untrained first-16 codebook
    // leaves degenerate cells (one near-corpus-sized cell makes nprobe=1
    // recall look great while scanning half the data — the anti-scale
    // shape). The bound that matters at 100 TB is the max cell fraction,
    // i.e. the worst-case per-probe scan cost.
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    def maxCellFraction(iters: Int): Double = {
      val cents =
        if (iters == 0)
          e.filter(col("vec_id") < 16)
            .select(col("vec_id").cast("int").as("cent_id"), col("embedding").as("cemb"))
        else Similarity.kmeansCodebook(e, 16, iters)
      val sizes = Similarity.assignCells(e, cents)
        .groupBy("cell").count().collect().map(_.getLong(1))
      sizes.max.toDouble / sizes.sum
    }
    val untrainedMax = maxCellFraction(0)
    val trainedMax = maxCellFraction(3)
    assert(trainedMax < untrainedMax,
      s"k-means failed to balance cells: max fraction $trainedMax >= $untrainedMax")

    val ivf = Similarity.ivfSearch(spark, sf0001, numProbes = 10, k = 5).collect()
    ivf.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to rows.length))
    }
    // repeated run is bit-identical (deterministic k-means + tie-breaks)
    val again = Similarity.ivfSearch(spark, sf0001, numProbes = 10, k = 5).collect()
    assert(again.map(_.toString).sorted.toSeq === ivf.map(_.toString).sorted.toSeq)
  }

  test("signBucket produces one bit per leading dimension") {
    val df = Seq(Seq(1.0f, -2.0f, 0.0f, 5.0f)).toDF("v")
      .select(VectorFunctions.signBucket(col("v"), 4).as("b"))
    assert(df.collect()(0).getString(0) === "1011") // 0.0 counts as positive
  }
}
