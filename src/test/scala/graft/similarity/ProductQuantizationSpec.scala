package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PQ/ADC contract: codebook members quantize to themselves (ADC distance
  * 0), ranking is by summed subspace distances, ties break on neighbor id. */
class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors, m=2 subspaces × 4 dims, codebook = ids 0 and 1
  private val vecs = Seq(
    (0L, Array(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
    (1L, Array(10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0)),
    (2L, Array(0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),   // ≈ centroid 0
    (3L, Array(9.9, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0)) // ≈ centroid 1
  ).toDF("vec_id", "embedding")

  private def run() = ProductQuantization.adcTopK(
    vecs, col("vec_id"), col("embedding"),
    queryMaxId = 1, m = 2, subDim = 4, ksub = 2, k = 3)

  test("ADC distances: same-codebook-cell docs score 0, far cell scores the table distance") {
    val out = run().select("nid", "rank", "adist_micro2")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 2 encodes to centroid 0 (the query's own cell) → adist 0
    assert(out(2L)._2 == 0L)
    // docs 1 and 3 encode to centroid 1 → adist = d2(query, centroid1)
    // = 8 · (10·10⁶ micro)² = 8·10¹⁴ micro²
    assert(out(1L)._2 == 800000000000000L)
    assert(out(3L)._2 == 800000000000000L)
    // rank: doc 2 first; 1 vs 3 tie on distance breaks on nid
    assert(out(2L)._1 == 1L && out(1L)._1 == 2L && out(3L)._1 == 3L)
  }

  test("codebook and distance tables broadcast") {
    val plan = run().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  // the IVF-PQ recall proof: probing every coarse cell degenerates to
  // plain ADC over the whole corpus — cell restriction loses nothing
  test("IVF-PQ with all cells probed equals plain ADC") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "nid", "rank", "adist_micro2")
      .as[(Long, Long, Long, Long)].collect().toSet
    val ivfpq = collect(ProductQuantization.ivfPqTopK(
      emb, col("vec_id"), col("embedding"), nCells = 8, nprobe = 8,
      queryMaxId = 10, m = 8, subDim = 8, ksub = 16, k = 3))
    val adc = collect(ProductQuantization.adcTopK(
      emb, col("vec_id"), col("embedding"),
      queryMaxId = 10, m = 8, subDim = 8, ksub = 16, k = 3))
    assert(ivfpq == adc)
  }
}
