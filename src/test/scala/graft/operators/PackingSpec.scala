package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contiguous packing contract: bin = floor(exclusive prefix / budget) in
  * key order, independent of partition layout; guards. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val toks = Seq(3L, 9L, 4L, 4L, 12L, 1L, 1L, 8L, 5L, 2L, 7L, 6L)
  private lazy val df = toks.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "n")

  private def reference(budget: Long): Map[Long, Long] = {
    val prefix = toks.scanLeft(0L)(_ + _)
    toks.indices.map(i => i.toLong -> prefix(i) / budget).toMap
  }

  test("bins match the sequential reference; oversized docs span bins") {
    for (budget <- Seq(10L, 16L, 5L)) {
      val out = Packing.packByBudget(df, col("doc_id"), col("n"), budget)
        .select("doc_id", "bin").as[(Long, Long)].collect().toMap
      assert(out == reference(budget), s"budget=$budget")
    }
    // doc with 12 tokens against budget 5 must push later docs forward
    val b5 = Packing.packByBudget(df, col("doc_id"), col("n"), 5L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(b5 == reference(5L))
  }

  test("partition-layout independent") {
    val a = Packing.packByBudget(df, col("doc_id"), col("n"), 10L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    val b = Packing.packByBudget(df.repartition(5), col("doc_id"), col("n"), 10L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("guards: positive budget, fresh bin column") {
    intercept[IllegalArgumentException](
      Packing.packByBudget(df, col("doc_id"), col("n"), 0L))
    intercept[IllegalArgumentException](
      Packing.packByBudget(df.withColumn("bin", lit(1)), col("doc_id"), col("n"), 10L))
  }
}
