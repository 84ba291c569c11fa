package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("below-k sets estimate exactly (the sketch IS the set)") {
    val df = (1 to 40).map(i => ("a", i.toLong)).toDF("s", "v")
    val sk = KmvSketch.sketch(df, col("s"), col("v"), 128)
    val est = KmvSketch.estimate(sk, 128).as[(String, Long)].collect()
    assert(est === Array(("a", 40L)))
  }

  test("estimate lands within 25% of the true cardinality at k=128") {
    val df = (1 to 20000).map(i => ("a", i.toLong)).toDF("s", "v")
    val sk = KmvSketch.sketch(df, col("s"), col("v"), 128)
    val est = KmvSketch.estimate(sk, 128).as[(String, Long)].head()._2
    assert(math.abs(est - 20000L) < 5000L, s"estimate $est too far from 20000")
  }

  test("sketch of a union equals the merged sketches (mergeability)") {
    val a = (1 to 5000).map(i => ("u", i.toLong))
    val b = (3000 to 8000).map(i => ("u", i.toLong))
    val direct = KmvSketch.sketch((a ++ b).toDF("s", "v"), col("s"), col("v"), 64)
      .select("h").as[Long].collect().sorted
    val skA = KmvSketch.sketch(a.toDF("s", "v"), col("s"), col("v"), 64)
    val skB = KmvSketch.sketch(b.toDF("s", "v"), col("s"), col("v"), 64)
    val merged = skA.select("h").union(skB.select("h")).distinct()
      .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
      .where(col("rn") <= 64).select("h").as[Long].collect().sorted
    assert(direct === merged)
  }

  test("duplicates do not move the estimate (distinct semantics)") {
    val once = (1 to 3000).map(i => ("a", i.toLong))
    val dup = once ++ once ++ once
    val e1 = KmvSketch.estimate(
      KmvSketch.sketch(once.toDF("s", "v"), col("s"), col("v"), 128), 128)
      .as[(String, Long)].head()._2
    val e3 = KmvSketch.estimate(
      KmvSketch.sketch(dup.toDF("s", "v"), col("s"), col("v"), 128), 128)
      .as[(String, Long)].head()._2
    assert(e1 === e3)
  }
}
