package graft.sample

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class GroupSplitSpec extends SparkSpec {
  import spark.implicits._

  test("group-hash split: every group lands in exactly one split (no leakage)") {
    val df = graft.Tables.orders(spark, sf)
      .withColumn("b", TextFunctions.splitBucket(col("o_custkey")))
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
    val multi = df.groupBy("o_custkey")
      .agg(countDistinct("split").as("ns")).where(col("ns") > 1).count()
    assert(multi == 0)
  }

  test("assignment is content-stable: repartitioning never moves a group") {
    val a = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"), TextFunctions.splitBucket(col("o_custkey")).as("b"))
      .distinct().as[(Long, Long)].collect().toMap
    val b = graft.Tables.orders(spark, sf).repartition(13)
      .select(col("o_custkey"), TextFunctions.splitBucket(col("o_custkey")).as("b"))
      .distinct().as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
