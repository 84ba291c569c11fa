package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning contract (the star-join scale path): a fact
  * table partitioned on the join key, joined to a dimension with a
  * selective filter, must scan ONLY the fact partitions matching the
  * surviving dimension keys — Spark injects a runtime `dynamicpruning`
  * subquery into the fact scan. At 100 TB this is the difference between
  * reading one date partition and reading the whole table when the date
  * bound arrives via a dimension filter instead of a literal. */
class DynamicPruningSpec extends SparkSpec {

  test("dim-filtered join prunes fact partitions at runtime (dynamicpruning in scan)") {
    val dir = s"/tmp/graft_dpp_${sys.props.getOrElse("user.name", "ci")}"
    // fact: orders partitioned by a coarse status key; dim: tiny status table
    graft.Tables.orders(spark, sf)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val fact = spark.read.parquet(dir)
    import spark.implicits._
    // the dim must be a real relation: a local Seq constant-folds its
    // filter away (ConvertToLocalRelation) and the pruning rule then sees
    // no selective predicate on the build side
    Seq(("O", "open"), ("F", "filled"), ("P", "pending"))
      .toDF("status", "label")
      .write.mode("overwrite").parquet(s"$dir-dim")
    val dim = spark.read.parquet(s"$dir-dim")
    val joined = fact
      .join(dim, col("o_orderstatus") === col("status"))
      .where(col("label") === "open") // selective dim filter, not a fact literal
      .agg(count(lit(1)).as("n"))
    val n = joined.as[Long].head()
    assert(n > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning subquery:\n${plan.take(3000)}")
  }
}
