package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact per-group weighted median, bucket-pruned for scale.
  *
  * The textbook formulation — cumulative-weight window over every row of
  * a group — funnels the whole fact table through #groups window
  * partitions: with a handful of groups that is a handful of tasks, a
  * non-starter at 100 TB. Two exact phases avoid it:
  *
  *   1. bucket rows by value (`floor(v / bucketWidth)`), aggregate weight
  *      per (group, bucket) — an ordinary partial-aggregated shuffle at
  *      full parallelism, producing a buckets-sized table;
  *   2. on that tiny table, find each group's CROSSING bucket (first
  *      cumulative weight ≥ half the total) and the weight before it;
  *      then re-scan ONLY the crossing bucket's rows (a broadcast
  *      semi-ish join keeps the filter on the scan side), seed the
  *      in-bucket cumulative window with the carried offset, and pick
  *      the crossing row with min_by.
  *
  * Output is bit-identical to the naive window formulation (the DuckDB
  * oracle runs exactly that, so gate equality proves the rewrite); the
  * group-partitioned window now touches ~1/#buckets of the data.
  * Weights must be ≥ 1 so the cumulative sum is strictly increasing and
  * the crossing row unique; `ord` must be a unique per-row tiebreak.
  */
object WeightedMedian {

  def weightedMedian(df: DataFrame, grp: Column, v: Column, wt: Column,
                     ord: Column, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // enforce the documented contract at execution time: weights must be
    // integral and ≥ 1, else the cumulative sum is not strictly increasing
    // and the crossing row is ambiguous — fail loudly instead of silently
    // truncating (0.9 → 0) and selecting a wrong row
    val base = df.select(grp.as("grp"), v.as("v"), wt.cast("long").as("wt"),
        ord.as("ord"), wt.cast("double").as("_wt_raw"))
      .where(assert_true(
        col("_wt_raw") >= 1.0 && col("_wt_raw") === col("wt").cast("double"),
        lit("weightedMedian: weights must be integral and >= 1")).isNull)
      .drop("_wt_raw")
      .withColumn("bkt", floor(col("v") / bucketWidth).cast("long"))
    val perBucket = base.groupBy(col("grp"), col("bkt"))
      .agg(sum(col("wt")).as("bw"))
    val wB = Window.partitionBy(col("grp")).orderBy(col("bkt"))
    val cum = perBucket.withColumn("cumb", sum(col("bw")).over(wB))
    val tot = perBucket.groupBy(col("grp")).agg(sum(col("bw")).as("tw"))
    // first bucket whose cumulative weight crosses half; `before` is the
    // exact cumulative weight entering it
    val crossing = cum.join(tot, "grp")
      .where(col("cumb") * 2 >= col("tw"))
      .groupBy(col("grp"))
      .agg(min(struct(col("bkt"), col("cumb"), col("bw"))).as("x"),
        min(col("tw")).as("tw"))
      .select(col("grp"), col("x.bkt").as("bkt"),
        (col("x.cumb") - col("x.bw")).as("before"), col("tw"))
    val wS = Window.partitionBy(col("grp")).orderBy(col("v"), col("ord"))
    base.join(broadcast(crossing), Seq("grp", "bkt"))
      .withColumn("cw", col("before") + sum(col("wt")).over(wS))
      .where(col("cw") * 2 >= col("tw"))
      .groupBy(col("grp"))
      .agg(min_by(col("v"), col("cw")).as("w_median"),
        min(col("tw")).as("total_weight"))
  }

  /** Bucket-pruned exact two-middle-rank selection: per group, the sum of
    * the values at ranks `(n+1) DIV 2` and `n DIV 2 + 1` in `(v, ord)`
    * order — the even-n-safe integer "median at 2×" rule (odd n: twice
    * the middle value; even n: lower middle + upper middle, so no float
    * interpolation ever happens). Same two-phase shape as
    * [[weightedMedian]]: bucket counts at full parallelism, crossing
    * buckets located on the tiny per-bucket table, then ONLY the (at most
    * two per group, usually one) buckets containing a target rank are
    * re-scanned, with the in-bucket row_number window partitioned by
    * (group, bucket) — never a full-group sort.
    */
  def medianRank2(df: DataFrame, grp: Column, v: Column, ord: Column,
                  bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val base = df.select(grp.as("grp"), v.as("v"), ord.as("ord"))
      .withColumn("bkt", floor(col("v") / bucketWidth).cast("long"))
    val perBucket = base.groupBy(col("grp"), col("bkt"))
      .agg(count(lit(1)).as("c"))
    val wB = Window.partitionBy(col("grp")).orderBy(col("bkt"))
    val cum = perBucket
      .withColumn("cumc", sum(col("c")).over(wB))
      .withColumn("before", col("cumc") - col("c"))
    val tot = perBucket.groupBy(col("grp")).agg(sum(col("c")).as("n"))
      .withColumn("r1", expr("(n + 1) DIV 2"))
      .withColumn("r2", expr("n DIV 2 + 1"))
    // buckets holding either target rank (adjacent buckets when the two
    // middles straddle a boundary), with the carried rank offset
    val sel = cum.join(tot, "grp")
      .where((col("before") < col("r1") && col("cumc") >= col("r1")) ||
        (col("before") < col("r2") && col("cumc") >= col("r2")))
      .select(col("grp"), col("bkt"), col("before"), col("r1"), col("r2"))
    val wS = Window.partitionBy(col("grp"), col("bkt"))
      .orderBy(col("v"), col("ord"))
    base.join(broadcast(sel), Seq("grp", "bkt"))
      .withColumn("rn", col("before") + row_number().over(wS))
      .groupBy(col("grp"))
      .agg((max(when(col("rn") === col("r1"), col("v"))) +
        max(when(col("rn") === col("r2"), col("v")))).as("med2"))
  }
}
