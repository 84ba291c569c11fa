package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003).
  *
  * From positional tokens, hash every `k`-gram and keep the MINIMUM hash
  * of each window of `w` consecutive gram positions. The selection is
  * LOCAL (depends only on the window's grams), which yields the paper's
  * guarantee: any substring match of at least w + k − 1 tokens produces
  * at least one shared selected fingerprint — the property the
  * [[WinnowingSpec]] property test pins against planted overlaps.
  *
  * Shape: two window passes over one doc_id exchange (k−1 leads to form
  * grams, a w-frame min to select); density ≈ 2/(w+1) of full shingling,
  * which is what makes fingerprint indexes affordable at corpus scale.
  */
object Winnowing {

  /** Distinct selected fingerprints per document. `toks` must carry
    * (idCol, posCol, tokCol) with contiguous 0-based positions per doc. */
  def fingerprints(toks: DataFrame, idCol: Column, posCol: Column,
                   tokCol: Column, k: Int, w: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val base = toks.select(idCol.as("doc_id"), posCol.as("pos"),
      tokCol.as("tok"))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val grams = (1 until k)
      .foldLeft(base.withColumn("g", col("tok"))) { (df, i) =>
        df.withColumn("g",
          concat_ws(" ", col("g"), lead(col("tok"), i).over(byPos)))
      }
    val withGram = (if (k == 1) grams.withColumn("full", lit(true))
                    else grams.withColumn("full",
                      lead(col("tok"), k - 1).over(byPos).isNotNull))
      .where(col("full")).drop("full")
      .withColumn("h",
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long"))
    val frame = byPos.rowsBetween(0, w - 1)
    withGram
      .withColumn("nw", count(lit(1)).over(frame))
      .withColumn("fp", min(col("h")).over(frame))
      .where(col("nw") === w)
      .select(col("doc_id"), col("fp")).distinct()
  }
}
