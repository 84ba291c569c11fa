package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Unigram language-model scoring — the perplexity-style quality filter
  * (CCNet-lineage): score each document by its total surprisal
  * −Σₜ ln p(t) under the corpus's own unigram distribution. Documents of
  * improbable tokens (boilerplate, codes, noise) score high; fluent text
  * scores near the corpus mean. The mean surprisal per token is the
  * monotone stand-in for LM perplexity when no trained LM is available.
  *
  * Plan shape: one explode feeds (a) the token-frequency aggregate —
  * vocabulary-sized, BROADCAST back — and (b) the scoring join; per-token
  * surprisals quantize to integer micro-nats BEFORE the per-doc sum, so
  * totals are exact integers independent of accumulation order. */
object UnigramLm {

  /** Output: (doc_id, n_tokens, surprisal_micro) — total surprisal in
    * 1e-6 nat units; mean = surprisal_micro / (1e6 · n_tokens). */
  def surprisal(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(TextFunctions.tokens(lower(text))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("total"))
    toks.join(broadcast(freq), "tok")
      .crossJoin(broadcast(total))
      .withColumn("sm",
        floor(-log(col("cnt").cast("double") / col("total").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("sm")).as("surprisal_micro"))
  }
}
