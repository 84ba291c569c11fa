package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** BM25 sparse retrieval: rank corpus documents against a set of query
  * documents by the classic Okapi BM25 score — the term-based counterpart
  * to the dense-vector search in `graft.similarity`.
  *
  * Plan shape for 100 TB: the corpus is touched exactly twice — one scan
  * builds postings `(doc, term, tf, dl)` with a single shuffle on
  * `(doc, term)`, one aggregation derives document frequencies. Everything
  * query-sided (query terms, per-term df, the corpus-level stats scalar) is
  * tiny and BROADCAST, so scoring is a map-side join over the postings
  * followed by one aggregation keyed on `(query, doc)` — no corpus
  * re-shuffle, no cartesian product. Candidate volume is inherently
  * |queries| × |docs containing a query term|; a document-frequency cutoff
  * on query terms (drop stop-terms with df > τ·N) bounds it the same way
  * the n-gram dedup bounds its inverted index.
  *
  * Cross-engine determinism: per-(query,doc,term) scores are a fixed IEEE
  * expression tree, then quantized to integer micro-units BEFORE the
  * per-pair sum — integer addition is associative, so the total is exact
  * and partition-order-independent (ties in the final ranking break on the
  * integer score, never on float noise).
  */
object Bm25 {

  /** Top-k corpus docs per query doc. Output:
    * (qid, nid, rank, score_micro) — score in 1e-6 units. */
  def topK(corpus: DataFrame, cId: Column, cText: Column,
           queries: DataFrame, qId: Column, qText: Column,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = corpus.select(cId.as("nid"),
      TextFunctions.tokens(lower(cText)).as("__toks"))
    // postings with doc length carried through (dl is functionally
    // dependent on nid — grouping by it adds no groups)
    val post = base.select(col("nid"),
        size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("tok"))
      .groupBy("nid", "dl", "tok").agg(count(lit(1)).as("tf"))
    val dft = post.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n"),
      sum(size(col("__toks")).cast("long")).as("sumdl"))
    val qterms = queries.select(qId.as("qid"),
      explode(array_distinct(TextFunctions.tokens(lower(qText)))).as("tok"))

    val tfD = col("tf").cast("double")
    val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val denom = tfD + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))
    val term = idf * (tfD * lit(k1 + 1.0)) / denom

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("nid"))
    post
      .join(broadcast(dft), "tok")
      .join(broadcast(qterms), "tok")
      .crossJoin(broadcast(stats))
      .where(col("nid") =!= col("qid"))
      .withColumn("avgdl", col("sumdl").cast("double") / col("n").cast("double"))
      .withColumn("sm", floor(term * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("qid", "nid").agg(sum(col("sm")).as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "score_micro")
  }
}
