package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("positions covered by corpus-duplicated trigrams are removed, order preserved") {
    // "x y z" appears in docs 1 and 2 → duplicated; everything else unique
    val docs = Seq(
      (1L, "p q x y z r"),
      (2L, "s x y z t u"),
      (3L, "v w only here")
    ).toDF("id", "txt")
    val out = SpanDedup.removeDuplicatedSpans(docs, col("id"), col("txt"), n = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_kept").as[(Long, Long)].collect().toSeq
    // doc1 keeps p,q,r (x,y,z covered); doc2 keeps s,t,u; doc3 keeps all 4
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 4L)))
  }

  test("within-document repetition is also removed") {
    val docs = Seq((1L, "a b c d a b c"), (2L, "noise words here")).toDF("id", "txt")
    // "a b c" occurs twice in doc 1 → starts 0 and 4 → covers 0,1,2,4,5,6 → keeps "d"
    val kept = SpanDedup.removeDuplicatedSpans(docs, col("id"), col("txt"), n = 3)
      .where(col("doc_id") === 1).select("n_kept").as[Long].head()
    assert(kept == 1L)
  }

  test("fully-duplicated documents stay as n_kept = 0 rows (md5 of empty); " +
      "survivors match the reassembled text") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "k l m n")).toDF("id", "txt")
    val out = SpanDedup.removeDuplicatedSpans(docs, col("id"), col("txt"), n = 3)
      .select("doc_id", "n_kept", "kept_md5").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    val emptyMd5 = spark.sql("SELECT md5('')").as[String].head()
    val fullMd5 = spark.sql("SELECT md5('k l m n')").as[String].head()
    // the fully-deduplicated docs 1 and 2 must still APPEAR — on a corpus
    // where every span is duplicated the report would otherwise be empty
    assert(out == Seq((1L, 0L, emptyMd5), (2L, 0L, emptyMd5),
      (3L, 4L, fullMd5)))
  }

  test("short documents (< n tokens) are never removed") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "")).toDF("id", "txt")
    val out = SpanDedup.removeDuplicatedSpans(docs, col("id"), col("txt"), n = 3)
      .select("doc_id", "n_kept").as[(Long, Long)].collect().toSeq.sorted
    // bigrams can't form a trigram start; both docs keep their 2 tokens
    assert(out == Seq((1L, 2L), (2L, 2L)))
  }
}
