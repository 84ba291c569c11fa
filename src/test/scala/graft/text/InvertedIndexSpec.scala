package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c a b"),
    (2L, "b a b a"),
    (3L, "A  B\tc"), // case + whitespace-run normalization
    (4L, "c c c"),
    (5L, "")
  ).toDF("id", "txt")

  test("postings carry 0-based positions of lowercased tokens") {
    val p = InvertedIndex.postings(docs, col("id"), col("txt"))
    assert(p.where(col("doc_id") === 3).orderBy("pos")
      .select("term").as[String].collect().toSeq == Seq("a", "b", "c"))
    assert(p.where(col("doc_id") === 5).count() == 0)
    assert(p.where(col("doc_id") === 1 && col("term") === "a")
      .select("pos").as[Int].collect().sorted.toSeq == Seq(0, 3))
  }

  test("phrase search finds all and only consecutive occurrences") {
    val hits = InvertedIndex.phraseCounts(docs, col("id"), col("txt"), Seq("a", "b"))
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1: "a b" at 0 and 3; doc 2: at 1; doc 3: at 0 (after normalization)
    assert(hits == Seq((1L, 2L, 0L), (2L, 1L, 1L), (3L, 1L, 0L)))
  }

  test("three-term phrase chains adjacency joins") {
    val hits = InvertedIndex.phraseCounts(docs, col("id"), col("txt"), Seq("a", "b", "c"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc 1: "a b c" at 0; doc 3 normalizes to "a b c" too
    assert(hits == Seq((1L, 1L, 0L), (3L, 1L, 0L)))
  }

  test("a phrase term absent from the corpus yields no rows") {
    assert(InvertedIndex.phraseCounts(docs, col("id"), col("txt"), Seq("a", "zz"))
      .count() == 0)
  }
}
