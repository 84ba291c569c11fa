package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property cross-checks for the newest text operators against naive
  * in-memory reference implementations over random small-vocabulary
  * corpora (the worst case for phrase/span logic: heavy token reuse). */
class PhraseSpanPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val corpusGen: Gen[List[String]] = Gen.listOfN(12, docGen)

  private def corpora(count: Int): Seq[List[String]] =
    (1 to count).flatMap(i =>
      corpusGen(Gen.Parameters.default, Seed(i.toLong)))

  test("property: phraseMatches equals naive sliding-window search") {
    val phrase = Seq("a", "b")
    for (corpus <- corpora(25)) {
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = docs.flatMap { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        toks.sliding(phrase.length).zipWithIndex.collect {
          case (w, p) if w == phrase => (id, p)
        }
      }.toSet
      val got = InvertedIndex.phraseMatches(
          InvertedIndex.postings(docs.toDF("id", "txt"), col("id"), col("txt")), phrase)
        .as[(Long, Int)].collect().map { case (d, p) => (d, p) }.toSet
      assert(got == expected.map { case (d, p) => (d, p) },
        s"corpus=${corpus.mkString("|")}")
    }
  }

  test("property: span removal keeps exactly the positions no duplicated trigram covers") {
    for (corpus <- corpora(25)) {
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val tokenized = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
      val triCounts = tokenized.flatMap { case (_, toks) =>
        toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")) }
        .groupBy(identity).view.mapValues(_.size).toMap
      val expected = tokenized.map { case (id, toks) =>
        val covered = toks.sliding(3).zipWithIndex.collect {
          case (w, p) if w.length == 3 && triCounts(w.mkString(" ")) > 1 =>
            Seq(p, p + 1, p + 2)
        }.flatten.toSet
        id -> toks.indices.filterNot(covered).map(toks)
      }.toMap // every tokenized doc appears, even at 0 kept
      val got = SpanDedup.removeDuplicatedSpans(
          docs.toDF("id", "txt"), col("id"), col("txt"), n = 3)
        .select("doc_id", "n_kept").as[(Long, Long)].collect().toMap
      val want = expected.view.mapValues(_.size.toLong).toMap
        .filter { case (id, _) => tokenized.toMap.apply(id).nonEmpty }
      assert(got == want,
        s"corpus=${corpus.mkString("|")}")
    }
  }
}
