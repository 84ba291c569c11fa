package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit contract for the text-analysis operators: edge cases the oracle
  * fixture can't hit (empty text, CJK, contractions) + invariants. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T =
    Seq(text).toDF("t").select(c(col("t")).as("r")).collect()(0).getAs[T]("r")

  test("tokenCount: whitespace runs, empty, all-space") {
    assert(one[Int]("a  b\tc\nd", TextFunctions.tokenCount) == 4)
    assert(one[Int]("", TextFunctions.tokenCount) == 0)
    assert(one[Int]("   ", TextFunctions.tokenCount) == 0)
  }

  test("bpeTokenCount: contractions, digits, punctuation runs") {
    // "don't stop" → [don]['t][ stop] = 3
    assert(one[Int]("don't stop", TextFunctions.bpeTokenCount) == 3)
    // "x42!!" → [x][42][!!] = 3
    assert(one[Int]("x42!!", TextFunctions.bpeTokenCount) == 3)
    assert(one[Int]("", TextFunctions.bpeTokenCount) == 0)
  }

  test("stopword + punct counts") {
    assert(one[Int]("The cat and the hat.", TextFunctions.stopwordCount) == 3)
    assert(one[Int]("a,b.c!?", TextFunctions.punctCount) == 4)
  }

  test("qualityScore stays in [0,1]") {
    val docs = graft.Tables.documents(spark, sf)
    val bad = docs.select(TextFunctions.qualityScore(col("text")).as("q"))
      .where(col("q") < 0 || col("q") > 1).count()
    assert(bad == 0)
  }

  test("langId: CJK wins; stopword profiles; und fallback") {
    assert(one[String]("你好世界", TextFunctions.langId) == "zh")
    assert(one[String]("the cat of the house", TextFunctions.langId) == "en")
    assert(one[String]("der hund ist nicht da", TextFunctions.langId) == "de")
    assert(one[String]("le chat est dans la maison", TextFunctions.langId) == "fr")
    assert(one[String]("los gatos y el perro", TextFunctions.langId) == "es")
    assert(one[String]("xyzzy plugh", TextFunctions.langId) == "und")
  }

  test("withLangId equals the inline langId on the whole fixture corpus") {
    // focused pin for the opt-r13 staged-score rewrite: the staged form
    // must be bitwise the inline expression, document by document
    val docs = graft.Tables.documents(spark, sf)
    val diff = TextFunctions.withLangId(docs, col("text"), "staged")
      .withColumn("inline", TextFunctions.langId(col("text")))
      .where(col("staged") =!= col("inline") ||
        col("staged").isNull =!= col("inline").isNull)
      .count()
    assert(diff == 0)
  }

  test("chunkTokens: stride windows, short last chunk, short/empty docs") {
    def chunks(t: String, size: Int, stride: Int): Seq[String] =
      Seq(t).toDF("t").select(TextFunctions.chunkTokens(col("t"), size, stride).as("c"))
        .as[Seq[String]].collect()(0)
    // 7 tokens, size 3 stride 2 → ceil((7-1)/2)=3 chunks: [a b c][c d e][e f g]
    assert(chunks("a b c d e f g", 3, 2) == Seq("a b c", "c d e", "e f g"))
    // exact fit, no overlap
    assert(chunks("a b c d", 2, 2) == Seq("a b", "c d"))
    // doc shorter than a chunk → one short chunk
    assert(chunks("a b", 5, 5) == Seq("a b"))
    assert(chunks("", 4, 2) == Seq.empty)
  }

  test("splitBucket: stable in [0,100), ~95/5 split on the fixture") {
    val b = graft.Tables.documents(spark, sf)
      .select(TextFunctions.splitBucket(col("doc_id")).as("b")).as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 100))
    val trainFrac = b.count(_ < 95).toDouble / b.length
    assert(trainFrac > 0.90 && trainFrac < 0.99, s"train fraction $trainFrac")
  }

  test("redactPii masks emails, urls, and phone numbers") {
    val in = "mail bob@example.com or call +1-555-123-4567, see https://x.io/a?b=1 now"
    val out = one[String](in, TextFunctions.redactPii)
    assert(out == "mail <EMAIL> or call <PHONE>, see <URL> now")
    // counts
    val df = Seq(in).toDF("t")
      .select(TextFunctions.piiCounts(col("t")).as("p"))
      .select("p.n_email", "p.n_url", "p.n_phone")
      .collect()(0)
    assert((df.getLong(0), df.getLong(1), df.getLong(2)) == ((1L, 1L, 1L)))
    // clean text is untouched
    assert(one[String]("no pii here", TextFunctions.redactPii) == "no pii here")
  }

  test("fingerprints: normalization-invariant, rolling hash deterministic") {
    val a = one[String]("Hello   World", TextFunctions.fingerprintMd5)
    val b = one[String]("  hello world ", TextFunctions.fingerprintMd5)
    assert(a == b)
    // "ab" normalized: h = (0*31+97)*31+98 mod p = 3105
    assert(one[Long]("ab", TextFunctions.fingerprintRolling) == 97L * 31 + 98)
    assert(one[Long]("", TextFunctions.fingerprintRolling) == 0L)
  }
}
