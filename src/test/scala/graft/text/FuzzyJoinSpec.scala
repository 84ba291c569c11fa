package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FastSS blocking contract: full recall at edit distance ≤ 2 (checked
  * against brute-force levenshtein), precision via the exact verify. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants2: word itself + all 1- and 2-deletion strings") {
    val out = Seq("abc").toDF("w")
      .select(FuzzyJoin.deletionVariants2(col("w")).as("v"))
      .as[Seq[String]].head().toSet
    assert(out == Set("abc", "bc", "ac", "ab", "c", "b", "a"))
    val one = Seq("x").toDF("w")
      .select(FuzzyJoin.deletionVariants2(col("w")).as("v"))
      .as[Seq[String]].head().toSet
    assert(one == Set("x", ""))
  }

  test("pairs match brute-force levenshtein <= 2 exactly (recall + precision)") {
    val vocab = Seq("spark", "spork", "stork", "sparks", "park", "table",
      "cable", "maple", "apple", "apply", "xyzzy").toDF("w")
    val got = FuzzyJoin.editDistancePairs2(vocab, col("w"))
      .select("wa", "wb", "ed").as[(String, String, Long)].collect().toSet
    val words = vocab.as[String].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      a <- words; b <- words if a < b
      e = lev(a, b) if e <= 2
    } yield (a, b, e.toLong)).toSet
    assert(got == expected)
    assert(expected.exists(_._3 == 1L) && expected.exists(_._3 == 2L),
      "fixture must exercise both distances")
  }
}
