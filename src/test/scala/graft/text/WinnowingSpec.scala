package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(docs: Seq[(Long, Seq[String])], k: Int, w: Int): Map[Long, Set[Long]] = {
    val toks = docs.flatMap { case (id, ts) =>
      ts.zipWithIndex.map { case (t, p) => (id, p.toLong, t) }
    }
    Winnowing.fingerprints(toks.toDF("doc_id", "pos", "tok"),
        col("doc_id"), col("pos"), col("tok"), k, w)
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
  }

  test("guarantee: any shared run of >= w+k-1 tokens yields a shared fingerprint") {
    val rng = new scala.util.Random(11)
    val alphabet = (0 until 40).map(i => s"t$i")
    def randTokens(n: Int) = Seq.fill(n)(alphabet(rng.nextInt(alphabet.size)))
    val (k, w) = (3, 4)
    // 30 planted trials: a shared run of exactly w+k-1 = 6 tokens embedded
    // at random offsets inside otherwise-random documents
    for (trial <- 1 to 30) {
      val shared = randTokens(w + k - 1)
      val a = randTokens(rng.nextInt(20)) ++ shared ++ randTokens(rng.nextInt(20))
      val b = randTokens(rng.nextInt(20)) ++ shared ++ randTokens(rng.nextInt(20))
      val m = fps(Seq((1L, a), (2L, b)), k, w)
      assert(m(1L).intersect(m(2L)).nonEmpty,
        s"trial $trial: planted ${w + k - 1}-token overlap produced no shared fingerprint")
    }
  }

  test("density: selection keeps far fewer fingerprints than full shingling") {
    val rng = new scala.util.Random(5)
    val toks = Seq.fill(4000)(s"t${rng.nextInt(5000)}")
    val selected = fps(Seq((1L, toks)), 3, 4)(1L).size
    val fullGrams = toks.size - 2
    assert(selected < fullGrams / 2,
      s"expected winnowed density well below shingling: $selected vs $fullGrams")
  }

  test("short documents (under one full window) produce no fingerprints") {
    assert(fps(Seq((1L, Seq("a", "b", "c", "d", "e"))), 3, 4).isEmpty)
  }
}
