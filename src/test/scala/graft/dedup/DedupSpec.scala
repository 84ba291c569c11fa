package graft.dedup

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Dedup operator invariants: shingling edges, Jaccard algebra, LSH
  * candidate completeness on the fixture's known near-dup pairs, SimHash
  * stability. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sf).cache()

  test("shingles: short docs yield one whole-text shingle; n-grams are distinct") {
    val r = Seq("a b", "a b c d", "x x x x").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(r(0) == Seq("a b"))
    assert(r(1) == Seq("a b c", "b c d"))
    assert(r(2) == Seq("x x x")) // duplicates collapse
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("c", "d"))).toDF("x", "y", "z")
    val r = df.select(
      Dedup.jaccard(col("x"), col("y")).as("same"),
      Dedup.jaccard(col("x"), col("z")).as("disj")).collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("LSH candidates recover all high-Jaccard pairs (recall on fixture)") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("shingles"))
    // ground truth: all pairs with true Jaccard >= 0.8 (brute-force on 500 docs)
    val truth = sh.as("a").crossJoin(sh.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .where(Dedup.jaccard(col("a.shingles"), col("b.shingles")) >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain near-dup pairs")
    val sig = sh.withColumn("sig", Dedup.minhashSignature(col("shingles"), 8))
    val cand = Dedup.lshCandidates(sig, col("doc_id"), col("sig"), 4, 2)
      .as[(Long, Long)].collect().toSet
    assert((truth -- cand).isEmpty,
      s"LSH missed ${(truth -- cand).size} of ${truth.size} true pairs")
  }

  test("ngramJaccardPairs: df cutoff prunes stop-shingle pairs, verify stays exact") {
    // doc pair (1,2) shares rare shingles (near-dups); docs 3..12 share
    // one hot shingle (df=12 across all docs, > maxDf=8) and nothing else —
    // the hot shingle must produce NO candidates, while (1,2) survives with
    // its exact full-set jaccard (including the hot shingle both contain)
    val hot = 777L
    val rows =
      Seq((1L, Seq(10L, 11L, 12L, 13L, hot)), (2L, Seq(10L, 11L, 12L, 14L, hot))) ++
        (3L to 12L).map(i => (i, Seq(hot, 1000L + i)))
    val df = rows.toDF("doc_id", "hs")
    val out = Dedup.ngramJaccardPairs(df, col("doc_id"), col("hs"),
      minJaccard = 0.5, maxDf = 8)
      .as[(Long, Long, Long, Double)].collect().toSet
    // shared = 4 of {10,11,12,hot} + one private each => jac = 4/6
    assert(out == Set((1L, 2L, 4L, 4.0 / 6.0)))
    // with the cutoff disabled (maxDf >= 12), the hot shingle pairs all 12
    // docs — C(12,2)=66 candidates, the 3..12 ones below threshold: same
    // emitted result, quadratically more candidate work
    val loose = Dedup.ngramJaccardPairs(df, col("doc_id"), col("hs"),
      minJaccard = 0.5, maxDf = 12)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(loose == out, "cutoff must not change emitted pair values, only recall")
  }

  test("duplicateClusters: min-label connected components, multi-hop chains") {
    // component {1,2,3,4} as a chain (diameter 3 → several propagation
    // rounds), pair {10,11}, and a long path 20..26 (min label must walk
    // six hops before the loop may stop)
    val pairs = (Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)) ++
      (20L until 26L).map(i => (i, i + 1))).toDF("ida", "idb")
    val out = Dedup.duplicateClusters(pairs, col("ida"), col("idb"))
      .as[(Long, Long)].collect().toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L) ++ (20L to 26L).map(_ -> 20L).toMap
    assert(out == expected)
  }

  test("duplicateClusters: maxSteps caps at a fixed synchronous round budget") {
    // path 20..26: after exactly R synchronous min-label rounds, each
    // node's label is the min id within R hops — the well-defined
    // bounded-round semantics the DuckDB twin replays when the true
    // components are reach-infeasible (sf1mut pHash oracle). R = 2 on a
    // 6-hop path is deliberately NOT converged.
    val pairs = (20L until 26L).map(i => (i, i + 1)).toDF("ida", "idb")
    val out = Dedup.duplicateClusters(pairs, col("ida"), col("idb"), maxSteps = 2)
      .as[(Long, Long)].collect().toMap
    val expected = (20L to 26L).map(i => i -> math.max(20L, i - 2)).toMap
    assert(out == expected)
    // an ample budget converges to the same fixpoint as the unbounded loop
    val full = Dedup.duplicateClusters(pairs, col("ida"), col("idb"), maxSteps = 8)
      .as[(Long, Long)].collect().toMap
    assert(full == (20L to 26L).map(_ -> 20L).toMap)
  }

  test("simhash: deterministic and insensitive to feature order") {
    val a = Seq((1L, Seq("aa", "bb", "cc"))).toDF("doc_id", "f")
    val b = Seq((1L, Seq("cc", "aa", "bb"))).toDF("doc_id", "f")
    val ha = Dedup.simhash(a, col("doc_id"), col("f")).select("simhash").as[Long].collect()(0)
    val hb = Dedup.simhash(b, col("doc_id"), col("f")).select("simhash").as[Long].collect()(0)
    assert(ha == hb)
    assert(ha >= 0 && ha < (1L << 60))
  }

  test("cosine: orthogonal=0, parallel=1 (within fp error)") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 2.0), Seq(3.0, 0.0))).toDF("x", "y", "z")
    val r = df.select(
      Similarity.cosine(col("x"), col("y")).as("orth"),
      Similarity.cosine(col("x"), col("z")).as("par")).collect()(0)
    assert(r.getDouble(0) == 0.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }
}
