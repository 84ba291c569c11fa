package graft.similarity

import graft.SparkSpec
import graft.functions.{RademacherPlanes, VectorExpressions}
import org.apache.spark.sql.functions._

/** Sign-LSH invariants: plane determinism/balance, bucket-occupancy bounds
  * on the fixture (the round-2 review's scale criterion: pattern space must
  * not degenerate to a handful of buckets), recall vs brute force at the
  * query threshold, and null-element propagation of the pattern kernel. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val Seed = 42L

  test("Rademacher planes are deterministic and balanced") {
    val a = RademacherPlanes.planes(Seed, 4, 8, 64)
    val b = RademacherPlanes.planes(Seed, 4, 8, 64)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val flat = a.flatten
    assert(flat.forall(x => x == 1.0 || x == -1.0))
    // unbiased coin: 2048 coefficients, expect ~1024 positive (6 sigma ~ 136)
    val pos = flat.count(_ == 1.0)
    assert(math.abs(pos - flat.length / 2) < 140, s"biased planes: $pos/+ of ${flat.length}")
    // different seeds give different planes
    val c = RademacherPlanes.planes(Seed + 1, 4, 8, 64)
    assert(c.map(_.toSeq).toSeq != a.map(_.toSeq).toSeq)
  }

  test("sign patterns spread vectors across the band's pattern space") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val pats = emb.select(col("vec_id"), posexplode(
        VectorExpressions.signBandPatterns(
          col("embedding").cast("array<double>"), Seed, 16, 8, 64)))
      .select(col("pos").as("band"), col("col").as("pat"))
    val occ = pats.groupBy("band", "pat").count()
      .groupBy("band").agg(countDistinct(col("pat")).as("buckets"),
        max(col("count")).as("biggest"))
      .collect()
    occ.foreach { r =>
      val (buckets, biggest) = (r.getLong(1), r.getLong(2))
      // 500 vectors over 256 possible 8-bit patterns: a genuine random
      // projection fills a large fraction; axis-aligned leading-dim bands
      // (the round-2 weak point) would collapse far below this
      assert(buckets >= 64, s"band ${r.get(0)}: only $buckets distinct patterns")
      assert(biggest <= 100, s"band ${r.get(0)}: degenerate bucket of $biggest")
    }
  }

  test("LSH pairs recall >= 85% of brute-force cos>=0.4 pairs on fixture (seeded)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val v = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val truth = v.as("a").crossJoin(v.as("b"))
      .where(col("a.id") < col("b.id"))
      .where(Similarity.cosine(col("a.v"), col("b.v")) >= 0.4)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain cos>=0.4 pairs")
    val found = Similarity.signLshPairs(emb, Seed, 16, 8, 1024)
      .where(col("cos") >= 0.4)
      .select(col("va"), col("vb")).as[(Long, Long)].collect().toSet
    assert(found.subsetOf(truth), "LSH must never invent pairs (exact verify)")
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.85, s"recall $recall (${found.size}/${truth.size})")
  }

  test("bucket cap excludes oversized buckets from candidates") {
    // 40 identical vectors land in one bucket per band; cap=8 must drop
    // them all, a lone distinct pair (ids 100, 101) must survive
    val dup = (0 until 40).map(i => (i.toLong, Array(1.0, 2.0, 3.0, 4.0)))
    val near = Seq((100L, Array(-1.0, 5.0, -2.0, 1.0)), (101L, Array(-1.0, 5.0, -2.0, 1.1)))
    val emb = (dup ++ near).toDF("vec_id", "embedding")
    val pairs = Similarity.signLshPairs(emb, Seed, 8, 6, maxBucket = 8, dims = 4)
      .select(col("va"), col("vb")).as[(Long, Long)].collect().toSet
    assert(!pairs.exists { case (a, b) => a < 40 && b < 40 },
      "capped bucket must generate no candidate pairs")
    assert(pairs.contains((100L, 101L)), "uncapped near pair must survive")
  }

  test("normalize: unit norm; quantizeInt8: bounds, round-trip error, zero guard") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = emb.select(Similarity.l2norm(Similarity.normalize(col("v"))).as("rn"))
      .as[Double].collect()
    assert(n.forall(x => math.abs(x - 1.0) < 1e-12))
    val qz = emb.select(col("v"), Similarity.quantizeInt8(col("v")).as("z"))
      .select(col("v"), col("z.scale").as("s"), col("z.q").as("q"))
      .as[(Seq[Double], Double, Seq[Int])].collect()
    qz.foreach { case (v, s, q) =>
      assert(q.forall(x => x >= -127 && x <= 127))
      // dequantized error bounded by half a quantization step per element
      v.zip(q).foreach { case (x, xq) =>
        assert(math.abs(x - xq * s / 127.0) <= s / 127.0 * 0.5 + 1e-12)
      }
    }
    // zero vector: zeros, not NaNs
    val z = Seq((1L, Array(0.0, 0.0, 0.0))).toDF("vec_id", "v")
      .select(Similarity.quantizeInt8(col("v")).as("z"))
      .select(col("z.q")).as[Seq[Int]].collect()(0)
    assert(z == Seq(0, 0, 0))
  }

  test("randomProjection: deterministic, JL norm expectation on fixture") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val out = 8
    val p = Similarity.randomProjection(col("v"), seed = 7L, outDims = out, dims = 64)
    val df = emb.select(
      Similarity.dot(col("v"), col("v")).as("n2"),
      Similarity.dot(p, p).as("p2"))
    // E[|Rv|^2] = outDims * |v|^2 for Rademacher rows — the fixture mean
    // ratio must sit near outDims (loose band: JL is an expectation)
    val ratio = df.select(avg(col("p2") / col("n2"))).as[Double].collect()(0)
    assert(math.abs(ratio - out) < out * 0.35, s"mean |Rv|^2/|v|^2 = $ratio, want ~$out")
    // deterministic: same seed → identical, different seed → different
    val p1 = emb.select(element_at(p, 1)).as[Double].collect().toSeq
    val p1b = emb.select(element_at(
      Similarity.randomProjection(col("v"), 7L, out, 64), 1)).as[Double].collect().toSeq
    val p1c = emb.select(element_at(
      Similarity.randomProjection(col("v"), 8L, out, 64), 1)).as[Double].collect().toSeq
    assert(p1 == p1b && p1 != p1c)
  }

  test("kmeans: SSE non-increasing over iterations, partition-layout independent") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    def sse(iters: Int, repart: Int = 0): (Double, Map[Long, Long]) = {
      val base = if (repart > 0) emb.repartition(repart) else emb
      val a = Similarity.kmeansAssign(base, k = 8, iters = iters)
        .select(col("id"), col("cell"), col("dist2"))
        .as[(Long, Long, Double)].collect()
      (a.map(_._3).sum, a.map(t => t._1 -> t._2).toMap)
    }
    val (sse0, _) = sse(0)
    val (sse1, _) = sse(1)
    val (sse2, asg2) = sse(2)
    // Lloyd monotonicity (micro-unit quantization can cost at most ~1e-6
    // per centroid element — drowned by the assertion margin)
    assert(sse1 <= sse0 * 1.001, s"iter1 SSE $sse1 > init $sse0")
    assert(sse2 <= sse1 * 1.001, s"iter2 SSE $sse2 > iter1 $sse1")
    assert(sse2 < sse0, "training must actually improve the objective")
    // integer-microunit sums make the result independent of partitioning
    val (_, asg2b) = sse(2, repart = 7)
    assert(asg2b == asg2)
  }

  test("multi-probe IVF: candidate set grows with nprobe; all cells = brute force") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    def pairs(nprobe: Int) = Similarity
      .ivfTopKProbes(emb, nCentroids = 8, queryMaxId = 10, k = 3, nprobe = nprobe)
      .select(col("qid"), col("nid"), col("rank")).as[(Long, Long, Long)]
      .collect().toSet
    // probing every cell degenerates to exact brute force — the recall proof
    val all = pairs(8)
    val brute = Similarity.bruteForceTopK(
        emb.where(col("vec_id") < 10), emb, 3)
      .select(col("qid"), col("nid"), col("rank")).as[(Long, Long, Long)]
      .collect().toSet
    assert(all == brute, "nprobe = nCentroids must equal brute force")
    // 2 probes recall at least as much of the exact answer as 1 probe
    def hits(p: Set[(Long, Long, Long)]) = p.map(t => (t._1, t._2))
      .intersect(brute.map(t => (t._1, t._2))).size
    assert(hits(pairs(2)) >= hits(pairs(1)),
      "nprobe=2 must not recall fewer exact neighbors than nprobe=1")
  }

  test("signBandPatterns propagates null elements") {
    val df = Seq(
      (1L, Array[java.lang.Double](1.0, null, 3.0)),
      (2L, Array[java.lang.Double](1.0, 2.0, 3.0))
    ).toDF("id", "v")
    val r = df.select(col("id"), VectorExpressions.signBandPatterns(
        col("v").cast("array<double>"), Seed, 2, 4, 3).as("p"))
      .orderBy("id").collect()
    assert(r(0).isNullAt(1))
    assert(!r(1).isNullAt(1) && r(1).getSeq[Long](1).size == 2)
  }
}
