package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants of q_text_retrieval_eval (graded nDCG@10 + MRR over the
  * BM25 ranking): the metric algebra must respect its own bounds on the
  * live fixture, and the leaf-quantized discount table must match the
  * definition 1/log2(rank+1). */
class RetrievalEvalSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q_text_retrieval_eval")(spark, sf).collect()

  test("per-query bounds: dcg ≤ idcg, ndcg ≤ 1e6, rr is 1e6 DIV rank") {
    assert(rows.nonEmpty)
    for (r <- rows) {
      val dcg = r.getAs[Long]("dcg_micro")
      val idcg = r.getAs[Long]("idcg_micro")
      val ndcg = r.getAs[Long]("ndcg_ppm")
      val firstRel = r.getAs[Long]("first_rel_rank")
      val rr = r.getAs[Long]("rr_ppm")
      assert(dcg <= idcg, s"dcg $dcg > idcg $idcg (ideal must dominate)")
      assert(ndcg >= 0 && ndcg <= 1000000)
      assert(r.getAs[Long]("n_ranked") >= 1 && r.getAs[Long]("n_ranked") <= 10)
      if (firstRel == 0) assert(rr == 0)
      else assert(rr == 1000000L / firstRel && firstRel <= 10)
      // local-ideal nDCG: equality iff dcg == idcg exactly (ppm division
      // truncates, so 1e6 can only come from the identical integer)
      if (ndcg == 1000000L) assert(dcg == idcg)
    }
  }

  test("discount table matches 1/log2(rank+1) in micro-units") {
    // the 10-value leaf domain the query quantizes: rank 1 → 1e6,
    // rank 3 → 1e6/2 = 500000
    def disc(rank: Long): Long =
      math.floor(math.log(2.0) / math.log((rank + 1).toDouble) * 1e6 + 0.5)
        .toLong
    assert(disc(1) == 1000000L)
    assert(disc(3) == 500000L)
    assert((1L to 10L).map(disc).sliding(2).forall(p => p(0) >= p(1)))
  }
}
