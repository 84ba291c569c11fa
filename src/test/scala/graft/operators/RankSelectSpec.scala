package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RankSelect contract, including the Long-domain extremes ADVICE r7
  * flagged as untestable while the loop lived inline in q_eng_theil_sen:
  * a value span exceeding Long.MaxValue must not wrap the bucket width or
  * the boundary math negative. Tiny driverLimit/buckets force multi-round
  * refinement so the histogram path (not the collect fallback) is what's
  * exercised. */
class RankSelectSpec extends SparkSpec {
  import spark.implicits._

  private def naiveAt(xs: Seq[Long], rank: Long): Long =
    xs.sorted.apply((rank - 1).toInt)

  private def check(xs: Seq[Long], driverLimit: Int = 4,
                    buckets: Int = 4): Unit = {
    val df = xs.toDF("v")
    val rank = (xs.size + 1L) / 2
    val got = RankSelect.exactLowerMedian(df, col("v"),
      driverLimit = driverLimit, buckets = buckets)
    assert(got.contains((xs.size.toLong, naiveAt(xs, rank))),
      s"got $got for n=${xs.size}")
  }

  test("empty input returns None") {
    assert(RankSelect.exactLowerMedian(
      spark.range(0).toDF("v"), col("v")).isEmpty)
  }

  test("small inputs (collect fallback) match a naive sort") {
    check(Seq(5L), driverLimit = 64)
    check(Seq(3L, 1L), driverLimit = 64)
    check(Seq(9L, -4L, 7L, 0L, 7L), driverLimit = 64)
  }

  test("multi-round refinement matches a naive sort on random data") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(33, 200, 1000)) {
      check(Seq.fill(n)(rnd.nextLong() % 100000L))
      check(Seq.fill(n)(rnd.nextInt(5).toLong)) // duplicate-heavy
    }
  }

  test("fat-tailed data (one dominant bucket) still refines to the answer") {
    // 95% of mass in one tiny range + extreme outliers — the shape that
    // defeats one-shot bucketing
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(950)(1000L + rnd.nextInt(10)) ++
      Seq.fill(25)(Long.MinValue + 1 + rnd.nextInt(1000)) ++
      Seq.fill(25)(Long.MaxValue - rnd.nextInt(1000))
    check(xs)
  }

  test("full-Long-domain span (hi - lo overflows Long) stays exact") {
    // span = MaxValue - (MinValue + 1) ≈ 2^64 — a Long subtraction wraps
    // negative; the BigInt width/boundary math must not
    val xs = Seq(Long.MinValue + 1, Long.MinValue + 2, -9000000000000000000L,
      -1L, 0L, 1L, 42L, 9000000000000000000L, Long.MaxValue - 1,
      Long.MaxValue)
    check(xs, driverLimit = 2, buckets = 4) // force the histogram rounds
    // and at every rank, not just the median
    val df = xs.toDF("v")
    for (r <- 1 to xs.size) {
      val got = RankSelect.exactAtRank(df, col("v"), _ => r.toLong,
        driverLimit = 2, buckets = 4)
      assert(got.contains((xs.size.toLong, naiveAt(xs, r.toLong))),
        s"rank $r: got $got")
    }
  }

  test("±9.2e18 slope-magnitude bound (the Theil-Sen worst case)") {
    val rnd = new scala.util.Random(13)
    val xs = Seq.fill(500)(rnd.nextLong()) ++
      Seq(Long.MinValue + 1, Long.MaxValue)
    check(xs, driverLimit = 16, buckets = 8)
  }
}
