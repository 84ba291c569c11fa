package graft.functions

import java.math.BigInteger

import graft.SparkSpec
import graft.functions.WideDiv.{mulDivWide, mulDivWideDec, ppmWide, wide}
import org.apache.spark.sql.functions._

/** Pins the overflow-proof share arithmetic: [[WideDiv.mulDivWide]] must
  * equal BigInteger floor division on every input — including the exact
  * regime where the int64 `* 1000000 DIV` idiom dies (the sf1 scale run
  * overflowed q_eng_lorenz at cum ≈ 2.25e13 cents) and the half-up
  * rounding edge where Spark's DECIMAL division alone would land one off
  * the true floor without the remainder correction.
  */
class WideDivSpec extends SparkSpec {
  import spark.implicits._

  private def reference(num: BigInteger, mul: Long, den: BigInteger): Long = {
    val q = num.multiply(BigInteger.valueOf(mul)).divide(den)
    // BigInteger.divide truncates toward zero == floor for non-negatives
    q.longValueExact()
  }

  private def check(rows: Seq[(Long, Long)], mul: Long): Unit = {
    val got = rows.toDF("num", "den")
      .select(col("num"), col("den"),
        mulDivWide(col("num"), lit(mul), col("den")).as("q"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (n, d) =>
      val want = reference(BigInteger.valueOf(n), mul, BigInteger.valueOf(d))
      assert(got((n, d)) == want, s"num=$n den=$d mul=$mul")
    }
  }

  test("matches BigInteger floor division across the int64-overflow regime") {
    val rng = new scala.util.Random(42)
    val rows = Seq.tabulate(400) { i =>
      // spread numerators from tiny to near Long.Max — everything past
      // ~9.2e12 overflows the narrow idiom once multiplied by 1e6. The
      // contract is that the RESULT fits int64 (shares/ratios do), so den
      // is floored to keep num·1e6/den under Long.Max
      val num = math.abs(rng.nextLong()) >> (i % 50)
      val den = math.max(math.max(1L, num >> 42),
        math.abs(rng.nextLong()) >> (i % 60))
      (num, den)
    } ++ Seq(
      (22500000000000L, 9L),            // the lorenz-at-sf1 magnitude
      (Long.MaxValue, Long.MaxValue),
      (0L, 5L))
    check(rows, 1000000L)
    check(rows, 1L)
    check(Seq((Long.MaxValue, 1L)), 1L) // extreme numerator, identity mul
  }

  test("remainder correction: exact quotients a hair below an integer") {
    // den·k - 1 over den: true floor is k-1, but the quotient rounds to
    // k.000000 at DECIMAL scale 6 whenever den > 2e6 — floor(decimal div)
    // alone returns k; the correction step must pull it back
    val dens = Seq(3000000L, 2500000001L, 987654321987L)
    val rows = dens.flatMap { den =>
      Seq((den * 7 - 1, den), (den * 7 + 1, den), (den * 7, den))
    }
    check(rows, 1L)
    // same shape through the ×1e6 path: num·1e6 = den·k - 1
    val r2 = Seq((4999999999999L, 5000000000000L)) // ppm = 999999, not 1e6
    val got = r2.toDF("num", "den")
      .select(ppmWide(col("num"), col("den")).as("q")).head().getLong(0)
    assert(got == 999999L)
  }

  test("mulDivWideDec keeps beyond-int64 quotients exact in DECIMAL(38)") {
    // quotient ~1.4e23 — far past Long.Max; the DECIMAL-returning variant
    // must still land on the exact BigInteger floor (incl. the remainder
    // correction at a just-below-integer quotient)
    val cases = Seq(
      (1000000000000000000L, 1000000L, 7L),
      (999999999999999999L, 999999L, 3L),
      (21L * 2097151L, 1L, 2097152L), // floor just below an integer
      (0L, 1000000L, 9L))
    val got = cases.toDF("num", "mul", "den")
      .select(col("num"), mulDivWideDec(wide(col("num")), col("mul"),
        col("den")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).toBigInteger).toMap
    cases.foreach { case (n, m, d) =>
      val want = BigInteger.valueOf(n).multiply(BigInteger.valueOf(m))
        .divide(BigInteger.valueOf(d))
      assert(got(n) == want, s"num=$n mul=$m den=$d")
    }
  }

  test("wide() products stay exact where int64 squares overflow") {
    val n = 4000000000L // (n)² = 1.6e19 > Long.MaxValue
    val got = Seq((n, n)).toDF("a", "b")
      .select(mulDivWide(wide(col("a")) * wide(col("b")), lit(1L),
        lit(1000000000L)).as("q")).head().getLong(0)
    assert(got == 16000000000L)
  }
}
