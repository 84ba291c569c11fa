package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def tgt = Seq(
    (1L, "O", 10.0), (2L, "F", 20.0), (3L, "O", 30.0)
  ).toDF("k", "status", "price")

  test("matched rows take the source values, unmatched target rows survive") {
    val src = Seq((2L, "O", 99.0), (9L, "O", 90.0)).toDF("k", "status", "price")
    val out = Merge.mergeInto(tgt, src, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out === Seq((1L, "O", 10.0), (2L, "O", 99.0), (3L, "O", 30.0),
      (9L, "O", 90.0)))
  }

  test("matched delete clause drops the row; source-only rows still insert") {
    val src = Seq((2L, "F", 99.0), (9L, "F", 90.0)).toDF("k", "status", "price")
    val out = Merge.mergeInto(tgt, src, Seq("k"),
        deleteWhen = col("_src.status") === "F")
      .orderBy("k").as[(Long, String, Double)].collect()
    // key 2 matched an 'F' source → deleted; key 9 is an insert, so the
    // delete clause does not apply to it
    assert(out === Seq((1L, "O", 10.0), (3L, "O", 30.0), (9L, "F", 90.0)))
  }

  test("empty source is a no-op merge") {
    val src = tgt.where(lit(false))
    val out = Merge.mergeInto(tgt, src, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out === Seq((1L, "O", 10.0), (2L, "F", 20.0), (3L, "O", 30.0)))
  }

  test("column mismatch is rejected") {
    val bad = Seq((1L, "O")).toDF("k", "status")
    assertThrows[IllegalArgumentException] {
      Merge.mergeInto(tgt, bad, Seq("k"))
    }
  }

  test("duplicate source merge keys fail instead of fanning out updates") {
    val src = Seq((2L, "O", 99.0), (2L, "F", 98.0)).toDF("k", "status", "price")
    val e = intercept[Exception] {
      Merge.mergeInto(tgt, src, Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("multiple rows for a merge key")),
      s"expected the cardinality-guard message, got: ${messages(e)}")
  }

  test("composite merge keys match on every key column") {
    val t = Seq((1L, "a", 10.0), (1L, "b", 20.0)).toDF("k1", "k2", "v")
    val s = Seq((1L, "a", 99.0), (2L, "a", 50.0)).toDF("k1", "k2", "v")
    val out = Merge.mergeInto(t, s, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Long, String, Double)].collect()
    // (1,a) updated, (1,b) kept, (2,a) inserted
    assert(out === Seq((1L, "a", 99.0), (1L, "b", 20.0), (2L, "a", 50.0)))
  }
}
