package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** DSL-compiler contract (reference: sampling/samplers.py:232-297,
  * filtered_sampling_guide.md): every form from the guide, the error
  * contract, plus a ScalaCheck property comparing random filter trees
  * against hand-built Column predicates row-by-row. */
class FilterDslSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.Tables.events(spark, sf).cache()
  private def rows(json: String): Set[Long] =
    ev.where(FilterDsl.toColumn(json, ev.columns.toSeq))
      .select("event_id").as[Long].collect().toSet
  private def rowsCol(c: org.apache.spark.sql.Column): Set[Long] =
    ev.where(c).select("event_id").as[Long].collect().toSet

  test("scalar equality") {
    assert(rows("""{"event_type": "click"}""") == rowsCol($"event_type" === "click"))
  }

  test("array is always IN-list, never a range") {
    assert(rows("""{"user_id": [3, 7]}""") == rowsCol($"user_id".isin(3, 7)))
  }

  test("op dict: equals / in_list / gt / lt / between / range") {
    assert(rows("""{"user_id": {"op": "equals", "value": 5}}""") == rowsCol($"user_id" === 5))
    assert(rows("""{"event_type": {"op": "in_list", "values": ["view", "error"]}}""")
      == rowsCol($"event_type".isin("view", "error")))
    assert(rows("""{"value": {"op": "gt", "value": 90}}""") == rowsCol($"value" > 90))
    assert(rows("""{"value": {"op": "lt", "value": 10}}""") == rowsCol($"value" < 10))
    assert(rows("""{"value": {"op": "between", "min": 10, "max": 20}}""")
      == rowsCol($"value" >= 10 && $"value" <= 20))
    assert(rows("""{"value": {"op": "range", "min": 10, "max": 20}}""")
      == rows("""{"value": {"op": "between", "min": 10, "max": 20}}"""))
  }

  test("top-level implicit AND; OR block; nested AND inside OR") {
    assert(rows("""{"event_type": "click", "value": {"op": "gt", "value": 50}}""")
      == rowsCol($"event_type" === "click" && $"value" > 50))
    assert(rows("""{"OR": {"event_type": "click", "user_id": 3}}""")
      == rowsCol($"event_type" === "click" || $"user_id" === 3))
    assert(rows(
      """{"OR": {"event_type": "signup",
                 "AND": {"event_type": "error", "value": {"op": "gt", "value": 90}}}}""")
      == rowsCol($"event_type" === "signup" || ($"event_type" === "error" && $"value" > 90)))
  }

  test("empty filter matches all") {
    assert(rows("{}") == rowsCol(lit(true)))
  }

  test("empty nested block is skipped, not match-all (reference returns None)") {
    // {"OR": {"a": 1, "AND": {}}} must compile to a == 1 — an empty
    // sub-block compiling to lit(true) would make the OR match every row.
    assert(rows("""{"OR": {"user_id": 3, "AND": {}}}""") == rowsCol($"user_id" === 3))
    assert(rows("""{"OR": {"event_type": "click", "OR": {}}}""")
      == rowsCol($"event_type" === "click"))
    // under an AND parent too: {"a": 1, "AND": {}} ≡ a == 1
    assert(rows("""{"user_id": 3, "AND": {}}""") == rowsCol($"user_id" === 3))
    // recursively empty: a block containing only empty blocks is itself empty
    assert(rows("""{"OR": {"user_id": 3, "AND": {"OR": {}}}}""")
      == rowsCol($"user_id" === 3))
  }

  test("duplicate JSON keys: last occurrence wins (Python dict semantics)") {
    assert(rows("""{"user_id": 3, "user_id": 5}""") == rowsCol($"user_id" === 5))
  }

  test("error contract: unknown column, bad AND payload, malformed JSON, bad op") {
    intercept[IllegalArgumentException](FilterDsl.toColumn("""{"nope": 1}""", Seq("a")))
    intercept[IllegalArgumentException](FilterDsl.parse("""{"AND": 17}"""))
    intercept[IllegalArgumentException](FilterDsl.parse("""{"x": """))
    intercept[IllegalArgumentException](FilterDsl.parse("""{"a": {"op": "ge", "value": 1}}"""))
    intercept[IllegalArgumentException](FilterDsl.parse("""{"a": {"op": "between", "min": 1}}"""))
  }

  // ---- property: random DSL trees ≡ hand-built Column predicates ----
  private case class NodeGen(json: String, col: org.apache.spark.sql.Column)

  private val leafGen: Gen[NodeGen] = Gen.oneOf(
    Gen.oneOf("click", "view", "purchase", "signup", "error").map(v =>
      NodeGen(s"""{"event_type": "$v"}""", $"event_type" === v)),
    Gen.choose(0L, 200L).map(v =>
      NodeGen(s"""{"user_id": {"op": "lt", "value": $v}}""", $"user_id" < v)),
    Gen.choose(0.0, 100.0).map(v =>
      NodeGen(s"""{"value": {"op": "gt", "value": $v}}""", $"value" > v)),
    Gen.listOfN(3, Gen.choose(0L, 100L)).map(vs =>
      NodeGen(s"""{"user_id": [${vs.mkString(",")}]}""", $"user_id".isin(vs: _*)))
  )

  /** Composite: {"<conn>": {"AND": <sub>, <leaf-field>}} — the "AND" key and
    * a column-named leaf key are always distinct, so generated JSON never has
    * duplicate keys at one level. */
  private def treeGen(depth: Int): Gen[NodeGen] =
    if (depth <= 0) leafGen
    else Gen.oneOf(
      leafGen,
      for {
        conn <- Gen.oneOf("AND", "OR")
        sub <- treeGen(depth - 1)
        leaf <- leafGen
      } yield {
        val leafField = leaf.json.trim.drop(1).dropRight(1)
        val json = s"""{"$conn": {"AND": ${sub.json}, $leafField}}"""
        val c = if (conn == "AND") sub.col && leaf.col else sub.col || leaf.col
        NodeGen(json, c)
      }
    )

  test("property: random filter trees match hand-built predicates") {
    val cols = ev.columns.toSeq
    val prop = Prop.forAllNoShrink(treeGen(3)) { ng =>
      val a = ev.where(FilterDsl.toColumn(ng.json, cols))
        .select("event_id").as[Long].collect().toSet
      val b = ev.where(ng.col).select("event_id").as[Long].collect().toSet
      a == b
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
