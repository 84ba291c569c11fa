package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSessionExtensions

/** SQL registration contract for the custom expressions. */
class GraftFunctionsSpec extends SparkSpec {

  test("graft_dot usable from SQL after registration; matches Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
    // null array propagates null
    val n = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("extensions class injects without error and registers the same list") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // builder-path smoke: no throw
    assert(GraftFunctions.all.map(_._1) == Seq("graft_dot"))
  }

  test("graft_dot arity is enforced") {
    GraftFunctions.register(spark)
    intercept[Exception](spark.sql("SELECT graft_dot(array(1.0d))").collect())
  }

  test("graft_dot rejects non-double arrays at analysis time") {
    GraftFunctions.register(spark)
    // int arrays would silently produce garbage via getDouble reinterpretation
    intercept[Exception](spark.sql("SELECT graft_dot(array(1, 2), array(3, 4))").collect())
    intercept[Exception](
      spark.sql("SELECT graft_dot(CAST(array(1.0) AS ARRAY<FLOAT>), array(1.0d))").collect())
  }
}
