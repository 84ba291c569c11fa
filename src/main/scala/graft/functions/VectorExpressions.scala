package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the hot vector kernel (SURVEY.md §7.3:
  * prefer a codegen'd `Expression` over interpreted higher-order functions
  * once a scalar kernel dominates).
  *
  * Sequential left-to-right double accumulation — exactly the fold order of
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, so results are bitwise
  * identical to the declarative form (and to the DuckDB oracle's
  * list_reduce); this is a drop-in speedup, not a semantics change. The
  * interpreted HOF path costs a virtual call per element; this compiles to
  * a tight loop inside whole-stage codegen.
  *
  * Contract: double arrays of equal length (embedding columns); a null
  * *array* propagates null, and so does a null *element* — matching the
  * built-in null-propagation semantics (`graft_dot` is exposed to
  * arbitrary SQL via GraftExtensions, where a no-null-elements contract
  * could not be enforced; silently reading a null slot as 0.0 would
  * corrupt scores).
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  /** Reject non-double arrays at analysis time — `ArrayData.getDouble` on
    * a float/int array would silently return garbage at runtime. */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // the isNullAt branch is perfectly predicted on the (ubiquitous)
      // all-non-null case, so the loop still vectorizes as a tight kernel
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column wrapper for [[DotProductDouble]]. */
  def dotNative(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductDouble(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
