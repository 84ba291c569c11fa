package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality constraint checking (Deequ-style, minimal):
  * evaluate a set of table constraints in ONE aggregation pass and emit a
  * long-format report `(check, column, value, pass)`.
  *
  * One pass matters at 100 TB: every constraint compiles to an aggregate
  * expression over the same scan — adding a check adds a column to one
  * HashAggregate, not another job. All metrics here are exact integer
  * counts (null counts, distinct counts, bound violations), so the report
  * is engine-reproducible and oracle-checkable; ratio-style metrics are
  * derived downstream from the integer columns.
  */
object QualityReport {

  sealed trait Check { def name: String; def column: String }
  /** Column has no nulls. */
  final case class Complete(column: String) extends Check { val name = "complete" }
  /** Column values are unique (key property). */
  final case class Unique(column: String) extends Check { val name = "unique" }
  /** Values within [lo, hi] (inclusive); nulls don't violate. */
  final case class Bounds(column: String, lo: Double, hi: Double) extends Check {
    val name = "bounds"
  }
  /** Values limited to the allowed set; nulls don't violate. */
  final case class InSet(column: String, allowed: Seq[String]) extends Check {
    val name = "in_set"
  }

  /** Long-format report: one row per check, `value` = violation count
    * (for Unique: rows in excess of one per value), `pass` = value == 0.
    * Single aggregation job regardless of check count. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs: Seq[Column] = checks.zipWithIndex.map { case (c, i) =>
      val col0 = col(c.column)
      val violations: Column = c match {
        case Complete(_) => count(when(col0.isNull, 1))
        case Unique(_) => count(when(col0.isNotNull, 1)) - countDistinct(col0)
        case Bounds(_, lo, hi) =>
          count(when(col0 < lit(lo) || col0 > lit(hi), 1))
        case InSet(_, allowed) =>
          count(when(col0.isNotNull &&
            !col0.isin(allowed.map(lit): _*), 1))
      }
      violations.cast("long").as(s"__c$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        col(s"__c$i").as("violations"), (col(s"__c$i") === 0L).as("pass"))
    }
    row.select(explode(array(entries: _*)).as("r"))
      .select(col("r.check"), col("r.column"), col("r.violations"), col("r.pass"))
  }
}
