package graft.util

import graft.schema.Gdelt
import org.scalatest.funsuite.AnyFunSuite

/** YAML config contract (reference: utils/config.py + settings.example.yaml). */
class ConfigSpec extends AnyFunSuite {

  test("missing file raises") {
    intercept[IllegalArgumentException](Config.load("/nonexistent/settings.yaml"))
  }

  test("empty yaml falls back to Gdelt defaults") {
    val c = Config.parse("")
    assert(c.columns == Gdelt.columns)
    assert(c.filterColumns == Gdelt.defaultFilterColumns)
    assert(c.partitionRules == Gdelt.partitionRules)
    assert(c.defaultSeed == 42L && c.defaultN == 1000 && c.defaultPerDay == 10)
  }

  test("explicit sections override defaults") {
    val c = Config.parse(
      """schema:
        |  columns: [A, B, C]
        |  numeric_columns: [B]
        |filter:
        |  columns_to_check: [A]
        |converter:
        |  partitioning:
        |    rules:
        |      - file_type: yearly
        |        by: [Year]
        |paths:
        |  raw: /data/raw
        |  parquet: /data/pq
        |sampling:
        |  seed: 7
        |  n: 500
        |  per_day: 3
        |""".stripMargin)
    assert(c.columns == Seq("A", "B", "C"))
    assert(c.numericColumns == Set("B"))
    assert(c.filterColumns == Seq("A"))
    assert(c.partitionRules == Map("yearly" -> Seq("Year")))
    assert(c.paths == Map("raw" -> "/data/raw", "parquet" -> "/data/pq"))
    assert(c.defaultSeed == 7L && c.defaultN == 500 && c.defaultPerDay == 3)
  }
}
