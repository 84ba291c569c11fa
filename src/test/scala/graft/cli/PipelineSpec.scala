package graft.cli

import graft.SparkSpec
import graft.schema.Gdelt
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import java.nio.file.{Files => JFiles, Paths}

/** End-to-end GDELT volume drill (round-5 verdict #8): ONE CLI invocation
  * chains gdelt-tsv DSv2 read → type-routed convert (flat ∪ Hive tree) →
  * day-range re-read (Hive side partition-pruned) → null-check filter →
  * daily sample, over a multi-day fixture mixing daily and monthly files.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  /** One 61-field TSV line; numeric/filter columns are parseable, the
    * rest carry opaque strings. `a1` empties Actor1Name (nulls after read,
    * so the filter stage drops the row). */
  private def line(id: Long, day: Long, a1: String = "actor"): String =
    Gdelt.columns.map {
      case "GlobalEventID" => id.toString
      case "Day" => day.toString
      case "MonthYear" => (day / 100).toString
      case "Year" => (day / 10000).toString
      case "FractionDate" => "2013.2500"
      case "Actor1Name" => a1
      case "Actor2Name" => s"other$id"
      case "QuadClass" => ((id % 4) + 1).toString
      case "GoldsteinScale" => "2.5"
      case "NumMentions" | "NumSources" | "NumArticles" => "3"
      case "AvgTone" => "1.25"
      case "IsRootEvent" => "1"
      case c if c.endsWith("Geo_Lat") => "10.5"
      case c if c.endsWith("Geo_Long") => "-20.25"
      case c if c.endsWith("Geo_Type") => "1"
      case "DATEADDED" => day.toString
      case c => s"$c-$id"
    }.mkString("\t")

  private lazy val rawDir = {
    val d = JFiles.createTempDirectory("graft_pipe_raw").toString
    def write(name: String, lines: Seq[String]): Unit =
      JFiles.write(Paths.get(d, name), lines.mkString("\n").getBytes)
    // three daily files; one row on 0401 has an empty Actor1Name → filtered
    write("20130401.export.CSV",
      (1L to 5L).map(i => line(i, 20130401L)) :+ line(6L, 20130401L, a1 = ""))
    write("20130402.export.CSV", (11L to 15L).map(i => line(i, 20130402L)))
    write("20130403.export.CSV", (21L to 25L).map(i => line(i, 20130403L)))
    // one monthly file (Hive tree): days in 201303
    write("201303.csv", (31L to 38L).map(i => line(i, 20130301L + (i % 3))))
    d
  }

  test("one pipeline invocation: DSv2 read, typed flat+hive sinks, pruned re-read, filter, daily sample") {
    val work = JFiles.createTempDirectory("graft_pipe_out").toString
    Main.main(Array("pipeline", "--in", rawDir, "--out", work,
      "--start-day", "20130401", "--end-day", "20130402",
      "--per-day", "2", "--seed", "7"))

    // the converted flat dataset carries the typed 61-column schema
    val flat = spark.read.parquet(s"$work/flat")
    assert(flat.schema.fieldNames.toSeq == Gdelt.columns)
    assert(flat.schema("Day").dataType == LongType)
    assert(flat.schema("GoldsteinScale").dataType == DoubleType)
    assert(flat.count() == 16, "3 daily files x rows, incl. the null-actor row")

    // the Hive tree got the monthly rows under Year=/MonthYear=
    assert(JFiles.exists(Paths.get(s"$work/hist/Year=2013/MonthYear=201303")))

    // filter dropped the null-actor row; day range excluded 0403 + monthly
    val filtered = spark.read.parquet(s"$work/filtered")
    assert(filtered.select("Day").as[Long].collect().toSet == Set(20130401L, 20130402L))
    assert(filtered.where(col("Day") === 20130401L).count() == 5,
      "empty Actor1Name row must be dropped by the check-column filter")

    // daily sample: at most per-day rows for each surviving day
    val sample = spark.read.parquet(s"$work/sample")
    val byDay = sample.groupBy("Day").count()
      .as[(Long, Long)].collect().toMap
    assert(byDay.keySet == Set(20130401L, 20130402L))
    assert(byDay.values.forall(_ == 2))
  }

  test("a day range inside the monthly period samples the Hive side; pruning reaches PartitionFilters") {
    val work = JFiles.createTempDirectory("graft_pipe_out2").toString
    Main.main(Array("pipeline", "--in", rawDir, "--out", work,
      "--start-day", "20130301", "--end-day", "20130331",
      "--per-day", "3", "--seed", "7"))
    val sample = spark.read.parquet(s"$work/sample")
    assert(sample.select("Day").as[Long].collect()
      .forall(d => d >= 20130301L && d <= 20130303L))
    assert(sample.count() > 0)

    // the pruned Hive scan: partition predicates reach PartitionFilters
    val pruned = spark.read.parquet(s"$work/hist")
      .where(col("Year").between(2013, 2013) &&
        col("MonthYear").between(201303, 201303))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("MonthYear"),
      s"expected MonthYear partition filters in:\n$plan")
    // and a disjoint range prunes every partition without touching data
    val none = spark.read.parquet(s"$work/hist")
      .where(col("Year").between(2014, 2014) &&
        col("MonthYear").between(201401, 201401))
    assert(none.count() == 0)
  }

  test("error contract: start-day after end-day is rejected before any job") {
    intercept[IllegalArgumentException] {
      Main.main(Array("pipeline", "--in", rawDir, "--out", "/tmp/nope",
        "--start-day", "20130402", "--end-day", "20130401"))
    }
  }
}
