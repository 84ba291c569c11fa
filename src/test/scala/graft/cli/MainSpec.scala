package graft.cli

import graft.SparkSpec
import java.nio.file.{Files => JFiles, Paths}

/** CLI contract (reference: main.py:49-57,118-156): error cases fail before
  * any job starts; sample subcommand runs end to end on a parquet input. */
class MainSpec extends SparkSpec {

  private lazy val workDir = JFiles.createTempDirectory("graft_cli").toString

  private lazy val eventsParquet: String = {
    val p = s"$workDir/events_pq"
    graft.Tables.events(spark, sf).write.mode("overwrite").parquet(p)
    p
  }

  test("error contract: unknown command / mode, missing filter, stratify without k") {
    spark // force shared session so Main reuses it instead of creating/stopping
    intercept[IllegalArgumentException](Main.main(Array("frobnicate")))
    intercept[IllegalArgumentException](Main.main(Array(
      "sample", "--in", eventsParquet, "--mode", "bogus")))
    intercept[IllegalArgumentException](Main.main(Array(
      "sample", "--in", eventsParquet, "--mode", "filtered")))
    intercept[IllegalArgumentException](Main.main(Array(
      "sample", "--in", eventsParquet, "--mode", "filtered",
      "--filter", """{"event_type": "click"}""", "--stratify", "event_type")))
    intercept[IllegalArgumentException](Main.main(Array(
      "sample", "--in", eventsParquet, "--mode", "indexed",
      "--columns", "not_a_column")))
  }

  test("sample indexed: exact n rows written") {
    val out = s"$workDir/sample_out"
    Main.main(Array("sample", "--in", eventsParquet, "--mode", "indexed",
      "-n", "50", "--seed", "7", "--out", out))
    assert(spark.read.parquet(out).count() == 50)
  }

  test("sample filtered+stratified: k per stratum, projected columns") {
    val out = s"$workDir/sample_strat"
    Main.main(Array("sample", "--in", eventsParquet, "--mode", "filtered",
      "--filter", """{"value": {"op": "gt", "value": 10}}""",
      "--stratify", "event_type", "--n-per-group", "5",
      "--columns", "event_id", "event_type", "--out", out))
    val df = spark.read.parquet(out)
    assert(df.columns.toSeq == Seq("event_id", "event_type"))
    val max = df.groupBy("event_type").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(max <= 5)
  }

  test("scrape: date-filtered URL listing from file") {
    val f = Paths.get(workDir, "urls.txt")
    JFiles.write(f, "http://x/20150218.export.CSV.zip\nhttp://x/2014.zip\n".getBytes)
    // runs without Spark; output printed — just assert no exception and
    // that start>end is rejected
    Main.main(Array("scrape", "--urls-file", f.toString,
      "--start-date", "2015-01-01", "--end-date", "2015-12-31"))
    intercept[IllegalArgumentException](Main.main(Array(
      "scrape", "--urls-file", f.toString,
      "--start-date", "2016-01-01", "--end-date", "2015-12-31")))
    intercept[IllegalArgumentException](Main.main(Array(
      "scrape", "--urls-file", f.toString, "--start-date", "not-a-date")))
  }
}
