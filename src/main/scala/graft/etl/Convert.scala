package graft.etl

import graft.schema.Gdelt
import graft.sources.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files => JFiles, Paths}

/** Convert stage: raw GDELT TSV → typed parquet, flat (daily) or
  * Hive-partitioned (monthly/yearly historical). SURVEY.md §2.1 S6–S11,
  * §3.2; reference: conversion/converter.py.
  *
  * Spark-first shape: one declarative read + cast pipeline, two write
  * modes. What the reference does per-file in a Python loop (glob, unzip,
  * pandas read, groupby partition keys, one parquet per group) collapses
  * into `spark.read.csv(...)` over many files at once and
  * `write.partitionBy(...)`, which generates the identical
  * `Year=…/MonthYear=…` directory layout with distributed shuffle-free
  * writes (dynamic partition insert). At 100 TB this is the difference
  * between a single-process file loop and a cluster-wide scan.
  */
object Convert {

  /** Read headerless tab-separated GDELT CSV with the injected all-string
    * 61-column schema (converter.py:214-223). DROPMALFORMED ≈ the
    * reference's `on_bad_lines="warn"` skip-and-continue contract, with one
    * documented divergence (SURVEY.md §7.4): Spark drops rows with *either*
    * too many or too few fields, while pandas null-pads short rows — the
    * stricter "skip bad lines" reading. NB: malformed detection only runs
    * for columns the plan actually reads; a bare `count()` on the raw CSV
    * counts physical lines (column pruning reads none) — materialize
    * through the parquet sink before relying on row counts. */
  def readRawTsv(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "false")
      .option("mode", "DROPMALFORMED")
      .schema(Gdelt.rawSchema)
      .csv(paths: _*)

  /** Numeric coercion (converter.py:225-227, 246-250): 19 configured
    * columns → double via try_cast (null on parse failure, matching
    * `pd.to_numeric(errors="coerce")` under Spark 4's default ANSI mode),
    * and Year/MonthYear/Day → nullable long (via double, so "2013.0"
    * coerces the way pandas' numeric path does). */
  def coerce(df: DataFrame): DataFrame = {
    val projected = df.columns.map { c =>
      if (Gdelt.intColumns.contains(c))
        col(c).try_cast("double").cast("long").as(c)
      else if (Gdelt.numericColumns.contains(c))
        col(c).try_cast("double").as(c)
      else col(c)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** Flat write: one snappy parquet dataset (converter.py:238-262). */
  def writeFlat(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy").parquet(outDir)

  /** Hive-partitioned historical write (converter.py:267-313): drop rows
    * with null partition keys, then `partitionBy` — Spark emits the same
    * `col=val/` directory tree the reference builds by hand with a pandas
    * groupby loop. */
  def writeHistorical(df: DataFrame, histDir: String, fileType: String): Unit = {
    val partCols = Gdelt.partitionRules.getOrElse(fileType,
      throw new IllegalArgumentException(s"No partition rule for file type '$fileType'"))
    df.na.drop("any", partCols)
      .write.mode("append")
      .option("compression", "snappy")
      .partitionBy(partCols: _*)
      .parquet(histDir)
  }

  /** Idempotency marker twins (converter.py:118-125): historical inputs
    * are skipped when `<name>.done` exists next to them. */
  def isDone(zipOrCsvPath: String): Boolean =
    JFiles.exists(Paths.get(zipOrCsvPath + ".done"))
  def markDone(zipOrCsvPath: String): Unit = {
    val p = Paths.get(zipOrCsvPath + ".done")
    if (!JFiles.exists(p)) JFiles.createFile(p)
  }

  /** Full stage over a set of extracted TSV files: route daily files to the
    * flat dataset and monthly/yearly files to the Hive tree, honoring
    * `.done` markers for historical inputs (converter.py:146-155).
    * Returns (daily, historical, skipped) file counts. */
  def run(spark: SparkSession, tsvFiles: Seq[String], flatDir: String,
          histDir: String): (Int, Int, Int) = {
    val byType = tsvFiles.groupBy(p => Files.detectFileType(fileZipName(p)))
    val daily = byType.getOrElse("daily", Nil)
    if (daily.nonEmpty) writeFlat(coerce(readRawTsv(spark, daily)), flatDir)
    var hist = 0
    var skipped = 0
    Seq("monthly", "yearly").foreach { ft =>
      val (done, todo) = byType.getOrElse(ft, Nil).partition(isDone)
      skipped += done.size
      if (todo.nonEmpty) {
        writeHistorical(coerce(readRawTsv(spark, todo)), histDir, ft)
        todo.foreach(markDone)
        hist += todo.size
      }
    }
    (daily.size, hist, skipped)
  }

  /** Map an extracted TSV/CSV path back to the zip-style name used for
    * type detection: `20130401.export.CSV` → `20130401.export.CSV.zip`. */
  private def fileZipName(path: String): String = {
    val name = Paths.get(path).getFileName.toString
    val base = name.stripSuffix(".tsv").stripSuffix(".csv").stripSuffix(".CSV")
    if (base.matches("""\d{8}\.export""")) s"$base.CSV.zip" else s"$base.zip"
  }
}
