package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = s"/tmp/graft_manifest_spec_$name"
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
    p
  }

  test("manifest records one row per file with true min/max/count") {
    val dir = freshDir("m1")
    Layout.writeSorted((1L to 1000L).toDF("k"), Seq(col("k")), dir, targetFiles = 4)
    val m = Layout.manifest(spark, dir, "k")
      .select("min_key", "max_key", "n_rows")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(m.length == 4)
    assert(m.map(_._3).sum == 1000L)
    // sorted write ⇒ disjoint, ordered ranges covering 1..1000
    assert(m.head._1 == 1L && m.last._2 == 1000L)
    m.sliding(2).foreach { case Array(a, b) => assert(a._2 < b._1); case _ => }
  }

  test("prunedRead equals the full filtered read but opens fewer files") {
    val dir = freshDir("m2")
    Layout.writeSorted((1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v"),
      Seq(col("k")), dir, targetFiles = 4)
    val pruned = Layout.prunedRead(spark, dir, "k", 100L, 150L)
    val full = spark.read.parquet(dir).where(col("k").between(100L, 150L))
    assert(pruned.select("k").as[Long].collect().sorted.toSeq ==
      full.select("k").as[Long].collect().sorted.toSeq)
    assert(pruned.inputFiles.length < spark.read.parquet(dir).inputFiles.length,
      s"expected file-level pruning, got ${pruned.inputFiles.length} files")
  }

  test("a range outside every file's bounds reads nothing") {
    val dir = freshDir("m3")
    Layout.writeSorted((1L to 100L).toDF("k"), Seq(col("k")), dir, targetFiles = 2)
    assert(Layout.prunedRead(spark, dir, "k", 5000L, 6000L).count() == 0)
  }
}
