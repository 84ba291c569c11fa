package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution contract for directory tables: a corpus grows columns
  * over time (new quality signals, new metadata) and the reader must
  * unify old and new files without rewriting history. Parquet +
  * `mergeSchema` is the built-in path; [[Versioned]] keeps per-version
  * schemas immutable, so time travel returns exactly what was committed
  * while the live read sees the evolved shape. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val root = s"/tmp/graft_schema_evo_${sys.props.getOrElse("user.name", "ci")}"

  test("mergeSchema unifies appended files with a new column; old rows read null") {
    val dir = s"$root/append"
    Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      .write.mode("overwrite").parquet(dir)
    Seq((3L, "c", 0.9), (4L, "d", 0.2)).toDF("id", "text", "quality")
      .write.mode("append").parquet(dir)
    val unified = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(unified.columns.sorted.toSeq == Seq("id", "quality", "text"))
    val rows = unified.select("id", "quality").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty)
    assert(rows(3L).contains(0.9) && rows(4L).contains(0.2))
  }

  test("versioned commits evolve schema; time travel returns the as-committed shape") {
    val dir = s"$root/versioned"
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(dir), true)
    Versioned.commit(spark, dir, Seq((1L, "a")).toDF("id", "text"))
    Versioned.commit(spark, dir,
      Seq((1L, "a", 0.7)).toDF("id", "text", "quality"))
    assert(Versioned.readVersion(spark, dir, 0).columns.toSeq == Seq("id", "text"))
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("id", "text", "quality"))
    assert(Versioned.read(spark, dir).select(sum(col("quality"))).head().getDouble(0) == 0.7)
  }
}
