package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round measurement tool (guide §1.2/§7.2): dump
  * `.explain("formatted")` for the named queries (or the full suite) to
  * one file per query, so plan-shape claims in OPTIMIZATION_r*.md are
  * auditable without running Spark.
  *
  * Usage: runMain graft.Plans <sfDir> <outDir> [q_a,q_b,...]
  *
  * Session config mirrors Bench exactly — the plans must describe the
  * benched execution (same master/core count, same split sizing, same
  * AQE initial-partition scaling), not some other session's.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warehouseDir =
      s"/tmp/graft_warehouse_plans_${ProcessHandle.current().pid()}"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "524288")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.util.PartitionSizing.initialPartitions(sfDir, cpus.toInt)
          .toString)
      // AQE for cached-plan materialization — rationale in Bench.scala
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // allow shuffled-hash where its size conditions hold — rationale in
      // Bench.scala (opt r14, guide §3.1/§9)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
          System.err.println(s"[plans] $name ok")
        } catch { case e: Throwable =>
          System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
        }
        graft.queries.QueryCaches.tick()
        graft.queries.QueryCaches.evictStale(25)
      }
    graft.queries.QueryCaches.clear()
    spark.stop()
    graft.util.Scratch.deleteRecursively(warehouseDir)
    graft.queries.StreamTwinQueries.cleanupScratch()
    graft.queries.ParityQueries.cleanupScratch()
  }
}
