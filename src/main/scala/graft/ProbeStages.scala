package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round probe (guide §1.1/§7.1, local stand-in for the UI):
  * run named queries under a stage listener and print, per query, wall
  * seconds vs summed task time, number of jobs/stages/tasks, and per-stage
  * rows — separates distributed-compute cost from driver/scheduling/AQE
  * overhead, which a tiny fixture otherwise hides.
  *
  * Usage: runMain graft.ProbeStages <sfDir> q_a,q_b[,...]
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warehouseDir =
      s"/tmp/graft_warehouse_probe_${ProcessHandle.current().pid()}"
    // A/B experiment overrides: SPARK_GRAFT_PROBE_CONF="k=v;k=v"
    val extra = sys.env.getOrElse("SPARK_GRAFT_PROBE_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
      }
    val spark0 = SparkSession.builder()
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
    val spark = extra.foldLeft(spark0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var stages = List.empty[(Int, Int, Long, Long, Long, Long)] // id, tasks, runMs, durMs, gcMs, cpuMs
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; e <- si.completionTime}
          yield e - s).getOrElse(0L)
        stages ::= ((si.stageId, si.numTasks,
          si.taskMetrics.executorRunTime, dur, si.taskMetrics.jvmGCTime,
          si.taskMetrics.executorCpuTime / 1000000L))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.contains(n) }
      .foreach { case (name, fn) =>
        // warmup (codegen, memo builds) — mirror Bench methodology
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        stages = Nil; jobs = 0
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain
        val nStages = stages.size
        val nTasks = stages.map(_._2).sum
        val runMs = stages.map(_._3).sum
        val durMs = stages.map(_._4).sum
        val gcMs = stages.map(_._5).sum
        val cpuMs = stages.map(_._6).sum
        println(f"[probe] $name%-32s wall=$wall%6.3fs jobs=$jobs%3d " +
          f"stages=$nStages%3d tasks=$nTasks%5d taskRun=${runMs / 1000.0}%7.2fs " +
          f"stageDur=${durMs / 1000.0}%7.2fs gc=${gcMs / 1000.0}%6.2fs cpu=${cpuMs / 1000.0}%7.2fs")
        stages.sortBy(_._1).foreach { case (id, nt, rm, dm, gm, cm) =>
          println(f"[probe]   stage $id%4d tasks=$nt%4d runMs=$rm%6d durMs=$dm%6d gcMs=$gm%5d cpuMs=$cm%6d")
        }
        graft.queries.QueryCaches.tick()
      }
    graft.queries.QueryCaches.clear()
    spark.stop()
    graft.util.Scratch.deleteRecursively(warehouseDir)
    graft.queries.StreamTwinQueries.cleanupScratch()
    graft.queries.ParityQueries.cleanupScratch()
  }
}
