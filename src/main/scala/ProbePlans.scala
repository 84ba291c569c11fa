import org.apache.spark.sql.SparkSession

object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = Seq("q_eng_customer_dist", "q_eng_discount_revenue",
      "q_eng_mad_outliers", "q_eng_attribution", "q_eng_chi_square",
      "q_eng_merge_upsert", "q_eng_kmv_sets", "q_eng_user_paths",
      "q_eng_brand_velocity", "q_eng_tumbling", "q_eng_shortest_path",
      "q_sim_matryoshka", "q_text_zipf_slope", "q_text_textrank",
      "q_mm_blur_energy", "q_mm_audio_silence", "q_sample_balanced")
    for (n <- names) {
      println(s"\n========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
