package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    // args = query names to dump; no args = the default interesting set
    val interesting = if (args.nonEmpty) args.toSeq else Seq(
      "q_scan_project", "q_filter", "q_agg_hash",
      "q_join_broadcast", "q_join_inner", "q_sort_limit", "q_sim_cosine",
      "q_dedup_embed", "q_topk_pergroup", "q_chunk_split", "q_contamination",
      "q_pii_scrub", "q_sample_stratified")
    // PLAN_EXEC=1: run the query first so the printed plan is the FINAL
    // adaptive one (isFinalPlan=true) — runtime stage reuse / AQEShuffleRead
    // only appear there
    val exec = sys.env.get("PLAN_EXEC").contains("1")
    interesting.foreach { name =>
      println(s"########## $name")
      val df = SparkEntry.queries(name)(spark, dir)
      if (exec) df.collect() // executes THIS QueryExecution → final AQE plan
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
