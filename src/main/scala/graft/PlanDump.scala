package graft

/** Scratch: dump formatted plans of the round-5 queries (deleted
  * before end of round).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q_tfidf", "q_passage_dedup", "q_mix_report")) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, d)
      df.collect()   // run so AQE finalizes and reuse materializes
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
