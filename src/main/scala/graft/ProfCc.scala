package graft
object ProfCc {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (i <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      time(s"clusters$i") { SparkEntry.queries("q_dedup_clusters")(spark, sf).count() }
      time(s"ngram$i") { SparkEntry.queries("q_ngram_jaccard")(spark, sf).count() }
    }
    spark.stop()
  }
}
