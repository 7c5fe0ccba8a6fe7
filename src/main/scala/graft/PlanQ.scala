package graft

/** Dev-loop plan dump: print the executed plan of named SparkEntry
  * queries on a data dir — the `.explain` half of the TimeQ loop.
  * Not part of the driver contract.
  *
  * usage: runMain graft.PlanQ <sfDir> <q1> [q2...]
  */
object PlanQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          val df = fn(spark, dir)
          println(s"===== $n (initial) =====")
          println(df.queryExecution.executedPlan.toString)
          df.collect() // materialize THIS execution so AQE finalizes stage reuse
                       // (count() would spawn a separate QueryExecution)
          println(s"===== $n (final) =====")
          println(df.queryExecution.executedPlan.toString)
        case None => println(s"===== $n UNKNOWN =====")
      }
    }
    spark.stop()
  }
}
