package graft

/** Dev-loop timing harness: time named SparkEntry queries on a data
  * dir (FULL materialization via toRdd — count() would let Catalyst
  * prune computed projections the baseline engine pays for; the same
  * measurement discipline as Bench, without the tier machinery).
  * Not part of the driver contract.
  *
  * usage: runMain graft.TimeQ <sfDir> <runs> <q1> [q2...]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    // JIT warm-up on the smallest SF
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try exec(fn(spark, "/root/testdata/sf0.001"))
        catch { case _: Throwable => () }
      }
    }
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          val ts = (1 to runs).map { _ =>
            spark.sharedState.cacheManager.clearCache()
            // same inter-run discipline as Bench: enqueue the prior
            // run's weak refs so the ContextCleaner frees shuffle
            // blocks/broadcasts OUTSIDE the timed window (without it
            // sf30 back-to-back runs degraded 14 -> 24 -> 34 s)
            System.gc(); Thread.sleep(300)
            val t0 = System.nanoTime()
            exec(fn(spark, dir))
            (System.nanoTime() - t0) / 1e9
          }
          println(f"TIMEQ $n min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
        case None => println(s"TIMEQ $n UNKNOWN")
      }
    }
    spark.stop()
  }
}
