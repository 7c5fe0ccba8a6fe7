package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Temporary dev probe: print shuffle/leaf counts + BNLJ presence for
  * named queries (PlanSpec golden-ceiling recording). Not a driver
  * contract main; deleted after use.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.get()
    args.drop(1).foreach { q =>
      val p = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
      val h = new AdaptiveSparkPlanHelper {
        def shuffles: Int = collect(p) { case e: ShuffleExchangeExec => e }.size
        def leaves: Int = collectLeaves(p).size
      }
      val s = p.toString
      println(s"[probe] $q shuffles=${h.shuffles} leaves=${h.leaves} " +
        s"bnlj=${s.contains("BroadcastNestedLoop")} cartesian=${s.contains("CartesianProduct")}")
    }
    spark.stop()
  }
}
