package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.sources.Writers

/** The write-once-shuffle-never contract of bucketed tables: an
  * equi-join of two tables bucketed on the join key must contain NO
  * shuffle exchange in its physical plan.
  */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("join of co-bucketed tables is exchange-free") {
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf()).select("c_custkey", "c_mktsegment")
    Writers.bucketedTable(orders, "b_orders", Seq("o_custkey"), 8)
    Writers.bucketedTable(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", Seq("o_custkey"), 8)

    val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      .groupBy("c_mktsegment").agg(round(sum("o_totalprice"), 2).as("st"))

    // force SMJ so a missing bucket optimization would need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val result = joined.collect()
      assert(result.nonEmpty)
      val plan = joined.queryExecution.executedPlan
      val shuffles = collect(plan) { case s: ShuffleExchangeExec => s }
      // the groupBy on c_mktsegment shuffles (different key — expected);
      // the JOIN itself must not. With co-bucketed inputs the only
      // exchange allowed is the post-join aggregation one.
      assert(shuffles.size <= 1,
        s"expected at most the aggregation exchange, got ${shuffles.size}:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
