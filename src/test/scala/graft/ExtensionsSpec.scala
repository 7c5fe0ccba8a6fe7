package graft

import org.apache.spark.sql.functions._

/** The injected extension points: SQL-reachable native function and
  * the normalize-collapse optimizer rule.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim reachable from SQL") {
    val r = spark.sql("SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
      .as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("native simhash64 is bit-identical to the HOF composition") {
    val both = Tables.documents(spark, sf())
      .select(graft.dedup.SimHash.simhash("text").as("native"),
        graft.dedup.SimHash.simhashHof("text").as("hof"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) => assert(n == h, f"native=$n%x hof=$h%x") }
  }

  test("CollapseRedundantNormalize folds stacked upper/trim chains") {
    // parquet-backed column: constant folding can't pre-evaluate it
    val df = Tables.orders(spark, sf())
      .select(upper(trim(upper(trim(col("o_orderstatus"))))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    // exactly one upper and one trim survive
    assert("(?i)upper".r.findAllIn(optimized).size == 1, optimized)
    assert("(?i)trim".r.findAllIn(optimized).size == 1, optimized)
    val plain = Tables.orders(spark, sf())
      .select(upper(trim(col("o_orderstatus"))).as("n"))
    assert(df.as[String].collect().toSeq == plain.as[String].collect().toSeq)
  }

  test("the rule leaves single normalizations alone") {
    val df = Tables.orders(spark, sf())
      .select(upper(trim(col("o_orderstatus"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("(?i)upper".r.findAllIn(optimized).size == 1)
    assert("(?i)trim".r.findAllIn(optimized).size == 1)
  }
}
