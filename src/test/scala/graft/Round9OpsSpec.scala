package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.util.sketch.CountMinSketch
import graft.operators.{HeavyHitters, Sampling, TokenBudget}

/** Round-9 operators: Count-Min heavy hitters and token-budget
  * corpus mixing.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf()).cache()

  test("CMS: SQL-built sketch answers String probes exactly on a collision-free vocab") {
    // the check harness deserializes the SQL aggregate's binary and
    // probes it with java Strings — this pins that the two item
    // encodings (UTF8String bytes added, String probed) hash alike
    val df = Seq("a a b b b c", "c c a").toDF("text")
    val bytes = df.select(explode(split(col("text"), " ")).as("t"))
      .agg(count_min_sketch(col("t"), lit(0.01), lit(0.99), lit(42)))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    assert(cms.totalCount() === 9L)
    assert(cms.estimateCount("a") === 3L)
    assert(cms.estimateCount("b") === 3L)
    assert(cms.estimateCount("c") === 3L)
    assert(cms.estimateCount("zzz") === 0L)
  }

  test("heavy hitters: sketch estimates bound the exact counts (never under, within eps*N)") {
    // the sf0.001 synthetic vocabulary has ~31 distinct terms, so
    // k=20 keeps the top-k meaningful (k < |vocab|)
    val out = HeavyHitters.topTermsSketchCheck(spark, docs, "text", k = 20).cache()
    assert(out.count() === 20L)
    assert(out.filter(!col("est_ge_exact") || !col("est_within_eps")).count() === 0L)
    // top-k agrees with the exact form
    val exact = HeavyHitters.topTerms(docs, "text", 20)
      .as[(String, Long)].collect().toSeq
    val checked = out.orderBy(col("cnt").desc, col("term").asc)
      .select("term", "cnt").as[(String, Long)].collect().toSeq
    assert(checked === exact)
  }

  test("token budget: two-level prefix-sum selection == naive global-window selection") {
    val budget = 3000L
    val sel = TokenBudget.select(docs, "doc_id", "source", "text", budget)
      .cache()
    // naive reference: ONE window per source (the funnel form)
    val base = docs.select(col("doc_id"), col("source"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"),
      Sampling.portableOrdering("doc_id").as("ord"))
    val bySrc = base.groupBy("source").agg(sum("n_tok").as("src_tok"))
    val all = bySrc.agg(sum("src_tok")).head().getLong(0).toDouble
    val quotas = bySrc.select(col("source"),
      floor(lit(budget.toDouble) * (col("src_tok").cast("double") / lit(all)))
        .cast("long").as("quota"))
    val naive = base.withColumn("before",
        coalesce(sum("n_tok").over(
          Window.partitionBy("source").orderBy(col("ord"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)),
          lit(0L)))
      .join(quotas, "source")
      .filter(col("before") < col("quota"))
      .select("doc_id").as[Long].collect().toSet
    assert(sel.select("doc_id").as[Long].collect().toSet === naive)
    assert(naive.nonEmpty, "budget selects a non-trivial subset")
    assert(naive.size < docs.count(), "budget must not select everything")

    // every quota is met, overshoot bounded by the boundary document
    val perSrc = TokenBudget.report(sel, "source").join(quotas, "source")
      .join(sel.groupBy("source").agg(max("n_tok").as("max_tok")), "source")
      .select("source", "kept_tokens", "quota", "max_tok")
      .as[(String, Long, Long, Long)].collect()
    assert(perSrc.nonEmpty)
    perSrc.foreach { case (src, kept, quota, maxTok) =>
      assert(kept >= quota, s"$src under quota: $kept < $quota")
      assert(kept - quota < maxTok, s"$src overshoot $kept-$quota >= $maxTok")
    }
  }

  test("token budget: zero budget selects nothing") {
    assert(TokenBudget.select(docs, "doc_id", "source", "text", 0L).count() === 0L)
  }
}
