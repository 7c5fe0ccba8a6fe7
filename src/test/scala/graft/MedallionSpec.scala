package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Medallion

/** End-to-end medallion flow over the testdata mapping. */
class MedallionSpec extends SparkSpec {
  import spark.implicits._

  test("silver -> gold round trip: dim/fact consistent, zero orphans") {
    val raw = Medallion.rawFromOrders(spark, sf())
    val catalog = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_name"))
    val silver = Medallion.silver(raw, catalog, "c_custkey", "c_name", 2026).cache()

    assert(silver.columns.toSet.contains("id_unico"))
    // RN-003: estados normalized
    val estados = silver.select("estado").distinct().as[String].collect().toSet
    assert(estados.forall(e => e == e.trim && e == e.toUpperCase))
    // RN-001: all dates parsed (both raw formats round-trip)
    assert(silver.filter(col("fecha_matricula").isNull).count() == 0)

    val (dim, fact, orphans) = Medallion.gold(silver,
      dimCols = Seq("matricula", "clase_identificacion", "titular_name"),
      factCols = Seq("matricula", "id_titular", "antiguedad"),
      vigenciaDate = java.sql.Date.valueOf("1998-12-01"))
    assert(dim.count() == silver.count())  // matricula unique
    assert(fact.count() == silver.count())
    assert(fact.columns.contains("dias_vigencia") && fact.columns.contains("flag_vencido"))
    assert(orphans.as[Long].head() == 0L) // fact keys all present in dim
  }

  test("silver RN-002 collapses duplicate matriculas latest-wins") {
    // duplicate every matricula with an older date; silver must keep
    // exactly the newer row
    val raw = Medallion.rawFromOrders(spark, sf()).limit(50)
    val older = raw.withColumn("FechaMatricula", lit("19900101"))
    val dup = raw.unionByName(older)
    val catalog = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_name"))
    val silver = Medallion.silver(dup, catalog, "c_custkey", "c_name", 2026)
    assert(silver.count() == 50)
    assert(silver.filter(year(col("fecha_matricula")) === 1990).count() == 0)
  }

  test("trainSplit: deterministic, disjoint, covering, roughly weighted") {
    val docs = Tables.documents(spark, sf())
    val s1 = graft.pipeline.CorpusPrep.trainSplit(docs, "doc_id")
    val counts = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(total == docs.count())                    // covering
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train").toDouble / total - 0.8) < 0.08)
    // deterministic
    val s2 = graft.pipeline.CorpusPrep.trainSplit(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts == s2)
    // a different salt reshuffles membership but keeps sizes similar
    val salted = graft.pipeline.CorpusPrep.trainSplit(docs, "doc_id", salt = 7)
    val moved = s1.select(col("doc_id"), col("split").as("a"))
      .join(salted.select(col("doc_id"), col("split").as("b")), "doc_id")
      .filter(col("a") =!= col("b")).count()
    assert(moved > 0)
  }

  test("silverObserved: in-flight metrics match actual counts, zero extra jobs") {
    val raw = Medallion.rawFromOrders(spark, sf())
    val catalog = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_name"))
    val (out, inObs, outObs) =
      Medallion.silverObserved(raw, catalog, "c_custkey", "c_name", 2026)
    val actualOut = out.count() // the ONE action; observe piggybacks on it
    assert(inObs.get("rows_in") == raw.count())
    assert(outObs.get("rows_out") == actualOut)
    val actualNullDates = out.filter(col("fecha_matricula").isNull).count()
    assert(outObs.get("null_dates") == actualNullDates)
  }
}
