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
}
