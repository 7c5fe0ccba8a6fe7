package graft

import org.apache.spark.sql.functions._

/** Round-11 operator-form gates: the persisted HLL store benched
  * alone (q_hll_store) and the standalone sketch-overlap matrix
  * (q_overlap_sketch) — both split out of their exact-envelope check
  * harnesses per the r10 verdict.
  */
class Round11OpsSpec extends SparkSpec {

  test("q_hll_store: merged delta estimates are lossless vs a from-scratch build") {
    val out = SparkEntry.queries("q_hll_store")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // from-scratch single-pass store over the SAME projection: union
    // at fixed lgK is register-wise max, so estimates must be
    // IDENTICAL, not merely close
    val o = Tables.orders(spark, sf())
      .select(year(col("o_orderdate")).cast("long").as("part"),
        col("o_orderkey"), col("o_custkey"))
    val scratch = graft.operators.SketchStore.estimates(
      graft.operators.SketchStore.build(o, "part", col("o_custkey")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val perPart = out.filter(_._1 >= 0)
    assert(perPart.nonEmpty)
    perPart.foreach { case (p, n, est) =>
      val (sn, sest) = scratch(p)
      assert(n == sn, s"part $p n_rows $n != $sn")
      assert(est == sest, s"part $p merged est $est != from-scratch $sest")
    }
    // the rollup row: n_rows sums the store, estimate within the
    // 10%-envelope of the exact global distinct
    val global = out.filter(_._1 == -1L)
    assert(global.length == 1)
    assert(global.head._2 == perPart.map(_._2).sum)
    val exact = o.select("o_custkey").distinct().count()
    assert(math.abs(global.head._3 - exact).toDouble / exact <= 0.1)
  }

  test("q_overlap_sketch: estimates sit inside the check harness envelope") {
    // the standalone operator must estimate the same matrix the
    // exact+sketch harness (q_source_overlap_sketch, oracle-green)
    // checks: for every pair, |est_shared - exact_shared| within
    // 5% of (n_a + n_b) + 50 — the harness's own tolerance
    val est = SparkEntry.queries("q_overlap_sketch")(spark, sf())
      .select("src_a", "src_b", "est_shared")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val exact = graft.operators.SourceOverlap.matrix(
      Tables.documents(spark, sf()), "source", col("text"), k = 3)
      .select("src_a", "src_b", "shared_shingles", "n_a", "n_b")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(exact.nonEmpty)
    assert(est.keySet == exact.map(_._1).toSet)
    exact.foreach { case (k, (shared, na, nb)) =>
      assert(math.abs(est(k) - shared) <= 0.05 * (na + nb) + 50,
        s"pair $k est ${est(k)} vs exact $shared (n_a=$na n_b=$nb)")
    }
  }
}
