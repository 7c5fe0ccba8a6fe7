package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float|double>` columns.
  *
  * Built on higher-order builtins (`zip_with`, `aggregate`,
  * `transform`) which are codegen'd — no UDF serialization, no
  * per-row JVM boxing beyond the array itself. All arithmetic is
  * forced to double so results are reproducible across engines
  * regardless of the stored element width.
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Reference (composable-builtin) cosine — three operand walks plus
    * an intermediate array; kept as the spec cross-check for the
    * native expression.
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native single-pass codegen'd cosine (graft.functions.
    * CosineSimilarity, registered by GraftExtensions) — the hot-loop
    * form ANN scoring uses.
    */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Cosine rounded for stable cross-engine comparison/ranking. */
  def cosineRounded(a: Column, b: Column, scale: Int = 4): Column =
    round(cosine(a, b), scale)

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Sign-random-projection bucket id over `planes` hyperplanes.
    * Plane coefficients are pseudo-random but fully deterministic:
    * coeff(p,d) = (xxhash64(seed,p,d) % 1001)/1000 - 0.5 — derived
    * from codegen'd hashing, no driver-side randomness to ship.
    * Dimensionality comes from each row's own array length — a
    * hardcoded dims that disagreed with the data would null-pad the
    * zip_with, zero every projection, and silently collapse all
    * vectors into one bucket.
    */
  def srpBucket(v: Column, planes: Int, seed: Int = 0): Column =
    srpBucketDyn(v, planes, lit(seed))

  /** Multi-table SRP-LSH: `tables` independent bucket ids (one per
    * hash table, each over its own `planes` hyperplanes), tagged with
    * the table index so buckets from different tables never collide:
    * element t = (t << planes) | srpBits_t(v). Candidate recall is
    * 1-(1-p^planes)^tables for per-plane agreement p = 1-θ/π, so
    * tables buys recall while planes controls bucket selectivity —
    * the standard LSH knob pair.
    */
  def srpBuckets(v: Column, planes: Int, tables: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)), t =>
      call_function("shiftleft", t.cast("long"), lit(planes))
        .bitwiseOR(srpBucketDyn(v, planes, t)))

  /** srpBucket with a column-valued seed (table index). */
  private def srpBucketDyn(v: Column, planes: Int, seed: Column): Column = {
    val dv = toDouble(v)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val proj = aggregate(
        zip_with(dv, sequence(lit(0), size(dv) - 1),
          (x, d) => x * ((pmod(xxhash64(seed, p, d), lit(1001L)).cast("double") / 1000.0) - 0.5)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, b) => acc * 2L + b)
  }
}
