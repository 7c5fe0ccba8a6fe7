package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the standard reduce-before-index
  * step of a vector pipeline (project to the top-k principal
  * components, then hand the short vectors to IVF/LSH/SQ8; at equal
  * recall the index probes a fraction of the bytes).
  *
  * Scale shape: FIT is one corpus pass computing the d-vector sum and
  * d×d raw second-moment matrix per partition (a numeric kernel —
  * mapPartitions is the right tool, exactly how Spark MLlib's
  * RowMatrix.computeCovariance treeAggregates), reduced on the driver
  * over #partitions bounded d×d blocks: the driver never sees rows,
  * only (parts × d²) doubles. The eigensolve is a local cyclic
  * Jacobi on the d×d covariance — d is the embedding width, so this
  * is microseconds and needs no distributed linear algebra. PROJECT
  * is a pure narrow HOF map (components baked in as literals):
  * zero exchanges at any corpus size.
  *
  * Determinism: partition-order float drift in the moment sums is
  * killed by rounding the covariance to 1e-9 before the eigensolve;
  * eigenvector sign is canonicalized (largest-|coordinate| entry made
  * positive), so the model is a pure function of the data.
  */
object Pca {

  final case class Model(mean: Array[Double],
                         components: Array[Array[Double]], // k rows, d cols
                         eigenvalues: Array[Double]) {
    def d: Int = mean.length
    def k: Int = components.length
  }

  /** Evaluate `x` once per row (the TextFunctions.bindOnce trick). */
  private def bindOnce(x: Column, body: Column => Column): Column =
    element_at(transform(array(x), body), 1)

  /** Fit the top-`k` principal components of `vecCol`
    * (array<float|double>, constant width).
    */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    // per-partition (n, sum[d], upper-triangular raw moment [d*(d+1)/2])
    val partials = df.select(col(vecCol)).as[Seq[Float]]
      .mapPartitions { it =>
        var n = 0L
        var s: Array[Double] = null
        var m: Array[Double] = null
        it.foreach { v =>
          val d = v.length
          if (s == null) { s = new Array[Double](d); m = new Array[Double](d * (d + 1) / 2) }
          require(v.length == s.length,
            s"ragged embedding width: ${v.length} vs ${s.length}")
          n += 1
          var i = 0
          var t = 0
          while (i < d) {
            val xi = v(i).toDouble
            s(i) += xi
            var j = i
            while (j < d) { m(t) += xi * v(j).toDouble; t += 1; j += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty else Iterator.single((n, s, m))
      }.collect() // bounded: one (d + d²/2)-double block per partition
    require(partials.nonEmpty, "PCA fit on an empty frame")
    val d = partials.head._2.length
    require(k >= 1 && k <= d, s"k must be in [1, $d]: $k")
    val n = partials.map(_._1).sum
    val sum = new Array[Double](d)
    val mom = new Array[Double](d * (d + 1) / 2)
    partials.foreach { case (_, s, m) =>
      var i = 0
      while (i < d) { sum(i) += s(i); i += 1 }
      var t = 0
      while (t < mom.length) { mom(t) += m(t); t += 1 }
    }
    val mean = sum.map(_ / n)
    // covariance = E[xxᵀ] - μμᵀ, rounded so partition-order float
    // drift can't flip a near-degenerate eigenpair between runs
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = math.rint((mom(t) / n - mean(i) * mean(j)) * 1e9) / 1e9
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.zipWithIndex.sortBy(-_._1).take(k).map(_._2)
    val comps = order.map { c =>
      val w = Array.tabulate(d)(r => vectors(r)(c))
      // sign canon: the largest-|coordinate| entry is positive
      val pivot = w.indices.maxBy(ix => (math.abs(w(ix)), -ix))
      if (w(pivot) < 0) w.map(-_) else w
    }
    Model(mean, comps, order.map(values))
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix: returns
    * (eigenvalues, eigenvector MATRIX with vectors in columns).
    * O(d³) per sweep on the driver — d is the embedding width.
    */
  private[ann] def jacobiEigen(a0: Array[Array[Double]],
                               maxSweeps: Int = 100,
                               tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val sgn = if (theta >= 0) 1.0 else -1.0
            val tt = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Projection column: y_c = Σ_i (x_i − μ_i)·W_ci for each kept
    * component — a narrow codegen'd HOF chain, zero exchanges.
    */
  def projectCol(vec: Column, model: Model): Column = {
    val meanLit = typedlit(model.mean.toSeq)
    val compsLit = typedlit(model.components.map(_.toSeq).toSeq)
    bindOnce(zip_with(transform(vec, x => x.cast("double")), meanLit,
      (x, m) => x - m), centered =>
      transform(compsLit, w =>
        aggregate(zip_with(centered, w, (x, c) => x * c),
          lit(0.0), (acc, x) => acc + x)))
  }

  /** Fit on `df`, append `outCol` = the k-dim projection. */
  def fitProject(df: DataFrame, vecCol: String, k: Int,
                 outCol: String = "pca"): DataFrame =
    df.withColumn(outCol, projectCol(col(vecCol), fit(df, vecCol, k)))
}
