package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns
  * near-duplicate PAIRS (MinHash / SimHash / n-gram Jaccard output)
  * into dedup CLUSTERS with one canonical representative per group.
  *
  * Algorithm: alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014) — the standard shuffle-based CC at web scale. Each
  * round is two keyed aggregations + two joins (no per-node adjacency
  * list is ever collected, so a celebrity node cannot blow a reducer
  * buffer), and the edge set contracts toward a star forest rooted at
  * each component's minimum id in O(log² n) rounds — NOT the O(diam)
  * rounds of naive min-label propagation, which dies on long chains.
  *
  * Driver involvement per round is a single 1-row convergence
  * aggregate; the iteration count is bounded and checked. Lineage is
  * truncated every round with an eager localCheckpoint — on a real
  * cluster this would be `checkpoint` to reliable storage, same shape.
  */
object Components {

  private def canon(e: DataFrame): DataFrame =
    e.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

  /** large-star: every node v in N⁺(u) = {v ∈ N(u) : v > u} re-attaches
    * to m(u) = min(N(u) ∪ {u}). Computed as one groupBy-min plus one
    * join back onto the symmetric edge list. The output is emitted as
    * (v, m) with v > u ≥ m, so it is already oriented large→small with
    * no self-loops — no canon/distinct shuffle here; duplicates (two
    * u's emitting the same pair) are collapsed once by smallStar's
    * closing canon.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
    sym.filter(col("v") > col("u"))
      .join(m, "u")
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** small-star: orient each edge large→small; every smaller neighbor
    * (and u itself) attaches to u's minimum smaller neighbor. Input
    * must be oriented u > v (largeStar's output is); duplicates are
    * tolerated — min-aggregation ignores them and the closing canon
    * collapses them, so each round pays exactly one distinct.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("u").agg(min(col("v")).as("m"))
    val reattach = e.join(m, "u").select(col("v").as("u"), col("m").as("v"))
    val self = m.select(col("u"), col("m").as("v"))
    canon(reattach.union(self))
  }

  /** Edge count below which the contracted graph is solved on the
    * driver: 4M (u,v) longs ≈ 64 MB collected — trivially inside any
    * driver heap, and orders of magnitude cheaper than paying another
    * O(log n) rounds of 6-stage shuffle jobs on a nearly-empty graph.
    */
  val defaultLocalLimit = 4000000L

  /** Driver-side union-find (path halving + min-label roots) over a
    * collected edge list. Returns (node → component-min) star edges.
    * Only called once the DISTRIBUTED contractions have shrunk the
    * edge set under `localLimit` — the standard last-mile hybrid: the
    * big-data rounds guarantee the residue fits, the local solve
    * avoids burning per-job latency on it.
    */
  private def solveLocal(edges: Array[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long](edges.length * 2)
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp); x = gp; p = parent.getOrDefault(x, x)
      }
      x
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { // min-label union: root is always the smaller id
        if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    val keys = parent.keySet().toArray(Array.empty[java.lang.Long])
    keys.iterator.map(k => (k.longValue(), find(k.longValue())))
  }

  /** Star-forest edges (node → component-min) for every non-isolated
    * node. `edges` is an undirected pair list in (srcCol, dstCol).
    *
    * Hybrid execution: alternating-star rounds run distributed while
    * the edge set is large; once the per-round convergence stat shows
    * ≤ `localLimit` edges remain, the residue is collected and solved
    * with driver-side union-find (zero extra shuffle rounds). Set
    * `localLimit = 0` to force pure-distributed execution — the spec
    * asserts both paths produce identical components.
    */
  def starEdges(edges: DataFrame, srcCol: String, dstCol: String,
                maxIter: Int = 25,
                localLimit: Long = defaultLocalLimit): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // fixpoint stat: count + order-free pair checksum, one tiny row
    // (bit_xor, not sum: ANSI mode makes a long sum overflow-fatal)
    def stats(df: DataFrame) =
      df.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
    var e = canon(edges.select(
      col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v")))
      .localCheckpoint(true)
    var prev = stats(e)
    var converged = false
    var it = 0
    while (!converged && prev.getLong(0) > localLimit && it < maxIter) {
      // lazy checkpoint: the stats job below is what materializes (and
      // persists) the round's edge set — one Spark job per round, and
      // the carried `prev` stat means the old set is never re-scanned.
      // (Measured: fusing TWO contractions per job is slower here —
      // the doubled plan depth costs more than the saved round-trip.)
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val cur = stats(next)
      converged = cur == prev
      prev = cur
      e = next
      it += 1
    }
    if (converged)
      e.select(col("u").as("id"), col("v").as("component"))
    else if (prev.getLong(0) <= localLimit) {
      val residue = e.select(col("u"), col("v")).as[(Long, Long)].collect()
      solveLocal(residue).toSeq.toDF("id", "component")
    } else
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
  }

  /** (id, component) for every node present in `edges`; component =
    * minimum node id. Roots map to themselves.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25,
                          localLimit: Long = defaultLocalLimit): DataFrame = {
    val star = starEdges(edges, srcCol, dstCol, maxIter, localLimit)
    // no outer distinct: star rows all have id != component (canon
    // drops self-loops) and the appended root rows all have id ==
    // component, so the branches are disjoint and each duplicate-free
    star.unionByName(
      star.select(col("component").as("id"), col("component")).distinct())
  }

  /** Cluster assignment for a full corpus: every row of `docs` gets a
    * component id (its own id when unmatched — singleton cluster).
    */
  def clusters(docs: DataFrame, idCol: String, pairs: DataFrame,
               srcCol: String, dstCol: String): DataFrame = {
    val comp = connectedComponents(pairs, srcCol, dstCol)
    docs.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("component"))
  }
}
