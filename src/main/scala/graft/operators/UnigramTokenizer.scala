package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Unigram-LM (SentencePiece-style) tokenizer training — the OTHER
  * vocabulary-induction algorithm a training-data pipeline ships
  * (Kudo 2018, arXiv:1804.10959; [[Bpe]] covers the merge-based
  * family): seed a candidate vocabulary from frequent substrings,
  * then alternate (E) best-segmentation of the corpus under the
  * current piece distribution with (M) re-estimating piece
  * frequencies from those segmentations, pruning to the target
  * vocabulary size each round. Single characters are never pruned,
  * so segmentation stays total.
  *
  * Exactness contract (what makes the gate FULL-oracle where BPE's
  * already is): the published trainer maximizes Σ log p(piece) in
  * floating point — likelihood TIES and sub-ulp differences then
  * depend on libm and summation order, which no cross-engine oracle
  * can replay. Here the Viterbi objective Π (cnt(p)+1)/C is compared
  * as EXACT RATIONALS — candidate segmentations (prod₁, k₁) vs
  * (prod₂, k₂) compare as BigInt prod₁·C^k₂ vs prod₂·C^k₁ — with
  * deterministic tie-breaks (fewer pieces, then UTF-8-lexicographic
  * last piece; the last-piece rule is DP-composable because a piece
  * determines its start, hence its subproblem). Add-1 smoothing
  * keeps every kept-alive single char scorable. An independent
  * pure-Python trainer (tools/unigram_oracle.py) replays the whole
  * thing bit-for-bit — the bpe_oracle fixture precedent.
  *
  * Scale shape (the part BPE's sequential merges cannot have): every
  * E-step word is INDEPENDENT, so each iteration is one narrow
  * mapPartitions over the distinct-WORD table (broadcast model: V
  * pieces) plus one piece-keyed partial-agged exchange whose output
  * is ≤V rows — driver state is the model, never the corpus or the
  * vocabulary of words. The one corpus-sized pass is the word count
  * (the q_vocab shape). Seeding is a bounded-fanout substring
  * explode (≤ maxPieceLen·|word| per distinct word) into the same
  * kind of V-bounded TakeOrdered.
  */
object UnigramTokenizer {

  /** Spark's string ordering is unsigned UTF-8 byte order; Scala's
    * String `<` is UTF-16 code-unit order (they differ beyond the
    * BMP), so driver-side tie-breaks compare the distributed way.
    */
  private def u8lt(x: String, y: String): Boolean = {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** (w, freq) distinct-word table — one corpus pass. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Viterbi best segmentation of `w` under piece counts `cnt` with
    * normalizer `C` (exact-rational compare; see object scaladoc).
    * Unknown SINGLE chars score as count 0 (+1 smoothing) so
    * segmentation is total even for characters outside the model —
    * multi-char pieces must be in the vocabulary.
    */
  private[graft] def segmentWord(w: String,
      cnt: scala.collection.Map[String, Long], c: BigInt,
      maxPieceLen: Int): Array[String] = {
    val n = w.length
    val prod = new Array[BigInt](n + 1)
    val kArr = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    val lastP = new Array[String](n + 1)
    prod(0) = BigInt(1)
    val cpow = new Array[BigInt](n + 2)
    cpow(0) = BigInt(1)
    var x = 1
    while (x <= n + 1) { cpow(x) = cpow(x - 1) * c; x += 1 }
    var i = 1
    while (i <= n) {
      var bestProd: BigInt = null
      var bestK = 0
      var bestJ = -1
      var bestPiece: String = null
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (prod(j) != null) {
          val p = w.substring(j, i)
          val score: Long =
            if (i - j == 1) cnt.getOrElse(p, 0L) + 1L
            else cnt.get(p).map(_ + 1L).getOrElse(-1L)
          if (score > 0) {
            val cp = prod(j) * BigInt(score)
            val ck = kArr(j) + 1
            val better =
              if (bestProd == null) true
              else {
                val l = cp * cpow(bestK)
                val r = bestProd * cpow(ck)
                if (l != r) l > r
                else if (ck != bestK) ck < bestK
                else u8lt(p, bestPiece)
              }
            if (better) { bestProd = cp; bestK = ck; bestJ = j; bestPiece = p }
          }
        }
        j += 1
      }
      prod(i) = bestProd; kArr(i) = bestK; back(i) = bestJ; lastP(i) = bestPiece
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var pos = n
    while (pos > 0) { out += lastP(pos); pos = back(pos) }
    out.reverseIterator.toArray
  }

  /** One E-step + count re-estimation: segment every distinct word
    * under the broadcast model, sum freq-weighted piece occurrences —
    * one narrow pass + one ≤V-row exchange, collected to the driver
    * (model-bounded).
    */
  private def estimateCounts(words: DataFrame,
      model: Map[String, Long], maxPieceLen: Int): Map[String, Long] = {
    val spark = words.sparkSession
    import spark.implicits._
    val c = normalizer(model)
    val bc = spark.sparkContext.broadcast((model, c))
    words.select(col("w").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val (m, cc) = bc.value
        it.flatMap { case (w, f) =>
          segmentWord(w, m, cc, maxPieceLen).iterator.map(p => (p, f))
        }
      }
      .toDF("piece", "f")
      .groupBy("piece").agg(sum(col("f")).as("cnt"))
      .as[(String, Long)].collect().toMap
  }

  /** C = Σ (cnt+1) over the vocabulary — the exact-rational
    * normalizer both engines share.
    */
  private[graft] def normalizer(model: Map[String, Long]): BigInt =
    model.values.foldLeft(BigInt(0))((a, v) => a + BigInt(v + 1L))

  /** Prune to the target vocabulary: ALL single chars survive (with
    * their current counts, possibly 0 — segmentation must stay
    * total), plus the top (vocabSize − |singles|) multi-char pieces
    * with positive count by (count desc, piece UTF-8 asc).
    */
  private[graft] def prune(counts: Map[String, Long],
      singles: Set[String], vocabSize: Int): Map[String, Long] = {
    val multis = counts.iterator
      .filter { case (p, c) => p.length > 1 && c > 0 }.toIndexedSeq
      .sortWith { case ((p1, c1), (p2, c2)) =>
        if (c1 != c2) c1 > c2 else u8lt(p1, p2) }
      .take(math.max(vocabSize - singles.size, 0))
    singles.iterator.map(s => s -> counts.getOrElse(s, 0L)).toMap ++ multis
  }

  /** Train the model: returns the final (piece → count) vocabulary.
    * See the object scaladoc for the exact algorithm; `iters` full
    * EM rounds follow substring seeding.
    */
  def trainModel(docs: DataFrame, textCol: String, vocabSize: Int = 64,
                 maxPieceLen: Int = 4, iters: Int = 3): Map[String, Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordTable(docs, textCol).localCheckpoint(true)
    // seed: freq-weighted counts of every substring of length
    // 1..maxPieceLen (overlapping starts counted) — bounded-fanout
    // explode, one piece-keyed exchange
    val sub = words
      .select(col("freq"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        i => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - i + 1)),
          l => substring(col("w"), i.cast("int"), l.cast("int"))))))
        .as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      .localCheckpoint(true)
    val singles = sub.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect().toMap
    val topMultis = sub.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(math.max(vocabSize - singles.size, 0))
      .as[(String, Long)].collect()
    var model: Map[String, Long] = singles ++ topMultis
    val singleSet = singles.keySet
    var t = 0
    while (t < iters) {
      model = prune(estimateCounts(words, model, maxPieceLen),
        singleSet, vocabSize)
      t += 1
    }
    model
  }

  /** [[trainModel]] as the gate frame: (rank, piece, piece_count)
    * ranked by (count desc, piece UTF-8 asc).
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 64,
            maxPieceLen: Int = 4, iters: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked = trainModel(docs, textCol, vocabSize, maxPieceLen, iters)
      .toIndexedSeq
      .sortWith { case ((p1, c1), (p2, c2)) =>
        if (c1 != c2) c1 > c2 else u8lt(p1, p2) }
      .zipWithIndex
      .map { case ((p, c), r) => (r.toLong, p, c) }
    ranked.toDF("rank", "piece", "piece_count")
  }

  /** Document-level encoding under a trained model — the [[Bpe]]
    * encodeDocs shape: segment the DISTINCT-WORD table once (the
    * working set is the vocabulary of words, not the corpus;
    * mapPartitions with the broadcast V-piece model), broadcast-join
    * tokens, reassemble each document's piece sequence in token
    * order (one doc-keyed exchange). Returns (idCol, pieces).
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 model: Map[String, Long], maxPieceLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val c = normalizer(model)
    val bc = spark.sparkContext.broadcast((model, c))
    val encoded = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .select(col("w").cast("string")).as[String]
      .mapPartitions { it =>
        val (m, cc) = bc.value
        it.map(w => (w, segmentWord(w, m, cc, maxPieceLen)))
      }
      .toDF("w", "pieces")
    val toks = docs.select(col(idCol),
        posexplode(TF.tokens(col(textCol))).as(Seq("__pos", "w")))
      .filter(length(col("w")) > 0)
    toks.join(broadcast(encoded), "w")
      .groupBy(idCol)
      .agg(collect_list(struct(col("__pos"), col("pieces"))).as("__ps"))
      .select(col(idCol),
        flatten(transform(array_sort(col("__ps")), p => p("pieces"))).as("pieces"))
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("pieces"), array().cast("array<string>")).as("pieces"))
  }
}
