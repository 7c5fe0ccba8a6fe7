package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Distributed BPE tokenizer training — the vocabulary-induction step
  * of an LLM data pipeline (the `q_token_count` BPE-ish regex is the
  * cheap *apply-time* proxy; this is where the merge table it proxies
  * comes from).
  *
  * Like production trainers (HuggingFace tokenizers, SentencePiece in
  * BPE mode), training runs on the WORD-FREQUENCY table, not the
  * corpus: the one corpus-sized pass is the word count (explode +
  * partial-agg'd sum — the same shape as `q_vocab`), after which the
  * working set is |distinct words| rows regardless of corpus size.
  * Each merge round is one aggregation over that compressed table
  * (adjacent-pair counts weighted by word frequency, partial-agg'd)
  * plus a 1-row TakeOrdered argmax to the driver — the same bounded
  * driver involvement as connected components' convergence checksum.
  * Plan depth is truncated per round with a localCheckpoint, so round
  * N never re-embeds rounds 1..N−1.
  *
  * Determinism: argmax ties break lexicographically (count desc,
  * left asc, right asc), so the merge table is a pure function of the
  * corpus.
  */
object Bpe {

  /** End-of-word marker (distinguishes "est</w>" in "widest" from
    * "est" mid-word — standard BPE practice).
    */
  val EndMark = "</w>"

  /** Greedy left-to-right single-pair merge over a symbol array:
    * every non-overlapping adjacent (a, b) becomes `ab`. Pure HOF —
    * one pass with a skip flag, no UDF.
    */
  def mergeOnce(sym: Column, a: Column, b: Column, ab: Column): Column = {
    val n = size(sym)
    val folded = aggregate(
      sequence(lit(1), n),
      struct(array().cast("array<string>").as("out"), lit(false).as("skip")),
      (acc, i) => {
        val cur = try_element_at(sym, i)
        val nxt = try_element_at(sym, i + 1)
        val isPair = !acc("skip") && cur === a &&
          coalesce(nxt === b, lit(false))
        struct(
          when(acc("skip"), acc("out"))
            .otherwise(concat(acc("out"),
              array(when(isPair, ab).otherwise(cur)))).as("out"),
          isPair.as("skip"))
      },
      acc => acc("out"))
    when(n === 0, array().cast("array<string>")).otherwise(folded)
  }

  /** (word, freq, sym) — the compressed training table: distinct words
    * with corpus frequencies, each split to characters + [[EndMark]].
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("sym",
        concat(filter(split(col("w"), ""), c => length(c) > 0), array(lit(EndMark))))

  /** Adjacent-pair counts weighted by word frequency. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(when(size(col("sym")) < 2,
          array().cast("array<struct<l:string,r:string>>"))
        .otherwise(transform(sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("l"),
            element_at(col("sym"), i + 1).as("r"))))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Spark's string ordering is UTF8String binary = unsigned UTF-8
    * byte order; Scala's String `<` is UTF-16 code-unit order. They
    * differ beyond the BMP, so the driver-side tie-break must compare
    * the way the distributed `orderBy` does.
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

  /** Train `nMerges` BPE merges. Returns the ordered merge table
    * (rank, left, right, merged, pair_count). Stops early when no
    * pair occurs at least `minCount` times.
    *
    * Two execution paths, same exact greedy-BPE semantics (argmax by
    * count desc then UTF-8-lex (l, r); greedy left-to-right
    * non-overlapping replay):
    *
    *  - LOCAL (default when the distinct-word table has at most
    *    `localWordCap` rows): the one corpus-sized pass is the word
    *    count; the compressed (word, freq) table then collects to the
    *    driver and trains with an incremental pair index — the
    *    HuggingFace/SentencePiece shape — costing ZERO Spark jobs per
    *    merge. A 32k-merge vocabulary is seconds of driver CPU instead
    *    of 32k sequential job launches (hours of scheduler latency).
    *    The collected table is |distinct words ≥ minCount chars|, not
    *    the corpus: bounded and known BEFORE collecting (one count).
    *  - DISTRIBUTED (above the cap): batched rounds. Each round
    *    fetches the top-`batchK` pair candidates (one bounded collect)
    *    and accepts the longest prefix PROVABLY equal to the next run
    *    of sequential picks, then replays the batch as one chained
    *    [[mergeOnce]] projection. Acceptance for candidate p_i=(l,r,c)
    *    given accepted prefix A (merging (a,b) only alters pairs with
    *    right element a or left element b, and creates pairs bounded
    *    by those progenitors' old counts):
    *      - p_i unaffected: r ∉ lefts(A) and l ∉ rights(A);
    *      - every accepted merged name is FRESH (not an existing
    *        vocab symbol — tracked exactly on the driver), so no old
    *        pair's count can be inflated by name aliasing;
    *      - c STRICTLY exceeds every later candidate that IS affected
    *        (their old counts bound every created/altered pair; strict
    *        beats ties, whose lex order is unknowable in advance);
    *      - c strictly exceeds the K-th candidate (bounds candidates
    *        beyond the fetched top-K).
    *    The first failing candidate ends the batch and becomes the
    *    next round's argmax — the merge table is IDENTICAL to the
    *    1-per-round form (BpeSpec asserts this), only fewer jobs.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 2L, batchK: Int = 64,
            localWordCap: Long = 2000000L): DataFrame =
    trainWithStats(docs, textCol, nMerges, minCount, batchK, localWordCap)._1

  /** [[train]] plus the number of Spark rounds it took (for specs and
    * scheduler-cost accounting). The local path counts as 1 round.
    */
  def trainWithStats(docs: DataFrame, textCol: String, nMerges: Int,
                     minCount: Long = 2L, batchK: Int = 64,
                     localWordCap: Long = 2000000L): (DataFrame, Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordsDf = wordTable(docs, textCol)
    if (localWordCap > 0 && wordsDf.count() <= localWordCap) {
      val wf = wordsDf.select(col("w"), col("freq")).as[(String, Long)].collect()
      (trainLocal(wf, nMerges, minCount)
        .toDF("rank", "left", "right", "merged", "pair_count")
        .withColumn("rank", col("rank").cast("long")), 1)
    } else trainDistributed(wordsDf, nMerges, minCount, batchK)
  }

  /** Exact sequential BPE over the collected word-frequency table with
    * an incremental (pair count + pair→word inverted index) structure:
    * each merge touches only the words containing its pair.
    */
  private[operators] def trainLocal(wordFreqs: Array[(String, Long)], nMerges: Int,
                                    minCount: Long): Vector[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    val syms = wordFreqs.map { case (w, _) =>
      mutable.ArrayBuffer.from(w.split("").filter(_.nonEmpty)) += EndMark
    }
    val freqs = wordFreqs.map(_._2)
    val cnt = mutable.HashMap[(String, String), Long]()
    val occ = mutable.HashMap[(String, String), mutable.Set[Int]]()
    def index(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = cnt.getOrElse(p, 0L) + sign * freqs(i)
        if (c == 0L) cnt.remove(p) else cnt(p) = c
        // occ only grows here and is cleaned lazily: a hit is re-checked
        // against the word's CURRENT symbols before being applied
        if (sign > 0) occ.getOrElseUpdate(p, mutable.Set[Int]()) += i
        j += 1
      }
    }
    syms.indices.foreach(index(_, 1L))
    def applyMerge(s: mutable.ArrayBuffer[String], a: String, b: String)
        : mutable.ArrayBuffer[String] = {
      val out = new mutable.ArrayBuffer[String](s.length)
      var j = 0
      while (j < s.length) {
        if (j < s.length - 1 && s(j) == a && s(j + 1) == b) { out += (a + b); j += 2 }
        else { out += s(j); j += 1 }
      }
      out
    }
    val merges = Vector.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      var best: (String, String) = null
      var bestC = 0L
      for ((p, c) <- cnt if c >= minCount) {
        if (best == null || c > bestC ||
          (c == bestC && (u8lt(p._1, best._1) ||
            (p._1 == best._1 && u8lt(p._2, best._2))))) { best = p; bestC = c }
      }
      if (best == null) done = true
      else {
        val (a, b) = best
        merges += ((rank, a, b, a + b, bestC))
        // lazily-cleaned index: entries may be stale, so re-check
        val hits = occ.getOrElse(best, mutable.Set[Int]()).toArray
        occ.remove(best)
        hits.foreach { i =>
          var has = false
          val s = syms(i)
          var j = 0
          while (!has && j < s.length - 1) {
            has = s(j) == a && s(j + 1) == b; j += 1
          }
          if (has) {
            index(i, -1L)
            syms(i) = applyMerge(s, a, b)
            index(i, 1L)
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  private def trainDistributed(wordsDf: DataFrame, nMerges: Int,
                               minCount: Long, batchK: Int): (DataFrame, Int) = {
    val spark = wordsDf.sparkSession
    import spark.implicits._
    var words = wordsDf.localCheckpoint(true)
    // exact driver-side vocab: initial symbols + accepted merged names.
    // Bounded by |alphabet| + nMerges; one tiny job at start.
    val symbols = scala.collection.mutable.Set[String](
      words.select(explode(col("sym")).as("s")).distinct().as[String].collect()
        .toIndexedSeq: _*)
    val merges = Vector.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var rounds = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val k = math.max(batchK, 1)
      val top = pairCounts(words)
        .filter(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(k).as[(String, String, Long)].collect()
      rounds += 1
      if (top.isEmpty) exhausted = true
      else {
        // strict lower bound on anything beyond the fetched candidates
        val unseenBound = if (top.length == k) top.last._3 else Long.MinValue
        val lefts = scala.collection.mutable.Set[String]()
        val rights = scala.collection.mutable.Set[String]()
        val mergedNames = scala.collection.mutable.Set[String]()
        val accepted = Vector.newBuilder[(String, String, Long)]
        var nAccepted = 0
        var stop = false
        for (((l, r, cnt), i) <- top.zipWithIndex if !stop && rank + nAccepted < nMerges) {
          val fresh = !symbols.contains(l + r) && !mergedNames.contains(l + r)
          val unaffected = !lefts.contains(r) && !rights.contains(l)
          val affectedMax = top.drop(i + 1).collect {
            case (l2, r2, c2) if lefts.contains(r2) || rights.contains(l2) => c2
          }.foldLeft(Long.MinValue)(math.max)
          val provablyNext = i == 0 ||
            (unaffected && cnt > affectedMax && cnt > unseenBound)
          if (provablyNext && fresh) {
            accepted += ((l, r, cnt))
            lefts += l; rights += r; mergedNames += (l + r)
            nAccepted += 1
          } else if (i == 0) {
            // aliased merged name: apply alone (exactly the sequential
            // step); batching past it can't be proven safe
            accepted += ((l, r, cnt))
            nAccepted += 1
            stop = true
          } else stop = true
        }
        val batch = accepted.result()
        batch.foreach { case (l, r, cnt) =>
          merges += ((rank, l, r, l + r, cnt))
          symbols += (l + r)
          rank += 1
        }
        // replay via one withColumn PER MERGE, chained by attribute
        // reference: folding the previous *expression* into the next
        // mergeOnce substitutes it at every use site (~5 per level), so
        // the tree grows exponentially with chain depth and stalls the
        // driver at depth ~8. Stacked projections referencing the prior
        // level by NAME stay linear (CollapseProject refuses to inline
        // a non-cheap expression used more than once), and ONE
        // checkpoint per round replaces one job per merge.
        batch.foreach { case (l, r, _) =>
          words = words.withColumn("sym",
            mergeOnce(col("sym"), lit(l), lit(r), lit(l + r)))
        }
        words = words.localCheckpoint(true)
      }
    }
    (merges.result().toDF("rank", "left", "right", "merged", "pair_count")
      .withColumn("rank", col("rank").cast("long")), rounds)
  }

  /** Apply a trained merge table: encode the DISTINCT-WORD table by
    * replaying the merges in rank order — `nMerges` chained HOFs in
    * one narrow projection (the merge table is tiny and baked into
    * the plan as literals). This is the practical 100 TB apply path:
    * encode the vocabulary once, then the corpus pass is a token→word
    * join (or a broadcast map lookup), never a per-document replay.
    */
  def encodeWords(words: DataFrame, wordCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    // chained by attribute reference, one projection per merge — NOT an
    // expression fold, which substitutes the previous level at every
    // use site and grows the tree exponentially (see train's replay)
    var out = words.withColumn("bpe_sym", concat(
      filter(split(col(wordCol), ""), c => length(c) > 0), array(lit(EndMark))))
    merges.foreach { case (l, r) =>
      out = out.withColumn("bpe_sym",
        mergeOnce(col("bpe_sym"), lit(l), lit(r), lit(l + r)))
    }
    out.withColumn("n_bpe_tokens", size(col("bpe_sym")).cast("long"))
  }

  /** Encode ONE word imperatively: repeatedly merge the lowest-rank
    * adjacent pair present, greedy left-to-right non-overlapping per
    * pick — the HuggingFace-style apply algorithm. This is EXACTLY
    * equivalent to replaying every merge in rank order ([[mergeOnce]]
    * / [[encodeWords]] semantics): merging rank r can only create
    * pairs whose own merge rank is > r (a rule for a pair containing
    * the merged symbol can only have been trained after that symbol
    * existed), so no lower-rank pair ever (re)appears once passed.
    * BpeSpec pins the two paths bit-identical on a trained table.
    */
  private[operators] def encodeWordLocal(
      w: String, ranks: Map[(String, String), Int]): Array[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.from(
      w.split("").filter(_.nonEmpty)) += EndMark
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        ranks.get(p).foreach { r =>
          if (r < bestRank) { bestRank = r; bestPair = p }
        }
        j += 1
      }
      if (bestPair == null) continue = false
      else {
        // greedy left-to-right non-overlapping replay of that one merge
        val (a, b) = bestPair
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms.clear(); syms ++= out
      }
    }
    syms.toArray
  }

  /** [[encodeWords]] for merge tables too deep to bake into a
    * projection chain (a 32k-merge vocabulary would be 32k stacked
    * projections): broadcast the rank map, encode each distinct word
    * per-partition with the lowest-rank-first algorithm. Same output
    * as [[encodeWords]] (spec-pinned); `mapPartitions` is the
    * documented last-resort here — the work is genuinely per-row
    * imperative and the input is the VOCABULARY table, not the corpus.
    */
  def encodeWordsImperative(words: DataFrame, wordCol: String,
                            merges: Seq[(String, String)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val inCols = words.columns.toIndexedSeq
    words.select(col(wordCol).cast("string")).as[String]
      .mapPartitions { it =>
        val r = bc.value
        it.map(w => (w, encodeWordLocal(w, r)))
      }
      .toDF("__w", "bpe_sym")
      .join(words, col("__w") === col(wordCol))
      .select((inCols.map(col) :+ col("bpe_sym")): _*)
      .withColumn("n_bpe_tokens", size(col("bpe_sym")).cast("long"))
  }

  /** Document-level BPE encoding — the 100 TB apply path: encode the
    * DISTINCT-WORD table once (the working set is the vocabulary, not
    * the corpus), then stream the corpus through one posexplode ⋈
    * encoded-vocab join and reassemble each document's subword
    * sequence in token order. The vocab side broadcasts when small;
    * at web scale it becomes a word-keyed shuffled join — either way
    * the per-document replay cost is paid |vocab| times, not |corpus|
    * times. The one unavoidable exchange is the doc-keyed reassembly
    * (order restored by sorting the collected (pos, sym) pairs — never
    * a window). Returns (idCol, bpe: array<string>).
    *
    * `hofCap`: merge tables at most this deep replay as chained
    * [[mergeOnce]] projections (plan-transparent, zero driver maps);
    * deeper tables switch to [[encodeWordsImperative]].
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 mergesDf: DataFrame, hofCap: Int = 64): DataFrame = {
    // bounded collect: the merge table is |vocab|-sized by construction
    val merges = mergesDf.select("rank", "left", "right")
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val words = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val encoded =
      (if (merges.size <= hofCap) encodeWords(words, "w", merges)
       else encodeWordsImperative(words, "w", merges))
        .select(col("w"), col("bpe_sym"))
    val toks = docs.select(col(idCol),
        posexplode(TF.tokens(col(textCol))).as(Seq("__pos", "w")))
      .filter(length(col("w")) > 0)
    toks.join(broadcast(encoded), "w")
      .groupBy(idCol)
      .agg(collect_list(struct(col("__pos"), col("bpe_sym"))).as("__ps"))
      .select(col(idCol),
        flatten(transform(array_sort(col("__ps")), p => p("bpe_sym"))).as("bpe"))
      // token-less docs reassemble to the empty sequence, not a miss
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("bpe"), array().cast("array<string>")).as("bpe"))
  }
}
