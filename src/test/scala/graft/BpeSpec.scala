package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer: merge order against a hand-computed example, greedy
  * merge semantics, and the vocab-encode apply path.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeOnce merges greedy left-to-right, non-overlapping") {
    def run(syms: Seq[String], a: String, b: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("s")
        .select(Bpe.mergeOnce(col("s"), lit(a), lit(b), lit(a + b)).as("m"))
        .as[Seq[String]].head()
    assert(run(Seq("a", "b", "c"), "a", "b") == Seq("ab", "c"))
    assert(run(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))   // no overlap reuse
    assert(run(Seq("x", "y"), "a", "b") == Seq("x", "y"))         // no-op
    assert(run(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(run(Seq.empty[String], "a", "b") == Seq.empty[String])
  }

  test("train reproduces the hand-computed merge order") {
    // corpus: "aa ab" x3 and "ab" x2 → word freqs: aa→3, ab→5
    // symbols: aa = [a,a,</w>], ab = [a,b,</w>]
    // pair counts r0: (a,a)=3, (a,</w>)=3, (a,b)=5, (b,</w>)=5
    //   → top = (a,b) 5 (count desc, then lex)
    // r1: aa=[a,a,</w>] ab=[ab,</w>] → (a,a)=3, (a,</w>)=3, (ab,</w>)=5
    //   → top = (ab,</w>) 5
    // r2: (a,a)=3 vs (a,</w>)=3 → lex: (a,</w>)... compare r: "</w>" < "a"
    //   → top = (a,</w>) 3
    val docs = (Seq.fill(3)("aa ab") ++ Seq.fill(2)("ab")).map(Tuple1(_)).toDF("text")
    val m = Bpe.train(docs, "text", nMerges = 3)
      .select("rank", "left", "right", "pair_count")
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(m == Seq(
      (0L, "a", "b", 5L),
      (1L, "ab", "</w>", 5L),
      (2L, "a", "</w>", 3L)))
  }

  test("train is deterministic: identical merge table on rerun") {
    // pin the subset: a bare limit(100) has no guaranteed row selection,
    // so the two runs could train on different corpora and flake
    val docs = Tables.documents(spark, sf()).filter(col("doc_id") < 100)
    val a = Bpe.train(docs, "text", nMerges = 5).collect().map(_.toString).sorted
    val b = Bpe.train(docs, "text", nMerges = 5).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.length == 5)
  }

  test("local / batched / 1-per-round trains produce an identical 64-merge table") {
    val docs = Tables.documents(spark, sf()).filter(col("doc_id") < 200)
    // localWordCap=0 forces the distributed path
    val (seqDf, seqRounds) = Bpe.trainWithStats(docs, "text", nMerges = 64,
      batchK = 1, localWordCap = 0L)
    val (batDf, _) = Bpe.trainWithStats(docs, "text", nMerges = 64,
      batchK = 64, localWordCap = 0L)
    val (locDf, locRounds) = Bpe.trainWithStats(docs, "text", nMerges = 64)
    val a = seqDf.collect().toSeq.map(_.toString)
    assert(a == batDf.collect().toSeq.map(_.toString),
      "distributed batched table must equal the 1-per-round table")
    assert(a == locDf.collect().toSeq.map(_.toString),
      "local incremental table must equal the 1-per-round table")
    assert(a.size == 64)
    // 64 sequential rounds vs ONE word-count round for the local path
    assert(seqRounds >= 5 * locRounds,
      s"expected >=5x fewer rounds, got seq=$seqRounds local=$locRounds")
  }

  test("train stops early when no pair reaches minCount") {
    val docs = Seq("x y", "z w").map(Tuple1(_)).toDF("text")
    // every word unique, freq 1 each: no pair reaches minCount=2
    assert(Bpe.train(docs, "text", nMerges = 5).count() == 0)
  }

  test("encodeWords applies the merge table; more merges = fewer tokens") {
    val words = Seq("aab", "ab", "ba").map(Tuple1(_)).toDF("w")
    val enc = Bpe.encodeWords(words, "w", Seq(("a", "b"), ("ab", "</w>")))
      .select("w", "bpe_sym").as[(String, Seq[String])].collect().toMap
    assert(enc("aab") == Seq("a", "ab</w>"))
    assert(enc("ab") == Seq("ab</w>"))
    assert(enc("ba") == Seq("b", "a", "</w>"))
    val n0 = Bpe.encodeWords(words, "w", Nil)
      .agg(sum("n_bpe_tokens")).as[Long].head()
    val n2 = Bpe.encodeWords(words, "w", Seq(("a", "b"), ("ab", "</w>")))
      .agg(sum("n_bpe_tokens")).as[Long].head()
    assert(n2 < n0)
  }

  test("imperative (lowest-rank-first) word encode == HOF rank-order replay on a trained table") {
    val docs = Tables.documents(spark, sf())
    val merges = Bpe.train(docs, "text", nMerges = 12)
      .select("left", "right").orderBy(col("rank"))
      .as[(String, String)].collect().toSeq
    assert(merges.size === 12)
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val hof = Bpe.encodeWords(words, "w", merges)
      .select("w", "bpe_sym").as[(String, Seq[String])].collect().toMap
    val imp = Bpe.encodeWordsImperative(words, "w", merges)
      .select("w", "bpe_sym").as[(String, Seq[String])].collect().toMap
    assert(hof.keySet === imp.keySet)
    // bit-identical sequences word for word — the two algorithms are
    // provably equivalent (created pairs always rank LATER than their
    // creator), and this pins the implementations to the proof
    hof.foreach { case (w, s) => assert(imp(w) === s, s"word '$w'") }
    // and they genuinely merged something (not all-singleton output)
    assert(hof.values.exists(_.length > 1))
    assert(hof.values.exists(s => s.exists(_.length > 2)))
  }

  test("encodeDocs reassembles per-doc subword sequences in token order; empty doc -> []") {
    val docs = Seq(
      (1L, "ab aab ba"),
      (2L, "ba ab"),     // same words, different order — order must survive
      (3L, "")
    ).toDF("doc_id", "text")
    val merges = Seq((0L, "a", "b", "ab", 9L), (1L, "ab", "</w>", "ab</w>", 9L))
      .toDF("rank", "left", "right", "merged", "pair_count")
    val out = Bpe.encodeDocs(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) === Seq("ab</w>", "a", "ab</w>", "b", "a", "</w>"))
    assert(out(2L) === Seq("b", "a", "</w>", "ab</w>"))
    assert(out(3L) === Seq.empty[String])
    // both replay depths produce the same documents
    val imp = Bpe.encodeDocs(docs, "doc_id", "text", merges, hofCap = 0)
      .as[(Long, Seq[String])].collect().toMap
    assert(imp === out)
  }
}
