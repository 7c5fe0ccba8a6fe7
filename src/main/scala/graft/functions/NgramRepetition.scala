package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram repetition signals (the Gopher / MassiveText
  * quality-filter family, Rae et al. 2021 §A1.1) in ONE pass over the
  * token array: `ngram_repetition(tokens, k)` = struct<
  *   top_cnt:     occurrences of the most frequent k-gram
  *                (ties broken toward the binary-smallest k-gram, so
  *                the result is deterministic and engine-portable),
  *   top_len:     character length of that k-gram (spaces included),
  *   dup_chars:   characters of the space-joined document covered by
  *                at least one occurrence of a k-gram that appears
  *                more than once — the interval UNION of duplicated
  *                k-gram spans, each character counted ONCE, so
  *                dup_chars ≤ total_chars always and the derived
  *                Gopher "duplicate n-gram character fraction" is a
  *                true fraction. (Implementations differ here: e.g.
  *                some count only non-first occurrences with a skip-
  *                ahead; span-union is the form that bounds the
  *                fraction by construction and is order-independent.)
  *   total_chars: character length of the space-joined token array
  * >.
  *
  * Null array elements are SKIPPED entirely (the `concat_ws` rule the
  * sibling [[ShingleHash64]] follows): they contribute no characters,
  * no joining space, and never appear inside a k-gram window — an
  * array of m non-null tokens behaves identically however many nulls
  * surround them.
  *
  * All four are exact integers so a cross-engine oracle compares by
  * hash with no float rounding anywhere; callers derive the Gopher
  * fractions (top_cnt·top_len/total_chars, dup_chars/total_chars)
  * downstream. Fewer than k non-null tokens → (0, 0, 0, total_chars):
  * a document too short to have a k-gram has no repetition, which is
  * also what an empty GROUP BY over its (empty) k-gram set yields in
  * the SQL mirror.
  *
  * Why native: the per-doc k-gram frequency map is a local hash
  * aggregation that no builtin composition expresses without either
  * an explode + two corpus-wide doc-keyed shuffles (repartitions the
  * whole corpus to compute a row-local statistic) or interpreted
  * higher-order-function chains (the exact hot-path blow-up
  * [[ShingleHash64]] was built to kill). Here it is a tight loop and
  * a small hash map per row, zero exchanges at any corpus size —
  * repetition scoring of 100 TB is then scan-bound, as it should be.
  */
case class NgramRepetition(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "ngram_repetition requires k > 0")

  override def prettyName: String = "ngram_repetition"

  override def dataType: DataType = NgramRepetitionUtil.resultType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramRepetitionUtil.stats(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramRepetitionUtil.stats($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
    copy(child = newChild)
}

object NgramRepetitionUtil {
  private val Space = UTF8String.fromString(" ")

  val resultType: StructType = StructType(Seq(
    StructField("top_cnt", LongType, nullable = false),
    StructField("top_len", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false)))

  /** See [[NgramRepetition]]. Shared by interpreted eval and codegen. */
  def stats(tokens: ArrayData, k: Int): InternalRow = {
    // drop null elements up front (concat_ws semantics — see scaladoc)
    val n0 = tokens.numElements()
    val toks = new Array[UTF8String](n0)
    var m = 0
    var i = 0
    while (i < n0) {
      val t = tokens.getUTF8String(i)
      if (t != null) { toks(m) = t; m += 1 }
      i += 1
    }
    var total = 0L
    i = 0
    while (i < m) { total += toks(i).numChars(); i += 1 }
    if (m > 1) total += m - 1 // the joining spaces
    if (m < k) return new GenericInternalRow(Array[Any](0L, 0L, 0L, total))
    val nGrams = m - k + 1
    val counts = new java.util.HashMap[UTF8String, java.lang.Long](nGrams * 2)
    val grams = new Array[UTF8String](nGrams)
    val window = new Array[UTF8String](k)
    var p = 0
    while (p < nGrams) {
      var j = 0
      while (j < k) { window(j) = toks(p + j); j += 1 }
      val ng = UTF8String.concatWs(Space, window: _*)
      grams(p) = ng
      val prev = counts.get(ng)
      counts.put(ng, if (prev == null) 1L else prev + 1L)
      p += 1
    }
    var topCnt = 0L
    var topNg: UTF8String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c: Long = e.getValue
      val g = e.getKey
      if (c > topCnt || (c == topCnt && g.compareTo(topNg) < 0)) {
        topCnt = c; topNg = g
      }
    }
    // dup_chars: interval union of duplicated-k-gram spans in the
    // joined string. Window p starts at offset(p) = Σ_{q<p}(len_q+1),
    // strictly increasing in p, so one covered-end watermark computes
    // the union exactly in a single forward pass.
    var dup = 0L
    var coveredEnd = 0L
    var start = 0L
    p = 0
    while (p < nGrams) {
      val ng = grams(p)
      if (counts.get(ng) > 1L) {
        val end = start + ng.numChars()
        val from = math.max(start, coveredEnd)
        if (end > from) dup += end - from
        if (end > coveredEnd) coveredEnd = end
      }
      start += toks(p).numChars() + 1
      p += 1
    }
    new GenericInternalRow(Array[Any](topCnt, topNg.numChars().toLong, dup, total))
  }
}
