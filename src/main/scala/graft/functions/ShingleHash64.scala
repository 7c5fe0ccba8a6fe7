package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-k-shingle hashes of a token array in ONE pass:
  * `shingle_hash64(tokens, k)` = array<long> equal (w.h.p.) to
  *
  *   array_distinct(transform(shingles-of-tokens, sh -> xxhash64(sh)))
  *
  * with the shingle rules of [[TextFunctions.shingles]]: 0 tokens →
  * empty, ≤ k tokens → one shingle of the whole text, else every
  * k-token window joined by a single space, first-occurrence order.
  * Hash values are bit-identical to the builtin `xxhash64` over the
  * joined shingle string (same family, seed 42), so signatures built
  * here interoperate with any string-side recomputation.
  *
  * Why native: the composable form runs entirely inside interpreted
  * higher-order-function lambdas — per shingle it pays a transform
  * frame, a slice allocation, a concat_ws and an expression-tree
  * xxhash64 walk. Profiled on the ngram-dedup path this was the
  * dominant CPU of the whole query (the downstream joins are
  * long-keyed and codegen'd). Here each window is joined and hashed
  * in a tight loop over the token array; dedup is by 64-bit hash in a
  * primitive-friendly LinkedHashSet. Deduping by hash instead of by
  * string is the only semantic delta — indistinguishable below ~2³²
  * shingles per document.
  */
case class ShingleHash64(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "shingle_hash64 requires k > 0")

  override def prettyName: String = "shingle_hash64"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHash64Util.hashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHash64Util.hashes($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

object ShingleHash64Util {
  private val Space = UTF8String.fromString(" ")

  /** See [[ShingleHash64]]. Shared by interpreted eval and codegen. */
  def hashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return ArrayData.toArrayData(Array.emptyLongArray)
    if (n <= k) {
      val all = new Array[UTF8String](n)
      var i = 0
      while (i < n) { all(i) = tokens.getUTF8String(i); i += 1 }
      val h = XxHash64Function.hash(
        UTF8String.concatWs(Space, all: _*), StringType, 42L)
      return ArrayData.toArrayData(Array(h))
    }
    // LinkedHashSet preserves array_distinct's first-occurrence order
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { window(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(XxHash64Function.hash(
        UTF8String.concatWs(Space, window: _*), StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    ArrayData.toArrayData(out)
  }
}
