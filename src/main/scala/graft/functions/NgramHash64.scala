package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Chained per-position n-gram hashes of a token array in ONE pass:
  * `ngram_hash64(tokens, n)` = array<long> equal bit-for-bit to
  *
  *   transform(sequence(1, size-n+1), i ->
  *     xxhash64(tokens[i], ..., tokens[i+n-1]))
  *
  * (empty when size < n). The builtin multi-argument `xxhash64`
  * chains: hash = xxhash64(arg, seed=previous), seed 42 — so the
  * native loop reproduces its exact bits, and hashes built here
  * interoperate with any expression-side recomputation (the
  * [[ShingleHash64]] contract). Null tokens are skipped exactly as
  * the builtin skips null arguments (the hash state passes through).
  *
  * Why native: the composable form walks a transform frame and a
  * fresh n-argument xxhash64 expression tree per position — n hash
  * block computations each, re-hashing every token n times across
  * overlapping positions. Here each token is hashed once into a
  * prefix-state array and each (n−1)-suffix extension once more, so
  * an n-gram sweep costs ~n·len total block hashes instead of
  * n²·len, in a tight primitive loop.
  */
case class NgramHash64(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "ngram_hash64 requires n > 0")

  override def prettyName: String = "ngram_hash64"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramHash64Util.hashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramHash64Util.hashes($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHash64 =
    copy(child = newChild)
}

/** Per-position trigram hash BUNDLE — everything a Stupid-Backoff
  * scorer joins on, in ONE pass: `trigram_hash_bundle(tokens)` =
  * array<struct<h3,h12,h23,hw2,hw3>> where for position i (empty
  * when size < 3)
  *
  *   h3  = xxhash64(w_i, w_i+1, w_i+2)   h12 = xxhash64(w_i, w_i+1)
  *   h23 = xxhash64(w_i+1, w_i+2)        hw2 = xxhash64(w_i+1)
  *   hw3 = xxhash64(w_i+2)
  *
  * bit-identical to five builtin xxhash64 calls (seed 42, chained —
  * see [[NgramHash64]]). The overlaps are the point: h23 of
  * position i IS h12 of position i+1 and hw3 of i IS hw2 of i+1, so
  * one unigram-state array and one bigram-state array serve every
  * position — 3·len hash block computations where the five-expression
  * form pays 9·len plus a transform frame and struct allocation per
  * position (measured r12: the doc-side trigram scan was the
  * dominant CPU of q_backoff_logprob at every tier).
  */
case class TrigramHashBundle(child: Expression) extends UnaryExpression {

  override def prettyName: String = "trigram_hash_bundle"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h3", LongType, nullable = false),
    StructField("h12", LongType, nullable = false),
    StructField("h23", LongType, nullable = false),
    StructField("hw2", LongType, nullable = false),
    StructField("hw3", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramHash64Util.trigramBundle(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramHash64Util.trigramBundle($a);")

  override protected def withNewChildInternal(newChild: Expression): TrigramHashBundle =
    copy(child = newChild)
}

object NgramHash64Util {

  private val Seed = 42L

  /** hash-chain step with the builtin's null rule (null arg = skip). */
  @inline private def step(tokens: ArrayData, i: Int, seed: Long): Long = {
    val t = tokens.getUTF8String(i)
    if (t == null) seed else XxHash64Function.hash(t, StringType, seed)
  }

  /** See [[NgramHash64]]. Shared by interpreted eval and codegen. */
  def hashes(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return ArrayData.toArrayData(Array.emptyLongArray)
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i < out.length) {
      var h = Seed
      var j = 0
      while (j < n) { h = step(tokens, i + j, h); j += 1 }
      out(i) = h
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** See [[TrigramHashBundle]]. Shared by interpreted eval and codegen. */
  def trigramBundle(tokens: ArrayData): ArrayData = {
    val len = tokens.numElements()
    if (len < 3) return new GenericArrayData(Array.empty[Any])
    // hw(i) = xxhash64(w_i); h2(i) = xxhash64(w_i, w_i+1)
    val hw = new Array[Long](len)
    var i = 0
    while (i < len) { hw(i) = step(tokens, i, Seed); i += 1 }
    val h2 = new Array[Long](len - 1)
    i = 0
    while (i < len - 1) { h2(i) = step(tokens, i + 1, hw(i)); i += 1 }
    val out = new Array[Any](len - 2)
    i = 0
    while (i < len - 2) {
      val h3 = step(tokens, i + 2, h2(i))
      out(i) = new GenericInternalRow(
        Array[Any](h3, h2(i), h2(i + 1), hw(i + 1), hw(i + 2)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
