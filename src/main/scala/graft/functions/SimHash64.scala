package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XxHash64Function

/** 64-bit Charikar simhash of a token array in ONE pass.
  *
  * The composable form (`transform(sequence(0,63), i -> aggregate(
  * tokens, ...))`) re-walks and re-hashes the token array 64 times —
  * 64 string hashes per token. This expression hashes each token once
  * (the same XXH64/seed-42 Spark's `xxhash64` uses, so fingerprints
  * are bit-identical to the builtin composition) and updates all 64
  * vote counters from that single hash. Null tokens are skipped.
  *
  * Bit i of the result is 1 iff the population of hash-bit i over all
  * tokens exceeds half — i.e. sign(Σ ±1 votes).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        // identical hash family/seed to Spark's xxhash64 builtin
        val h = XxHash64Function.hash(s, StringType, 42L)
        var i = 0
        while (i < 64) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val fp = ctx.freshName("fp")
      s"""
         |long[] $votes = new long[64];
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    UTF8String $s = $a.getUTF8String($j);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
         |      .hash($s, org.apache.spark.sql.types.DataTypes.StringType, 42L);
         |    for (int $i = 0; $i < 64; $i++) {
         |      $votes[$i] += ((($h >>> $i) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $fp |= (1L << $i);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
