package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of a 64-bit element-hash array in ONE pass:
  * `minhash64(hs, n)` = array of n longs where element s is
  * `min over h in hs of xxhash64(h, s)` — bit-identical to the
  * composable form
  *
  *   transform(sequence(0, n-1), s -> array_min(transform(hs, h -> xxhash64(h, s))))
  *
  * (same XXH64 family, seed 42, long-then-int mixing order as the
  * builtin), but each input element is loaded once and the n running
  * minima update in a tight loop. The composable form — or the
  * explode + groupBy(min×n) shape — evaluates n separate xxhash64
  * expressions per element, each paying expression-tree overhead; at
  * minhash's usual n=64 this inner loop dominates the whole LSH
  * pipeline, which is why it earns a native expression.
  *
  * Element semantics mirror the builtin composition exactly: a NULL
  * element hashes as xxhash64's null-skip (the per-s result is
  * hashInt(s, 42)); an EMPTY array yields an array of n NULLs (what
  * array_min returns over an empty transform).
  */
case class MinHash64(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes > 0, "minhash64 requires numHashes > 0")

  override def prettyName: String = "minhash64"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      // xxhash64(h, s) mixes children in order from seed 42: first the
      // long h (skipped when null), then the int s
      val hl = if (arr.isNullAt(j)) 42L
               else XxHash64Function.hash(arr.getLong(j), LongType, 42L)
      var s = 0
      while (s < numHashes) {
        val v = XxHash64Function.hash(s, IntegerType, hl)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val hl = ctx.freshName("hl")
      val v = ctx.freshName("v")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$numHashes]);
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $hl = $a.isNullAt($j) ? 42L : $xxh.hashLong($a.getLong($j), 42L);
         |    for (int $s = 0; $s < $numHashes; $s++) {
         |      long $v = $xxh.hashInt($s, $hl);
         |      if ($v < $mins[$s]) $mins[$s] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}
