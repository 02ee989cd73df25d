package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a gram-hash array: all [[MinHash.Perms]]
  * permutation minima in ONE pass over the input, inside whole-stage
  * codegen — the hot loop of signature computation for both the batch
  * band pipeline and streaming LSH.
  *
  * The higher-order-function form (8 × `array_min(transform(hvs, ...))`)
  * walks the array eight times through interpreted lambda closures and
  * allocates eight transformed copies; this expression keeps the eight
  * running minima in locals and reads each element once. Permutation
  * constants and modulus are [[MinHash]]'s (the DuckDB oracle contract).
  *
  * Returns array<long> of length Perms; null for a null input, a null
  * element, or an EMPTY input (a gram-less doc has no signature — the
  * same contract as the aggregate form, where zero rows produce no
  * signature at all).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hvs = input.asInstanceOf[ArrayData]
    val n = hvs.numElements()
    if (n == 0) return null
    val mins = Array.fill(MinHash.Perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (hvs.isNullAt(i)) return null
      val h = hvs.getLong(i)
      var j = 0
      while (j < MinHash.Perms) {
        val v = Math.floorMod(MinHash.a(j) * h + MinHash.b(j), MinHash.P)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hvs => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val as = ctx.freshName("as")
      val bs = ctx.freshName("bs")
      val perms = MinHash.Perms
      val aInit = (0 until perms).map(MinHash.a).mkString("{", "L,", "L}")
      val bInit = (0 until perms).map(MinHash.b).mkString("{", "L,", "L}")
      s"""
         |final int $n = $hvs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $as = $aInit;
         |  final long[] $bs = $bInit;
         |  final long[] $mins = new long[$perms];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($hvs.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $h = $hvs.getLong($i);
         |    for (int $j = 0; $j < $perms; $j++) {
         |      final long $v = Math.floorMod($as[$j] * $h + $bs[$j], ${MinHash.P}L);
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
