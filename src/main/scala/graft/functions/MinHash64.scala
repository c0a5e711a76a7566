package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_minhash64(shingles) → array<bigint>` — the d-family's 64
  * minhash values in ONE native pass.
  *
  * The HOF form — `transform(sequence(0,63), p -> array_min(
  * transform(shingles, s -> ((2p+1)·s + p²+1) mod M)))` — is
  * interpreted per element (Spark higher-order functions are
  * CodegenFallback), which makes the corpus index build
  * EVAL-TREE-bound: 64·|shingles| boxed expression walks per
  * document. Measured at the sf10 dedup trail, the band build ran a
  * single hot core ~100% on `ArrayTransform.nullSafeEval`. This
  * expression computes the identical 64 values (same hash family
  * (2p+1)·s + p²+1 mod 2147483647, same min) as primitive long
  * arithmetic in a fused loop — the inner body is two multiplies,
  * an add and a mod per (shingle, p), inside whole-stage codegen
  * via a static call.
  *
  * CONTRACT: input array<bigint> non-empty with non-null elements in
  * [0, 2^31) — our shingle builders guarantee all three. Output is
  * always exactly 64 values.
  */
object MinHashOps {
  private val M = 2147483647L

  def minhash64(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val out = new Array[Long](64)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getLong(i)
      var p = 0L
      while (p < 64) {
        val v = ((2 * p + 1) * s + p * p + 1) % M
        if (v < out(p.toInt)) out(p.toInt) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash64"
  override def nullSafeEval(v: Any): Any =
    MinHashOps.minhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps.minhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
