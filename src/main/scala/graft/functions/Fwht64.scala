package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_fwht64(vd) → array<double>` — the OPQ rotation R·x where
  * R = (1/8)·H·D (64×64 Walsh–Hadamard × the ±1 hash diagonal, see
  * VectorExprs.rotExpr), as the FAST transform: O(64·log 64) adds
  * via the in-place butterfly instead of the O(64²) naive product.
  *
  * The naive HOF form (nested transform/aggregate) is interpreted
  * per element (Spark HOFs are CodegenFallback) — measured 22.7 s to
  * rotate the sf0.1 corpus, the heaviest warm cache of round 8; this
  * fused primitive-double loop is the graft_minhash64 move applied
  * to the rotation.
  *
  * FLOAT-ORDER CONTRACT (what makes the gate exact): stage order
  * h = 1, 2, 4, …, 32; within a stage, for the pair (i, i+h) with
  * (i & h) == 0: new[i] = old[i] + old[i+h], new[i+h] = old[i] −
  * old[i+h]; the /8 normalization is one final per-element divide.
  * The DuckDB oracle (VectorExprs.ebrCtes) runs the IDENTICAL staged
  * butterfly as six list_transform CTE columns, so doubles are
  * bit-identical — the butterfly's sums differ from the naive
  * product's only by float rounding, but both ENGINES must walk the
  * same order, which is why the naive form could not simply stay on
  * one side.
  *
  * CONTRACT: input array<double> of exactly 64 non-null elements
  * (the embedding width; enforced upstream by the cast builders). */
object FwhtOps {
  def fwht64(v: ArrayData): ArrayData = {
    // Registered as a public SQL function: on an UnsafeArrayData
    // shorter than 64, getDouble does no bounds check, so a contract
    // violation must fail loudly here rather than yield garbage.
    require(v.numElements() == 64,
      s"graft_fwht64 requires exactly 64 elements, got ${v.numElements()}")
    val y = new Array[Double](64)
    var d = 0
    while (d < 64) {
      val dd = d + 1L
      val sign = (1L - 2L * ((dd * 2654435761L % 1000003L) % 2L)).toDouble
      y(d) = sign * v.getDouble(d)
      d += 1
    }
    var h = 1
    while (h < 64) {
      var i = 0
      while (i < 64) {
        if ((i & h) == 0) {
          val a = y(i)
          val b = y(i + h)
          y(i) = a + b
          y(i + h) = a - b
        }
        i += 1
      }
      h <<= 1
    }
    var j = 0
    while (j < 64) {
      y(j) = y(j) / 8.0
      j += 1
    }
    new GenericArrayData(y)
  }
}

case class Fwht64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_fwht64"
  override def nullSafeEval(v: Any): Any =
    FwhtOps.fwht64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FwhtOps.fwht64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
