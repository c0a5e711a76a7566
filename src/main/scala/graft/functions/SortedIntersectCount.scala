package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_sorted_intersect_count(a, b)` — size of the intersection of
  * two ascending-sorted integral arrays, as a single merge pass.
  *
  * `size(array_intersect(a, b))` builds a per-row hash set and an
  * intermediate array; for the hot candidate-verification loops
  * (n-gram Jaccard over shingle sets, edge-iterator triangle closure
  * over out-adjacency lists) this expression does the same count with
  * two pointers, zero allocation, fully inside whole-stage codegen.
  *
  * CONTRACT: both inputs must be sorted ascending with distinct,
  * non-null elements (our callers build them with
  * `sort_array(array_distinct(...))` / `sort_array(collect_list(...))`
  * over key columns). Element types: int or bigint, matching on both
  * sides.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(e @ (IntegerType | LongType), _) => Some(e)
    case _                                          => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(left.dataType) == elem(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> or two array<bigint> arguments of the " +
        s"same type, got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_intersect_count"

  @transient private lazy val isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = if (isLong) a.getLong(i) else a.getInt(i).toLong
      val y = if (isLong) b.getLong(j) else b.getInt(j).toLong
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isLong) "getLong" else "getInt"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val c = ctx.freshName("cnt")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = (long) $a.$get($i);
         |  long $y = (long) $b.$get($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
