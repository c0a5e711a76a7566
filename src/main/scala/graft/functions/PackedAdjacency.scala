package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Delta-varint packing of sorted adjacency lists — the g33 peel's
  * shuffle diet.
  *
  * The k-truss support round ships each edge's out-adjacency array
  * through the ov-side probe exchange; as an `array<bigint>` every
  * neighbor costs 8 bytes plus UnsafeArrayData framing, and at the
  * sf10 projection (120M edges, Σout² payload) that exchange overran
  * this host's scratch twice (measured, round 6/7). Packed as
  * LEB128 varints of FIRST VALUE then GAPS (sorted ascending ⇒ gaps
  * ≥ 1, and neighbor ids cluster inside their tile's id range), the
  * same list costs ~2–3 bytes per neighbor — a 3×+ reduction in the
  * bytes every probe shuffle and spill carries.
  *
  * `graft_pack_deltas(array<bigint>) → binary` packs once per
  * adjacency row (V rows); `graft_packed_intersect(binary, binary) →
  * array<bigint>` merge-walks two packed buffers per edge row
  * without materializing either side — both codegen via a static
  * call into [[PackedOps]], so the E-row intersect stays inside the
  * whole-stage-generated loop.
  *
  * CONTRACT: input arrays sorted ascending, distinct, non-null,
  * non-negative (our adjacency builders use
  * `sort_array(collect_list(...))` over key columns).
  */
object PackedOps {

  def pack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    // size pass: varint byte count of first value + gaps
    var bytes = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      var v = if (i == 0) arr.getLong(0) else arr.getLong(i) - prev
      prev = arr.getLong(i)
      do { bytes += 1; v >>>= 7 } while (v != 0)
      i += 1
    }
    val out = new Array[Byte](bytes)
    var p = 0
    prev = 0L
    i = 0
    while (i < n) {
      var v = if (i == 0) arr.getLong(0) else arr.getLong(i) - prev
      prev = arr.getLong(i)
      while ((v & ~0x7fL) != 0) {
        out(p) = ((v & 0x7f) | 0x80).toByte; p += 1; v >>>= 7
      }
      out(p) = v.toByte; p += 1
      i += 1
    }
    out
  }

  // decode the varint at b(p); returns the value, advancing via the
  // returned new position packed in the high bits is ugly — use a
  // tiny mutable cursor instead (one per call site, stack-allocated
  // by escape analysis in the hot loop)
  @inline private def readVarint(b: Array[Byte], pos: Int): Long = {
    var p = pos; var shift = 0; var v = 0L
    var more = true
    while (more) {
      val x = b(p); p += 1
      v |= (x & 0x7fL) << shift
      shift += 7
      more = (x & 0x80) != 0
    }
    v
  }

  @inline private def varintLen(b: Array[Byte], pos: Int): Int = {
    var p = pos
    while ((b(p) & 0x80) != 0) p += 1
    p - pos + 1
  }

  def intersect(a: Array[Byte], b: Array[Byte]): ArrayData = {
    var buf = new Array[Long](8)
    var n = 0
    var ia = 0; var ib = 0
    var va = 0L; var vb = 0L
    var haveA = false; var haveB = false
    while ((haveA || ia < a.length) && (haveB || ib < b.length)) {
      if (!haveA) {
        va += readVarint(a, ia); ia += varintLen(a, ia); haveA = true
      }
      if (!haveB) {
        vb += readVarint(b, ib); ib += varintLen(b, ib); haveB = true
      }
      if (va == vb) {
        if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
        buf(n) = va; n += 1
        haveA = false; haveB = false
      } else if (va < vb) haveA = false
      else haveB = false
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, n))
  }
}

case class PackDeltas(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pack_deltas"
  override def nullSafeEval(v: Any): Any =
    PackedOps.pack(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PackedOps.pack($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PackedIntersect(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_packed_intersect"
  override def nullSafeEval(l: Any, r: Any): Any =
    PackedOps.intersect(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.PackedOps.intersect($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
