package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based check of the merge-pass intersect against a model
  * implementation (Set intersection), over arbitrary sorted distinct
  * long arrays — including empty, disjoint, identical, and
  * shared-prefix/suffix shapes that a hand-picked table misses.
  * Runs the expression's interpreted path directly (no Spark session).
  */
class IntersectPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val sortedDistinct: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted.toArray)

  private def count(a: Array[Long], b: Array[Long]): Long = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val e = SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b))
    e.nullSafeEval(ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      .asInstanceOf[Long]
  }

  test("sorted-intersect count equals set-intersection size") {
    check(forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      count(a, b) == a.toSet.intersect(b.toSet).size.toLong
    })
  }

  test("commutative, bounded, and exact on self") {
    check(forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      val c = count(a, b)
      c == count(b, a) && c <= math.min(a.length, b.length) &&
        count(a, a) == a.length.toLong
    })
  }
}
