package graft.expressions

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.SparkSuite
import graft.operators.Lsh

/** Catalyst hygiene of the fused LSH banding expression: structural
  * equality must hold across independently-built instances, or
  * canonicalization / subexpression elimination / exchange reuse silently
  * stop applying to the LSH self-joins. The child is a BoundReference
  * (structurally stable) — `col("v")`'s column node carries a stack-trace
  * Origin as a constructor field, so two `col` calls never compare equal
  * regardless of this expression's own equality. */
class LshBandKeysSpec extends SparkSuite {

  private val child = BoundReference(0, ArrayType(DoubleType), nullable = true)

  private def build(): LshBandKeys = {
    val planes = Lsh.hyperplanes(8, 4)
    LshBandKeys(child.copy(),
      planes.map(_.toIndexedSeq).toIndexedSeq, rowsPerBand = 4)
  }

  test("structurally identical instances are equal and semanticEquals") {
    val (e1, e2) = (build(), build())
    assert(e1 == e2, "case-class equality must be structural, not reference")
    assert(e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2))
  }

  test("different planes or banding are not equal") {
    val e1 = build()
    val other = LshBandKeys(child.copy(),
      Lsh.hyperplanes(8, 4).map(p => p.map(_ + 1.0).toIndexedSeq)
        .toIndexedSeq, rowsPerBand = 4)
    assert(e1 != other)
    val rebanded = LshBandKeys(child.copy(),
      Lsh.hyperplanes(8, 4).map(_.toIndexedSeq).toIndexedSeq,
      rowsPerBand = 2)
    assert(e1 != rebanded)
  }
}
