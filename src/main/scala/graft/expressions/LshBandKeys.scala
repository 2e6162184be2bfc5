package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sign-LSH banding: all `bands × rowsPerBand` plane dots of one
  * vector in a single fused loop over a flat primitive plane matrix,
  * emitting the per-band '0'/'1' key strings as one array.
  *
  * Why an expression and not composition: the compositional form (one
  * `cosine_sim(v, lit(plane)) >= 0` per plane, concat per band, array of
  * bands) is semantically identical but evaluates 128 separate expression
  * trees per row, each walking a BOXED literal ArrayData — measured ~1 ms
  * per row at 128 planes (2 s for a 2000-row corpus, per side of a
  * self-join). This fused loop reads the plane matrix from one primitive
  * `double[]` reference object: the same work is ~10 µs per row.
  *
  * Bit semantics: bit = (dot >= 0) — identical to the DuckDB oracle's
  * `list_dot_product(v, p) >= 0` (and to the sign of the cosine: IEEE
  * division by a positive norm product preserves sign exactly). A vector
  * whose length differs from the planes' dimension yields null (defensive,
  * same contract as cosine_sim's dimension check).
  *
  * Planes are held as immutable `Seq[Seq[Double]]`, not arrays: case-class
  * equality on an `Array` parameter is reference identity, which would make
  * two structurally identical instances never `semanticEquals` — defeating
  * canonicalization, subexpression elimination, and exchange/plan reuse
  * (e.g. both sides of the LSH self-join carry this expression). */
case class LshBandKeys(child: Expression, planes: Seq[Seq[Double]],
    rowsPerBand: Int) extends UnaryExpression {

  require(planes.nonEmpty && planes.length % rowsPerBand == 0,
    s"plane count ${planes.length} not a multiple of rowsPerBand $rowsPerBand")

  private val numPlanes = planes.length
  private val dim = planes.head.length
  private val numBands = numPlanes / rowsPerBand

  /** Flat row-major plane matrix — primitive, boxing-free, one reference
    * object in generated code. */
  private lazy val flat: Array[Double] = {
    val f = new Array[Double](numPlanes * dim)
    var h = 0
    while (h < numPlanes) {
      val row = planes(h)
      var j = 0
      while (j < dim) { f(h * dim + j) = row(j); j += 1 }
      h += 1
    }
    f
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_keys expects array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val keys = new Array[AnyRef](numBands)
    val buf = new Array[Byte](rowsPerBand)
    var b = 0
    while (b < numBands) {
      var r = 0
      while (r < rowsPerBand) {
        val base = (b * rowsPerBand + r) * dim
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += flat(base + j) * v.getDouble(j); j += 1 }
        buf(r) = if (dot >= 0) '1' else '0'
        r += 1
      }
      keys(b) = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, rowsPerBand))
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("lshPlanes", flat, "double[]")
      val keys = ctx.freshName("keys"); val buf = ctx.freshName("buf")
      val b = ctx.freshName("b"); val r = ctx.freshName("r")
      val j = ctx.freshName("j"); val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  UTF8String[] $keys = new UTF8String[$numBands];
         |  byte[] $buf = new byte[$rowsPerBand];
         |  for (int $b = 0; $b < $numBands; $b++) {
         |    for (int $r = 0; $r < $rowsPerBand; $r++) {
         |      int $base = ($b * $rowsPerBand + $r) * $dim;
         |      double $dot = 0.0;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $dot += $p[$base + $j] * $v.getDouble($j);
         |      }
         |      $buf[$r] = $dot >= 0 ? (byte) '1' : (byte) '0';
         |    }
         |    $keys[$b] = UTF8String.fromBytes(
         |      java.util.Arrays.copyOf($buf, $rowsPerBand));
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : LshBandKeys = copy(child = newChild)
}
