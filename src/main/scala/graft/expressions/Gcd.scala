package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: greatest common divisor of two BIGINTs,
  * with whole-stage codegen. Spark has no gcd builtin (DuckDB does), and
  * the engine's exact-rational outputs (q112 TWAP, q120 returns, q131
  * interpolation) want reduced fractions so equal VALUES get equal
  * REPRESENTATIONS — (3,6) and (1,2) hash differently but mean the same
  * number; dividing both legs by the gcd canonicalizes them.
  *
  * Semantics match DuckDB's `gcd`: the result is the non-negative gcd of
  * the absolute values; gcd(0, x) = |x| and gcd(0, 0) = 0. Nulls
  * propagate via `BinaryExpression`'s default null-safety. The one
  * unrepresentable case — a true gcd magnitude of 2^63 (both inputs
  * multiples of Long.MinValue) — throws ArithmeticException, mirroring
  * DuckDB's out-of-range error, instead of returning a negative "gcd"
  * that would silently flip signs in a rational reduction.
  */
case class Gcd(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int_gcd expects (bigint, bigint), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "int_gcd"

  override def nullSafeEval(l: Any, r: Any): Any = {
    var a = math.abs(l.asInstanceOf[Long])
    var b = math.abs(r.asInstanceOf[Long])
    while (b != 0L) { val t = a % b; a = b; b = t }
    val g = math.abs(a)
    if (g < 0L) // |gcd| = 2^63: unrepresentable in int64
      throw new ArithmeticException("int_gcd out of range: |gcd| = 2^63")
    g
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      val t = ctx.freshName("t")
      s"""
         |long $a = java.lang.Math.abs($l);
         |long $b = java.lang.Math.abs($r);
         |while ($b != 0L) { long $t = $a % $b; $a = $b; $b = $t; }
         |${ev.value} = java.lang.Math.abs($a);
         |if (${ev.value} < 0L) {
         |  throw new ArithmeticException(
         |    "int_gcd out of range: |gcd| = 2^63");
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Gcd =
    copy(left = newLeft, right = newRight)
}

object Gcd {
  /** Column-API form. */
  def gcd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(Gcd(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** Runtime registration (idempotent) so `expr("int_gcd(a, b)")` works
    * on any session — called from Tables.configure. Guarded on
    * functionExists so repeat calls don't emit the SimpleFunctionRegistry
    * "replaced" WARN (see CosineSimilarity.register). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("int_gcd")))
      reg.createOrReplaceTempFunction(
        "int_gcd", exprs => Gcd(exprs(0), exprs(1)), "scala_udf")
  }
}
