package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, DoubleType, Decimal}

/** Static kernel for [[DotDecimal]] — a top-level object so the generated
  * Java calls a static forwarder, one call per row, loop in plain Java.
  */
object DotDecimalKernel {
  private val Twelve = 12
  private val HalfUp = java.math.RoundingMode.HALF_UP

  /** Decimal-exact dot product, replicating EXACTLY the composable
    * formulation `aggregate(zip_with(a, b, (x,y) -> cast(x*y as
    * decimal(25,12))), 0, (acc,v) -> cast(acc+v as decimal(25,12)))`:
    * each IEEE double product is converted the way Spark's Cast does
    * (BigDecimal.valueOf — the canonical shortest representation — then
    * HALF_UP to scale 12) and accumulated exactly. Mismatched lengths or
    * null slots yield null, as zip_with's padding does.
    *
    * Overflow semantics are pinned to the NON-ANSI cast regardless of the
    * session's `spark.sql.ansi.enabled` (under ANSI the composable form
    * would throw instead — that one divergence is deliberate: a
    * deterministic null contract beats a config-dependent exception):
    * a NaN/Infinity product, a product outside decimal(25,12), or an
    * accumulation step whose sum exceeds precision 25 all yield null —
    * and null is ABSORBING in the fold (`cast(null + v)` stays null), so
    * checking per step, not just at the end, is what exact replication
    * requires (a later subtraction can bring the exact sum back in range,
    * but the composable form would already be null by then).
    */
  def compute(a: ArrayData, b: ArrayData): Decimal = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getDouble(i) * b.getDouble(i)
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return null
      val prod = java.math.BigDecimal.valueOf(p).setScale(Twelve, HalfUp)
      if (prod.precision() > 25) return null
      sum = sum.add(prod)
      if (sum.precision() > 25) return null
      i += 1
    }
    Decimal(BigDecimal(sum), 25, 12)
  }
}

/** Native Catalyst expression: the decimal-exact dot product of two
  * array<double> columns — the verification kernel of every oracle-checked
  * ANN/embedding path (q24/q25/q26/q68/q81).
  *
  * The composable `aggregate(zip_with(...))` formulation is semantically
  * identical but walks the higher-order-function machinery per ELEMENT
  * (lambda variable binding, per-element Decimal boxing through the
  * interpreted path); this expression does one static call per ROW with
  * the loop in plain Java. Exactness contract unchanged: identical cast
  * and accumulation semantics, so the DuckDB oracle's
  * `SUM(CAST(x*y AS DECIMAL(25,12)))` replay still matches bit-for-bit —
  * re-verified by the oracle gate on every query that switched to it.
  * Registered as SQL function `dot_dec` via [[GraftFunctions]].
  */
case class DotDecimal(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_dec requires two array<double> arguments, got $l and $r")
    }

  override def dataType: DataType = DecimalType(25, 12)

  override def prettyName: String = "dot_dec"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DotDecimalKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.functions.DotDecimalKernel.compute($a, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
    code
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
