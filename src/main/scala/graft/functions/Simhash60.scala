package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernel for [[Simhash60]]: one pass over the token-hash array
  * accumulates the 60 bit votes (+1 when the token's hash has bit i set,
  * −1 otherwise, weighted by occurrence since the array is non-distinct),
  * then the fingerprint is the sign vector — bit i set iff vote i > 0.
  * Identical to the exploded `SUM(CASE WHEN (h >> i) & 1 ...)` GROUP BY
  * formulation the DuckDB oracle replays.
  */
object Simhash60Kernel {
  private val Bits = 60

  def compute(hs: ArrayData): Any = {
    val n = hs.numElements()
    if (n == 0) return null
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      val h = hs.getLong(i)
      var b = 0
      while (b < Bits) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

/** Native Catalyst expression: the 60-bit SimHash fingerprint of a
  * token-hash array, computed ROW-LOCALLY — q22's signature stage with
  * zero exchange (same rework as [[MinhashBands]]: the exploded
  * formulation shuffled the full (doc_id, token) stream into a 60-column
  * vote aggregate; a document's tokens are one row's array, so the votes
  * never needed an aggregation). Values identical to the exploded GROUP
  * BY, so the q22 oracle is unchanged. Null/empty arrays yield null.
  * Registered as SQL function `simhash60` via [[GraftFunctions]].
  */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires an array<bigint> argument, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash60"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Simhash60Kernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val res = ctx.freshName("simhashRes")
      s"""
         |Object $res = graft.functions.Simhash60Kernel.compute($a);
         |${ev.isNull} = $res == null;
         |${ev.value} = ${ev.isNull} ? -1L : ((Long) $res).longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
