package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash-LSH constants — single source of truth shared by the native
  * band expression below and the oracle-SQL generators in
  * `graft.operators.Dedup` (which embed the identical numbers so DuckDB
  * replays the exact values).
  */
object MinhashParams {
  val NumPerms = 32
  val Bands = 8
  val RowsPerBand: Int = NumPerms / Bands

  /** Modulus for the universal-hash permutations: prime, small enough
    * that `(x mod P) * a + b` stays well under 2⁶³ for a,b < 2³¹.
    */
  val P = 1000000007L

  /** The 32 (a, b) universal-hash constants — fixed seed so the oracle
    * SQL embeds the identical numbers. a ≥ 1 (a = 0 would collapse a
    * permutation to a constant).
    */
  val perms: IndexedSeq[(Long, Long)] = {
    val r = new scala.util.Random(20260812L)
    IndexedSeq.fill(NumPerms)(
      (r.nextInt(Int.MaxValue - 1).toLong + 1L, r.nextInt(Int.MaxValue).toLong))
  }

  private[functions] val A: Array[Long] = perms.map(_._1).toArray
  private[functions] val B: Array[Long] = perms.map(_._2).toArray
}

/** Static kernel for [[MinhashBands]] — one call per row, loops in plain
  * Java: a single pass over the shingle-hash array maintains all 32
  * per-permutation minimums, then the 8 band keys are built as
  * `m:m:m:m` strings (Long.toString — identical to `concat_ws(':', ...)`
  * over BIGINTs in both Spark and DuckDB, so the oracle replay is
  * unchanged).
  */
object MinhashBandsKernel {
  import MinhashParams._

  def compute(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (sh.isNullAt(i)) return null
      val xm = sh.getLong(i) % P
      var j = 0
      while (j < NumPerms) {
        val v = (xm * A(j) + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val bands = new Array[AnyRef](Bands)
    var b = 0
    while (b < Bands) {
      val sb = new java.lang.StringBuilder(48)
      var r = 0
      while (r < RowsPerBand) {
        if (r > 0) sb.append(':')
        sb.append(mins(b * RowsPerBand + r))
        r += 1
      }
      bands(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(bands)
  }
}

/** Native Catalyst expression: MinHash band keys of a shingle-hash array,
  * computed ROW-LOCALLY — the signature stage of the LSH dedup family
  * (q21/q46/q83) with zero exchange.
  *
  * The exploded formulation (explode shingles → groupBy(doc_id) with 32
  * min aggregates) shuffles the full (doc_id, shingle) stream — the
  * corpus-sized exchange that dominates minhash cost at scale. But a
  * document's shingles are already one row's array, so the per-permutation
  * minimums never needed an aggregation: this expression walks the array
  * once per row inside whole-stage codegen and the signature stage becomes
  * pure scan. Values are IDENTICAL to the exploded form (min over the same
  * multiset of `(x mod P)·a + b mod P`), so the DuckDB oracle — which
  * replays the exploded GROUP BY formulation — still hash-matches
  * bit-for-bit (re-verified on q21/q46/q83/q84).
  *
  * Returns the 8 `m:m:m:m` band-key strings (not the 32 raw minimums):
  * one reference in the consuming plan, so projection collapse cannot
  * multiply evaluations. Null/empty shingle arrays yield null.
  * Registered as SQL function `minhash_bands` via [[GraftFunctions]].
  */
case class MinhashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires an array<bigint> argument, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "minhash_bands"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    MinhashBandsKernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MinhashBandsKernel.compute($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
