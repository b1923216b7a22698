package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine-portable 60-bit md5 hash —
  * semantically identical to `conv(substring(md5(s), 1, 15), 16, 10)`
  * (the first 15 hex nibbles of md5 read as an integer; DuckDB replay:
  * `('0x' || substr(md5(s), 1, 15))::BIGINT`).
  *
  * This is the per-shingle/per-token inner call of the whole dedup
  * family (q21/q22/q23/q46), so it gets the (b)-tier treatment: the
  * composable form hex-encodes the 16-byte digest into a 32-char string,
  * substrings it, and re-parses base-16 — three allocations and a parse
  * per row. Here the value comes straight off the digest bytes (first 8
  * bytes big-endian, logically shifted right 4 = first 15 nibbles), with
  * a thread-local MessageDigest so no per-row cipher instantiation.
  * Registered as SQL function `md5_long60` via [[GraftFunctions]].
  */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_long60 requires a string argument, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_long60"

  override def nullSafeEval(input: Any): Any =
    Md5Long60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Long60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s): big-endian long of bytes 0-7, unsigned-
    * shifted right 4 — exactly the first 15 hex chars parsed base-16.
    */
  def hash(s: UTF8String): Long = {
    val m = digest.get()
    m.reset()
    val d = m.digest(s.getBytes)
    val hi =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    hi >>> 4
  }

  /** Driver-side convenience for deriving code-level constants (e.g. the
    * ±1 sign-projection matrix in [[graft.operators.Ann]]) from the same
    * engine-portable hash the oracle SQL replays.
    */
  def hashStr(s: String): Long = hash(UTF8String.fromString(s))
}
