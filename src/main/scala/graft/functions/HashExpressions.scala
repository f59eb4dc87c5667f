package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** JVM-side kernel shared by interpreted eval and generated code. */
object HashUtil {
  private val digest = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 as a non-negative long — bit-identical to
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`: the first 15 hex
    * chars are the first 7.5 digest bytes, i.e. the big-endian first
    * 8 bytes shifted right one nibble.
    */
  def md5Long60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }
}

/** Fused 60-bit md5 hash of a binary input.
  *
  * The composable formulation — `conv(substring(md5(x), 1, 15), 16, 10)
  * .cast(long)` — materializes a 32-char hex string, slices it, and
  * re-parses it per row; this expression goes digest-bytes → long
  * directly. Same value, one allocation instead of three string
  * round-trips, on the path every shingle/token of the dedup family
  * passes through.
  */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5long60 requires binary input, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5long60"

  override def nullSafeEval(input: Any): Any =
    HashUtil.md5Long60(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashUtil.md5Long60($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Long60 = copy(child = newChild)
}
