package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** First `nibbles` hex nibbles of md5(input) as an unsigned long — the
  * engine-portable hash the sketch/dedup/checksum family is built on
  * (DuckDB: `('0x' || substr(md5(v), 1, nibbles))::BIGINT`), computed
  * without the composite's three per-row costs.
  *
  * The `conv(substring(md5(x), 1, n), 16, 10)` composite this replaces
  * evaluates per ROW: one `MessageDigest.getInstance("MD5")` (a JCA
  * provider lookup — jstack during the sf100 span-dup probe showed
  * executor threads parked contending on it at 32 cores), one 32-char
  * hex-string materialization, one substring copy, and one base-16
  * string parse (`NumberConverter.convert`, also digest-allocating).
  * This expression digests the bytes with a per-THREAD reused
  * MessageDigest and assembles the prefix long directly from the first
  * ⌈n/2⌉ digest bytes — no strings anywhere, and `doGenCode` is one
  * static call so the projection stays inside whole-stage codegen.
  *
  * Value-identical to the composite for 1 ≤ nibbles ≤ 15 (the prefix
  * fits a positive long: 15 nibbles = 60 bits), including on empty
  * input; NULL-intolerant like the composite (null in → null out).
  */
case class Md5Prefix(child: Expression, nibbles: Int) extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15,
    s"graft_md5_prefix nibbles must be in [1, 15], got $nibbles")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input (cast strings explicitly " +
        "so the hashed bytes are stated, not inferred)")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix.prefix(input.asInstanceOf[Array[Byte]], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Md5Prefix.prefix($c, $nibbles)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix {
  /** Column wrapper for DataFrame call sites. */
  def of(c: org.apache.spark.sql.Column, nibbles: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Md5Prefix(org.apache.spark.sql.graftbridge.Bridge.expression(c), nibbles))

  /** One digest per thread for the task's lifetime — MessageDigest is
    * stateful but reset by `digest()`, and executor task threads never
    * share an expression evaluation. */
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Java-callable from generated code. */
  def prefix(bytes: Array[Byte], nibbles: Int): Long = {
    val digest = digests.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = digest(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}
