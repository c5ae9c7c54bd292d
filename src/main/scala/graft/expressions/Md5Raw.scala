package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** The 16 raw md5 digest bytes as BINARY — the order-preserving compact
  * form of Spark's hex-string `md5()`.
  *
  * Spark (and DuckDB) compare BINARY bytewise UNSIGNED, which is exactly
  * the lexicographic order of the lowercase-hex digest string: every
  * MIN/MAX/ORDER BY/DISTINCT over `md5(x)` hex strings produces the same
  * ranking over `graft_md5_raw(x)` at half the bytes (16 vs a 32-char
  * UTF8String) and none of the per-row costs of the built-in (`Md5`
  * delegates to commons-codec `DigestUtils.md5Hex`, which looks up the
  * JCA provider and materializes the hex string per ROW — the same
  * contention the sf100 span-dup probe caught for the composite prefix
  * hash, see [[Md5Prefix]]). Display form is recovered losslessly with
  * `lower(hex(col))`, so hot paths that only ORDER or COMPARE digests
  * carry 16 bytes and re-derive the hex only for final output rows.
  *
  * Digests with a per-THREAD reused MessageDigest; `doGenCode` is one
  * static call, so projections stay inside whole-stage codegen.
  * NULL-intolerant like the built-in (null in → null out).
  */
case class Md5Raw(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input (cast strings explicitly " +
        "so the hashed bytes are stated, not inferred)")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_md5_raw"

  override def nullSafeEval(input: Any): Any =
    Md5Raw.digest(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Raw.digest($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Raw {
  /** Column wrapper for DataFrame call sites. */
  def of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Md5Raw(org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** One digest per thread for the task's lifetime — MessageDigest is
    * stateful but reset by `digest()`, and executor task threads never
    * share an expression evaluation. */
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Java-callable from generated code. */
  def digest(bytes: Array[Byte]): Array[Byte] = digests.get().digest(bytes)
}
