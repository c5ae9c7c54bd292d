package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `split(s, "\\s+")` as a single byte scan — the tokenizer under
  * `TextAnalysis.words`, which feeds every text-family query.
  *
  * The built-in path is `StringSplit` → `UTF8String.split` →
  * `String.split(regex, -1)`, which per ROW: converts the whole document
  * to a java.lang.String, COMPILES the `\s+` pattern (String.split's
  * no-regex fast path only covers single-char literals), runs the
  * matcher, materializes a String[] and re-encodes every token back to
  * UTF8String. This expression scans the UTF-8 bytes once and emits
  * tokens as zero-copy slices of one backing array.
  *
  * Value-exact to `String.split("\\s+", -1)` by construction: Java's
  * non-UNICODE `\s` is exactly {0x09–0x0D, 0x20}, all ASCII, and UTF-8
  * multi-byte sequences never contain bytes < 0x80 — so the byte scan
  * and the regex agree on every input, including the edge semantics
  * (empty input → [""], leading separator → leading "" token, trailing
  * separator run → ONE trailing "" token). Pinned by WhitespaceTokensSpec
  * and a ScalaCheck property against the built-in on adversarial
  * whitespace/Unicode mixes. Default (binary) collation only — which is
  * the only collation this engine runs.
  *
  * CROSS-ENGINE CAVEAT (not a Spark-side divergence): the DuckDB oracles
  * tokenize with RE2's `\s`, which EXCLUDES vertical tab 0x0B, while
  * Java's `\s` (and this scan) includes it; and on invalid UTF-8 Java
  * replaces bad sequences with U+FFFD before matching while this byte
  * scan passes the raw bytes through. Both asymmetries predate this
  * expression (the built-in split has them identically) and are inert on
  * the corpus: the generator emits only {0x09,0x0A,0x20} whitespace and
  * valid UTF-8, and WhitespaceTokensSpec pins a corpus invariant probe
  * (no 0x0B / no invalid UTF-8 in documents.text) so a corpus change
  * that re-arms the divergence fails CI rather than drifting silently. */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ws_tokens"

  override def nullSafeEval(input: Any): Any =
    WhitespaceTokens.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WhitespaceTokens.split($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WhitespaceTokens {
  /** Column wrapper for DataFrame call sites. */
  def of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WhitespaceTokens(org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Java-callable from generated code. */
  def split(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    if (n == 0) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val bytes = s.getBytes // one materialization; tokens slice it zero-copy
    // count tokens: one per separator-run boundary, exactly String.split
    // with limit -1 (leading empty when the input starts with a
    // separator; one trailing empty when it ends with one)
    var count = 1
    var i = 0
    var inSep = false
    while (i < n) {
      val ws = isWs(bytes(i))
      if (ws && !inSep) count += 1
      inSep = ws
      i += 1
    }
    val out = new Array[Any](count)
    var tok = 0
    var start = 0
    i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        out(tok) = UTF8String.fromBytes(bytes, start, i - start)
        tok += 1
        // skip the rest of this separator run
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
        start = i
      } else {
        i += 1
      }
    }
    out(tok) = UTF8String.fromBytes(bytes, start, n - start)
    new GenericArrayData(out)
  }
}
