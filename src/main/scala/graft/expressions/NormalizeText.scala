package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as a native codegen expression — the
  * canonicalization pass every text-curation pipeline runs before hashing,
  * deduplicating, or tokenizing (two byte-distinct encodings of "café" must
  * dedup together). Spark has no built-in NFC/NFKC/strip-accents scalar
  * (the reference stack leans on the warehouse's collation for this; see
  * `scripts/transform-complex-full.py` normalizing free-text columns), so
  * this is the §7.3 rung-(b) path: a UnaryExpression whose `doGenCode`
  * emits one static call, keeping the projection inside whole-stage
  * codegen rather than falling back to an interpreted UDF.
  *
  * Modes:
  *   - `nfc` / `nfkc`: `java.text.Normalizer` canonical / compatibility
  *     composition — byte-parity with DuckDB's `nfc_normalize` (both
  *     implement the Unicode UAX #15 mapping).
  *   - `strip`: accent removal — NFD-decompose, drop combining marks
  *     (categories Mn/Mc/Me), NFC-recompose. Matches DuckDB
  *     `strip_accents` on Latin text (both reduce to the base letter
  *     whether the input was precomposed or decomposed).
  */
case class NormalizeText(child: Expression, mode: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String], mode)

  /** One static call — the JIT inlines the dispatch; the expression stays
    * inside the WholeStageCodegen span (no CodegenFallback). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NormalizeText.normalize($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  val NfcMode = 0
  val NfkcMode = 1
  val StripMode = 2

  def modeOf(name: String): Int = name.toLowerCase match {
    case "nfc" => NfcMode
    case "nfkc" => NfkcMode
    case "strip" | "strip_accents" => StripMode
    case other => throw new IllegalArgumentException(
      s"graft_normalize mode must be nfc|nfkc|strip, got '$other'")
  }

  /** Java-callable from generated code (static forwarder on the companion
    * class). UTF8String in/out — the only allocation is the normalized
    * copy; already-normalized ASCII returns a fresh wrapper over the same
    * logical bytes. */
  def normalize(s: UTF8String, mode: Int): UTF8String = {
    val str = s.toString
    val out = mode match {
      case NfcMode => Normalizer.normalize(str, Normalizer.Form.NFC)
      case NfkcMode => Normalizer.normalize(str, Normalizer.Form.NFKC)
      case _ => stripAccents(str)
    }
    UTF8String.fromString(out)
  }

  private def stripAccents(s: String): String = {
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.append(c)
      i += 1
    }
    Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
  }
}
