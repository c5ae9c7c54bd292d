package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the native vector
  * expressions as SQL functions (`graft_dot`, `graft_cosine`) so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works when the session is
  * built with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotEntry)
    ext.injectFunction(GraftExtensions.cosineEntry)
    ext.injectFunction(GraftExtensions.heavyHittersEntry)
    ext.injectFunction(GraftExtensions.normalizeEntry)
    ext.injectFunction(GraftExtensions.countInArrayEntry)
    ext.injectFunction(GraftExtensions.md5PrefixEntry)
    ext.injectFunction(GraftExtensions.md5RawEntry)
    ext.injectFunction(GraftExtensions.wsTokensEntry)
    // HOF dot-product pattern → native codegen expression (bit-exact)
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofVectorOps)
    // physical planning for the custom TopKPerGroup logical operator
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProduct].getName, null, name)

  val dotEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1)))

  val cosineEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two double arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1)))

  val heavyHittersEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters",
        "graft_heavy_hitters(col, k) - Misra-Gries top-term summary with at most k counters"),
      (args: Seq[Expression]) => HeavyHitters(args(0),
        args(1).eval(null).asInstanceOf[Number].intValue()).toAggregateExpression())

  val countInArrayEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_count_in_array"),
      info("graft_count_in_array",
        "graft_count_in_array(arr, v) - count of elements equal to v in a string array"),
      (args: Seq[Expression]) => CountInArray(args(0), args(1)))

  val md5PrefixEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_md5_prefix"),
      info("graft_md5_prefix",
        "graft_md5_prefix(bin, n) - first n hex nibbles of md5(bin) as a long"),
      (args: Seq[Expression]) => Md5Prefix(args(0),
        args(1).eval(null).asInstanceOf[Number].intValue()))

  val md5RawEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_md5_raw"),
      info("graft_md5_raw",
        "graft_md5_raw(bin) - the 16 raw md5 digest bytes (binary order == hex-string order)"),
      (args: Seq[Expression]) => Md5Raw(args(0)))

  val wsTokensEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_ws_tokens"),
      info("graft_ws_tokens",
        "graft_ws_tokens(s) - whitespace tokenization, value-exact to split(s, '\\\\s+')"),
      (args: Seq[Expression]) => WhitespaceTokens(args(0)))

  val normalizeEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_normalize"),
      info("graft_normalize",
        "graft_normalize(s, 'nfc'|'nfkc'|'strip') - Unicode normalization / accent stripping"),
      (args: Seq[Expression]) => NormalizeText(args(0),
        NormalizeText.modeOf(args(1).eval(null).toString)))

  /** Runtime registration for sessions created without the extension hook
    * (idempotent — used by the query builders). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(dotEntry, cosineEntry, heavyHittersEntry, normalizeEntry,
      countInArrayEntry, md5PrefixEntry, md5RawEntry,
      wsTokensEntry).foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }
}
