package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{Block, CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Range-bucket id for `Ranks.withGlobalOrder`: the number of splitter
  * bounds the row's sort key sorts strictly AFTER (rows equal to a bound
  * stay in the earlier bucket), or −1 when any key value is NULL (the
  * caller's sentinel; the bucket-grain offsets relation raises on it).
  *
  * Why custom: the previous formulation inlined the binary search as a
  * nested CASE WHEN decision tree over literal bounds — O(log B)
  * comparisons per ROW but O(B) generated CODE. At the driver gate
  * (32 shuffle partitions → 128 buckets) it compiled; at a realistic
  * cluster config the tree blows Janino's 64 KB method limit and evicts
  * the ENTIRE stage from whole-stage codegen — measured at sf100 with
  * shuffle.partitions=256 (1024 buckets): the q84 BM25 scorer stage fell
  * back to interpreted eval for every corpus row. This expression keeps
  * the generated code CONSTANT-SIZE at any bucket count: evaluate the
  * keys, box them into a reusable per-partition buffer, and call one
  * reference-object method that binary-searches the bounds with Spark's
  * own interpreted orderings (`TypeUtils.getInterpretedOrdering` — binary
  * UTF8 order for strings, NaN-aware for doubles — the same order the
  * driver-side bound sort uses, so search monotonicity holds by
  * construction).
  *
  * Bounds are held as EXTERNAL row values (what `splitterBounds` collects)
  * and converted to the internal representation once per JVM, lazily —
  * the expression itself stays a pure value function of the row, which is
  * the property the two-level rank depends on (every consumer of the same
  * DataFrame sees identical bucket ids regardless of physical execution).
  */
case class RangeBucketId(
    keys: Seq[Expression],
    asc: Seq[Boolean],
    boundsExternal: Array[Array[Any]]) extends Expression {

  require(keys.nonEmpty && keys.length == asc.length)

  override def children: Seq[Expression] = keys
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "graft_range_bucket_id"
  // bounds are deliberately NOT part of the simpleString: 4k bounds × wide
  // keys would bloat every explain/plan log the way the literal tree did.
  override def simpleString(maxFields: Int): String = toString
  override def toString: String =
    s"$prettyName(${keys.mkString(", ")}, bounds=${boundsExternal.length})"

  @transient private lazy val searcher =
    new BoundsSearcher(keys.map(_.dataType).toArray, asc.toArray, boundsExternal)

  override def eval(input: InternalRow): Any = {
    val n = keys.length
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v = keys(i).eval(input)
      if (v == null) return -1
      vals(i) = v
      i += 1
    }
    searcher.search(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketSearcher", searcher,
      classOf[BoundsSearcher].getName)
    val n = keys.length
    // one boxing buffer per partition, not per row
    val buf = ctx.addMutableState("java.lang.Object[]", "bucketKeyBuf",
      v => s"$v = new java.lang.Object[$n];")
    val anyNull = ctx.freshName("anyNull")
    val evals = keys.map(_.genCode(ctx))
    val fill: Block = evals.zipWithIndex.map { case (e, i) =>
      val dt = keys(i).dataType
      val boxed =
        if (CodeGenerator.isPrimitiveType(dt))
          s"${CodeGenerator.boxedType(dt)}.valueOf(${e.value})"
        else s"${e.value}"
      code"""
         |${e.code}
         |if (${e.isNull}) { $anyNull = true; } else { $buf[${i.toString}] = $boxed; }
       """.stripMargin
    }.reduce(_ + _)
    ev.copy(
      code =
        code"""
           |boolean $anyNull = false;
           |$fill
           |int ${ev.value} = $anyNull ? -1 : $ref.search($buf);
         """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(keys = newChildren)
}

/** The driver-built bounds table + binary search behind [[RangeBucketId]].
  * Serialized to executors inside the generated code's reference array;
  * internal-representation bounds and per-column orderings are rebuilt
  * lazily per JVM. */
final class BoundsSearcher(
    types: Array[DataType],
    asc: Array[Boolean],
    boundsExternal: Array[Array[Any]]) extends Serializable {

  @transient private lazy val ords: Array[Ordering[Any]] =
    types.map(Bridge.interpretedOrdering)

  @transient private lazy val bounds: Array[Array[Any]] = {
    val conv = types.map(Bridge.toCatalystConverter)
    boundsExternal.map { row =>
      val out = new Array[Any](row.length)
      var i = 0
      while (i < row.length) { out(i) = conv(i)(row(i)); i += 1 }
      out
    }
  }

  /** Lexicographic compare of the row's key values against bound `b`,
    * honoring per-column direction; > 0 means "row sorts strictly after". */
  private def cmp(values: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < types.length) {
      val c = ords(i).compare(values(i), b(i))
      if (c != 0) return if (asc(i)) c else -c
      i += 1
    }
    0
  }

  /** Number of bounds the key sorts strictly after (equal ⇒ earlier
    * bucket) — identical semantics to the old literal CASE tree. */
  def search(values: Array[Any]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(values, bounds(mid)) > 0) lo = mid + 1 else hi = mid
    }
    lo
  }
}
