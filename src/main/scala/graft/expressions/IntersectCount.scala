package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, If, IsNull, Literal, Or, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** `size(array_intersect(a, b))` without materializing the intersection
  * array — the exact shape every similarity-verify stage in this engine
  * evaluates per candidate pair (q41/q111/q116/q182: intersect two
  * shingle arrays, keep only the count). `ArrayIntersect` builds a
  * deduplicated result array (a hash set PLUS an output ArrayData per
  * row) that `Size` immediately reduces to one int; this expression runs
  * the same membership loop and allocates only the set.
  *
  * Semantics are pinned to the composed form (AggregatorSpec): count of
  * DISTINCT elements present in both arrays, a null element counting
  * when present in both arrays; null out when either input is null (the
  * legacy `size(null) = −1` mode is handled by the REWRITE rule, which
  * wraps this expression in an If — not by a mode flag here).
  *
  * Codegen posture: the surrounding stage stays whole-stage-generated —
  * the generated code makes one virtual call into this compiled counting
  * loop (the `addReferenceObj` pattern) instead of deoptimizing the
  * whole stage the way a CodegenFallback subtree would. The loop itself
  * is compiled Scala over `ArrayData`, generic in the element type. */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "intersect_count"

  @transient private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val isBinary: Boolean =
    elemType == org.apache.spark.sql.types.BinaryType

  // Array[Byte] has IDENTITY equals/hashCode — hashing raw byte arrays
  // would make every binary element "distinct" and count 0 shared
  // elements; ByteBuffer wraps give value-based equality. Float/Double
  // need NO wrapper: boxed equals says NaN == NaN and -0.0 != 0.0, which
  // is EXACTLY native ArrayIntersect's hash-set behavior (NaN unified
  // per SPARK-36741; signed zeros hash to different buckets) — pinned
  // against the native path in AggregatorSpec, so a Spark upgrade that
  // normalizes -0.0 inside ArrayIntersect fails the suite instead of
  // silently diverging.
  private def keyOf(v: Any): Any =
    if (isBinary) java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]]) else v

  /** Called from both the interpreted path and the generated code. */
  def countIntersect(ar: Any, br: Any): Int = {
    val a = ar.asInstanceOf[ArrayData]
    val b = br.asInstanceOf[ArrayData]
    val inB = new java.util.HashSet[Any]()
    var bNull = false
    b.foreach(elemType, (_, v) =>
      if (v == null) bNull = true else inB.add(keyOf(v)))
    val counted = new java.util.HashSet[Any]()
    var aNullCounted = false
    var n = 0
    a.foreach(elemType, (_, v) =>
      if (v == null) {
        if (bNull && !aNullCounted) { n += 1; aNullCounted = true }
      } else {
        val k = keyOf(v)
        if (inB.contains(k) && counted.add(k)) n += 1
      })
    n
  }

  override def nullSafeEval(a: Any, b: Any): Any = countIntersect(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersectCount", this,
      classOf[IntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.countIntersect($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntersectCount = copy(newLeft, newRight)
}

/** Optimizer rule: `Size(ArrayIntersect(a, b), legacy)` →
  * [[IntersectCount]] — registered by [[GraftExtensions]]
  * (`injectOptimizerRule`), so ANY query in an extensions-enabled
  * session (SQL or DataFrame) gets the allocation-free form with no
  * source change. Semantics-preserving in both null modes: the legacy
  * `size(null) = −1` behavior is reproduced by an If wrapper (children
  * must be deterministic for the duplicated IsNull references to be
  * sound — nondeterministic inputs are left unrewritten). AggregatorSpec
  * pins equality against the composed form on nulls, null elements,
  * duplicates, empties, binary arrays and value rows, and pins that the
  * rule fires on scan-backed plans and SKIPS nested element types. */
object RewriteSizeOfArrayIntersect extends Rule[LogicalPlan] {
  /** Element types whose INTERNAL values carry value-based
    * equals/hashCode, so a java HashSet reproduces SQL equality:
    * UTF8String, boxed numerics/booleans, Decimal, and binary (wrapped
    * to ByteBuffer inside the expression). Nested element types
    * (struct/array/map) are left to the native path — InternalRow /
    * ArrayData equality is representation-dependent (Unsafe vs
    * Generic), and a silent miscount is worse than a skipped rewrite. */
  private def hashSafe(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match { // AtomicType itself is private[sql] — enumerate
      case StringType | BinaryType | BooleanType | DateType | TimestampType |
           TimestampNTZType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai: ArrayIntersect, legacy)
          if ai.deterministic && (ai.left.dataType match {
            case org.apache.spark.sql.types.ArrayType(et, _) => hashSafe(et)
            case _ => false
          }) =>
        val ic = IntersectCount(ai.left, ai.right)
        if (legacy)
          If(Or(IsNull(ai.left), IsNull(ai.right)), Literal(-1), ic)
        else ic
    }
}
