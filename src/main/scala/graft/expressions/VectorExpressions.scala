package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Rationale (measured, see Dedup scaladoc): Spark's higher-order
  * functions (`zip_with` + `aggregate`) evaluate their lambdas
  * interpreted — outside whole-stage codegen — which makes an O(n²)
  * similarity pair loop ~10× slower than generated code. A scalar
  * BinaryExpression with `doGenCode` keeps the dot-product loop inside
  * the generated stage: one fused pass computing dot and both norms.
  *
  * Preference order per the build charter: compose built-ins → custom
  * Expression → custom plan. Cosine is a scalar function of two columns,
  * so an Expression is the right altitude; no custom SparkPlan needed.
  */
/** Inputs must already be `array<double>` (cast via
  * VectorFunctions.toDoubleVec); type enforcement is left to the caller
  * because ExpectsInputTypes' AbstractDataType is private[sql]. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  // result is null for length-mismatched inputs even when children are
  // non-nullable, so nullability must not be inferred from them
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_similarity"

  /** Interpreted path (used off the codegen path, e.g. in constant
    * folding): same accumulation order as the generated loop, so results
    * are bit-identical either way. Length-mismatched vectors yield null —
    * the same answer zip_with-based cosine gives — rather than a silent
    * prefix cosine that would mask truncated embeddings. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getDouble(i); val yv = y.getDouble(i)
        dot += xv * yv; nx += xv * xv; ny += yv * yv
        i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xv = $a.getDouble($i);
            double $yv = $b.getDouble($i);
            $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity = copy(newLeft, newRight)
}

/** Squared L2 distance between two fixed-point vectors (`array<long>`),
  * fully in integer arithmetic — Σ (aᵢ-bᵢ)². The k-means quantizer's hot
  * loop ([[graft.operators.Similarity.kmeansAssign]]): O(n·k·d) evaluations
  * per Lloyd iteration, so it must stay inside whole-stage codegen, and it
  * must be exactly reproducible across engines for the DuckDB oracle —
  * integer math is order-independent, unlike a double fold.
  *
  * Overflow posture: inputs are quantized embeddings (|v|·scale ≲ 2³⁰ even
  * for extreme embedding magnitudes at scale=10⁶), so each term < 2⁶⁰ and a
  * 64-dim sum stays far below Long.Max; raw Java long arithmetic (no ANSI
  * overflow checks) is safe here and matches DuckDB's HUGEINT-then-cast. */
case class FixedSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  // null for length-mismatched inputs, as CosineSimilarity
  override def nullable: Boolean = true

  override def prettyName: String = "fixed_sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $acc = 0L;
          for (int $i = 0; $i < $n; $i++) {
            long $d = $a.getLong($i) - $b.getLong($i);
            $acc += $d * $d;
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FixedSqDist = copy(newLeft, newRight)
}

/** Element-wise difference of two fixed-point vectors (`array<long>`) —
  * the residual step of IVF-PQ (point − assigned coarse centroid),
  * generated as one primitive loop instead of an interpreted `zip_with`
  * lambda (the measured ~10× HOF penalty; see file scaladoc). Integer
  * subtraction is exactly engine-portable, so residual codebooks and ADC
  * scores stay oracle-hashable. Length-mismatched inputs yield null, as
  * the sibling expressions. */
case class FixedVecSub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "fixed_vec_sub"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = x.getLong(i) - y.getLong(i)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long[] $out = new long[$n];
          for (int $i = 0; $i < $n; $i++) {
            $out[$i] = $a.getLong($i) - $b.getLong($i);
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FixedVecSub = copy(newLeft, newRight)
}

object VectorExpressions {
  /** Register `cosine_similarity(a, b)` for SQL/expr use on a session.
    * Idempotent; call once per session before building plans that use
    * [[graft.functions.VectorFunctions.cosineFast]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => {
        // same arity contract as the GraftExtensions registration path:
        // a clear analysis-time message, not an IndexOutOfBoundsException
        require(exprs.length == 2,
          s"cosine_similarity expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }, "scala_udf")
}
