package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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
