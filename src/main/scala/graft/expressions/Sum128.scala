package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate

import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact Σ of a LONG column with a signed 128-bit accumulator held in TWO
  * mutable LONG buffer slots — the aggregate that keeps exact wide sums
  * on HashAggregate's fast path.
  *
  * Why it exists: `sum(x.cast("decimal(38,0)"))` is exact and does stay
  * on HashAggregate, but every grouped update pays per-row wide-decimal
  * work — a Decimal/BigDecimal allocation for the cast, a 128-bit
  * checked add, and a 16-byte fixed-slot rewrite, per moment column
  * (measured 7× on the q146-vs-q154 OLS pair: the identical ten-moment
  * Gram aggregate ran 0.75 s ungrouped and 5.56 s with a 3-value group
  * key at sf0.1). This aggregate's buffer is plain primitive longs —
  * the update codegens like `sum(long)`, no objects — while never
  * overflowing: the buffer is the value in two's-complement base 2^64
  * ((hi, lo), lo unsigned), good to ±2^127 — at 10^14 per row that is
  * ~10^24 rows, far past 100 TB.
  *
  * Update is branch-free long arithmetic (codegen'd, no decimal object
  * churn): lo' = lo + x wrapping; the unsigned carry-out is recovered
  * bitwise as ((lo & x) | ((lo | x) & ~lo')) >>> 63; hi' = hi + carry +
  * (x >> 63) (the sign extension makes negative inputs subtract).
  * Merge is the same with the partner buffer. The final value converts
  * to DECIMAL(38,0) once per GROUP (not per row) via
  * [[UInt128ToDecimal]], so downstream `.cast("double")` rounds exactly
  * once from the exact integer — bit-identical to DuckDB's
  * sum(BIGINT)→HUGEINT→DOUBLE, which is what keeps the OLS/stats family
  * hash-oracled.
  *
  * Nulls count as zero (the callers feed non-null arithmetic; SQL sum's
  * all-null → null nicety is not worth a third buffer slot here). */
case class Sum128(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "sum128"
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = false

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L))

  /** Non-ANSI (wrapping) long add — the 128-bit carry arithmetic is
    * DELIBERATE two's-complement wraparound; under the ANSI default an
    * unqualified Add would throw ARITHMETIC_OVERFLOW exactly where the
    * carry logic needs the wrap. */
  private def addW(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** hi' and lo' for (hi, lo) += x, as bitwise long expressions. */
  private def add128(hiE: Expression, loE: Expression,
                     x: Expression): Seq[Expression] = {
    val newLo = addW(loE, x)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(loE, x),
        BitwiseAnd(BitwiseOr(loE, x), BitwiseNot(newLo))),
      Literal(63))
    val signExt = ShiftRight(x, Literal(63)) // 0 for x >= 0, -1 for x < 0
    Seq(addW(addW(hiE, carry), signExt), newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val x = If(IsNull(child), Literal(0L), child)
    val Seq(newHi, newLo) = add128(hi, lo, x)
    Seq(newHi, newLo)
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // merging two (hi, lo) pairs: lo parts add with carry into the hi
    // sum; hi.right needs no sign extension — it IS the high word
    val newLo = addW(lo.left, lo.right)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(lo.left, lo.right),
        BitwiseAnd(BitwiseOr(lo.left, lo.right), BitwiseNot(newLo))),
      Literal(63))
    Seq(addW(addW(hi.left, hi.right), carry), newLo)
  }

  override lazy val evaluateExpression: Expression = UInt128ToDecimal(hi, lo)

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}

/** (hi, lo) two's-complement 128-bit value → DECIMAL(38,0), exactly.
  * Runs once per aggregate OUTPUT row, so the BigInt math is off the hot
  * path; codegen emits a call to the static [[UInt128ToDecimal.convert]]
  * (a CodegenFallback would NPE here — the aggregate result projection
  * has no INPUT_ROW for the fallback's interpreted re-eval to bind). */
case class UInt128ToDecimal(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "uint128_to_decimal"
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = false

  override def nullSafeEval(hiV: Any, loV: Any): Any =
    UInt128ToDecimal.convert(hiV.asInstanceOf[Long], loV.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (h, l) =>
      s"graft.expressions.UInt128ToDecimal$$.MODULE$$.convert($h, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UInt128ToDecimal =
    copy(left = newLeft, right = newRight)
}

object UInt128ToDecimal {
  private val Two64 = BigInt(1) << 64

  /** Exact (hi, lo) → Decimal(38,0); called from generated code. */
  def convert(hi: Long, lo: Long): org.apache.spark.sql.types.Decimal = {
    val loU = BigInt(lo) & (Two64 - 1) // lo reinterpreted as unsigned
    val v = (BigInt(hi) << 64) + loU
    val d = org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(v))
    // |Σ| < 10^38 or fail LOUDLY — a 128-bit total that overflows
    // DECIMAL(38) (needs ≥ 10^23 rows at 10^14-magnitude addends) must
    // never round-trip as a silent null
    if (!d.changePrecision(38, 0))
      throw new ArithmeticException(s"sum128 total $v exceeds DECIMAL(38,0)")
    d
  }
}
