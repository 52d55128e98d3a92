package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form statistics over exact integer moments — the one-pass,
  * shuffle-free estimators a warehouse runs where an ML library would
  * iterate: multi-feature OLS via the normal equations, Welch's t,
  * Wilson score bounds.
  *
  * House discipline: every sufficient statistic (n, Σx, Σxy, Σx², …) is
  * a SUM of per-row LONG products accumulated in DECIMAL(38,0) — exact
  * under any partitioning, so the statistic is bit-reproducible on a
  * 1000-executor cluster and re-derivable by an external engine. Floats
  * appear only in the final closed-form solve, whose operands are those
  * exact moments: identical IEEE expression trees on identical inputs
  * give identical doubles (the engine-wide float-parity rule).
  *
  * Scale posture: one scan → one map-side-combined aggregate producing
  * O(k²) numbers; the solve is O(k³) on k ≤ a few dozen coefficients.
  * Nothing here shuffles data rows.
  */
object Stats {

  /** Per-row product accumulated exactly: both factors must be integral
    * (caller quantizes, e.g. cents). The LONG product (callers keep
    * |a·b| < 2^63 per row) is summed in DECIMAL(38,0), so the TOTAL
    * never overflows at any row count shy of 10^38. */
  private def psum(a: Column, b: Column): Column =
    sum((a * b).cast("decimal(38,0)")).cast("double")

  final case class OlsModel(coefs: Array[Double], r2: Double, n: Long)

  /** Multi-feature ordinary least squares with intercept, via the
    * normal equations (X'X)β = X'y. `features` and `label` must be
    * integral-valued columns (quantize first; see [[psum]]).
    *
    * One distributed pass builds the (k+1)² Gram matrix as exact
    * moments; the k³ solve happens on the driver over those ~k² doubles
    * (driver state is O(k²) numbers, never rows — the same legitimacy
    * class as a broadcast join's build-side statistics). Gaussian
    * elimination with partial pivoting; singular designs throw. */
  def olsFit(df: DataFrame, features: Seq[Column], label: Column): OlsModel = {
    val k = features.size
    require(k >= 1, "need at least one feature")
    val xs = lit(1L) +: features // design matrix columns, intercept first
    // Upper-triangle Gram moments + cross moments + Σy², one aggregate.
    val aggs =
      (for { i <- 0 to k; j <- i to k } yield psum(xs(i), xs(j)).as(s"g_${i}_$j")) ++
        (0 to k).map(i => psum(xs(i), label).as(s"b_$i")) :+
        psum(label, label).as("yy")
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    def g(i: Int, j: Int): Double =
      r.getAs[Double](if (i <= j) s"g_${i}_$j" else s"g_${j}_$i")
    val a = Array.tabulate(k + 1, k + 2) { (i, j) =>
      if (j <= k) g(i, j) else r.getAs[Double](s"b_$i")
    }
    // In-place Gaussian elimination with partial pivoting on [A | b].
    for (col <- 0 to k) {
      val piv = (col to k).maxBy(i => math.abs(a(i)(col)))
      require(math.abs(a(piv)(col)) > 0, s"singular design (pivot $col)")
      val t = a(col); a(col) = a(piv); a(piv) = t
      for (row <- 0 to k if row != col) {
        val f = a(row)(col) / a(col)(col)
        for (j <- col to k + 1) a(row)(j) -= f * a(col)(j)
      }
    }
    val beta = Array.tabulate(k + 1)(i => a(i)(k + 1) / a(i)(i))
    val n = g(0, 0)
    val sy = r.getAs[Double]("b_0")
    val sse = r.getAs[Double]("yy") -
      (0 to k).map(i => beta(i) * r.getAs[Double](s"b_$i")).sum
    val sst = r.getAs[Double]("yy") - sy * sy / n
    OlsModel(beta, 1.0 - sse / sst, n.toLong)
  }

  /** Wilson score lower bound at confidence z on `succ` successes out
    * of `n` trials (Wilson JASA 1927) — the ranking statistic that
    * beats raw proportion for small-sample groups. Pure closed form
    * over two exact longs; replicate the identical tree in an external
    * oracle for bit parity. */
  def wilsonLower(succ: Column, n: Column, z: Double): Column = {
    val z2 = z * z // driver-side constant fold, same literal both engines
    val p = succ.cast("double") / n
    (p + lit(z2) / (lit(2.0) * n) -
      lit(z) * sqrt((p * (lit(1.0) - p) + lit(z2) / (lit(4.0) * n)) / n)) /
      (lit(1.0) + lit(z2) / n)
  }
}
