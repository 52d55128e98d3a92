package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit operators — the "expectations" layer a production
  * ingest runs before publishing a batch (the shape popularized by
  * Great Expectations / Deequ, expressed as plain aggregates).
  *
  * Scale posture: every row-level check folds into ONE pass over the
  * table (a single hash-aggregate of conditional counters — adding a
  * check adds a column, not a scan); uniqueness and referential checks
  * are one hash aggregate / one broadcast-able anti-join each. Nothing
  * collects; the audit result is a one-row frame a pipeline can join,
  * alert on, or append to a metrics sink. */
object Quality {

  /** Row-level checks in one scan: each (name, predicate) yields a
    * column `name` counting the rows that VIOLATE the predicate (i.e.
    * where it is false or null — a null check result is a violation,
    * not a pass, matching SQL CHECK-constraint caution rather than its
    * permissiveness). Returns one row, plus `n_rows`. */
  def audit(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val counters = checks.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(name)
    }
    df.agg(count(lit(1)).as("n_rows"), counters: _*)
  }

  /** Key tuples that appear more than once: (keys..., n_dups) — empty
    * when the key is unique. One hash aggregate. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)

  /** Child rows whose foreign key has no match in `parent` (null FKs
    * excluded — nullable FKs are a modeling choice, not an integrity
    * violation; count them separately via [[audit]] if unwanted).
    * A broadcast-able anti-join when the parent is a dim. */
  def orphans(child: DataFrame, fk: String, parent: DataFrame,
              pk: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent, child(fk) === parent(pk), "left_anti")

  /** Entropy l-diversity (Machanavajjhala et al., ICDE 2006) per
    * quasi-identifier class over rows carrying QID columns and one
    * sensitive column: distinct-l plus exp(H) of the sensitive
    * distribution, with the policy flag at l < `policyL`. Class totals
    * ride a window PARTITION BY the QIDs rather than a groupBy+join —
    * window partitioning groups NULL QID values exactly like groupBy
    * does, where the earlier equi-join silently dropped NULL-valued
    * classes from the audit (under-reporting at-risk classes — a
    * privacy audit must see them). Entropy terms quantize to nano-nats
    * and accumulate in DECIMAL(38,0) — a single term c·round(1e9·ln(n/c))
    * reaches ~2e10 per unit of c, so a LONG product wraps once a cell
    * holds ~4e8 rows; cells bounded by QID classes × sensitive domain.
    * Pinned in CurationOpsSpec: a uniform sensitive distribution gives
    * entropy_l == l_distinct exactly, a degenerate one gives
    * entropy_l == 1, and a NULL-QID class is reported, not dropped. */
  def lDiversity(df: DataFrame, qid: Seq[String], sensitive: String,
                 policyL: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = qid.map(col)
    def d38(c: Column) = c.cast("decimal(38,0)")
    val wq = Window.partitionBy(q: _*)
    df.groupBy((q :+ col(sensitive)): _*)
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(wq))
      .withColumn("l_distinct", count(lit(1)).over(wq))
      .withColumn("term",
        d38(col("c")) *
          d38(expr("CAST(round(1e9 * ln(CAST(n AS DOUBLE) / c)) AS BIGINT)")))
      .groupBy((q ++ Seq(col("n"), col("l_distinct"))): _*)
      .agg(sum(col("term")).as("nano"))
      .select((q ++ Seq(col("n"), col("l_distinct"),
        round(exp(col("nano").cast("double") / 1e9 / col("n")), 6).as("entropy_l"),
        (col("l_distinct") < policyL).cast("int").as("at_risk"))): _*)
      .orderBy(q: _*)
  }
}
