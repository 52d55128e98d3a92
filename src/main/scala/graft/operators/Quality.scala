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
    * distribution, with the policy flag at l < `policyL`. Entropy terms
    * quantize to nano-nats so the per-class fold is an exact long sum
    * (the engine's float-fold discipline); cells bounded by QID classes
    * × sensitive domain. Pinned in CurationOpsSpec: a uniform sensitive
    * distribution gives entropy_l == l_distinct exactly, a degenerate
    * one gives entropy_l == 1. */
  def lDiversity(df: DataFrame, qid: Seq[String], sensitive: String,
                 policyL: Int = 3): DataFrame = {
    val q = qid.map(col)
    val cls = df.groupBy((q :+ col(sensitive)): _*)
      .agg(count(lit(1)).as("c"))
    val per = cls.groupBy(q: _*)
      .agg(sum(col("c")).as("n"), count(lit(1)).as("l_distinct"))
    cls.join(per, qid)
      .select((q ++ Seq(col("n"), col("l_distinct"),
        (col("c") * expr("CAST(round(1e9 * ln(CAST(n AS DOUBLE) / c)) AS BIGINT)"))
          .as("term"))): _*)
      .groupBy((q ++ Seq(col("n"), col("l_distinct"))): _*)
      .agg(sum(col("term")).as("nano"))
      .select((q ++ Seq(col("n"), col("l_distinct"),
        round(exp(col("nano").cast("double") / 1e9 / col("n")), 6).as("entropy_l"),
        (col("l_distinct") < policyL).cast("int").as("at_risk"))): _*)
      .orderBy(q: _*)
  }
}
