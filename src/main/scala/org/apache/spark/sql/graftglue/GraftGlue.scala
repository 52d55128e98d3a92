package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Column ⇄ catalyst-Expression bridge. Spark 4 made these converters
  * private[sql] (the Column API is transport-agnostic now); a child
  * package of org.apache.spark.sql is the sanctioned escape hatch for
  * libraries that ship custom Catalyst expressions. */
object GraftGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Frees the block-manager storage behind a `localCheckpoint()`ed
    * Dataset. `Dataset.unpersist` only consults the cache manager,
    * which never registered the checkpoint's RDD — the blocks of a
    * superseded checkpoint otherwise linger until the ContextCleaner
    * GCs the RDD (round-17 advice: a best-of-N loop pinned ~N× one
    * leg's corpus). Safe ONLY once the frame's consumers are done:
    * localCheckpoint truncated the lineage, so the data is
    * unrecoverable after this call. */
  def unpersistLocalCheckpoint(df: Dataset[_]): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.foreach {
        case l: LogicalRDD => l.rdd.unpersist(blocking = false)
        case _             => ()
      }
}
