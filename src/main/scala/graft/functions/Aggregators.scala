package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY.md §2.7: the reference has no UDAF —
  * these demonstrate the `Aggregator[IN, BUF, OUT]` surface). Buffers are
  * tiny tuples, so the aggregation is map-side combinable and shuffles
  * O(groups) bytes. */
object Aggregators {

  /** Exact 128-bit Σ of a LONG column as DECIMAL(38,0) — the grouped-
    * aggregate replacement for `sum(x.cast("decimal(38,0)"))`, which
    * falls off HashAggregate's mutable fast path (see
    * [[graft.expressions.Sum128]]). Codegen'd DeclarativeAggregate, two
    * long buffer slots, map-side combinable. */
  def sum128(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftglue.GraftGlue
    GraftGlue.column(graft.expressions.Sum128(GraftGlue.expression(c))
      .toAggregateExpression())
  }

  /** Exact RMSE over (label, prediction) pairs — the relational identity
    * behind RegressionEvaluator("rmse") (sparkML.py:105-112), usable
    * directly in a typed groupBy without an ML dependency. */
  object Rmse extends Aggregator[(Double, Double), (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: (Double, Double)): (Double, Long) = {
      val e = a._1 - a._2
      (b._1 + e * e, b._2 + 1)
    }
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double = math.sqrt(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bit-reproducible weighted mean over (cents, integer-weight) pairs:
    * both running sums are longs, so the aggregation is associative and
    * the result is identical under any partitioning — and recomputable by
    * the DuckDB oracle from the same integer arithmetic. Used through
    * `functions.udaf(...)` as an untyped column aggregate in the query
    * suite (§2.7 UDAF capability, exercised end-to-end). */
  object WeightedCentsMean extends Aggregator[(Long, Long), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    // zero total weight has no defined mean: surface NaN explicitly
    // (primitive Double output cannot be null) rather than relying on
    // incidental 0/0 behavior — callers filtering/serializing should
    // treat NaN as "no data", like SQL's avg-of-empty null
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0L) Double.NaN else r._1.toDouble / r._2.toDouble / 100.0
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Collect up to `cap`+1 LONG ids per group with hard-bounded state: a
    * group that exceeds the cap stops accumulating and resolves to empty.
    * Built for LSH stop-bucket removal
    * ([[graft.operators.Dedup.lshCandidates]]): a pathological
    * million-doc bucket costs cap+1 slots of aggregation state per map
    * partition (so O(partitions × cap) shuffle bytes for that bucket in
    * total — bounded by the cap, never by the bucket's true size), not a
    * million-element collect_list, and sizing+collection is one aggregate
    * pass. The buffer carries an explicit count so the per-row overflow
    * check is O(1); the count also makes overflow survive merges of two
    * already-capped partials. Input ids must be numeric (the udaf
    * signature is Long) and non-null — the caller filters nulls, since a
    * primitive-Long deserializer would read a null slot as a phantom 0. */
  final case class BoundedCollect(cap: Int)
      extends Aggregator[Long, (Int, List[Long]), Seq[Long]] {
    override def zero: (Int, List[Long]) = (0, Nil)
    override def reduce(b: (Int, List[Long]), a: Long): (Int, List[Long]) =
      if (b._1 > cap) (b._1, b._2) else (b._1 + 1, a :: b._2)
    override def merge(x: (Int, List[Long]), y: (Int, List[Long])): (Int, List[Long]) = {
      val total = x._1 + y._1 // counts saturate just past cap, never wrap
      if (total > cap + 1) (cap + 1, (x._2 ::: y._2).take(cap + 1))
      else (total, x._2 ::: y._2)
    }
    override def finish(r: (Int, List[Long])): Seq[Long] =
      if (r._1 > cap) Seq.empty else r._2
    override def bufferEncoder: Encoder[(Int, List[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, List[Long])]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Element-wise long-vector sum + count per group — the k-means
    * centroid update in ONE hash aggregate: per-group state is (d longs,
    * count), map-side combinable, so the shuffle carries k × (d+1) longs
    * total instead of the posexplode fan-out (rows × d elements through
    * two aggregates). Vectors must share one length per group (the
    * quantizer guarantees it); empty-vs-sized buffers merge by adopting
    * the sized side. Raw JVM long addition (no ANSI overflow check):
    * callers keep |value|·rows below 2⁶³, which fixed-point embeddings
    * do by orders of magnitude. */
  object VecSumCount
      extends Aggregator[Seq[Long], (Seq[Long], Long), (Seq[Long], Long)] {
    private def add(x: Seq[Long], y: Seq[Long]): Seq[Long] =
      if (x.isEmpty) y else if (y.isEmpty) x
      else {
        require(x.length == y.length,
          s"VecSumCount: length mismatch ${x.length} vs ${y.length}")
        val out = new Array[Long](x.length)
        var i = 0
        while (i < out.length) { out(i) = x(i) + y(i); i += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
      }
    override def zero: (Seq[Long], Long) = (Seq.empty, 0L)
    override def reduce(b: (Seq[Long], Long), a: Seq[Long]): (Seq[Long], Long) =
      (add(b._1, a), b._2 + 1)
    override def merge(x: (Seq[Long], Long), y: (Seq[Long], Long)): (Seq[Long], Long) =
      (add(x._1, y._1), x._2 + y._2)
    override def finish(r: (Seq[Long], Long)): (Seq[Long], Long) = r
    override def bufferEncoder: Encoder[(Seq[Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Long)]()
    override def outputEncoder: Encoder[(Seq[Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Long)]()
  }

  /** Bounded-state per-group top-k: keeps the k largest (value, id)
    * pairs, ordered (value desc, id asc). The buffer never exceeds k
    * entries, so a group with a billion rows shuffles k pairs — the
    * window-rank formulation (`row_number() <= k`) instead sorts EVERY
    * group's full row set before discarding all but k; with high-
    * cardinality groups the aggregator's partial-combine shape is the
    * one that survives scale. Total order (value desc, id asc) makes the
    * result deterministic and oracle-comparable under ties.
    *
    * Insertion cost is O(k) per row (linear insert into a sorted
    * ArraySeq) — the right trade for the small k (top-3/top-10) this
    * models; a heap only wins for large k. */
  final case class TopKPairs(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    require(k >= 1, s"k must be >= 1: $k")
    private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def ins(buf: Seq[(Long, Long)], v: (Long, Long)): Seq[(Long, Long)] = {
      // full buffer and v ranks below the current floor: O(1) reject —
      // the common case once a group has seen > k rows
      if (buf.length == k && !lt(v, buf.last)) buf
      else {
        val i = buf.indexWhere(lt(v, _)) match { case -1 => buf.length; case x => x }
        (buf.take(i) :+ v) ++ buf.drop(i).take(k - i - 1)
      }
    }
    override def zero: Seq[(Long, Long)] = Seq.empty
    override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      ins(b, a)
    override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
      y.foldLeft(x)(ins)
    override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Exact weighted mean — the second §2.7 capability example. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Double)): Double = r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
