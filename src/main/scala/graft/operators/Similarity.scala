package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding column (`array<float>`).
  *
  * Scale ladder (BASELINE.json north-star):
  *  1. brute-force cosine top-k — the exactness baseline; O(|Q|·|C|) with
  *     the small query set broadcast, so it's a single narrow pass over
  *     the candidate table (no shuffle of the candidates);
  *  2. IVF-style partition pruning on a coarse assignment column — the
  *     join key restricts each query to one cell (here the precomputed
  *     `label`; in production the assignment comes from a k-means fit);
  *  3. sign-LSH bucketing — hyperplane-sign sketch as the equi-join key,
  *     pruning pairs by ~2^bits before the exact re-rank.
  *
  * All pair loops score with the codegen'd fused
  * [[graft.expressions.CosineSimilarity]] — one generated loop per pair,
  * no interpreted lambda evaluation, no per-vector norm precompute state
  * to shuffle around.
  */
object Similarity {

  private def prep(df: DataFrame, id: String, vec: String,
                   idAs: String, vecAs: String): DataFrame =
    df.select(col(id).as(idAs), toDoubleVec(col(vec)).as(vecAs))

  /** Shared broadcast-join + rank-window top-k core: candidates join the
    * (small, broadcast) query set under `pairPred`, score with the fused
    * cosine, rank per query with a deterministic tie-break. At extreme
    * candidate counts, swap the window for a per-partition top-k +
    * merge. */
  private def rankedTopK(q: DataFrame, c: DataFrame, k: Int,
                         pairPred: Column): DataFrame = {
    val scored = c.join(broadcast(q), pairPred && col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosineFast(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"))
  }

  /** Brute-force cosine top-k: every query against every candidate.
    * Queries are broadcast (top-k only makes sense for a small query
    * set); ranking is a window over query_id. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, id: String,
                     vec: String, k: Int): DataFrame =
    rankedTopK(
      prep(queries, id, vec, "query_id", "qv"),
      prep(candidates, id, vec, "cand_id", "cv"),
      k, lit(true))

  /** k-NN majority-vote classification: label each query vector by the
    * modal label of its cosine top-k neighbors (deterministic tie-break
    * toward the smaller label). Composes [[bruteForceTopK]] with a label
    * join + vote aggregate + rank-1 window — at scale, swap the
    * brute-force stage for [[ivfTopK]]/[[lshNearDupPairs]] candidates;
    * the vote tail is identical. */
  def knnClassify(queries: DataFrame, candidates: DataFrame, id: String,
                  vec: String, label: String, k: Int): DataFrame = {
    val votes = bruteForceTopK(queries, candidates, id, vec, k)
      .join(candidates.select(col(id).as("cand_id"), col(label).as("cand_label")),
        "cand_id")
      .groupBy(col("query_id"), col("cand_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("cand_label").asc)
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("query_id"), col("cand_label").as("pred_label"), col("votes"))
  }

  /** IVF-style pruned top-k: the same core with a cell-equality predicate
    * on the join, so each query scans only its coarse cell (a |C|/cells
    * fraction of the data). */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, id: String,
              vec: String, cell: String, k: Int): DataFrame =
    rankedTopK(
      queries.select(col(id).as("query_id"), col(cell).as("qcell"),
        toDoubleVec(col(vec)).as("qv")),
      candidates.select(col(id).as("cand_id"), col(cell).as("ccell"),
        toDoubleVec(col(vec)).as("cv")),
      k, col("qcell") === col("ccell"))

  /** Sign-LSH near-dup pairs: bucket by hyperplane signs (equi-join key),
    * verify with exact cosine. The shuffle is on the (table, bucket) id —
    * pair count drops from n²/2 to Σ_b |b|²/2 per table.
    *
    * `tables` > 1 turns on OR-amplification: each table hashes a
    * different dimension slice, a pair is a candidate if ANY table
    * buckets it together — recall 1-(1-p^bits)^tables at candidate cost
    * ×tables. Single-table recall at moderate similarity is poor by
    * construction ((1-θ/π)^bits); multi-table is the production setting. */
  def lshNearDupPairs(df: DataFrame, id: String, vec: String, bits: Int,
                      threshold: Double, tables: Int = 1): DataFrame = {
    val buckets = array((0 until tables).map(t =>
      signBucket(col("vec_d"), bits, t * bits)): _*)
    val v = df.select(col(id), toDoubleVec(col(vec)).as("vec_d"))
      .select(col(id), col("vec_d"),
        posexplode(buckets).as(Seq("table_idx", "bucket")))
    val a = v.select(col("table_idx"), col("bucket"), col(id).as("id_a"), col("vec_d").as("va"))
    val b = v.select(col("table_idx"), col("bucket"), col(id).as("id_b"), col("vec_d").as("vb"))
    a.join(b, Seq("table_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosineFast(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact cosine near-dup pairs over a bounded id range — the O(n²)
    * baseline the LSH path is checked against. */
  def bruteForceNearDupPairs(df: DataFrame, id: String, vec: String,
                             threshold: Double): DataFrame = {
    val a = prep(df, id, vec, "id_a", "va")
    val b = prep(df, id, vec, "id_b", "vb")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosineFast(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
