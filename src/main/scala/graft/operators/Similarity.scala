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

  // ------------------------------------------------------------------
  // k-means coarse quantizer (the IVF "train" step)
  // ------------------------------------------------------------------

  /** Fixed-point quantized points: (pid, pf: array<long>). */
  private def fixedPts(df: DataFrame, id: String, vec: String,
                       scale: Double): DataFrame =
    df.select(col(id).as("pid"), toFixedVec(col(vec), scale).as("pf"))

  /** Nearest-centroid assignment: argmin over cells of the integer squared
    * distance, tie-broken toward the smaller cell id. Centroids (k rows)
    * broadcast; the only shuffle is the per-point argmin aggregate. */
  private def assignCells(pts: DataFrame, cents: DataFrame): DataFrame =
    pts.crossJoin(broadcast(cents))
      .withColumn("dist", sqDistFixed(col("pf"), col("cf")))
      .groupBy(col("pid"))
      .agg(min(struct(col("dist"), col("cell"))).getField("cell").as("cell"),
        // pf is functionally dependent on pid, so first() is deterministic
        first(col("pf")).as("pf"))

  /** Relational k-means (Lloyd) over a fixed-point quantization of the
    * embedding space — the coarse quantizer that IVF indexes train
    * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011; same coarse-cell role as FAISS IndexIVF's k-means).
    *
    * Everything is deterministic and engine-portable:
    *  - init: the k points with the smallest `md5(id)` digests, cell ids
    *    assigned in digest order — a seedless hash-sample, reproducible
    *    on any engine with md5;
    *  - distances: integer Σ(aᵢ-bᵢ)² on round(v·scale) fixed-point vectors
    *    (codegen'd [[graft.expressions.FixedSqDist]]) — no float summation
    *    order to diverge;
    *  - update: centroid component = round(Σpf/n) back to the fixed-point
    *    grid — an exact integer sum and one double division, identical on
    *    both engines; empty cells keep their previous centroid.
    *
    * Each Lloyd iteration is one broadcast join + two hash aggregates
    * (argmin by point, mean by cell,pos); the k×d centroid table is
    * `localCheckpoint`ed per round to truncate lineage, so plan depth
    * stays O(1) as iterations grow. At 100 TB the per-iteration cost is a
    * single narrow pass over the points — the textbook scalable k-means
    * shape (MLlib's KMeans does the same passes, with driver-side
    * centroid state; here the state stays relational for oracle parity).
    *
    * Returns the centroid table (cell: int, cf: array<long>). */
  def kmeansCentroids(df: DataFrame, id: String, vec: String, k: Int,
                      iters: Int, scale: Double = 1e6): DataFrame =
    kmeansCore(df, id, vec, k, iters, scale)._2

  private def kmeansCore(df: DataFrame, id: String, vec: String, k: Int,
                         iters: Int, scale: Double): (DataFrame, DataFrame) = {
    require(k > 0 && iters >= 0, s"need k>0, iters>=0; got k=$k iters=$iters")
    // one upfront shuffle on pid, materialized once: every iteration's
    // per-point argmin aggregate then reuses the partitioning (no
    // per-round exchange of the points) — the same align-the-exchange
    // trick the MinHash signature path uses. The materialized block is
    // the quantized vectors only (d longs/row), the k-means working set
    // MLlib caches too.
    val pts = fixedPts(df, id, vec, scale)
      .repartition(col("pid")).localCheckpoint()
    val seedW = Window.orderBy(col("h"))
    var cents = pts
      .withColumn("h", md5(col("pid").cast("string")))
      .orderBy(col("h")).limit(k)
      // window over k rows only (post-limit) — bounded by construction
      .withColumn("cell", row_number().over(seedW).cast("int"))
      .select(col("cell"), col("pf").as("cf"))
      .coalesce(1).localCheckpoint()
    val vsum = udaf(graft.functions.Aggregators.VecSumCount)
    for (_ <- 1 to iters) {
      // centroid update in one aggregate: per-cell element-wise sums +
      // count (k × (d+1) longs of shuffle state), then one narrow pass
      // divides and re-quantizes — arithmetic identical to the per-pos
      // sum/count formulation the DuckDB oracle mirrors
      val upd = assignCells(pts, cents)
        .groupBy(col("cell"))
        .agg(vsum(col("pf")).as("sc"))
        .select(col("cell"),
          transform(col("sc._1"),
            v => round(v.cast("double") / col("sc._2")).cast("long")).as("cf"))
      cents = cents.as("o").join(upd.as("u"), Seq("cell"), "left_outer")
        .select(col("cell"), coalesce(col("u.cf"), col("o.cf")).as("cf"))
        .coalesce(1).localCheckpoint()
    }
    (pts, cents)
  }

  /** Fit + assign: k-means cells for every row of `df` — the learned
    * replacement for a precomputed IVF cell column. Output (id, cell). */
  def kmeansAssign(df: DataFrame, id: String, vec: String, k: Int,
                   iters: Int, scale: Double = 1e6): DataFrame = {
    val (pts, cents) = kmeansCore(df, id, vec, k, iters, scale)
    assignCells(pts, cents)
      .select(col("pid").as(id), col("cell"))
  }

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
