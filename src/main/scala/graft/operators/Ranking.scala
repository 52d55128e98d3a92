package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval ranking: Okapi BM25 over a document corpus — the
  * standard first-stage retriever for training-data curation (finding
  * benchmark-contaminated or query-relevant documents in a corpus) and
  * the lexical half of hybrid search next to the embedding ANN operators
  * in [[Similarity]].
  *
  * Scale shape: the score is a pure composition of three hash aggregates
  * —  per-(doc, term) tf, per-term document frequency, per-doc length —
  * joined long-form. The df and avgdl statistics are corpus-wide but
  * tiny (df only for the query's terms; avgdl one row), so they travel
  * by broadcast; the only input-proportional shuffle is the tf
  * aggregate, and that is pre-filtered to rows whose token is IN the
  * query (an `isin` against a literal list, pushed into the scan
  * projection), so at 100 TB the heavy token stream is cut to the
  * query's vocabulary before anything shuffles.
  *
  * Formula (Robertson et al., TREC-3; the `+1` idf variant Lucene ships
  * so idf stays positive for df > N/2):
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   s(d, q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·|d|/avgdl))
  *
  * Reference scope: the reference pipeline has no retrieval surface —
  * this is part of the LLM-data-pipeline extension mandated by the
  * brief (text analysis / curation family, next to q71's TF-IDF).
  */
object Ranking {

  /** Tokenizer shared with [[graft.functions.TextFunctions.words]] —
    * whitespace split of the lowercased text (the corpus is already
    * space-normalized; see q71's oracle mirror `string_split`). */
  private def toks(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), explode(split(lower(col(text)), " ")).as("w"))

  /** BM25 scores of every document containing at least one query term,
    * top `topK` by (rounded score desc, id asc). Output: (id, score).
    *
    * Scores are rounded to 6 decimals BEFORE the ordering so the
    * (score, id) sort ranks identically across engines: distinct raw
    * scores differ by far more than cross-engine ln()/division ulp
    * noise (q71 precedent), and exact ties break on the id. */
  def bm25TopK(docs: DataFrame, id: String, text: String,
               queryTerms: Seq[String], topK: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val t = toks(docs, id, text)
    // per-doc length BEFORE the query filter — BM25 normalizes by full
    // document length, not by query-term hits
    val dl = t.groupBy(col(id)).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val qt = t.filter(col("w").isin(queryTerms.map(_.toLowerCase): _*))
    val tf = qt.groupBy(col(id), col("w")).agg(count(lit(1)).as("tf"))
    val df = qt.select(col(id), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    tf.join(broadcast(df), "w")
      .join(dl, id)
      .crossJoin(broadcast(stats))
      .withColumn("__part",
        idf * (col("tf") * (lit(k1) + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(id))
      .agg(round(sum(col("__part")), 6).as("score"))
      .orderBy(col("score").desc, col(id))
      .limit(topK)
  }

  /** DuckDB mirror of [[bm25TopK]] as a CTE body (composable into
    * larger oracle statements, e.g. the retrieval-eval query): same
    * tokenizer (`string_split(lower(text), ' ')`), same idf/score
    * expressions, same round-then-order. Exposes `bm25($id, score)`.
    * `termsSqlList` example: `'spark','join'`. */
  def bm25OracleCtes(table: String, id: String, text: String,
                     termsSqlList: String, topK: Int,
                     k1: Double = 1.2, b: Double = 0.75): String =
    s"""bm_t AS (SELECT $id, unnest(string_split(lower($text), ' ')) AS w
          FROM $table),
        bm_dl AS (SELECT $id, count(*) AS dl FROM bm_t GROUP BY $id),
        bm_stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM bm_dl),
        bm_qt AS (SELECT * FROM bm_t WHERE w IN ($termsSqlList)),
        bm_tf AS (SELECT $id, w, count(*) AS tf FROM bm_qt GROUP BY $id, w),
        bm_df AS (SELECT w, count(*) AS df FROM
          (SELECT DISTINCT $id, w FROM bm_qt) GROUP BY w),
        bm25 AS (SELECT tf.$id AS $id,
          round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
            * (tf * ($k1 + 1))
            / (tf + $k1 * (${1 - b} + $b * dl / avgdl))), 6) AS score
        FROM bm_tf tf JOIN bm_df USING (w) JOIN bm_dl dl ON tf.$id = dl.$id
        CROSS JOIN bm_stats
        GROUP BY tf.$id
        ORDER BY score DESC, $id LIMIT $topK)"""

  /** Standalone-statement form of [[bm25OracleCtes]]. */
  def bm25OracleSql(table: String, id: String, text: String,
                    termsSqlList: String, topK: Int,
                    k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH ${bm25OracleCtes(table, id, text, termsSqlList, topK, k1, b)}
        SELECT $id, score FROM bm25 ORDER BY score DESC, $id"""

  /** Offline retrieval evaluation of [[bm25TopK]] against graded
    * relevance — the IR quality loop (Järvelin & Kekäläinen TOIS 2002
    * for NDCG) a curation pipeline runs before trusting a retriever for
    * contamination sweeps: NDCG@k (graded, gain 2^rel−1 via an exact
    * CASE map — grades must be 0..3), MRR, and precision@k.
    *
    * `relGrade` is an expression over `docs` deriving the judgment
    * (deterministic qrels). Scale shape: the ranked list is k rows, the
    * qrel set one filtered projection of the corpus; the ideal DCG
    * comes from a 3-counter grade histogram exploded onto a k-row rank
    * spine — no sort of the corpus, nothing driver-side. Returns one
    * row: (n_rel, dcg_k, idcg_k, ndcg_k, mrr, p_at_k), unrounded. */
  def retrievalEval(docs: DataFrame, id: String, text: String,
                    queryTerms: Seq[String], relGrade: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def disc(rk: Column): Column =
      log((rk + lit(1)).cast("double")) / log(lit(2.0))
    val gain = when(col("rel") === 1, lit(1.0))
      .when(col("rel") === 2, lit(3.0))
      .when(col("rel") === 3, lit(7.0)).otherwise(lit(0.0))
    val ranked = bm25TopK(docs, id, text, queryTerms, k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col(id))))
    val qr = docs.select(col(id), relGrade.as("rel")).filter(col("rel") > 0)
    val m = ranked.join(qr, Seq(id), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
      .agg(sum(gain / disc(col("rk"))).as("dcg"),
        min(when(col("rel") > 0, col("rk"))).as("firstrel"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits"))
    val gh = qr.agg(
      sum(when(col("rel") === 3, 1L).otherwise(0L)).as("c3"),
      sum(when(col("rel") === 2, 1L).otherwise(0L)).as("c2"),
      sum(when(col("rel") === 1, 1L).otherwise(0L)).as("c1"),
      count(lit(1)).as("n_rel"))
    val idealGain = when(col("rk") <= col("c3"), lit(7.0))
      .when(col("rk") <= col("c3") + col("c2"), lit(3.0))
      .when(col("rk") <= col("c3") + col("c2") + col("c1"), lit(1.0))
      .otherwise(lit(0.0))
    val idcg = gh
      .select(col("n_rel"), col("c3"), col("c2"), col("c1"),
        explode(sequence(lit(1), lit(k))).as("rk"))
      .groupBy(col("n_rel"))
      .agg(sum(idealGain / disc(col("rk"))).as("idcg"))
    m.crossJoin(broadcast(idcg))
      .select(col("n_rel"), col("dcg").as("dcg_k"), col("idcg").as("idcg_k"),
        (col("dcg") / col("idcg")).as("ndcg_k"),
        coalesce(lit(1.0) / col("firstrel"), lit(0.0)).as("mrr"),
        (col("hits").cast("double") / lit(k.toDouble)).as("p_at_k"))
  }
}
