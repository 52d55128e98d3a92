package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** DuckDB mirror of [[bm25TopK]] for oracle SQL: same tokenizer
    * (`string_split(lower(text), ' ')`), same idf/score expressions,
    * same round-then-order. `termsSqlList` example: `'spark','join'`. */
  def bm25OracleSql(table: String, id: String, text: String,
                    termsSqlList: String, topK: Int,
                    k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH t AS (SELECT $id, unnest(string_split(lower($text), ' ')) AS w
          FROM $table),
        dl AS (SELECT $id, count(*) AS dl FROM t GROUP BY $id),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        qt AS (SELECT * FROM t WHERE w IN ($termsSqlList)),
        tf AS (SELECT $id, w, count(*) AS tf FROM qt GROUP BY $id, w),
        df AS (SELECT w, count(*) AS df FROM
          (SELECT DISTINCT $id, w FROM qt) GROUP BY w)
        SELECT tf.$id AS $id,
          round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
            * (tf * ($k1 + 1))
            / (tf + $k1 * (${1 - b} + $b * dl / avgdl))), 6) AS score
        FROM tf JOIN df USING (w) JOIN dl ON tf.$id = dl.$id CROSS JOIN stats
        GROUP BY tf.$id
        ORDER BY score DESC, $id LIMIT $topK"""
}
