package graft

/** Smoke-level regression net over the whole registered suite: every
  * query plans and executes at sf0.001, oracle keys line up, and the
  * flagship entry returns rows (the driver's t1 check). The value-level
  * gate is the DuckDB compare (tools/check_oracle.py / driver t2). */
class QuerySuiteSpec extends SparkSpec {

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query is oracled — the suite has NO rows-only entries") {
    // held since round 7 (q95 was the last holdout, closed by the SQL
    // XXH64 re-derivation); a new query without an oracle must be a
    // deliberate, spec-documented exception — not a silent regression
    val unoracled = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf("sf0.001")).count(); None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("suite covers the SURVEY §2 operator families") {
    val names = SparkEntry.queries.keySet
    // one representative per family; renaming a query must keep coverage
    val families = Map(
      "agg" -> "q01_pricing_summary", "topk" -> "q02_topk_parts",
      "join" -> "q03_join_brand_revenue", "filter" -> "q05_filter_null_semantics",
      "iqr" -> "q07_iqr_filter", "hist" -> "q08_histogram",
      "quantile" -> "q09_summary_stats", "window" -> "q10_argmax_per_segment",
      "setop" -> "q17_set_ops", "lag" -> "q18_event_gaps",
      "json" -> "q26_json_extract", "stream-window" -> "q27_tumbling_window",
      "session" -> "q29_session_window",
      "tokens" -> "q30_text_tokens", "quality" -> "q31_text_quality",
      "langid" -> "q32_text_langid", "fingerprint" -> "q33_text_fingerprint",
      "dedup-exact" -> "q40_dedup_exact", "dedup-jaccard" -> "q41_dedup_ngram_jaccard",
      "dedup-minhash" -> "q42_dedup_minhash_lsh", "dedup-simhash" -> "q43_dedup_simhash",
      "multimodal" -> "q44_multimodal_meta", "neardup" -> "q45_embed_neardup",
      "ann" -> "q46_ann_bruteforce", "ivf" -> "q47_ann_ivf", "lsh" -> "q48_ann_lsh_bucket",
      "pivot" -> "q56_pivot", "unpivot" -> "q57_unpivot",
      "window-family" -> "q58_window_family",
      "grouped-quantile" -> "q59_grouped_quantiles",
      "udaf" -> "q60_udaf_weighted_mean", "corr" -> "q61_corr_regression",
      "regex" -> "q62_regex_extract", "vocab" -> "q63_vocab_topk",
      "ngram-lm" -> "q64_bigram_topk", "centroid" -> "q65_embed_centroids",
      "curation" -> "q66_quality_filter", "contamination" -> "q67_contamination",
      "keepers" -> "q68_dedup_keepers",
      "range-frame" -> "q69_rolling_range_window",
      "sql-interface" -> "q70_sql_interface", "tfidf" -> "q71_tfidf")
    val missing = families.filterNot { case (_, q) => names.contains(q) }
    assert(missing.isEmpty, s"missing families: ${missing.keys}")
  }
}
