package graft

/** Scale-path evidence: bucketing co-locates a fact-fact join so the
  * join runs with NO shuffle exchange — the design the engine relies on
  * for repeated orderkey joins at 100 TB (SURVEY.md §4 "Pipelining vs
  * shuffle"). */
class BucketingSpec extends SparkSpec {

  test("bucketed lineitem⋈orders plans without a shuffle exchange") {
    val li = Tables(spark, sf("sf0.001"), "lineitem")
    val o = Tables(spark, sf("sf0.001"), "orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n${plan.take(2000)}")
      assert(joined.count() == li.count(), "1:1 orderkey lookup keeps all lineitems")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
