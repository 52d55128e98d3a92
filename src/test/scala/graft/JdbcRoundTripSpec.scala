package graft

import java.nio.file.Files

import graft.io.{Sinks, Sources}

/** S3/S4/K2/K3 against a REAL JDBC engine: Derby embedded (in the Spark
  * distribution, zero-egress) stands in for the reference's Postgres
  * (`sparkConsumer.py:59-63,147-154`, `sparkML.py:40-46`). This drives
  * the actual `Sinks.jdbcAppend` / `Sources.jdbc` code paths — dialect
  * DDL generation, append-vs-create probing, and the partitioned read
  * that splits the scan across executors — not a parquet analog.
  */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  // Derby writes a derby.log wherever it boots; point it off the repo.
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  private lazy val url = {
    val dir = Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private lazy val rows = Seq(
    (1L, "alpha", 10.5), (2L, "beta", -3.25), (3L, "gamma", 0.0),
    (4L, "delta", 7.75), (5L, "epsilon", 99.0), (6L, "zeta", -1.5),
    (7L, "eta", 3.25), (8L, "theta", 42.0))

  test("K2/K3 — jdbcAppend creates the table via dialect DDL, then appends") {
    val df = rows.toDF("id", "name", "amount")
    // first write: table absent → Spark's JDBC dialect emits CREATE TABLE
    // (the reference's 30-line information_schema probe + hand-rolled
    // type mapping, sparkConsumer.py:111-141, collapses into this)
    Sinks.jdbcAppend(df, url, "trips", "app", "app")
    val once = Sources.jdbc(spark, url, "trips", "app", "app")
    assert(once.count() == 8)
    // DDL-if-absent contract: a second append must NOT recreate or fail —
    // the table exists, so rows accumulate
    Sinks.jdbcAppend(df.filter($"id" <= 2), url, "trips", "app", "app")
    val twice = Sources.jdbc(spark, url, "trips", "app", "app")
    assert(twice.count() == 10)
    assert(twice.filter($"id" === 1).count() == 2)
  }

  test("S4 — partitionColumn splits the JDBC read into parallel range queries") {
    val df = rows.toDF("id", "name", "amount")
    Sinks.jdbcAppend(df, url, "trips_part", "app", "app")
    val part = Sources.jdbc(spark, url, "trips_part", "app", "app",
      partitionColumn = Some("id"), lowerBound = 1L, upperBound = 9L,
      numPartitions = 4)
    // the scan itself must fan out: one JDBC range query per partition
    assert(part.rdd.getNumPartitions == 4,
      s"expected 4 range partitions, got ${part.rdd.getNumPartitions}")
    // stride boundaries must neither drop nor duplicate rows
    val back = part.select($"id", $"name", $"amount")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(back.toSeq == rows.sortBy(_._1), s"got ${back.toSeq}")
    // rows actually arrive through MULTIPLE partitions, not one stream
    val perPart = part.groupBy(org.apache.spark.sql.functions
      .spark_partition_id()).count().count()
    assert(perPart > 1, s"rows should span >1 read partition, got $perPart")
  }

  test("S3 — schema round-trip: types survive the dialect DDL + read-back") {
    val df = rows.take(2).toDF("id", "name", "amount")
    Sinks.jdbcAppend(df, url, "trips_schema", "app", "app")
    val back = Sources.jdbc(spark, url, "trips_schema", "app", "app")
    val types = back.schema.fields.map(f => f.name.toLowerCase -> f.dataType.typeName).toMap
    assert(types("id") == "long", s"id must read back integral: $types")
    assert(types("amount") == "double", s"amount must read back double: $types")
    assert(types("name").startsWith("string"), s"name must read back string: $types")
  }
}
