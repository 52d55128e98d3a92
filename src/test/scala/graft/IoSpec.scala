package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types._

import graft.io.{Sinks, Sources}

/** File source/sink coverage (S1, S5/S6, K4): schema-on-read CSV, JSON
  * lines, parquet — round trips preserving values. */
class IoSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  private lazy val df = Seq((1L, "alpha", 10.5), (2L, "beta,comma", -3.25),
    (3L, null.asInstanceOf[String], 0.0)).toDF("id", "name", "amount")

  test("CSV sink → schema'd CSV source round-trips values incl. quoting and nulls") {
    val dir = Files.createTempDirectory("csv_rt").toString + "/out"
    Sinks.csv(df, dir)
    val back = Sources.csv(spark, dir, schema).orderBy($"id")
      .as[(Long, Option[String], Double)].collect()
    assert(back.toSeq == Seq((1L, Some("alpha"), 10.5),
      (2L, Some("beta,comma"), -3.25), (3L, None, 0.0)))
  }

  test("JSON-lines source reads Kafka-message-shaped fixtures with explicit schema") {
    val dir = Files.createTempDirectory("json_rt").toString + "/out"
    df.write.mode(SaveMode.Overwrite).json(dir)
    val back = Sources.jsonLines(spark, dir, schema).orderBy($"id")
      .as[(Long, Option[String], Double)].collect()
    assert(back.length == 3 && back(1)._2.contains("beta,comma"))
  }

  test("parquet sink/source round-trip preserves schema exactly") {
    val dir = Files.createTempDirectory("pq_rt").toString + "/out"
    Sinks.parquet(df, dir)
    val back = Sources.parquet(spark, dir)
    // parquet reads are always nullable; compare names + types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == 3)
  }
}
