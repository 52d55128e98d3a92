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

  test("gzip-compressed JSONL and CSV round-trip transparently") {
    // 100 TB text stores are compressed; Spark's codec handling must be
    // invisible to the schema'd source factories (splittability differs
    // — gz is one stream per file — but values must not)
    val jd = Files.createTempDirectory("gz_rt").toString
    df.write.mode(SaveMode.Overwrite).option("compression", "gzip")
      .json(s"$jd/j")
    df.write.mode(SaveMode.Overwrite).option("compression", "gzip")
      .option("header", "true").csv(s"$jd/c")
    assert(Option(new java.io.File(s"$jd/j").listFiles).get
      .exists(_.getName.endsWith(".gz")), "json output must actually be gz")
    val jBack = Sources.jsonLines(spark, s"$jd/j", schema).orderBy($"id")
      .as[(Long, Option[String], Double)].collect().toSeq
    val cBack = Sources.csv(spark, s"$jd/c", schema).orderBy($"id")
      .as[(Long, Option[String], Double)].collect().toSeq
    val want = Seq((1L, Some("alpha"), 10.5),
      (2L, Some("beta,comma"), -3.25), (3L, None, 0.0))
    assert(jBack == want, s"json-gz: $jBack")
    assert(cBack == want, s"csv-gz: $cBack")
  }

  test("fit-metrics JSON-lines sink round-trips params, metrics and importances") {
    import graft.ml.{FareConfig, FareMetrics, FarePipeline}
    val path = Files.createTempDirectory("metrics").toString + "/runs.jsonl"
    val cfg = FareConfig("fare_amount", "pickup_timeofday",
      Seq("trip_distance"), numTrees = 30, maxDepth = 10)
    FarePipeline.appendMetrics(path, cfg,
      FareMetrics(1.5, 1.0, 0.9, 2.5, 2.0, 0.8,
        Seq("trip_distance" -> 0.7, "pickup_timeofday_0" -> 0.3)))
    FarePipeline.appendMetrics(path, cfg.copy(modelKind = "gbt"),
      FareMetrics(1.1, 0.9, 0.95, Double.NaN, 2.1, 0.85, Nil))
    val back = spark.read.json(path).orderBy($"model")
    val rows = back.select($"model", $"num_trees", $"test_rmse", $"train_rmse")
      .as[(String, Long, Option[Double], Double)].collect()
    assert(rows.length == 2)
    assert(rows(0) == (("gbt", 30L, None, 1.1)), "NaN slots must read back as null")
    assert(rows(1) == (("rf", 30L, Some(2.5), 1.5)))
    val imps = back.filter($"model" === "rf").select($"importances").collect()(0)
      .getSeq[scala.collection.Seq[Any]](0)
    assert(imps.map(_.head) == Seq("trip_distance", "pickup_timeofday_0"),
      s"importance order must persist: $imps")
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

  test("promoteDir: failing build leaves no tmp; published target is never rebuilt") {
    import graft.io.Fs
    val dir = Files.createTempDirectory("promote").toString
    val path = s"$dir/layout"
    // a throwing build must clean its hidden tmp and publish nothing
    intercept[RuntimeException] {
      Fs.promoteDir(spark, path, "_SUCCESS") { tmp =>
        Fs.touch(spark, s"$tmp/partial")
        throw new RuntimeException("boom")
      }
    }
    assert(!Fs.exists(spark, path), "failed build must not publish")
    assert(new java.io.File(dir).listFiles.forall(
        f => !f.getName.startsWith(".layout.tmp")),
      "failed build leaked its hidden tmp dir")
    // successful publication
    Fs.promoteDir(spark, path, "_SUCCESS") { tmp =>
      Fs.writeText(spark, s"$tmp/v", "1")
      Fs.touch(spark, s"$tmp/_SUCCESS")
    }
    assert(Fs.readText(spark, s"$path/v") == "1")
    // the marker makes a re-promotion a no-op: the build must not even
    // run, and the published content must survive untouched
    Fs.promoteDir(spark, path, "_SUCCESS") { _ =>
      fail("build ran despite a published completeness marker")
    }
    assert(Fs.readText(spark, s"$path/v") == "1")
    // a TORN leftover (no marker) is cleared and rebuilt
    Fs.deleteRecursive(spark, s"$path/_SUCCESS")
    Fs.promoteDir(spark, path, "_SUCCESS") { tmp =>
      Fs.writeText(spark, s"$tmp/v", "2")
      Fs.touch(spark, s"$tmp/_SUCCESS")
    }
    assert(Fs.readText(spark, s"$path/v") == "2")
    // a build that forgets its own marker is MISWIRED and must refuse
    // at the source — publishing it would loop every future call
    // through a delete-and-rebuild of a permanently torn-looking dir
    val path2 = s"$dir/layout2"
    val e = intercept[java.io.IOException] {
      Fs.promoteDir(spark, path2, "_SUCCESS") { tmp =>
        Fs.writeText(spark, s"$tmp/v", "1") // no _SUCCESS touch
      }
    }
    assert(e.getMessage.contains("did not write its marker"), e.getMessage)
    assert(!Fs.exists(spark, path2), "miswired build must not publish")
  }
}
