package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan + wall-time profiler for a named suite query:
  * `sbt "runMain graft.tools.Profile <query> [sfDir] [--explain]"`.
  * Prints the formatted physical plan (pushed filters, join strategies,
  * codegen spans) and three timed materializations (noop write). */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
                else "/root/testdata/sf0.1"
    val explain = args.contains("--explain")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName(s"profile-$name")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (explain) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      // build INSIDE the timer: iterative queries (k-means, connected
      // components) run eager localCheckpoint jobs during construction,
      // which Bench times too — timing only the final write would
      // under-report them
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
