package graft

import org.apache.spark.sql.functions.{array_intersect, size, udaf}

import graft.functions.Aggregators
import graft.functions.VectorFunctions
import graft.expressions.VectorExpressions

class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed Rmse aggregator matches the closed form") {
    val ds = Seq((1.0, 2.0), (3.0, 3.0), (5.0, 1.0)).toDS()
    val got = ds.select(Aggregators.Rmse.toColumn).collect()(0)
    val want = math.sqrt((1.0 + 0.0 + 16.0) / 3)
    assert(math.abs(got - want) < 1e-12)
  }

  test("Rmse works as an untyped udaf in a grouped aggregation") {
    val rmse = udaf(Aggregators.Rmse)
    val df = Seq(("a", 1.0, 2.0), ("a", 3.0, 3.0), ("b", 0.0, 4.0))
      .toDF("g", "y", "yhat")
    val out = df.groupBy($"g").agg(rmse($"y", $"yhat").as("rmse"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(out("a") - math.sqrt(0.5)) < 1e-12)
    assert(out("b") == 4.0)
  }

  test("weighted mean aggregator") {
    val ds = Seq((10.0, 1.0), (20.0, 3.0)).toDS()
    val got = ds.select(Aggregators.WeightedMean.toColumn).collect()(0)
    assert(math.abs(got - 17.5) < 1e-12)
  }

  test("BoundedCollect caps state and empties overflowed groups") {
    import org.apache.spark.sql.functions.{col, size, udaf}
    val bounded = udaf(graft.functions.Aggregators.BoundedCollect(5))
    val df = spark.range(50)
      .select((col("id") % 10).as("g"), col("id")) // 5 ids per group = cap
      // group 0 gets 90 extra rows -> overflows the cap of 5
      .union(spark.range(90).select(org.apache.spark.sql.functions.lit(0L).as("g"), col("id")))
    val out = df.repartition(8) // force multi-partition merge path
      .groupBy("g").agg(bounded(col("id")).as("ids"))
      .select(col("g"), size(col("ids")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(0L) == 0, "overflowed bucket resolves to empty")
    (1L to 9L).foreach(g => assert(out(g) == 5, s"group $g keeps all 5 ids"))
  }

  test("cosine_similarity registers as a SQL function") {
    VectorExpressions.register(spark)
    val got = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .as[Double].collect()(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("RewriteSizeOfArrayIntersect fires and preserves size(array_intersect) semantics") {
    // the rule is injected via spark.sql.extensions (SparkSpec), so a
    // plain size(array_intersect(..)) plans as intersect_count
    val rows = Seq(
      (Seq("a", "b", "b", "c"), Seq("b", "c", "c", "d")), // dups both sides -> 2
      (Seq("a", "a"), Seq("a")),                          // dup left -> 1
      (Seq.empty[String], Seq("a")),                      // empty -> 0
      (Seq("x"), Seq.empty[String]),                      // empty -> 0
      (Seq("a", null, "b"), Seq(null, "b", "c")),         // null elem in both counts -> 2
      (Seq("a", null), Seq("b", "c")))                    // null elem one side only -> 0
    val df = rows.toDF("a", "b")
    val out = df.select(size(array_intersect($"a", $"b")).as("n"))
    // plan-shape pin on a SCAN-backed frame (a literal frame constant-
    // folds to a LocalRelation before the shape can be observed)
    val scanned = Tables(spark, sf("sf0.001"), "documents")
      .select(size(array_intersect(
        org.apache.spark.sql.functions.split($"text", " "),
        org.apache.spark.sql.functions.split($"source", " "))).as("n"))
    assert(scanned.queryExecution.optimizedPlan.toString.contains("intersect_count"),
      s"rule must rewrite the composed form:\n${scanned.queryExecution.optimizedPlan}")
    // expected counts computed independently (distinct set intersection,
    // null counting only when present on both sides)
    val expected = rows.map { case (a, b) =>
      (a.toSet intersect b.toSet).size }
    assert(out.as[Int].collect().toSeq == expected)
    // null INPUT arrays follow the session's size(null) mode exactly:
    // compare against a size() call the rule cannot touch
    val nulls = Seq((null: Seq[String], Seq("a")), (Seq("a"), null: Seq[String]))
      .toDF("a", "b")
    val gotNull = nulls.select(size(array_intersect($"a", $"b")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    // the session's size(NULL) answer (null under ANSI, -1 legacy)
    val modeNull = nulls.select(size(
        org.apache.spark.sql.functions.lit(null).cast("array<string>")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(gotNull == modeNull,
      s"null-input behavior must match the session's size(null) mode: $gotNull vs $modeNull")
    // BINARY elements: Array[Byte] has identity equals — the expression
    // must wrap to value-based keys, or equal binary payloads would
    // count as disjoint (the review-found regression class)
    val bin = Seq((Seq(Array[Byte](1, 2), Array[Byte](3)), Seq(Array[Byte](1, 2))))
      .toDF("a", "b")
    val binOut = bin.select(size(array_intersect($"a", $"b")).as("n"))
      .as[Int].collect().toSeq
    assert(binOut == Seq(1),
      s"binary arrays must intersect by VALUE: $binOut")
    // nested element types stay on the native path: a HashSet over
    // InternalRow/ArrayData equality is representation-dependent, so the
    // rule must NOT fire there
    val nested = Tables(spark, sf("sf0.001"), "embeddings")
      .select(org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.struct($"label")).as("a"))
      .select(size(array_intersect($"a", $"a")).as("n"))
    assert(!nested.queryExecution.optimizedPlan.toString.contains("intersect_count"),
      "struct-element arrays must not be rewritten")
  }

  test("rewritten double/float intersect matches the native path on NaN and signed zero") {
    // Native set-op float semantics (SQLOpenHashSet): NaN equals NaN
    // (SPARK-36741) but -0.0 does NOT equal 0.0 (bit-level hashing) —
    // boxed java.lang.Double.equals matches BOTH, which is why the
    // expression needs no float wrapper; this test pins that equivalence
    // so a Spark upgrade normalizing -0.0 inside ArrayIntersect fails
    // loudly instead of silently diverging. The native comparison path is
    // size(array_sort(array_intersect)): the interposed sort defeats the
    // Size(ArrayIntersect) match but keeps the intersection itself on
    // native ArrayIntersect (array_size is no escape — RuntimeReplaceable
    // into the same Size form).
    val rows = Seq(
      (Seq(Double.NaN, 1.0), Seq(Double.NaN)),            // NaN matches NaN -> 1
      (Seq(-0.0, 2.0), Seq(0.0)),                          // -0.0 != 0.0 -> 0
      (Seq(0.0), Seq(-0.0)),                               // symmetric -> 0
      (Seq(-0.0, 0.0, Double.NaN), Seq(Double.NaN, 0.0)),  // {0.0, NaN} -> 2
      (Seq(1.0, 2.0), Seq(3.0)))                           // -> 0
    // repartition blocks ConvertToLocalRelation, which would otherwise
    // eagerly fold the literal frame before the plan shape is observable
    val df = rows.toDF("a", "b").repartition(2)
    val rewritten = df.select(size(array_intersect($"a", $"b")).as("n"))
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("intersect_count"),
      "double arrays must take the rewritten path")
    val native = df.select(org.apache.spark.sql.functions.expr("size(array_sort(array_intersect(a, b)))").as("n"))
    assert(!native.queryExecution.optimizedPlan.toString.contains("intersect_count"),
      "array_size form must stay native")
    // sorted: collect order after a round-robin repartition is not a
    // contract between two separate collects
    val got = rewritten.as[Int].collect().toSeq.sorted
    assert(got == native.as[Int].collect().toSeq.sorted,
      "rewritten path must match native ArrayIntersect on NaN/-0.0")
    assert(got == Seq(0, 0, 0, 1, 2), "and both must match native float set semantics")
    // float arrays ride the same whitelist entry
    val frows = Seq((Seq(Float.NaN, -0.0f), Seq(0.0f, Float.NaN))).toDF("a", "b")
      .repartition(2)
    val fGot = frows.select(size(array_intersect($"a", $"b")).as("n")).as[Int].collect().toSeq
    val fNative = frows.select(org.apache.spark.sql.functions.expr("size(array_sort(array_intersect(a, b)))").as("n"))
      .as[Int].collect().toSeq
    assert(fGot == fNative && fGot == Seq(1), s"float NaN/-0.0: $fGot vs native $fNative")
  }

  test("cosineFast equals the HOF cosine bit-for-bit on real embeddings") {
    val e = Tables(spark, sf("sf0.001"), "embeddings").limit(50)
    val a = e.select($"vec_id".as("ia"), VectorFunctions.toDoubleVec($"embedding").as("va"))
    val b = e.select($"vec_id".as("ib"), VectorFunctions.toDoubleVec($"embedding").as("vb"))
    val pairs = a.join(b, $"ia" < $"ib")
    val diff = pairs.select(
        (VectorFunctions.cosineFast($"va", $"vb") -
         VectorFunctions.cosine($"va", $"vb")).as("d"))
      .filter($"d" =!= 0.0).count()
    assert(diff == 0, "fused codegen loop must accumulate in the same order as the HOF fold")
  }
}
