package graft

import org.apache.spark.sql.functions._

import graft.operators.{Incremental, Layout, Sketches}

/** Properties of the round-5 sketch/layout/incremental operators that the
  * DuckDB hash-compare can't express: Bloom's no-false-negative guarantee,
  * KMV's error bound, count-min's one-sided error, the fold identity
  * under DIFFERENT batch splits, and the Morton interleave's bit
  * geometry. (Bit-for-bit construction agreement with an independent
  * engine is covered by q97–q101's oracle entries.) */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem = Tables(spark, sf("sf0.001"), "lineitem")

  // ------------------------------------------------------------- Bloom

  test("bloom filter never drops a true match and prunes most non-matches") {
    val dim = Tables(spark, sf("sf0.001"), "supplier")
      .filter($"s_nationkey" === 7).select($"s_suppkey")
    val bloom = Sketches.bloomBuild(dim, $"s_suppkey", mBits = 4096, kHashes = 4,
      salt = "spec")
    val fact = lineitem.select($"l_suppkey")
    val kept = Sketches.bloomFilter(fact, bloom, $"l_suppkey", 4096, 4, "spec")

    // no false negatives: every row whose key IS in dim must survive
    val trueMatches = fact.join(dim, fact("l_suppkey") === dim("s_suppkey"), "left_semi")
    val dropped = trueMatches.exceptAll(kept.select($"l_suppkey"))
    assert(dropped.isEmpty, "bloom filter dropped a true match (false negative)")

    // the filter must actually prune: a 4-hash/4096-bit filter over a
    // handful of keys passes (far) fewer rows than the full fact side
    val total = fact.count()
    val survivors = kept.count()
    val matches = trueMatches.count()
    assert(survivors >= matches, "survivors can never undercut true matches")
    assert(survivors < total / 2,
      s"bloom pruned almost nothing: $survivors of $total survive ($matches true)")
  }

  test("bloom membership is decided by the packed words, not a join") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val bloom = Sketches.bloomBuild(dim, $"k", mBits = 512, kHashes = 3, salt = "t")
    val words = bloom.collect()(0).getSeq[Long](0)
    assert(words.length == (512 + 62) / 63, s"word count: ${words.length}")
    assert(words.exists(_ != 0L), "some bits must be set")
    assert(words.forall(_ >= 0L), "63-bit packing must never touch the sign bit")
  }

  // --------------------------------------------------------------- KMV

  test("KMV distinct estimate lands within the ~1/sqrt(k) band") {
    val k = 256
    val est = Sketches.kmvDistinct(lineitem, $"l_partkey", k, salt = "spec")
      .collect()(0)
    val exact = lineitem.select($"l_partkey").distinct().count()
    val rel = math.abs(est.getDouble(2) - exact) / exact.toDouble
    // 3 standard errors of the KMV estimator (1/sqrt(k-2) per the paper)
    assert(rel < 3.0 / math.sqrt(k - 2),
      s"KMV estimate ${est.getDouble(2)} too far from exact $exact (rel $rel)")
  }

  test("KMV sketches merge losslessly: sketch(A ∪ B) == merge(sketch(A), sketch(B))") {
    val k = 64
    val a = lineitem.filter($"l_orderkey" % 2 === 0)
    val b = lineitem.filter($"l_orderkey" % 3 === 0) // overlaps a on 6k keys
    val whole = Sketches.kmvSketch(
      a.unionByName(b), $"l_partkey", k, salt = "m")
    val merged = Sketches.kmvMerge(k,
      Sketches.kmvSketch(a, $"l_partkey", k, salt = "m"),
      Sketches.kmvSketch(b, $"l_partkey", k, salt = "m"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty,
      "merged shard sketches must equal the sketch of the combined input exactly")
  }

  test("KMV set ops are exact below k and banded above") {
    // under k: every hash of A ∪ B fits in the merged sketch, so the
    // estimates must equal the true set algebra exactly
    val a = (1 to 50).toDF("v")
    val b = (26 to 75).toDF("v")
    val r = Sketches.kmvSetOps(a, $"v", b, $"v", k = 256, salt = "so").head()
    assert(r.getAs[Long]("n_m") == 75)
    assert(r.getAs[Double]("est_union") == 75.0)
    assert(r.getAs[Long]("n_both") == 25)
    assert(r.getAs[Double]("est_inter") == 25.0)
    // over k: planted 1/3 Jaccard recovered within the sampling band
    val k = 256
    val bigA = (1 to 6000).toDF("v")
    val bigB = (3001 to 9000).toDF("v")
    val e = Sketches.kmvSetOps(bigA, $"v", bigB, $"v", k, salt = "so2").head()
    val relU = math.abs(e.getAs[Double]("est_union") - 9000) / 9000.0
    assert(relU < 3.0 / math.sqrt(k - 2), s"union off: $e")
    assert(math.abs(e.getAs[Double]("jaccard") - 1.0 / 3) < 0.1, s"jaccard off: $e")
  }

  test("KMV is exact below k distinct values") {
    val small = Seq(1, 2, 3, 4, 5).toDF("v")
    val r = Sketches.kmvDistinct(small, $"v", k = 256, salt = "t").collect()(0)
    assert(r.getLong(0) == 5L && r.getDouble(2) == 5.0,
      s"under-k input must count exactly: $r")
  }

  test("grouped KMV matches the global sketch run per group, exact under k") {
    val k = 32
    val grouped = Sketches.kmvSketchGrouped(lineitem, Seq("l_returnflag"),
      $"l_partkey", k, salt = "g").orderBy($"l_returnflag", $"h")
      .as[(String, String)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap
    for (flag <- Seq("A", "N", "R")) {
      val solo = Sketches.kmvSketch(lineitem.filter($"l_returnflag" === flag),
        $"l_partkey", k, salt = "g").as[String].collect().toSeq
      assert(grouped(flag) == solo,
        s"group $flag sketch must equal a standalone sketch of that group")
    }
    // groups below k report exact counts
    val tiny = Seq(("x", 1), ("x", 2), ("y", 9)).toDF("g", "v")
    val est = Sketches.kmvEstimateGrouped(
        Sketches.kmvSketchGrouped(tiny, Seq("g"), $"v", k = 16, salt = "t"),
        Seq("g"), k = 16)
      .select($"g", $"est_distinct").as[(String, Double)].collect().toMap
    assert(est == Map("x" -> 2.0, "y" -> 1.0), s"under-k groups exact: $est")
  }

  // --------------------------------------------------------- count-min

  test("count-min never undercounts, and is exact for most keys when w >> keys") {
    val table = Sketches.countMinTable(lineitem, $"l_suppkey", d = 4, w = 512,
      salt = "spec")
    val truth = lineitem.groupBy($"l_suppkey").agg(count(lit(1)).as("true_n"))
    // true_n carries through the estimate — no join-back needed
    val joined = Sketches.countMinEstimate(truth, table,
        $"l_suppkey", d = 4, w = 512, salt = "spec")
      .select($"true_n", $"est_n").collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getLong(1) >= r.getLong(0)),
      "count-min must never undercount")
    val exactFrac = joined.count(r => r.getLong(1) == r.getLong(0)).toDouble / joined.length
    assert(exactFrac > 0.8,
      s"with w=512 over ~10 keys, most estimates should be exact; got $exactFrac")
  }

  test("count-min estimates 0 for keys never seen") {
    val table = Sketches.countMinTable(Seq("a", "b").toDF("v"), $"v", 4, 512, "t")
    // a key whose 4 cells are all empty must estimate 0 (left join + coalesce)
    val est = Sketches.countMinEstimate(Seq("zzz-not-present").toDF("v"), table,
      $"v", 4, 512, "t").collect()(0)
    assert(est.getLong(1) == 0L, s"absent key should estimate 0: $est")
  }

  // ------------------------------------------------------- incremental

  test("aggregate state fold is split-invariant (2-way == 3-way == one-shot)") {
    val orders = Tables(spark, sf("sf0.001"), "orders")
    val keys = Seq("o_orderpriority")
    def state(df: org.apache.spark.sql.DataFrame) =
      Incremental.aggState(df, keys, $"o_totalprice")

    val oneShot = Incremental.finalizeState(state(orders))
    val two = Incremental.finalizeState(Incremental.mergeStates(keys,
      state(orders.filter($"o_orderkey" % 2 === 0)),
      state(orders.filter($"o_orderkey" % 2 === 1))))
    val three = Incremental.finalizeState(Incremental.mergeStates(keys,
      state(orders.filter($"o_orderkey" % 3 === 0)),
      state(orders.filter($"o_orderkey" % 3 === 1)),
      state(orders.filter($"o_orderkey" % 3 === 2))))

    assert(two.exceptAll(oneShot).isEmpty && oneShot.exceptAll(two).isEmpty,
      "2-way fold must equal the one-shot aggregate exactly")
    assert(three.exceptAll(oneShot).isEmpty && oneShot.exceptAll(three).isEmpty,
      "3-way fold must equal the one-shot aggregate exactly")
  }

  test("scd2 collapses unchanged runs and stitches valid_to to the next change") {
    // key A: a,a,b,b,a -> three versions; the unchanged repeats vanish
    val df = Seq(
      ("A", 1L, 1L, Option("a")), ("A", 2L, 2L, Option("a")),
      ("A", 3L, 3L, Option("b")), ("A", 4L, 4L, Option("b")),
      ("A", 5L, 5L, Option("a")),
      ("B", 1L, 6L, Option("z"))
    ).toDF("k", "ord", "tie", "attr")
    val got = Incremental.scd2(df, "k", "ord", "tie", "attr")
      .select($"k", $"attr", $"version", $"valid_from", $"valid_to",
        $"is_current")
      .as[(String, Option[String], Int, Long, Option[Long], Int)]
      .collect().toSeq.sortBy(r => (r._1, r._3))
    val want = Seq(
      ("A", Option("a"), 1, 1L, Option(3L), 0),
      ("A", Option("b"), 2, 3L, Option(5L), 0),
      ("A", Option("a"), 3, 5L, Option.empty[Long], 1),
      ("B", Option("z"), 1, 1L, Option.empty[Long], 1))
    assert(got == want, s"SCD2 history diverged:\n$got")
  }

  test("scd2 attribute compare is null-safe: x -> NULL -> x is two real changes") {
    // with =!= instead of <=> both NULL edges would be misread and the
    // history would collapse to a single version
    val df = Seq(
      ("A", 1L, 1L, Option("x")), ("A", 2L, 2L, Option.empty[String]),
      ("A", 3L, 3L, Option.empty[String]), ("A", 4L, 4L, Option("x"))
    ).toDF("k", "ord", "tie", "attr")
    val got = Incremental.scd2(df, "k", "ord", "tie", "attr")
      .select($"attr", $"version", $"valid_from", $"valid_to")
      .as[(Option[String], Int, Long, Option[Long])]
      .collect().toSeq.sortBy(_._2)
    val want = Seq(
      (Option("x"), 1, 1L, Option(2L)),
      (Option.empty[String], 2, 2L, Option(4L)),
      (Option("x"), 3, 4L, Option.empty[Long]))
    assert(got == want, s"null-safe SCD2 history diverged:\n$got")
  }

  // ----------------------------------------------------------- Z-order

  test("Morton interleave places x bits at even, y bits at odd positions") {
    val rows = Seq((1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue($"x", $"y", bits = 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // x=1,y=0 -> bit0 ; x=0,y=1 -> bit1 ; x=3 -> bits 0,2 ; y=3 -> bits 1,3
    // x=3(011),y=5(101): x bits {0,1}->pos{0,2}, y bits {0,2}->pos{1,5}
    //   = 1+4+2+32 = 39
    assert(rows == Seq((1L, 0L, 1L), (0L, 1L, 2L), (3L, 0L, 5L), (0L, 3L, 10L),
      (3L, 5L, 39L), (255L, 255L, 65535L)), s"interleave mismatch: $rows")
  }

  test("Hilbert index is a bijection and consecutive cells are adjacent") {
    // the defining curve property Z-order lacks: over the FULL 16x16
    // grid, d is a permutation of 0..255 and |Δx|+|Δy| = 1 between every
    // consecutive pair — no diagonal jumps anywhere
    val grid = spark.range(16).select($"id".as("x"))
      .crossJoin(spark.range(16).select($"id".as("y")))
    val cells = Layout.withHilbert(grid, $"x", $"y", bits = 4, out = "d")
      .collect().map(r => (r.getAs[Long]("d"), r.getAs[Long]("x"), r.getAs[Long]("y")))
      .sortBy(_._1)
    assert(cells.map(_._1).toSeq == (0L until 256L), "d is not a bijection")
    cells.sliding(2).foreach { case Array((_, x1, y1), (d2, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump before d=$d2: ($x1,$y1) -> ($x2,$y2)")
    }
    // first cell is the origin (standard orientation)
    assert(cells.head == ((0L, 0L, 0L)))
  }

  test("q234 prefix sketch: each estimate brackets the exact quantile within its bucket") {
    // The oracle proves merge closure (it one-shots the year's buckets);
    // THIS pins the accuracy contract the bucket design promises: the
    // reported lower bound lb satisfies lb ≤ exact rank-r value < lb +
    // 10^(digits−2) — the two-significant-digit bucket width, ≤ 10%
    // relative. Exact quantiles come from a literal sort of the
    // collected column, ranks from the same integer ceilings.
    import spark.implicits._
    val cents = Tables(spark, sf("sf0.001"), "lineitem")
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
      .filter($"v" >= 10).as[Long].collect().sorted
    val n = cents.length.toLong
    val row = graft.queries.Registry.queries("q234_prefix_quantile_mv")(
      spark, sf("sf0.001")).head()
    assert(row.getAs[Long]("n") == n)
    val checks = Seq(
      ("p50_lb", (n + 1) / 2),
      ("p90_lb", (9 * n + 9) / 10),
      ("p99_lb", (99 * n + 99) / 100))
    checks.foreach { case (cname, r) =>
      val lb = row.getAs[Long](cname)
      val exact = cents((r - 1).toInt)
      val step = math.pow(10.0, lb.toString.length - 2).toLong
      assert(lb <= exact && exact < lb + step,
        s"$cname: exact rank-$r value $exact outside bucket [$lb, ${lb + step})")
      // the 10% promise is structural: step = 10^(d−2) ≤ lb/10 because
      // the 2-digit prefix makes lb ≥ 10·10^(d−2)
      assert(step * 10 <= lb,
        s"$cname: bucket wider than the promised 10%: lb=$lb step=$step")
    }
  }
}
