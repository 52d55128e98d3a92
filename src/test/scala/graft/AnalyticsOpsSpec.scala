package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, TimeSeries}

/** Round-6 analytics operators: triangle census and interval union. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("triangleStats: K4 has 6 edges, 12 wedges, 4 triangles, transitivity 1") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("id_a", "id_b")
    val r = Graph.triangleStats(k4, "id_a", "id_b").head
    assert(r.getLong(0) == 4 && r.getLong(1) == 6)
    assert(r.getLong(2) == 12 && r.getLong(3) == 4)
    assert(r.getDouble(4) == 1.0)
  }

  test("triangleStats: a path has wedges but zero triangles, null-free") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val r = Graph.triangleStats(path, "id_a", "id_b").head
    assert(r.getLong(2) == 3 && r.getLong(3) == 0)
    assert(r.getDouble(4) == 0.0)
  }

  test("triangleStats: dedups reversed/duplicate edges and drops self-loops") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
      .toDF("id_a", "id_b")
    val r = Graph.triangleStats(messy, "id_a", "id_b").head
    assert(r.getLong(1) == 3 && r.getLong(3) == 1)
  }

  test("triangleStats: skewed star+clique counts exactly (orientation bound)") {
    // hub 0 linked to 1..20 (star: no triangles) plus the 3-clique
    // {1,2,3} which closes 3 hub triangles and 1 clique triangle
    val star = (1L to 20L).map(i => (0L, i))
    val clique = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val r = Graph.triangleStats((star ++ clique).toDF("id_a", "id_b"),
      "id_a", "id_b").head
    assert(r.getLong(3) == 4, s"expected 4 triangles, got ${r.getLong(3)}")
  }

  test("mergeIntervals: overlap and touching merge, gaps split, counts kept") {
    val df = Seq(
      // key a: [0,10] + [5,20] overlap; [20,25] touches; [30,35] apart
      ("a", 0L, 10L, 1L), ("a", 5L, 20L, 2L), ("a", 20L, 25L, 3L),
      ("a", 30L, 35L, 4L),
      // key b: containment — [0,100] swallows [10,20]
      ("b", 0L, 100L, 5L), ("b", 10L, 20L, 6L)
    ).toDF("k", "s", "e", "id")
    val m = TimeSeries.mergeIntervals(df, "k", col("s"), col("e"), col("id"))
      .orderBy("k", "interval_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.toSeq == Seq(("a", 0L, 25L, 3L), ("a", 30L, 35L, 1L),
      ("b", 0L, 100L, 2L)))
  }

  test("mergeIntervals: duplicate (start,end) rows need the tie column, merge fine") {
    val df = Seq(("k", 0L, 5L, 1L), ("k", 0L, 5L, 2L), ("k", 3L, 9L, 3L))
      .toDF("k", "s", "e", "id")
    val m = TimeSeries.mergeIntervals(df, "k", col("s"), col("e"), col("id"))
      .collect()
    assert(m.length == 1 && m.head.getLong(2) == 9L && m.head.getLong(3) == 3L)
  }

  test("skyline2D: dominance, same-x ties, and equal-point twins") {
    val df = Seq(
      (1L, 10L, 5L),  // frontier (cheapest)
      (2L, 12L, 9L),  // frontier (bigger, pricier)
      (3L, 12L, 7L),  // dominated by 2 (same x, smaller y)
      (4L, 15L, 9L),  // dominated by 2 (same y, larger x — strict x)
      (5L, 20L, 9L),  // dominated by 2
      (6L, 20L, 12L), // frontier
      (7L, 12L, 9L)   // equal twin of 2 — kept (no strict coordinate)
    ).toDF("id", "price", "size")
    val got = graft.operators.Relational
      .skyline2D(df, col("price"), col("size"))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 6L, 7L))
  }

  test("skyline2D matches the naive anti-join on a 500-point cloud, any nBuckets") {
    val pts = (1 to 500).map { i =>
      val x = (i * 7919) % 997; val y = (i * 104729) % 991
      (i.toLong, x.toLong, y.toLong)
    }
    val df = pts.toDF("id", "x", "y")
    val naive = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.map(_._1).sorted
    for (b <- Seq(1, 7, 256)) {
      val got = graft.operators.Relational
        .skyline2D(df, col("x"), col("y"), nBuckets = b)
        .select("id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == naive, s"nBuckets=$b")
    }
  }

  test("bfsLevels: path graph distances, unreachable nodes absent, fixed rounds") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val source = Seq(Tuple1(1L)).toDF("node")
    val got = graft.operators.Graph.bfsLevels(edges, "src", "dst", source, 6)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("bfsLevels: rounds cap truncates the frontier, earlier levels intact") {
    val chain = (1L to 9L).map(i => (i, i + 1))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val source = Seq(Tuple1(1L)).toDF("node")
    val got = graft.operators.Graph.bfsLevels(chain, "src", "dst", source, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("intervalOverlap: overlap/touch/disjoint semantics, one row per pair") {
    val a = Seq((1L, 0L, 100L), (2L, 200L, 300L)).toDF("aid", "as", "ae")
    val b = Seq(
      (10L, 50L, 60L),   // inside a1
      (11L, 100L, 150L), // touches a1 end
      (12L, 101L, 150L), // disjoint from a1, before a2
      (13L, 0L, 1000L)   // spans BOTH a-intervals and many bins
    ).toDF("bid", "bs", "be")
    val got = graft.operators.RangeJoin.intervalOverlap(
        a, col("as"), col("ae"), b, col("bs"), col("be"), binWidth = 10L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    // b13 overlaps both a-intervals but appears exactly once per pair
    assert(got.toSeq == Seq((1L, 10L), (1L, 11L), (1L, 13L), (2L, 13L)))
  }

  test("intervalOverlap matches the naive inequality join on random intervals") {
    val mk = (n: Int, seed: Int) => (1 to n).map { i =>
      val s = ((i * seed) % 500).toLong; (i.toLong, s, s + ((i * 31) % 80).toLong)
    }
    val as = mk(60, 7919); val bs = mk(60, 104729)
    val naive = (for {
      (ai, s1, e1) <- as; (bi, s2, e2) <- bs
      if s1 <= e2 && s2 <= e1
    } yield (ai, bi)).sorted
    for (w <- Seq(7L, 64L, 1000L)) {
      val got = graft.operators.RangeJoin.intervalOverlap(
          as.toDF("aid", "as", "ae"), col("as"), col("ae"),
          bs.toDF("bid", "bs", "be"), col("bs"), col("be"), binWidth = w)
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == naive, s"binWidth=$w")
    }
  }

  test("absorptionFixed: known chain converges to the exact hand-computed value") {
    import graft.operators.Graph
    // START -> A (1/2) | NULL (1/2);  A -> CONV (3/4) | NULL (1/4)
    // p(START) = 1/2 * 3/4 = 0.375, reached after exactly 2 rounds
    val nano = 1000000000L
    val trans = Seq(
      ("base", "START", "A", nano / 2), ("base", "START", "NULL", nano / 2),
      ("base", "A", "CONV", nano * 3 / 4), ("base", "A", "NULL", nano / 4)
    ).toDF("sc", "s", "t", "pr")
    val p = Graph.absorptionFixed(trans, iters = 3)
      .filter($"st" === "START").head().getAs[Long]("p")
    assert(p == 375000000L, s"expected exact 0.375 in nano-units, got $p")
  }

  test("absorptionFixedDriver is bit-equal to the distributed recurrence") {
    // a 2-scenario chain with enough structure to exercise floor-div
    // truncation and multi-source sums in every round
    val rows = Seq(
      ("base", "START", "a", 600000000L), ("base", "START", "b", 400000000L),
      ("base", "a", "b", 500000000L), ("base", "a", "CONV", 300000000L),
      ("base", "a", "NULL", 200000000L), ("base", "b", "a", 700000000L),
      ("base", "b", "NULL", 300000000L),
      ("cut", "START", "a", 600000000L), ("cut", "START", "NULL", 400000000L),
      ("cut", "a", "CONV", 300000000L), ("cut", "a", "NULL", 700000000L))
    val trans = rows.toDF("sc", "s", "t", "pr")
    for (iters <- Seq(1, 3, 7)) {
      val dist = Graph.absorptionFixed(trans, iters)
        .as[(String, String, Long)].collect().toSet
      val drv = Graph.absorptionFixedDriver(rows, iters).toSet
      assert(drv == dist, s"iters=$iters: driver=$drv distributed=$dist")
    }
  }

  test("absorptionFixed: extra rounds never change an already-absorbed chain") {
    import graft.operators.Graph
    val nano = 1000000000L
    val trans = Seq(("base", "START", "CONV", nano)).toDF("sc", "s", "t", "pr")
    val p5 = Graph.absorptionFixed(trans, 5)
      .filter($"st" === "START").head().getAs[Long]("p")
    val p1 = Graph.absorptionFixed(trans, 1)
      .filter($"st" === "START").head().getAs[Long]("p")
    assert(p1 == nano && p5 == nano)
  }

  test("kCoreFixed peels pendants, keeps the clique, and 6 rounds is the q164 fixpoint") {
    import graft.operators.Graph
    // triangle a-b-c (2-core) with pendant chain c-d-e: peeling k=2
    // removes e then d; the triangle survives with degree 2 each
    val tri = Seq(("a","b"),("b","c"),("a","c"),("c","d"),("d","e"))
    val sym = (tri ++ tri.map(_.swap)).toDF("src", "dst")
    val core = Graph.kCoreFixed(sym, "src", "dst", k = 2, rounds = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core == Map("a" -> 2L, "b" -> 2L, "c" -> 2L), s"$core")
    // the q164 configuration: one more round changes nothing (fixpoint)
    val q = graft.queries.Registry.queries("q164_kcore")(spark, sf("sf0.001"))
      .collect().map(_.toString).toSeq
    val cust = Tables(spark, sf("sf0.001"), "customer")
      .filter($"c_nationkey".isin(7, 8)).select($"c_custkey")
    val o = Tables(spark, sf("sf0.001"), "orders")
      .select($"o_orderkey", $"o_custkey")
      .join(cust, col("o_custkey") === cust("c_custkey"))
    val cs = Tables(spark, sf("sf0.001"), "lineitem")
      .select($"l_orderkey", $"l_suppkey")
      .join(o, $"l_orderkey" === o("o_orderkey"))
      .select(concat(lit("c"), $"o_custkey").as("src"),
        concat(lit("s"), $"l_suppkey").as("dst"))
    val both = cs.union(cs.select($"dst".as("src"), $"src".as("dst")))
    val more = Graph.kCoreFixed(both, "src", "dst", k = 8, rounds = 7)
      .orderBy($"deg".desc, $"node").limit(50)
      .collect().map(_.toString).toSeq
    assert(q == more, "6 peel rounds must already be the fixpoint at this SF")
  }

  test("labelPropagationFixed finds the two planted communities") {
    import graft.operators.Graph
    // two 4-cliques bridged by a single edge d-e: LPA should settle on
    // one label per clique (the smallest node id in each), with the
    // bridge unable to flip either side (1 cross vote vs 3 in-clique)
    val cliqueA = Seq("a","b","c","d").combinations(2).map(p => (p(0), p(1))).toSeq
    val cliqueB = Seq("e","f","g","h").combinations(2).map(p => (p(0), p(1))).toSeq
    val edges = cliqueA ++ cliqueB ++ Seq(("d", "e"))
    val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    val lbl = Graph.labelPropagationFixed(sym, "src", "dst", rounds = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(lbl.size == 8)
    assert(Seq("a","b","c","d").map(lbl).distinct.size == 1, s"$lbl")
    assert(Seq("e","f","g","h").map(lbl).distinct.size == 1, s"$lbl")
    assert(lbl("a") != lbl("e"), s"communities must differ: $lbl")
  }

  test("q140 plan: data-sized joins are all hash/merge equi-joins") {
    val plan = graft.queries.Registry.queries("q140_triangle_census")(
      spark, sf("sf0.001")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the only nested-loop joins are the final census assembly: two
    // crossJoins of broadcast ONE-ROW aggregate frames (house pattern)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj == 2, s"expected exactly the 2 one-row stat joins, got $bnlj")
  }

  test("q243 sequence pairs: a literal first-occurrence replay reproduces supports") {
    import spark.implicits._
    val ev = Tables(spark, sf("sf0.001"), "events")
      // NTZ has no direct long cast; micros preserve the total order
      .select($"user_id", $"event_type",
        expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))"))
      .as[(Long, String, Long)].collect()
    val firsts = ev.groupBy(r => (r._1, r._2))
      .map { case ((u, t), rs) => (u, t, rs.map(_._3).min) }
    val want = firsts.groupBy(_._1).values.flatMap { types =>
      for { a <- types; b <- types if a._2 != b._2 && a._3 < b._3 }
        yield (a._2, b._2)
    }.groupBy(identity).map { case ((a, b), hits) =>
      (a, b, hits.size.toLong) }.toSeq.sortBy(t => (t._1, t._2))
    val got = graft.queries.Registry.queries("q243_seq_pairs")(
      spark, sf("sf0.001")).as[(String, String, Long)].collect().toSeq
    assert(got == want, s"supports diverged:\n$got\n$want")
    assert(want.nonEmpty)
  }

  test("q244 interpurchase: a literal sorted-gap replay reproduces the medians") {
    import spark.implicits._
    val orders = Tables(spark, sf("sf0.001"), "orders")
      .join(broadcast(Tables(spark, sf("sf0.001"), "customer")
        .select($"c_custkey", $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_custkey",
        datediff($"o_orderdate", lit("1990-01-01")).cast("long"), $"o_orderkey")
      .as[(String, Long, Long, Long)].collect()
    val gaps = orders.groupBy(_._2).values.flatMap { rs =>
      val sorted = rs.sortBy(r => (r._3, r._4))
      sorted.sliding(2).collect { case Array(p, c) => (c._1, c._3 - p._3) }
    }.toSeq
    val want = gaps.groupBy(_._1).map { case (seg, gs) =>
      val s = gs.map(_._2).sorted
      val n = s.length
      val med2 = if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
      (seg, n.toLong, med2, med2.toDouble / 2.0)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.Registry.queries("q244_interpurchase")(
      spark, sf("sf0.001")).as[(String, Long, Long, Double)].collect().toSeq
    assert(got == want, s"medians diverged:\n$got\n$want")
  }

  test("q252 cohort retention: a literal first-order replay reproduces the triangle") {
    // Definitional replay in plain Scala — defends the y·12+m month
    // arithmetic and the (cm−1) div 12 year-month reconstruction (a
    // December off-by-one in either would survive a mirrored oracle).
    val dir = sf("sf0.001")
    val rows = Tables(spark, dir, "orders")
      .select($"o_custkey",
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("mk"))
      .as[(Long, Int)].collect()
    val first = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cohorts = first.filter { case (_, cm) =>
      cm >= 1995 * 12 + 1 && cm <= 1995 * 12 + 12 }
    val sizes = cohorts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val active = rows.flatMap { case (cust, mk) =>
      cohorts.get(cust).collect {
        case cm if mk - cm <= 11 => (cm, (mk - cm).toLong, cust) }
    }.distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.size.toLong)
    val want = active.toSeq.map { case ((cm, k), nAct) =>
      val ym = ((cm - 1) / 12).toLong * 100 + (cm - (cm - 1) / 12 * 12)
      (ym, k, nAct, sizes(cm),
        // HALF_UP like the engines' round(), never math.rint's banker's
        BigDecimal(nAct.toDouble / sizes(cm))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(t => (t._1, t._2))
    assert(want.nonEmpty && want.exists(_._2 > 0),
      s"fixture sanity: need cohorts with later activity (${want.size})")
    // December cohort must reconstruct as yyyy12, never (yyyy+1)00
    assert(want.forall { case (ym, _, _, _, _) =>
      ym % 100 >= 1 && ym % 100 <= 12 }, s"month reconstruction broke")
    val got = graft.queries.Registry.queries("q252_cohort_retention")(
      spark, dir).as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == want,
      s"triangle diverged (${got.size} vs ${want.size}; " +
        s"first: ${got.take(3)} vs ${want.take(3)})")
  }
}
