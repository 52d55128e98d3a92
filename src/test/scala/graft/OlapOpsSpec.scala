package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ranking, RangeJoin, Sketches}

/** Round-6 operators: multidimensional grouping plan shape, the binned
  * range join vs the naive inequality join, BM25 ranking order, HLL
  * merge/accuracy invariants, and substring-span duplication. */
class OlapOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ grouping plans

  test("rollup/cube/grouping-sets run as ONE scan + Expand, not a union of scans") {
    val li = Tables(spark, sf("sf0.001"), "lineitem")
    for (q <- Seq(
        li.rollup($"l_returnflag", $"l_linestatus").count(),
        li.cube($"l_returnflag", $"l_linestatus").count())) {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), s"multi-grouping must plan an Expand:\n$plan")
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans == 1, s"expected exactly 1 scan, got $scans:\n$plan")
    }
  }

  test("rollup equals the union of per-level aggregates") {
    val li = Tables(spark, sf("sf0.001"), "lineitem")
    val rolled = li.rollup($"l_returnflag").agg(count(lit(1)).as("n"))
      .select(coalesce($"l_returnflag", lit("(all)")).as("k"), $"n")
    val manual = li.groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      .select($"l_returnflag".as("k"), $"n")
      .unionByName(li.agg(count(lit(1)).as("n")).select(lit("(all)").as("k"), $"n"))
    assert(rolled.except(manual).isEmpty && manual.except(rolled).isEmpty)
  }

  // --------------------------------------------------------- range join

  test("pointInInterval matches the naive inequality join, boundaries included") {
    // points on every unit; intervals deliberately straddle, touch, and
    // miss bin boundaries (binWidth=10), plus an empty one (lo == hi)
    val pts = (0L to 100L).toDF("pt")
    val ivs = Seq(
      (1, 0L, 10L),   // aligned exactly to one bin
      (2, 5L, 25L),   // straddles two boundaries
      (3, 9L, 10L),   // single point, just below a boundary
      (4, 10L, 10L),  // empty: must match nothing
      (5, 98L, 300L), // runs past the data
      (6, 40L, 41L)   // single point at a bin start
    ).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, col("pt"), ivs, col("lo"), col("hi"), 10L)
      .select($"iv_id", $"pt")
    val want = pts.crossJoin(ivs).filter($"lo" <= $"pt" && $"pt" < $"hi")
      .select($"iv_id", $"pt")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.filter($"iv_id" === 4).count() == 0, "empty interval matched")
    // exactly-once semantics: no (iv, pt) pair is emitted twice
    assert(got.count() == got.distinct().count(), "duplicate pair emitted")
  }

  test("range-join query plans an equi-join, never a nested-loop/cartesian") {
    val q = graft.queries.Registry.queries("q122_range_join")(spark, sf("sf0.001"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must bin to an equi-join:\n${plan.take(2000)}")
  }

  // --------------------------------------------------------------- BM25

  test("BM25 ranks a doc with all query terms above single-term docs; rare terms weigh more") {
    val docs = Seq(
      (1, "alpha beta gamma"),
      (2, "alpha alpha alpha delta epsilon"),
      (3, "beta zeta eta theta"),
      (4, "iota kappa lambda mu"),   // no query terms: must not appear
      (5, "alpha beta beta nu")
    ).toDF("doc_id", "text")
    val top = Ranking.bm25TopK(docs, "doc_id", "text", Seq("alpha", "beta"), 10)
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(!top.map(_._1).contains(4), "doc without query terms leaked into results")
    val score = top.toMap
    assert(score(5) > score(2), "two distinct query terms must beat repeats of one")
    assert(score.keySet == Set(1, 2, 3, 5))
  }

  test("BM25 length normalization: same tf, shorter doc scores higher") {
    val docs = Seq(
      (1, "alpha one two"),
      (2, "alpha one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val s = Ranking.bm25TopK(docs, "doc_id", "text", Seq("alpha"), 10)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(s(1) > s(2))
  }

  test("retrievalEval: perfect retrieval scores NDCG = MRR = 1") {
    // only docs 1-2 contain the query term; both graded 3 → the BM25
    // order IS an ideal order, partial precision@k reflects corpus size
    val docs = Seq(
      (1, "rare filler filler"), (2, "rare filler"),
      (3, "other words here"), (4, "more other words"), (5, "noise")
    ).toDF("doc_id", "text")
    val rel = when(array_contains(split(lower($"text"), " "), "rare"), 3)
      .otherwise(0)
    val r = Ranking.retrievalEval(docs, "doc_id", "text",
      Seq("rare"), rel, k = 5).head()
    assert(r.getAs[Long]("n_rel") == 2)
    assert(math.abs(r.getAs[Double]("ndcg_k") - 1.0) < 1e-12)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(math.abs(r.getAs[Double]("p_at_k") - 0.4) < 1e-12)
  }

  test("retrievalEval: hand-computed NDCG when the best doc ranks second") {
    // d1 "q q q" outranks d2 "q rel3mark" on tf, but d2 carries grade 3
    // vs d1's grade 1 → dcg = 1/log2(2) + 7/log2(3), idcg = 7 + 1/log2(3)
    val docs = Seq((1, "q q q"), (2, "q rel3mark")).toDF("doc_id", "text")
    val toks = split(lower($"text"), " ")
    val rel = when(array_contains(toks, "rel3mark"), 3)
      .when(array_contains(toks, "q"), 1).otherwise(0)
    val r = Ranking.retrievalEval(docs, "doc_id", "text",
      Seq("q"), rel, k = 10).head()
    val log23 = math.log(3.0) / math.log(2.0)
    val want = (1.0 + 7.0 / log23) / (7.0 + 1.0 / log23)
    assert(math.abs(r.getAs[Double]("ndcg_k") - want) < 1e-9,
      s"got ${r.getAs[Double]("ndcg_k")} want $want")
    assert(r.getAs[Double]("mrr") == 1.0) // rank-1 doc has grade 1 > 0
  }

  // ---------------------------------------------------------------- HLL

  test("HLL sketches merge by register max: split == one-shot, any split") {
    val df = (1 to 3000).map(i => s"k$i").toDF("k")
    val whole = Sketches.hllSketch(df, $"k", 8, "t")
    val parts = Seq(
      Sketches.hllSketch(df.filter(substring($"k", 2, 10).cast("long") % 3 === 0), $"k", 8, "t"),
      Sketches.hllSketch(df.filter(substring($"k", 2, 10).cast("long") % 3 === 1), $"k", 8, "t"),
      Sketches.hllSketch(df.filter(substring($"k", 2, 10).cast("long") % 3 === 2), $"k", 8, "t"))
    val merged = Sketches.hllMerge(parts: _*)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty,
      "merged register table differs from the one-shot sketch")
  }

  test("HLL estimate lands within the published error band (b=8 -> ~6.5% rse)") {
    for (n <- Seq(500, 5000, 50000)) {
      val df = (1 to n).map(i => s"v$i").toDF("k")
      val est = Sketches.hllDistinct(df, $"k", 8, "acc")
        .select($"est_distinct").head().getDouble(0)
      assert(math.abs(est - n) < 4 * 0.065 * n, // 4 sigma: deterministic fixture
        s"n=$n est=$est off by ${math.abs(est - n) / n}")
    }
  }

  test("grouped HLL equals the per-group ungrouped sketch exactly") {
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val grouped = Sketches.hllEstimateGrouped(
      Sketches.hllSketchGrouped(df, Seq("g"), $"v", 8, "gg"), Seq("g"), 8)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sketches.hllDistinct(df.filter($"g" === g).select($"v"), $"v", 8, "gg")
        .collect().head
      assert(grouped(g) == ((solo.getLong(0), solo.getLong(1), solo.getDouble(2))),
        s"group $g diverged: ${grouped(g)} vs $solo")
    }
  }

  test("HLL duplicate-insensitivity: multiplicity never changes the sketch") {
    val once = (1 to 1000).map(i => s"d$i").toDF("k")
    val thrice = once.union(once).union(once)
    assert(Sketches.hllSketch(thrice, $"k", 8, "m")
      .except(Sketches.hllSketch(once, $"k", 8, "m")).isEmpty)
  }

  // ----------------------------------------------------- duplicate spans

  test("duplicateSpans finds planted shared boilerplate and nothing else") {
    val license = "this exact forty-character license line!!" // 42 chars
    require(license.length > 40)
    def noise(seed: Int) = Seq.tabulate(30)(i => s"w${seed * 31 + i * 7}").mkString(" ")
    val docs = Seq(
      (1, s"$license ${noise(1)}"),
      (2, s"${noise(2)} $license"),
      (3, noise(3)),
      (4, noise(4))
    ).toDF("doc_id", "text")
    // stride=1: exact detection of any shared span >= width
    val hit = Dedup.duplicateSpans(docs, "doc_id", "text", width = 40, stride = 1)
      .collect().map(_.getInt(0)).toSet
    assert(hit == Set(1, 2), s"expected the two license docs, got $hit")
  }

  test("duplicateSpans: a doc repeating its own text is NOT cross-doc duplicated") {
    val block = "b " * 40
    val docs = Seq((1, s"$block $block"), (2, "totally unrelated text " * 5))
      .toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(docs, "doc_id", "text", 40, 1).count() == 0)
  }

  // ------------------------------------------------- bounded-state top-k

  test("TopKPairs equals the window-rank formulation on adversarial ties") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Aggregators
    // many ties (value = i % 7) force the (value desc, id asc) tiebreak
    val rows = (1L to 500L).map(i => (s"g${i % 5}", i % 7, i)).toDF("g", "v", "id")
    val topk = udaf(Aggregators.TopKPairs(4))
    val got = rows.groupBy($"g").agg(topk($"v", $"id").as("top"))
      .select($"g", posexplode($"top").as(Seq("i", "p")))
      .select($"g", ($"i" + 1).as("rank"), $"p._1".as("v"), $"p._2".as("id"))
    val want = rows.withColumn("rank",
        row_number().over(Window.partitionBy($"g").orderBy($"v".desc, $"id")))
      .filter($"rank" <= 4).select($"g", $"rank".cast("long"), $"v", $"id")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("TopKPairs merge is order-insensitive and the buffer stays bounded") {
    import graft.functions.Aggregators
    val agg = Aggregators.TopKPairs(3)
    val items = Seq((5L, 1L), (5L, 0L), (9L, 7L), (1L, 2L), (9L, 8L), (3L, 3L))
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    for (cut <- 1 until items.length) {
      val (l, r) = items.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m == whole, s"split at $cut diverged: $m vs $whole")
      assert(m.length <= 3)
    }
    assert(whole == Seq((9L, 7L), (9L, 8L), (5L, 0L)))
  }

  // --------------------------------------------- int8 scalar quantization

  test("int8 quantization keeps brute-force top-1 on well-separated vectors") {
    // query near e1; candidates: aligned, orthogonal, opposite — gaps far
    // exceed the <=1% per-dim quantization error, so top-1 must agree
    val vecs = Seq(
      (0, Seq(1.0f, 0.1f, 0.0f)),   // query
      (1, Seq(0.9f, 0.2f, 0.1f)),   // close
      (2, Seq(0.0f, 0.0f, 1.0f)),   // orthogonal
      (3, Seq(-1.0f, -0.1f, 0.0f))  // opposite
    ).toDF("vec_id", "embedding")
    val long = vecs.select($"vec_id", posexplode($"embedding").as(Seq("dim", "x")))
    val scales = long.groupBy($"dim").agg(max(abs($"x")).as("ma"))
    val quant = long.join(broadcast(scales), "dim")
      .select($"vec_id", $"dim",
        when($"ma" === 0f, lit(0L))
          .otherwise(round($"x".cast("double") * 127.0 / $"ma".cast("double"))
            .cast("long")).as("qv"))
    val qry = quant.filter($"vec_id" === 0).select($"dim", $"qv".as("qq"))
    val best = quant.filter($"vec_id" =!= 0).join(broadcast(qry), "dim")
      .groupBy($"vec_id").agg(sum($"qv" * $"qq").as("score"))
      .orderBy($"score".desc, $"vec_id").head()
    assert(best.getInt(0) == 1, s"expected vec 1 on top, got $best")
    // all-zero dimension must quantize to 0, not NaN/null
    val zdim = Seq((0, Seq(0.0f, 1.0f)), (1, Seq(0.0f, 0.5f))).toDF("vec_id", "embedding")
      .select($"vec_id", posexplode($"embedding").as(Seq("dim", "x")))
    val zq = zdim.join(zdim.groupBy($"dim").agg(max(abs($"x")).as("ma")), "dim")
      .select(when($"ma" === 0f, lit(0L))
        .otherwise(round($"x".cast("double") * 127.0 / $"ma".cast("double")).cast("long")).as("qv"))
    assert(zq.filter($"qv".isNull).count() == 0)
  }

  // ----------------------------------------------- canonical selection

  test("canonical keep selects the longest copy, not the min id") {
    import org.apache.spark.sql.expressions.Window
    // planted cluster: 10 and 11 near-identical, 11 longer; 12 unrelated
    val docs = Seq(
      (10, "the quick brown fox jumps over the lazy dog"),
      (11, "the quick brown fox jumps over the lazy dog again and again"),
      (12, "completely different content with zero character overlap xyz")
    ).toDF("doc_id", "text").withColumn("n_chars", length($"text"))
    val pairs = Dedup.sparseJaccardPairs(docs, "doc_id",
      graft.functions.TextFunctions.charNGrams($"text", 3), threshold = 0.5)
    val cc = Dedup.cluster(docs.select($"doc_id"), "doc_id", pairs)
    val w = Window.partitionBy($"cluster_id").orderBy($"n_chars".desc, $"id")
    val keep = cc.join(docs.select($"doc_id".as("id"), $"n_chars"), "id")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"cluster_id", $"id").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(keep(10) == 11, s"longest copy (11) must be canonical: $keep")
    assert(keep(12) == 12)
  }

  // -------------------------------------------------------------- PageRank

  test("PageRank: symmetric cycle stays uniform; a hub out-ranks its spokes") {
    import graft.operators.Graph
    // 4-cycle with both directions: perfectly symmetric, ranks must stay
    // equal to the initial unit for every node at every damping
    val cyc = Seq(("a","b"),("b","c"),("c","d"),("d","a"))
    val sym = (cyc ++ cyc.map(_.swap)).toDF("src", "dst")
    val r1 = Graph.pageRankFixed(sym, "src", "dst", iters = 4)
      .select($"rank").distinct().collect()
    assert(r1.length == 1, s"symmetric cycle must have one rank value, got ${r1.toSeq}")

    // star: every spoke links to the hub and back
    val star = (1 to 6).flatMap(i => Seq(("hub", s"s$i"), (s"s$i", "hub")))
      .toDF("src", "dst")
    val ranks = Graph.pageRankFixed(star, "src", "dst", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert((1 to 6).forall(i => ranks("hub") > ranks(s"s$i")),
      s"hub must out-rank spokes: $ranks")
  }

  test("PageRank: result is identical under repartitioning (integer arithmetic)") {
    import graft.operators.Graph
    val edges = (1 to 60).map(i => (s"n${i % 10}", s"n${(i * 7) % 10}"))
      .toDF("src", "dst")
    val a = Graph.pageRankFixed(edges, "src", "dst", iters = 3)
    val b = Graph.pageRankFixed(edges.repartition(7), "src", "dst", iters = 3)
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "fixed-point ranks must not depend on the input partitioning")
  }

  // -------------------------------------------------------------- HITS

  test("HITS is bit-equal to an independent BigInt replay of the L1 recurrence") {
    import graft.operators.Graph
    // asymmetric directed graph with a shared target, a chain, and a
    // duplicate edge (must count once) — every half-round exercised
    val edges = Seq(("a", "x"), ("b", "x"), ("c", "x"), ("a", "y"),
      ("x", "z"), ("a", "x")).toDF("src", "dst")
    val iters = 3
    val scale = 1000000000L
    val got = Graph.hitsFixed(edges, "src", "dst", iters)
      .select($"node", $"auth", $"hub")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // independent scalar replay (BigInt: nonneg, so / == the div floor)
    val es = Seq(("a", "x"), ("b", "x"), ("c", "x"), ("a", "y"), ("x", "z"))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    var hub = nodes.map(_ -> BigInt(scale)).toMap
    var auth = Map.empty[String, BigInt]
    for (_ <- 1 to iters) {
      val aRaw = es.groupBy(_._2).map { case (v, g) =>
        v -> g.map(e => hub(e._1)).sum }
      val aSum = aRaw.values.sum
      auth = nodes.map(n =>
        n -> aRaw.getOrElse(n, BigInt(0)) * scale / aSum).toMap
      val hRaw = es.groupBy(_._1).map { case (u, g) =>
        u -> g.map(e => auth(e._2)).sum }
      val hSum = hRaw.values.sum
      hub = nodes.map(n =>
        n -> hRaw.getOrElse(n, BigInt(0)) * scale / hSum).toMap
    }
    val want = nodes.map(n => n -> (auth(n).toLong, hub(n).toLong)).toMap
    assert(got == want, s"HITS trajectory diverged:\ngot  $got\nwant $want")
    // and the algebra sanity: x is the sole multi-in-degree authority
    assert(got("x")._1 > got("y")._1 && got("x")._1 > got("z")._1)
  }

  test("HITS is identical under repartitioning (integer arithmetic)") {
    import graft.operators.Graph
    val edges = (1 to 60).map(i => (s"n${i % 10}", s"n${(i * 7) % 11}"))
      .toDF("src", "dst")
    val a = Graph.hitsFixed(edges, "src", "dst", iters = 2)
    val b = Graph.hitsFixed(edges.repartition(7), "src", "dst", iters = 2)
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "fixed-point HITS must not depend on the input partitioning")
  }

  // ------------------------------------------------------------ TWAP

  test("TWAP weighs values by holding time; simultaneous samples carry no weight") {
    import graft.operators.TimeSeries
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // value 100 held 3s, value 200 held 1s -> twap (300+200)/4 = 1.25
    // the (t=0, id=0) sample is displaced by the id=1 tie at the same
    // instant: zero duration, no weight
    val df = Seq(
      (1L, ts(0), 0L, 9.99), // zero-duration tie, must not contribute
      (1L, ts(0), 1L, 1.00),
      (1L, ts(3), 2L, 2.00),
      (1L, ts(4), 3L, 7.77)  // terminal sample: no holding period
    ).toDF("user_id", "ts", "event_id", "v")
    val r = TimeSeries.twap(df, "user_id", "ts", "event_id",
      round($"v" * 100).cast("long")).head()
    assert(r.getDouble(1) == 1.25 && r.getLong(2) == 1250000L &&
      r.getLong(3) == 4L, s"$r")
  }

  test("TWAP of an all-simultaneous group is null, not Infinity") {
    import graft.operators.TimeSeries
    val t0 = new java.sql.Timestamp(0)
    val df = Seq((1L, t0, 0L, 1.0), (1L, t0, 1L, 2.0), (1L, t0, 2L, 3.0))
      .toDF("user_id", "ts", "event_id", "v")
    val r = TimeSeries.twap(df, "user_id", "ts", "event_id",
      round($"v" * 100).cast("long")).head()
    assert(r.isNullAt(1) && r.isNullAt(2),
      s"zero-span twap must be null (SQL semantics): $r")
    assert(r.getLong(3) == 0L)
  }

  test("PageRank fails loudly when scale is below the node count") {
    import graft.operators.Graph
    val edges = (1 to 50).map(i => (s"n$i", s"n${i % 50 + 1}")).toDF("src", "dst")
    val ex = intercept[Exception] {
      Graph.pageRankFixed(edges, "src", "dst", iters = 1, scale = 10L).count()
    }
    assert(ex.getMessage.contains("pageRankFixed") ||
      Option(ex.getCause).exists(_.getMessage.contains("pageRankFixed")),
      s"expected the scale guard, got: ${ex.getMessage}")
  }

  // ------------------------------------------------------------- BPE

  test("BPE greedy merge: overlapping runs merge left-to-right, non-overlapping") {
    import graft.operators.Bpe
    // 'aaa' + pair (a,a): ONE merge (left pair), the third 'a' survives;
    // round 2 then merges (aa, a)
    val m = Bpe.trainMerges(Seq(("aaa", 1L)).toDF("w", "f"), "w", "f", rounds = 2)
      .orderBy($"round").collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "a", "a", 2L)), s"round 1: ${m(0)}")
    assert(m(1) == ((2, "aa", "a", 1L)), s"round 2: ${m(1)}")
  }

  test("BPE greedy merge: back-to-back occurrences all merge in one round") {
    import graft.operators.Bpe
    // 'abab': (a,b) appears twice and both merge in round 1 (the shared
    // separator must not hide the second occurrence); round 2 = (ab, ab)
    val m = Bpe.trainMerges(Seq(("abab", 1L)).toDF("w", "f"), "w", "f", rounds = 2)
      .orderBy($"round").collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "a", "b", 2L)), s"round 1: ${m(0)}")
    assert(m(1) == ((2, "ab", "ab", 1L)), s"round 2: ${m(1)}")
  }

  test("BPE argmax ties break lexicographically; frequency weights count") {
    import graft.operators.Bpe
    // (z,w) and (x,y) both have weighted count 3; (x,y) wins the tie
    val words = Seq(("zw", 3L), ("xy", 2L), ("xyq", 1L)).toDF("w", "f")
    val m = Bpe.trainMerges(words, "w", "f", rounds = 1).head()
    assert((m.getString(1), m.getString(2), m.getLong(3)) == (("x", "y", 3L)), s"$m")
  }

  test("BPE encodeVocab token counts shrink with merges, floor at 1") {
    import graft.operators.Bpe
    val words = Seq(("abab", 2L), ("ab", 1L), ("zq", 1L)).toDF("w", "f")
    // round 1 merges (a,b): abab -> ab|ab (2 tokens), ab -> 1, zq -> 2
    val r1 = Bpe.encodeVocab(words, "w", "f", rounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(r1 == Map("abab" -> 2L, "ab" -> 1L, "zq" -> 2L), s"$r1")
    // round 2 merges (ab,ab): abab collapses to one token
    val r2 = Bpe.encodeVocab(words, "w", "f", rounds = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(r2 == Map("abab" -> 1L, "ab" -> 1L, "zq" -> 2L), s"$r2")
  }

  test("PageRank: total mass never grows (dangling mass is dropped, not minted)") {
    import graft.operators.Graph
    // 'sink' has no out-edges: its mass drains each round
    val edges = Seq(("a","b"),("b","a"),("a","sink"),("b","sink")).toDF("src","dst")
    val total = Graph.pageRankFixed(edges, "src", "dst", iters = 5)
      .agg(sum($"rank")).head().getLong(0)
    assert(total <= 1000000L, s"mass grew: $total > scale")
  }

  test("assortativity: textbook hand values — P4 is -1/2, K1,3 is -1, C4 is NULL") {
    // Independent-identity pin for q228: the DuckDB oracle mirrors the
    // same doubled-edge Pearson construction, so only published hand
    // values catch a shared misreading (single-orientation correlation,
    // endpoint-degree off-by-one). Newman (2002) §II: the 4-path has
    // r = −1/2, any star is perfectly disassortative (r = −1), and a
    // regular graph (cycle: every degree 2) has zero variance → the
    // declared NULL contract.
    import graft.operators.Graph
    def r(edges: Seq[(String, String)]): (Long, Long, Option[Double]) = {
      val row = Graph.assortativity(edges.toDF("a", "b"), "a", "b").head()
      (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) None else Some(row.getDouble(2)))
    }
    assert(r(Seq(("1", "2"), ("2", "3"), ("3", "4"))) == ((4L, 3L, Some(-0.5))),
      "path P4 must score -1/2")
    assert(r(Seq(("h", "a"), ("h", "b"), ("h", "c"))) == ((4L, 3L, Some(-1.0))),
      "star K1,3 must score -1")
    assert(r(Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "1"))) ==
      ((4L, 4L, None)), "regular C4 must emit the NULL contract")
  }
}
