package graft

import graft.operators.{Curation, Redact, Selection, TimeSeries}
import org.apache.spark.sql.functions._

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("piiScrub replaces in rule order and counts what it replaced") {
    val df = Seq(
      (1L, "mail a.b-c@test.org and ip 10.0.0.1 twice x@y.io"),
      (2L, "ssn 123-45-6789 vs phone 555-123-4567"),
      (3L, "clean text, no pii at all")
    ).toDF("id", "text")
    val out = Redact.piiScrub(df, col("text"))
      .select($"id", $"n_email", $"n_ssn", $"n_phone", $"n_ipv4", $"redacted")
      .as[(Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 2L, "two emails")
    assert(out(1L)._5 === 1L, "one ip")
    assert(out(1L)._6 === "mail <EMAIL> and ip <IP> twice <EMAIL>")
    assert(out(2L)._3 === 1L, "ssn counted by the ssn rule, not phone")
    assert(out(2L)._4 === 1L)
    assert(out(2L)._6 === "ssn <SSN> vs phone <PHONE>")
    assert(out(3L) === ((3L, 0L, 0L, 0L, 0L, "clean text, no pii at all")))
    // public column ORDER: `redacted` precedes the n_<rule> counts (the
    // pre-consolidation order a positional consumer may rely on —
    // round-16 advice pin)
    val cols = Redact.piiScrub(df, col("text")).columns.toSeq
    assert(cols == Seq("id", "text", "redacted",
      "n_email", "n_ssn", "n_phone", "n_ipv4"),
      s"redact() column order drifted: $cols")
  }

  test("weighted sample: heavy rows win proportionally; zero weight never picked") {
    // weights 90/10/0 over m=10 probes -> expect 9/1/0 picks
    val df = Seq((1L, 90L), (2L, 10L), (3L, 0L)).toDF("id", "w")
    val picks = Selection.weightedSystematicSample(df, $"id", $"w", 10, 2)
      .groupBy($"id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(picks === Map(1L -> 9L, 2L -> 1L), s"got $picks")
  }

  test("weighted sample is invariant to the bucketing parameter") {
    val df = (0L until 200L).map(i => (i, (i % 7) + 1)).toDF("id", "w")
    def run(bw: Long): Seq[(Long, Long)] =
      Selection.weightedSystematicSample(df, $"id", $"w", 17, bw)
        .select($"pick", $"id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(1000) // one bucket = the naive global cumsum
    assert(run(8) === a, "8-wide buckets must pick the identical set")
    assert(run(37) === a, "non-divisor width too")
  }

  test("rolling z-score flags a planted spike, honors minObs, and sigma=0 strictness") {
    // key a: 6 flat buckets then a spike; minObs 3, lookback 4
    val rows = (1 to 6).map(i => ("a", i, 100L)) :+ (("a", 7, 130L))
    val out = TimeSeries.rollingZScore(rows.toDF("k", "b", "c"),
        "k", "b", $"c", lookback = 4, minObs = 3, z = 3)
      .select($"b", $"is_anomaly").as[(Int, Boolean)].collect().toMap
    assert(!out(1) && !out(2) && !out(3), "head buckets below minObs never flag")
    assert(!out(5) && !out(6), "flat region is not anomalous")
    assert(out(7), "spike over a zero-variance window flags (sigma=0 strict limit)")
  }

  test("lmQualityScores: fixed-point bigram MLE, hand-checked") {
    // corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1 -> c1: a=3, b=2
    // p(b|a) = 1000000*3//3 = 1000000; p(a|b) = p(c|b) = 1000000*1//2 = 500000
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val m = Curation.lmQualityScores(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) === ((3L, (1000000L + 500000L + 1000000L) / 3)))
    assert(m(2L) === ((2L, (1000000L + 500000L) / 2)))
  }

  test("hashedBigramBucket stays in range and is order-sensitive") {
    val df = Seq(("x", "y"), ("y", "x"), ("x", "y")).toDF("w1", "w2")
    val b = df.select(Curation.hashedBigramBucket($"w1", $"w2", 256).as("b"))
      .as[Long].collect()
    assert(b.forall(v => v >= 0 && v < 256), s"bucket out of range: ${b.toSeq}")
    assert(b(0) == b(2), "same bigram -> same bucket")
    assert(b(0) != b(1), "combine must distinguish (x,y) from (y,x)")
    intercept[IllegalArgumentException] {
      Curation.hashedBigramBucket($"w1", $"w2", 100)
    }
  }

  test("dsirSelect ranks docs matching the target distribution first") {
    // target slice repeats 'p q' transitions; doc 10 is pure target-style,
    // doc 11 mixes, doc 12 shares nothing with the target
    val src = Seq(
      (10L, "p q p q p q"),
      (11L, "p q u v u v"),
      (12L, "u v w u v w")).toDF("doc_id", "text")
    val tgt = Seq((99L, "p q p q")).toDF("doc_id", "text")
    val out = Curation.dsirSelect(src, tgt, "doc_id", "text",
        buckets = 256, k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(10L, 11L, 12L), s"target-like docs must rank first: $out")
  }

  test("packSequences: hand-checked occupancy at seqLen=4") {
    // token counts 3,5,2,9 at offsets 0,3,8,10 -> 19 tokens = 5 sequences
    val df = Seq(
      (1L, "a a a"), (2L, "b b b b b"), (3L, "c c"),
      (4L, "d d d d d d d d d")).toDF("doc_id", "text")
    val out = Curation.packSequences(df, "doc_id", "text", seqLen = 4)
      .orderBy($"seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 4L),   // docs 1+2 start here; 3 + 1 tokens
      (1L, 1L, 0L, 4L),   // doc 2 continues
      (2L, 2L, 2L, 4L),   // docs 3+4 start; 2 + 2 tokens
      (3L, 1L, 0L, 4L),   // doc 4 continues
      (4L, 1L, 0L, 3L)),  // ragged tail
      s"occupancy mismatch: ${out.toSeq}")
    // conservation: per-seq token sums must reproduce the corpus total
    assert(out.map(_._4).sum == 19L)
  }

  test("rolling z-score integer compare matches the float z-score on a noisy window") {
    val vals = Seq(100L, 104L, 96L, 101L, 99L, 103L, 97L, 100L, 102L, 98L)
    val df = (vals :+ 140L).zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("k", "b", "c")
    val flagged = TimeSeries.rollingZScore(df, "k", "b", $"c", 10, 5, 3)
      .filter($"is_anomaly").select($"b").as[Int].collect().toSet
    // float check for the last bucket: mean=100, var=6 -> sigma~2.45; |140-100| >> 3 sigma
    assert(flagged === Set(10), s"only the planted outlier: $flagged")
  }

  test("lDiversity: uniform sensitive -> entropy_l == l_distinct; degenerate -> 1") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // class A: 4 rows over 4 distinct sensitive values (uniform) ->
    // entropy l = exp(ln 4) = 4 = distinct l, not at risk at policy 3;
    // class B: 6 rows all sharing ONE value -> entropy l = 1, at risk
    // (the exact disclosure k-anonymity alone cannot see: B is a large
    // class that still leaks its attribute)
    val rows = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L),
      ("B", 9L), ("B", 9L), ("B", 9L), ("B", 9L), ("B", 9L), ("B", 9L))
      .toDF("qid", "sens")
    val got = graft.operators.Quality.lDiversity(rows, Seq("qid"), "sens")
      .select($"qid", $"n", $"l_distinct", $"entropy_l", $"at_risk")
      .as[(String, Long, Long, Double, Int)].collect().toSeq
    assert(got == Seq(("A", 4L, 4L, 4.0, 0), ("B", 6L, 1L, 1.0, 1)),
      s"l-diversity hand case diverged: $got")
  }

  test("lDiversity reports a NULL-QID class instead of dropping it") {
    import spark.implicits._
    // A privacy audit must see the class whose quasi-identifier is NULL
    // — the old groupBy+equi-join silently discarded it (the join's
    // null-dropping equality), under-reporting at-risk classes. The
    // window-partition form groups NULLs exactly like groupBy does.
    val rows = Seq((Option("A"), 1L), (Option("A"), 2L), (Option("A"), 3L),
      (Option.empty[String], 7L), (Option.empty[String], 7L))
      .toDF("qid", "sens")
    val got = graft.operators.Quality.lDiversity(rows, Seq("qid"), "sens")
      .select($"qid", $"n", $"l_distinct", $"entropy_l", $"at_risk")
      .as[(Option[String], Long, Long, Double, Int)].collect().toSeq
      .sortBy(_._1.getOrElse(""))
    assert(got == Seq((None, 2L, 1L, 1.0, 1),
      (Some("A"), 3L, 3L, 3.0, 0)),
      s"NULL-QID class must be audited (degenerate, at risk): $got")
  }

  test("caliperMatch: nearest wins, ties go to the lower value, one-sided matches") {
    import spark.implicits._
    // stratum s1 (values in cents): controls at 100 and 200;
    //   treat at 140 -> nearest is 100 (|40| < |60|)
    //   treat at 150 -> equidistant -> tie to the LOWER control (100)
    //   treat at 190 -> nearest is 200
    // stratum s2: control only ABOVE the treat -> one-sided match
    // stratum s3: no controls at all -> treat drops out entirely
    val rows = Seq(
      ("s1", 1L, 100L, 0), ("s1", 2L, 200L, 0),
      ("s1", 3L, 140L, 1), ("s1", 4L, 150L, 1), ("s1", 5L, 190L, 1),
      ("s2", 6L, 500L, 0), ("s2", 7L, 300L, 1),
      ("s3", 8L, 700L, 1))
      .toDF("st", "k", "v", "t")
    val got = graft.operators.Stats.caliperMatch(rows, "st", "k", "v", "t")
      .as[(String, Long, Double, Double)].collect().toSeq
    // s1: diffs 140-100=40, 150-100=50, 190-200=-10 -> att=(40+50-10)/3
    //   = 26.6667 cents = 0.2667 dollars; gaps (40+50+10)/3 = 0.3333
    // s2: 300-500 = -200 -> att -2.0, gap 2.0; s3 absent
    assert(got == Seq(("s1", 3L, 0.2667, 0.3333), ("s2", 1L, -2.0, 2.0)),
      s"caliper hand case diverged: $got")
  }

  private def md5u(s: String): Double = {
    // q231's draw, replayed literally: first 15 md5 hex chars → 60-bit
    // int → u = (h + 0.5)/2^60
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(d.take(15), 16) + 0.5) / 1152921504606846976.0
  }

  test("q231 A-Res: log-space ranking equals literal u^(1/w); frequencies follow w/Σw") {
    // (1) the log-space trick: ln(u)/w is a monotone transform of
    // u^(1/w), so both rankings must be IDENTICAL on real data — the
    // equivalence that justifies shipping the pow-free form
    val rows = Tables(spark, sf("sf0.001"), "documents")
      .filter($"n_chars" > 0)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    assert(rows.length > 20)
    val topLog = rows.sortBy { case (id, w) =>
      (-(math.log(md5u(s"q231:$id")) / w), id) }.take(20).map(_._1).toSeq
    val topPow = rows.sortBy { case (id, w) =>
      (-math.pow(md5u(s"q231:$id"), 1.0 / w), id) }.take(20).map(_._1).toSeq
    assert(topLog == topPow, s"log-space top-20 diverged:\n$topLog\n$topPow")
    // and the registered query returns exactly that top-20
    val q = graft.queries.Registry.queries("q231_weighted_sample")(
      spark, sf("sf0.001")).select($"doc_id").as[Long].collect().toSeq
    assert(q == topPow, s"query top-20 diverged from the literal law:\n$q\n$topPow")
    // (2) the Efraimidis-Spirakis law: P(item wins) = w_i/Σw. Three
    // items with weights 1:2:7 over 4000 salts — md5 is FIXED, so the
    // observed frequencies are constants; the 4σ binomial envelope
    // (±0.03 at p=0.7) makes the assertion deterministic, not flaky.
    val weights = Map("a" -> 1.0, "b" -> 2.0, "c" -> 7.0)
    val wins = (0 until 4000).map { salt =>
      weights.maxBy { case (it, w) => math.log(md5u(s"$salt:$it")) / w }._1
    }.groupBy(identity).view.mapValues(_.size / 4000.0).toMap
    assert(math.abs(wins("a") - 0.1) < 0.03, s"P(a)=${wins("a")}")
    assert(math.abs(wins("b") - 0.2) < 0.03, s"P(b)=${wins("b")}")
    assert(math.abs(wins("c") - 0.7) < 0.03, s"P(c)=${wins("c")}")
  }

  test("q277 shard layout: deterministic replay, epoch-sensitivity, literal checksum") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h15(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    // literal replay of the registered law over the sf0.001 corpus
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
      .select($"doc_id", graft.functions.TextFunctions.wordCount($"text").cast("long"))
      .as[(Long, Long)].collect().toSeq
    val expected = docs
      .map { case (id, n) => (h15(s"shard:$id") % 16, h15(s"epoch1:$id"), id, n) }
      .groupBy(_._1).map { case (shard, rows) =>
        val ordered = rows.sortBy(r => (r._2, r._3))
        shard -> (ordered.size.toLong, ordered.map(_._4).sum,
          ordered.zipWithIndex.map { case (r, i) =>
            ((i + 1) % 1000003L) * (r._3 % 1000003L) }.sum,
          ordered.head._3)
      }
    val got = graft.queries.Registry.queries("q277_shard_layout")(
        spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expected, s"shard layout drifted from the literal law")
    // determinism: a second run is byte-identical (no session state)
    val again = graft.queries.Registry.queries("q277_shard_layout")(
        spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(again == got, "epoch shuffle must replay byte-identically")
    // epoch-sensitivity: a different salt is a fresh global order —
    // same membership (shard key unchanged), different checksums
    val e2 = docs
      .map { case (id, n) => (h15(s"shard:$id") % 16, h15(s"epoch2:$id"), id, n) }
      .groupBy(_._1).map { case (shard, rows) =>
        val ordered = rows.sortBy(r => (r._2, r._3))
        shard -> ordered.zipWithIndex.map { case (r, i) =>
          ((i + 1) % 1000003L) * (r._3 % 1000003L) }.sum
      }
    assert(expected.exists { case (s2, v) => e2(s2) != v._3 },
      "a new epoch salt must produce a different order somewhere")
  }

  test("sourceMix: isqrt temperature rebalance, deterministic kept set, epoch multiplier") {
    import graft.operators.Curation
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // 3 sources with 9 / 4 / 1 docs, full-corpus target (frac 1/1):
    // sqrt weights u = (3, 2, 1), U = 6, N = 14 → integer targets
    // a: 14·3/6 = 7 (downsampled from 9), b: 14·2/6 = 4 (kept whole),
    // c: 14·1/6 = 2 > 1 (UP-sampled: kept 1, n_epochs = 2)
    val rows = (0L until 9L).map((_, "a")) ++
      (10L until 14L).map((_, "b")) ++ Seq((20L, "c"))
    val got = Curation.sourceMix(rows.toDF("doc_id", "src"),
        "doc_id", "src", fracNum = 1, fracDen = 1, weighting = "sqrt")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    def expectKept(ids: Seq[Long], k: Int): (Long, Long) = {
      val kept = ids.sortBy(i => (md5hex(i.toString), i)).take(k)
      (kept.map(_ % 1000003L).sum,
        kept.map(i => (i % 1000003L) * (i % 1000003L)).sum)
    }
    val (sa, qa) = expectKept(0L until 9L, 7)
    assert(got("a") == (("a", 9L, 3L, 7L, 7L, 1L, sa, qa)), s"a: ${got("a")}")
    val (sb, qb) = expectKept(10L until 14L, 4)
    assert(got("b") == (("b", 4L, 2L, 4L, 4L, 1L, sb, qb)), s"b: ${got("b")}")
    assert(got("c") == (("c", 1L, 1L, 2L, 1L, 2L, 20L, 400L)), s"c: ${got("c")}")
    // the kept set is a deterministic rank, so rerunning is byte-stable
    // and the T=1 point keeps exact proportionality: u = n_docs
    val prop = Curation.sourceMix(rows.toDF("doc_id", "src"),
        "doc_id", "src", fracNum = 1, fracDen = 2, weighting = "prop")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r._4).toMap
    // N=14, total = 7, U = 14: targets = 7·n_s/14 = n_s/2 (floor)
    assert(prop == Map("a" -> 4L, "b" -> 2L, "c" -> 0L), s"prop: $prop")
    // T=inf: equal share per source
    val uni = Curation.sourceMix(rows.toDF("doc_id", "src"),
        "doc_id", "src", fracNum = 3, fracDen = 14, weighting = "uniform")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r._4).toMap
    assert(uni == Map("a" -> 1L, "b" -> 1L, "c" -> 1L), s"uniform: $uni")
    val e = intercept[IllegalArgumentException] {
      Curation.sourceMix(rows.toDF("doc_id", "src"), "doc_id", "src",
        1, 1, weighting = "t3")
    }
    assert(e.getMessage.contains("prop"), e.getMessage)
    // the kept-ROWS face selects the identical set (one shared target
    // derivation + rank), keeps every input column, and materializes
    // an up-sampled source's rows exactly ONCE
    val keep = Curation.sourceMixKeep(rows.toDF("doc_id", "src"),
        "doc_id", "src", 1, 1, "sqrt")
      .as[(String, Long)].collect() // join reorders: (src, doc_id)
    val byS = keep.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2 % 1000003L).sum)).toMap
    assert(byS("a") == ((7L, sa)) && byS("b") == ((4L, sb)) &&
      byS("c") == ((1L, 20L)), s"kept rows must match the summary: $byS")
  }

  test("sourceMixKeepEpochs: full-epoch replication + rank-smallest partial residue") {
    import graft.operators.Curation
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // uniform weighting, N = 10, U = 2 → n_target = 5 per source:
    // a (2 docs) UP-samples to 5 rows = 2 full epochs + 1-row partial;
    // b (8 docs) down-samples to its 5 rank-smallest at epoch 1
    val rows = (0L until 2L).map((_, "a")) ++ (10L until 18L).map((_, "b"))
    val got = Curation.sourceMixKeepEpochs(rows.toDF("doc_id", "src"),
        "doc_id", "src", fracNum = 1, fracDen = 1, weighting = "uniform")
      .as[(String, Long, Long)].collect().toSeq // join reorders: (src, id, epoch)
      .map { case (s, i, e) => (i, s, e) }
    def rank(ids: Seq[Long]): Seq[Long] = ids.sortBy(i => (md5hex(i.toString), i))
    val ra = rank(0L until 2L); val rb = rank(10L until 18L)
    val expected =
      ra.map((_, "a", 1L)) ++ ra.map((_, "a", 2L)) ++ ra.take(1).map((_, "a", 3L)) ++
      rb.take(5).map((_, "b", 1L))
    assert(got.sortBy(r => (r._2, r._3, r._1)) ==
      expected.sortBy(r => (r._2, r._3, r._1)),
      s"epoch rows drifted:\n${got.sortBy(r => (r._2, r._3, r._1))}\n$expected")
    // per source: exactly n_target rows; epoch-1 rows == sourceMixKeep
    assert(got.count(_._2 == "a") == 5 && got.count(_._2 == "b") == 5)
    val keep = Curation.sourceMixKeep(rows.toDF("doc_id", "src"),
        "doc_id", "src", 1, 1, "uniform")
      .as[(String, Long)].collect().map(r => (r._2, r._1)).toSet
    assert(got.filter(_._3 == 1L).map(r => (r._1, r._2)).toSet == keep,
      "epoch 1 must equal the down-sampling kept set")
    // a zero-target source emits nothing (and the epoch sequence never
    // descends): frac 1/100 → total target 0 for every source here
    val zero = Curation.sourceMixKeepEpochs(rows.toDF("doc_id", "src"),
      "doc_id", "src", fracNum = 1, fracDen = 100, weighting = "uniform")
    assert(zero.isEmpty, "zero-target mixture must emit no rows")
  }

  test("cdcChunks: literal boundary replay + insertion re-alignment") {
    import graft.operators.Curation
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // literal replay of the rule: cut after position p (w <= p < n)
    // iff the md5 of the window (p-w, p] has residue 0 mod den
    def replay(text: String, w: Int, den: Int): Seq[(Long, Long, Long, String)] = {
      val n = text.length
      val cuts = (w until n).filter { p =>
        java.lang.Long.parseLong(md5hex(text.substring(p - w, p)).take(8), 16) % den == 0
      }
      val bs = 0 +: cuts :+ n
      bs.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
        (i.toLong, (a + 1).toLong, (b - a).toLong, md5hex(text.substring(a, b)))
      }.toSeq
    }
    val rnd = new scala.util.Random(5)
    val text = (0 until 300).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    def run(t: String): Seq[(Long, Long, Long, String)] =
      Curation.cdcChunks(Seq((7L, t)).toDF("doc_id", "text"),
          "doc_id", "text", w = 8, den = 16)
        .orderBy($"chunk_idx")
        .select($"chunk_idx", $"start", $"chunk_len", $"chunk_md5")
        .as[(Long, Long, Long, String)].collect().toSeq
    val got = run(text)
    assert(got == replay(text, 8, 16),
      s"chunking drifted from the literal rule:\n$got\n${replay(text, 8, 16)}")
    assert(got.size >= 3, s"fixture must yield several chunks, got ${got.size}")
    // the CDC property: prepend one char — only the FIRST chunk may
    // change (boundaries are local-content functions, every later one
    // re-aligns), where fixed-offset chunks would ALL shift
    val shifted = run("Z" + text)
    assert(shifted.map(_._4).takeRight(got.size - 1) == got.map(_._4).drop(1),
      "chunk hashes after the first boundary must re-align under insertion")
    // a doc shorter than the window is one whole-text chunk
    val short = run("tiny")
    assert(short == Seq((0L, 1L, 4L, md5hex("tiny"))), short.toString)
    // guards
    val e = intercept[IllegalArgumentException] {
      Curation.cdcChunks(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", w = 1)
    }
    assert(e.getMessage.contains("window"), e.getMessage)
  }

  test("piiRedact: literal counts + redacted text on adversarial fixtures") {
    import graft.operators.Curation
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cases = Seq(
      // two e-mails (one repeated), one phone, one ip
      (0L, "mail a.b+tag@x-y.co or A.B@x-y.co, tel 12-345-678-9012 from 10.2.30.4 ok",
        (2L, 1L, 1L),
        "mail [EMAIL] or [EMAIL], tel [PHONE] from [IP] ok"),
      // decoys that must NOT match: bare domain, 3-2-4 dashed run
      // (SSN-shaped, not the phone pattern), 3-part dotted number,
      // digit run glued to a word (\b holds)
      (1L, "see example.com and 123-45-6789 and 1.2.3 and x25-345-678-9012",
        (0L, 0L, 0L),
        "see example.com and 123-45-6789 and 1.2.3 and x25-345-678-9012"),
      // clean text passes through byte-identical
      (2L, "no personal data here at all", (0L, 0L, 0L),
        "no personal data here at all"),
      // counts are PER-PATTERN over the ORIGINAL text (the documented
      // contract): a phone-shaped e-mail local part counts under BOTH
      // patterns, while the sequential replacement (email first,
      // placeholders carry no digits) redacts it exactly once
      (3L, "ping 12-345-678-9012@host.org now", (1L, 1L, 0L),
        "ping [EMAIL] now"),
      // the NESTED-pattern case (round-16 advice): an IPv4-shaped run
      // inside an e-mail domain counts under both patterns on the
      // original text, but the e-mail replacement swallows it first —
      // detection counts exceed the placeholders in the clean text BY
      // DESIGN (the documented convention fork vs piiScrub)
      (4L, "mail user@10.2.30.4.com now", (1L, 0L, 1L),
        "mail [EMAIL] now"))
    val got = Curation.piiRedact(
        cases.map(c => (c._1, c._2)).toDF("doc_id", "text"),
        "doc_id", $"text")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    for ((id, raw, (ne, np, ni), clean) <- cases) {
      val r = got(id)
      assert((r._2, r._3, r._4) == ((ne, np, ni)),
        s"doc $id counts: got (${r._2},${r._3},${r._4}) on '$raw'")
      assert(r._6 == md5hex(clean) && r._5 == clean.length.toLong,
        s"doc $id redaction drifted from the literal expectation: '$clean'")
    }
    // convention A/B on the shared engine (one rule table, one
    // implementation — round-16 consolidation): the REPLACEMENT
    // convention counts the nested IP as 0 (already `[EMAIL]` when the
    // IP rule runs), the DETECTION convention as 1
    import graft.operators.Redact
    val ab = Seq(true, false).map { onOrig =>
      Redact.redact(Seq("mail user@10.2.30.4.com now").toDF("text"),
          $"text", Redact.curationPiiRules, countsOnOriginal = onOrig)
        .select($"n_ips").as[Long].head()
    }
    assert(ab == Seq(1L, 0L),
      s"count conventions must fork exactly on the nested pattern: $ab")
  }
}
