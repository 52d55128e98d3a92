package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // sign-LSH needs nonzero components (0 has no sign); keep dims small but ±
  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.05f, 0.05f), 0),
    (1L, Array(0.9f, 0.1f, 0.05f), 0),    // close to 0
    (2L, Array(0.05f, 1.0f, 0.05f), 1),   // near-orthogonal to 0
    (3L, Array(-1.0f, -0.05f, -0.05f), 0), // opposite of 0
    (4L, Array(0.8f, 0.2f, 0.05f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val axes = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val v = axes.select($"vec_id",
      VectorFunctions.cosine(
        VectorFunctions.toDoubleVec($"embedding"),
        array(lit(1.0), lit(0.0), lit(0.0))).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(v(0L) - 1.0) < 1e-12)
    assert(math.abs(v(2L)) < 1e-12)
    assert(math.abs(v(3L) + 1.0) < 1e-12)
  }

  test("brute-force top-k ranks by cosine, excludes self") {
    val out = Similarity.bruteForceTopK(
        vecs.filter($"vec_id" === 0), vecs.filter($"vec_id" =!= 0),
        "vec_id", "embedding", 2)
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    assert(out(0) == ((0L, 1, 1L)), "0.9/0.1 vector is nearest")
    assert(out(1) == ((0L, 2, 4L)))
  }

  test("knnClassify: majority label of neighbors wins, ties break to smaller label") {
    // query 0: neighbors ranked 1,4 (label 0), 2 (label 1), 3 (label 0)
    val pred = Similarity.knnClassify(
        vecs.filter($"vec_id" === 0), vecs.filter($"vec_id" =!= 0),
        "vec_id", "embedding", "label", 3)
      .as[(Long, Int, Long)].collect()
    assert(pred.toSeq == Seq((0L, 0, 2L)),
      s"top-3 = {1,4 (label 0), 2 (label 1)} -> label 0 with 2 votes; got ${pred.toSeq}")
    // k=2 keeps {1, 4}: unanimous label 0
    val pred2 = Similarity.knnClassify(
        vecs.filter($"vec_id" === 0), vecs.filter($"vec_id" =!= 0),
        "vec_id", "embedding", "label", 2)
      .as[(Long, Int, Long)].collect()
    assert(pred2.toSeq == Seq((0L, 0, 2L)))
  }

  test("IVF pruning restricts candidates to the query's cell") {
    val out = Similarity.ivfTopK(
        vecs.filter($"vec_id" === 0), vecs.filter($"vec_id" =!= 0),
        "vec_id", "embedding", "label", 5)
      .select($"cand_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 4L), "label-1 vector must be pruned out")
  }

  test("sign-LSH buckets separate opposite-sign vectors, keep same-sign together") {
    val pairs = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding",
        bits = 3, threshold = 0.9)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "opposite vector lands in a different sign bucket")
  }

  test("multi-table LSH lifts recall over single-table on real embeddings") {
    val e = Tables(spark, sf("sf0.001"), "embeddings")
    val truth = Similarity.bruteForceNearDupPairs(e, "vec_id", "embedding", 0.35)
      .as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    def recall(tables: Int): Double = {
      val got = Similarity.lshNearDupPairs(e, "vec_id", "embedding",
        bits = 8, threshold = 0.35, tables = tables).as[(Long, Long)].collect().toSet
      assert(got.subsetOf(truth), "exact verify must kill false positives")
      got.size.toDouble / truth.size
    }
    val r1 = recall(1)
    val r6 = recall(6)
    assert(r6 > r1, s"OR-amplification must lift recall (r1=$r1, r6=$r6)")
  }

  test("kmeansAssign recovers planted clusters and is partition-invariant") {
    // three tight planted clusters far apart; any sane Lloyd run separates them
    def jitter(base: Array[Float], eps: Float) = base.map(_ + eps)
    val rows = (0 until 30).map { i =>
      val (base, cl) = (i % 3) match {
        case 0 => (Array(10f, 0f, 0f), 0)
        case 1 => (Array(0f, 10f, 0f), 1)
        case _ => (Array(0f, 0f, 10f), 2)
      }
      (i.toLong, jitter(base, (i / 3) * 0.01f), cl)
    }
    val df = rows.toDF("vec_id", "embedding", "truth")
    val out = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 4)
      .join(df.select($"vec_id", $"truth"), "vec_id")
      .as[(Long, Int, Int)].collect()
    // every truth-cluster maps to exactly one learned cell, and vice versa
    val mapping = out.groupBy(_._3).view.mapValues(_.map(_._2).toSet).toMap
    assert(mapping.values.forall(_.size == 1),
      s"each planted cluster must land in one cell: $mapping")
    assert(mapping.values.flatten.toSet.size == 3,
      s"three planted clusters must occupy three distinct cells: $mapping")
    // determinism: a different input partitioning yields identical assignments
    val out2 = Similarity.kmeansAssign(df.repartition(7), "vec_id", "embedding",
        k = 3, iters = 4)
      .as[(Long, Int)].collect().toSet
    assert(out2 == out.map(t => (t._1, t._2)).toSet,
      "fixed-point integer k-means must be partition-invariant")
  }

  test("kmeans keeps empty cells on their previous centroid (no row loss)") {
    // k=4 over 3 planted clusters: at least one cell ends empty, yet the
    // centroid table stays at k rows and every point gets an assignment
    val df = (0 until 12).map { i =>
      val base = (i % 3) match {
        case 0 => Array(10f, 0f, 0f)
        case 1 => Array(0f, 10f, 0f)
        case _ => Array(0f, 0f, 10f)
      }
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(df, "vec_id", "embedding", k = 4, iters = 3)
    assert(cents.count() == 4, "empty cells must keep their previous centroid row")
    val assigned = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 4, iters = 3)
    assert(assigned.count() == 12, "every point must receive a cell")
  }

  test("multi-probe IVF lifts recall toward brute-force truth as nprobe grows") {
    val e = Tables(spark, sf("sf0.001"), "embeddings")
    val q = e.filter($"vec_id" < 10)
    val c = e.filter($"vec_id" >= 10)
    val truth = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 5)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    def recall(nprobe: Int): Double = {
      val got = Similarity.ivfTopKMultiProbe(q, c, e, "vec_id", "embedding",
          k = 5, kCells = 8, iters = 3, nprobe = nprobe)
        .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
      (got & truth).size.toDouble / truth.size
    }
    val r1 = recall(1)
    val r3 = recall(3)
    assert(r3 > r1,
      s"probing 3 cells must recover neighbors across cell bisectors (r1=$r1, r3=$r3)")
    assert(recall(8) == 1.0,
      "probing every cell is exhaustive search: must equal brute-force truth")
  }

  test("materialized IVF index answers exactly like the inline build") {
    val e = Tables(spark, sf("sf0.001"), "embeddings")
    val q = e.filter($"vec_id" < 10)
    val c = e.filter($"vec_id" >= 10)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    try {
      val (cents, assign) = Similarity.materializeIvfIndex(
        spark, e, s"$dir/ivf", "vec_id", "embedding", kCells = 8, iters = 3)
      def fromIndex() = Similarity.ivfTopKFromIndex(q, c, cents, assign,
          "vec_id", "embedding", k = 5, nprobe = 2)
        .as[(Long, Int, Long)].collect().sorted.toSeq
      val inline = Similarity.ivfTopKMultiProbe(q, c, e, "vec_id", "embedding",
          k = 5, kCells = 8, iters = 3, nprobe = 2)
        .as[(Long, Int, Long)].collect().sorted.toSeq
      assert(fromIndex() == inline,
        "materialization must move the build, never change an answer")
      // second call hits the materialized store (no retrain) — the
      // _SUCCESS guard makes it a pure read; answers identical
      assert(fromIndex() == inline, "re-read of the index must be stable")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("IVF-PQ ADC ranks by compressed distance with useful recall") {
    val e = Tables(spark, sf("sf0.001"), "embeddings")
    val q = e.filter($"vec_id" < 10)
    val c = e.filter($"vec_id" >= 10)
    val truth = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 5)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val adc = Similarity.ivfPqTopK(q, c, e, "vec_id", "embedding",
        k = 5, kCells = 8, coarseIters = 3, subspaces = 8, ksub = 16,
        pqIters = 2, dims = 64)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    assert(adc.size == truth.size, "every query must fill its top-5")
    // ADC's ceiling is the nprobe=1 EXACT re-rank (same trainer, same
    // cell pruning, uncompressed distances); the gate is that 32-bit
    // codes preserve most of that within-cell ranking — compression
    // noise, not chance-level scoring
    val ceiling = Similarity.ivfTopKMultiProbe(q, c, e, "vec_id", "embedding",
        k = 5, kCells = 8, iters = 3, nprobe = 1)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val adcRecall = (adc & truth).size.toDouble / truth.size
    val exactRecall = (ceiling & truth).size.toDouble / truth.size
    info(s"recall@5 vs brute force: ADC=$adcRecall, nprobe1-exact ceiling=$exactRecall")
    assert(adcRecall >= 0.5 * exactRecall,
      s"ADC must keep most of the exact within-cell recall " +
        s"(adc=$adcRecall, ceiling=$exactRecall)")
    // determinism: integer training + ADC must be partition-invariant
    val adc2 = Similarity.ivfPqTopK(q, c, e.repartition(7), "vec_id", "embedding",
        k = 5, kCells = 8, coarseIters = 3, subspaces = 8, ksub = 16,
        pqIters = 2, dims = 64)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    assert(adc2 == adc, "fixed-point IVF-PQ must be partition-invariant")
    // multi-probe composition: probing 3 cells must not lose recall vs
    // own-cell ADC (it scores a strict superset of candidates, though
    // compressed distances can reorder within the bigger pool — so >=,
    // not strict, is the guarantee; SimilaritySpec's nprobe ladder above
    // shows the strict lift for the exact re-rank)
    val adc3 = Similarity.ivfPqTopKMultiProbe(q, c, e, "vec_id", "embedding",
        k = 5, kCells = 8, coarseIters = 3, subspaces = 8, ksub = 16,
        pqIters = 2, dims = 64, nprobe = 3)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val adc3Recall = (adc3 & truth).size.toDouble / truth.size
    info(s"recall@5 vs brute force: ADC nprobe3=$adc3Recall")
    assert(adc3Recall >= adcRecall,
      s"multi-probe ADC must not lose recall (np1=$adcRecall, np3=$adc3Recall)")
  }

  test("materialized PQ index answers exactly like the train-inline build, any nprobe") {
    val e = Tables(spark, sf("sf0.001"), "embeddings")
    val q = e.filter($"vec_id" < 10)
    val c = e.filter($"vec_id" >= 10)
    val path = java.nio.file.Files.createTempDirectory("pqidx").toString + "/pq"
    val (cents, codebooks, cand) = Similarity.materializePqIndex(
      spark, c, e, path, "vec_id", "embedding", kCells = 8, coarseIters = 3,
      subspaces = 8, ksub = 16, pqIters = 2, dims = 64)
    for (np <- Seq(1, 3)) {
      val fromIdx = Similarity.ivfPqTopKFromIndex(q, cents, codebooks, cand,
          "vec_id", "embedding", k = 5, subspaces = 8, dims = 64, nprobe = np)
        .as[(Long, Int, Long)].collect().sorted
      val inline = Similarity.ivfPqTopKMultiProbe(q, c, e, "vec_id", "embedding",
          k = 5, kCells = 8, coarseIters = 3, subspaces = 8, ksub = 16,
          pqIters = 2, dims = 64, nprobe = np)
        .as[(Long, Int, Long)].collect().sorted
      assert(fromIdx.sameElements(inline),
        s"materialization must never change an answer (nprobe=$np)")
    }
    // second call is a pure read (the cand/_SUCCESS gate): rewriting the
    // tables under a served index would be the bug this pin catches
    val mtime = new java.io.File(s"$path/cand/_SUCCESS").lastModified
    Similarity.materializePqIndex(spark, c, e, path, "vec_id", "embedding",
      kCells = 8, coarseIters = 3, subspaces = 8, ksub = 16, pqIters = 2, dims = 64)
    assert(new java.io.File(s"$path/cand/_SUCCESS").lastModified == mtime,
      "an existing index must be served, not rebuilt")
  }

  test("LSH pairs are a subset of brute-force pairs at the same threshold") {
    val bf = Similarity.bruteForceNearDupPairs(vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding", 3, 0.9)
      .as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(bf), "LSH must never produce a false positive (exact verify)")
  }

  test("MMR skips the near-duplicate that pure relevance would rank second") {
    // query along x; candidates 1-2 nearly coincide ABOVE the axis,
    // candidate 3 sits BELOW it: slightly less relevant but far from
    // the already-picked 1 (a candidate equal to the query would tie
    // rel with sim for everyone and tell MMR nothing)
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = Seq(
      (1L, Array(0.90f, 0.44f)),  // most relevant, +26 deg
      (2L, Array(0.89f, 0.45f)),  // near-duplicate of 1
      (3L, Array(0.85f, -0.53f))  // -32 deg: diverse, rank 3 by rel
    ).toDF("vec_id", "embedding")
    val mmr = Similarity.mmrRerank(q, c, "vec_id", "embedding",
        topN = 3, k = 3, lambda = 0.5)
      .orderBy($"rank").collect().map(_.getAs[Long]("cand_id")).toSeq
    assert(mmr == Seq(1L, 3L, 2L), s"expected diversity pick at rank 2: $mmr")
    // λ = 1 degenerates to pure relevance order
    val rel = Similarity.mmrRerank(q, c, "vec_id", "embedding",
        topN = 3, k = 3, lambda = 1.0)
      .orderBy($"rank").collect().map(_.getAs[Long]("cand_id")).toSeq
    assert(rel == Seq(1L, 2L, 3L), s"lambda=1 must be relevance order: $rel")
  }

  test("hardNegatives returns only wrong-label candidates, cosine-ranked") {
    // query 0 (label 0): wrong-label candidates among 1-4 = only vec 2
    val out = Similarity.hardNegatives(
        vecs.filter($"vec_id" === 0), vecs.filter($"vec_id" =!= 0),
        "vec_id", "embedding", "label", 3)
      .as[(Long, Int, Long, Int)].collect().toSeq
    assert(out == Seq((0L, 1, 2L, 1)), s"only the label-1 candidate qualifies: $out")
    // query 2 (label 1): every other vector is wrong-label; ranks follow cosine
    val out2 = Similarity.hardNegatives(
        vecs.filter($"vec_id" === 2), vecs.filter($"vec_id" =!= 2),
        "vec_id", "embedding", "label", 2)
      .as[(Long, Int, Long, Int)].collect().sortBy(_._2)
    assert(out2.map(_._3).toSeq == Seq(4L, 1L),
      s"nearest wrong-label vectors by cosine: $out2")
  }

  test("semDedup keeps the min id of each near-dup group, survivors+pruned partition the ids") {
    // two tight duplicate groups + one singleton; k=1 puts everything in
    // one cell, so the pair scan sees every pair — pruning must still
    // keep exactly the lowest id per cosine-connected group
    val dup = Seq(
      (0L, Array(1.0f, 0.02f, 0.0f)),
      (1L, Array(0.99f, 0.03f, 0.0f)),   // near-dup of 0
      (2L, Array(0.02f, 1.0f, 0.0f)),
      (3L, Array(0.03f, 0.99f, 0.0f)),   // near-dup of 2
      (4L, Array(0.6f, 0.6f, 0.52f))     // distinct from both groups
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semDedupKeepers(dup, "vec_id", "embedding",
        k = 1, iters = 1, threshold = 0.99)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept === Set(0L, 2L, 4L), s"min ids + singleton survive: $kept")
    // a lower threshold prunes MORE, never less; survivors are monotone
    val keptLoose = Similarity.semDedupKeepers(dup, "vec_id", "embedding",
        k = 1, iters = 1, threshold = 0.8)
      .select($"vec_id").as[Long].collect().toSet
    assert(keptLoose.subsetOf(kept), s"looser threshold must prune a superset: $keptLoose")
    assert(keptLoose.contains(0L), "the global min id can never be pruned")
  }

  test("embScatter matches the naive BigInt scatter on raw data") {
    val data = Seq(
      (0L, Array(0.11f, -0.40f, 0.25f)),
      (1L, Array(-0.32f, 0.18f, 0.07f)),
      (2L, Array(0.44f, 0.01f, -0.29f)),
      (3L, Array(-0.05f, -0.22f, 0.31f))
    )
    val got = Similarity.embScatter(
        data.toDF("vec_id", "embedding"), "embedding", dims = 3)
      .as[(Int, Int, Long)].collect()
      .map { case (i, j, c) => (i, j) -> BigInt(c) }.toMap
    // naive reference: quantize, then n·Σxy − Σx·Σy per (i, j) in BigInt
    val q = data.map(_._2.map(v => BigInt(math.round(v.toDouble * 1000))))
    val n = BigInt(q.size)
    for (i <- 0 until 3; j <- i until 3) {
      val sxy = q.map(r => r(i) * r(j)).sum
      val want = n * sxy - q.map(_(i)).sum * q.map(_(j)).sum
      assert(got((i, j)) === want, s"scatter ($i,$j)")
    }
    assert(got.size === 6, "upper triangle only: d(d+1)/2 entries")
    // PSD diagonal: n²·var ≥ 0
    for (i <- 0 until 3) assert(got((i, i)) >= 0)
  }

  test("integer power iteration finds the dominant axis; ev_ppm is its variance share") {
    // variance concentrated on dim 0 (spread ±0.4), dims 1-2 near-constant
    val skew = Seq(
      (0L, Array(0.40f, 0.01f, -0.02f)),
      (1L, Array(-0.38f, 0.02f, 0.01f)),
      (2L, Array(0.35f, -0.01f, 0.02f)),
      (3L, Array(-0.41f, 0.02f, -0.01f)),
      (4L, Array(0.37f, 0.01f, 0.01f))
    ).toDF("vec_id", "embedding")
    val rows = Similarity.pcaTopComponent(skew, "embedding", dims = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val loadings = rows.map(_._2)
    assert(math.abs(loadings(0)) === 1000000L,
      s"dominant loading saturates the max-norm grid: ${loadings.toSeq}")
    assert(math.abs(loadings(1)) < 100000L && math.abs(loadings(2)) < 100000L,
      s"near-constant dims carry tiny loadings: ${loadings.toSeq}")
    val evPpm = rows.head._3
    assert(rows.forall(_._3 == evPpm), "ev_ppm is a single trained scalar")
    assert(evPpm > 950000L && evPpm <= 1000000L,
      s"dim-0 concentration must explain >95% of variance: $evPpm")
  }

  test("pcaBasis is orthonormal and variance-ordered; pcaProject scores it") {
    val basis = Similarity.pcaBasis(vecs, "embedding", dims = 3, k = 2)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(basis(0), basis(0)) - 1.0) < 1e-9, "PC1 unit norm")
    assert(math.abs(dot(basis(1), basis(1)) - 1.0) < 1e-9, "PC2 unit norm")
    assert(math.abs(dot(basis(0), basis(1))) < 1e-6, "PC1 ⊥ PC2")
    val scores = Similarity.pcaProject(vecs, "embedding", basis, "pc")
      .select($"pc").as[Seq[Double]].collect()
    assert(scores.forall(_.size == 2), "k scores per row")
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v1 = variance(scores.map(_(0)).toSeq)
    val v2 = variance(scores.map(_(1)).toSeq)
    assert(v1 >= v2, s"projection variance must be ordered: $v1 < $v2")
    // the deflated double basis and the integer power iteration agree on
    // the dominant direction (up to sign and the fixed-point grid)
    val intTop = Similarity.pcaTopComponent(vecs, "embedding", dims = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).map(_._2.toDouble)
    val nrm = math.sqrt(intTop.map(x => x * x).sum)
    val cosAgree = math.abs(dot(basis(0), intTop.map(_ / nrm)))
    assert(cosAgree > 0.999, s"double and integer PC1 must align: $cosAgree")
  }

  test("JL projection: deterministic signs, exact integers, distances preserved") {
    val signs = Similarity.jlSigns(4, 8)
    assert(signs.flatten.forall(s => s == 1L || s == -1L))
    assert(signs.flatten.toSeq == Similarity.jlSigns(4, 8).flatten.toSeq,
      "the sign matrix is a pure function — regeneration is bit-identical")
    // 8-dim inputs: one pair far apart, one pair close
    val data = Seq(
      (0L, Array(0.5f, 0.5f, 0.5f, 0.5f, -0.5f, -0.5f, -0.5f, -0.5f)),
      (1L, Array(0.5f, 0.5f, 0.5f, 0.4f, -0.5f, -0.5f, -0.5f, -0.4f)), // ≈ 0
      (2L, Array(-0.5f, -0.5f, -0.5f, -0.5f, 0.5f, 0.5f, 0.5f, 0.5f))  // = −0
    ).toDF("vec_id", "embedding")
    val proj = Similarity.jlProject(data, "vec_id", "embedding", k = 4, dims = 8)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(proj.keySet == Set(0L, 1L, 2L) && proj(0L).length == 4)
    // linearity is exact in the integer grid: P(−x) = −P(x)
    assert(proj(2L).toSeq == proj(0L).map(-_).toSeq,
      "projection of the negated vector is the negated projection")
    def d2(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).map { case (x, y) => val v = (x - y).toDouble; v * v }.sum
    // order preservation on a clear margin: the close pair stays closer
    // than the far pair after projection
    assert(d2(proj(0L).toSeq, proj(1L).toSeq) < d2(proj(0L).toSeq, proj(2L).toSeq),
      "JL must keep the near pair nearer than the antipodal pair")
  }

  test("JL-space distances: unbiased in aggregate, and real margins survive") {
    // The JL audit two ways (top-k overlap vs an isotropic fixture is NOT
    // the right yardstick — on data where even exact single-probe IVF
    // gets recall ~0.36, any 16-dim sketch shuffles near-ties):
    // (1) the distortion LAW: for ±1 sign rows, E[d²_jl] = k·d²_full, so
    //     the mean ratio over many fixture pairs must sit near k;
    val e = Tables(spark, sf("sf0.001"), "embeddings")
    val proj = Similarity.jlProject(e, "vec_id", "embedding", k = 16, dims = 64)
      .groupBy($"vec_id").agg(collect_list(struct($"r", $"y")).as("ys"))
      .select($"vec_id", expr("transform(array_sort(ys), p -> p.y)").as("yv"))
    val full = e.select($"vec_id",
      graft.functions.VectorFunctions.toFixedVec($"embedding", 1e3).as("xv"))
    def sq(c: org.apache.spark.sql.Column) = c * c
    val ratios = full.filter($"vec_id" < 40)
      .join(proj.withColumnRenamed("vec_id", "qid"), $"qid" === $"vec_id")
      .drop("qid")
      .withColumnRenamed("yv", "yq").withColumnRenamed("xv", "xq")
      .crossJoin(full.filter($"vec_id" >= 40 && $"vec_id" < 80)
        .withColumnRenamed("vec_id", "cid").withColumnRenamed("xv", "xc")
        .join(proj.filter($"vec_id" >= 40 && $"vec_id" < 80)
          .withColumnRenamed("vec_id", "cid2").withColumnRenamed("yv", "yc"),
          $"cid" === $"cid2").drop("cid2"))
      .select(
        aggregate(zip_with($"yq", $"yc", (a, b) => sq(a - b)), lit(0L), _ + _)
          .cast("double").as("d2jl"),
        aggregate(zip_with($"xq", $"xc", (a, b) => sq(a - b)), lit(0L), _ + _)
          .cast("double").as("d2full"))
      .filter($"d2full" > 0)
      .select(avg($"d2jl" / $"d2full").as("mean_ratio"))
      .as[Double].head()
    assert(ratios > 16 * 0.7 && ratios < 16 * 1.3,
      s"mean d2_jl/d2_full over 1600 pairs must sit near k=16: $ratios")
    // (2) margins: a planted near-duplicate must outrank far candidates
    //     in JL space — the separation ANN actually needs
    val rnd = new scala.util.Random(7)
    def vec(f: Int => Float) = Array.tabulate(64)(f)
    val base = vec(_ => rnd.nextFloat() - 0.5f)
    val planted = Seq(
      (0L, base),
      (1L, base.map(x => x + 0.01f)),              // near-dup of the query
      (2L, vec(_ => rnd.nextFloat() - 0.5f)),      // unrelated
      (3L, vec(_ => rnd.nextFloat() - 0.5f)),
      (4L, base.map(-_))                            // antipodal
    ).toDF("vec_id", "embedding")
    val pp = Similarity.jlProject(planted, "vec_id", "embedding", k = 16, dims = 64)
    val qy = pp.filter($"vec_id" === 0).select($"r", $"y".as("yq"))
    val ranked = pp.filter($"vec_id" =!= 0)
      .join(broadcast(qy), "r")
      .groupBy($"vec_id")
      .agg(sum(($"y" - $"yq") * ($"y" - $"yq")).as("d2"))
      .orderBy($"d2".asc, $"vec_id")
      .select($"vec_id").as[Long].collect()
    assert(ranked.head == 1L,
      s"the planted near-dup must rank first in JL space: ${ranked.toSeq}")
    assert(ranked.last == 4L,
      s"the antipodal vector must rank last: ${ranked.toSeq}")
  }

  test("q237 silhouette: a literal integer-loop replay reproduces the cell means") {
    // Definitional replay (the q225 pattern): the oracle mirrors the
    // SQL construction, so this recomputes everything downstream of the
    // trained centroids — quantization, all-k integer distances, the
    // (dist, cell) sort, s = (b−a)/max(a,b), the per-cell mean — with
    // plain Scala loops and asserts the query's rows.
    val dir = sf("sf0.001")
    val cents = Similarity.kmeansCentroids(
        Tables(spark, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 3)
      .select($"cell", $"cf").as[(Int, Seq[Long])].collect().sortBy(_._1)
    val pts = Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    assert(pts.length > 100 && cents.length == 8)
    val per = pts.map { case (_, v) =>
      // HALF_UP like Spark round()/DuckDB round(): math.round would
      // push negative exact halves toward +inf (self-review catch)
      val pf = v.map(x => BigDecimal(x.toDouble * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
      val ds = cents.map { case (cell, cf) =>
        var acc = 0L
        var i = 0
        while (i < pf.length) {
          val dd = pf(i) - cf(i); acc += dd * dd; i += 1
        }
        (acc, cell)
      }.sorted
      val (a, cell) = ds(0)
      val b = ds(1)._1
      val s = if (math.max(a, b) > 0) (b - a).toDouble / math.max(a, b) else 0.0
      (cell, s)
    }
    val want = per.groupBy(_._1).map { case (cell, ss) =>
      (cell, ss.length.toLong, math.rint(ss.map(_._2).sum / ss.length * 1e6) / 1e6)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.Registry.queries("q237_silhouette")(spark, dir)
      .as[(Int, Long, Double)].collect().toSeq
    got.zip(want).foreach { case ((gc, gn, gs), (wc, wn, ws)) =>
      assert(gc == wc && gn == wn, s"cell/count diverged: $got vs $want")
      assert(math.abs(gs - ws) < 2e-6, s"cell $gc mean diverged: $gs vs $ws")
    }
    assert(got.length == want.length)
  }

  // ----------------------------------------- Hamming k-NN (round-15)

  /** Deterministic chunked sketches: id-mixed 16-bit chunks, plus two
    * planted near neighbors of id 0 (distances 1 and 3) and one at 4 —
    * just outside the radius-3 recall contract. */
  private lazy val hSketch = {
    val base = (0L until 40L).map { i =>
      val m = (i * 2654435761L) % 2147483648L
      (i, (m & 0xffff).toInt, ((m >> 16) & 0x7fff).toInt,
        ((i * 104729) & 0xffff).toInt, ((i * 7919) & 0xffff).toInt)
    }
    val (q0, a, b, c0, d0) = base.head
    val planted = Seq(
      (100L, a ^ 1, b, c0, d0),         // dist 1 from id 0
      (101L, a ^ 3, b ^ 4, c0, d0),     // dist 3 from id 0
      (102L, a ^ 3, b ^ 4, c0 ^ 8, d0)) // dist 4 — outside radius 3
    (base ++ planted).toDF("id", "c0", "c1", "c2", "c3")
  }

  private def driverHamming(): Map[(Long, Long), Int] = {
    val rows = hSketch.collect().map(r => r.getLong(0) ->
      Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    (for ((qa, ca) <- rows; (qb, cb) <- rows if qa != qb)
      yield (qa, qb) -> ca.zip(cb).map { case (x, y) =>
        Integer.bitCount(x ^ y) }.sum).toMap
  }

  test("hammingTopK == driver-side exact top-k with (dist, id) tie-break") {
    val dist = driverHamming()
    val queries = hSketch.filter($"id" < 3)
    val want = (0L until 3L).flatMap { q =>
      dist.toSeq.collect { case ((`q`, c), d) => (c, d) }
        .sortBy { case (c, d) => (d, c) }.take(4).zipWithIndex
        .map { case ((c, d), i) => (q, i + 1, c, d) }
    }.toSet
    val got = Similarity.hammingTopK(queries, hSketch, "id", k = 4)
      .as[(Long, Int, Long, Int)].collect().toSet
    assert(got == want, s"got ${got.size} vs want ${want.size}")
    // the planted dist-1 neighbor must be id 0's rank-1
    assert(got.contains((0L, 1, 100L, 1)))
  }

  test("banded Hamming k-NN equals brute force within the radius (pigeonhole)") {
    val brute = Similarity.hammingTopK(hSketch.filter($"id" < 3), hSketch,
        "id", k = 4)
      .filter($"dist" <= 3)
      .as[(Long, Int, Long, Int)].collect().toSet
    val banded = Similarity.hammingTopKBanded(hSketch.filter($"id" < 3),
        hSketch, "id", k = 4, radius = 3, nBands = 4)
      .as[(Long, Int, Long, Int)].collect().toSet
    // ranks agree because (dist, cand_id) orders every <=3 candidate
    // before any >3 candidate — filtering commutes with ranking
    assert(banded == brute, s"banded $banded vs brute-within-radius $brute")
    // the dist-4 plant is OUTSIDE the radius contract and must be absent
    assert(!banded.exists(_._3 == 102L))
    // …while brute-force (no radius) does reach it
    assert(Similarity.hammingTopK(hSketch.filter($"id" === 0), hSketch,
        "id", k = 4)
      .as[(Long, Int, Long, Int)].collect().exists(_._3 == 102L))
    // radius >= nBands voids the pigeonhole guarantee — refuse loudly
    val e = intercept[IllegalArgumentException] {
      Similarity.hammingTopKBanded(hSketch, hSketch, "id", k = 4,
        radius = 4, nBands = 4)
    }
    assert(e.getMessage.contains("pigeonhole"))
    // a wide sketch bands on chunk GROUPS (round-16: any divisor) —
    // a non-divisor band count must refuse loudly
    val e2 = intercept[IllegalArgumentException] {
      Similarity.hammingTopKBanded(hSketch, hSketch, "id", k = 4,
        radius = 4, nBands = 5, nChunks = 16)
    }
    assert(e2.getMessage.contains("must divide"))
  }

  test("grouped-band Hamming k-NN: divisor banding keeps within-radius recall exact") {
    // round-16: a wide sketch banded on GROUPS of chunks (here 8
    // chunks as 4 bands of 2) trades recall range (radius < nBands)
    // for squared band-value spaces — the pigeonhole now holds per
    // GROUP, so banded == brute-within-radius must STILL be a theorem,
    // including a planted pair whose differing bits straddle two
    // chunks of the SAME group (the case chunk-per-band blocking never
    // exercises: with 8 bands it would collide on 7, with 4 grouped
    // bands the damaged group must be absorbed by the 3 clean ones)
    val base = (0L until 30L).map { i =>
      val m = i * 2654435761L
      (i, Array.tabulate(8)(j => ((m >> (j * 7)) & 0x7fff).toInt))
    }
    val h = base.head._2
    val planted = Seq(
      // dist 3, all three flipped bits inside group 0 (chunks 0 and 1)
      (200L, h.zipWithIndex.map { case (v, j) =>
        if (j == 0) v ^ 5 else if (j == 1) v ^ 2 else v }),
      // dist 4 — outside radius 3, must be absent from the banded result
      (201L, h.zipWithIndex.map { case (v, j) =>
        if (j == 0) v ^ 3 else if (j == 4) v ^ 9 else v }))
    val wide = (base ++ planted)
      .map { case (i, cs) => (i, cs(0), cs(1), cs(2), cs(3), cs(4), cs(5), cs(6), cs(7)) }
      .toDF("id", "c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7")
    val brute = Similarity.hammingTopK(wide.filter($"id" < 3), wide,
        "id", k = 4, nChunks = 8)
      .filter($"dist" <= 3)
      .as[(Long, Int, Long, Int)].collect().toSet
    val banded = Similarity.hammingTopKBanded(wide.filter($"id" < 3), wide,
        "id", k = 4, radius = 3, nBands = 4, nChunks = 8)
      .as[(Long, Int, Long, Int)].collect().toSet
    assert(banded == brute, s"grouped-banded $banded vs brute $brute")
    assert(banded.contains((0L, 1, 200L, 3)),
      s"same-group dist-3 plant must be id 0's rank-1: $banded")
    assert(!banded.exists(_._3 == 201L), "dist-4 plant is outside the radius")
  }

  test("jaccardTopK: literal scores, deterministic ties, disjoint unreachable") {
    val sets = Seq(
      (0L, Seq("a", "b", "c")),
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("c")),
      (4L, Seq("c")),            // score-ties with 2 on every query
      (9L, Seq("x", "y"))        // token-disjoint from everything
    ).toDF("id", "toks")
    val got = Similarity.jaccardTopK(sets.filter($"id" < 2), sets, "id",
        "toks", k = 3)
      .orderBy($"query_id", $"rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    // hand-computed: q0 -> 1 at 3/4, then the {c} twins at 1/3 tied,
    // broken by cand_id; q1 -> 0 at 3/4, then the twins at 1/4
    assert(got == Seq(
      (0L, 1, 1L, 0.75), (0L, 2, 2L, 0.333333), (0L, 3, 4L, 0.333333),
      (1L, 1, 0L, 0.75), (1L, 2, 2L, 0.25), (1L, 3, 4L, 0.25)),
      s"literal top-k diverged: $got")
    // the disjoint doc is UNREACHABLE — the inverted-index contract:
    // no token collision, no candidate row, never a 0-scored filler
    assert(!got.exists(_._3 == 9L))
    val e = intercept[IllegalArgumentException] {
      Similarity.jaccardTopK(sets, sets, "id", "toks", k = 0)
    }
    assert(e.getMessage.contains("k must be >= 1"))
  }
}
