package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosineTopK: 5 ranked neighbors per query, cosine in [-1, 1]") {
    val rows = Similarity.cosineTopK(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq === (1 to rs.length))
      assert(rs.length <= Similarity.K)
      // ranks are ordered by decreasing cosine
      val sims = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cosine"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      sims.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    }
  }

  test("SimConfig knobs: k truncates consistently; fewer planes never lose candidates") {
    import graft.similarity.SimConfig
    // k is a pure truncation of the same ranking: top-3 == top-5 ∩ rk<=3
    val k5 = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rk"), r.getLong(1))).toSet
    val k3 = Similarity.cosineTopK(spark, sfDir, SimConfig(k = 3)).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rk"), r.getLong(1))).toSet
    assert(k3 === k5.filter(_._2 <= 3))
    // plane p is key-derived per index, so a 4-plane bucket id is a PREFIX
    // of the 8-plane id: coarser buckets are supersets, and the best hit
    // per query under 4 planes is at least as good as under 8
    val best8 = Similarity.annLsh(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getAs[Double]("cosine")).max }
    val best4 = Similarity.annLsh(spark, sfDir, SimConfig(numPlanes = 4)).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getAs[Double]("cosine")).max }
    best8.foreach { case (q, b8) => assert(best4(q) >= b8 - 1e-9, s"query $q") }
  }

  test("SimConfig at 16 planes: bucket ids extend the 8-plane ids, hits stay exact-cosine") {
    import graft.similarity.SimConfig
    import org.apache.spark.sql.types._
    // the at-scale setting (finer buckets -> fewer candidates per bucket):
    // plane p is key-derived per index, so every 8-plane bucket id must be
    // a strict prefix of the 16-plane id
    val e = col("embedding").cast(ArrayType(DoubleType))
    val both = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(Similarity.bucket(e).as("b8"),
        Similarity.bucket(e, SimConfig(numPlanes = 16)).as("b16"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getString(1).startsWith(r.getString(0)) &&
      r.getString(1).length == 16 && r.getString(0).length == 8))
    // ANN under 16 planes still reports EXACT cosines: every hit matches
    // the brute-force value for that (query, neighbor) pair
    val exact = Similarity.cosineTopK(spark, sfDir, SimConfig(k = 1999))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cosine")).toMap
    val hits16 = Similarity.annLsh(spark, sfDir, SimConfig(numPlanes = 16))
      .collect()
    hits16.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(math.abs(r.getAs[Double]("cosine") - exact(key)) < 1e-9, key)
    }
    // finer buckets can only shrink each query's candidate set: the best
    // 16-plane hit never beats the best 8-plane hit
    val best8 = Similarity.annLsh(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getAs[Double]("cosine")).max }
    hits16.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val b16 = rs.map(_.getAs[Double]("cosine")).max
      assert(b16 <= best8(q) + 1e-9, s"query $q")
    }
  }

  test("annLsh: every ANN hit is at most the brute-force best for its query") {
    val bf = Similarity.cosineTopK(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getAs[Double]("cosine")).max }
    val ann = Similarity.annLsh(spark, sfDir).collect()
    ann.foreach { r =>
      assert(r.getAs[Double]("cosine") <= bf(r.getLong(0)) + 1e-9)
    }
  }

  test("embedNearDup finds exactly the injected cosine-identical copies") {
    val pairs = Similarity.embedNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cosine")))
    val expected = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 25 === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(pairs.map(_._1).toSet === expected)
    pairs.foreach { case (a, b, c) =>
      assert(b === a + Similarity.VariantVecOffset)
      assert(c >= 0.9999)
    }
  }

  test("q164 crossSplitLeakage: scaled train copies flagged, reversed clean") {
    val rows = Similarity.crossSplitLeakage(spark, sfDir).collect()
    val off = Similarity.VariantVecOffset
    // expected leaks: scaled copies whose BASE vector is in the train
    // split (md5-bucket < 80) — reversed copies are decorrelated => clean
    import org.apache.spark.sql.functions._
    val expected = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 25 === 0 &&
        pmod(graft.functions.TextPrims.hex60C(
          md5(col("vec_id").cast("string"))), lit(100L)) < 80)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === expected.map(_ + off))
    rows.foreach { r =>
      assert(r.getLong(0) < 2 * off, s"reversed (clean) vector flagged: $r")
      assert(r.getLong(1) === r.getLong(0) - off) // best match is the base
      assert(r.getAs[Double]("cosine") === 1.0)
      assert(r.getAs[Int]("n_matches") === 1)
    }
  }

  test("q181 semDedup: exactly the planted variants prune, earliest exemplar survives") {
    val off = Similarity.VariantVecOffset
    val rows = Similarity.semDedup(spark, sfDir).collect()
    val base = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // every planted variant (both scale families) is pruned; nothing else
    val expected = base.filter(_ % 10 == 0).map(_ + off) ++
      base.filter(_ % 15 == 0).map(_ + 2 * off)
    assert(rows.map(_.getLong(0)).toSet === expected)
    rows.foreach { r =>
      val (pruned, kept) = (r.getLong(0), r.getAs[Long]("kept_id"))
      // the surviving exemplar is the (earlier) base vector of the clique
      assert(kept === pruned % off, s"kept_id not the base: $r")
      assert(r.getAs[Double]("cosine") === 1.0)
    }
    // no base (original-corpus) vector is ever pruned
    assert(rows.forall(_.getLong(0) >= off))
  }

  test("q181 hot-cell guard: an adversarial single cluster splits under " +
      "the bound; planted answer survives an active guard") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // adversarial fixture: EVERY vector forced into one cluster
    val one = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("e"))
      .withColumn("cluster", lit(0).cast(IntegerType))
    val n = one.count()
    val maxCell = 100
    val sizes = graft.similarity.Similarity.subQuantize(one, maxCell)
      .groupBy("cell").count().collect().map(_.getLong(1))
    // spread vectors split near-evenly under sign-LSH: no compare group
    // may stay quadratic — bound with 2x slack for hash unevenness
    assert(sizes.length > 1 && sizes.sum === n)
    assert(sizes.max <= 2L * maxCell, sizes.sorted.reverse.take(5).toSeq)
    // inert path: a bound above every cell keeps cell == cluster key
    val inert = graft.similarity.Similarity
      .subQuantize(one, maxCell = Int.MaxValue)
      .select((col("cell") === col("cluster").cast(LongType) * (1L << 17))
        .as("ok")).collect()
    assert(inert.forall(_.getBoolean(0)))
    // ACTIVE guard on the real q181 pipeline: planted variants are exact
    // scalar multiples, so every hyperplane sign agrees and no planted
    // pair can split — the q181 answer is invariant under the guard
    val off = graft.similarity.Similarity.VariantVecOffset
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val guarded = graft.similarity.Similarity
      .semDedupBounded(spark, sfDir, threshold = 0.999, maxCell = 50)
      .collect().map(key).toSeq
    val standard = graft.similarity.Similarity.semDedup(spark, sfDir)
      .collect().map(key).toSeq
    assert(guarded.map(r => (r._1, r._3, r._4)) ===
      standard.map(r => (r._1, r._3, r._4)))
    assert(guarded.forall(r => r._3 === r._1 % off))
  }

  test("q296 hot-cell guard: census invariants under an adversarial " +
      "bound; default bound is the unguarded census") {
    val std = Similarity.labelNoiseCensus(spark, sfDir).collect()
    val bounded = Similarity
      .labelNoiseCensusBounded(spark, sfDir, maxCell = 8).collect()
    // same label axis and totals: the guard re-keys compare groups,
    // never adds or drops vectors
    assert(bounded.map(_.getInt(0)).toSeq === std.map(_.getInt(0)).toSeq)
    assert(bounded.map(_.getLong(1)).toSeq === std.map(_.getLong(1)).toSeq)
    val stdCov = std.map(r => r.getInt(0) -> r.getLong(2)).toMap
    bounded.foreach { r =>
      val (lbl, total, cov, agree) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      // splitting a cell can only REMOVE neighbor candidates
      assert(cov <= stdCov(lbl), s"label $lbl coverage grew: $r")
      assert(agree <= cov && cov <= total, s"census invariant broke: $r")
    }
    // the guard actually engaged: with maxCell=8 on fixture-scale
    // cells, at least one vector lost its in-cell neighbor pool
    assert(bounded.map(_.getLong(2)).sum < std.map(_.getLong(2)).sum)
  }

  test("q300 scatter-gather top-k equals the single-scan answer at " +
      "every shard fan-in") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
    val global = Similarity.cosineTopK(spark, sfDir).collect().map(key)
    // the lemma holds for ANY fan-in; 3 and 8 exercise non-divisor
    // and divisor shard counts
    Seq(3, 8).foreach { s =>
      val sg = Similarity.scatterGatherTopK(spark, sfDir, shards = s)
        .collect().map(key)
      assert(sg.toSeq === global.toSeq, s"fan-in $s diverged")
    }
  }

  test("q305 filtered ANN: post-filter survivors are a subset of the " +
      "filtered top-k, and the filtered path always fills first") {
    val rows = Similarity.annFiltered(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (nm, np, ns, nc) = (r.getAs[Long]("n_matching"),
        r.getAs[Long]("n_pre"), r.getAs[Long]("n_post"),
        r.getAs[Long]("n_common"))
      // filter-then-rank fills to min(K, matching candidates)
      assert(np === math.min(Similarity.K.toLong, nm), r.toString)
      // a matching candidate in the global top-k is a fortiori among
      // the k best matching candidates: post ⊆ pre, so common == post
      assert(nc === ns, r.toString)
      assert(ns <= np, r.toString)
      if (np > 0) // recall is 6-dp rounded in the output
        assert(math.abs(r.getAs[Double]("recall_post") -
          nc.toDouble / np.toDouble) < 5e-7, r.toString)
    }
  }

  test("q311 filter-aware expansion: budget met or cells exhausted, " +
      "expansion dominates the home cell") {
    val rows = Similarity.annFilterExpand(spark, sfDir).collect()
    assert(rows.length === 10)
    val k = Similarity.K.toLong
    val nCells = graft.ml.LloydExact.K
    rows.foreach { r =>
      val np = r.getAs[Int]("n_probe")
      val covered = r.getAs[Long]("n_match_probed")
      val total = r.getAs[Long]("n_match_total")
      assert(np >= 1 && np <= nCells, r.toString)
      // the expansion rule: either the probed prefix covers the k
      // candidate budget, or it ran out of cells (probed everything)
      assert(covered >= math.min(k, total) || np === nCells, r.toString)
      assert(covered <= total, r.toString)
      // exact filtered top-k fills to min(k, matching candidates)
      assert(r.getAs[Long]("n_exact") === math.min(k, total), r.toString)
      // domination: probed ⊇ home cell, and an exact member surviving
      // the home top-k a fortiori survives the expanded top-k
      if (total > 0)
        assert(r.getAs[Double]("recall_expand") >=
          r.getAs[Double]("recall_home"), r.toString)
    }
    // at 64 tenants over this fixture the predicate is selective
    // enough that the dynamics are real: some query must expand past
    // its home cell, and expansion must actually buy recall somewhere
    assert(rows.exists(_.getAs[Int]("n_probe") > 1))
    assert(rows.exists(r => r.getAs[Double]("recall_expand") >
      r.getAs[Double]("recall_home")))
  }

  test("q314 multi-probe LSH: flip-1 probes dominate the home bucket " +
      "in candidates and recall") {
    val rows = Similarity.multiProbeLsh(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (ch, cm) = (r.getAs[Long]("n_cand_home"),
        r.getAs[Long]("n_cand_multi"))
      // the multi-probe candidate set contains the home bucket's
      assert(cm >= ch, r.toString)
      val (rh, rm) = (r.getAs[Double]("recall_home"),
        r.getAs[Double]("recall_multi"))
      assert(rm >= rh, r.toString)
      assert(rh >= 0.0 && rm <= 1.0, r.toString)
    }
    // the knob is real on this fixture: flips add candidates somewhere
    assert(rows.exists(r => r.getAs[Long]("n_cand_multi") >
      r.getAs[Long]("n_cand_home")))
  }

  test("q236 nprobe sweep: recall monotone, exact at full probe width") {
    val rows = Similarity.ivfNprobeSweep(spark, sfDir).collect()
    val n = graft.sources.Tables.load(spark, sfDir, "embeddings").count()
    val k = graft.ml.LloydExact.K
    assert(rows.length === 10 * k)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val byW = rs.sortBy(_.getAs[Int]("nprobe"))
      val recalls = byW.map(_.getAs[Double]("recall_at_k"))
      val scanned = byW.map(_.getAs[Int]("n_scanned"))
      // wider probes can only add candidates: both curves nondecreasing
      assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
        s"q$qid recall ${recalls.toSeq}")
      assert(scanned.zip(scanned.tail).forall { case (a, b) => b >= a },
        s"q$qid scanned ${scanned.toSeq}")
      // probing EVERY cell is the exact scan: recall 1.0, corpus covered
      assert(recalls.last === 1.0, s"q$qid ${recalls.toSeq}")
      assert(scanned.last === n - 1, s"q$qid ${scanned.toSeq}")
    }
  }

  test("q166 diverseSelect: greedy max-min invariants hold") {
    val rows = Similarity.diverseSelect(spark, sfDir, k = 8).collect()
    assert(rows.length === 8)
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length === 8)
    // seed is the min vec_id; its dist is undefined
    assert(ids.head === 0L && rows.head.isNullAt(2))
    // greedy max-min: each pick's distance-to-selected is nonincreasing
    val ds = rows.tail.map(_.getDouble(2))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, ds.toSeq.toString)
    assert(ds.forall(_ > 0))
  }

  test("q170 persisted IVF answers exactly what the fresh-built index does") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
    val fresh = Similarity.annIvf(spark, sfDir).collect().map(key).toSeq
    val loaded = Similarity.annIvfPersisted(spark, sfDir)
      .collect().map(key).toSeq
    assert(loaded === fresh)
  }

  test("q171 SQ8 re-rank: exact cosines, high recall vs brute force") {
    val sq = Similarity.annSq8(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val bf = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // re-ranked cosines are EXACT: any (query, neighbor) both sides agree
    // on carries the identical full-precision score
    val common = sq.keySet.intersect(bf.keySet)
    assert(common.nonEmpty)
    common.foreach(k => assert(sq(k) === bf(k), k.toString))
    // int8 quantization preserves most of the ranking: mean recall@5
    val recall = common.size.toDouble / bf.size
    assert(recall >= 0.8, s"SQ8 recall@5 $recall")
  }

  test("q177 tuning sweep: candidate sets shrink monotonically in planes") {
    val rows = Similarity.annTuningSweep(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getAs[Int]("n_candidates"), r.getAs[Int]("n_hits"))).toMap
    val qs = rows.keys.map(_._2).toSet
    // the plane-prefix property: an n-plane bucket REFINES the (n-m)-plane
    // bucket, so per query candidates (and hence hits) can only shrink as
    // planes are added
    for (q <- qs; Seq(a, b) <- Similarity.TuningPlaneCounts.sliding(2)) {
      assert(rows((a, q))._1 >= rows((b, q))._1, s"candidates grew: q$q $a->$b")
      assert(rows((a, q))._2 >= rows((b, q))._2, s"hits grew: q$q $a->$b")
    }
  }

  test("knnClassify: one prediction per test vector, labels in domain") {
    val res = Similarity.knnClassify(spark, sfDir).collect()
    val nTest = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 7 === 0).count()
    assert(res.length === nTest)
    res.foreach(r => assert((0 until 10).contains(r.getAs[Int]("pred_label"))))
  }

  test("annIvf neighbors are a (recall<1) subset consistent with brute force") {
    // every IVF hit must carry the true cosine (no approximation of the
    // METRIC, only of the candidate set), and per query the k-th IVF
    // neighbor can never beat the brute-force k-th
    val bf = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rk")) -> r.getAs[Double]("cosine"))
      .toMap
    val ivf = Similarity.annIvf(spark, sfDir).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val q = r.getLong(0); val rk = r.getAs[Int]("rk")
      assert(r.getAs[Double]("cosine") <= bf((q, rk)) + 1e-9)
    }
  }

  test("q141 centroid outliers: k per label, distance-ranked, true outliers") {
    val k = 5
    val rows = Similarity.centroidOutliers(spark, sfDir, k).collect()
    assert(rows.nonEmpty)
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    val nVecs = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    byLabel.foreach { case (label, rs) =>
      // ranks are 1..min(k, label size), distances non-increasing
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq ===
        (1 to math.min(k.toLong, nVecs(label)).toInt))
      val ds = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("dist"))
      ds.sliding(2).foreach {
        case Array(a, b) => assert(a >= b - 1e-9)
        case _ =>
      }
      // an outlier is genuinely far: every ranked distance must exceed
      // the label's mean distance would be weaker — assert positive and
      // strictly above zero (identical vectors can't all be outliers)
      assert(ds.head > 0.0)
    }
  }

  test("q199 retrieval agreement: every query scored, overlap bounded by k") {
    val rows = graft.similarity.Similarity.retrievalAgreement(spark, sfDir)
      .collect()
    assert(rows.length === 10)
    assert(rows.map(_.getLong(0)).toSet === (0L until 10L).toSet)
    rows.foreach { r =>
      val nc = r.getAs[Int]("n_common")
      assert(nc >= 0 && nc <= 10)
      assert(math.abs(r.getAs[Double]("overlap_at_k") - nc / 10.0) < 1e-9)
    }
    // deterministic: a second run reproduces the exact agreement vector
    val again = graft.similarity.Similarity.retrievalAgreement(spark, sfDir)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getAs[Int]("n_common"))).toSeq ===
      again.map(r => (r.getLong(0), r.getAs[Int]("n_common"))).toSeq)
  }

  test("q230 RRF: both-system hits outrank single-system, scores exact") {
    val rows = graft.similarity.Similarity.rrfFusion(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq === (1 to sorted.length))
      // scores strictly ordered with the id tie-break
      sorted.sliding(2).foreach { case Array(a, b) =>
        val (sa, sb) = (a.getAs[Double]("rrf_score"),
          b.getAs[Double]("rrf_score"))
        assert(sa > sb || (sa == sb && a.getLong(1) < b.getLong(1)), s"q$q")
      case _ => ()
      }
      // any result found by BOTH systems must outrank any single-system
      // result found at the worst rank (1/61+1/70 > 1/61): check the
      // score algebra directly instead
      rs.foreach { r =>
        val ns = r.getAs[Int]("n_systems")
        assert(ns === 1 || ns === 2)
        val score = r.getAs[Double]("rrf_score")
        // bounds: one system at rank 10 .. two systems at rank 1
        assert(score >= 1.0 / 70 - 1e-9 && score <= 2.0 / 61 + 1e-9)
      }
    }
  }

  test("q231 nDCG: bounded by 1, idcg >= dcg, ideal ordering achieves 1") {
    val rows = graft.similarity.Similarity.ndcgLexical(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (dcg, idcg) = (r.getAs[Double]("dcg"), r.getAs[Double]("idcg"))
      assert(idcg >= dcg - 1e-9, r.toString)
      if (!r.isNullAt(4)) {
        val ndcg = r.getAs[Double]("ndcg")
        assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      }
      assert(r.getAs[Int]("n") <= 10)
    }
  }

  test("q217 JL: unbiased scale — distortions in the predicted sqrt(1/k) regime") {
    val rows = graft.similarity.Similarity.jlDistortion(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (mean, mx) = (r.getAs[Double]("mean_distortion"),
        r.getAs[Double]("max_distortion"))
      assert(mean >= 0.0 && mx >= mean)
      // the calibration claim: E[rel] ~ sqrt(2/k) ≈ 0.35 for k=16.
      // A mis-scaled projection (the Var(entry) bug class) lands at
      // 20+ — this bound is what catches it
      assert(mean < 1.0, s"q${r.getLong(0)} mean $mean")
      assert(mean > 0.01, s"q${r.getLong(0)} mean $mean")
    }
  }

  test("q262 tombstones: no deleted neighbor leaks, untouched queries " +
      "identical to q170, prefixes shared up to the first eviction") {
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
      r.getInt(2), r.getDouble(3))
    val live = graft.similarity.Similarity.annIvfPersisted(spark, sfDir)
      .collect().map(key).groupBy(_._1)
    val tomb = graft.similarity.Similarity.annIvfTombstones(spark, sfDir)
      .collect().map(key).groupBy(_._1)
    assert(tomb.keySet === live.keySet)
    tomb.values.flatten.foreach { case (_, n, _, _) =>
      assert(!(n % 10 == 3 && n >= 10), s"deleted neighbor $n leaked")
    }
    live.foreach { case (qid, l) =>
      val t = tomb(qid)
      val firstDeleted = l.indexWhere { case (_, n, _, _) =>
        n % 10 == 3 && n >= 10 }
      if (firstDeleted < 0) {
        // no tombstoned neighbor in the live top-5: rows must be
        // IDENTICAL (deletion of non-neighbors cannot perturb ranks)
        assert(t.toSeq === l.toSeq, s"query $qid")
      } else {
        // the prefix before the first eviction survives verbatim
        assert(t.toSeq.take(firstDeleted) === l.toSeq.take(firstDeleted),
          s"query $qid")
      }
    }
    // the fixture's id plane guarantees at least one eviction happens
    assert(live.values.exists(_.exists { case (_, n, _, _) =>
      n % 10 == 3 && n >= 10 }))
  }

  test("q271 MMR: picks distinct, first pick is the relevance argmax " +
      "with zero penalty, greedy scores are non-increasing") {
    val rows = graft.similarity.Similarity.mmrRerank(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("rk"))
    assert(rows.length === graft.similarity.Similarity.MmrK)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length === ids.length)
    assert(rows.head.getAs[Double]("max_sim") === 0.0)
    // pick 1 maximizes raw relevance (score = 0.5*rel, ms = 0)
    assert(rows.head.getAs[Double]("rel") ===
      rows.map(_.getAs[Double]("rel")).max)
    // from rank 2 on, each candidate's penalty max-grows with the
    // picked set, so the greedy maxima are non-increasing (rank 1 is
    // excluded: its ms = 0 convention is not the max-over-empty limit,
    // and a negative best cosine can push rank 2's score above it)
    val scores = rows.tail.map(_.getAs[Double]("mmr_score"))
    scores.zip(scores.tail).foreach { case (a, b) =>
      assert(b <= a + 1e-9, s"scores not monotone: $a then $b")
    }
    // later picks carry a real redundancy penalty measurement
    assert(rows.tail.forall(r => r.getAs[Double]("max_sim") >= -1.0 &&
      r.getAs[Double]("max_sim") <= 1.0))
  }

  test("q275 hard negatives: one row per query, cosines bounded, margin " +
      "is the pos-neg difference") {
    val rows = graft.similarity.Similarity.hardNegatives(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSet.size === rows.length)
    rows.foreach { r =>
      val hn = r.getAs[Double]("hard_neg_sim")
      val hp = r.getAs[Double]("hard_pos_sim")
      assert(hn >= -1.0 - 1e-9 && hn <= 1.0 + 1e-9)
      assert(hp >= -1.0 - 1e-9 && hp <= 1.0 + 1e-9)
      assert(math.abs(r.getAs[Double]("margin") - (hp - hn)) < 2e-6)
      assert(r.getAs[Long]("hard_neg_id") !== r.getAs[Long]("query_id"))
      assert(r.getAs[Long]("hard_pos_id") !== r.getAs[Long]("query_id"))
    }
  }

  test("q277 IVF upsert: inserted copies surface in the probe; every " +
      "visible insert carries its source's cosine") {
    // sf0.01: the smallest fixture where an inserted copy actually
    // ranks into a top-k (at sf0.001 no source is close enough to any
    // query for its copy to surface — the visibility assertion would
    // be vacuous there)
    val rows = graft.similarity.Similarity
      .annIvfUpsert(spark, "/root/testdata/sf0.01").collect()
    val off = graft.similarity.Similarity.UpsertOffset
    val inserted = rows.filter(_.getAs[Long]("neighbor_id") >= off)
    // exact copies of in-corpus vectors MUST reach some top-k — a probe
    // that ignored the appended generation would have none
    assert(inserted.nonEmpty, "no inserted vector surfaced in any top-k")
    // an inserted copy is bit-identical to its source, so whenever BOTH
    // are in one query's list their cosines agree exactly
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    inserted.foreach { r =>
      val src = r.getAs[Long]("neighbor_id") - off
      byQuery(r.getAs[Long]("query_id"))
        .find(_.getAs[Long]("neighbor_id") == src)
        .foreach { s0 =>
          assert(s0.getAs[Double]("cosine") === r.getAs[Double]("cosine"))
        }
    }
  }

  test("q280 stratified split: per-label shares sum to 1, every vector " +
      "routed exactly once") {
    val rows = graft.similarity.Similarity.stratifiedSplit(spark, sfDir)
      .collect()
    val total = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    rows.groupBy(_.getAs[Int]("label")).values.foreach { rs =>
      assert(math.abs(rs.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
      assert(rs.map(_.getAs[String]("split")).toSet
        .subsetOf(Set("train", "val", "test")))
      // the 8/1/1 routing puts the bulk in train for any non-tiny label
      val m = rs.map(r => r.getAs[String]("split") ->
        r.getAs[Long]("n")).toMap
      if (m.values.sum >= 30)
        assert(m.getOrElse("train", 0L) > m.getOrElse("val", 0L) &&
          m.getOrElse("train", 0L) > m.getOrElse("test", 0L))
    }
  }

  test("q285 matryoshka: full width recalls 1.0, recall non-decreasing " +
      "in the prefix width") {
    val rows = graft.similarity.Similarity.matryoshkaRecall(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("dims"))
    assert(rows.map(_.getAs[Int]("dims")).toSeq ===
      graft.similarity.Similarity.MatryoshkaDims)
    assert(rows.last.getAs[Double]("recall") === 1.0)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // monotonicity is EXPECTED for nested prefixes but not a theorem;
    // assert the weak version that catches sign/slice bugs: the widest
    // truncation is at least as good as the narrowest
    assert(rows.last.getAs[Double]("recall") >=
      rows.head.getAs[Double]("recall"))
  }

  test("q286 sign hamming: distances within [0, 64], band ordered, " +
      "overlap bounded by k") {
    val rows = graft.similarity.Similarity.signHammingSearch(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("best_hamming")
      val w = r.getAs[Long]("worst_hamming")
      assert(b >= 0 && w <= 64 && b <= w, r.toString)
      val k = graft.similarity.Similarity.K
      val c = r.getAs[Long]("n_common")
      assert(c >= 0 && c <= k)
      assert(math.abs(r.getAs[Double]("recall") - c.toDouble / k) < 1e-9)
    }
  }

  test("q293 anisotropy: uniform-ish fixture reads isotropic — low pair " +
      "cosine, low center-norm ratio, sane norm stats") {
    val r = graft.similarity.Similarity.anisotropyReport(spark, sfDir)
      .collect()(0)
    assert(r.getAs[Long]("n_pairs") === r.getAs[Long]("n") - 7)
    val pc = r.getAs[Double]("mean_pair_cos")
    assert(pc >= -1.0 && pc <= 1.0)
    // hash-uniform vectors in [-0.5, 0.5)^64: mean pair cosine and the
    // center-norm ratio both sit near zero — a collapsed space would
    // push both toward 1 (the failure this report exists to catch)
    assert(math.abs(pc) < 0.2, s"pair cosine $pc")
    assert(r.getAs[Double]("center_norm_ratio") < 0.3)
    assert(r.getAs[Double]("mean_norm") > 0.0)
    assert(r.getAs[Double]("norm_cv") >= 0.0 &&
      r.getAs[Double]("norm_cv") < 1.0)
  }

  test("q296 label noise: counts nest, totals cover the corpus, rates " +
      "bounded") {
    val rows = graft.similarity.Similarity.labelNoiseCensus(spark, sfDir)
      .collect()
    val total = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .count()
    assert(rows.map(_.getAs[Long]("n_total")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_agree") <= r.getAs[Long]("n_covered"))
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_total"))
      if (!r.isNullAt(r.fieldIndex("agree_rate"))) {
        val a = r.getAs[Double]("agree_rate")
        assert(a >= 0.0 && a <= 1.0)
      }
    }
  }

  test("q331 energy distance: non-negative everywhere, and one pair " +
      "brute-forced from raw embeddings") {
    import org.apache.spark.sql.functions._
    val rows = graft.similarity.Similarity.energyDistance(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("energy") >= -1e-9,
        s"negative energy at (${r.get(0)},${r.get(1)})")
      assert(r.getAs[Double]("cross_mean") > 0)
    }
    // brute-force the (0,1) pair: same sample rule, plain Scala math
    val per = 64
    val sm = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("label"), col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).map { case (l, vs) =>
        l -> vs.sortBy(_._2).take(per).map(_._3) }
    def d(x: Array[Double], y: Array[Double]): Double = {
      def dot(a: Array[Double], b: Array[Double]) = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      BigDecimal(math.sqrt(math.max(dot(x, x) - 2.0 * dot(x, y) +
        dot(y, y), 0.0))).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    def meanAll(xs: Array[Array[Double]], ys: Array[Array[Double]]) =
      (for (x <- xs; y <- ys) yield d(x, y)).sum / (xs.length * ys.length)
    val (x0, x1) = (sm(0), sm(1))
    val want = 2.0 * meanAll(x0, x1) - meanAll(x0, x0) - meanAll(x1, x1)
    val got = rows.find(r => r.getAs[Int]("label_a") == 0 &&
      r.getAs[Int]("label_b") == 1).get.getAs[Double]("energy")
    assert(math.abs(got - want) < 1e-5, s"got $got want $want")
  }

  test("q328 RBO: brute-forced prefix overlaps and truncated sum agree; " +
      "monotone in depth and bounded by the identical-ranking ceiling") {
    import org.apache.spark.sql.functions._
    val S = graft.similarity.Similarity
    val (p, depth) = (0.9, 50)
    val rows = S.rboRankings(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("d"), r.getAs[Long]("overlap"),
        r.getAs[Double]("rbo")))
    // brute force: collect the two orderings, overlap per depth, sum
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"),
        graft.functions.TextPrims.bpeTokensC(col("text")).cast("long")
          .as("toks"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byChars = docs.sortBy(d => (-d._2, d._1)).map(_._1).take(depth)
    val byToks = docs.sortBy(d => (-d._3, d._1)).map(_._1).take(depth)
    val w = S.rboWeights(p, depth)
    def xAt(e: Int): Int = (byChars.take(e).toSet &
      byToks.take(e).toSet).size
    val rboAt = (1 to depth).scanLeft(0.0) { (acc, e) =>
      acc + BigDecimal(xAt(e).toDouble / e * w(e - 1))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.tail.map(s => (1.0 - p) * s)
    rows.foreach { case (d, x, rbo) =>
      assert(x === xAt(d).toLong, s"overlap@$d")
      assert(math.abs(rbo - rboAt(d - 1)) < 1e-5, s"rbo@$d")
      // identical rankings would give exactly 1 − p^d — the ceiling
      assert(rbo <= 1.0 - math.pow(p, d) + 1e-9)
    }
    // monotone in depth
    rows.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(b >= a); case _ => ()
    }
  }
}
