package graft

import graft.ml._
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import scala.util.Random

class MlSpec extends SparkSpec {

  /** 3 well-separated gaussian blobs in 4-d, deterministic. */
  private lazy val blobs = {
    val rnd = new Random(42)
    val centers = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(10.0, 10.0, 0.0, 0.0),
      Seq(0.0, 10.0, 10.0, 10.0))
    val rows = for {
      (c, label) <- centers.zipWithIndex
      _ <- 0 until 60
    } yield (label.toDouble, Vectors.dense(c.map(_ + rnd.nextGaussian() * 0.5).toArray))
    import spark.implicits._
    rows.toDF("label", "features")
  }

  test("q371 exact elbow: one row per k, exactly one argmax-silhouette " +
      "best, silhouettes bounded, WSSSE positive and non-increasing") {
    val rows = LloydExact.elbowExact(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === LloydExact.ElbowKs)
    assert(rows.map(_.getInt(3)).sum === 1, "exactly one is_best row")
    assert(rows.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
    val w = rows.map(_.getDouble(1)).toSeq
    assert(w.forall(_ > 0))
    assert(w.zip(w.tail).forall { case (a, b) => b <= a },
      s"WSSSE should not increase with k under deterministic init: $w")
    // the flagged row IS the argmax (ties toward smaller k)
    val best = rows.filter(_.getInt(3) === 1).head
    assert(rows.forall(r => r.getDouble(2) < best.getDouble(2) ||
      (r.getDouble(2) == best.getDouble(2) && r.getInt(0) >= best.getInt(0))))
  }

  test("KMeans elbow picks k=3 on 3 separable blobs") {
    val pts = KMeansJob.elbow(blobs, 2 to 5, maxIter = 20)
    assert(pts.map(_.k) === (2 to 5))
    assert(KMeansJob.bestK(pts) === 3)
    // WSSSE decreases monotonically in k
    assert(pts.map(_.wssse).zip(pts.tail.map(_.wssse)).forall { case (a, b) => b <= a })
  }

  test("KMeans elbow on an evaluation subsample selects the same k") {
    // the scale configuration q38 runs (silhouette on a seeded sample —
    // nb cell 48's 200K-sample trick): WSSSE is identical to the full
    // sweep (fits are untouched; only evaluation is sampled) and the
    // k-selection must be stable
    val full = KMeansJob.elbow(blobs, 2 to 5, maxIter = 20)
    val sampled = KMeansJob.elbow(blobs, 2 to 5, maxIter = 20,
      evalFraction = 0.5)
    assert(sampled.map(_.k) === (2 to 5))
    // same seeds + same data ⇒ same models ⇒ same WSSSE (up to MLlib's
    // run-to-run partial-aggregation order, which jitters the last ULP)
    sampled.map(_.wssse).zip(full.map(_.wssse)).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(a, b), s"$a vs $b")
    }
    assert(KMeansJob.bestK(sampled) === KMeansJob.bestK(full))
    assert(KMeansJob.bestK(sampled) === 3)
    // sampled silhouettes stay within a loose band of the full scores
    sampled.zip(full).foreach { case (sa, fu) =>
      assert(math.abs(sa.silhouette - fu.silhouette) < 0.25,
        s"k=${sa.k}: sampled ${sa.silhouette} vs full ${fu.silhouette}")
    }
  }

  test("KMeans clusterStats: one row per cluster with exact total count") {
    val model = KMeansJob.fit(blobs, 3)
    val stats = KMeansJob.clusterStats(model.transform(blobs), Seq("label")).collect()
    assert(stats.length === 3)
    assert(stats.map(_.getAs[Long]("count")).sum === 180L)
    assert(KMeansJob.centers(spark, model).count() === 3)
  }

  test("RandomForest separates the blobs (accuracy > 0.95)") {
    val Array(tr, te) = blobs.randomSplit(Array(0.7, 0.3), 42L)
    val model = RandomForestJob.classifier(RandomForestJob.RfConfig(numTrees = 20, maxDepth = 5))
      .fit(tr)
    val preds = model.transform(te)
    val m = Metrics.multiclass(preds)
    assert(m("accuracy") > 0.95, m.toString)
    val ovr = Metrics.ovrAuc(preds, 3)
    assert(ovr.forall(_._2 > 0.95), ovr.toString)
    val imp = RandomForestJob.featureImportances(spark, model, Seq("f0", "f1", "f2", "f3"))
    assert(imp.count() === 4)
  }

  test("Metrics.perClass and confusionMatrix agree on hand-built predictions") {
    import spark.implicits._
    // true:  0 0 0 1 1 2 ; pred: 0 0 1 1 1 0
    val preds = Seq((0, 0), (0, 0), (0, 1), (1, 1), (1, 1), (2, 0))
      .toDF("label", "prediction")
      .select(col("label").cast("double"), col("prediction").cast("double"))
    val pc = Metrics.perClass(preds).collect().map(r =>
      r.getAs[Int]("cls") -> r).toMap
    assert(pc(0).getAs[Long]("tp") === 2)
    assert(pc(0).getAs[Double]("precision") === 2.0 / 3.0)
    assert(pc(0).getAs[Double]("recall") === 2.0 / 3.0)
    assert(pc(2).getAs[Double]("recall") === 0.0)
    val cm = Metrics.confusionMatrix(preds, 3).collect()
    assert(cm.map(_.getAs[Long]("0")).sum === 3) // column of predictions == 0
  }

  test("scaler standardizes features (mean ~ 0)") {
    val model = FeaturePrep.assembleAndScale(Seq("x", "y")).fit {
      import spark.implicits._
      Seq((1.0, 100.0), (2.0, 200.0), (3.0, 300.0)).toDF("x", "y")
    }
    import spark.implicits._
    val out = model.transform(Seq((2.0, 200.0)).toDF("x", "y"))
      .select("scaled_features").head.getAs[org.apache.spark.ml.linalg.Vector](0)
    out.toArray.foreach(v => assert(math.abs(v) < 1e-9)) // the mean row → 0
  }

  test("GiniStump: depth-2 tree is structurally sound and exactly partitions the data") {
    val rows = GiniStump.query(spark, sfDir).collect()
    assert(rows.length === 7)
    val (splits, leaves) = rows.partition(_.getAs[String]("kind") === "split")
    assert(splits.map(_.getAs[String]("node")).sorted === Array("L", "R", "root"))
    assert(leaves.map(_.getAs[String]("node")).sorted ===
      Array("LL", "LR", "RL", "RR"))
    val n = rows.map(r => r.getAs[String]("node") -> r.getAs[Long]("n")).toMap
    // children exactly partition their parent
    assert(n("L") + n("R") === n("root"))
    assert(n("LL") + n("LR") === n("L"))
    assert(n("RL") + n("RR") === n("R"))
    // split rows carry a chosen feature+threshold; leaves carry a prediction
    assert(splits.forall(r => r.getAs[String]("feat") != null
      && !r.isNullAt(r.fieldIndex("thr")) && r.isNullAt(r.fieldIndex("pred"))))
    assert(leaves.forall(r => r.getAs[String]("feat") == null
      && !r.isNullAt(r.fieldIndex("pred"))))
    // scores are valid ginis (weighted impurity sums are >= 0; leaf gini < 1)
    assert(rows.forall(r => r.getAs[Double]("score") >= 0.0))
    assert(leaves.forall(_.getAs[Double]("score") < 1.0))
  }

  test("GiniStump: unsplittable nodes become leaves, leaves still partition") {
    import spark.implicits._
    // node "X": all feature values identical → every candidate split leaves
    // one side empty → no best2 row; node "Y": cleanly splittable on f0
    val wide = (
      (1 to 6).map(i => (i.toLong, i % 2, "X", 1.0, 1.0, 1.0, 1.0)) ++
      (7 to 12).map(i => (i.toLong, i % 2, "Y", (i % 3).toDouble, 0.0, 0.0, 0.0))
    ).toDF("id", "label", "node", "f0", "f1", "f2", "f3")
    val thr = GiniStump.thresholds(
      GiniStump.toLong(wide).select("id", "feat", "val"))
    val best = GiniStump.bestSplits(wide, thr)
    // only the splittable node gets a best split
    assert(best.select("node").collect().map(_.getString(0)).toSeq === Seq("Y"))
    val assigned = GiniStump.assignChildren(wide, best)
    assert(assigned.count() === wide.count()) // nothing silently dropped
    val byNode = assigned.groupBy("node").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byNode("X") === 6L) // unsplittable node kept as its own leaf
    assert(byNode.keys.count(_.startsWith("Y")) === 2) // Y split into YL/YR
  }

  test("GiniStump: approx thresholds plug into the same grid and yield a valid tree") {
    val wide = GiniStump.pts(spark, sfDir).withColumn("node",
      org.apache.spark.sql.functions.lit("root"))
    val thrA = GiniStump.thresholdsApprox(wide)
    // one threshold set per feature, each within the feature's value range
    assert(thrA.select("feat").distinct().count() === 4)
    val best = GiniStump.bestSplits(wide, thrA).collect()
    assert(best.length === 1) // root found a valid split from approx bins
    assert(best.head.getAs[Double]("wg") >= 0.0)
  }

  test("GiniStump: exact and approx binning grow the identical tree on separated data") {
    // the at-scale claim behind thresholdsApprox: candidate edges differ
    // from exact ntile edges in VALUE, but on well-separated data every
    // candidate set containing a point in the separating band yields the
    // same chosen features, partitions, sizes, and pure leaves — so the
    // GK-sketch path is a drop-in scale default, not a weaker algorithm.
    import spark.implicits._
    // 4 classes on a 2×2 grid: f0 separates a∈{0,1}, f1 separates b∈{0,1};
    // f2/f3 constant (never splittable). 20 rows per class.
    val rows = (0 until 80).map { i =>
      val a = i % 2
      val b = (i / 2) % 2
      (i.toLong, 2 * a + b, a * 10.0 + (i % 5) * 0.1,
        b * 10.0 + ((i / 4) % 5) * 0.1, 0.0, 0.0)
    }
    val p = rows.toDF("id", "label", "f0", "f1", "f2", "f3")
    val exact = GiniStump.fitTree(p, 2, approxBinning = false).collect()
    val approx = GiniStump.fitTree(p, 2, approxBinning = true).collect()
    def shape(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getAs[String]("node"), r.getAs[String]("kind"),
        r.getAs[String]("feat"), Option(r.getAs[Integer]("pred")),
        r.getAs[Long]("n"))).toSet
    assert(shape(exact) === shape(approx))
    // both find the grid: root splits f0, both children split f1,
    // 4 pure leaves of 20
    val splits = exact.filter(_.getAs[String]("kind") == "split")
    assert(splits.find(_.getAs[String]("node") == "root")
      .get.getAs[String]("feat") === "f0")
    assert(splits.filter(r => Set("L", "R")(r.getAs[String]("node")))
      .forall(_.getAs[String]("feat") == "f1"))
    val leaves = exact.filter(_.getAs[String]("kind") == "leaf")
    assert(leaves.length === 4)
    assert(leaves.forall(r => r.getAs[Double]("score") == 0.0
      && r.getAs[Long]("n") == 20L))
  }

  test("GiniStump: depth-3 tree partitions every level and q80's depth-2 rows are its prefix shape") {
    val d3 = GiniStump.tree(spark, sfDir, 3).collect()
    val byNode = d3.map(r => r.getAs[String]("node") -> r).toMap
    val n = d3.map(r => r.getAs[String]("node") -> r.getAs[Long]("n")).toMap
    // every split node's children exactly partition it (child rows may be
    // splits or leaves; unsplittable children keep the parent prefix)
    d3.filter(_.getAs[String]("kind") == "split").foreach { r =>
      val node = r.getAs[String]("node")
      val base = if (node == "root") "" else node
      assert(n.contains(base + "L") && n.contains(base + "R"), node)
      assert(n(base + "L") + n(base + "R") === n(node), node)
    }
    // depth-2's split decisions are the prefix of the depth-3 tree: same
    // root/L/R features and thresholds (deeper levels never change them)
    val d2 = GiniStump.query(spark, sfDir).collect()
    d2.filter(_.getAs[String]("kind") == "split").foreach { r2 =>
      val r3 = byNode(r2.getAs[String]("node"))
      assert(r3.getAs[String]("kind") === "split")
      assert(r3.getAs[String]("feat") === r2.getAs[String]("feat"))
      assert(r3.getAs[Double]("thr") === r2.getAs[Double]("thr"))
    }
  }

  test("fitWithBackoff falls back to smaller samples on failure") {
    var calls = 0
    val result = FeaturePrep.fitWithBackoff(blobs, Seq(1.0, 0.5)) { df =>
      calls += 1
      if (calls == 1) throw new RuntimeException("simulated OOM")
      df.count()
    }
    assert(calls === 2)
    assert(result > 0)
  }

  test("q201 PQ: full block/cluster grid, cells partition, quantization beats 1-centroid") {
    import org.apache.spark.sql.functions._
    val rows = graft.ml.PqCodebook.pqCodebooks(spark, sfDir).collect()
    val nVecs = graft.sources.Tables.load(spark, sfDir, "embeddings").count()
    val blocks = graft.ml.PqCodebook.Blocks
    // every (block, cluster) cell present, populations partition per block
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet ===
      (0 until blocks).flatMap(b => (0 until graft.ml.LloydExact.K)
        .map(c => (b, c))).toSet)
    (0 until blocks).foreach { b =>
      assert(rows.filter(_.getInt(0) == b).map(_.getAs[Long]("n")).sum
        === nVecs, s"block $b")
    }
    rows.foreach(r => assert(r.getAs[Double]("mse") >= 0.0))
    // quantization must beat the 1-centroid baseline: per block, the
    // weighted MSE is below the sub-vector variance around its mean
    val embs = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (0 until blocks).foreach { b =>
      val sub = embs.map(_.slice(b * 16, (b + 1) * 16))
      val mean = (0 until 16).map(i => sub.map(_(i)).sum / sub.length)
      val varTot = sub.map(v => (0 until 16)
        .map(i => (v(i) - mean(i)) * (v(i) - mean(i))).sum).sum
      val pqErr = rows.filter(_.getInt(0) == b)
        .map(r => r.getAs[Long]("n") * r.getAs[Double]("mse")).sum
      assert(pqErr < varTot, s"block $b: $pqErr vs $varTot")
    }
  }

  test("q211 ADC: recall bounded, well above the random-overlap baseline") {
    val rows = graft.ml.PqCodebook.pqAdcRecall(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Int]("n_common") === math.round(rec * 10).toInt)
    }
    val n = graft.sources.Tables.load(spark, sfDir, "embeddings").count()
    // random top-10 overlap expectation is k/N per slot → recall ~ 10/N;
    // a 4×4-bit codebook over random vectors is weak but must beat it
    val randomRecall = 10.0 / (n - 1)
    val mean = rows.map(_.getAs[Double]("recall_at_k")).sum / rows.length
    assert(mean > 2 * randomRecall, s"mean $mean vs random $randomRecall")
  }

  test("q235 IVFADC: recall bounded, and the residual trick does not " +
      "lose to random overlap") {
    val rows = graft.ml.PqCodebook.ivfAdcRecall(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Int]("n_common") === math.round(rec * 10).toInt)
    }
    val n = graft.sources.Tables.load(spark, sfDir, "embeddings").count()
    val randomRecall = 10.0 / (n - 1)
    val mean = rows.map(_.getAs[Double]("recall_at_k")).sum / rows.length
    assert(mean > 2 * randomRecall, s"mean $mean vs random $randomRecall")
  }

  test("q243 persisted IVFADC answers exactly like the live q235") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getDouble(2))
    val live = graft.ml.PqCodebook.ivfAdcRecall(spark, sfDir)
      .collect().map(key).toSeq
    val persisted = graft.ml.PqCodebook.ivfAdcPersisted(spark, sfDir)
      .collect().map(key).toSeq
    assert(persisted === live)
    val again = graft.ml.PqCodebook.ivfAdcPersisted(spark, sfDir)
      .collect().map(key).toSeq
    assert(again === live)
  }

  test("q233 persisted PQ index answers exactly like the in-memory q211") {
    // the amortization contract: build-once artifacts reloaded from
    // parquet must reproduce the live pipeline row-for-row — codebook
    // doubles, codes, and ground truth all survive the round trip
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getDouble(2))
    val live = graft.ml.PqCodebook.pqAdcRecall(spark, sfDir)
      .collect().map(key).toSeq
    val persisted = graft.ml.PqCodebook.pqAdcPersisted(spark, sfDir)
      .collect().map(key).toSeq
    assert(persisted === live)
    // second call must hit the already-built index (probe-only path)
    // and still agree — the steady state the floor measures
    val again = graft.ml.PqCodebook.pqAdcPersisted(spark, sfDir)
      .collect().map(key).toSeq
    assert(again === live)
  }

  test("q245 power iteration reproduced by an independent driver-side " +
      "recompute; unit norm, eigen-residual, explained ratio") {
    val rows = PcaPower.pcaPower(spark, sfDir).collect().sortBy(_.getInt(0))
    assert(rows.length === PcaPower.Dim)
    val v = rows.map(_.getAs[Double]("loading"))
    val lambda = rows.head.getAs[Double]("lambda1")
    val explained = rows.head.getAs[Double]("explained")
    // unit eigenvector (loadings are 6-dp rounded: allow that slack)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-4)
    assert(explained > 0.0 && explained <= 1.0)
    // independent recompute: plain-double covariance + the same fixed
    // 12-step orbit from v0 = 1/sqrt(D). Summation order differs from
    // the engine's decimal path, so agreement at 1e-5 IS the evidence
    // the operator computes the declared mathematical object, not an
    // artifact of its own plumbing.
    val d = PcaPower.Dim
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = e.length
    val mu = Array.tabulate(d)(j => e.map(_(j)).sum / n)
    val c = Array.tabulate(d, d) { (j, k) =>
      e.map(r => (r(j) - mu(j)) * (r(k) - mu(k))).sum / (n - 1)
    }
    var vv = Array.fill(d)(0.125)
    var nrm = 0.0
    for (_ <- 1 to PcaPower.Iters) {
      val w = Array.tabulate(d)(j =>
        (0 until d).map(k => c(j)(k) * vv(k)).sum)
      nrm = math.sqrt(w.map(x => x * x).sum)
      vv = w.map(_ / nrm)
    }
    assert(math.abs(nrm - lambda) < 1e-5, s"lambda $lambda vs $nrm")
    v.zip(vv).zipWithIndex.foreach { case ((a, b), j) =>
      assert(math.abs(a - b) < 1e-5, s"loading[$j] $a vs $b")
    }
    // residual ||Cv - lambda*v|| is small relative to lambda: the orbit
    // is near the dominant eigenvector, not just deterministic noise
    val cv = Array.tabulate(d)(j => (0 until d).map(k => c(j)(k) * v(k)).sum)
    val resid = math.sqrt(cv.zip(v).map { case (a, b) =>
      val r = a - lambda * b; r * r }.sum)
    assert(resid < 0.2 * lambda, s"residual $resid vs lambda $lambda")
    // trace consistency: explained == lambda / sum(var_dim) within 6-dp
    val trace = rows.map(_.getAs[Double]("var_dim")).sum
    assert(math.abs(explained - lambda / trace) < 1e-4)
  }

  test("q248 deflation reproduced by an independent driver-side " +
      "recompute; lambda2<=lambda1, unit norms, near-orthogonality") {
    val rows = PcaPower.pcaDeflate(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    val d = PcaPower.Dim
    assert(rows.length === d)
    val v1 = rows.map(_.getAs[Double]("loading1"))
    val v2 = rows.map(_.getAs[Double]("loading2"))
    val l1 = rows.head.getAs[Double]("lambda1")
    val l2 = rows.head.getAs[Double]("lambda2")
    val ortho = rows.head.getAs[Double]("ortho_dot")
    // NOTE deliberately NOT l2 <= l1: these are 12-step ESTIMATES, and
    // on a near-flat spectrum the deflated orbit can land above the
    // unconverged first estimate (it does at sf0.001). Same magnitude
    // is the honest invariant; exact values are pinned by the oracle.
    assert(l2 <= l1 * 1.5 && l2 > 0)
    assert(math.abs(math.sqrt(v2.map(x => x * x).sum) - 1.0) < 1e-4)
    // the deflated orbit must leave the first direction: the reported
    // dot IS the convergence residual, small but honest
    assert(math.abs(ortho) < 0.1)
    assert(math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum - ortho)
      < 1e-4)
    // independent recompute of the full two-stage orbit on the driver
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = e.length
    val mu = Array.tabulate(d)(j => e.map(_(j)).sum / n)
    val c = Array.tabulate(d, d) { (j, k) =>
      e.map(r => (r(j) - mu(j)) * (r(k) - mu(k))).sum / (n - 1)
    }
    def orbit(m: Array[Array[Double]]): (Array[Double], Double) = {
      var vv = Array.fill(d)(0.125)
      var nrm = 0.0
      for (_ <- 1 to PcaPower.Iters) {
        val w = Array.tabulate(d)(j =>
          (0 until d).map(k => m(j)(k) * vv(k)).sum)
        nrm = math.sqrt(w.map(x => x * x).sum)
        vv = w.map(_ / nrm)
      }
      (vv, nrm)
    }
    val (e1, n1) = orbit(c)
    val c2 = Array.tabulate(d, d)((j, k) => c(j)(k) - n1 * e1(j) * e1(k))
    val (e2, n2) = orbit(c2)
    assert(math.abs(n2 - l2) < 1e-5)
    v2.zip(e2).zipWithIndex.foreach { case ((a, b), j) =>
      assert(math.abs(a - b) < 1e-5, s"loading2[$j] $a vs $b")
    }
  }

  test("q266 blocked orthogonal iteration reproduced by an independent " +
      "driver-side recompute; orthonormal block, top component = q245") {
    val rows = PcaPower.pcaBlock(spark, sfDir).collect().sortBy(_.getInt(0))
    val d = PcaPower.Dim
    val r = PcaPower.BlockR
    assert(rows.length === d)
    val q = Array.tabulate(r)(c =>
      rows.map(_.getAs[Double](s"loading${c + 1}")))
    val lam = Array.tabulate(r)(c =>
      rows.head.getAs[Double](s"lambda${c + 1}"))
    val cum = rows.head.getAs[Double]("cum_explained")
    val omax = rows.head.getAs[Double]("ortho_max")
    // the block stayed orthonormal: unit columns, tiny pairwise dots
    q.foreach(col =>
      assert(math.abs(math.sqrt(col.map(x => x * x).sum) - 1.0) < 1e-4))
    assert(omax < 1e-3, s"ortho_max $omax")
    assert(cum > 0.0 && cum <= 1.0)
    lam.foreach(l => assert(l > 0.0))
    // the blocked orbit's first column estimates the SAME lambda1 as
    // q245's power iteration, from a different start vector (the comb
    // vs all-0.125) — on this fixture's near-flat spectrum (the q248
    // note) 12 steps land within a few percent; exact values are
    // pinned by the oracle and the recompute below, this is the tie
    val p245 = PcaPower.pcaPower(spark, sfDir).collect().sortBy(_.getInt(0))
    val l245 = p245.head.getAs[Double]("lambda1")
    assert(math.abs(l245 - lam(0)) < 0.05 * lam(0),
      s"lambda1 $l245 (q245) vs ${lam(0)} (q266)")
    // independent plain-double recompute of the full blocked orbit
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = e.length
    val mu = Array.tabulate(d)(j => e.map(_(j)).sum / n)
    val c = Array.tabulate(d, d) { (j, k) =>
      e.map(row => (row(j) - mu(j)) * (row(k) - mu(k))).sum / (n - 1)
    }
    var qq = Array.tabulate(d, r)((i, j) => if (i % r == j) 0.25 else 0.0)
    val nn = Array.fill(r)(0.0)
    for (_ <- 1 to PcaPower.Iters) {
      val w = Array.tabulate(d, r)((i, cx) =>
        (0 until d).map(k => c(i)(k) * qq(k)(cx)).sum)
      val nq = Array.ofDim[Double](d, r)
      for (cx <- 0 until r) {
        val u = Array.tabulate(d)(i => w(i)(cx))
        for (p <- 0 until cx) {
          val dd = (0 until d).map(i => nq(i)(p) * w(i)(cx)).sum
          for (i <- 0 until d) u(i) -= dd * nq(i)(p)
        }
        nn(cx) = math.sqrt(u.map(x => x * x).sum)
        for (i <- 0 until d) nq(i)(cx) = u(i) / nn(cx)
      }
      qq = nq
    }
    for (cx <- 0 until r) {
      assert(math.abs(nn(cx) - lam(cx)) < 1e-5,
        s"lambda${cx + 1} ${lam(cx)} vs ${nn(cx)}")
      q(cx).zipWithIndex.foreach { case (a, j) =>
        assert(math.abs(a - qq(j)(cx)) < 1e-5, s"q${cx + 1}[$j]")
      }
    }
  }

  test("q267 logistic GD reproduced by an independent plain-double " +
      "driver recompute; loss below the w=0 baseline") {
    val row = graft.ml.LogitGd.logitGd(spark, sfDir).collect()(0)
    val wEngine = (0 until graft.ml.LogitGd.NumFeatures)
      .map(j => row.getAs[Double](s"w$j"))
    val acc = row.getAs[Double]("accuracy")
    val ll = row.getAs[Double]("log_loss")
    assert(acc > 0.0 && acc <= 1.0)
    // 8 steps from w=0 must reduce the mean log-loss below ln 2
    assert(ll < 0.6932, s"log_loss $ll did not improve on the baseline")
    // independent recompute: same features and GD schedule in plain
    // Scala with an UNROUNDED sigmoid — agreement at 1e-3 says the
    // operator is the declared optimizer, not its own plumbing
    val sw = graft.functions.TextPrims.Stopwords.toSet
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val data = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("lang", "text").collect().map { r =>
      val text = r.getString(1)
      val toks = text.trim.toLowerCase.split("\\s+")
      val words = toks.length.toDouble
      val chars = text.length.toDouble
      val punct = "[.,;:!?]".r.findAllIn(text).length.toDouble
      val stops = toks.count(sw.contains).toDouble
      val x = Array(1.0,
        r6(math.log(words + 1.0) / 10.0),
        if (words > 0) r6(stops / words) else 0.0,
        if (chars > 0) r6(punct / chars) else 0.0,
        if (words > 0) r6(chars / words / 10.0) else 0.0)
      val y = if (r.getString(0) == "en") 1.0 else 0.0
      (y, x)
    }
    val d = graft.ml.LogitGd.NumFeatures
    val w = Array.fill(d)(0.0)
    for (_ <- 1 to graft.ml.LogitGd.Steps) {
      val g = Array.fill(d)(0.0)
      data.foreach { case (y, x) =>
        val z = (0 until d).map(j => w(j) * x(j)).sum
        val p = 1.0 / (1.0 + math.exp(-z))
        for (j <- 0 until d) g(j) += (p - y) * x(j)
      }
      for (j <- 0 until d)
        w(j) = w(j) - graft.ml.LogitGd.Eta * g(j) / data.length
    }
    wEngine.zip(w).zipWithIndex.foreach { case ((a, b), j) =>
      assert(math.abs(a - b) < 1e-3, s"w$j engine $a vs recompute $b")
    }
  }

  test("q287 uncertainty sample: rows nearest the boundary, ordered, " +
      "and genuinely the global minimum band") {
    val rows = graft.ml.LogitGd.uncertaintySample(spark, sfDir).collect()
    assert(rows.length === graft.ml.LogitGd.UncK)
    val unc = rows.map(_.getAs[Double]("uncertainty"))
    unc.zip(unc.tail).foreach { case (a, b) => assert(a <= b) }
    assert(unc.forall(u => u >= 0.0 && u <= 0.5))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("uncertainty") -
        BigDecimal(math.abs(r.getAs[Double]("p_en") - 0.5))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    }
  }

  test("q258 projection: label moments recomputed by projecting on the " +
      "driver with the q245/q248 loadings") {
    val rows = PcaPower.pcaProjection(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r).toMap
    val d = PcaPower.Dim
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("embedding", "label").collect()
      .map(r => (r.getSeq[Float](0).map(_.toDouble).toArray, r.getInt(1)))
    assert(rows.values.map(_.getAs[Int]("n")).sum === emb.length)
    rows.values.foreach { r =>
      assert(r.getAs[Double]("var_pc1") >= 0.0)
      assert(r.getAs[Double]("var_pc2") >= 0.0)
    }
    // loadings/means from the 6-dp q245/q248 reports; agreement at 1e-3
    // proves the projection is the declared linear map, independent of
    // the engine's own centered/quantized path
    val pca1 = PcaPower.pcaPower(spark, sfDir).collect().sortBy(_.getInt(0))
    val mu = pca1.map(_.getAs[Double]("mu_dim"))
    val pca2 = PcaPower.pcaDeflate(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    val v1 = pca2.map(_.getAs[Double]("loading1"))
    val v2 = pca2.map(_.getAs[Double]("loading2"))
    val byLabel = emb.groupBy(_._2)
    byLabel.foreach { case (lbl, vs) =>
      val pc1s = vs.map { case (e, _) =>
        (0 until d).map(j => (e(j) - mu(j)) * v1(j)).sum }
      val pc2s = vs.map { case (e, _) =>
        (0 until d).map(j => (e(j) - mu(j)) * v2(j)).sum }
      val r = rows(lbl)
      assert(r.getAs[Int]("n") === vs.length)
      assert(math.abs(r.getAs[Double]("mean_pc1") -
        pc1s.sum / vs.length) < 1e-3, s"label $lbl pc1")
      assert(math.abs(r.getAs[Double]("mean_pc2") -
        pc2s.sum / vs.length) < 1e-3, s"label $lbl pc2")
    }
  }
  test("q304 conformal: partition accounted, q-hat on the score grid, " +
      "coverage near the 1 - alpha promise") {
    val r = graft.ml.LogitGd.conformalCoverage(spark, sfDir)
      .collect()(0)
    val (nTr, nCa, nTe) = (r.getAs[Long]("n_train"),
      r.getAs[Long]("n_cal"), r.getAs[Long]("n_test"))
    assert(nTr > 0 && nCa > 0 && nTe > 0)
    val qh = r.getAs[Double]("q_hat")
    assert(qh >= 0.0 && qh <= 1.0)
    val cov = r.getAs[Double]("coverage")
    // split conformal promises >= 0.9 marginally; a fixed split can
    // fluctuate below by a few binomial standard errors, no more
    val slack = 3.0 * math.sqrt(0.09 / nTe.toDouble)
    assert(cov >= 0.9 - slack, s"coverage $cov with n_test $nTe")
    val sz = r.getAs[Double]("avg_set_size")
    assert(sz >= 0.0 && sz <= 2.0)
    // a certificate that admits everything proves nothing
    assert(sz < 2.0, "prediction sets are vacuous")
  }
  test("q306 adaptive ECE: equal-mass bins, ece is the n-weighted gap " +
      "mean, one value everywhere") {
    val rows = graft.ml.LogitGd.reliabilityEce(spark, sfDir).collect()
    assert(rows.length === graft.ml.LogitGd.EceBins)
    val ns = rows.map(_.getAs[Long]("n"))
    // equal-mass binning: no cell more than ~2x the smallest
    assert(ns.max <= 2 * ns.min, ns.toSeq.toString)
    val eces = rows.map(_.getAs[Double]("ece")).distinct
    assert(eces.length === 1)
    val wmean = rows.map(r =>
      r.getAs[Double]("gap") * r.getAs[Long]("n")).sum / ns.sum
    assert(math.abs(eces.head - wmean) < 1e-5, s"${eces.head} vs $wmean")
    rows.foreach { r =>
      val acc = r.getAs[Double]("acc")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Double]("mean_conf") >= 0.5 - 1e-9)
    }
  }
  test("q307 whitening: report invariants — lambda1 dominates its " +
      "block, cosines bounded, whitened mean-cos stays near zero") {
    val r = graft.ml.PcaPower.whitenReport(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_pairs") > 0)
    assert(r.getAs[Long]("n_pairs_white") <= r.getAs[Long]("n_pairs"))
    val ex = r.getAs[Double]("explained_r4")
    assert(ex > 0.0 && ex <= 1.0, r.toString)
    // lambda1 is the largest of the four by construction
    assert(r.getAs[Double]("lam1_share") >= 0.25 - 1e-9, r.toString)
    val raw = r.getAs[Double]("mean_raw_cos")
    val wht = r.getAs[Double]("mean_white_cos")
    assert(math.abs(raw) <= 1.0 && math.abs(wht) <= 1.0)
    // whitening equalizes the retained axes: the whitened mean pair
    // cosine must sit near zero (the fixture is near-isotropic, so
    // this is a sanity band, not a dramatic drop)
    assert(math.abs(wht) < 0.05, r.toString)
  }

  test("q332 ALS: driver-math brute force of the full alternating chain " +
      "reproduces every half-step RMSE; the curve descends") {
    import org.apache.spark.sql.functions._
    val got = graft.ml.AlsFactor.alsFactorize(spark, sfDir).collect()
      .map(r => ((r.getAs[Int]("step"), r.getAs[String]("side")),
        r.getAs[Double]("rmse"))).toMap
    // ratings through the same decimal mean route
    val ratings = graft.sources.Tables.load(spark, sfDir, "events")
      .groupBy("user_id", "event_type")
      .agg((sum(col("value").cast("decimal(18,4)")).cast("double") /
        count(lit(1))).as("r"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val lam = graft.ml.AlsFactor.Lambda
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def initOf(et: String, c: String): Double =
      graft.functions.TextPrims.javaMd5Hex32(s"alsV#$et#$c") /
        2147483648.0 - 1.0
    var v = ratings.map(_._2).distinct.sorted
      .map(et => et -> (initOf(et, "a"), initOf(et, "b"))).toMap
    var u = Map.empty[Long, (Double, Double)]
    def solve(rows: Seq[(Double, (Double, Double))]): (Double, Double) = {
      val saa = rows.map(t => r9(t._2._1 * t._2._1)).sum
      val sab = rows.map(t => r9(t._2._1 * t._2._2)).sum
      val sbb = rows.map(t => r9(t._2._2 * t._2._2)).sum
      val sra = rows.map(t => r9(t._1 * t._2._1)).sum
      val srb = rows.map(t => r9(t._1 * t._2._2)).sum
      val det = (saa + lam) * (sbb + lam) - sab * sab
      (((sbb + lam) * sra - sab * srb) / det,
        ((saa + lam) * srb - sab * sra) / det)
    }
    def rmse(): Double = {
      val sse = ratings.map { case (ui, et, r) =>
        val (ua, ub) = u(ui); val (fa, fb) = v(et)
        val e = r - (ua * fa + ub * fb)
        r9(e * e)
      }.sum
      math.sqrt(sse / ratings.length)
    }
    val want = scala.collection.mutable.Map.empty[(Int, String), Double]
    for (it <- 1 to graft.ml.AlsFactor.Iters) {
      u = ratings.groupBy(_._1).map { case (ui, rs) =>
        ui -> solve(rs.toSeq.map(t => (t._3, v(t._2)))) }
      want((it, "U")) = rmse()
      v = ratings.groupBy(_._2).map { case (et, rs) =>
        et -> solve(rs.toSeq.map(t => (t._3, u(t._1)))) }
      want((it, "V")) = rmse()
    }
    want.foreach { case (k, w) =>
      assert(math.abs(got(k) - w) < 1e-4, s"$k: got ${got(k)} want $w") }
    // the alternating curve descends half-step over half-step
    val curve = Seq((1, "U"), (1, "V"), (2, "U"), (2, "V")).map(got)
    curve.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"curve rose: $curve")
      case _ => ()
    }
  }
}



