package graft.ml

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Custom distributed kNN operator (SURVEY.md §2.9) — the one from-scratch
  * operator in the reference (knn_classification.py:99-190: collect train
  * sample → broadcast → Python UDF brute-force scan).
  *
  * This engine ships both shapes SURVEY recommends:
  *  - [[predict]] — broadcast train set + `mapPartitions` with a per-row
  *    bounded top-k selection (no sort; O(|train|·k) per row, zero
  *    JVM↔Python overhead, JVM-local math via Vectors.sqdist). The faithful
  *    plan shape, ~the reference's semantics at ~100× less per-row cost.
  *  - the fully relational crossJoin + window form lives in
  *    graft.similarity.Similarity.knnClassify (exercises join/window/agg and
  *    is the base for the LSH-accelerated 100 TB path).
  *
  * Scale: broadcast caps the train side (the reference samples 10% for the
  * same reason, :132); beyond broadcast size, switch to the LSH-bucketed
  * variant (Similarity.annLsh) which shuffles on bucket keys instead.
  */
object Knn {

  /** Majority vote over the k nearest train points; optional inverse-
    * distance weighting (the notebook's weights='distance', nb cell 40);
    * ties break toward the smaller label (deterministic). */
  private[graft] def vote(labels: Array[Int], dists: Array[Double],
                       distanceWeighted: Boolean): Int = {
    val w = new java.util.HashMap[Int, Double]()
    var i = 0
    while (i < labels.length) {
      val weight = if (distanceWeighted) 1.0 / (dists(i) + 1e-9) else 1.0
      w.merge(labels(i), weight, (a, b) => a + b)
      i += 1
    }
    var best = -1; var bestW = -1.0
    w.forEach { (l, ww) =>
      if (ww > bestW || (ww == bestW && l < best)) { best = l; bestW = ww }
    }
    best
  }

  /** Bounded top-k: insertion over a k-sized pair of arrays (max kept at
    * slot `worst`); avoids sorting the full candidate list per row
    * (the reference sorts all |train| distances per test row, :147-149). */
  private[graft] def topK(train: Array[(Vector, Int)], q: Vector, k: Int):
      (Array[Int], Array[Double]) = {
    val kk = math.min(k, train.length)
    val dists = Array.fill(kk)(Double.MaxValue)
    val labels = new Array[Int](kk)
    var worst = 0
    var i = 0
    while (i < train.length) {
      val d = Vectors.sqdist(train(i)._1, q)
      if (d < dists(worst)) {
        dists(worst) = d; labels(worst) = train(i)._2
        var j = 1; worst = 0
        while (j < kk) { if (dists(j) > dists(worst)) worst = j; j += 1 }
      }
      i += 1
    }
    (labels, dists)
  }

  /** Broadcast-kNN scoring: adds `prediction` to `test`.
    *
    * @param train frame with (featuresCol, labelCol); must fit in a
    *              broadcast (sample upstream if not — R1 semantics)
    */
  def predict(train: DataFrame, test: DataFrame, k: Int,
              featuresCol: String = "features", labelCol: String = "label",
              distanceWeighted: Boolean = false): DataFrame = {
    val spark = train.sparkSession
    val trainArr: Array[(Vector, Int)] = train
      .select(col(featuresCol), col(labelCol).cast(IntegerType))
      .collect()
      .map(r => (r.getAs[Vector](0), r.getInt(1)))
    // an empty broadcast train set must fail loudly here, not flow a fake
    // label (-1) into the output downstream
    require(trainArr.nonEmpty,
      s"Knn.predict: train set is empty (filtered out upstream?)")
    val bc = spark.sparkContext.broadcast(trainArr)
    val outSchema = StructType(test.schema.fields :+
      StructField("prediction", IntegerType, nullable = false))
    val featIdx = test.schema.fieldIndex(featuresCol)
    val rows = test.rdd.mapPartitions { iter =>
      iter.map { row =>
        val q = row.getAs[Vector](featIdx)
        val (labels, dists) = topK(bc.value, q, k)
        Row.fromSeq(row.toSeq :+ vote(labels, dists, distanceWeighted))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Grid-search k (knn_classification.py:166-190): accuracy per candidate
    * k on a held-out frame, argmax (ties → smaller k). */
  def findOptimalK(train: DataFrame, holdout: DataFrame, ks: Seq[Int],
                   featuresCol: String = "features",
                   labelCol: String = "label"): (Int, Map[Int, Double]) = {
    val accs = ks.map { k =>
      val preds = predict(train, holdout, k, featuresCol, labelCol)
      val acc = preds.select(
        avg((col("prediction") === col(labelCol).cast(IntegerType))
          .cast(DoubleType)))
        .first().getDouble(0)
      k -> acc
    }.toMap
    (ks.maxBy(k => (accs(k), -k)), accs)
  }

  /** kNN over the embeddings table with an 80/20 split — confusion-matrix
    * output (rows-only check; band assertions in the spec). */
  def embeddingKnnConfusion(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val feats = FeaturePrep.embeddingFeatures(
      graft.sources.Tables.load(s, dir, "embeddings"))
    val Array(train, test) = feats.randomSplit(Array(0.8, 0.2), 42L)
    val preds = predict(train, test, k)
    Metrics.confusionMatrix(
      preds.withColumn("label", col("label").cast(DoubleType)), 10,
      predictionCol = "prediction")
  }
}
