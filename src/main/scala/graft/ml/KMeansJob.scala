package graft.ml

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** K-Means clustering job (SURVEY.md §2.8 M7-M10): elbow sweep over k with
  * WSSSE + silhouette, best-k selection, final fit, and per-cluster stats —
  * the reference's kmeans_clustering.py:97-225 / full_scale_pipeline.py
  * 196-230 re-expressed.
  *
  * Scale notes: the input is persisted once across the k sequential fits
  * (the elbow loop re-reads its input k times otherwise — SURVEY §7.4 risk
  * 5); Lloyd iterations broadcast centers and aggregate partials, so cost is
  * O(iters · rows · k) with no shuffle growth in k. Silhouette evaluation on
  * the full set is O(rows · k); for very large inputs pass `evalFraction`
  * to score on a seeded sub-sample (the notebook's nb-cell-48 trick).
  */
object KMeansJob {
  final case class ElbowPoint(k: Int, wssse: Double, silhouette: Double)

  def fit(df: DataFrame, k: Int, featuresCol: String = "features",
          seed: Long = 42L, maxIter: Int = 30): KMeansModel =
    new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol(featuresCol).setPredictionCol("cluster")
      .fit(df)

  def silhouette(predictions: DataFrame, featuresCol: String = "features"): Double =
    new ClusteringEvaluator()
      .setMetricName("silhouette").setDistanceMeasure("squaredEuclidean")
      .setFeaturesCol(featuresCol).setPredictionCol("cluster")
      .evaluate(predictions)

  /** M8: elbow sweep — WSSSE (model.summary.trainingCost) + silhouette per
    * k; caches the input across fits (materialized eagerly so concurrent
    * fits never race the lazy cache fill and recompute the subtree).
    *
    * `parallel=true` runs the k fits as concurrent Spark jobs — right when
    * the sweep input is a (sampled) frame far smaller than the cluster, so
    * one fit can't saturate it and the sweep is scheduler-bound. Leave
    * sequential when each fit already uses the whole cluster (the 100 TB
    * full-data case). Results are identical either way: each fit is
    * independently seeded and Future.sequence preserves k order.
    *
    * Concurrency is bounded by a dedicated pool (`maxConcurrent` driver
    * threads — each pending fit is just a blocked submitter thread, so a
    * small bound suffices and a runaway kRange can't exhaust the global
    * pool), and the whole sweep is bounded by `timeout` rather than
    * awaiting forever on a hung job. On timeout the in-flight fits are
    * actually KILLED, not abandoned: every fit runs under a sweep-scoped
    * Spark job group (interruptOnCancel) that is cancelled before the
    * timeout propagates, and the pool is shutdownNow'd so blocked
    * submitter threads are interrupted — a hung job cannot keep consuming
    * the cluster after the sweep gives up. */
  def elbow(df: DataFrame, kRange: Seq[Int], featuresCol: String = "features",
            seed: Long = 42L, maxIter: Int = 30,
            evalFraction: Double = 1.0, parallel: Boolean = false,
            maxConcurrent: Int = 4,
            timeout: scala.concurrent.duration.Duration =
              scala.concurrent.duration.Duration(30, "min")): Seq[ElbowPoint] = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    def point(k: Int): ElbowPoint = {
      val model = fit(cached, k, featuresCol, seed, maxIter)
      val preds = model.transform(cached)
      val evalSet =
        if (evalFraction >= 1.0) preds
        else preds.sample(withReplacement = false, evalFraction, seed)
      ElbowPoint(k, model.summary.trainingCost, silhouette(evalSet, featuresCol))
    }
    try {
      if (parallel) {
        import scala.concurrent.{Await, ExecutionContext, Future}
        val sc = df.sparkSession.sparkContext
        val group = s"graft-elbow-${java.util.UUID.randomUUID()}"
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.max(1, math.min(maxConcurrent, kRange.size)))
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutorService(pool)
        var done = false
        try {
          val r = Await.result(
            Future.sequence(kRange.map(k => Future {
              // setJobGroup is thread-local: stamp it inside the submitter
              // thread so every Spark job this fit launches joins the group
              sc.setJobGroup(group, s"elbow fit k=$k", interruptOnCancel = true)
              try point(k) finally sc.clearJobGroup()
            })),
            timeout)
          done = true
          r
        } finally {
          // failure path (timeout OR a fit throwing first — Future.sequence
          // fails fast while sibling fits are mid-job): shut the pool down
          // FIRST so no queued fit can start after the group cancel and
          // launch jobs that would never be cancelled, THEN cancel the
          // group to kill the in-flight fits' Spark jobs
          pool.shutdownNow()
          if (!done) sc.cancelJobGroup(group)
          ()
        }
      } else kRange.map(point)
    } finally { cached.unpersist(); () }
  }

  /** Best k = argmax silhouette (kmeans_clustering.py:135). */
  def bestK(points: Seq[ElbowPoint]): Int = points.maxBy(_.silhouette).k

  /** A2: per-cluster stats — count + avg/stddev of given numeric columns
    * (kmeans_clustering.py:198-225). One hash-agg shuffle on the
    * low-cardinality cluster id. */
  def clusterStats(predictions: DataFrame, statCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("count") +:
      statCols.flatMap(c => Seq(
        avg(col(c)).as(s"avg_$c"), stddev(col(c)).as(s"std_$c")))
    predictions.groupBy("cluster")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("cluster")
  }

  /** M10: centroids as a DataFrame (cluster_centers Hive table shape,
    * create_tables.hql:122-138). */
  def centers(spark: SparkSession, model: KMeansModel): DataFrame = {
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq
      .toDF("cluster", "center")
  }

  /** Full job over the embeddings table: scale → elbow-free fixed-k fit →
    * cluster sizes + centroid norms. Deterministic given the seed. */
  def embeddingClusterStats(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    // cache: Lloyd re-reads the input once per iteration; fan the
    // single-split scan out to a few balanced partitions (coalesce can't
    // widen a 1-partition input) and keep row order deterministic so the
    // seeded k-means|| init is reproducible
    val feats = FeaturePrep.embeddingFeatures(
      graft.sources.Tables.fanOut(
        graft.sources.Tables.load(s, dir, "embeddings"), "vec_id", 8)
        .sortWithinPartitions("vec_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val model = fit(feats, k)
      val stats = model.transform(feats).groupBy("cluster")
        .agg(count(lit(1)).cast(LongType).as("n"),
          avg(col("label")).as("avg_label"))
        .orderBy("cluster")
        .collect() // materialize before unpersist; 10 rows
      s.createDataFrame(s.sparkContext.parallelize(stats.toIndexedSeq, 1),
        StructType(Seq(StructField("cluster", IntegerType),
          StructField("n", LongType), StructField("avg_label", DoubleType))))
    } finally { feats.unpersist(); () }
  }

  /** Elbow sweep as a query (rows-only check): k, WSSSE, silhouette.
    * The sweep input is tiny relative to the cluster → parallel fits.
    *
    * Silhouette is scored on a seeded 25% evaluation sample — the
    * reference's own scalable pattern (kmeans_large_scale.py:27-54 caps
    * the input at SAMPLE_SIZE = 2M via a seeded sample_fraction rather
    * than touching the corpus): silhouette is
    * O(rows·k) per k and is pure EVALUATION, so sampling it changes cost,
    * not the fitted models or their WSSSE. MlSpec band-asserts the
    * sampled sweep selects the same k as the full-evaluation sweep. */
  def embeddingElbow(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val feats = FeaturePrep.embeddingFeatures(
      graft.sources.Tables.fanOut(
        graft.sources.Tables.load(s, dir, "embeddings"), "vec_id", 8)
        .sortWithinPartitions("vec_id"))
    // maxConcurrent = |kRange| (bound structurally, not by eyeball): one
    // wave of concurrent fits instead of 4+1 (the sweep input is far
    // smaller than the cluster, so the fits are scheduler-bound, not
    // resource-bound — exactly `parallel`'s case)
    val ks = 2 to 6
    elbow(feats, ks, maxIter = 20, evalFraction = 0.25, parallel = true,
      maxConcurrent = ks.size).toDF()
  }
}
