package graft

/** Partition-count invariance, asserted: the engine's central determinism
  * claim is that every oracle-checked result is a pure function of the
  * data — identical on 1 core or 1000 executors. The DuckDB compare
  * proves engine-vs-engine agreement at ONE partitioning; this spec
  * proves partitioning-independence directly by running representative
  * queries under two different `spark.sql.shuffle.partitions` settings
  * (coprime, so no accidental layout aliasing) and requiring EXACT row
  * equality. One query per rulebook family: decimal-sum aggregation,
  * exact micro-unit quantiles, iterative decimal state (Lloyd, PageRank),
  * rounded-log window ranking, LSH banding + argmin assignment, and
  * decimal OLS moments. */
class DeterminismSpec extends SparkSpec {

  private val queries = Seq(
    "q06_multi_agg",            // DECIMAL(18,4) sums + avgs
    "q08_medians",              // exact micro-unit percentiles
    "q57_kmeans_lloyd",         // iterative decimal-mean state
    "q64_tfidf_topk",           // rounded-log scores + tie-broken window
    "q142_transition_pagerank", // DECIMAL(38,15) iterative accumulator
    "q181_semdedup",            // banded assign + in-cell join
    "q228_quality_length_ols")  // decimal moments + closing algebra

  private def runAt(name: String, parts: Int): Seq[String] = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, parts.toString)
    try SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).toSeq
    finally spark.conf.set(key, prev)
  }

  queries.foreach { name =>
    test(s"$name: identical rows at 3 and 7 shuffle partitions") {
      val a = runAt(name, 3)
      val b = runAt(name, 7)
      assert(a.nonEmpty)
      assert(a === b)
    }
  }
}
