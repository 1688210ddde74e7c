package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR.
  * Streams ONE JSON line per completed query ({"metric":"query",...}) so a
  * mid-run kill (host timeout, OOM-killer) still leaves every completed
  * timing on stdout, then prints the final aggregate line
  * {"metric":"total","queries":{...}} — consumers that only want the
  * summary read the last "total" line; consumers recovering a crashed run
  * replay the per-query lines. A light warmup pass runs first so per-query
  * numbers measure the query, not JVM/session/codegen warmup (without it,
  * whichever query runs first absorbs ~5 s of one-time cost and the
  * comparison to BASELINE is noise). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // contract: bench runs at local[32] (all cores); env only overrides down
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) =>
      builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // a crashing query must not report its time-to-failure as a valid
    // measurement: record the sentinel -1 and list it under "failed"
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failed += name; -1.0 }
    }
    // light warmup: a few cheap queries absorb session/codegen/parquet-footer
    // one-time costs without doubling the whole bench run
    val doWarmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1"
    if (doWarmup)
      Seq("q01_scan_project_filter", "q05_group_count", "q31_cosine_topk")
        .filter(SparkEntry.queries.contains).foreach(runOne)
    val results = names.map { n =>
      val sec = runOne(n)
      // stream each result immediately: a killed run keeps everything done
      println(s"""{"metric":"query","name":"$n","value":$sec,"unit":"sec"}""")
      Console.out.flush()
      n -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
