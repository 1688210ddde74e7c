package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    // diagnostic-only overrides, e.g. SPARK_GRAFT_EXTRA_CONFS=
    //   "spark.sql.codegen.maxFields=150,spark.sql.codegen.wholeStage=false"
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 1 && args(1) == "--roundtrip") roundTripBreakdown(spark, sfDir)
    else args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"$q rows=$n time=${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }

  /** Write-vs-read cost split of the q102–q104 format round-trips, with
    * parquet as the format-neutral control: isolates each format's
    * rendering/parsing cost from the generic staging-write overhead. */
  private def roundTripBreakdown(s: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.sources.Sinks
    def run(fmt: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-rtprof-$fmt")
      try {
        // the EXACT projection + write/read dispatch q102–q104 use
        // (shared Sinks helpers — the profiler cannot drift from them)
        val src = graft.sources.Tables.load(s, sfDir, "lineitem")
          .select(Sinks.RtCols.map(col): _*)
        val path = tmp.resolve("d").toString
        val t0 = System.nanoTime()
        Sinks.rtWrite(src, fmt, path)
        val t1 = System.nanoTime()
        val back = Sinks.rtRead(s, fmt, path, src.schema)
        val n = back.groupBy("l_returnflag").agg(count(lit(1))).count()
        val t2 = System.nanoTime()
        println(f"$fmt%-8s write=${(t1 - t0) / 1e9}%6.2f s  read+agg=${(t2 - t1) / 1e9}%6.2f s  groups=$n")
      } finally graft.sources.Tables.rmTree(tmp)
    }
    // warm the scan cache once so format costs aren't confounded with the
    // first-touch parquet read of lineitem
    run("parquet")
    Seq("parquet", "orc", "csv", "json").foreach(run)
  }
}
