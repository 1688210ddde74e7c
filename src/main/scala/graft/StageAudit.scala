package graft

import org.apache.spark.sql.SparkSession

/** Stage-level attribution for one registered query: where does the
  * wall clock go — scan (input bytes), shuffle (read+write bytes), or
  * CPU (summed executor task time vs wall)? Built for the scale-ramp
  * follow-ups ("is pca_power's ×100 ratio scan-bound or
  * shuffle-bound?"), generic over any `SparkEntry.queries` name.
  *
  * Usage: StageAudit <sfDir> <queryName> [reps]
  * Prints one JSON line:
  * {"metric":"stage_audit","name":…,"wall_sec":…,"executor_sec":…,
  *  "input_mb":…,"shuffle_write_mb":…,"shuffle_read_mb":…,
  *  "stages":…,"tasks":…}
  * Numbers are summed over the LAST rep only (peaks reset between
  * reps), so warm-cache effects of earlier reps don't pollute the
  * attribution. */
object StageAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageAudit <sfDir> <queryName> [reps]")
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
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
    import java.util.concurrent.atomic.AtomicLong
    val input = new AtomicLong; val shufW = new AtomicLong
    val shufR = new AtomicLong; val cpuMs = new AtomicLong
    val stages = new AtomicLong; val tasks = new AtomicLong
    def reset(): Unit =
      Seq(input, shufW, shufR, cpuMs, stages, tasks).foreach(_.set(0))
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = e.stageInfo.taskMetrics
          input.addAndGet(m.inputMetrics.bytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          cpuMs.addAndGet(m.executorRunTime)
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks.toLong)
          ()
        }
      })
    var wall = 0.0
    for (_ <- 1 to reps) {
      // drain the async listener bus from the previous rep, then reset
      Thread.sleep(1500)
      reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      wall = (System.nanoTime() - t0) / 1e9
    }
    Thread.sleep(1500) // let the listener bus drain the final rep
    def mb(b: AtomicLong): Double = b.get() / (1024.0 * 1024.0)
    println(f"""{"metric":"stage_audit","name":"$name","dir":"$dir","wall_sec":$wall%.3f,"executor_sec":${cpuMs.get() / 1e3}%.3f,"input_mb":${mb(input)}%.1f,"shuffle_write_mb":${mb(shufW)}%.1f,"shuffle_read_mb":${mb(shufR)}%.1f,"stages":${stages.get()},"tasks":${tasks.get()}}""")
    spark.stop()
  }
}
