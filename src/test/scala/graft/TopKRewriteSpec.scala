package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized equivalence harness for the RewriteWindowTopK rule: over
  * seeded random datasets (duplicate keys, duplicate order values, ties
  * broken by a unique id — the engine's total-order convention), the
  * rank-dropping form (which the rule lowers to TopKPerKeyExec) must
  * return exactly the rows of the rank-keeping form (which the rule must
  * leave as a Window). One canary assertion per form pins that the rule
  * actually fired / actually skipped, so the equivalence isn't vacuously
  * comparing two window plans. */
class TopKRewriteSpec extends SparkSpec {

  test("rewritten top-k equals the window form on 20 random datasets") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(4)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(10), i.toLong)
      }
      val df = rows.toDF("key", "value", "id")
      val w = Window.partitionBy("key")
        .orderBy(col("value").desc, col("id"))
      // rank-dropping form: the rule lowers this to TopKPerKey
      val rewritten = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("key", "value", "id")
      // rank-keeping form: rn stays in the OUTPUT (a trailing select would
      // collapse and re-enable the rule), dropped driver-side below
      val baseline = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("key", "value", "id", "rn")
      val rPlan = rewritten.queryExecution.executedPlan.toString
      val bPlan = baseline.queryExecution.executedPlan.toString
      assert(rPlan.contains("TopKPerKey"), s"seed $seed: rule did not fire")
      assert(!bPlan.contains("TopKPerKey") && bPlan.contains("Window"),
        s"seed $seed: rule fired on the rank-keeping form")
      val got = rewritten.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val want = baseline.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === want, s"seed $seed (n=$n, k=$k)")
      // size sanity: k rows per key that has >= k members
      val perKey = rows.groupBy(_._1).view.mapValues(_.size)
      assert(got.size === perKey.values.map(math.min(_, k)).sum)
    }
  }
}
