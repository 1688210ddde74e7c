package graft

import graft.functions.VectorExprs.dotp
import graft.ml.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("TopKAgg unit semantics: bounded, ordered, deterministic tie-break") {
    val agg = new TopK.TopKAgg(3)
    val cands = Seq(
      TopK.Cand(0.5, 7, 1), TopK.Cand(0.9, 3, 2), TopK.Cand(0.9, 1, 0),
      TopK.Cand(0.2, 9, 1), TopK.Cand(0.7, 4, 2))
    val folded = cands.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(folded).map(_.id) === Seq(1, 3, 4)) // 0.9/id1, 0.9/id3, 0.7
    // merge of partial buffers gives the same result as one fold
    val (l, r) = cands.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged === folded)
  }

  test("aggregator top-k matches the window row_number form on real pairs") {
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .withColumn("e", col("embedding").cast("array<double>"))
      .withColumn("nrm", sqrt(dotp(col("e"), col("e"))))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val cand = emb.select(col("vec_id").as("id"), col("e").as("ne"),
      col("nrm").as("nn"), col("label").as("payload"))
    val pairs = cand.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("sim", dotp(col("qe"), col("ne")) / (col("qn") * col("nn")))
      .select("query_id", "sim", "id", "payload")
    val viaAgg = TopK.topKPerGroup(pairs, "query_id", 5)
      .select("query_id", "id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id"))
    val viaWindow = pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("query_id", "id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("partial aggregation keeps the exchange at O(groups·k) rows") {
    import spark.implicits._
    val pairs = (1 to 1000).map(i => (i % 7L, i / 1000.0, i.toLong, 0))
      .toDF("query_id", "sim", "id", "payload")
    val plan = TopK.topKPerGroup(pairs, "query_id", 3)
      .queryExecution.executedPlan.toString
    // partial_topkagg before the exchange = map-side combine is active
    assert(plan.contains("partial_topkagg"), plan)
  }
}
