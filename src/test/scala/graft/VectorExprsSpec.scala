package graft

import graft.functions.VectorExprs.dotp
import org.apache.spark.sql.functions._

class VectorExprsSpec extends SparkSpec {

  test("DotProduct matches the higher-order fold bit-exactly (codegen + interpreted)") {
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .withColumn("e", col("embedding").cast("array<double>"))
      .withColumn("e2", reverse(col("e")))
    val both = emb.select(
      dotp(col("e"), col("e2")).as("native"),
      aggregate(zip_with(col("e"), col("e2"), _ * _), lit(0.0), _ + _).as("fold"))
    // bitwise equality — same sequential fold order
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
    assert(both.count() > 0)
  }

  test("DotProduct handles nulls and length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 9.0))), // min length → 11
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(dotp(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
  }

  test("DotProduct participates in whole-stage codegen") {
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .withColumn("e", col("embedding").cast("array<double>"))
      .select(dotp(col("e"), col("e")).as("d"))
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage;
    // dot_product must appear inside one, not in a fallback Project
    val plan = emb.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("dot_product") && l.trim.startsWith("*(")), plan.take(500))
  }
}
