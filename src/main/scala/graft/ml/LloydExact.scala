package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorExprs.dotp
import graft.sources.Tables

/** Lloyd's K-Means implemented RELATIONALLY with bit-exact determinism — the
  * oracle-checkable twin of the MLlib job (KMeansJob wraps
  * kmeans_clustering.py:104-196; MLlib's k-means|| init is RNG- and
  * partitioning-dependent, so its outputs can only be band-checked). Here:
  *
  *  - init: centers = the K vectors with the smallest vec_id (deterministic);
  *  - assign: nearest center by ‖c‖² − 2·e·c (the ‖e‖² term is constant per
  *    row and cannot change the argmin), dot products in the codegen'd fixed-
  *    fold DotProduct expression, ties broken toward the smaller cluster id;
  *  - recompute: per-dimension means as exact DECIMAL(28,9) sums — the cast
  *    can never disagree across engines because embedding floats are dyadic
  *    rationals, which cannot terminate with a 5 at a decimal digit (that
  *    would need a 5^k factor in the denominator), so no rounding-mode edge
  *    exists;
  *  - every iteration is pure DataFrame algebra: crossJoin(broadcast(K rows))
  *    + window argmin + posexplode + two hash aggs. Nothing depends on
  *    partitioning or accumulation order, so the fixpoint is identical on
  *    1 core or 1000 executors — and identical to the DuckDB oracle.
  *
  * Scale: per iteration the big side is scanned once; the K-row center table
  * is broadcast; shuffles are the argmin window (keyed by vec_id) and the
  * (cluster × dim) agg — the same asymptotics as MLlib's Lloyd step.
  */
object LloydExact {
  val K = 4
  val Iters = 2 // recompute passes; assignment runs Iters+1 times

  private[graft] def points(s: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.load(s, dir, "embeddings"), "vec_id")
      .select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("e"))

  private def initCenters(pts: DataFrame): DataFrame = {
    val w = Window.orderBy("vec_id")
    pts.orderBy("vec_id").limit(K)
      .select((row_number().over(w) - 1).cast(IntegerType).as("cluster"),
        col("e").as("c"))
  }

  /** Deterministic centers after `Iters` exact Lloyd rounds — doubles as
    * the coarse quantizer for IVF-style ANN (Similarity.annIvf).
    *
    * Each iteration's K-row centers frame is localCheckpoint'ed: the
    * consumer plan references centers several times (assignment, final
    * stats, IVF probe sides), and without truncation every reference
    * re-nests — and re-executes — the whole iteration chain. Checkpointing
    * K rows costs nothing and makes each reference an RDD scan. */
  private[graft] def centersFor(pts: DataFrame): DataFrame = {
    var centers = initCenters(pts)
    for (_ <- 0 until Iters)
      centers = recompute(assign(pts, centers)).localCheckpoint()
    centers
  }

  /** Argmin assignment: (vec_id, e, cluster). */
  private[graft] def assign(pts: DataFrame, centers: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("d"), col("cluster"))
    pts.crossJoin(broadcast(centers))
      .withColumn("d", dotp(col("c"), col("c")) - lit(2.0) * dotp(col("e"), col("c")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "e", "cluster")
  }

  /** Per-cluster per-dimension exact-decimal means → new center arrays. */
  private def recompute(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("e")).as(Seq("pos", "val")))
      .groupBy("cluster", "pos")
      .agg((sum(col("val").cast(DecimalType(28, 9))).cast(DoubleType) /
        count(lit(1))).as("m"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("c"))

  /** q57: cluster sizes + center norms after `Iters` exact Lloyd rounds. */
  def clusterQuery(s: SparkSession, dir: String): DataFrame = {
    val pts = points(s, dir)
    val centers = centersFor(pts)
    val norms = centers.select(col("cluster"),
      round(sqrt(dotp(col("c"), col("c"))), 6).as("center_norm"))
    assign(pts, centers)
      .groupBy("cluster").agg(count(lit(1)).as("n"))
      .join(norms, "cluster")
      .select("cluster", "n", "center_norm")
      .orderBy("cluster")
  }

  // ---------------------------------------------------------------- oracle
  private[graft] def dotS(a: String, b: String): String =
    s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
       |  list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])),
       |  (x, y) -> x + y)""".stripMargin.replace("\n", " ")

  private[graft] def assignS(pts: String, centers: String): String =
    s"""SELECT vec_id, e, cluster FROM (
       |  SELECT v.vec_id, v.e, c.cluster,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
       |      ${dotS("c.c", "c.c")} - 2 * ${dotS("v.e", "c.c")}, c.cluster) AS rn
       |  FROM $pts v CROSS JOIN $centers c) WHERE rn = 1""".stripMargin

  private val recomputeS =
    s"""SELECT cluster, list(m ORDER BY pos) AS c FROM (
       |  SELECT cluster, pos,
       |    CAST(SUM(CAST(val AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS m
       |  FROM (SELECT cluster, u['pos'] AS pos, u['val'] AS val FROM (
       |        SELECT cluster, unnest(list_transform(
       |          generate_series(1, len(e)),
       |          i -> {'pos': i - 1, 'val': e[i]})) AS u
       |        FROM ASSIGNED))
       |  GROUP BY cluster, pos)
       |GROUP BY cluster""".stripMargin

  /** Parameterized CTE chain "<p>e, <p>c0, <p>a1, <p>c1, …, <p>afinal" —
    * <p>afinal = the assignment under the final centers <p>c`Iters`,
    * over an arbitrary (vec_id, e) source SQL. Multiple independent
    * chains (distinct prefixes) can share one statement — the PQ oracle
    * (TopK q201) runs one per sub-vector block. */
  private[graft] def lloydCtesFor(srcE: String, p: String): String = {
    val iterCtes = (1 to Iters).map { i =>
      val prev = if (i == 1) s"${p}c0" else s"${p}c${i - 1}"
      s"""${p}a$i AS (${assignS(s"${p}e", prev)}),
         |${p}c$i AS (${recomputeS.replace("ASSIGNED", s"${p}a$i")})"""
        .stripMargin
    }.mkString(",\n")
    s"""${p}e AS ($srcE),
       |${p}c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
       |    AS INTEGER) AS cluster, e AS c
       |  FROM (SELECT * FROM ${p}e ORDER BY vec_id LIMIT $K)),
       |$iterCtes,
       |${p}afinal AS (${assignS(s"${p}e", s"${p}c$Iters")})""".stripMargin
  }

  /** Shared CTE chain "e, c0, a1, c1, …, afinal" — afinal = the cell
    * assignment under the final centers c`Iters`. Reused by the IVF-ANN
    * oracle (Similarity q61). */
  private[graft] def lloydCtesS: String = lloydCtesFor(
    """SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings""".stripMargin, "")

  def oracleSql: Map[String, String] =
    Map("q57_kmeans_lloyd" ->
      s"""WITH $lloydCtesS
         |SELECT a.cluster, COUNT(*) AS n,
         |  round(sqrt(${dotS("c.c", "c.c")}), 6) AS center_norm
         |FROM afinal a JOIN c$Iters c ON a.cluster = c.cluster
         |GROUP BY a.cluster, c.c ORDER BY a.cluster""".stripMargin)
}
