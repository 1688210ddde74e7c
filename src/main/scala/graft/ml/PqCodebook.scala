package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorExprs.dotp

/** q201: PRODUCT-QUANTIZATION CODEBOOKS — the vector-compression step
  * IVF-PQ indexes pair with q61's coarse quantizer (Jégou et al. 2011):
  * the 64-dim embedding splits into `Blocks` contiguous sub-vectors,
  * each sub-space trains its own small codebook (here [[LloydExact]]'s
  * deterministic K=4, 2-iteration Lloyd — the oracle-checkable twin of
  * a production k-means), and every vector is coded as `Blocks` symbols
  * — 64 floats → 4 bytes here; the same machinery at production sizes
  * (M=8..64 blocks, 256 centroids) is a config, not a code change.
  * Reports, per (block, cluster): the cell population and the exact
  * reconstruction MSE — the quantization-error curve that sizes K and
  * M for a target recall.
  *
  * Determinism: sub-vector Lloyd inherits LloydExact's bit-exact
  * discipline (first-K init, decimal center means, argmin tie-break);
  * the per-row squared error ‖e‖² − 2·e·c + ‖c‖² is the fixed-fold
  * codegen'd expression, rounded to 9dp at the row and summed in
  * DECIMAL(28,9) — order-independent, identical in the DuckDB twin
  * (one Lloyd CTE chain per block, prefixed).
  *
  * Shape at 100 TB: per block, Lloyd's per-iteration cost is one scan
  * + K-row broadcast + argmin window (LloydExact's asymptotics) over a
  * `dim/Blocks`-wide slice; blocks are independent (a production run
  * trains them concurrently); the final stats are one hash-agg per
  * block on (cluster). */
object PqCodebook {
  val Blocks = 4
  val SubDim = 16 // 64 / Blocks

  def pqCodebooks(s: SparkSession, dir: String): DataFrame = {
    val pts = LloydExact.points(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts.count() // eager fill: every block's Lloyd chain reads this
    try {
      // sub-spaces are independent by construction — train all four
      // codebooks in ONE wave (the q38 elbow pattern): each chain's
      // per-iteration jobs are tiny on the fixture, so sequential
      // training is scheduler-bound, not compute-bound. Results are
      // identical either way (each chain is a pure function of pts).
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(Blocks)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val perBlock = try {
        Await.result(Future.sequence((0 until Blocks).map { b =>
          Future {
            val sub = pts.select(col("vec_id"),
              slice(col("e"), b * SubDim + 1, SubDim).as("e"))
            val centers = LloydExact.centersFor(sub)
            val sqerr = dotp(col("e"), col("e")) -
              lit(2.0) * dotp(col("e"), col("c")) + dotp(col("c"), col("c"))
            LloydExact.assign(sub, centers)
              .join(broadcast(centers), Seq("cluster"))
              .groupBy("cluster").agg(count(lit(1)).as("n"),
                sum(round(sqerr, 9).cast(DecimalType(28, 9))).as("se"))
              .select(lit(b).as("block"), col("cluster"), col("n"),
                round(col("se").cast(DoubleType) / col("n"), 6).as("mse"))
              .localCheckpoint() // materialize inside the wave
          }
        }), Duration(10, "min"))
      } finally { pool.shutdownNow(); () }
      perBlock.reduce(_ unionByName _)
        .orderBy("block", "cluster")
        .localCheckpoint()
    } finally { pts.unpersist(); () }
  }

  def oracleSql: Map[String, String] = {
    import LloydExact.{dotS, Iters}
    val blockCtes = (0 until Blocks).map { b =>
      LloydExact.lloydCtesFor(
        s"""SELECT vec_id, list_slice(e0.e, ${b * SubDim + 1},
           | ${(b + 1) * SubDim}) AS e FROM e0""".stripMargin
          .replace("\n", " "),
        s"b$b")
    }.mkString(",\n")
    val blockSelects = (0 until Blocks).map { b =>
      val sqerr = s"${dotS("a.e", "a.e")} - 2 * ${dotS("a.e", "c.c")}" +
        s" + ${dotS("c.c", "c.c")}"
      s"""SELECT $b AS block, a.cluster, COUNT(*) AS n,
         |  round(CAST(SUM(CAST(round($sqerr, 9) AS DECIMAL(28,9)))
         |      AS DOUBLE) / COUNT(*), 6) AS mse
         |FROM b${b}afinal a JOIN b${b}c$Iters c ON a.cluster = c.cluster
         |GROUP BY a.cluster""".stripMargin
    }.mkString("\nUNION ALL\n")
    Map("q201_pq_codebook" ->
      s"""WITH e0 AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |$blockCtes
         |$blockSelects
         |ORDER BY block, cluster""".stripMargin)
  }
}
