package graft

import graft.analytics.ExactQuantile
import org.apache.spark.sql.DataFrame

/** Contract tests for the q401 monotone-histogram selection: the answers
  * must equal a local sort's, on exactly the distributions lineitem never
  * produces — duplicate mass that keeps the active COUNT above the
  * exact-phase threshold through every histogram level, groups smaller
  * than the bin count, sub-ulp value pairs, and negative/mixed ranges. */
class ExactQuantileSpec extends SparkSpec {

  private val ptiles = Seq("p25" -> "0.25", "p50" -> "0.50",
    "p75" -> "0.75", "p90" -> "0.90", "p99" -> "0.99")
    .map { case (l, q) => l -> new java.math.BigDecimal(q) }

  /** Local oracle: rank ceil(q*n) via a plain sort. */
  private def expected(data: Seq[(String, Double)])
      : Map[(String, String), Double] =
    data.groupBy(_._1).flatMap { case (f, rows) =>
      val xs = rows.map(_._2).sorted
      ptiles.map { case (label, q) =>
        val r = q.multiply(new java.math.BigDecimal(xs.length))
          .setScale(0, java.math.RoundingMode.CEILING).intValueExact().max(1)
        (f, label) -> xs(r - 1)
      }
    }

  private def run(data: Seq[(String, Double)]): Map[(String, String), Double] = {
    import spark.implicits._
    val df: DataFrame = data.toDF("f", "x").repartition(4)
    ExactQuantile.select(spark, df, ptiles).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
  }

  test("matches a local sort on a smooth mixed-sign distribution") {
    val data = for (f <- Seq("A", "B"); i <- 1 to 5000)
      yield (f, math.sin(i * 2.39996) * 1e6 - 1234.5)
    assert(run(data) === expected(data))
  }

  test("duplicate mass heavier than the exact-phase threshold converges") {
    // 50k copies of one value straddled by light tails: the active count
    // never drops below ExactAt on the duplicate side, so the depth cap
    // must hand a tiny DISTINCT set to the exact phase
    val data = (1 to 50000).map(_ => ("D", 42.0)) ++
      (1 to 500).map(i => ("D", i / 7.0)) ++
      (1 to 500).map(i => ("D", 100.0 + i / 3.0))
    assert(run(data) === expected(data))
  }

  test("groups smaller than the bin count and rank-1 edges") {
    val data = Seq("T" -> 3.0, "T" -> 1.0, "T" -> 2.0, "S" -> 9.0)
    assert(run(data) === expected(data))
  }

  test("adjacent-ulp values select exactly") {
    val v = 1.0e9
    val data = (1 to 3000).map(_ => ("U", v)) ++
      (1 to 3000).map(_ => ("U", Math.nextUp(v))) ++
      (1 to 3000).map(_ => ("U", Math.nextDown(v)))
    assert(run(data) === expected(data))
  }

  test("constant column resolves without any histogram pass") {
    val data = (1 to 10).map(_ => ("C", -7.25))
    assert(run(data) === expected(data))
  }
}
