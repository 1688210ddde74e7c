package graft

/** q152's exact/approx twin contract (the q81 pattern): the HLL++
  * distinct counts of the at-scale default profile must land in an error
  * band around the exact census, while null counts and the row count are
  * exact in both modes. */
class ColumnProfileSpec extends SparkSpec {

  test("approx profile: distincts within band of exact, nulls/rows exact") {
    val exact = graft.analytics.Advanced
      .columnProfile(spark, sfDir, approx = false)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.analytics.Advanced.columnProfile(spark, sfDir)
      .collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val c = r.getString(0)
      val e = exact(c)
      assert(r.getAs[Long]("n_rows") === e.getAs[Long]("n_rows"), c)
      assert(r.getAs[Long]("n_null") === e.getAs[Long]("n_null"), c)
      val ed = e.getAs[Long]("n_distinct").toDouble
      val ad = r.getAs[Long]("n_distinct").toDouble
      // HLL++ at the default rsd 0.05: 3σ band, with an absolute floor
      // for tiny cardinalities (where the sketch is exact anyway)
      assert(math.abs(ad - ed) <= math.max(0.15 * ed, 2.0),
        s"$c: approx $ad vs exact $ed")
    }
  }
}
