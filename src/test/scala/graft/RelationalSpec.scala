package graft

import graft.analytics.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("multiAgg groups by returnflag×linestatus with positive sums") {
    val rows = Relational.multiAgg(spark, sfDir).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("min_price") <= r.getAs[Double]("max_price"))
    }
  }

  test("joinRevenuePerNation covers exactly the nations that have orders") {
    val viaJoin = Relational.joinRevenuePerNation(spark, sfDir).count()
    val o = graft.sources.Tables.load(spark, sfDir, "orders")
    val c = graft.sources.Tables.load(spark, sfDir, "customer")
    val expected = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("c_nationkey").distinct().count()
    assert(viaJoin === expected)
  }

  test("windowTopKPerGroup returns at most 3 rows per customer, ranked") {
    val df = Relational.windowTopKPerGroup(spark, sfDir)
    val bad = df.groupBy("o_custkey").agg(count(lit(1)).as("n"), max("rk").as("m"))
      .filter(col("n") > 3 || col("m") > 3).count()
    assert(bad === 0)
  }

  test("left outer join keeps zero-order customers") {
    val df = Relational.joinLeftOuter(spark, sfDir)
    val c = graft.sources.Tables.load(spark, sfDir, "customer")
    val o = graft.sources.Tables.load(spark, sfDir, "orders")
    assert(df.count() === c.count())
    val expectedZero = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(df.filter(col("n_orders") === 0).count() === expectedZero)
  }

  test("semi+anti partition the customer set") {
    val df = Relational.joinSemiAnti(spark, sfDir)
    val customers = graft.sources.Tables.load(spark, sfDir, "customer").count()
    assert(df.count() === customers)
    assert(df.select("c_custkey").distinct().count() === customers)
  }

  test("q315 cube: margins sum to their cells and the grand total " +
      "counts every document") {
    val rows = Relational.cubeAgg(spark, sfDir).collect()
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val byMask = rows.groupBy(_.getAs[Int]("gmask"))
    // grand total (both dims rolled up): exactly one row, every doc
    val grand = byMask(3)
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n_docs") === docs.count())
    // each per-source margin (lang rolled up) sums its gmask-0 cells
    val cells = byMask(0)
    byMask(1).foreach { m =>
      val src = m.getAs[String]("source")
      assert(m.isNullAt(m.fieldIndex("lang")), m.toString)
      assert(m.getAs[Long]("n_docs") ===
        cells.filter(_.getAs[String]("source") == src)
          .map(_.getAs[Long]("n_docs")).sum, m.toString)
    }
    // each per-lang margin (source rolled up) likewise
    byMask(2).foreach { m =>
      val lang = m.getAs[String]("lang")
      assert(m.isNullAt(m.fieldIndex("source")), m.toString)
      assert(m.getAs[Long]("n_docs") ===
        cells.filter(_.getAs[String]("lang") == lang)
          .map(_.getAs[Long]("n_docs")).sum, m.toString)
    }
  }

  test("q316 variant extraction agrees with the string-reparse path") {
    val rows = Relational.variantExtract(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val direct = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("k").as("k_min"),
        max("k").as("k_max"), sum(col("k").cast("long")).as("k_sum"))
      .orderBy("event_type").collect()
    def key(r: org.apache.spark.sql.Row) = (
      r.getAs[String]("event_type"), r.getAs[Long]("n"),
      r.getAs[Int]("k_min"), r.getAs[Int]("k_max"),
      r.getAs[Long]("k_sum"))
    assert(rows.map(key).toSeq === direct.map(key).toSeq)
  }

  test("approx sketches land within their error bounds of the exact values") {
    val o = graft.sources.Tables.load(spark, sfDir, "orders")
    val exactDistinct = o.select("o_custkey").distinct().count().toDouble
    val exactP50 = o.selectExpr("percentile(o_totalprice, 0.5)").head.getDouble(0)
    val row = Relational.approxStats(spark, sfDir).head
    val approxDistinct = row.getAs[Long]("approx_customers").toDouble
    assert(math.abs(approxDistinct - exactDistinct) / exactDistinct < 0.06,
      s"HLL: $approxDistinct vs $exactDistinct")
    val approxP50 = row.getAs[Double]("approx_p50")
    // rank error ≤ n/accuracy; translate to a loose value band via the
    // exact p45-p55 range
    val lo = o.selectExpr("percentile(o_totalprice, 0.45)").head.getDouble(0)
    val hi = o.selectExpr("percentile(o_totalprice, 0.55)").head.getDouble(0)
    assert(approxP50 >= lo && approxP50 <= hi, s"p50: $approxP50 ∉ [$lo,$hi] (exact $exactP50)")
  }

  test("q322 observe: accumulator-collected counters equal a direct " +
      "aggregate recompute, and the observation rides a CollectMetrics " +
      "node (no second scan)") {
    import org.apache.spark.sql.functions._
    val row = graft.analytics.Relational.observeMetrics(spark, sfDir).head()
    val direct = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 10)
      .agg(count(lit(1)), sum((col("l_returnflag") === "R").cast("long")),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double"),
        min("l_orderkey"), max("l_orderkey"),
        countDistinct("l_returnflag"))
      .head()
    assert(row.getAs[Long]("n") === direct.getLong(0))
    assert(row.getAs[Long]("n_flag_r") === direct.getLong(1))
    assert(row.getAs[Double]("sum_qty") === direct.getDouble(2))
    assert(row.getAs[Long]("min_key") === direct.getLong(3))
    assert(row.getAs[Long]("max_key") === direct.getLong(4))
    assert(row.getAs[Long]("n_groups") === direct.getLong(5))
    // the observed plan shape: an Observation plants CollectMetrics in
    // the SAME plan the action drives — the zero-extra-scan property
    val obs = new org.apache.spark.sql.Observation("q322_spec")
    val observed = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 10)
      .observe(obs, count(lit(1)).as("n"))
    assert(observed.queryExecution.optimizedPlan.toString
      .contains("CollectMetrics"))
    observed.groupBy("l_returnflag").count().collect()
    assert(obs.get("n") === direct.getLong(0))
  }

  test("q338 collation: UTF8_LCASE grouping merges injected case " +
      "variants and every merged group proves it held mixed case") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Relational.collatedGroup(spark, sfDir)
      .collect()
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val wantGroups = docs.select(lower(col("source"))).distinct().count()
    assert(rows.length.toLong === wantGroups,
      "collated grouping did not merge to the case-insensitive key space")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // every source with a doc_id % 3 == 0 member must show 2 variants
    val mixed = docs.filter(col("doc_id") % 3 === 0)
      .select(lower(col("source"))).distinct()
      .collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      val want = if (mixed(r.getAs[String]("source_ci"))) 2 else 1
      assert(r.getAs[Int]("n_case_variants") === want, r.toString)
    }
  }
}
