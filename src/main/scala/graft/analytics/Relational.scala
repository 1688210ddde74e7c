package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Relational operator surface (SURVEY.md §2.2-§2.6) generalized from the
  * reference's accidents pipeline to arbitrary relational inputs, expressed
  * as declarative DataFrame plans so Catalyst does pushdown/pruning/reorder.
  *
  * Determinism-for-oracle notes: every floating aggregate that the DuckDB
  * oracle re-computes goes through exact decimal sums (`dsum`) so the result
  * is independent of partitioning/accumulation order — a requirement at any
  * scale (a 100 TB sum must not change when the cluster re-partitions).
  */
object Relational {

  /** Order-insensitive exact sum of a double column: per-row values are cast
    * to DECIMAL(18,4) (exact, deterministic) and summed in decimal space,
    * then converted back to double. Matches
    * CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) in ANSI SQL. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact decimal mean: exact sum / exact count, one double division. */
  def davg(c: Column): Column = (dsum(c) / count(c)).cast(DoubleType)

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // --- §2.2 projections / filters / scalar predicates -----------------------

  /** P1+P4+P7+P9: defensive projection (intersection of wanted ∩ present,
    * data_cleaning.py:34-46), not-null filter, cast, arithmetic. */
  def scanProjectFilter(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val wanted = Seq("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate", "no_such_column")
    val present = wanted.filter(li.columns.contains)
    li.select(present.map(col): _*)
      .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
      .withColumn("line_idx", (col("l_linenumber") - 1).cast(IntegerType))
      .withColumn("revenue",
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4)).cast(DoubleType))
      .drop("l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P5: range + set-membership predicates (Severity BETWEEN 1 AND 4 /
    * isin, data_cleaning.py:97 generalized). */
  def filterRangeSet(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_totalprice").between(1000.0, 50000.0) &&
        col("o_orderstatus").isin("F", "O"))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")

  /** P6+P8+P10: when/otherwise conditional imputation + fillna
    * (data_cleaning.py:69-86). TESTDATA has no nulls, so nulls are first
    * injected deterministically with nullif, then repaired — exercising the
    * same expressions the cleaning stage uses. */
  def conditionalImpute(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("v_nulled",
        when(col("event_type") === "error", lit(null).cast(DoubleType))
          .otherwise(col("value")))
      .withColumn("ty_nulled",
        when(col("user_id") % 7 === 0, lit(null).cast(StringType))
          .otherwise(col("event_type")))
    ev.withColumn("v_imputed",
        when(col("v_nulled").isNull || isnan(col("v_nulled")), lit(0.0))
          .otherwise(col("v_nulled")))
      .na.fill(Map("ty_nulled" -> "Unknown"))
      .select("event_id", "user_id", "v_imputed", "ty_nulled")
      .orderBy("event_id")
  }

  // --- §2.3 date/time scalar functions --------------------------------------

  /** F1-F4: hour/dayofweek/month/year extraction (data_cleaning.py:90-93).
    * dayofweek keeps Spark/Hive semantics: 1 = Sunday (SURVEY §7.4 quirk). */
  def temporalFeatures(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        hour(col("o_orderdate")).as("hour_of_day"),
        dayofweek(col("o_orderdate")).as("day_of_week"),
        month(col("o_orderdate")).as("month_of_year"),
        year(col("o_orderdate")).as("year_of_date"))
      .orderBy("o_orderkey")

  // --- §2.4 aggregations -----------------------------------------------------

  /** A1: groupBy(col).count() ordered — severity-distribution pattern
    * (data_cleaning.py:144). Hash aggregate: partial map-side combine, one
    * shuffle on the (low-cardinality) key; scale-safe. */
  def groupCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n")).orderBy("o_orderstatus")

  /** A2 (+TPC-H Q1 shape): multi-aggregate groupBy — count/sum/avg/min/max +
    * stddev (kmeans_clustering.py:198-225 generalized). stddev is composed
    * from exact decimal sums so the result is partitioning-independent. */
  def multiAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val n = count(lit(1))
    val sx = dsum(col("l_extendedprice"))
    val sxx = dsum((col("l_extendedprice") * col("l_extendedprice"))
      .cast(DecimalType(28, 4)).cast(DoubleType))
    li.groupBy("l_returnflag", "l_linestatus").agg(
        n.as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        round(sqrt((sxx - sx * sx / n) / (n - lit(1))), 4).as("std_price"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A3: global aggregate — per-column means batched in ONE pass/ONE job
    * (nb cell 19 runs one job per column; at scale that is k full scans). */
  def globalMeans(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      davg(col("l_quantity")).as("mean_quantity"),
      davg(col("l_extendedprice")).as("mean_extendedprice"),
      davg(col("l_discount")).as("mean_discount"),
      davg(col("l_tax")).as("mean_tax"))

  /** A4: median — exact percentile for oracle parity (SURVEY §7.4 risk 4:
    * GK approxQuantile is merge-order-dependent; the approximate variant is
    * exposed separately in Cleaning.imputeMedian). */
  def medians(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg(
      round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_totalprice"),
      round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25_totalprice"),
      round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75_totalprice"))

  /** A5: one-pass null census over all columns (nb cell 17) — single job
    * regardless of column count. */
  def nullCensus(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").withColumn("v_nulled",
      when(col("event_type") === "error", lit(null).cast(DoubleType))
        .otherwise(col("value")))
    ev.select(ev.columns.toIndexedSeq.map(c =>
      sum(when(col(c).isNull, 1).otherwise(0)).as(s"nulls_$c")): _*)
  }

  /** A6: describe()-style summary as an explicit, oracle-checkable query
    * (count/mean/min/max per column; one aggregation job). */
  def describeStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").agg(
      count(lit(1)).as("n_rows"),
      davg(col("c_acctbal")).as("mean_acctbal"),
      min(col("c_acctbal")).as("min_acctbal"),
      max(col("c_acctbal")).as("max_acctbal"),
      countDistinct(col("c_mktsegment")).as("n_segments"))

  // --- joins / set ops (required by TESTDATA oracle; SURVEY §2.5) ------------

  /** Inner join chain with explicit broadcast of the small dims — revenue per
    * nation. At 100 TB, nation/customer-side dims stay broadcast; the only
    * shuffle is the final low-cardinality aggregation. */
  def joinRevenuePerNation(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("nation")
  }

  /** Left outer join + agg: order counts per customer INCLUDING zero-order
    * customers. */
  def joinLeftOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")
  }

  /** q78: FULL OUTER join with unmatched rows on BOTH sides (filtered
    * customers vs high-value orders), aggregated into match classes —
    * completes the join-type family (inner/left/semi/anti/cross are
    * q11-q13, q31+). */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_nationkey") < 5)
      .select(col("c_custkey"))
    // threshold chosen so ALL THREE classes are populated at sf0.01
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 250000.0)
      .select(col("o_orderkey"), col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(when(col("c_custkey").isNull, "order_only")
        .when(col("o_orderkey").isNull, "customer_only")
        .otherwise("matched").as("side"))
      .groupBy("side").agg(count(lit(1)).cast(IntegerType).as("n"))
      .orderBy("side")
  }

  /** Left-semi + left-anti joins (EXISTS / NOT EXISTS). */
  def joinSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 40000.0)
    val withBig = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_big_order").as("bucket"))
    val without = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_big_order").as("bucket"))
    withBig.unionAll(without).orderBy("c_custkey")
  }

  /** Union + distinct set semantics. */
  def unionDistinct(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val high = o.filter(col("o_totalprice") > 45000.0).select("o_orderkey")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    high.union(urgent).distinct().orderBy("o_orderkey")
  }

  /** Row-level set operations — INTERSECT and EXCEPT (the §2.5 family
    * members q13/q14 don't cover: semi/anti join on a KEY vs set ops on
    * whole distinct ROWS). Catalyst plans both as a distinct aggregate
    * over a left-semi/anti join — one hash exchange per side, the same
    * asymptotics as the joins they generalize. Customers are tagged by
    * whether they ordered in BOTH status classes or only the first. */
  def intersectExcept(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    val oo = o.filter(col("o_orderstatus") === "O").select("o_custkey")
    f.intersect(oo).withColumn("tag", lit("both"))
      .unionByName(f.except(oo).withColumn("tag", lit("only_f")))
      .orderBy("tag", "o_custkey")
  }

  // --- §2.6 sorts / limits / top-k -------------------------------------------

  /** O1+O2: total order + limit with deterministic tie-break. */
  def orderByLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** O4 generalized: per-group top-k via row_number window — the scalable
    * form of the reference's driver-side `sortBy.take(k)`
    * (random_forest.py:119-123). */
  def windowTopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      .orderBy("o_custkey", "rk")
  }

  /** q69: q16's top-k-per-group semantics via the custom TopKPerKey
    * physical operator (graft.plans.TopKPerKeyNode → partial/final
    * TopKPerKeyExec). Unlike the window form, no stage sorts a full
    * partition: map tasks ship ≤ k rows per key into the shuffle and
    * every stage holds ≤ k rows per key — aggregation-shaped top-k.
    * Shares q16's oracle semantics (minus the rank column). */
  def topkExecPerGroup(s: SparkSession, dir: String): DataFrame =
    org.apache.spark.sql.graft.topk.perKey(
        t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        Seq("o_custkey"), orderDesc = "o_totalprice", tieAsc = "o_orderkey",
        k = 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  /** Running-sum window (event-time cumulative value per user). */
  def windowRunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(18, 4))).over(w).cast(DoubleType))
      .select("user_id", "event_id", "running_value")
      .orderBy("user_id", "event_id")
  }

  /** lag/lead window: inter-event gap per user in seconds. */
  def windowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_s",
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).cast(DoubleType) / 1e6)
      .select("user_id", "event_id", "gap_s")
      .orderBy("user_id", "event_id")
  }

  /** M12 pattern as a relational query: contingency/confusion matrix via
    * groupBy().pivot() (random_forest.py:143-164 reshaped — SURVEY §2.8 M12
    * chooses the DataFrame pivot form). Pivot domain passed explicitly so no
    * extra distinct-values job runs. */
  def pivotMatrix(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0)
      .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
      .orderBy("o_orderpriority")

  /** JSON scalar extraction (events.props is a JSON string; counterpart of
    * the Kafka-producer JSON encode, SURVEY §2.3 note). */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .orderBy("event_id")

  /** Approximate sketches — HLL++ distinct counts and quantile sketches in
    * ONE pass. At 100 TB exact distinct counts shuffle every key; the
    * sketch shuffles a few KB per partition. Approximate ⇒ no bit-exact
    * oracle; error bounds are asserted in RelationalSpec against the exact
    * values (rsd=0.02 → HLL error ≤ ~3·rsd with high probability,
    * approx_percentile accuracy 10000 → rank error ≤ n/10000). */
  def approxStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg(
      approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx_customers"),
      expr("approx_percentile(o_totalprice, array(0.5, 0.99), 10000)")
        .as("pcts"))
      // scalar columns only: the driver's rows-only comparer pandas-sorts
      // the result and cannot hash an array<double> cell
      .select(col("approx_customers"),
        element_at(col("pcts"), 1).as("approx_p50"),
        element_at(col("pcts"), 2).as("approx_p99"))

  /** Tumbling-window event-time aggregation (batch form of the §2.10
    * streaming demonstration query; same plan Structured Streaming runs). */
  def tumblingWindowAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("hour_start", "event_type")

  /** q316: the Spark 4 VARIANT path — semi-structured ingest done the
    * new-engine way: `parse_json` turns the JSON string column into the
    * binary VARIANT type once, `variant_get` extracts a typed path from
    * it, and the aggregate runs over the typed value. Distinct from
    * q69's `get_json_object` (string re-parse per access): VARIANT
    * parses once into a shreddable binary encoding — the Spark-4
    * answer to "props columns" at warehouse scale, where a string
    * re-parse per predicate is the scan bottleneck. Oracle: DuckDB's
    * JSON extraction over the same column — the values, not the
    * encoding, must agree. */
  def variantExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'int')").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min("k").as("k_min"), max("k").as("k_max"),
        sum(col("k").cast(LongType)).as("k_sum"))
      .orderBy("event_type")

  /** q315: CUBE + grouping_id — the multi-level aggregate surface
    * (GROUP BY CUBE(source, lang)): every (source, lang) cell, both
    * one-dimension margins, and the grand total in ONE pass, each row
    * tagged with the grouping mask that says which dimensions are
    * rolled up. This is the OLAP operator dashboards sit on, and the
    * one aggregation shape `groupBy` can't express without 4 unioned
    * scans.
    *
    * Shape at 100 TB: Spark plans CUBE as a single Expand (4 grouping
    * sets ⇒ 4× intermediate rows) into one hash aggregate with
    * map-side partials — one corpus scan regardless of how many
    * margins are asked for; the alternative (a union of 4 groupBys) is
    * 4 scans. NULL here means "rolled up", which is why the mask
    * column — not the nulls — is the level key. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .cube(col("source"), col("lang"))
      .agg(grouping_id().cast(IntegerType).as("gmask"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .select(col("gmask"), col("source"), col("lang"),
        col("n_docs"), col("sum_chars"))
      .orderBy("gmask", "source", "lang")

  /** q338: STRING COLLATIONS (Spark 4) — case-insensitive GROUPING via
    * the `UTF8_LCASE` collation instead of a `lower()` rewrite: the
    * collation travels WITH THE TYPE, so every comparison, join and
    * aggregate downstream is case-blind without per-call normalization
    * — the warehouse answer to "customer ids arrive in mixed case from
    * three systems". The fixture's sources are single-case, so case
    * variance is injected deterministically (every 3rd doc's source
    * upper-cased); the collated groupBy must merge the variants back.
    * Output keys are `lower()`-normalized (a collated group's
    * REPRESENTATIVE case is engine-internal — the only deterministic
    * spelling of a case-insensitive key is a normalized one), and
    * `n_case_variants` proves each group genuinely held mixed case.
    * Oracle: DuckDB groups by `lower()` — value-identical iff the
    * collation semantics are exactly case-insensitive equality.
    *
    * Shape at 100 TB: collated grouping hashes the collation key —
    * same one-shuffle hash-agg as any groupBy; no expression rewrite
    * tax on every downstream predicate. */
  def collatedGroup(s: SparkSession, dir: String): DataFrame = {
    val src2 = when(col("doc_id") % 3 === 0, upper(col("source")))
      .otherwise(col("source"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), src2.as("src2"))
      .groupBy(collate(col("src2"), "UTF8_LCASE").as("k"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(collate(col("src2"), "UTF8_BINARY"))
          .cast(IntegerType).as("n_case_variants"))
      .select(lower(col("k")).as("source_ci"), col("n_docs"),
        col("sum_chars"), col("n_case_variants"))
      .orderBy("source_ci")
  }

  /** q322: OBSERVED METRICS — `Dataset.observe` + `Observation`, the
    * data-quality-counter surface every production job wants and naive
    * pipelines pay a second scan for: `observe` plants a
    * CollectMetrics node mid-plan whose aggregates (count / sum / min /
    * max — accumulator-mergeable, no shuffle) are computed AS A SIDE
    * EFFECT of whatever action drives the plan. Here the driven action
    * is the real downstream aggregate (per-flag counts); the quality
    * counters — row count past the filter, flagged-row count, exact
    * DECIMAL measure total, key range — ride that same scan for free.
    *
    * Shape at 100 TB: the alternative is a second full aggregation
    * query — a second 100 TB scan per quality dashboard refresh.
    * CollectMetrics is an AggregatingAccumulator merged per task:
    * zero extra jobs, zero shuffle, and the counters observe exactly
    * the rows the production job consumed (same filter, same moment) —
    * not a racy re-read. The DECIMAL(18,4) sum keeps the merge
    * order-independent (dsum's discipline), so the observed total is
    * bit-equal to the oracle's. */
  def observeMetrics(s: SparkSession, dir: String): DataFrame = {
    val obs = new org.apache.spark.sql.Observation("q322_dq")
    val filtered = t(s, dir, "lineitem")
      .filter(col("l_quantity") > 10)
      .observe(obs,
        count(lit(1)).as("n"),
        sum((col("l_returnflag") === "R").cast(LongType)).as("n_flag_r"),
        sum(col("l_quantity").cast(DecimalType(18, 4))).as("sum_qty"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))
    // the PRODUCTION action the counters ride (bounded: one row per
    // return flag) — no separate job runs for the observation
    val groups = filtered.groupBy("l_returnflag").count().collect()
    val m = obs.get
    import s.implicits._
    Seq((m("n").asInstanceOf[Long],
      m("n_flag_r").asInstanceOf[Long],
      m("sum_qty").asInstanceOf[java.math.BigDecimal].doubleValue,
      m("min_key").asInstanceOf[Long],
      m("max_key").asInstanceOf[Long],
      groups.length.toLong))
      .toDF("n", "n_flag_r", "sum_qty", "min_key", "max_key", "n_groups")
  }
}
