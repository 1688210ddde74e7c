package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** q401: EXACT distributed quantiles WITHOUT a sort — iterative
  * monotone-histogram selection (the Munro–Paterson / multi-pass
  * selection family, e.g. "Selection and Sorting with Limited Storage",
  * TCS 1980). Per return flag, the EXACT p25/p50/p75/p90/p99 of
  * l_extendedprice — the element at rank ceil(q·n), bit-identical to the
  * oracle's ORDER BY + row_number selection — computed with ZERO row
  * shuffle:
  *
  *   - each (flag, ptile) selection state tracks a candidate range as a
  *     PATH of bin choices, refined one histogram level per pass;
  *   - one scan per level serves ALL states: every row contributes a
  *     bin index per state (or −1) through an `array`+`posexplode`,
  *     partial-aggregated map-side to ≤ states×B rows before the only
  *     (tiny, fixed-size) exchange;
  *   - bin functions are clamp(floor((x−lo)/w), 0, B−1) — MONOTONE in x,
  *     so cumulative bin counts select the k-th smallest exactly even
  *     when IEEE boundary rounding places a value one bin off its
  *     nominal numeric range (membership is always "path of bins", never
  *     a float comparison against recomputed endpoints — the classic
  *     off-by-an-ulp trap in recursive selection);
  *   - a state exits to the EXACT phase when its active count ≤ 4096 or
  *     after 8 levels (width then < range/256⁸, leaving a handful of
  *     distinct doubles even when duplicate mass keeps the COUNT large);
  *     the exact phase is one groupBy(value).count over path members —
  *     a bounded driver collect, asserted ≤ 262144 rows — then a driver
  *     walk to the remaining rank.
  *
  * Shape at 100 TB: 10¹² rows/flag resolves in ~4 histogram levels
  * (256-way shrink per level: 4·10⁹ → 1.5·10⁷ → 6·10⁴ → ≤4096) + one
  * exact pass — ~6 column scans, driver state O(states×B), and no
  * row-grain exchange anywhere. Contrast q08's approxQuantile (one pass,
  * approximate) and [[RangeIndex]] (one range shuffle, row-grain): this
  * is the exact-answer path that survives when the column doesn't fit a
  * shuffle. Reference ground: us-accidents computes medians via
  * approxQuantile (spark/data_cleaning.py:67) — this is the exact twin.
  */
object ExactQuantile {

  private val B = 256          // bins per histogram level
  private val ExactAt = 4096L  // active count at which the exact phase runs
  private val MaxDepth = 8     // 256^8 width shrink ⇒ sub-ulp ranges
  private val Ptiles: Seq[(String, java.math.BigDecimal)] =
    Seq("p25" -> "0.25", "p50" -> "0.50", "p75" -> "0.75",
        "p90" -> "0.90", "p99" -> "0.99")
      .map { case (l, q) => l -> new java.math.BigDecimal(q) }

  /** One selection state: the rank-`rank` smallest element among the
    * active multiset (rows of `flag` whose value follows `path`). */
  private final case class State(flag: String, ptile: String, rank: Long,
                                 active: Long,
                                 path: List[(Double, Double, Int)], // (lo, w, bin)
                                 lo: Double, hi: Double,
                                 resolved: Option[Double])

  /** Monotone clamped bin index of `x` for level (lo, w). */
  private def binOf(x: Column, lo: Double, w: Double): Column =
    least(greatest(floor((x - lit(lo)) / lit(w)), lit(0)), lit(B - 1))
      .cast(IntegerType)

  /** Membership predicate: the state's whole bin path re-evaluated. */
  private def onPath(flagCol: Column, x: Column, st: State): Column =
    st.path.foldLeft(flagCol === lit(st.flag)) {
      case (acc, (lo, w, b)) => acc && binOf(x, lo, w) === lit(b)
    }

  def exactQuantiles(s: SparkSession, dir: String): DataFrame = {
    val df = graft.sources.Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag").as("f"),
        col("l_extendedprice").cast(DoubleType).as("x"))
    select(s, df, Ptiles).toDF("l_returnflag", "ptile", "value")
      .orderBy("l_returnflag", "ptile")
  }

  /** The selection core over any (f: string, x: double) frame — split out
    * so the spec can drive adversarial fixtures (duplicate mass that
    * never drops below the exact-phase count, sub-ulp ranges, tiny
    * groups) that lineitem's smooth distribution never produces. */
  private[graft] def select(s: SparkSession, df: DataFrame,
                            ptiles: Seq[(String, java.math.BigDecimal)])
      : DataFrame = {
    import s.implicits._
    // pass 0: per-flag count/min/max (3 rows on the driver)
    val stats = df.groupBy("f")
      .agg(count(lit(1)).as("n"), min("x").as("lo"), max("x").as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))

    var states: Seq[State] = for {
      (flag, n, lo, hi) <- stats.toSeq if n > 0
      (label, q)        <- ptiles
    } yield {
      val rank = q.multiply(new java.math.BigDecimal(n))
        .setScale(0, java.math.RoundingMode.CEILING).longValueExact().max(1L)
      State(flag, label, rank, n, Nil, lo, hi,
        resolved = if (lo == hi) Some(lo) else None)
    }

    // histogram levels: one scan refines every unresolved wide state; a
    // state whose range has collapsed below B·ulp can't subdivide (w = 0
    // under ANSI would divide by zero) — it exits to the exact phase,
    // where its path holds at most a handful of distinct doubles
    def refinable(st: State): Boolean =
      st.resolved.isEmpty && st.active > ExactAt && (st.hi - st.lo) / B > 0
    var depth = 0
    while (depth < MaxDepth && states.exists(refinable)) {
      val live = states.zipWithIndex.filter { case (st, _) => refinable(st) }
      val slots = array(live.zipWithIndex.map { case ((st, _), slot) =>
        val w = (st.hi - st.lo) / B
        when(onPath(col("f"), col("x"), st), binOf(col("x"), st.lo, w))
          .otherwise(lit(-1)).as(s"s$slot")
      }: _*)
      val hist = df.select(posexplode(slots).as(Seq("slot", "bin")))
        .where(col("bin") >= 0)
        .groupBy("slot", "bin").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1)
      val updated = live.zipWithIndex.map { case ((st, idx), slot) =>
        val w = (st.hi - st.lo) / B
        val bins = hist.getOrElse(slot, Array.empty)
          .map(t => t._2 -> t._3).sortBy(_._1)
        // walk cumulative counts to the bin holding the target rank
        var rem = st.rank; var chosen = -1; var inBin = 0L
        val it = bins.iterator
        while (chosen < 0 && it.hasNext) {
          val (b, c) = it.next()
          if (rem <= c) { chosen = b; inBin = c } else rem -= c
        }
        require(chosen >= 0,
          s"q401: rank ${st.rank} not reached for ${st.flag}/${st.ptile}")
        val nlo = st.lo + chosen * w
        val nhi = if (chosen == B - 1) st.hi else st.lo + (chosen + 1) * w
        idx -> st.copy(rank = rem, active = inBin,
          path = st.path :+ ((st.lo, w, chosen)),
          lo = nlo, hi = math.max(nhi, nlo))
      }.toMap
      states = states.zipWithIndex.map { case (st, i) =>
        updated.getOrElse(i, st) }
      depth += 1
    }

    // exact phase: ONE scan collects the surviving candidate multisets
    // (distinct value + count per state) for all still-unresolved states
    val pending = states.zipWithIndex.filter(_._1.resolved.isEmpty)
    val resolvedTail: Map[Int, Double] = if (pending.isEmpty) Map.empty else {
      val slots = array(pending.zipWithIndex.map { case ((st, _), slot) =>
        when(onPath(col("f"), col("x"), st), lit(slot)).otherwise(lit(-1))
          .as(s"e$slot")
      }: _*)
      val rows = df.select(col("x"), explode(slots).as("slot"))
        .where(col("slot") >= 0)
        .groupBy("slot", "x").agg(count(lit(1)).as("c"))
        .collect()
      require(rows.length <= 262144,
        s"q401: exact phase collected ${rows.length} rows — selection " +
          "did not converge (bounded-collect contract)")
      val bySlot = rows.map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
        .groupBy(_._1)
      pending.zipWithIndex.map { case ((st, idx), slot) =>
        val vals = bySlot.getOrElse(slot, Array.empty)
          .map(t => t._2 -> t._3).sortBy(_._1)
        var rem = st.rank; var ans = Double.NaN; var found = false
        val it = vals.iterator
        while (!found && it.hasNext) {
          val (v, c) = it.next()
          if (rem <= c) { ans = v; found = true } else rem -= c
        }
        require(found,
          s"q401: exact walk exhausted for ${st.flag}/${st.ptile}")
        idx -> ans
      }.toMap
    }

    val out = states.zipWithIndex.map { case (st, i) =>
      (st.flag, st.ptile,
        st.resolved.getOrElse(resolvedTail(i)))
    }
    s.createDataset(out).toDF("f", "ptile", "value")
  }

  /** Oracle: the sort-based selection this operator refuses to run at
    * scale — row_number per flag, pick rank ceil(q·n). DECIMAL literals
    * keep ceil(q·n) integer-exact on both engines (0.9/0.99 are not
    * binary-representable; the engine side uses BigDecimal CEILING). */
  val oracleSql: Map[String, String] = Map(
    "q401_exact_quantiles" ->
      """WITH s AS (
        |  SELECT l_returnflag, l_extendedprice AS x,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_extendedprice) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |q(ptile, f) AS (VALUES
        |  ('p25', CAST(0.25 AS DECIMAL(4,2))), ('p50', 0.50),
        |  ('p75', 0.75), ('p90', 0.90), ('p99', 0.99))
        |SELECT l_returnflag, ptile, x AS value
        |FROM s JOIN q ON rn = CAST(CEIL(f * n) AS BIGINT)
        |ORDER BY l_returnflag, ptile""".stripMargin)
}
