package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import scala.jdk.CollectionConverters._

/** Deterministic decision-tree twin of the RandomForest job — the
  * oracle-checkable counterpart of RandomForestJob (random_forest.py:101-123;
  * MLlib's forest is RNG-dependent — bootstrap + feature subsets + seeded
  * binning — so q37 can only be rows-checked). Here: one depth-2 tree with
  * EXACT gini over quantile-binned candidate thresholds, every step pure
  * DataFrame algebra with integer-count arithmetic, so the result is
  * bit-identical on any partitioning and to the DuckDB oracle.
  *
  * Design mirrors how distributed tree learners actually scale (Spark ML's
  * own maxBins): candidate thresholds are computed ONCE at the root as
  * per-feature quantile bin edges (ntile over a deterministic (val, id)
  * order), then every node evaluates all candidates from ONE pass of
  * per-(node, feature, bin, class) counts + a cumulative window — cost per
  * depth level is one scan + one hash agg + one tiny window, independent of
  * the number of candidates evaluated.
  *
  * Determinism audit:
  *  - thresholds are raw float values (exact in DOUBLE on both engines);
  *  - split scores derive only from integer counts: nL, ΣcL², nR, ΣcR²
  *    (squares summed in DECIMAL(38,0) ≙ DuckDB HUGEINT — no long overflow
  *    at scale, exact on both engines);
  *  - the weighted-gini double is ONE fixed-shape expression
  *    `nL - SL/nL + nR - SR/nR` over exactly-representable integers —
  *    IEEE-identical on both engines; ties broken by (score, feat, t);
  *  - leaf majority ties break toward the smaller label.
  */
object GiniStump {
  val MaxBins = 16
  val NumFeats = 4 // embedding components used as features f0..f3

  private val dec = DecimalType(38, 0)
  private def featNames = (0 until NumFeats).map(j => s"f$j")

  private[graft] def pts(s: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.load(s, dir, "embeddings"), "vec_id")
      .select(col("vec_id").as("id") +: col("label") +:
        (0 until NumFeats).map(j =>
          col("embedding").getItem(j).cast(DoubleType).as(s"f$j")): _*)

  /** wide (id, label, [node,] f0..f3) → long (id, label, [node,] feat, val) */
  private[graft] def toLong(wide: DataFrame): DataFrame = {
    val keep = wide.columns.filterNot(featNames.contains).map(col).toSeq
    wide.select(keep :+ explode(array(featNames.map(f =>
        struct(lit(f).as("feat"), col(f).as("val"))): _*)).as("u"): _*)
      .select(keep :+ col("u.feat").as("feat") :+ col("u.val").as("val"): _*)
  }

  /** Per-feature candidate thresholds: the max value of each of MaxBins
    * quantile buckets (deterministic (val, id) order), deduped. ≤64 rows.
    *
    * SCOPE: exact ntile sorts the full dataset in NumFeats tasks — chosen
    * deliberately so the candidate set (and hence the whole tree) is
    * bit-identical to the DuckDB oracle, which a sampled/approx binning
    * cannot be. This is the ORACLE-TWIN configuration only; the documented
    * at-scale default is [[thresholdsApprox]] (GK sketch, one pass, no
    * per-feature global sort — Spark ML's own maxBins sampling analogue),
    * selected via `tree(..., approxBinning = true)`. Both feed the same
    * downstream grid unchanged, and on separated data they grow the
    * identical tree (asserted in MlSpec). */
  private[graft] def thresholds(rootLong: DataFrame): DataFrame = {
    val w = Window.partitionBy("feat").orderBy(col("val"), col("id"))
    rootLong.withColumn("b", ntile(MaxBins).over(w))
      .groupBy("feat", "b").agg(max("val").as("t"))
      .select("feat", "t").distinct()
  }

  /** The AT-SCALE binning path (documented default beyond oracle-twin
    * fixtures): per-feature approximate quantile bin edges from the wide
    * frame via ONE multi-column GK-sketch pass — no global sort, no
    * shuffle proportional to data. Candidate quality (not correctness)
    * depends on the sketch error; the tree remains valid for any
    * candidate set, it just isn't bit-identical to the oracle's — on
    * well-separated data it grows the IDENTICAL tree structure (MlSpec),
    * and `tree(..., approxBinning = true)` wires it into the same
    * per-level recursion unchanged. */
  private[graft] def thresholdsApprox(wide: DataFrame,
                                      relErr: Double = 0.001): DataFrame = {
    val probs = (1 to MaxBins).map(_.toDouble / MaxBins).toArray
    val qs = wide.stat.approxQuantile(featNames.toArray, probs, relErr)
    val rows = featNames.zip(qs).flatMap { case (f, ts) =>
      ts.distinct.map(t => org.apache.spark.sql.Row(f, t)) }
    wide.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava),
      StructType(Seq(StructField("feat", StringType, nullable = false),
        StructField("t", DoubleType, nullable = false))))
  }

  /** Exact best split per node over the shared candidate set:
    * (node, feat, t, wg). One scan + one hash agg + one ≤|grid| window. */
  private[graft] def bestSplits(wide: DataFrame, thr: DataFrame,
                                labels: DataFrame): DataFrame = {
    val longDf = toLong(wide)
    // bin assignment: smallest threshold >= val, via a broadcast
    // per-feature sorted-candidate ARRAY and the codegen'd binary-search
    // [[graft.functions.LowerBound]] — a NARROW map that stays inside
    // whole-stage codegen. (Two rejected shapes: joining the threshold
    // table expands every row × matching candidates and re-aggregates at
    // id cardinality — an O(rows × bins) intermediate plus a full-data
    // shuffle; array_min(filter(...)) is a higher-order function, which
    // is CodegenFallback — it dropped this projection to interpreted
    // eval and measurably ~2×'d q80/q108. The first exchange below is
    // the grid-sized cnt aggregation either way.) Rows above every
    // threshold fall to the right of all candidates and drop out (null
    // bin) by design — LowerBound returns null exactly there.
    val thrArr = thr.groupBy("feat")
      .agg(sort_array(collect_list("t")).as("ts"))
    val binned = longDf
      .join(broadcast(thrArr), "feat")
      .withColumn("t",
        graft.functions.VectorExprs.lowerBound(col("ts"), col("val")))
      .filter(col("t").isNotNull)
    // post-aggregation frames are bounded by the candidate grid (≤ nodes ×
    // features × MaxBins × classes rows) at ANY data scale, but Catalyst
    // can't know that from stats — broadcast explicitly so nothing after
    // the one binned→cnt hash agg ever shuffles or sort-merges
    val cnt = binned.groupBy("node", "feat", "t", "label")
      .agg(count(lit(1)).as("c"))
    // dense (node × threshold × class) grid so the cumulative window sees
    // every candidate even where a class has no rows at that bin
    val grid = wide.select("node").distinct()
      .crossJoin(broadcast(thr)).crossJoin(broadcast(labels))
      .join(broadcast(cnt), Seq("node", "feat", "t", "label"), "left")
      .na.fill(0, Seq("c"))
    val cum = grid.withColumn("cum", sum("c").over(
      Window.partitionBy("node", "feat", "label").orderBy("t")))
    val tot = wide.groupBy("node", "label").agg(count(lit(1)).as("tc"))
    val cand = cum.join(broadcast(tot), Seq("node", "label"))
      .groupBy("node", "feat", "t")
      .agg(sum("cum").as("nl"),
        sum(col("cum").cast(dec) * col("cum").cast(dec)).as("sl"),
        sum(col("tc") - col("cum")).as("nr"),
        sum((col("tc") - col("cum")).cast(dec) *
          (col("tc") - col("cum")).cast(dec)).as("sr"))
    val wg = cand.filter(col("nl") > 0 && col("nr") > 0)
      .withColumn("wg",
        col("nl").cast(DoubleType) -
          col("sl").cast(DoubleType) / col("nl").cast(DoubleType) +
          col("nr").cast(DoubleType) -
          col("sr").cast(DoubleType) / col("nr").cast(DoubleType))
      // nl + nr = every row of the node (each row lands left or right of
      // any candidate over its feature), so the node's SIZE rides along
      // free — no separate per-level count pass
      .withColumn("n", col("nl") + col("nr"))
    // note: at the root, `node` is a folded literal, so this window runs
    // unpartitioned (Spark logs the single-partition warning) — it only
    // ever sees the candidate rows (≤ nodes × features × MaxBins, i.e.
    // ≤64/node), never data rows, so the single task is driver-sized
    wg.withColumn("rn", row_number().over(
        Window.partitionBy("node").orderBy(col("wg"), col("feat"), col("t"))))
      .filter(col("rn") === 1)
      .select("node", "feat", "t", "wg", "n")
  }

  /** Value of the node's chosen split feature for the current row. */
  private def chosenVal: Column =
    coalesce(featNames.map(f => when(col("feat") === f, col(f))): _*)

  /** Next-level assignment: rows of nodes WITH a chosen split descend to
    * node+"L"/"R" (the root's children are plain "L"/"R" — no "root"
    * prefix); rows of nodes absent from `best` (unsplittable — every
    * candidate left one side empty, e.g. all feature values identical in
    * the node) keep their node id and become that node's leaf directly.
    * LEFT join, so leaves always partition the data — an inner join would
    * silently drop unsplittable nodes' rows and break the row contract.
    * Feature columns are retained so the result can feed the NEXT level's
    * [[bestSplits]] directly (the depth-k recursion). */
  private[graft] def assignChildren(wide: DataFrame, best: DataFrame): DataFrame = {
    val keep = wide.columns.filterNot(_ == "node").map(col).toSeq
    val prefix = when(col("node") === "root", lit("")).otherwise(col("node"))
    wide.join(broadcast(best.select("node", "feat", "t")), Seq("node"), "left")
      .withColumn("child",
        when(col("feat").isNull, col("node"))
          .otherwise(concat(prefix,
            when(chosenVal <= col("t"), "L").otherwise("R"))))
      .select(keep :+ col("child").as("node"): _*)
  }

  /** Collect a tiny frame (candidate grid / label domain) into a
    * LocalRelation: downstream `broadcast()` uses build driver-side with no
    * job and no lineage — vs localCheckpoint, which still runs one job per
    * broadcast exchange over the checkpointed RDD. */
  private def toLocal(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        df.collect().toSeq.asJava), df.schema)

  /** q80: the depth-2 tree over the embeddings fixture — 3 split rows
    * (root, L, R: chosen feature, threshold, weighted gini, node size) +
    * 4 leaf rows (leaf gini, size, majority class). */
  def query(s: SparkSession, dir: String): DataFrame = tree(s, dir, 2)

  /** Depth-`depth` tree over the embeddings table — the general form of
    * q80's recursion (q108 runs it at depth 3, the oracle-checked coverage
    * of the reference's maxDepth semantics at tractable-oracle depth;
    * random_forest.py:101-108 runs MLlib at maxDepth 8/10, whose splits
    * are RNG-dependent and can only be rows-checked). `approxBinning`
    * selects [[thresholdsApprox]] — the documented at-scale candidate
    * path. */
  def tree(s: SparkSession, dir: String, depth: Int,
           approxBinning: Boolean = false): DataFrame =
    fitTree(pts(s, dir), depth, approxBinning)

  /** The per-level scan+agg+window recursion over an explicit
    * (id, label, f0..fN) frame. Cost per level is one cached scan + one
    * hash agg + one grid-sized window, independent of candidate count —
    * the shape distributed tree learners (Spark ML's own histogram
    * binning) use, so depth-k at 100 TB is k bounded passes, never a
    * per-node job storm.
    *
    * Per-level frames are each consumed by several downstream branches
    * (binning, the dense-grid node list, class totals, child assignment,
    * node sizes) — without a cache every reference re-scans the full
    * data, 5 scans per depth level at 100 TB. Persist eagerly (Spark ML
    * caches tree-induction input the same way), materialize the ≤(2^k+k)
    * result rows, then release every cache before returning. Lazy
    * persist: the first consumer fills each cache in-line — an eager
    * count() would be a whole extra scan job, and levels run serially so
    * there is no concurrent-fill race. Grid-sized frames (≤64 thresholds,
    * ≤10 labels, per-level best splits) go to LocalRelations
    * ([[toLocal]]): one collect job each, then every downstream broadcast
    * builds driver-side with no extra job. */
  private[graft] def fitTree(input: DataFrame, depth: Int,
                             approxBinning: Boolean = false): DataFrame = {
    require(depth >= 1, s"tree depth must be >= 1, got $depth")
    val p = input.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val persisted = scala.collection.mutable.ListBuffer[DataFrame](p)
    try {
      val root = p.withColumn("node", lit("root"))
      val thr = toLocal(
        if (approxBinning) thresholdsApprox(p)
        else thresholds(toLong(root).select("id", "feat", "val")))
      val labels = toLocal(p.select("label").distinct())

      var cur = root
      val levelSplits = scala.collection.mutable.ListBuffer.empty[DataFrame]
      for (level <- 1 to depth) {
        // ≤ 2^(level-1) rows, node size included (bestSplits' nl+nr)
        val best = toLocal(bestSplits(cur, thr, labels))
        levelSplits += best
        val next = assignChildren(cur, best)
        if (level < depth) {
          next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          persisted += next
        }
        cur = next
      }

      val splits = levelSplits.reduce(_.unionByName(_))
        .select(col("node"), lit("split").as("kind"), col("feat"),
          col("t").as("thr"), round(col("wg"), 6).as("score"), col("n"),
          lit(null).cast(IntegerType).as("pred"))

      val leafCnt = cur.groupBy("node", "label").agg(count(lit(1)).as("c"))
      val leafAgg = leafCnt.groupBy("node").agg(sum("c").as("n"),
        sum(col("c").cast(dec) * col("c").cast(dec)).as("s"))
      val maj = leafCnt.withColumn("rn", row_number().over(
          Window.partitionBy("node").orderBy(col("c").desc, col("label"))))
        .filter(col("rn") === 1).select("node", "label")
      val leaves = leafAgg.join(maj, "node")
        .select(col("node"), lit("leaf").as("kind"),
          lit(null).cast(StringType).as("feat"),
          lit(null).cast(DoubleType).as("thr"),
          round(lit(1.0) - col("s").cast(DoubleType) /
            (col("n").cast(DoubleType) * col("n").cast(DoubleType)), 6)
            .as("score"),
          col("n"), col("label").cast(IntegerType).as("pred"))

      // ≤ 2^depth + (2^depth − 1) rows — materialize so caches release
      splits.unionByName(leaves).orderBy("node").localCheckpoint()
    } finally { persisted.foreach(_.unpersist()); () }
  }

  // ---------------------------------------------------------------- oracle

  /** CASE expression mirroring `chosenVal` for alias `p` vs best alias `b`. */
  private def chosenValS(p: String, b: String): String =
    s"CASE $b.feat " +
      featNames.map(f => s"WHEN '$f' THEN $p.$f").mkString(" ") + " END"

  /** One level's best-split CTE chain over `wide` (id,label,node,f0..f3)
    * and its long form `lng` (id,label,node,feat,val). */
  private def bestS(wide: String, lng: String): String =
    s"""SELECT node, feat, t, wg, n FROM (
       |  SELECT node, feat, t, wg, n,
       |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY wg, feat, t) AS rn
       |  FROM (
       |    SELECT node, feat, t,
       |      CAST(nl AS DOUBLE) - CAST(sl AS DOUBLE)/CAST(nl AS DOUBLE)
       |        + CAST(nr AS DOUBLE) - CAST(sr AS DOUBLE)/CAST(nr AS DOUBLE) AS wg,
       |      CAST(nl + nr AS BIGINT) AS n
       |    FROM (
       |      SELECT u.node, u.feat, u.t,
       |        SUM(u.cum) AS nl, SUM(u.cum * u.cum) AS sl,
       |        SUM(tt.tc - u.cum) AS nr,
       |        SUM((tt.tc - u.cum) * (tt.tc - u.cum)) AS sr
       |      FROM (
       |        SELECT g.node, g.feat, g.t, g.label,
       |          SUM(COALESCE(c.c, 0)) OVER (
       |            PARTITION BY g.node, g.feat, g.label ORDER BY g.t) AS cum
       |        FROM (SELECT n.node, h.feat, h.t, l.label
       |              FROM (SELECT DISTINCT node FROM $wide) n
       |              CROSS JOIN thr h CROSS JOIN labels l) g
       |        LEFT JOIN (
       |          SELECT node, feat, t, label, COUNT(*) AS c FROM (
       |            SELECT r.node, r.feat, r.label,
       |              list_min(list_filter(ta.ts, x -> x >= r.val)) AS t
       |            FROM $lng r JOIN thrarr ta ON r.feat = ta.feat)
       |          WHERE t IS NOT NULL
       |          GROUP BY node, feat, t, label) c
       |          ON g.node = c.node AND g.feat = c.feat
       |            AND g.t = c.t AND g.label = c.label) u
       |      JOIN (SELECT node, label, COUNT(*) AS tc FROM $wide
       |            GROUP BY node, label) tt
       |        ON u.node = tt.node AND u.label = tt.label
       |      GROUP BY u.node, u.feat, u.t)
       |    WHERE nl > 0 AND nr > 0))
       |WHERE rn = 1""".stripMargin

  private def toLongS(wide: String): String =
    s"""SELECT id, label, node, u['feat'] AS feat, u['val'] AS val FROM (
       |  SELECT id, label, node, unnest([
       |    ${featNames.map(f => s"{'feat': '$f', 'val': $f}").mkString(", ")}
       |  ]) AS u FROM $wide)""".stripMargin

  /** Level assignment CTE, mirroring [[assignChildren]] exactly: LEFT
    * join (unsplittable nodes — absent from `best` — keep their id and
    * become leaves, so children always partition the parent), "root"
    * contributes no prefix, features retained for the next level. */
  private def assignS(wide: String, best: String): String =
    s"""SELECT p.id, p.label, ${featNames.map(f => s"p.$f").mkString(", ")},
       |  CASE WHEN b.node IS NULL THEN p.node
       |    ELSE (CASE WHEN p.node = 'root' THEN '' ELSE p.node END) ||
       |      (CASE WHEN ${chosenValS("p", "b")} <= b.t
       |       THEN 'L' ELSE 'R' END)
       |  END AS node
       |FROM $wide p LEFT JOIN $best b ON p.node = b.node""".stripMargin

  /** Depth-`depth` oracle: the same per-level CTE chain [[fitTree]] runs —
    * w0 (root) → b1 (best splits) → w1 (children) → … → w_depth (leaves) —
    * generated for any depth, so q80 (depth 2) and q108 (depth 3) share
    * one SQL builder mirroring one Spark recursion. */
  private[graft] def treeSql(depth: Int): String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH pts AS (
         |  SELECT vec_id AS id, label,
         |    ${(0 until NumFeats).map(j =>
               s"embedding[${j + 1}]::DOUBLE AS f$j").mkString(", ")}
         |  FROM embeddings),
         |labels AS (SELECT DISTINCT label FROM pts),
         |w0 AS (SELECT *, 'root' AS node FROM pts),
         |l0 AS (${toLongS("w0")}),
         |thr AS (
         |  SELECT DISTINCT feat, t FROM (
         |    SELECT feat, b, MAX(val) AS t FROM (
         |      SELECT feat, val, id,
         |        ntile($MaxBins) OVER (PARTITION BY feat ORDER BY val, id) AS b
         |      FROM l0)
         |    GROUP BY feat, b)),
         |thrarr AS (SELECT feat, LIST(t) AS ts FROM thr GROUP BY feat),
         |""".stripMargin
    for (i <- 1 to depth) {
      sb ++= s"b$i AS (${bestS(s"w${i - 1}", s"l${i - 1}")}),\n"
      sb ++= s"w$i AS (${assignS(s"w${i - 1}", s"b$i")}),\n"
      if (i < depth) sb ++= s"l$i AS (${toLongS(s"w$i")}),\n"
    }
    sb ++= s"allbest AS (${(1 to depth).map(i => s"SELECT * FROM b$i")
      .mkString(" UNION ALL ")}),\n"
    sb ++= s"leafcnt AS (SELECT node, label, COUNT(*) AS c FROM w$depth GROUP BY node, label)\n"
    sb ++=
      """SELECT node, kind, feat, thr, score, n, pred FROM (
        |  SELECT b.node, 'split' AS kind, b.feat,
        |    b.t AS thr, round(b.wg, 6) AS score, b.n,
        |    CAST(NULL AS INTEGER) AS pred
        |  FROM allbest b
        |  UNION ALL
        |  SELECT la.node, 'leaf', CAST(NULL AS VARCHAR),
        |    CAST(NULL AS DOUBLE),
        |    round(1.0 - CAST(la.s AS DOUBLE) /
        |      (CAST(la.n AS DOUBLE) * CAST(la.n AS DOUBLE)), 6),
        |    CAST(la.n AS BIGINT), mj.label
        |  FROM (SELECT node, SUM(c) AS n, SUM(c*c) AS s FROM leafcnt
        |        GROUP BY node) la
        |  JOIN (SELECT node, label FROM (
        |          SELECT node, label,
        |            ROW_NUMBER() OVER (PARTITION BY node
        |              ORDER BY c DESC, label) AS rn
        |          FROM leafcnt) WHERE rn = 1) mj
        |    ON la.node = mj.node)
        |ORDER BY node""".stripMargin
    sb.toString
  }

  def oracleSql: Map[String, String] = Map(
    "q80_gini_stump" -> treeSql(2),
    "q108_gini_tree_d3" -> treeSql(3))
}
