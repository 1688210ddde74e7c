package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array, lit, struct}
import org.apache.spark.sql.types.StructType

/** Sources (SURVEY.md §2.1 S1,S2,S8,S12): parquet/CSV/JSON readers over the
  * driver's TESTDATA layout plus generic paths.
  *
  * Reference behavior: `spark.read...csv` with inferSchema
  * (data_cleaning.py:27-30); here we prefer explicit schemas (SURVEY §1.3 —
  * removes the extra inference pass over the file, which at 100 TB would be a
  * full second scan of the input).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan (S2). Column pruning + predicate pushdown are free:
    * downstream select/filter reach the FileScan via Catalyst.
    *
    * Timestamp normalization — every downstream operator must see a plain
    * TimestampType (LTZ; sessions pin timeZone=UTC so values are the same
    * instants either way):
    *  - TIMESTAMP(NANOS) parquet is not a native Spark type: sessions set
    *    spark.sql.legacy.parquet.nanosAsLong=true (see [[sessionConfigs]])
    *    and the loader converts nanos → microsecond timestamps here.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet would infer as
    *    TIMESTAMP_NTZ under Spark 4's default; sessions disable that
    *    inference (see [[sessionConfigs]]), and the loader additionally
    *    casts any NTZ column that still slips through (a session built
    *    without [[sessionConfigs]]) — unix_micros, watermarks and
    *    stream-stream joins all require TimestampType. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      df.withColumn("ts",
        df("ts").cast(org.apache.spark.sql.types.TimestampType))
    else df
  }

  /** Shuffle scratch directory: SPARK_GRAFT_LOCAL_DIR when set, else a
    * node-local tmpfs when one is writable, else the JVM tmpdir. Thread
    * dumps under the round-16 bench showed executor threads serialized
    * on shuffle-file open/commit (`FileOutputStream.open0`,
    * `IndexShuffleBlockResolver.writeMetadataFileAndCommit`) — the
    * sandbox root FS makes small-file creation the bottleneck, which is
    * exactly what a production cluster avoids by pointing local dirs at
    * fast scratch (NVMe/tmpfs). Parameterised, never hard-coded: ops
    * overrides win, and the fallback is the stock default. */
  private def fastScratchBase: Option[java.io.File] = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) Some(shm) else None
  }

  private def scratchDir: String =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
      fastScratchBase.map(new java.io.File(_, "graft-spark-local").getPath)
        .getOrElse(sys.props("java.io.tmpdir"))
    }

  /** Per-query scratch temp dir (staging copies, stream checkpoints,
    * sink round-trip outputs) on the SAME fast scratch as the shuffle
    * dirs: the streaming harnesses commit offset/state/commit logs as
    * many small files per micro-batch, and on this sandbox's root FS
    * those creates dominate harness wall time exactly like the shuffle
    * files did. Callers already rmTree these in their finally blocks;
    * the fallback is the stock temp dir. */
  private[graft] def scratchTempDir(prefix: String): java.nio.file.Path =
    fastScratchBase match {
      case Some(base) =>
        val root = new java.io.File(base, "graft-tmp")
        java.nio.file.Files.createDirectories(root.toPath)
        java.nio.file.Files.createTempDirectory(root.toPath, prefix)
      case None => java.nio.file.Files.createTempDirectory(prefix)
    }

  /** Session configs every graft SparkSession needs. */
  val sessionConfigs: Map[String, String] = Map(
    // one sorted shuffle file per map task (+index) instead of the
    // bypass path's one-file-per-reduce-partition: with R reduce
    // partitions the bypass writer opens R files per map task, and on
    // this sandbox's FS those opens dominate small-stage wall time
    // (measured: q201 4.4 s → 2.6 s). Production clusters with R > 200
    // take the sort path anyway — this pins the production shape.
    "spark.shuffle.sort.bypassMergeThreshold" -> "0",
    "spark.local.dir" -> scratchDir,
    // engine extensions: dot_product SQL function + HOF→DotProduct rule
    "spark.sql.extensions" -> "graft.plans.GraftExtensions",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet (pyarrow's default
    // for naive timestamps) must read as TimestampType, not TIMESTAMP_NTZ:
    // unix_micros, withWatermark and stream-stream joins reject NTZ, and
    // with session timeZone=UTC the instants are identical.
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // AQE re-renders the physical-plan DESCRIPTION string on every stage
    // update (even with the UI off, for listener events). Queries whose
    // expression trees embed large literal arrays (LSH hyperplanes: 8×64
    // doubles) make that rendering O(minutes) of driver CPU per query —
    // observed as a single pegged thread in generateTreeString. Capping
    // the plan string short-circuits the renderer; correctness and the
    // actual plans are unaffected.
    "spark.sql.maxPlanStringLength" -> "65536")

  /** Fan a small/single-split input out to cluster parallelism before a
    * compute-dense narrow stage (shingling, hashing, vector math).
    *
    * A single-row-group parquet file scans as ONE non-empty task, so every
    * narrow operator chained on it runs single-threaded no matter how many
    * cores the cluster has — the per-doc compute, not the I/O, becomes the
    * bottleneck. At 100 TB inputs arrive in thousands of splits and this is
    * a no-op (guarded on the actual partition count — never an extra shuffle
    * on data that is already wide); on a dim-table-sized input the few-MB
    * hash exchange buys a `target`-way hot stage. */
  def fanOut(df: DataFrame, keyCol: String, target: Int = 0): DataFrame = {
    val t = if (target > 0) target
            else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= t) df
    else df.repartition(t, org.apache.spark.sql.functions.col(keyCol))
  }

  /** CSV scan with explicit schema (S1) — one pass, no inference job. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schema).csv(path)

  /** CSV scan with inference, the reference's exact semantics
    * (data_cleaning.py:29) — kept as an escape hatch for schema drift. */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** JSON-lines scan (counterpart of sink S4). */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Register all TESTDATA tables as temp views so spark.sql works
    * (SURVEY §3 "SQL entry": mirrors the Hive catalog role of
    * create_tables.hql without a metastore). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Recursive local-dir delete — THE tree-delete helper (staging cleanup
    * in q85 and the q102–q104 round-trips); closes the walk stream. */
  private[graft] def rmTree(root: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .iterator().forEachRemaining(p => {
        java.nio.file.Files.deleteIfExists(p); () })
    finally walk.close()
  }
}

/** Sinks (SURVEY §2.1 S3-S7). MongoDB (S7) is modeled as a pluggable trait
  * with a JSON-file default so the engine builds offline (SURVEY §7.4 risk 6).
  */
object Sinks {
  /** Parquet sink, overwrite + snappy (S3; data_cleaning.py:133). */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Partitioned parquet sink — the SURVEY §4 engine improvement over the
    * reference's unpartitioned write (data_cleaning.py:133 emits one flat
    * directory; every downstream job rescans all of it). Hive-style
    * `col=value` directories let any filter on the partition columns prune
    * at planning time: at 100 TB, a State/Month-partitioned layout turns a
    * one-state query from a full scan into ~1/50th of the input
    * (PartitionFilters in the FileScan — proven in SinksCatalogSpec).
    *
    * `dynamicOverwrite=true` scopes overwrite to the partitions present in
    * `df` (the warehouse backfill pattern) via the per-write option, leaving
    * sibling partitions intact and the session conf untouched. */
  def parquetPartitioned(df: DataFrame, path: String, cols: Seq[String],
                         dynamicOverwrite: Boolean = false): Unit = {
    require(cols.nonEmpty, "parquetPartitioned needs >=1 partition column")
    val w = df.write.mode("overwrite").partitionBy(cols: _*)
    (if (dynamicOverwrite) w.option("partitionOverwriteMode", "dynamic")
     else w).parquet(path)
  }

  /** Range-CLUSTERED parquet layout — the second storage lever after
    * [[parquetPartitioned]], for high-cardinality keys where Hive
    * partitioning would explode the directory count. `repartitionByRange`
    * gives each output file a disjoint slice of the cluster-key space
    * (range partitioner, sampled boundaries) and `sortWithinPartitions`
    * orders rows inside each file, so every parquet row group's min/max
    * footer stats span a narrow key range. Readers filtering on the
    * cluster key then skip whole row groups at scan time (parquet
    * predicate pushdown against the stats), the non-partition analog of
    * partition pruning: at 100 TB, a point/range query on the cluster key
    * reads the few files whose range matches instead of every row group
    * of every file. One range shuffle at write time buys every later
    * scan's skipping. */
  def parquetClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                       numFiles: Int): Unit = {
    require(clusterCols.nonEmpty, "parquetClustered needs >=1 cluster column")
    val cs = clusterCols.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(numFiles, cs: _*)
      .sortWithinPartitions(cs: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file COMPACTION — the fourth storage lever (q105 = partition
    * pruning, q106 = range clustering, q110 = bucketing, this = layout
    * hygiene): bin-pack a fragmented directory into ~`targetBytes` files.
    * Streaming sinks, per-partition overwrites and high-parallelism jobs
    * all shed small files; at 100 TB the cost is operational, not
    * computational — NameNode/object-listing pressure, a scan task per
    * tiny file, row groups too small for effective stats — and every
    * table format (Hive, Iceberg, Delta) ships this exact rewrite as its
    * maintenance job.
    *
    * The output file count is COMPUTED from the actual on-disk bytes
    * (`ceil(bytes / targetBytes)`, floor 1), so the rewrite lands on the
    * target size regardless of input fragmentation. The rewrite is
    * `repartitionByRange` + in-file sort on `sortCols` — compaction and
    * [[parquetClustered]]'s row-group-skipping layout in the same single
    * shuffle (a plain `coalesce` would be cheaper but forfeits both the
    * clustering and the even output sizing its lazy partition merge
    * gives up). Returns the computed file count so callers (and the
    * SinksCatalogSpec guard) can assert the layout contract. */
  def compactParquet(s: SparkSession, inDir: String, outDir: String,
                     sortCols: Seq[String], targetBytes: Long): Int = {
    require(sortCols.nonEmpty, "compactParquet needs >=1 sort column")
    require(targetBytes > 0, "compactParquet needs targetBytes > 0")
    val in = new org.apache.hadoop.fs.Path(inDir)
    val fs = in.getFileSystem(s.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(in).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    // FLAT layouts only: a Hive-partitioned input keeps its files in
    // subdirectories, which this top-level listing would size at 0 and
    // silently rewrite the whole table into one file (also flattening
    // the partition columns out of the data) — compact each partition
    // directory separately instead
    require(bytes > 0,
      s"no top-level .parquet files under $inDir — compactParquet " +
        "expects a flat layout; compact partitioned tables per-partition")
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    parquetClustered(s.read.parquet(inDir), outDir, sortCols, numFiles = n)
    n
  }

  /** q132: COMPACTION round-trip — write the lineitem projection as a
    * deliberately fragmented 64-tiny-file layout (what a streaming sink
    * or over-parallel job leaves behind), compact it with
    * [[compactParquet]], and aggregate the compacted copy. Oracle = the
    * same aggregate over the original table: hash-equality proves the
    * bin-packed rewrite is lossless; SinksCatalogSpec asserts the
    * file-count contract (computed n, and n ≪ input fragments). */
  def compactRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tmp = Tables.scratchTempDir("graft-q132")
    try {
      val src = Tables.load(s, dir, "lineitem").select(PrunedCols.map(col): _*)
      val frag = tmp.resolve("frag").toString
      src.repartition(64).write.mode("overwrite").parquet(frag)
      val out = tmp.resolve("compact").toString
      compactParquet(s, frag, out, Seq("l_orderkey"), targetBytes = 32L << 20)
      prunedAgg(s.read.parquet(out), flag = None).localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** The q102–q104 projection: every column participates in the verifying
    * hash. q105/q106 extend it with [[PrunedCols]]' grouping column. */
  private[graft] val RtCols =
    Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")

  /** One side of a format round-trip — shared by [[formatRoundTrip]] and
    * `Profile --roundtrip`, so the profiler can never drift from the
    * write/read options the benchmarked queries actually use. "parquet"
    * is the profiler's format-neutral control. */
  private[graft] def rtWrite(src: DataFrame, format: String, path: String): Unit =
    format match {
      case "orc" =>
        src.write.mode("overwrite").option("compression", "snappy").orc(path)
      case "csv" =>
        src.write.mode("overwrite").option("header", "true").csv(path)
      case "json"    => Sinks.json(src, path)
      case "xml" =>
        // Spark 4's built-in XML datasource (SPARK-44265): one <line>
        // element per row; doubles render shortest-round-trip like JSON
        src.write.mode("overwrite").option("rowTag", "line").format("xml")
          .save(path)
      case "parquet" => src.write.mode("overwrite").parquet(path)
      case other     => sys.error(s"unsupported round-trip format: $other")
    }
  private[graft] def rtRead(s: SparkSession, format: String, path: String,
                            schema: StructType): DataFrame =
    format match {
      case "orc"     => s.read.orc(path)
      case "csv"     => Tables.csv(s, path, schema)
      case "json"    => Tables.json(s, path, schema)
      case "xml" =>
        // explicit schema, never inference (SURVEY §1.3) — same discipline
        // as the CSV/JSON leg
        s.read.option("rowTag", "line").schema(schema).format("xml").load(path)
      case "parquet" => s.read.parquet(path)
      case other     => sys.error(s"unsupported round-trip format: $other")
    }

  /** q102–q104: FORMAT ROUND-TRIP queries — write a projection through a
    * non-parquet format (ORC with snappy = S9's storage; CSV with header
    * = S1/S6's interchange; JSON lines = S4's sink), read it back with
    * the matching reader, and aggregate. The oracle is the SAME aggregate
    * over the original parquet — hash-equality proves the sink+source
    * pair is bit-lossless for the engine's scalar types (CSV doubles rely
    * on shortest-round-trip rendering; the read uses an explicit schema,
    * never inference — SURVEY §1.3). Staging is cleaned up after the
    * result is materialized off it. */
  def formatRoundTrip(s: SparkSession, dir: String, format: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = Tables.scratchTempDir(s"graft-rt-$format")
    try {
      // fanOut before the render: a single-split scan would otherwise
      // serialize the whole text/columnar ENCODE (and the read-back
      // parse — one output file ⇒ one scan task) through one core. At
      // production split counts the guard no-ops; the aggregate result
      // is file-count independent (decimal-routed sums, count, long sum).
      val src = Tables.fanOut(Tables.load(s, dir, "lineitem"), "l_orderkey")
        .select(RtCols.map(col): _*)
      val path = tmp.resolve("data").toString
      rtWrite(src, format, path)
      val back = rtRead(s, format, path, src.schema)
      // every projected column participates in the hash: the bigint key
      // too, or a long-only corruption would slip past the oracle
      back.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_key"),
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_price"))
        .orderBy("l_returnflag")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q105: PARTITION-PRUNED round-trip — write lineitem through
    * [[parquetPartitioned]] (Hive-style `l_returnflag=` directories), read
    * it back filtered to ONE partition value, and aggregate. The oracle is
    * the same filtered aggregate over the ORIGINAL flat parquet, so
    * hash-equality proves the partitioned layout is lossless AND the
    * driver-visible twin of SinksCatalogSpec's pruning proof: the read-back
    * scan carries the flag predicate as a PartitionFilter (planning-time
    * directory pruning — guarded in SinksCatalogSpec's q105 scan-shape
    * test), which at 100 TB turns a one-flag query into a scan of ~1/3rd
    * of the input with zero row-level filtering work. */
  def partitionPrunedRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tmp = Tables.scratchTempDir("graft-q105")
    try {
      val src = Tables.load(s, dir, "lineitem").select(PrunedCols.map(col): _*)
      val path = tmp.resolve("data").toString
      parquetPartitioned(src, path, Seq("l_returnflag"))
      prunedAgg(s.read.parquet(path)).localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q106: ROW-GROUP-SKIPPED round-trip — write lineitem through
    * [[parquetClustered]] (range-partitioned + sorted on `l_orderkey`),
    * read it back with a key-range predicate, and aggregate. Oracle = the
    * same filtered aggregate over the original parquet: hash-equality
    * proves the clustered layout lossless, and because every file/row
    * group covers a disjoint sorted key slice, the range predicate
    * (pushed to the scan — guarded in SinksCatalogSpec's q106 scan-shape
    * test) skips all non-matching row groups via footer min/max stats.
    * The non-partition storage lever for high-cardinality keys at
    * 100 TB. */
  def clusteredRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tmp = Tables.scratchTempDir("graft-q106")
    try {
      val src = Tables.load(s, dir, "lineitem").select(PrunedCols.map(col): _*)
      val path = tmp.resolve("data").toString
      parquetClustered(src, path, Seq("l_orderkey"), numFiles = 8)
      prunedAgg(s.read.parquet(path)
          .filter(col("l_orderkey").between(1000L, 5000L)),
          flag = None)
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** Morton (Z-order) interleave of two non-negative 31-bit keys into one
    * 62-bit sort key: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1 (the classic parallel-prefix bit spread — five mask/shift/or
    * rounds, all codegen'd integer ops, no UDF). Sorting by the result
    * gives a space-filling-curve layout where rows close in BOTH key
    * dimensions land in the same parquet row groups, so footer min/max
    * stats on the two RAW columns can skip row groups for 2-D box
    * predicates — the multi-dimensional generalization of
    * [[parquetClustered]]'s single-key clustering (the same layout lever
    * Delta/Iceberg ship as Z-ORDER / OPTIMIZE ZORDER BY).
    *
    * Inputs must be in [0, 2^31): larger keys should be rank- or
    * hash-compressed to 31 bits first (locality, not exactness, is what
    * the layout needs). */
  private[graft] def mortonC(x: org.apache.spark.sql.Column,
                             y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val m = Seq(
        0x0000FFFF0000FFFFL -> 16, 0x00FF00FF00FF00FFL -> 8,
        0x0F0F0F0F0F0F0F0FL -> 4, 0x3333333333333333L -> 2,
        0x5555555555555555L -> 1)
      m.foldLeft(c.cast(org.apache.spark.sql.types.LongType)
          .bitwiseAND(lit(0x7FFFFFFFL))) { case (acc, (mask, sh)) =>
        acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(mask))
      }
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** HILBERT curve index of a 2-D point — the locality upgrade over
    * [[mortonC]]: a Hilbert walk takes only unit steps (consecutive
    * indexes are always grid NEIGHBORS, which Morton's diagonal jumps
    * are not), so equal-size index ranges cover tighter boxes — fewer
    * row groups touched per 2-D box predicate, the reason modern
    * clustering layouts (e.g. liquid clustering) moved from Z-order to
    * Hilbert. The per-level loop (compare bit, accumulate quadrant,
    * reflect+transpose the frame) runs as a NATIVE codegen'd Catalyst
    * expression ([[graft.functions.HilbertIndex]] — a static-call
    * BinaryExpression, the levenshtein shape): the first cut used an
    * `aggregate` HOF fold, which is CodegenFallback and made the q323
    * layout write ~10× q137's Morton write (13.3 s vs 1.4 s, round-13
    * bench); the native expression keys cost Morton-key cost.
    *
    * Inputs must be in [0, 2^order) — larger keys should be rank- or
    * hash-compressed first (locality, not exactness, is what the
    * layout needs; same contract as [[mortonC]]). */
  private[graft] def hilbertC(x0: org.apache.spark.sql.Column,
                              y0: org.apache.spark.sql.Column,
                              order: Int = 16): org.apache.spark.sql.Column =
    graft.functions.StringExprs.hilbertIndex(
      x0.cast(org.apache.spark.sql.types.LongType),
      y0.cast(org.apache.spark.sql.types.LongType), order)

  /** HILBERT-ordered parquet layout: [[parquetZOrdered]] with the
    * Hilbert key — same one-time range shuffle, tighter per-row-group
    * boxes. */
  def parquetHilbert(df: DataFrame, path: String, xCol: String, yCol: String,
                     numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__h", hilbertC(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** q323: HILBERT-CLUSTERED round-trip — the sixth-and-a-half storage
    * lever: q137's experiment re-run with the Hilbert key. Write
    * lineitem Hilbert-ordered on (l_partkey, l_suppkey), read back
    * with a 2-D box predicate, aggregate per suppkey; the oracle is
    * the same aggregate over the ORIGINAL parquet, so hash-equality
    * proves the curve rewrite lossless. The reason to own BOTH curves:
    * Morton spreads a box over diagonal jumps (up to ~n distinct index
    * ranges per box), Hilbert's unit-step walk keeps every range
    * contiguous-ish — SinksCatalogSpec measures the per-file box
    * tightness of the two layouts head-to-head on this same write and
    * asserts the Hilbert files carry the smaller average 2-D extent,
    * plus the defining unit-step property cell by cell. */
  def hilbertRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = Tables.scratchTempDir("graft-q323")
    try {
      val src = Tables.load(s, dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      val path = tmp.resolve("data").toString
      parquetHilbert(src, path, "l_partkey", "l_suppkey", numFiles = 16)
      s.read.parquet(path)
        .filter(col("l_partkey").between(500L, 900L) &&
          col("l_suppkey").between(20L, 60L))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_okey"),
          sum(col("l_partkey")).as("sum_pkey"),
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_price"))
        .orderBy("l_suppkey")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q324: PARQUET SCHEMA EVOLUTION on read (`mergeSchema`) — the
    * batch-storage twin of q308's state-schema upgrade, and the lake
    * reality every long-lived pipeline hits: generation 1 of a dataset
    * was written without a column that generation 2 added, and the
    * reader must reconcile both vintages in ONE scan — old files
    * surface the new column as NULL, no rewrite of petabytes of
    * history. Staged here as two writes into one directory (gen 1:
    * even doc_ids, 3 columns; gen 2: odd doc_ids, + a derived
    * `tok_est` column), read back with `mergeSchema=true`, and
    * aggregated per source with the vintage split made visible
    * (non-null count + sum of the added column). The oracle recomputes
    * the same frame from the ORIGINAL table — generation membership is
    * a pure function of doc_id — so hash-equality proves the merged
    * read exact: no row lost, no NULL where a value belongs, no value
    * where gen-1 NULL belongs.
    *
    * Shape at 100 TB: schema merge is FOOTER work (the reader unions
    * file schemas at planning; `mergeSchema` reads every footer, which
    * is why production tables pin the merged schema in a catalog
    * instead — the semantics proven here are identical); the scan
    * itself stays columnar with the absent column materialized as
    * NULL vectors, and the aggregate is one ordinary hash-agg. */
  def mergeSchemaRead(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = Tables.scratchTempDir("graft-q324")
    try {
      val path = tmp.resolve("docs").toString
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      base.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(path)
      base.filter(col("doc_id") % 2 === 1)
        .withColumn("tok_est", expr("n_chars div 5"))
        .write.mode("append").parquet(path)
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(col("tok_est").isNotNull.cast(LongType)).as("n_v2"),
          sum(col("tok_est")).as("sum_tok_est"))
        .orderBy("source")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q333: MANIFEST-PRUNED SCAN — the Iceberg/Delta table-format
    * mechanism, built from parts: a layout write (range-clustered
    * files), a MANIFEST of per-file column stats (min/max/rows) built
    * once as a DataFrame, and a two-phase read that consults the
    * manifest FIRST and hands the planner only the files whose
    * [lo, hi] intersects the predicate. Differs from q106 (row-group
    * skipping) in WHERE the pruning decision is made: q106 trusts the
    * scan operator to read every footer and skip inside files; the
    * manifest prunes at PLAN time from a stats table — at 100 TB /
    * millions of files, footer reads alone are a listing storm, which
    * is exactly why the table formats exist. The oracle recomputes the
    * aggregate over the original table, so hash-equality proves the
    * prune lost no row; the spec asserts the file list actually
    * shrank and the manifest accounts for every row.
    *
    * The driver-side file list is bounded by numFiles (the manifest is
    * metadata, ≤ one row per file — the same cardinality contract a
    * real manifest file has). */
  def manifestPrunedScan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = Tables.scratchTempDir("graft-q333")
    try {
      val path = tmp.resolve("data").toString
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .repartitionByRange(16, col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(path)
      val manifest = s.read.parquet(path)
        .groupBy(input_file_name().as("file"))
        .agg(min("l_partkey").as("lo"), max("l_partkey").as("hi"))
      val (p1, p2) = (300L, 700L)
      val keep = manifest
        .filter(col("hi") >= p1 && col("lo") <= p2)
        .select("file").collect().map(_.getString(0)) // ≤ numFiles rows
      // a fully-pruned predicate (possible at tiny SF) is an EMPTY scan,
      // not an error — same contract as a table format's empty manifest hit
      val pruned =
        if (keep.isEmpty) s.read.parquet(path).filter(lit(false))
        else s.read.parquet(keep.toIndexedSeq: _*)
      pruned
        .filter(col("l_partkey").between(p1, p2))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_okey"),
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_qty"))
        .orderBy("l_suppkey")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q347: DELETION-VECTOR MERGE-ON-READ — the Iceberg/Delta positional
    * -delete mechanic, Spark-first: deletes are recorded as (file,
    * row_index) pairs in a DV TABLE (no data file rewritten — the whole
    * point at 100 TB, where deleting 0.1 % of rows must not rewrite
    * 100 TB), and the read applies them by anti-joining the scan's
    * `_metadata.file_path` / `_metadata.row_index` columns against the
    * DV. Here the DV marks every row with l_orderkey % 13 == 0; the
    * oracle recomputes the aggregate over the ORIGINAL table with the
    * logical predicate, so hash-equality certifies the positional
    * plumbing (file identity, row indexes, anti-join application)
    * reproduces the logical delete exactly.
    *
    * Shape at 100 TB: the DV is a narrow (file, pos) frame — the
    * anti-join hashes on (file, pos) against only the deleted rows
    * (broadcast when the delete fraction is small, as here); real
    * formats push this to a per-file bitmap filter, which is the same
    * semantics with the join specialized per split. */
  def deletionVectorScan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = Tables.scratchTempDir("graft-q347")
    try {
      val path = tmp.resolve("data").toString
      val dvPath = tmp.resolve("dv").toString
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_quantity", "l_returnflag")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").parquet(path)
      val withPos = s.read.parquet(path)
        .select(col("*"), col("_metadata.file_path").as("fp"),
          col("_metadata.row_index").as("pos"))
      // the delete job: writes ONLY the DV table, touches no data file
      withPos.filter(pmod(col("l_orderkey"), lit(13L)) === 0)
        .select("fp", "pos")
        .write.mode("overwrite").parquet(dvPath)
      val dv = s.read.parquet(dvPath)
      withPos.join(broadcast(dv), Seq("fp", "pos"), "left_anti")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_okey"),
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_qty"))
        .orderBy("l_returnflag")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q349: BLOOM-INDEX FILE PRUNING — the file-skipping lever for POINT
    * lookups on HIGH-CARDINALITY keys, where q333's min/max manifest is
    * useless (a hash-sharded layout gives every file the full key
    * range). One distributed pass builds a per-file Bloom filter over
    * the key (`aggregateByKey` on the file path — sketch-state folding
    * is the one genuinely imperative per-partition job, the same thing
    * `DataFrameStatFunctions.bloomFilter` does internally); the
    * manifest of ≤ numFiles blooms lives with the table metadata, and a
    * point-IN query consults it at PLAN time, reading only files whose
    * bloom might contain a probe key. False positives cost a read,
    * never a wrong row (the predicate is re-applied post-scan); false
    * negatives cannot happen — which the oracle certifies by
    * recomputing the same IN-aggregate over the original table. The
    * spec asserts the file list actually shrank. */
  def bloomPrunedScan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = Tables.scratchTempDir("graft-q349")
    try {
      val path = tmp.resolve("data").toString
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_quantity")
        .repartition(8, col("l_orderkey")) // hash layout: min/max useless
        .write.mode("overwrite").parquet(path)
      val probes = Seq(7L, 1007L, 2207L, 4007L, 5507L)
      val blooms = bloomIndex(s, path, "l_orderkey")
      val keep = blooms.collect {
        case (f, bf) if probes.exists(bf.mightContain) => f
      }.toSeq.sorted
      val pruned =
        if (keep.isEmpty) s.read.parquet(path).filter(lit(false))
        else s.read.parquet(keep: _*)
      pruned
        .filter(col("l_orderkey").isin(probes: _*))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          sum(col("l_suppkey")).as("sum_skey"),
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_qty"))
        .orderBy("l_orderkey")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** ONE-scan per-file Bloom build: (file → bloom over `key`). Driver
    * holds ≤ numFiles sketches (the manifest cardinality contract);
    * expected-items is sized from the total count. */
  private[graft] def bloomIndex(s: SparkSession, path: String, key: String)
      : Map[String, org.apache.spark.util.sketch.BloomFilter] = {
    import org.apache.spark.sql.functions._
    val kv = s.read.parquet(path)
      .select(col("_metadata.file_path").as("fp"), col(key).as("k"))
    val perFileExpect = math.max(kv.count() / 4, 64L) // ≥ rows per file
    kv.select("fp", "k").rdd
      .map(r => (r.getString(0), r.getLong(1)))
      .aggregateByKey(
        org.apache.spark.util.sketch.BloomFilter.create(perFileExpect, 0.01))(
        (bf, v) => { bf.putLong(v); bf },
        (a, b) => { a.mergeInPlace(b); a })
      .collect().toMap // ≤ numFiles entries
  }

  /** q334: FIXED-WIDTH DSv2 ROUND-TRIP — lineitem rendered as the
    * mainframe-style fixed-width export (lpad'd slices, one text file
    * per shard), read back through the CUSTOM DataSource V2 connector
    * ([[graft.sources.fixedwidth.FixedWidthSource]]) with a column
    * projection and a pushed `<=` range filter, and aggregated. The
    * oracle recomputes the aggregate over the ORIGINAL table, so
    * hash-equality certifies the whole connector stack — slicing,
    * type parsing, column pruning, filter pushdown, per-file
    * partition planning — lossless. The quantity column rides a
    * ×10⁴ scaled-integer slice (fixed-width exports carry implied
    * decimals; the integer sum is exact on both engines). */
  def fixedWidthRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = Tables.scratchTempDir("graft-q334")
    try {
      val path = tmp.resolve("fw").toString
      Tables.load(s, dir, "lineitem")
        .select(concat(
          lpad(col("l_orderkey").cast(StringType), 12, " "),
          lpad(col("l_suppkey").cast(StringType), 8, " "),
          lpad(round(col("l_quantity") * 10000).cast(LongType)
            .cast(StringType), 12, " "),
          col("l_returnflag")).as("value"))
        .repartition(8)
        .write.mode("overwrite").text(path)
      s.read.format("graft.sources.fixedwidth.FixedWidthSource")
        .option("spec", "l_orderkey:0:12:long,l_suppkey:12:8:long," +
          "l_q4:20:12:long,l_returnflag:32:1:string")
        .load(path)
        .filter(col("l_suppkey") <= 50L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_okey"),
          sum(col("l_q4")).as("sum_q4"))
        .orderBy("l_returnflag")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q339: FIXED-WIDTH DSv2 **WRITE** ROUND-TRIP — lineitem written
    * through the connector's OWN `SupportsWrite` path (per-task
    * dot-prefixed temp files, rename-on-job-commit, truncate mode —
    * [[graft.sources.fixedwidth.FwBatchWrite]]), read back through the
    * connector's read path with a pushed filter, and aggregated. The
    * oracle recomputes the aggregate over the ORIGINAL table, so
    * hash-equality certifies the full sink lifecycle lossless: value
    * formatting (right-justified numbers via `Double.toString`'s exact
    * shortest round-trip representation), staged visibility, commit
    * renames, and the read stack on top. q334 proved the engine's
    * extensibility for custom *sources*; this closes the loop for
    * custom *sinks* — the real user shape is exporting back to the
    * mainframe format they ingested from. Exactly-once under aborted
    * task attempts is asserted separately by SinksCatalogSpec driving
    * the DataWriter contract directly. */
  def fixedWidthWriteRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = Tables.scratchTempDir("graft-q339")
    try {
      val path = tmp.resolve("fw").toString
      val spec = "l_orderkey:0:12:long,l_suppkey:12:8:long," +
        "l_quantity:20:24:double,l_returnflag:44:1:string"
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_quantity"), col("l_returnflag"))
        .repartition(8)
        .write.format("graft.sources.fixedwidth.FixedWidthSource")
        .option("spec", spec)
        .mode("overwrite")
        .save(path)
      s.read.format("graft.sources.fixedwidth.FixedWidthSource")
        .option("spec", spec)
        .load(path)
        .filter(col("l_suppkey") <= 60L) // pushed into the parse
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_okey"),
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_qty"))
        .orderBy("l_returnflag")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q382: CROSS-FORMAT CONSISTENCY CERTIFICATE — the format-migration
    * audit a lake runs before decommissioning a copy: ONE projection of
    * orders written through EVERY sink the engine ships (parquet, ORC,
    * CSV, JSON lines, and the custom fixed-width DSv2 connector), each
    * read back with its matching reader and reduced to the q365
    * order-independent fingerprint (row count + bit-xor + modular
    * DECIMAL sum of 60-bit row keys). Five identical fingerprint rows =
    * the proof that every sink/source pair preserves the SAME bytes —
    * not five separate aggregates that might each mask a different
    * corruption. Integer-only payload (cents, keys, priority string) so
    * no format's float rendering participates. The oracle computes the
    * fingerprint once from the original parquet and expects it five
    * times. */
  def formatCertificate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.functions.TextPrims.hex60C
    val tmp = Tables.scratchTempDir("graft-q382")
    try {
      // fanOut for the same reason as formatRoundTrip: five sequential
      // single-task encode/parse legs otherwise ride one core each.
      val src = Tables.fanOut(Tables.load(s, dir, "orders"), "o_orderkey")
        .select(
          col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("cents"),
          col("o_orderpriority"))
      def fp(df: DataFrame, label: String): DataFrame = {
        val h = hex60C(md5(concat_ws("|", col("o_orderkey"),
          col("o_custkey"), col("cents"), col("o_orderpriority"))))
        // sum_fp is the modular fingerprint (Σ h mod p) mod p: the
        // accumulation rides DECIMAL(38,0) (BIGINT would wrap past ~9e9
        // rows) but the EMITTED value is reduced below p and cast BIGINT
        // — one rendering on every engine, which is the whole point of a
        // cross-format certificate (q365's round-16 lesson: the driver
        // gate hash-failed the raw DECIMAL(38,0) rendition).
        df.select(h.as("h"))
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(h)").as("xor_fp"),
            pmod(sum(pmod(col("h"), lit(1000000007L))
                .cast(DecimalType(38, 0))),
              lit(1000000007L)).cast(LongType).as("sum_fp"))
          .select(lit(label).as("format"), col("n_rows"), col("xor_fp"),
            col("sum_fp"))
      }
      val fwSpec = "o_orderkey:0:12:long,o_custkey:12:12:long," +
        "cents:24:14:long,o_orderpriority:38:16:string"
      // the five write→read→fingerprint legs are independent pure
      // functions of `src` — run them in ONE wave (the q201 codebook
      // pattern) so the sink/scan jobs overlap instead of serializing;
      // each leg materializes inside its future (write is an action,
      // the 1-row fingerprint pins via localCheckpoint)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val legs = try {
        Await.result(Future.sequence(
          Seq("parquet", "orc", "csv", "json").map { f =>
            Future {
              val p = tmp.resolve(f).toString
              rtWrite(src, f, p)
              fp(rtRead(s, f, p, src.schema), f).localCheckpoint()
            }
          } :+ Future {
            val p = tmp.resolve("fixedwidth").toString
            src.write.format("graft.sources.fixedwidth.FixedWidthSource")
              .option("spec", fwSpec).mode("overwrite").save(p)
            fp(s.read.format("graft.sources.fixedwidth.FixedWidthSource")
              .option("spec", fwSpec).load(p), "fixedwidth")
              .localCheckpoint()
          }), Duration(10, "min"))
      } finally { pool.shutdownNow(); () }
      legs.reduce(_ unionAll _)
        .orderBy("format")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** Z-ORDERED parquet layout: range-partition + sort on the Morton key
    * of (`xCol`, `yCol`), then drop the key — the written files carry only
    * the original columns, with 2-D locality baked into the row-group
    * layout. One range shuffle at write time buys row-group skipping for
    * every later box query on the two columns. */
  def parquetZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                      numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val z = df.withColumn("__z", mortonC(col(xCol), col(yCol)))
    z.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** q137: Z-ORDER round-trip — the fifth storage lever (q105 partition
    * pruning, q106 range clustering, q110 bucketing, q132 compaction,
    * this = multi-dimensional clustering): write lineitem Z-ordered on
    * (l_partkey, l_suppkey), read it back with a 2-D box predicate, and
    * aggregate per suppkey. Oracle = the same filtered aggregate over the
    * original parquet, so hash-equality proves the space-filling-curve
    * rewrite lossless; SinksCatalogSpec asserts both box bounds reach the
    * scan as PushedFilters. Single-key clustering (q106) can serve only
    * ONE predicate column — at 100 TB, a part×supplier box query over a
    * partkey-clustered table still reads every row group of every file
    * for the suppkey half; the Morton layout bounds both dimensions per
    * row group, the reason warehouse formats ship Z-ORDER for exactly
    * this two-filter access pattern. */
  def zorderRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tmp = Tables.scratchTempDir("graft-q137")
    try {
      val src = Tables.load(s, dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      val path = tmp.resolve("data").toString
      parquetZOrdered(src, path, "l_partkey", "l_suppkey", numFiles = 16)
      // every projected column participates in the verifying hash
      // (q102's rule): keys via sums, measures via exact decimal sums
      s.read.parquet(path)
        .filter(col("l_partkey").between(100L, 400L) &&
          col("l_suppkey").between(10L, 40L))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_okey"),
          sum(col("l_partkey")).as("sum_pkey"),
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_price"))
        .orderBy("l_suppkey")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q139: deterministic HASH-SHARDED EXPORT — the "write the training
    * corpus as N stable shards" step at the end of a data pipeline:
    * every document's shard is a pure function of its id
    * (md5-fold mod N — reproducible across runs, engines and
    * partitionings, like q77's mixing buckets), each shard is written as
    * ONE sorted file under a `shard=K` directory (repartition on the
    * shard key + in-partition sort), and the verifying read-back proves
    * the export lossless per shard: counts, char volume, id range, and
    * an order-independent xor content checksum (bit_xor of the 60-bit
    * md5 fold of `text` — exact at any scale, where a sum checksum
    * would need decimal routing past ~2^3 rows).
    *
    * At 100 TB this is the terminal layout lever: training jobs read
    * shard subsets without listing the world, re-exports touch only
    * changed shards, and the checksum column makes shard-level drift
    * detection a metadata-only diff. */
  def shardedExportRoundTrip(s: SparkSession, dir: String,
                             shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.functions.TextPrims.hex60C
    val tmp = Tables.scratchTempDir("graft-q139")
    try {
      val path = tmp.resolve("export").toString
      Tables.load(s, dir, "documents")
        .withColumn("shard",
          pmod(hex60C(md5(col("doc_id").cast(StringType))), lit(shards.toLong)))
        .repartition(shards, col("shard"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").partitionBy("shard").parquet(path)
      s.read.parquet(path)
        .groupBy(col("shard").cast(IntegerType).as("shard"))
        .agg(count(lit(1)).cast(IntegerType).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"),
          // bit_xor has no Column-API builder; the argument is exactly
          // TextPrims.hex60C(md5(text)) in SQL form
          expr("bit_xor(CAST(conv(substring(md5(text), 1, 15), 16, 10) " +
            "AS BIGINT))").as("xor_hash"))
        .orderBy("shard")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q110: BUCKETED-JOIN round-trip — the third storage lever after
    * partition pruning (q105) and range clustering (q106): write orders
    * and customer as bucketed+sorted managed tables on the join key
    * (8 buckets each side), then join them bucket-to-bucket and
    * aggregate. The join is pinned to sort-merge (`hint("merge")`) so
    * the bucketed layout — not a fixture-scale broadcast — carries it:
    * both scans expose `hashpartitioning(custkey, 8)`, satisfying the
    * join's distribution requirement with ZERO Exchange in the plan
    * (shape proven in SinksCatalogSpec's bucketed-join test). Oracle =
    * the same join+aggregate over the original flat parquet, so
    * hash-equality proves the bucketed catalog layout lossless. The
    * SURVEY §2.1 S9 co-location lever: at 100 TB a recurring
    * orders⋈customer join pre-bucketed on custkey skips BOTH shuffle
    * legs on every run — one bucketed write amortized over every later
    * join. Managed tables are dropped (data deleted) after the result
    * is materialized off them. */
  def bucketedJoinRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val (ot, ct) = ("graft_q110_orders_b", "graft_q110_customer_b")
    try {
      bucketedWrite(Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"), "o_custkey", ot)
      bucketedWrite(Tables.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment"), "c_custkey", ct)
      // every projected column participates in the hash (q102's rule)
      bucketedJoin(s, ot, ct)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_key"),
          sum(col("o_totalprice").cast(DecimalType(18, 4)))
            .cast(DoubleType).as("sum_price"))
        .orderBy("c_mktsegment")
        .localCheckpoint()
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $ot")
      s.sql(s"DROP TABLE IF EXISTS $ct")
    }
  }

  /** q110's write half: bucketed+sorted managed table on the join key,
    * [[BucketCount]] buckets. Shared with SinksCatalogSpec's plan guard so
    * the guarded layout can't drift from the benchmarked one. */
  private[graft] def bucketedWrite(df: DataFrame, key: String,
                                   table: String): Unit =
    df.write.mode("overwrite").bucketBy(BucketCount, key).sortBy(key)
      .saveAsTable(table)

  /** q110's join half: sort-merge pinned so the bucketed layout (not a
    * fixture-scale broadcast) carries the join. Shared with the spec's
    * zero-Exchange plan assertion. */
  private[graft] def bucketedJoin(s: SparkSession, ordersTbl: String,
                                  custTbl: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    s.table(ordersTbl).hint("merge")
      .join(s.table(custTbl), col("o_custkey") === col("c_custkey"))
  }

  /** Bucket count for q110's tables — 8 at fixture scale; production sizes
    * this to (table size / target bucket file size), same on both sides. */
  private[graft] val BucketCount = 8

  /** The q105/q106 projection: [[RtCols]] + the grouping column. Both
    * storage-lever queries and their SinksCatalogSpec scan-shape guards
    * must project the same set — [[prunedAgg]]'s hash contract ("every
    * projected column participates") depends on it. */
  private[graft] val PrunedCols = RtCols :+ "l_linestatus"

  /** Shared q105/q106 aggregate: per-linestatus counts + exact decimal
    * sums over the (optionally flag-filtered) read-back frame. Every
    * projected column participates in the hash (q102's rule). */
  private[graft] def prunedAgg(back: DataFrame,
                               flag: Option[String] = Some("R")): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val f = flag.map(v => back.filter(col("l_returnflag") === v)).getOrElse(back)
    // the hash contract is "every projected column participates": with a
    // flag FILTER the flag is covered by selection; without one it must
    // join the grouping key instead, or a corruption confined to the flag
    // column would slip through the round-trip compare (round-6 advice)
    val keys = if (flag.isDefined) Seq("l_linestatus")
               else Seq("l_returnflag", "l_linestatus")
    f.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("l_orderkey")).as("sum_key"),
        sum(col("l_quantity").cast(DecimalType(18, 4)))
          .cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 4)))
          .cast(DoubleType).as("sum_price"))
      .orderBy(keys.map(col): _*)
  }

  /** Distributed JSON-lines sink (S4; nb cells 62-64). */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Sampled CSV sink (S6; complete_pipeline.py:99) — explicit limit before
    * the single-file coalesce so the driver never pulls unbounded data. */
  def csvSample(df: DataFrame, path: String, n: Int): Unit =
    df.limit(n).coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** Result-document sink (S5/S7): reference writes metric docs to MongoDB +
    * local JSON (knn_classification.py:267-279). Offline default: JSON file. */
  trait ResultSink { def write(collection: String, df: DataFrame): Unit }
  final class JsonDirSink(baseDir: String) extends ResultSink {
    def write(collection: String, df: DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").json(s"$baseDir/$collection")
  }

  /** MongoDB result sink (S7, the reference's mongo-spark path —
    * knn_classification.py:267-271 writes result docs to the collections
    * scripts/mongo-init.js:8-22 creates). The `"mongodb"` format string
    * resolves at RUNTIME through Spark's DataSource registry, so this
    * compiles and ships in the offline build; it only needs the
    * mongo-spark-connector jar on the classpath when actually invoked
    * (the env-gated live smoke — LiveSmokeSpec — is the caller). Append
    * mode: the reference's result collections are event logs, not
    * snapshots. */
  final class MongoResultSink(uri: String, database: String)
      extends ResultSink {
    def write(collection: String, df: DataFrame): Unit =
      df.write.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .mode("append").save()
  }

  /** Env-flag contract for the live-connector smoke (round-10 verdict
    * item 7): `SPARK_GRAFT_KAFKA=host:port[/topic]` enables the Kafka
    * leg, `SPARK_GRAFT_MONGO=mongodb://...[/db]` the Mongo leg. Absent
    * vars ⇒ the smoke skips cleanly (the sandbox has no broker or
    * connector jars; the operator graphs stay proven through the file
    * twins). */
  def liveKafka: Option[(String, String)] =
    sys.env.get("SPARK_GRAFT_KAFKA").map { v =>
      v.split("/", 2) match {
        case Array(b, t) => (b, t)
        case _           => (v, "us_accidents")
      }
    }
  def liveMongo: Option[(String, String)] =
    sys.env.get("SPARK_GRAFT_MONGO").map { v =>
      val i = v.lastIndexOf('/')
      if (i > "mongodb://".length) (v.substring(0, i), v.substring(i + 1))
      else (v, "us_accidents")
    }

  /** The reference deployment's collection set (scripts/mongo-init.js:8-14)
    * — ResultSink targets should come from here so an offline JSON dir is
    * layout-compatible with the Mongo database the reference initializes. */
  val MongoCollections: Set[String] = Set(
    "us_accidents_raw", "us_accidents_cleaned", "us_accidents_clustered",
    "knn_results", "kmeans_results", "random_forest_results", "pipeline_logs")

  /** One-row result document in the reference's exact kNN shape
    * (knn_classification.py:253-263): `{ model_name, timestamp,
    * features_used[], metrics{...}, parameters{k, distance_metric} }` —
    * what the reference appends to the `knn_results` collection. Metrics
    * keys are sorted so the document schema is deterministic. */
  def knnResultsDoc(s: SparkSession, timestamp: String,
                    featuresUsed: Seq[String], metrics: Map[String, Double],
                    k: Int): DataFrame =
    s.range(1).select(
      lit("kNN").as("model_name"),
      lit(timestamp).as("timestamp"),
      array(featuresUsed.map(lit(_)): _*).as("features_used"),
      struct(metrics.toSeq.sortBy(_._1).map { case (m, v) =>
        lit(v).as(m) }: _*).as("metrics"),
      struct(lit(k).as("k"),
        lit("euclidean").as("distance_metric")).as("parameters"))
}
