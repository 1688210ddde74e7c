package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorExprs.dotp
import graft.sources.Tables

/** q245: TOP PRINCIPAL COMPONENT of the embedding covariance by power
  * iteration — the spectral summary a training-data team reads before
  * whitening, dimensionality reduction, or an anisotropy audit ("is the
  * embedding space collapsing onto one direction?"). Reports, per
  * dimension: the mean, the diagonal variance, and the dominant
  * eigenvector loading, plus the leading eigenvalue and the explained
  * variance ratio λ₁/trace(C).
  *
  * Bit-exact determinism (no RNG, no partition dependence):
  *  - per-dimension means and the (j,k) covariance entries accumulate as
  *    exact DECIMAL sums of doubles (the LloydExact convention — dyadic
  *    rationals can't hit a decimal rounding tie), so C is identical on
  *    1 core, 32 threads, or the DuckDB oracle;
  *  - the iteration starts from the FIXED vector v₀ = (0.125,…) (exactly
  *    representable: 1/√64) and runs a fixed `Iters` matrix-vector
  *    products; every product row is the codegen'd fixed-fold
  *    [[graft.functions.VectorExprs.dotp]], whose ascending left fold is
  *    bit-identical to the oracle's `list_reduce` spelling;
  *  - the eigenvector's sign is pinned by v₀, not normalized after the
  *    fact — both engines walk the same orbit.
  *
  * Shape at 100 TB: ONE wide pass builds the D² covariance — the
  * per-vector outer product explodes to D² terms that partial-aggregate
  * map-side onto 4096 (j,k) keys, so the shuffle carries
  * O(D²·partitions) rows regardless of corpus size. Everything after
  * (the D-row matrix frame, the T D-dot iterations) is
  * driver-scale-constant work expressed as tiny broadcast joins; no
  * step ever materializes more than D² rows. */
object PcaPower {
  val Dim = 64
  val Iters = 12

  private def pts(s: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.load(s, dir, "embeddings"), "vec_id")
      .select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("e"))

  /** (pos, m) → 1-row frame with the D-array ordered by pos. */
  private def toArr(df: DataFrame, pos: String, v: String,
                    out: String): DataFrame =
    df.groupBy()
      .agg(transform(array_sort(collect_list(struct(col(pos), col(v)))),
        x => x.getField(v)).as(out))

  /** Exact-decimal per-dimension means of (vec_id, e). */
  private def meansOf(p: DataFrame): DataFrame =
    p.select(posexplode(col("e")).as(Seq("pos", "val")))
      .groupBy("pos")
      .agg((sum(col("val").cast(DecimalType(28, 9))).cast(DoubleType) /
        count(lit(1))).as("mu"))
      .localCheckpoint()

  /** The (j, k, cov) covariance entries — exact-decimal sums of centered
    * products; the explode partial-aggregates onto D² keys before any
    * shuffle. */
  /** Centered vector, QUANTIZED at 7 dp. The quantization is what makes
    * the covariance bit-exact cross-engine: a product of two 7-dp
    * decimals is an exact 14-dp decimal whose nearest double recovers
    * it exactly under a scale-14 cast on BOTH engines — whereas casting
    * raw full-mantissa doubles to DECIMAL straddles Spark's
    * shortest-string vs DuckDB's exact-binary rounding ~1e-5/value at
    * scale 12 (observed at sf0.1). Rounding at 7 dp has 1e-10/value
    * straddle margin — the rulebook trade. */
  private def centeredC: Column =
    zip_with(col("e"), col("mu_arr"), (a, b) => round(a - b, 7))

  private def covPlanOf(p: DataFrame, mu: DataFrame, n: Long): DataFrame = {
    val muArr = toArr(mu, "pos", "mu", "mu_arr")
    val centered = p.crossJoin(broadcast(muArr))
      .select(centeredC.as("c"))
    centered
      .select(col("c"), posexplode(col("c")).as(Seq("j", "cj")))
      .select(col("j"),
        posexplode(transform(col("c"), ck => col("cj") * ck))
          .as(Seq("k", "prod")))
      .groupBy("j", "k")
      .agg((sum(col("prod").cast(DecimalType(38, 14))).cast(DoubleType) /
        lit(n - 1).cast(DoubleType)).as("cov"))
  }

  private def covOf(p: DataFrame, mu: DataFrame, n: Long): DataFrame =
    covPlanOf(p, mu, n)
      .localCheckpoint() // read by the matrix frame, the diag and trace

  /** The un-checkpointed covariance plan — PlanSpec pins its shape
    * (map-side partial agg, broadcast mean join, no cartesian). */
  private[graft] def covFrameForPlan(s: SparkSession, dir: String)
      : DataFrame = {
    val p = pts(s, dir)
    covPlanOf(p, meansOf(p), p.count())
  }

  /** (j, crow): the D-row matrix frame of a (j, k, cov) entry set. */
  private def rowsOf(cov: DataFrame): DataFrame =
    cov.groupBy("j")
      .agg(transform(array_sort(collect_list(struct(col("k"), col("cov")))),
        x => x.getField("cov")).as("crow"))
      .localCheckpoint() // read once per iteration

  /** `Iters` power-iteration steps from v0 = (0.125,…): a 1-row frame
    * (v, nrm) — the unit vector and the final pre-normalization norm
    * (the eigenvalue estimate).
    *
    * The orbit runs ON THE DRIVER over the collected D×D matrix — an
    * R7-compliant O(D²) materialization (constant in corpus size) that
    * replaces 12 × (tiny job + checkpoint) with microseconds of JVM
    * arithmetic. Bit-exactness is preserved because every operation
    * replicates the relational spelling's IEEE order exactly: the
    * matrix-vector and norm dots are the same ascending `s += x·y`
    * fold as the codegen'd [[dotp]] (and the oracle's `list_reduce`),
    * division and sqrt are single correctly-rounded IEEE ops. The
    * earlier DataFrame-iteration form produced the identical frame —
    * verified by the unchanged q245/q248/q258 oracle hashes. */
  private def iterate(s: SparkSession, cRows: DataFrame): DataFrame = {
    val c: Array[Array[Double]] = cRows.collect()
      .map(r => (r.get(r.fieldIndex("j")).asInstanceOf[Number].longValue,
        r.getSeq[Double](r.fieldIndex("crow")).toArray))
      .sortBy(_._1).map(_._2)
    require(c.length == Dim, s"matrix frame has ${c.length} rows")
    var v = Array.fill(Dim)(0.125)
    var nrm = 0.0
    for (_ <- 1 to Iters) {
      val w = Array.tabulate(Dim) { j =>
        var acc = 0.0
        var k = 0
        while (k < Dim) { acc += c(j)(k) * v(k); k += 1 }
        acc
      }
      var sq = 0.0
      var i = 0
      while (i < Dim) { sq += w(i) * w(i); i += 1 }
      nrm = math.sqrt(sq)
      v = w.map(_ / nrm)
    }
    import s.implicits._
    Seq((v.toSeq, nrm)).toDF("v", "nrm")
  }

  private def traceOf(cov: DataFrame): DataFrame =
    cov.filter(col("j") === col("k"))
      .agg(sum(col("cov").cast(DecimalType(28, 12))).cast(DoubleType)
        .as("tr"))

  def pcaPower(s: SparkSession, dir: String): DataFrame = {
    val p = pts(s, dir)
    val n = p.count()
    val mu = meansOf(p)
    val cov = covOf(p, mu, n)
    val cRows = rowsOf(cov)
    val trace = traceOf(cov)
    val v = iterate(s, cRows)
    val perDim = v.select(posexplode(col("v")).as(Seq("dim", "loading")),
      col("nrm"))
    perDim
      .join(mu.withColumnRenamed("pos", "dim"), "dim")
      .join(cov.filter(col("j") === col("k"))
        .select(col("j").as("dim"), col("cov").as("variance")), "dim")
      .crossJoin(broadcast(trace))
      .select(col("dim").cast(IntegerType).as("dim"),
        round(col("mu"), 6).as("mu_dim"),
        round(col("variance"), 6).as("var_dim"),
        round(col("loading"), 6).as("loading"),
        round(col("nrm"), 6).as("lambda1"),
        round(col("nrm") / col("tr"), 6).as("explained"))
      .orderBy("dim")
  }

  /** q248: SECOND PRINCIPAL COMPONENT by DEFLATION — the same fixed
    * orbit run again on C₂ = C − λ₁·v₁v₁ᵀ. Reports both loadings per
    * dimension, both eigenvalue estimates, the cumulative explained
    * ratio, and the v₁·v₂ orthogonality dot — the number that certifies
    * the deflation actually removed the first direction. Every deflated
    * entry is the literal double expression `cov − nrm·v[j+1]·v[k+1]`
    * spelled identically in both engines, so determinism carries over
    * from q245 unchanged. */
  def pcaDeflate(s: SparkSession, dir: String): DataFrame = {
    val p = pts(s, dir)
    val n = p.count()
    val cov = covOf(p, meansOf(p), n)
    val trace = traceOf(cov)
    val v1 = iterate(s, rowsOf(cov))
    val v2 = iterate(s, rowsOf(deflateOf(cov, v1)))
    val combo = v1.select(col("v").as("v1"), col("nrm").as("l1"))
      .crossJoin(v2.select(col("v").as("v2"), col("nrm").as("l2")))
      .select(col("v1"), col("v2"), col("l1"), col("l2"),
        dotp(col("v1"), col("v2")).as("ortho"))
    combo
      .select(posexplode(arrays_zip(col("v1"), col("v2")))
          .as(Seq("dim", "z")),
        col("l1"), col("l2"), col("ortho"))
      .crossJoin(broadcast(trace))
      .select(col("dim").cast(IntegerType).as("dim"),
        round(col("z.v1"), 6).as("loading1"),
        round(col("z.v2"), 6).as("loading2"),
        round(col("l1"), 6).as("lambda1"),
        round(col("l2"), 6).as("lambda2"),
        round((col("l1") + col("l2")) / col("tr"), 6).as("cum_explained"),
        round(col("ortho"), 6).as("ortho_dot"))
      .orderBy("dim")
  }

  /** C₂ = C − λ₁·v₁v₁ᵀ, spelled identically in both engines. */
  private def deflateOf(cov: DataFrame, v1: DataFrame): DataFrame =
    cov.crossJoin(broadcast(v1))
      .select(col("j"), col("k"),
        (col("cov") - col("nrm") * expr("element_at(v, j + 1)") *
          expr("element_at(v, k + 1)")).as("cov"))

  /** q258: PCA PROJECTION per label — the APPLICATION step of the
    * spectral family: every embedding projected onto the two leading
    * directions (the q245/q248 orbits), then summarized per class
    * label: count, centroid, and within-class variance in PC space —
    * the 2-D separability report a labeling/evaluation pipeline reads
    * to see whether classes are linearly distinguishable in the
    * dominant plane. Projections are the codegen'd fixed-fold dot of
    * the centered vector with the broadcast loadings (one corpus-scan
    * map, zero extra shuffle beyond the label agg); moments accumulate
    * as exact DECIMAL sums, means left unrounded (q55 rule). */
  def pcaProjection(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.fanOut(Tables.load(s, dir, "embeddings"), "vec_id")
      .select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("e"), col("label"))
    val p = raw.select("vec_id", "e")
    val n = p.count()
    val mu = meansOf(p)
    val cov = covOf(p, mu, n)
    val v1 = iterate(s, rowsOf(cov))
    val v2 = iterate(s, rowsOf(deflateOf(cov, v1)))
    val muArr = toArr(mu, "pos", "mu", "mu_arr")
    def cvec = centeredC // same 7-dp quantized centering as the covariance
    // projections QUANTIZE to micro-units before any aggregation: a
    // raw full-mantissa double cast straight to DECIMAL straddles
    // Spark's shortest-string vs DuckDB's exact-binary rounding about
    // once per 1e5 values at scale 12 (observed at sf0.1) — at scale 6
    // the margin is 1e-11 per value, and every moment after is integer
    val projected = raw.crossJoin(broadcast(muArr))
      .crossJoin(broadcast(v1.select(col("v").as("v1"))))
      .crossJoin(broadcast(v2.select(col("v").as("v2"))))
      .select(col("label"),
        (dotp(cvec, col("v1")).cast(DecimalType(18, 6)) * 1000000)
          .cast(LongType).as("pc1"),
        (dotp(cvec, col("v2")).cast(DecimalType(18, 6)) * 1000000)
          .cast(LongType).as("pc2"))
    // moments sum as DECIMAL(38,0): each pc*pc is up to ~2.6e14, so a
    // plain Long sum silently wraps past ~35k rows per label while
    // DuckDB promotes BIGINT sums to HUGEINT — the exact decimal sum
    // matches the oracle's exact-integer-then-double path bit-for-bit
    def exact(c: Column) = sum(c.cast(DecimalType(38, 0)))
    def m(c: String) =
      exact(col(c)).cast(DoubleType) / count(lit(1)) / lit(1000000.0)
    def v(c: String) =
      (exact(col(c) * col(c)).cast(DoubleType) / count(lit(1)) -
        (exact(col(c)).cast(DoubleType) / count(lit(1))) *
        (exact(col(c)).cast(DoubleType) / count(lit(1)))) / lit(1.0e12)
    projected.groupBy("label")
      .agg(count(lit(1)).cast(IntegerType).as("n"),
        m("pc1").as("mean_pc1"), m("pc2").as("mean_pc2"),
        v("pc1").as("var_pc1"), v("pc2").as("var_pc2"))
      .select(col("label").cast(IntegerType).as("label"), col("n"),
        col("mean_pc1"), col("mean_pc2"), col("var_pc1"), col("var_pc2"))
      .orderBy("label")
  }

  // ---------------------------------------------------------------- oracle
  import LloydExact.dotS

  /** The shared covariance CTE block (e, x, mu, cx, cov, crows, tr). */
  private def baseCtes: String =
    s"""e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |x AS (SELECT vec_id, u['pos'] AS pos, u['val'] AS val FROM (
       |  SELECT vec_id, unnest(list_transform(
       |    generate_series(1, len(e)), i -> {'pos': i - 1, 'val': e[i]}))
       |    AS u FROM e)),
       |mu AS (SELECT pos,
       |    CAST(SUM(CAST(val AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*)
       |      AS mu
       |  FROM x GROUP BY pos),
       |cx AS MATERIALIZED (SELECT x.vec_id, x.pos AS j,
       |    round(x.val - mu.mu, 7) AS cv
       |  FROM x JOIN mu ON x.pos = mu.pos),
       |cov AS MATERIALIZED (SELECT a.j, b.j AS k,
       |    CAST(SUM(CAST(a.cv * b.cv AS DECIMAL(38,14))) AS DOUBLE) /
       |      ((SELECT COUNT(*) FROM e) - 1) AS cov
       |  FROM cx a JOIN cx b ON a.vec_id = b.vec_id
       |  GROUP BY a.j, b.j),
       |crows AS MATERIALIZED (SELECT j, list(cov ORDER BY k) AS crow
       |  FROM cov GROUP BY j),
       |tr AS (SELECT CAST(SUM(CAST(cov AS DECIMAL(28,12))) AS DOUBLE)
       |    AS tr
       |  FROM cov WHERE j = k)""".stripMargin

  /** A `p`-prefixed power-iteration CTE chain over matrix frame
    * `crowsRel` — ${p}v0 … ${p}v`Iters`. Every step is MATERIALIZED:
    * each ${p}v CTE is referenced three times by its successor, so
    * DuckDB's default inlining would expand the chain 3^Iters-fold. */
  private def iterChain(p: String, crowsRel: String): String = {
    val steps = (1 to Iters).map { t =>
      val prev = s"${p}v${t - 1}"
      s"""${p}w$t AS MATERIALIZED (SELECT list(wj ORDER BY j) AS w FROM (
         |  SELECT j, ${dotS("crow", "v")} AS wj FROM $crowsRel, $prev)),
         |${p}v$t AS MATERIALIZED (SELECT list_transform(w, x ->
         |    x / sqrt(${dotS("w", "w")})) AS v,
         |  sqrt(${dotS("w", "w")}) AS nrm FROM ${p}w$t)""".stripMargin
    }.mkString(",\n")
    s"""${p}v0 AS (SELECT list_transform(generate_series(1, $Dim),
       |    i -> CAST(0.125 AS DOUBLE)) AS v),
       |$steps""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q245_pca_power" ->
      s"""WITH $baseCtes,
         |${iterChain("", "crows")},
         |vd AS (SELECT u['dim'] AS dim, u['l'] AS loading FROM (
         |  SELECT unnest(list_transform(generate_series(1, $Dim),
         |    i -> {'dim': i - 1, 'l': v[i]})) AS u FROM v$Iters))
         |SELECT CAST(vd.dim AS INTEGER) AS dim,
         |  round(mu.mu, 6) AS mu_dim,
         |  round(d.cov, 6) AS var_dim,
         |  round(vd.loading, 6) AS loading,
         |  round(v$Iters.nrm, 6) AS lambda1,
         |  round(v$Iters.nrm / tr.tr, 6) AS explained
         |FROM vd
         |JOIN mu ON mu.pos = vd.dim
         |JOIN cov d ON d.j = vd.dim AND d.k = vd.dim
         |CROSS JOIN v$Iters CROSS JOIN tr
         |ORDER BY dim""".stripMargin,
    "q258_pca_projection" -> {
      def mS(c: String) =
        s"CAST(SUM($c) AS DOUBLE) / COUNT(*) / 1000000.0"
      def vS(c: String) = {
        val raw = s"CAST(SUM($c) AS DOUBLE) / COUNT(*)"
        s"(CAST(SUM($c * $c) AS DOUBLE) / COUNT(*) - ($raw) * ($raw)) " +
          "/ 1.0e12"
      }
      s"""WITH $baseCtes,
         |${iterChain("", "crows")},
         |cov2 AS MATERIALIZED (SELECT c.j, c.k,
         |    c.cov - v.nrm * v.v[c.j + 1] * v.v[c.k + 1] AS cov
         |  FROM cov c CROSS JOIN v$Iters v),
         |crows2 AS MATERIALIZED (SELECT j, list(cov ORDER BY k) AS crow
         |  FROM cov2 GROUP BY j),
         |${iterChain("b", "crows2")},
         |cvec AS (SELECT vec_id, list(cv ORDER BY j) AS c
         |  FROM cx GROUP BY vec_id),
         |proj AS (SELECT emb.label,
         |    CAST(CAST(${dotS("cvec.c", "a.v")} AS DECIMAL(18,6))
         |      * 1000000 AS BIGINT) AS pc1,
         |    CAST(CAST(${dotS("cvec.c", "b.v")} AS DECIMAL(18,6))
         |      * 1000000 AS BIGINT) AS pc2
         |  FROM cvec JOIN embeddings emb ON cvec.vec_id = emb.vec_id
         |  CROSS JOIN v$Iters a CROSS JOIN bv$Iters b)
         |SELECT CAST(label AS INTEGER) AS label,
         |  CAST(COUNT(*) AS INTEGER) AS n,
         |  ${mS("pc1")} AS mean_pc1,
         |  ${mS("pc2")} AS mean_pc2,
         |  ${vS("pc1")} AS var_pc1,
         |  ${vS("pc2")} AS var_pc2
         |FROM proj GROUP BY label ORDER BY label""".stripMargin
    },
    "q248_pca_deflate" ->
      s"""WITH $baseCtes,
         |${iterChain("", "crows")},
         |cov2 AS MATERIALIZED (SELECT c.j, c.k,
         |    c.cov - v.nrm * v.v[c.j + 1] * v.v[c.k + 1] AS cov
         |  FROM cov c CROSS JOIN v$Iters v),
         |crows2 AS MATERIALIZED (SELECT j, list(cov ORDER BY k) AS crow
         |  FROM cov2 GROUP BY j),
         |${iterChain("b", "crows2")},
         |vd AS (SELECT u['dim'] AS dim, u['l1'] AS l1, u['l2'] AS l2
         |  FROM (SELECT unnest(list_transform(generate_series(1, $Dim),
         |    i -> {'dim': i - 1, 'l1': a.v[i], 'l2': b.v[i]})) AS u
         |  FROM v$Iters a CROSS JOIN bv$Iters b))
         |SELECT CAST(vd.dim AS INTEGER) AS dim,
         |  round(vd.l1, 6) AS loading1,
         |  round(vd.l2, 6) AS loading2,
         |  round(a.nrm, 6) AS lambda1,
         |  round(b.nrm, 6) AS lambda2,
         |  round((a.nrm + b.nrm) / tr.tr, 6) AS cum_explained,
         |  round(${dotS("a.v", "b.v")}, 6) AS ortho_dot
         |FROM vd CROSS JOIN v$Iters a CROSS JOIN bv$Iters b CROSS JOIN tr
         |ORDER BY dim""".stripMargin)
}
