package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextPrims._
import graft.sources.Tables

/** Deduplication operators over the `documents` table: exact (hash-groupBy),
  * MinHash signatures, LSH band-bucket candidate pairs, exact n-gram Jaccard
  * verification, and SimHash fingerprints.
  *
  * Scale design: the LSH path is the 100 TB shape — per-doc signatures are a
  * narrow map (no shuffle), banding explodes to (bandKey, docId) and the only
  * shuffle is the equi-join on bandKey, whose buckets stay small by
  * construction (band collisions ≈ near-dups only). Exact Jaccard runs only
  * on LSH candidates, never all pairs. Everything is built-in expressions
  * (whole-stage codegen), no UDFs.
  *
  * TESTDATA has no duplicate texts, so the dedup corpora inject
  * deterministic duplicates/near-duplicates first — exercising the exact
  * semantics a real crawl-dedup would.
  */
/** Scale knobs of the MinHash/LSH/SimHash family. The defaults are the
  * fixture-scale settings every oracle query is pinned to; the 100 TB
  * tuning story (more hashes and narrower bands for higher recall, longer
  * shingles, a 64-bit SimHash split into 16-bit blocks) is then a config
  * value, not a code edit. Recall math: a pair with Jaccard j collides in
  * at least one band with probability 1 − (1 − j^bandSize)^numBands. */
final case class DedupConfig(
    numHashes: Int = 8,
    bandSize: Int = 2,
    shingleN: Int = 3,
    jaccardThreshold: Double = 0.5,
    hammingThreshold: Int = 3,
    simhashBlocks: Int = 4) {
  require(numHashes > 0 && bandSize > 0 && numHashes % bandSize == 0,
    s"numHashes ($numHashes) must be a positive multiple of bandSize ($bandSize)")
  require(shingleN > 0, s"shingleN must be positive, got $shingleN")
  // pigeonhole soundness: Hamming-<=t pairs must agree on >=1 whole block
  require(hammingThreshold < simhashBlocks,
    s"hammingThreshold ($hammingThreshold) must be < simhashBlocks ($simhashBlocks)")
  def numBands: Int = numHashes / bandSize
}

object DedupConfig { val Default: DedupConfig = DedupConfig() }

object Dedup extends org.apache.spark.internal.Logging {
  // oracle-pinned defaults (the DuckDB SQL below is generated from these;
  // operators take a DedupConfig so non-default settings are a call-site
  // choice that simply has no oracle twin)
  val NumHashes: Int = DedupConfig.Default.numHashes
  val BandSize: Int = DedupConfig.Default.bandSize
  val ShingleN: Int = DedupConfig.Default.shingleN
  val JaccardThreshold: Double = DedupConfig.Default.jaccardThreshold

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** FIXTURE convention, not an operator property: injected dup/near-dup
    * variants carry id = base id + VariantIdOffset, so mapping an id back
    * to its base doc is `% VariantIdOffset`. Operators that need source
    * attribution take an injectable `baseIdOf` defaulting to this; a
    * production corpus supplies its own mapping (or `identity`).
    *
    * A HIGH BIT (2^40 ≈ 1.1e12), not a decimal constant near the data's
    * own key range: doc_id reaches ~6×10^5 per unit scale factor, so a
    * 10^7-style offset collides with real ids somewhere around sf≈20 and
    * would silently merge variant rows with existing documents. 2^40
    * keeps the variant space disjoint through sf ≈ 2×10^6 while staying
    * exactly representable in every engine's BIGINT and DOUBLE. The
    * constant is interpolated into every oracle string so the two sides
    * cannot drift. */
  val VariantIdOffset: Long = 1L << 40
  val fixtureBaseId: Column => Column = _ % VariantIdOffset

  /** documents ∪ exact copies of every 10th doc (id offset +VariantIdOffset). */
  def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + VariantIdOffset).as("doc_id"), col("text")))
  }
  private val dupCorpusS =
    s"""SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + $VariantIdOffset, text FROM documents WHERE doc_id % 10 = 0"""
      .stripMargin.replace("\n", " ")

  /** documents ∪ near-dup variants (last token dropped) of every 20th doc. */
  def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val t = tokensC(col("text"))
    val variant = when(size(t) > 1, concat_ws(" ", slice(t, lit(1), size(t) - 1)))
      .otherwise(col("text"))
    d.unionByName(d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + VariantIdOffset).as("doc_id"), variant.as("text")))
  }
  private val nearDupCorpusS =
    s"""SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT doc_id + $VariantIdOffset,
       |   CASE WHEN len(t) > 1
       |     THEN array_to_string(list_slice(t, 1, len(t) - 1), ' ')
       |     ELSE text END
       | FROM (SELECT doc_id, text, ${tokensS("text")} AS t FROM documents)
       | WHERE doc_id % 20 = 0""".stripMargin.replace("\n", " ")

  /** q318: EXACT SET-SIMILARITY JOIN by PREFIX FILTERING (the
    * AllPairs/PPJoin family) — the dedup family's exact-threshold
    * complement to LSH banding: EVERY pair with token-set Jaccard ≥ t,
    * no probabilistic misses, without the all-pairs product. The
    * classic completeness argument: order each document's distinct
    * tokens canonically by ascending global document frequency (rarest
    * first, ties by token) and index only the first
    * |x| − ⌈t·|x|⌉ + 1 tokens; two sets with Jaccard ≥ t must share a
    * token within those prefixes (if the prefixes were disjoint, too
    * many of each side's tokens would be unmatched to reach t), so the
    * prefix equi-join yields a candidate SUPERSET and the exact
    * Jaccard verify keeps the true pairs. The oracle executes the
    * identical algorithm in DuckDB; completeness vs brute force is a
    * theorem, asserted against an actual all-pairs scan by the spec at
    * fixture scale.
    *
    * BLOCKED, stated contract: the join runs WITHIN source blocks
    * (`a.source = b.source`), the standard production scoping for
    * exact similarity joins. The reason is not the algorithm but
    * arithmetic: this corpus is ~10 % near-duplicate pairs GLOBALLY,
    * and any exact method must verify every true pair — quadratic in
    * duplicate-cluster size no matter how good the filter. Blocking
    * bounds the pair space to the unit a curator actually holds exact
    * guarantees over (a source/domain/snapshot); the GLOBAL regime
    * stays LSH's (q28 — sublinear, probabilistic), and the pairing of
    * the two is exactly how fleet-scale dedup is run.
    *
    * Shape at 100 TB: candidates come from ONE equi-join keyed by
    * (source, prefix token) — rarest-first prefixes keep posting lists
    * short — never a cross join; the verify is an array intersection
    * over two bounded token arrays. This is the exact regime LSH
    * trades away: the operator to reach for when a missed duplicate is
    * unacceptable (legal holds, eval-set isolation). */
  /** The q27 near-dup corpus with each variant inheriting its base
    * document's source (q318's block key); the spec brute-forces over
    * this same frame. */
  private[graft] def nearDupSourceCorpus(s: SparkSession,
                                         dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"), col("source"))
    val tC = tokensC(col("text"))
    val variant = when(size(tC) > 1,
      concat_ws(" ", slice(tC, lit(1), size(tC) - 1)))
      .otherwise(col("text"))
    d.unionByName(d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + VariantIdOffset).as("doc_id"),
        variant.as("text"), col("source")))
  }

  def prefixSimJoin(s: SparkSession, dir: String,
                    t: Double = 0.9): DataFrame = {
    val corpus = nearDupSourceCorpus(s, dir)
    val toks = corpus
      .select(col("doc_id"), col("source"),
        explode(array_distinct(tokensC(col("text")))).as("tok"))
      .localCheckpoint() // df counts + the per-doc arrays read it
    val dfc = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    // canonical per-doc token array: ascending (global df, tok) — any
    // total order shared by both sides preserves the prefix theorem
    val arrs = toks.join(dfc, Seq("tok"))
      .groupBy("doc_id", "source")
      .agg(transform(
        array_sort(collect_list(struct(col("df"), col("tok")))),
        x => x.getField("tok")).as("ts"))
      .withColumn("n", size(col("ts")))
      .withColumn("p",
        col("n") - ceil(lit(t) * col("n")).cast(IntegerType) + 1)
      .localCheckpoint() // both prefix sides + the verify read it
    val pre = arrs.select(col("doc_id"), col("source"), col("n"),
      explode(slice(col("ts"), lit(1), col("p"))).as("tok"))
    // size filter (the AllPairs length bound): Jaccard ≥ t forces
    // t·max(|a|,|b|) ≤ min(|a|,|b|) — prunes candidates before the
    // distinct + verify without losing a single true pair
    val cand = pre.as("a").join(pre.as("b"),
        col("a.source") === col("b.source") &&
          col("a.tok") === col("b.tok") &&
          col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.n"), col("b.n")) * lit(t) <=
            least(col("a.n"), col("b.n")))
      .select(col("a.source").as("source"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val va = arrs.select(col("doc_id").as("doc_a"), col("ts").as("ta"),
      col("n").as("na"))
    val vb = arrs.select(col("doc_id").as("doc_b"), col("ts").as("tb"),
      col("n").as("nb"))
    val jac = col("inter").cast(DoubleType) /
      (col("na") + col("nb") - col("inter")).cast(DoubleType)
    cand.join(va, Seq("doc_a")).join(vb, Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .filter(jac >= t)
      .select(col("source"), col("doc_a"), col("doc_b"),
        col("inter").cast(LongType).as("n_common"),
        round(jac, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** q320: WINNOWING fingerprint selection (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS algorithm) — the fingerprinting scheme with a
    * GUARANTEE the q25/q30 rolling-hash samplers lack: from each window
    * of `w` consecutive shingle hashes keep the minimum (rightmost on
    * ties), and any substring match of at least w + n − 1 tokens is
    * certain to share a selected fingerprint — detection is a theorem,
    * not a probability, while storing only ~2/(w+1) of all hashes.
    *
    * The rightmost-min selection is ONE window pass, no per-window
    * explode: each (hash, pos) is packed into a single BIGINT key
    * `h32·2²⁴ + (2²⁴−1−pos)` whose min over the w-frame IS the
    * rightmost minimal hash (smaller hash ⇒ smaller key; equal hashes ⇒
    * later pos ⇒ smaller key), so `min(key) OVER (ROWS CURRENT..w−1
    * FOLLOWING)` at each valid window start selects exactly the paper's
    * fingerprint, identically in both engines (positions may be 0- vs
    * 1-based — the packing is shift-invariant, the selected hash is
    * not). Contract: documents under 2²⁴ shingles (16M tokens/doc).
    *
    * Matching is the standard inverted-index shape: distinct
    * (doc, fingerprint) postings, fingerprints seen in more than
    * `maxPostings` docs dropped (boilerplate-shingle suppression — the
    * hot-key guard every production index applies), pairs from the
    * postings self-join, kept at `minShared`+ shared fingerprints.
    *
    * Shape at 100 TB: one corpus scan → per-doc sort (doc-sized window
    * partitions, no global sort) → distinct → the postings equi-join
    * whose fanout the cap bounds; never all-pairs. The guarantee is
    * asserted by the spec: every injected near-dup variant pair must
    * surface (its shared prefix vastly exceeds w + n − 1). */
  /** The winnowed (doc_id, fph) fingerprint postings of a corpus — the
    * selection half of [[winnowMatches]], exposed so the spec can check
    * it against a per-window brute force of the paper's rule. */
  private[graft] def winnowFingerprints(corpus: DataFrame, n: Int,
                                        w: Int): DataFrame = {
    val posM = 1L << 24
    val keyed = Tables.fanOut(corpus, "doc_id")
      .select(col("doc_id"),
        posexplode(shinglesC(tokensC(col("text")), n)).as(Seq("pos", "sh")))
      // fail-loud packing contract: a doc with ≥2²⁴ shingles would make
      // the position field wrap and silently corrupt fingerprint
      // selection — raise instead (same style as kcore/q335 guards)
      .select(col("doc_id"),
        when(col("pos") < lit(posM), col("pos"))
          .otherwise(raise_error(concat(
            lit("winnowFingerprints: doc "), col("doc_id").cast(StringType),
            lit(s" has >= 2^24 shingles — (hash,pos) packing would " +
              "corrupt; split the document or widen the position field")))
            .cast(IntegerType)).as("pos"), col("sh"))
      .select(col("doc_id"), col("pos"),
        (hex32C(seededMd5C(320, col("sh"))) * lit(posM) +
          (lit(posM - 1) - col("pos"))).as("key"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    keyed
      .withColumn("m", count(lit(1)).over(byDoc))
      .withColumn("wkey", min(col("key")).over(byDoc.orderBy("pos")
        .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
          w - 1)))
      // valid window STARTS only (0-based): i ≤ m − w, or the single
      // whole-doc window when the doc is shorter than w
      .filter(col("pos") <= greatest(col("m") - w, lit(0)))
      .select(col("doc_id"), shiftright(col("wkey"), 24).as("fph"))
      .distinct()
  }

  def winnowMatches(s: SparkSession, dir: String, n: Int = 4, w: Int = 4,
                    maxPostings: Int = 8, minShared: Int = 3): DataFrame = {
    val fp = winnowFingerprints(nearDupCorpus(s, dir), n, w)
      .localCheckpoint() // four consumers: docn, the cap, both join sides
    val docn = fp.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val rare = fp.groupBy("fph").agg(count(lit(1)).as("docs"))
      .filter(col("docs") <= maxPostings).select("fph")
    val fpF = fp.join(rare, Seq("fph"))
    val pairs = fpF.as("a").join(fpF.as("b"),
        col("a.fph") === col("b.fph") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(docn.select(col("doc_id").as("doc_a"), col("n_fp").as("n_fp_a")),
        Seq("doc_a"))
      .join(docn.select(col("doc_id").as("doc_b"), col("n_fp").as("n_fp_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("n_fp_a"), col("n_fp_b"),
        round(col("n_shared").cast(DoubleType) /
          least(col("n_fp_a"), col("n_fp_b")).cast(DoubleType), 6)
          .as("overlap"))
      .orderBy("doc_a", "doc_b")
  }

  /** THE exact-dedup content hash: md5 of whitespace-normalized text.
    * Shared by q26 and q100 (and their oracles via [[normHashS]]) so the
    * normalization can never silently diverge between the dedup operator
    * and the pipeline composite that claims to reuse it. */
  def normHash(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))
  /** DuckDB spelling of [[normHash]] (regexp_replace needs the 'g' flag). */
  def normHashS(expr: String): String =
    s"md5(regexp_replace(trim(lower($expr)), '\\s+', ' ', 'g'))"

  /** Exact dedup: md5 of whitespace-normalized text → groupBy hash →
    * canonical = min doc_id per content group. One hash-agg shuffle on a
    * 128-bit key; at 100 TB this is the cheapest possible exact dedup (no
    * sort, map-side partial agg). */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.fanOut(dupCorpus(s, dir), "doc_id")
      .withColumn("h", normHash(col("text")))
      .groupBy("h")
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).cast(IntegerType).as("n_copies"))
      .select("canonical_id", "n_copies")
      .orderBy("canonical_id")

  /** documents ∪ "quote" variants: every 15th doc contributes its
    * first-half token prefix as a new doc — a contained subset whose
    * Jaccard (≈ 0.5) sits below the q29 near-dup threshold while its
    * containment is exactly 1.0. */
  def containedCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val t = tokensC(col("text"))
    val half = greatest((size(t).cast(DoubleType) / lit(2))
      .cast(IntegerType), lit(4))
    d.unionByName(d.filter(col("doc_id") % 15 === 0)
      .select((col("doc_id") + VariantIdOffset).as("doc_id"),
        concat_ws(" ", slice(t, lit(1), half)).as("text")))
  }
  /** DuckDB spelling of [[stagedIncrement]] (ids only — cohort texts),
    * shared by the q153 and q195 oracles. */
  private val stagedIncrementS =
    s"""SELECT doc_id + $VariantIdOffset AS doc_id, text FROM documents
       |    WHERE doc_id % 10 = 0
       |  UNION ALL SELECT doc_id + ${2 * VariantIdOffset}, text || ' zqbatchdup'
       |    FROM documents WHERE doc_id % 21 = 0
       |  UNION ALL SELECT doc_id + ${3 * VariantIdOffset}, text || ' zqbatchdup'
       |    FROM documents WHERE doc_id % 21 = 0
       |  UNION ALL SELECT doc_id + ${4 * VariantIdOffset}, text || ' zqunique'
       |    FROM documents WHERE doc_id % 13 = 0""".stripMargin

  private val containedCorpusS =
    s"""SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT doc_id + $VariantIdOffset,
       |   array_to_string(list_slice(t, 1, greatest(len(t) // 2, 4)), ' ')
       | FROM (SELECT doc_id, text, ${tokensS("text")} AS t FROM documents)
       | WHERE doc_id % 15 = 0""".stripMargin.replace("\n", " ")

  /** q190: CONTAINMENT PAIRS — ASYMMETRIC near-duplicate detection:
    * containment |A∩B| / min(|A|,|B|) flags a document whose shingle set
    * is (nearly) a subset of another's — quotes, excerpts, truncated
    * mirrors — which symmetric Jaccard structurally misses (a half-length
    * excerpt has Jaccard ≈ 0.5, far under any dedup threshold, while its
    * containment is 1.0). The standard asymmetric complement every
    * crawl-dedup pipeline runs next to MinHash/Jaccard.
    *
    * Candidates come from SINGLE-SIGNATURE bands (bandSize = 1): a pair
    * with Jaccard j collides on one of the 8 MinHash signatures with
    * probability 1−(1−j)⁸ ≈ 0.996 at j = 0.5 — the high-recall banding
    * containment needs, where the default 2-wide bands (tuned for j ≥
    * 0.8) would miss most subset pairs. Verification is the exact
    * relational intersection of q29 (equi-join on (doc, shingle) rows —
    * no per-doc set arrays). At crawl scale the wide banding is paired
    * with a bucket-size cap (drop or split pathological buckets formed
    * by corpus-frequent min-shingles); at fixture scale buckets stay
    * small by construction. */
  def containmentPairs(s: SparkSession, dir: String,
                       threshold: Double = 0.9): DataFrame = {
    val cfg = DedupConfig(bandSize = 1)
    val shs = shingleRows(containedCorpus(s, dir), cfg).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shs.count() // eager fill: sizes, signatures and both verify sides
    try {
      val sizes = shs.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val pairs = bandPairsFrom(signaturesFrom(shs, cfg), cfg)
      val inter = pairs
        .join(shs.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(shs.as("sb"), col("doc_b") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
      val out = inter
        .join(sizes.withColumnsRenamed(
          Map("doc_id" -> "doc_a", "sz" -> "sza")), Seq("doc_a"))
        .join(sizes.withColumnsRenamed(
          Map("doc_id" -> "doc_b", "sz" -> "szb")), Seq("doc_b"))
        .withColumn("cont", col("ni").cast(DoubleType) /
          least(col("sza"), col("szb")).cast(DoubleType))
        .filter(col("cont") >= threshold)
        .select(col("doc_a"), col("doc_b"),
          col("sza").cast(IntegerType).as("sz_a"),
          col("szb").cast(IntegerType).as("sz_b"),
          round(col("cont"), 6).as("containment"),
          round(col("ni").cast(DoubleType) /
            (col("sza") + col("szb") - col("ni")).cast(DoubleType), 6)
            .as("jaccard"))
        .orderBy("doc_a", "doc_b")
        .localCheckpoint()
      out
    } finally { shs.unpersist(); () }
  }

  /** q232: LSH PLANTED-TRUTH PRECISION/RECALL — the candidate
    * generator graded against the fixture's KNOWN near-dup pairs
    * (every 20th doc's drop-last-token variant): recall says how many
    * planted pairs the banding recovers (the 1−(1−jˢ)ᵇ math made
    * measurable); "precision" counts only planted pairs as true, so it
    * UNDERSTATES whenever natural near-dups exist — it grades the
    * harness, not the corpus, and pairs with q71's ANN recall as the
    * dedup-side eval. One set-join over the verified q28 candidate
    * set; the truth set is a pure id function. */
  def lshPlantedPr(s: SparkSession, dir: String,
                   cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val cand = lshCandidatePairs(s, dir, cfg)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    // planted truth: (base, base+offset) for every 20th multi-token doc
    // (single-token docs get an identical variant — still a valid pair)
    val truth = docs(s, dir).filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + VariantIdOffset).as("doc_b"))
    val hit = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    val nc = cand.agg(count(lit(1)).as("n_cand"))
    val nt = truth.agg(count(lit(1)).as("n_truth"))
    // degenerate-config guards (round-9 ADVICE): n_cand = 0 divides by
    // zero and n_hit = 0 makes f1 = 0/0 — NaN on Spark but a different
    // NULL/NaN choice in other engines, so BOTH sides emit NULL for the
    // undefined cells (matching CASE in the oracle) instead of relying
    // on IEEE division agreeing cross-engine
    val p = when(col("n_cand") > 0,
      col("n_hit").cast(DoubleType) / col("n_cand"))
    val r = col("n_hit").cast(DoubleType) / col("n_truth")
    nc.crossJoin(nt).crossJoin(hit)
      .select(col("n_cand").cast(IntegerType).as("n_cand"),
        col("n_truth").cast(IntegerType).as("n_truth"),
        col("n_hit").cast(IntegerType).as("n_hit"),
        round(p, 6).as("precision_planted"),
        round(r, 6).as("recall"),
        round(when(col("n_cand") > 0 && (p + r) > 0,
          lit(2.0) * p * r / (p + r)), 6).as("f1_planted"))
  }

  /** q226: DUP-CLUSTER SIZE DISTRIBUTION — the histogram of q63's
    * connected-component sizes (size → how many clusters): the dedup
    * health report operations actually read. A long tail of size-2
    * clusters is normal near-dup noise; a single giant component is
    * the boilerplate-hub pathology that melts BSP label propagation
    * and means the SHINGLING (not the corpus) needs fixing. One extra
    * double-agg over the verified q63 labels. */
  def dupClusterSizes(s: SparkSession, dir: String,
                      cfg: DedupConfig = DedupConfig.Default): DataFrame =
    dedupComponents(s, dir, cfg)
      .groupBy("comp").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
      .select(col("sz").cast(IntegerType).as("cluster_size"),
        col("n_clusters").cast(IntegerType).as("n_clusters"))
      .orderBy("cluster_size")

  /** q254: DUP-GRAPH TRIANGLE CENSUS — transitivity of the near-dup
    * relation: if A~B and B~C usually imply A~C, candidate clusters are
    * tight (transitive closure over-merges little and the canonical-keep
    * step is safe); low transitivity means band collisions are chaining
    * unrelated docs and the verify threshold needs raising. Reports
    * nodes, edges, wedges (open 2-paths), triangles, and the global
    * clustering coefficient 3·T/W in one row.
    *
    * Triangle counting is the ordered two-hop join: edges are stored
    * a<b, so each triangle {x<y<z} is found exactly once as the path
    * x–y–z semi-joined against the closing edge (x,z) — the standard
    * compact-forward shape whose join keys are node ids, scale-safe on
    * a skew-guarded candidate graph (q227's hub audit is the guard).
    * Integer arithmetic end to end except the final coefficient. */
  def dupGraphTriangles(s: SparkSession, dir: String,
                        cfg: DedupConfig = DedupConfig.Default): DataFrame =
    triangleCensusOf(lshCandidatePairs(s, dir, cfg)
      .select("doc_a", "doc_b").localCheckpoint())

  /** The census over an arbitrary a<b edge frame — exposed so the spec
    * can hand-check a known graph through the production joins. */
  private[graft] def triangleCensusOf(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("doc_a").as("id"))
      .unionAll(edges.select(col("doc_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val degStats = deg.agg(
      count(lit(1)).cast(IntegerType).as("n_nodes"),
      (sum(col("d") * (col("d") - 1)) / 2).cast(LongType).as("n_wedges"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    val paths = edges.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .join(edges.select(col("doc_a").as("b"), col("doc_b").as("c")), "b")
    val tri = paths
      .join(edges.select(col("doc_a").as("a"), col("doc_b").as("c")),
        Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    degStats.crossJoin(nEdges).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          lit(3.0) * col("n_triangles") / col("n_wedges"))
          .as("transitivity"))
  }

  /** q227: DUP-GRAPH DEGREE AUDIT — per-node degree distribution of
    * the LSH candidate graph plus the top hubs: a node whose degree
    * rivals the corpus is a boilerplate magnet (its shingles collide
    * with everything) — the thing to EXCLUDE from banding before it
    * quadratically floods the verify stage. Reports the degree
    * histogram and the 5 heaviest nodes. One agg over the verified
    * q28 pair set. */
  def dupGraphDegrees(s: SparkSession, dir: String,
                      cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val pairs = lshCandidatePairs(s, dir, cfg)
    val deg = pairs.select(col("doc_a").as("id"))
      .unionAll(pairs.select(col("doc_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val hist = deg.groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .select(lit("hist").as("kind"), col("degree").cast(LongType).as("k"),
        col("n_nodes").as("v"))
    // top-5 hubs via orderBy+limit → TakeOrderedAndProject: per-partition
    // top-5 then a 5-row merge. The previous row_number() over a global
    // (unpartitioned) window funneled the whole O(nodes) degree frame
    // through ONE task before the filter — same rows, none of the
    // parallelism. Tie-break on id keeps the selection total-ordered.
    val hubs = deg.orderBy(col("degree").desc, col("id")).limit(5)
      .select(lit("hub").as("kind"), col("id").as("k"),
        col("degree").as("v"))
    hist.unionByName(hubs).orderBy("kind", "k")
  }

  /** q222: CRAWL-SLICE NOVELTY — the marginal-value curve of successive
    * crawl snapshots: documents split into four doc_id-order slices
    * (the ingestion-order proxy) and each slice reports how many of its
    * shingle OCCURRENCES are grams never seen in ANY earlier slice —
    * the "what did this crawl actually add" number that decides whether
    * a feed has gone stale (pct_new decays toward the boilerplate
    * floor as a source exhausts its novelty). q188 gives the per-doc
    * view; this is the per-snapshot rollup operations actually plot.
    *
    * Shape at 100 TB: slice labels come from [[ntileByKey]] — the
    * two-pass range-partition + offset ranking over the NARROW doc_id
    * projection (never a global window, never the text payload; the
    * previous `ntile().over(Window.orderBy)` compiled to a
    * SinglePartition WindowExec that pushed the whole corpus, text
    * included, through one task). Then one shingle explode;
    * first-occurrence slice = one hash-agg min over the gram key; the
    * slice report is a second tiny agg. Nothing re-shingles. */
  def crawlSliceNovelty(s: SparkSession, dir: String,
                        slices: Int = 4): DataFrame = {
    val d = docs(s, dir)
    // slice by doc_id rank — identical split semantics to DuckDB's
    // NTILE over a unique key, correct under arbitrary id gaps
    val sliceOf = ntileByKey(s, d.select("doc_id"), "doc_id", slices)
    val grams = shingleRows(d.select("doc_id", "text"))
      .join(sliceOf, Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    grams.count() // eager fill: first-slice agg + occurrence rollup
    try {
      val firstSlice = grams.groupBy("shingle")
        .agg(min("slice").as("fs"))
      val out = grams.join(firstSlice, Seq("shingle"))
        .groupBy("slice").agg(
          countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_grams"),
          sum(when(col("fs") === col("slice"), 1L).otherwise(0L))
            .as("n_new"))
        .select(col("slice"), col("n_docs").cast(IntegerType).as("n_docs"),
          col("n_grams"), col("n_new"),
          round(col("n_new").cast(DoubleType) /
            col("n_grams").cast(DoubleType), 6).as("pct_new"))
        .orderBy("slice")
        .localCheckpoint()
      out
    } finally { grams.unpersist(); () }
  }

  /** Distributed NTILE over a UNIQUE key — (key, slice) labels with
    * Spark/DuckDB ntile semantics (first n%k tiles get n/k+1 rows), at
    * full parallelism. `ntile(k).over(Window.orderBy(key))` with no
    * partitionBy compiles to a SinglePartition WindowExec — every row
    * through ONE task. This is the same two-pass ranking the repo built
    * for q66 ([[graft.analytics.Advanced]] ntileRanksOf): range-partition
    * on the key, one O(#partitions) count collect → broadcast cumulative
    * offsets, then a local sort (no exchange) + running-index stamp.
    * With a unique key, rank == row_number, so the tile is pure
    * arithmetic on (rank, n). Callers join the narrow label frame back
    * by key — payload columns never cross the ranking path. */
  private[graft] def ntileByKey(s: SparkSession, ids: DataFrame,
                                key: String, k: Int): DataFrame = {
    require(k > 0, s"ntileByKey needs k > 0, got $k")
    // the range-partition/offset-stamp core lives ONCE, in
    // graft.analytics.RangeIndex (shared with globalRank and the q344
    // grouped prefix); this wrapper only adds the tile arithmetic
    val (stamped, n) =
      graft.analytics.RangeIndex.indexed(s, ids.select(key), Seq(key))
    // ntile(k): first n%k tiles get n/k+1 rows, the rest n/k
    val q = n / k; val r = n % k
    val qq = math.max(q, 1L) // else-branch divisor; unreachable when q == 0
    stamped
      .withColumn("slice",
        when(lit(n) <= k, col("rn").cast(IntegerType)) // degenerate n<=k
          .when(col("rn") <= lit(r * (q + 1)),
            (((col("rn") - 1) - pmod(col("rn") - 1, lit(q + 1))) / (q + 1)
              + 1).cast(IntegerType))
          .otherwise({
            val past = col("rn") - lit(r * (q + 1)) - 1
            (lit(r) + (past - pmod(past, lit(qq))) / qq + 1)
              .cast(IntegerType)
          }))
      .select(col(key), col("slice"))
  }

  /** q188: N-GRAM NOVELTY PROFILE — per-document fraction of its distinct
    * shingles whose FIRST corpus occurrence (min doc_id) is this document.
    * The streaming-order novelty curve corpus builders use to spot
    * template-generated tails (novelty → 0 as a feed starts repeating
    * itself) and to rank sources by marginal information added; the exact
    * complement of q133's WITHIN-doc repetition: this one measures
    * repetition ACROSS the corpus seen so far.
    *
    * Shape at 100 TB: the shingle stream shuffles twice — a hash-agg on
    * the shingle (min doc_id; map-side partial, 8-byte values) and a
    * hash-agg on doc_id for the per-doc sizes. The novel counts come from
    * the ALREADY-AGGREGATED first-occurrence frame (one row per distinct
    * shingle), so the fact-scale stream is never joined back to itself —
    * the final assembly is a doc-level join AQE broadcasts. */
  def gramNovelty(s: SparkSession, dir: String,
                  cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    // one explode + md5-free shingle pass feeds both aggregations
    val shs = shingleRows(docs(s, dir), cfg).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shs.count() // eager fill: two downstream branches (PERF.md item 8)
    try {
      val novel = shs.groupBy("shingle").agg(min(col("doc_id")).as("fd"))
        .groupBy("fd").agg(count(lit(1)).as("n_novel"))
      val out = shs.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
        .join(novel, col("doc_id") === col("fd"), "left")
        .withColumn("nn", coalesce(col("n_novel"), lit(0L)))
        .select(col("doc_id"),
          col("n_shingles").cast(IntegerType).as("n_shingles"),
          col("nn").cast(IntegerType).as("n_novel"),
          round(col("nn").cast(DoubleType) /
            col("n_shingles").cast(DoubleType), 6).as("novelty"))
        .orderBy("doc_id")
        .localCheckpoint()
      out
    } finally { shs.unpersist(); () }
  }

  /** q187: CHUNK-LEVEL DUP RATIO — paragraph-granularity deduplication
    * (the Dolma/CCNet "duplicate paragraph fraction" gate): documents are
    * split into the q182 context windows, a chunk digest is flagged when
    * it occurs in ≥ 2 DISTINCT documents, and each document reports what
    * fraction of its chunks are cross-doc duplicated plus the keep
    * verdict (ratio < `threshold`). Catches templated/boilerplate-heavy
    * docs whose FULL text is unique (so q26 passes them) but whose
    * paragraphs are copied around the corpus.
    *
    * Shape at 100 TB: the chunk stream is a narrow flatMap (q182); the
    * dup set is one hash-agg on the digest — 128-bit keys, map-side
    * partial, never text bytes; membership is a semi join on the digest;
    * the per-doc rollup is one more hash agg. The keep comparison runs
    * on the raw IEEE division (identical on both engines) — the 6dp
    * round is presentation only. */
  def chunkDupRatio(s: SparkSession, dir: String,
                    threshold: Double = 0.5): DataFrame = {
    // chunk frame read twice (dup-set build + per-doc rollup) —
    // materialize so the explode + md5 pass runs once
    val chunks = graft.text.TextOps.chunkDocs(s, dir)
      .select("doc_id", "chunk_md5").localCheckpoint()
    val dup = chunks.groupBy("chunk_md5")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).select("chunk_md5")
    val flagged = chunks.join(dup, Seq("chunk_md5"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      .join(flagged, Seq("doc_id"), "left")
      .withColumn("nd", coalesce(col("n_dup"), lit(0L)))
      .select(col("doc_id"), col("n_chunks").cast(IntegerType).as("n_chunks"),
        col("nd").cast(IntegerType).as("n_dup"),
        round(col("nd").cast(DoubleType) /
          col("n_chunks").cast(DoubleType), 6).as("dup_ratio"),
        (col("nd").cast(DoubleType) / col("n_chunks").cast(DoubleType) <
          threshold).cast(IntegerType).as("keep"))
      .orderBy("doc_id")
  }

  /** q153: INCREMENTAL exact dedup — the production daily-increment shape
    * none of the full-corpus passes (q26/q63/q72) cover: an incoming
    * batch is deduplicated AGAINST the existing corpus and within
    * itself, without rescanning-and-regrouping the whole corpus as one
    * set. The existing side reduces to its distinct content-hash set
    * once (at 100 TB this set is the persisted dedup index a pipeline
    * maintains between increments); the incoming batch then splits by
    * one semi/anti join pair — already-seen vs fresh — and only the
    * fresh residue pays a within-batch group. Cost scales with the
    * INCREMENT (plus one index probe), not the corpus.
    *
    * The staged increment exercises all three cohorts
    * deterministically: exact copies of every 10th doc (dup-vs-
    * existing), twin modified copies of every 21st (within-batch dup
    * pairs, absent from the corpus), and single modified copies of
    * every 13th (genuinely new). One summary row, all-integer. */
  /** The staged DAILY-INCREMENT fixture shared by q153 and q162: exact
    * copies of every 10th doc (dup-vs-existing), twin modified copies of
    * every 21st (within-batch dup pairs, absent from the corpus), and
    * single modified copies of every 13th (near-dups of their base),
    * each re-keyed into its own variant-id plane. Carries `source` for
    * per-source admission accounting (q153 projects it away). */
  private[graft] def stagedIncrement(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "source", "text")
    val off = VariantIdOffset
    d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + off).as("doc_id"), col("source"), col("text"))
      .unionByName(d.filter(col("doc_id") % 21 === 0)
        .select((col("doc_id") + 2 * off).as("doc_id"), col("source"),
          concat(col("text"), lit(" zqbatchdup")).as("text")))
      .unionByName(d.filter(col("doc_id") % 21 === 0)
        .select((col("doc_id") + 3 * off).as("doc_id"), col("source"),
          concat(col("text"), lit(" zqbatchdup")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 4 * off).as("doc_id"), col("source"),
          concat(col("text"), lit(" zqunique")).as("text")))
  }

  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val incoming = stagedIncrement(s, dir).select("doc_id", "text")
    // the persisted dedup index: distinct content hashes of the corpus
    val index = d.select(normHash(col("text")).as("h")).distinct()
      .localCheckpoint()
    val inc = incoming.select(col("doc_id"), normHash(col("text")).as("h"))
      .localCheckpoint()
    val fresh = inc.join(index, Seq("h"), "left_anti")
    val freshGroups = fresh.groupBy("h").agg(count(lit(1)).as("c"))
    val totals = inc.agg(count(lit(1)).cast(IntegerType).as("n_incoming"))
    val seen = inc.join(index, Seq("h"), "left_semi")
      .agg(count(lit(1)).cast(IntegerType).as("n_dup_vs_existing"))
    val freshStats = freshGroups.agg(
      count(lit(1)).cast(IntegerType).as("n_new_contents"),
      // coalesce matches the oracle's COALESCE(SUM(..), 0): an increment
      // with zero fresh contents must report 0, not NULL
      coalesce(sum(col("c") - 1), lit(0L)).cast(IntegerType)
        .as("n_within_batch_extra"))
    totals.crossJoin(seen).crossJoin(freshStats)
  }

  /** q195: BLOOM-PREFILTERED incremental dedup — the q153 probe with the
    * index compressed to a Bloom filter first. The full content-hash
    * index is corpus-sized (it cannot broadcast at 100 TB), so the q153
    * semi-join shuffles the WHOLE increment against it; a Bloom filter
    * of the index (here m = 65536 bits, k = 4 seeded-md5 positions,
    * relationally: the distinct set-bit positions, broadcast) rejects
    * most non-duplicates with zero shuffle, and only Bloom CANDIDATES
    * pay the exact index probe. Reports the candidate/true-dup/false-
    * positive accounting that sizes m and k for a target FP rate —
    * Bloom's no-false-negative guarantee (every true dup IS a
    * candidate) is asserted in the spec and implied by n_true_dup
    * counting only candidates yet matching q153's n_dup_vs_existing.
    *
    * Everything is deterministic — positions are seeded md5s, the
    * filter is a set, not sampled — so the DuckDB twin reproduces the
    * exact counts. */
  def bloomPrefilterDedup(s: SparkSession, dir: String,
                          mBits: Int = 65536, kHashes: Int = 4): DataFrame = {
    def positions(h: Column) = array((0 until kHashes).map(j =>
      pmod(hex60C(seededMd5C(j, h)), lit(mBits.toLong))): _*)
    val index = docs(s, dir).select(normHash(col("text")).as("h")).distinct()
      .localCheckpoint()
    val inc = stagedIncrement(s, dir)
      .select(col("doc_id"), normHash(col("text")).as("h"))
      .localCheckpoint()
    // the filter: distinct set-bit positions of the index (≤ mBits rows)
    val bits = index.select(explode(positions(col("h"))).as("pos"))
      .distinct().withColumn("m", lit(1))
    val probe = inc.select(col("doc_id"), explode(positions(col("h")))
      .as("pos")).distinct()
    val cd = probe.join(broadcast(bits), Seq("pos"), "left")
      .groupBy("doc_id").agg(count(lit(1)).as("np"),
        sum(coalesce(col("m"), lit(0))).as("nh"))
    val cand = cd.filter(col("np") === col("nh")).select("doc_id")
      .localCheckpoint() // two consumers: candidate count + exact probe
    // ONLY candidates reach the exact (corpus-scale) index probe
    val trueDup = inc.join(cand, Seq("doc_id"), "left_semi")
      .join(index, Seq("h"), "left_semi")
    val totals = inc.agg(count(lit(1)).cast(IntegerType).as("n_incoming"))
    val nCand = cand.agg(count(lit(1)).cast(IntegerType).as("n_candidates"))
    val nDup = trueDup.agg(count(lit(1)).cast(IntegerType).as("n_true_dup"))
    totals.crossJoin(nCand).crossJoin(nDup)
      .withColumn("n_false_pos", (col("n_candidates") - col("n_true_dup"))
        .cast(IntegerType))
      .withColumn("fp_rate", round(
        (col("n_candidates") - col("n_true_dup")).cast(DoubleType) /
          (col("n_incoming") - col("n_true_dup")).cast(DoubleType), 6))
  }

  /** Distinct shingles as ROWS (doc_id, shingle) — the scale-correct shape:
    * seeded hashes become codegen'd projections over exploded rows and the
    * signature is a hash aggregation, instead of interpreted higher-order
    * lambdas over per-doc arrays. The input fans out first: shingling +
    * seeded hashing is the compute-dense stage of the whole dedup pipeline,
    * and must never run at single-file parallelism (Tables.fanOut). */
  private[graft] def shingleRows(df: DataFrame,
                                 cfg: DedupConfig = DedupConfig.Default): DataFrame =
    Tables.fanOut(df, "doc_id").select(col("doc_id"),
      explode(array_distinct(shinglesC(tokensC(col("text")), cfg.shingleN)))
        .as("shingle"))

  /** Signatures from shingle ROWS: one partial + final HASH aggregation.
    * ONE md5 per shingle (the expensive part), then NumHashes cheap integer
    * permutations (TextPrims.permC) — k-permutation MinHash, so the hot
    * map stage's CPU is O(shingles), not O(shingles × k). Values are
    * numeric 60-bit longs: a string min would force SortAggregate (strings
    * aren't supported by the fixed-width hash-agg buffer) and shuffle
    * 32-char hex per signature. */
  private[graft] def signaturesFrom(shingles: DataFrame,
                                    cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val withH = shingles.withColumn("h", hex60C(md5(col("shingle"))))
    val sigs = (0 until cfg.numHashes).map(i => min(permC(col("h"), i)).as(s"sig$i"))
    withH.groupBy("doc_id").agg(sigs.head, sigs.tail: _*)
  }

  private def withSignature(df: DataFrame,
                            cfg: DedupConfig = DedupConfig.Default): DataFrame =
    signaturesFrom(shingleRows(df, cfg), cfg)

  /** MinHash signatures (k=numHashes) over shingleN-gram shingles — per-doc
    * narrow map. */
  def minhashSignatures(s: SparkSession, dir: String,
                        cfg: DedupConfig = DedupConfig.Default): DataFrame =
    withSignature(docs(s, dir), cfg).orderBy("doc_id")

  private def bandKeys(cfg: DedupConfig): Column = {
    val bands = (0 until cfg.numBands).map { b =>
      md5(concat_ws("|",
        lit(b.toString) +: (0 until cfg.bandSize).map(i =>
          col(s"sig${b * cfg.bandSize + i}").cast(StringType)): _*))
    }
    array(bands: _*)
  }

  /** Band-bucket pair expansion: group (bandKey → sorted doc ids), emit all
    * intra-bucket ordered pairs. One shuffle on the band hash, the input
    * computed ONCE (a self-join would re-run the whole signature chain for
    * each side). Bucket sizes are small by construction (band collisions ≈
    * near-dups), so the quadratic intra-bucket expansion is bounded — the
    * standard LSH shape at scale. */
  private[graft] def bandPairsFrom(sigs: DataFrame,
                                   cfg: DedupConfig = DedupConfig.Default): DataFrame =
    sigs.select(col("doc_id"), explode(bandKeys(cfg)).as("bk"))
      .groupBy("bk").agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()

  /** LSH candidate pairs: docs sharing ≥1 MinHash band bucket. */
  def lshCandidatePairs(s: SparkSession, dir: String,
                        cfg: DedupConfig = DedupConfig.Default): DataFrame =
    bandPairsFrom(withSignature(nearDupCorpus(s, dir), cfg), cfg)
      .orderBy("doc_a", "doc_b")

  /** q325: K-CORE of the dup candidate graph — the evidence-corroboration
    * cut the component/triangle views (q63/q254) don't give: iteratively
    * peel every node of degree < k until the fixpoint; what survives the
    * 2-core is exactly the subgraph where every dup edge is corroborated
    * by a CYCLE of further evidence, while pendant edges — a single band
    * collision linking a doc to a cluster — are stripped. The curation
    * read: 2-core members are "multiply witnessed" duplicates safe for
    * aggressive auto-dedup; peeled nodes keep their q29-style pairwise
    * verify before any deletion.
    *
    * Peeling is the standard BSP shape: per round one degree hash-agg +
    * two semi-joins against the survivors, on an edge frame that only
    * SHRINKS (so `count` equality is an exact set-fixpoint test), each
    * round localCheckpoint'ed (q63's lineage discipline). Dup graphs
    * are near-clique clusters — the peel converges in 2-3 rounds; the
    * `maxRounds` bound exists because the ORACLE unrolls exactly that
    * many rounds (idempotent after the fixpoint), and the operator
    * fails loudly rather than drift if an adversarial path graph needs
    * more. Reports each core member with its within-core degree. */
  def kcore(s: SparkSession, dir: String, k: Int = KcoreK,
            cfg: DedupConfig = DedupConfig.Default,
            maxRounds: Int = KcoreRounds): DataFrame =
    kcoreOf(bandPairsFrom(withSignature(nearDupCorpus(s, dir), cfg), cfg)
      .select("doc_a", "doc_b"), k, maxRounds)

  /** The peel over an arbitrary a<b edge frame — exposed so the spec can
    * hand-check known graphs (triangle + pendant chain) through the
    * production loop. */
  private[graft] def kcoreOf(edges0: DataFrame, k: Int,
                             maxRounds: Int): DataFrame = {
    var edges = edges0.localCheckpoint()
    var converged = false
    var r = 0
    while (!converged && r < maxRounds) {
      val deg = edges.select(col("doc_a").as("id"))
        .unionAll(edges.select(col("doc_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val alive = deg.filter(col("d") >= k).select("id")
        .localCheckpoint() // both semi-join sides read it
      val kept = edges
        .join(alive.select(col("id").as("doc_a")), Seq("doc_a"), "left_semi")
        .join(alive.select(col("id").as("doc_b")), Seq("doc_b"), "left_semi")
        .localCheckpoint()
      converged = kept.count() == edges.count()
      edges = kept
      r += 1
    }
    require(converged,
      s"k-core peel did not reach a fixpoint in $maxRounds rounds")
    edges.select(col("doc_a").as("id"))
      .unionAll(edges.select(col("doc_b").as("id")))
      .groupBy("id").agg(count(lit(1)).cast(IntegerType).as("core_deg"))
      .select(col("id").as("doc_id"), col("core_deg"))
      .orderBy("doc_id")
  }
  /** Oracle-pinned peel-round bound shared by [[kcore]] and its SQL twin. */
  val KcoreRounds: Int = 8
  /** Oracle-pinned peel threshold shared by [[kcore]]'s default and the
    * q325 SQL twin — interpolated into the unrolled oracle rounds so the
    * two sides cannot silently drift if the default ever changes. */
  val KcoreK: Int = 2
  /** Oracle-pinned walk bound shared by [[recursiveComponents]] and its
    * SQL twin — ≥ any dedup-cluster diameter (near-clique clusters;
    * measured ≤ 3 at sf0.1) while keeping the UNION ALL walk count
    * inside Spark's recursion row limit. Spec-checked vs BSP, and the
    * dual-scale sweep cross-checks the q63 frame directly. */
  val RecursionDepth: Int = 4

  /** Oracle-pinned PageRank constants shared by [[pagerank]] and its
    * unrolled SQL twin. */
  val PagerankIters: Int = 8
  val PagerankDamping: Double = 0.85
  /** The teleport mass is a NAMED constant, not `1.0 − damping`: Scala's
    * `1.0 - 0.85` is 0.15000000000000002 while both engines' literal
    * `0.15` is the (different) nearest double to 0.15 — interpolating
    * the same decimal string on both sides is what makes the per-step
    * double arithmetic bit-identical. */
  val PagerankTeleport: Double = 0.15

  /** q341: PAGERANK ON THE DUP GRAPH — the hub-importance score of the
    * LSH candidate graph: where q227 flags boilerplate magnets by raw
    * degree, PageRank weights a node by the importance of its
    * neighbours, the standard centrality a curation pipeline uses to
    * pick which member of a duplicate cluster to KEEP (the most-linked
    * canonical page) and which templates to strip first. Undirected
    * band-pair edges (every endpoint has degree ≥ 1, so there are no
    * dangling nodes and the walk is well-defined without a
    * teleport-remainder term).
    *
    * Determinism contract (the energy-distance trick, per step): the
    * per-edge contribution pr(u)/deg(u) is a double division (IEEE —
    * identical in both engines), rounded to 12 dp and SUMMED THROUGH
    * DECIMAL(28,12), so the aggregate is exact and partition-order
    * independent; the new score (1−d)/N + d·Σ is rounded to 12 dp
    * again. The oracle unrolls the same [[PagerankIters]] steps with
    * MATERIALIZED CTEs (q325's pattern). Output rounds to 9 dp.
    *
    * Shape at 100 TB: per iteration one hash join of the edge list with
    * the O(nodes) score frame plus one hash-agg on dst — the classic
    * relational PageRank; the score frame is localCheckpoint'ed every
    * step so lineage stays flat across iterations (kcore's discipline).
    * Never a driver-side graph. */
  def pagerank(s: SparkSession, dir: String,
               cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val iters = PagerankIters; val damping = PagerankDamping
    val pairs = bandPairsFrom(withSignature(nearDupCorpus(s, dir), cfg), cfg)
      .select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"),
        col("doc_a").as("dst")))
      .localCheckpoint() // read once per iteration + for the degree agg
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = deg.count()
    var pr = deg.select(col("src").as("id"), col("deg"),
      round(lit(1.0) / lit(n.toDouble), 12).as("pr"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      val contrib = edges
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          round(col("pr") / col("deg").cast(DoubleType), 12)
            .cast(DecimalType(28, 12)).as("c"))
      pr = contrib.groupBy("dst").agg(
        round(lit(PagerankTeleport) / lit(n.toDouble) +
          lit(damping) * sum(col("c")).cast(DoubleType), 12).as("pr"))
        .join(deg, col("dst") === col("src"))
        .select(col("dst").as("id"), col("deg"), col("pr"))
      // checkpoint every 4th step, not every step: a 4-deep join+agg
      // lineage analyzes fine, and each eager checkpoint is a fixed
      // job whose cost dominates at small graph sizes (6.0 → ~3 s at
      // sf0.1); the cut keeps re-analysis bounded at any iteration
      // count without paying 8 materializations
      if (i % 4 == 0 || i == iters) pr = pr.localCheckpoint()
    }
    pr.select(col("id").as("doc_id"), round(col("pr"), 9).as("pr"))
      .orderBy("doc_id")
  }

  /** q327: JARO-WINKLER VERIFIED LINKAGE — record-linkage scoring of the
    * LSH candidate pairs with the census-bureau string comparator
    * ([[graft.functions.JaroWinklerSim]], a native codegen'd Catalyst
    * expression — Spark ships levenshtein but no Jaro-Winkler, and a
    * UDF would box every candidate row). Each banded candidate pair is
    * scored on the first `prefixLen` chars of its normalized text; the
    * `link` flag applies the classic 0.9 linkage threshold to the
    * ROUNDED score (both engines flag the same value they report). The
    * entity-resolution read: LSH proposes, an edit-family similarity
    * disposes — JW weights agreement at the string HEAD, which is where
    * titles/names/boilerplate keys disagree last, making it the
    * complement to q29's order-blind token-set Jaccard.
    *
    * Shape at 100 TB: scoring rides the candidate frame (bounded by
    * banding, never all-pairs); the normalized keys join in at doc
    * granularity; the kernel call stays inside WholeStageCodegen (a
    * static-call BinaryExpression, same shape as Spark's levenshtein).
    * Oracle: DuckDB's native jaro_winkler_similarity over the same
    * pairs — two independent implementations of the published
    * definition agreeing to 6 dp on every candidate. */
  def jwLinkage(s: SparkSession, dir: String, prefixLen: Int = 80,
                threshold: Double = 0.9,
                cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    val keys = corpus.select(col("doc_id"),
      substring(lower(trim(col("text"))), 1, prefixLen).as("k"))
      .localCheckpoint() // both pair sides read it
    val pairs = bandPairsFrom(withSignature(corpus, cfg), cfg)
    pairs
      .join(keys.select(col("doc_id").as("doc_a"), col("k").as("ka")),
        Seq("doc_a"))
      .join(keys.select(col("doc_id").as("doc_b"), col("k").as("kb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(graft.functions.StringExprs.jaroWinkler(
          col("ka"), col("kb")), 6).as("jw"))
      .withColumn("link", (col("jw") >= threshold).cast(IntegerType))
      .orderBy("doc_a", "doc_b")
  }

  /** q350: EDIT-DISTANCE VERIFIED LINKAGE — the third member of the
    * fuzzy-match family (q28 Jaccard on shingles, q327 Jaro-Winkler on
    * prefixes): Levenshtein distance on BOUNDED 64-char prefixes of the
    * LSH candidate pairs, the comparator record-linkage uses when
    * transpositions and single-char typos are the expected noise. The
    * prefix bound is the scale contract — edit distance is O(len²) per
    * pair, so production linkage always compares normalized bounded
    * keys, never whole documents; candidates come from banding, never
    * all-pairs. Spark's built-in `levenshtein` (codegen'd) vs DuckDB's
    * `levenshtein` — integer-exact, no float anywhere. */
  def editDistanceLinkage(s: SparkSession, dir: String,
                          prefixLen: Int = 64, maxDist: Int = 24,
                          cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    val keys = corpus.select(col("doc_id"),
      substring(lower(trim(col("text"))), 1, prefixLen).as("k"))
      .localCheckpoint() // both pair sides read it
    val pairs = bandPairsFrom(withSignature(corpus, cfg), cfg)
    pairs
      .join(keys.select(col("doc_id").as("doc_a"), col("k").as("ka")),
        Seq("doc_a"))
      .join(keys.select(col("doc_id").as("doc_b"), col("k").as("kb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ka"), col("kb")).as("dist"))
      .withColumn("link", (col("dist") <= maxDist).cast(IntegerType))
      .orderBy("doc_a", "doc_b")
  }

  /** q154: INCREMENTAL near-dup — q153's exact-index probe generalized to
    * the fuzzy case: the existing corpus's banded MinHash signatures are
    * the persisted LSH INDEX, an incoming batch (here the fixture's
    * near-dup variants, ids ≥ [[VariantIdOffset]]) probes it by band-key
    * equi-join, and only cross-side candidates pay Jaccard verification.
    * Per incoming doc this reports its BEST existing match (highest
    * verified Jaccard, doc-id tie-break) and the match count — the
    * attach-or-admit decision a daily crawl ingest makes per document.
    * Cost: increment signatures + index probe + |candidates| verifies —
    * never corpus × corpus, and the corpus side's signatures amortize
    * across increments. */
  def incrementalNearDup(s: SparkSession, dir: String,
                         cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val off = VariantIdOffset
    val cross = ngramJaccard(s, dir, cfg)
      .filter(col("doc_a") < off && col("doc_b") >= off)
      .select(col("doc_b").as("inc_doc"), col("doc_a").as("match_doc"),
        col("jaccard"))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy("inc_doc")
      .orderBy(col("jaccard").desc, col("match_doc"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("inc_doc")
    cross
      .withColumn("rk", row_number().over(wBest))
      .withColumn("n_matches", count(lit(1)).over(wAll).cast(IntegerType))
      .filter(col("rk") === 1)
      .select("inc_doc", "match_doc", "jaccard", "n_matches")
      .orderBy("inc_doc")
  }

  /** q162 admission thresholds — named so the oracle interpolates the
    * same values the operator defaults to. */
  val AdmissionQualityMin: Double = 0.4
  val AdmissionBudgetTokens: Long = 120L

  /** q162: INCREMENTAL ADMISSION COMPOSITE — the daily-ingest pipeline as
    * ONE composed plan: an incoming batch runs the q153 exact-dedup gate
    * (corpus content-index probe + in-batch rank), the q154 near-dup
    * probe (MinHash bands against the corpus, Jaccard-verified), the q23
    * quality filter, and the q136 per-source token-budget admission, and
    * every incoming document is classified by the FIRST gate that stops
    * it: dup_corpus → dup_batch → near_dup → low_quality → over_budget →
    * admitted. Output is the per-source admission report a daily ingest
    * publishes.
    *
    * Collapse-once contract (the q138 pattern, guarded in PlanSpec): the
    * batch+corpus text is shingled EXACTLY ONCE — one persisted
    * (doc, shingle) frame feeds the MinHash signatures, the set sizes,
    * and the Jaccard verification; nothing downstream re-tokenizes for
    * dedup purposes. Only the fresh residue of the exact gate is
    * shingled (cost scales with the increment, not the batch), and the
    * budget window runs over ONE source-keyed shuffle with the
    * conditional-cumulative-sum trick (ineligible rows contribute 0), so
    * admission needs no second pass.
    *
    * The fixture adds a fifth slice to the staged increment: token-
    * REVERSED copies of every 11th doc — the same token multiset (so the
    * quality-score distribution matches real docs) with all shingles
    * destroyed (so the LSH probe correctly passes them through to the
    * quality/budget stages). */
  def incrementalAdmission(s: SparkSession, dir: String,
                           cfg: DedupConfig = DedupConfig.Default,
                           qualityMin: Double = AdmissionQualityMin,
                           budgetTokens: Long = AdmissionBudgetTokens): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val off = VariantIdOffset
    val d = docs(s, dir).select("doc_id", "source", "text")
    val incoming = stagedIncrement(s, dir).unionByName(
      d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 5 * off).as("doc_id"), col("source"),
          concat_ws(" ", reverse(tokensC(col("text")))).as("text")))
    // STAGE 1 — exact gate (q153's machinery): persisted content index +
    // one h-keyed window for in-batch ranking
    val index = d.select(normHash(col("text")).as("h")).distinct()
      .localCheckpoint()
    val exg = incoming
      .withColumn("h", normHash(col("text")))
      .join(index.withColumn("seen", lit(1)), Seq("h"), "left")
      .withColumn("rk", row_number().over(
        Window.partitionBy("h").orderBy("doc_id")))
      .localCheckpoint() // two consumers: the shingle pass + classification
    val fresh = exg.filter(col("seen").isNull && col("rk") === 1)
    // STAGE 2 — near-dup probe (q154's machinery): ONE shingle pass over
    // corpus ∪ fresh residue; signatures, sizes and verify all read it
    val shs = shingleRows(
      d.select("doc_id", "text").unionByName(fresh.select("doc_id", "text")),
      cfg).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shs.count() // eager fill: three concurrent consumers must not race
    val pairs = bandPairsFrom(signaturesFrom(shs, cfg), cfg)
      .filter(col("doc_a") < off && col("doc_b") >= off) // cross-side only
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    val sizes = shs.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(shs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shs.as("sb"), col("doc_b") === col("sb.doc_id") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
    val matched = pairs
      .join(inter, Seq("doc_a", "doc_b"), "left").na.fill(0L, Seq("ni"))
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "sz" -> "sza")),
        "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "sz" -> "szb")),
        "doc_b")
      .filter(round(col("ni").cast(DoubleType) /
        (col("sza") + col("szb") - col("ni")), 6) >= cfg.jaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    // STAGES 3+4 — q23 quality score inline, then the q136 greedy budget
    // prefix per source over eligible rows only
    val wB = Window.partitionBy("source").orderBy(col("qs").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val classified = exg
      .join(matched.withColumn("nd", lit(1)), Seq("doc_id"), "left")
      .withColumn("qs", graft.text.TextOps.qualityScoreC)
      .withColumn("toks", bpeTokensC(col("text")).cast(LongType))
      .withColumn("status0",
        when(col("seen") === 1, "dup_corpus")
          .when(col("rk") > 1, "dup_batch")
          .when(col("nd") === 1, "near_dup")
          .when(col("qs") < qualityMin, "low_quality"))
      .withColumn("cum",
        sum(when(col("status0").isNull, col("toks")).otherwise(0L)).over(wB))
      .withColumn("status", coalesce(col("status0"),
        when(col("cum") <= budgetTokens, "admitted").otherwise("over_budget")))
    def n(st: String, as: String) =
      sum(when(col("status") === st, 1).otherwise(0)).cast(IntegerType).as(as)
    classified.groupBy("source").agg(
      count(lit(1)).cast(IntegerType).as("n_incoming"),
      n("dup_corpus", "n_dup_corpus"), n("dup_batch", "n_dup_batch"),
      n("near_dup", "n_near_dup"), n("low_quality", "n_low_quality"),
      n("over_budget", "n_over_budget"), n("admitted", "n_admitted"),
      sum(when(col("status") === "admitted", col("toks")).otherwise(0L))
        .as("admitted_tokens"))
      .orderBy("source")
  }

  /** Edit-distance (Levenshtein) verification of LSH candidates — the third
    * verifier in the family (Jaccard on shingle sets, Hamming on SimHash
    * bits, edit distance on raw text). The O(|a|·|b|) string DP runs ONLY
    * on candidate pairs, bounded by |candidates|, never |corpus|²; the
    * candidate side is the small side, so both text lookups broadcast it
    * against the corpus scan. */
  def editDistancePairs(s: SparkSession, dir: String,
                        cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    // one materialization feeds the signature chain AND both text lookups
    // (three consumers otherwise re-derive the corpus; at warehouse scale
    // this is a materialized table, locally a checkpoint)
    val corpus = nearDupCorpus(s, dir).localCheckpoint()
    val pairs = bandPairsFrom(withSignature(corpus, cfg), cfg)
    val ta = corpus.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = corpus.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    pairs.join(ta, "doc_a").join(tb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b")).as("edit_dist"),
        greatest(length(col("text_a")), length(col("text_b")))
          .cast(IntegerType).as("max_len"))
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard on the LSH candidates (verify step of the
    * candidate→verify dedup pipeline), computed RELATIONALLY: intersection
    * sizes via an equi-join on (doc, shingle) over exploded rows, |A∪B| =
    * |A|+|B|−|A∩B|. No per-row set arrays — the shape that survives
    * documents too large to hold shingle sets in memory. Integer counts are
    * identical to the array_intersect/array_union form, so the division is
    * bit-identical to the oracle's. */
  def ngramJaccard(s: SparkSession, dir: String,
                   cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    // shared scan: shingles cached once; signatures, candidate pairs,
    // set sizes and intersections all derive from it
    val shs = shingleRows(corpus, cfg).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shs.count() // materialize eagerly: three downstream branches read this
    val sizes = shs.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = bandPairsFrom(signaturesFrom(shs, cfg), cfg).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // two consumers; lazy fill lets concurrent stages race
    val inter = pairs
      .join(shs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shs.as("sb"),
        col("doc_b") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left").na.fill(0L, Seq("ni"))
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "sz" -> "sza")), "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "sz" -> "szb")), "doc_b")
      .withColumn("jaccard", round(
        col("ni").cast(DoubleType) / (col("sza") + col("szb") - col("ni")), 6))
      .filter(col("jaccard") >= cfg.jaccardThreshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash-32 fingerprint: per-token md5-derived bits, frequency-weighted
    * ±1 sums per bit position, sign → fingerprint bit. Near-identical docs
    * differ in few bits (Hamming). One hash-agg shuffle on doc_id. */
  def simhash(s: SparkSession, dir: String): DataFrame =
    simhashOf(docs(s, dir))

  /** SimHash over any (doc_id, text) frame. */
  def simhashOf(input: DataFrame): DataFrame = {
    val tk = Tables.fanOut(input, "doc_id")
      .select(col("doc_id"), explode(tokensC(col("text"))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val sums = (0 until 32).map { j =>
      val v = conv(substring(col("h"), 1 + j / 4, 1), 16, 10).cast(IntegerType)
      sum(shiftright(v, j % 4).bitwiseAND(lit(1)) * 2 - 1).as(s"s_$j")
    }
    val fp = (0 until 32).map(j =>
      when(col(s"s_$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    tk.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
      .orderBy("doc_id")
  }

  val HammingThreshold: Int = DedupConfig.Default.hammingThreshold
  val SimhashBlocks: Int = DedupConfig.Default.simhashBlocks // blocks of the 32-bit fingerprint

  /** SimHash near-dup PAIRS via pigeonhole blocking: split the 32-bit
    * fingerprint into `SimhashBlocks` 8-bit blocks — any pair within
    * Hamming distance `HammingThreshold` (< block count) must agree on at
    * least one whole block — bucket-join on (block_idx, block_value), and
    * verify `bit_count(xor) <= t` INSIDE the join before the distinct, so
    * false candidates never reach a shuffle. One fingerprint pass + one
    * equi-join; no all-pairs scan. At 100 TB the same shape runs with a
    * 64-bit fingerprint and 16-bit blocks (t=3), where block collisions —
    * and hence bucket sizes — drop by ~2^8 per block; the 32-bit variant
    * here keeps q30's published fingerprint semantics. */
  def simhashNearDupPairs(s: SparkSession, dir: String,
                          cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    require(32 % cfg.simhashBlocks == 0,
      s"simhashBlocks (${cfg.simhashBlocks}) must divide the 32 fingerprint bits")
    val blockBits = 32 / cfg.simhashBlocks
    val blockMask = (1L << blockBits) - 1
    val blockStructs = (0 until cfg.simhashBlocks).map(i =>
      struct(lit(i).as("bi"),
        shiftright(col("simhash"), blockBits * i).bitwiseAND(lit(blockMask)).as("bv")))
    // the fingerprint chain (shingling + 32 bit-position sums) is the
    // expensive stage: checkpoint the tiny (doc_id, simhash) result so the
    // self-join's two sides are RDD scans, not two recomputations. The
    // join itself is a streaming equi-join on (block idx, block value)
    // with the Hamming verify INSIDE the join condition — no per-bucket
    // pair array is ever materialized (a collect_list bucket expansion
    // holds m(m-1)/2 structs of its largest bucket in ONE row — OOM at
    // crawl scale), and an oversized block value is handled by AQE skew
    // split like any other skewed join key.
    val blocks = simhashOf(nearDupCorpus(s, dir)).localCheckpoint()
      .select(col("doc_id"), col("simhash"),
        explode(array(blockStructs: _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.bi").as("bi"), col("b.bv").as("bv"))
    val a = blocks.select(col("bi"), col("bv"),
      col("doc_id").as("doc_a"), col("simhash").as("sa"))
    val b = blocks.select(col("bi"), col("bv"),
      col("doc_id").as("doc_b"), col("simhash").as("sb"))
    a.join(b, Seq("bi", "bv"))
      .filter(col("doc_a") < col("doc_b") &&
        bit_count(col("sa").bitwiseXOR(col("sb"))) <= cfg.hammingThreshold)
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast(IntegerType).as("hd"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Duplicate-cluster CONNECTED COMPONENTS over the LSH candidate pairs —
    * the step that turns pairwise near-dup evidence into "keep one doc per
    * cluster". Iterative min-label propagation: every doc starts as its own
    * component; each round takes the min component id over itself and its
    * neighbors, until a fixpoint (the per-round change count is monotone,
    * and the sum of labels strictly decreases until convergence, so the
    * cheap `sum(comp)` fixpoint test is exact). Dedup graphs are
    * star/chain-shaped with tiny diameter, so rounds ≈ 2-3; each round is
    * one equi-join + one hash agg — the standard BSP connected-components
    * shape (large-star/small-star is the same loop with edge rewriting,
    * worth switching to only for adversarially deep graphs). */
  /** q336: NATIVE RECURSIVE CTE components — Spark 4's `WITH RECURSIVE`
    * (new in 4.0) running the EXACT transitive-closure query q63's
    * DuckDB oracle has always used, now on the Spark side too: the two
    * engines execute the same recursive SQL text shape, and the spec
    * additionally asserts the result is row-identical to q63's BSP
    * min-label loop — the declarative recursion and the hand-built
    * iteration certifying each other.
    *
    * Scale contract, stated: closure-with-labels materializes
    * O(Σ component²) reach rows — fine on dedup graphs (near-clique
    * clusters of bounded size; singletons contribute 1 row each), and
    * the right EXPRESSIVENESS surface for ad-hoc graph questions. The
    * at-scale workhorse remains q63's BSP loop (O(V·hops) with 4 hops
    * fused per action); this query exists because a user of a Spark-4
    * engine will reach for WITH RECURSIVE and the engine must run it
    * with oracle-verified semantics.
    *
    * Spark 4.1 recursion is UNION ALL-only, so the closure is made
    * terminating two ways, identically on both engines: labels only
    * flow to strictly LARGER node ids (a label ≥ dst can never be
    * dst's component min — dst seeds itself), and walks are bounded at
    * [[RecursionDepth]] hops — ≥ the diameter of any dedup cluster
    * (near-cliques of bounded size; the spec proves exact equality
    * with the BSP result at fixture scale, which would catch an
    * insufficient bound loudly). */
  def recursiveComponents(s: SparkSession, dir: String,
                          cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    corpus.select("doc_id").createOrReplaceTempView("q336_corpus")
    val pairs = bandPairsFrom(withSignature(corpus, cfg), cfg)
    pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"),
        col("doc_a").as("dst")))
      .createOrReplaceTempView("q336_edges")
    s.sql(
      s"""WITH RECURSIVE reach(id, r, lvl) AS (
        |  SELECT doc_id, doc_id, 0 FROM q336_corpus
        |  UNION ALL
        |  SELECT e.dst, reach.r, reach.lvl + 1 FROM reach
        |  JOIN q336_edges e ON e.src = reach.id
        |  WHERE reach.lvl < $RecursionDepth AND reach.r < e.dst)
        |SELECT id AS doc_id, min(r) AS comp FROM reach
        |GROUP BY id ORDER BY doc_id""".stripMargin)
  }

  def dedupComponents(s: SparkSession, dir: String,
                      cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val corpus = nearDupCorpus(s, dir)
    val pairs = bandPairsFrom(withSignature(corpus, cfg), cfg)
    corpus.select(col("doc_id"))
      .join(components(pairs)
          .withColumnsRenamed(Map("doc_id" -> "eid", "comp" -> "ecomp")),
        col("doc_id") === col("eid"), "left")
      .select(col("doc_id"), coalesce(col("ecomp"), col("doc_id")).as("comp"))
      .orderBy("doc_id")
  }

  /** CONNECTED COMPONENTS over an undirected pair set (doc_a, doc_b) —
    * the BSP min-label loop shared by the text (q63/q72) and media
    * (q168) dedup families. Returns (doc_id, comp) for every id that
    * occurs in a pair; singletons never enter a round and are unioned
    * back by the caller.
    *
    * localCheckpoint (not persist): an iterative plan that REUSES a
    * cached frame still re-analyzes the frame's full logical lineage
    * every round, and the loop's own lineage grows linearly — truncating
    * to an RDD scan keeps every round's plan O(1). LAZY checkpoints:
    * materialization folds into the next action instead of costing a
    * separate driver job. Labels SEED at least(own id, min neighbor) —
    * hop #0 folded into construction; dedup graphs are star-shaped
    * around their min-id representative, so most components start
    * converged. FOUR hops fuse per action, and convergence is tested
    * INSIDE the round: hop(h3) = h3 proves h3 is the fixpoint of the
    * monotone min-label map, so a seeded graph of diameter ≤ 4 finishes
    * in ONE driver action. */
  private[graft] def components(pairs: DataFrame): DataFrame =
    componentsWithRounds(pairs)._1

  /** [[components]] plus the number of driver actions the BSP loop took —
    * the scale-ramp spec asserts the one-action convergence claim on a
    * ×10 graph instead of taking the scaladoc's word for it. */
  private[graft] def componentsWithRounds(pairs: DataFrame): (DataFrame, Int) = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(eager = false)
    var labels = edges.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src").as("doc_id"),
        least(col("src"), col("mn")).as("comp"))
      .localCheckpoint(eager = false)
    // one-hop propagation with per-hop-unique edge attributes (the same
    // edge frame joined twice in one plan would be self-ambiguous)
    def hop(l: DataFrame, i: Int): DataFrame = {
      val e = edges.select(col("src").as(s"src_$i"), col("dst").as(s"dst_$i"))
      val nbrMin = e.join(l, col(s"dst_$i") === l("doc_id"))
        .groupBy(col(s"src_$i")).agg(min("comp").as(s"nc_$i"))
      l.join(nbrMin, l("doc_id") === col(s"src_$i"), "left")
        .select(l("doc_id"),
          least(col("comp"), coalesce(col(s"nc_$i"), col("comp"))).as("comp"))
    }
    var converged = false
    var round = 0
    while (!converged) {
      val t0 = System.nanoTime()
      val h3 = hop(hop(hop(
        labels, 4 * round), 4 * round + 1), 4 * round + 2)
        .localCheckpoint(eager = false)
      val next = hop(h3, 4 * round + 3).localCheckpoint(eager = false)
      val changed = next
        .join(h3.withColumnsRenamed(Map("comp" -> "pcomp")), "doc_id")
        .filter(col("comp") =!= col("pcomp")).count()
      labels = next
      converged = changed == 0
      round += 1
      logInfo(f"components round $round ($changed changed): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (labels, round)
  }

  /** q72: the dedup pipeline's OUTPUT step — canonical selection. Keep the
    * min-id doc per near-dup component (comp label == representative id)
    * and summarize survivors per source: the "emit the cleaned corpus"
    * accounting every production dedup publishes. `baseIdOf` maps an id
    * back to its source-attributed base doc (fixture default:
    * [[fixtureBaseId]]). */
  def dedupKeepSummary(s: SparkSession, dir: String,
                       baseIdOf: Column => Column = fixtureBaseId,
                       cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val srcOf = docs(s, dir).select(col("doc_id").as("base_id"), col("source"))
    dedupComponents(s, dir, cfg)
      .withColumn("kept", (col("doc_id") === col("comp")).cast(IntegerType))
      .withColumn("base_id", baseIdOf(col("doc_id")))
      .join(srcOf, "base_id")
      .groupBy("source")
      .agg(count(lit(1)).cast(IntegerType).as("n_docs"),
        sum("kept").cast(IntegerType).as("n_kept"))
      .withColumn("n_dropped",
        (col("n_docs") - col("n_kept")).cast(IntegerType))
      .orderBy("source")
  }

  /** q172: QUALITY-AWARE canonical selection — production dedup keeps the
    * BEST exemplar of a duplicate cluster, not an arbitrary one: per
    * near-dup component, keep the member with the highest q23 quality
    * score (6-dp, doc_id tie-break — fully deterministic), and report per
    * source how often the quality rule changed the pick vs the min-id
    * convention (`n_quality_picks`) plus the exact integer-routed mean
    * quality of the kept set. Same scale shape as q72 — the component
    * labels are the shared BSP output, the pick is one component-keyed
    * window, the summary one low-cardinality agg. */
  def qualityKeepSummary(s: SparkSession, dir: String,
                         baseIdOf: Column => Column = fixtureBaseId,
                         cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = nearDupCorpus(s, dir).localCheckpoint()
    val comp = corpus.select(col("doc_id"))
      .join(components(bandPairsFrom(withSignature(corpus, cfg), cfg))
          .withColumnsRenamed(Map("doc_id" -> "eid", "comp" -> "ecomp")),
        col("doc_id") === col("eid"), "left")
      .select(col("doc_id"), coalesce(col("ecomp"), col("doc_id")).as("comp"))
    val scored = corpus
      .withColumn("qs", graft.text.TextOps.qualityScoreC)
      .select("doc_id", "qs")
    val picked = comp.join(scored, "doc_id")
      .withColumn("rk", row_number().over(
        Window.partitionBy("comp").orderBy(col("qs").desc, col("doc_id"))))
      .withColumn("min_id", min("doc_id").over(Window.partitionBy("comp")))
    val srcOf = docs(s, dir).select(col("doc_id").as("base_id"), col("source"))
    val nKept = sum(when(col("rk") === 1, 1).otherwise(0))
    picked.withColumn("base_id", baseIdOf(col("doc_id")))
      .join(srcOf, "base_id")
      .groupBy("source")
      .agg(count(lit(1)).cast(IntegerType).as("n_docs"),
        nKept.cast(IntegerType).as("n_kept"),
        sum(when(col("rk") === 1 && col("doc_id") =!= col("min_id"), 1)
          .otherwise(0)).cast(IntegerType).as("n_quality_picks"),
        // exact integer-micro-unit mean over the kept rows; NULL (both
        // engines) when a source keeps nothing
        (sum(when(col("rk") === 1,
            (col("qs").cast(DecimalType(18, 6)) * 1000000).cast(LongType))
          .otherwise(0L)).cast(DoubleType) /
          when(nKept > 0, nKept) / lit(1000000.0)).as("mean_kept_quality"))
      .orderBy("source")
  }

  /** q173: EFFECTIVE TOKEN BUDGET after dedup — raw vs surviving
    * (canonical-only) documents and BPE tokens per source, with the keep
    * ratio: dedup changes how many tokens a training plan actually gets
    * to spend, and this is the report that reconciles the raw crawl size
    * with the trainable volume. Min-id canonical rule (q72's), one
    * component pass + one source-keyed agg; the ratio is a single
    * division of exact integers, NULL-guarded identically on both
    * engines. */
  def dedupTokenBudget(s: SparkSession, dir: String,
                       baseIdOf: Column => Column = fixtureBaseId,
                       cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val corpus = nearDupCorpus(s, dir).localCheckpoint()
    val comp = corpus.select(col("doc_id"))
      .join(components(bandPairsFrom(withSignature(corpus, cfg), cfg))
          .withColumnsRenamed(Map("doc_id" -> "eid", "comp" -> "ecomp")),
        col("doc_id") === col("eid"), "left")
      .select(col("doc_id"), coalesce(col("ecomp"), col("doc_id")).as("comp"))
    val toks = corpus.select(col("doc_id"),
      bpeTokensC(col("text")).cast(LongType).as("toks"))
    val srcOf = docs(s, dir).select(col("doc_id").as("base_id"), col("source"))
    val keptToks = sum(when(col("doc_id") === col("comp"), col("toks"))
      .otherwise(0L))
    val rawToks = sum(col("toks"))
    comp.join(toks, "doc_id")
      .withColumn("base_id", baseIdOf(col("doc_id")))
      .join(srcOf, "base_id")
      .groupBy("source")
      .agg(count(lit(1)).cast(IntegerType).as("n_docs"),
        rawToks.as("raw_tokens"),
        sum(when(col("doc_id") === col("comp"), 1).otherwise(0))
          .cast(IntegerType).as("n_kept"),
        keptToks.as("kept_tokens"),
        (keptToks.cast(DoubleType) / when(rawToks > 0, rawToks))
          .as("token_keep_ratio"))
      .orderBy("source")
  }

  /** q174: CROSS-SPLIT TEXT LEAKAGE — the canonical train/heldout
    * near-dup audit (the MinHash complement of q131's exact grams and
    * the text analog of q164's embedding gate): documents assigned to
    * train/val/test by the q160 md5-bucket split, LSH candidate pairs
    * restricted to CROSS-split, Jaccard-verified, and reported per
    * unordered split pair with distinct leaked-doc counts on each side —
    * the go/no-go numbers before any heldout evaluation is trusted. The
    * fixture's documents table carries organic near-dups that genuinely
    * straddle the hash split, so the report is non-trivial without
    * injection. One shingle pass (persisted, shared by signatures,
    * sizes, and the verify join — the q162 collapse-once shape). */
  def crossSplitTextLeakage(s: SparkSession, dir: String,
                            cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    def splitOf(id: Column): Column = {
      val bucket = pmod(hex60C(md5(id.cast(StringType))), lit(100L))
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    }
    val shs = shingleRows(docs(s, dir).select("doc_id", "text"), cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shs.count()
    val pairs = bandPairsFrom(signaturesFrom(shs, cfg), cfg)
    val sizes = shs.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(shs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shs.as("sb"), col("doc_b") === col("sb.doc_id") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
    inter
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "sz" -> "sza")),
        "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "sz" -> "szb")),
        "doc_b")
      .filter(round(col("ni").cast(DoubleType) /
        (col("sza") + col("szb") - col("ni")), 6) >= cfg.jaccardThreshold)
      .withColumn("spa", splitOf(col("doc_a")))
      .withColumn("spb", splitOf(col("doc_b")))
      .filter(col("spa") =!= col("spb"))
      .withColumn("split_lo", least(col("spa"), col("spb")))
      .withColumn("split_hi", greatest(col("spa"), col("spb")))
      .groupBy("split_lo", "split_hi")
      .agg(count(lit(1)).cast(IntegerType).as("n_pairs"),
        countDistinct(when(col("spa") === col("split_lo"), col("doc_a"))
          .otherwise(when(col("spb") === col("split_lo"), col("doc_b"))))
          .cast(IntegerType).as("n_docs_lo"),
        countDistinct(when(col("spa") === col("split_hi"), col("doc_a"))
          .otherwise(when(col("spb") === col("split_hi"), col("doc_b"))))
          .cast(IntegerType).as("n_docs_hi"))
      .orderBy("split_lo", "split_hi")
  }

  /** q180's export shard count — interpolated into the oracle. */
  val CuratedShards: Int = 8

  /** q180: CURATED-CORPUS EXPORT — the "ship the dataset" step that ends
    * a curation pipeline: keep each organic near-dup component's
    * canonical (min-id) document, drop low-quality docs (q23 score <
    * [[AdmissionQualityMin]]), WRITE the survivors hash-sharded (q139's
    * layout: md5-bucket shard dirs, sorted within), then compute the
    * release MANIFEST — per shard: doc count, exact BPE token volume,
    * and a 60-bit xor content checksum — from the READ-BACK files only.
    * The oracle recomputes the expected manifest straight from the
    * source table, so hash-equality proves the whole chain (dedup ∘
    * quality filter ∘ sharded write ∘ read-back) lossless — the
    * integrity contract a training run checks before consuming a drop.
    * Cost: one component pass on organic pairs + one narrow scored
    * projection + one shard-keyed write. */
  def curatedExport(s: SparkSession, dir: String,
                    shards: Int = CuratedShards,
                    qualityMin: Double = AdmissionQualityMin,
                    cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val tmp = graft.sources.Tables.scratchTempDir("graft-q180")
    try {
      val d = docs(s, dir).select("doc_id", "source", "text").localCheckpoint()
      val comp = d.select(col("doc_id"))
        .join(components(bandPairsFrom(withSignature(d.select("doc_id", "text"), cfg), cfg))
            .withColumnsRenamed(Map("doc_id" -> "eid", "comp" -> "ecomp")),
          col("doc_id") === col("eid"), "left")
        .select(col("doc_id"),
          coalesce(col("ecomp"), col("doc_id")).as("comp"))
      val kept = d.join(comp, "doc_id")
        .filter(col("doc_id") === col("comp"))
        .withColumn("qs", graft.text.TextOps.qualityScoreC)
        .filter(col("qs") >= qualityMin)
        .select(col("doc_id"), col("source"), col("text"))
      val path = tmp.resolve("export").toString
      kept
        .withColumn("shard",
          pmod(hex60C(md5(col("doc_id").cast(StringType))),
            lit(shards.toLong)))
        .repartition(shards, col("shard"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").partitionBy("shard").parquet(path)
      s.read.parquet(path)
        .groupBy(col("shard").cast(IntegerType).as("shard"))
        .agg(count(lit(1)).cast(IntegerType).as("n_docs"),
          sum(bpeTokensC(col("text")).cast(LongType)).as("total_tokens"),
          expr("bit_xor(CAST(conv(substring(md5(text), 1, 15), 16, 10) " +
            "AS BIGINT))").as("xor_hash"))
        .orderBy("shard")
        .localCheckpoint()
    } finally Tables.rmTree(tmp)
  }

  /** q75: cross-source contamination — near-dup pairs whose members come
    * from DIFFERENT sources: the train/test decontamination check (did
    * the eval split leak into training data?) every LLM data pipeline
    * runs before a release. Built on the LSH candidate pairs, so cost is
    * bounded by candidates, with pair counts reported per unordered
    * source pair. */
  def crossSourceContamination(s: SparkSession, dir: String,
                               baseIdOf: Column => Column = fixtureBaseId,
                               cfg: DedupConfig = DedupConfig.Default): DataFrame = {
    val pairs = bandPairsFrom(withSignature(nearDupCorpus(s, dir), cfg), cfg)
    val src = docs(s, dir).select(col("doc_id").as("bid"), col("source"))
    pairs
      .withColumn("ba", baseIdOf(col("doc_a")))
      .withColumn("bb", baseIdOf(col("doc_b")))
      .join(src.withColumnsRenamed(Map("bid" -> "ba", "source" -> "source_a")),
        "ba")
      .join(src.withColumnsRenamed(Map("bid" -> "bb", "source" -> "source_b")),
        "bb")
      .filter(col("source_a") =!= col("source_b"))
      .select(least(col("source_a"), col("source_b")).as("src_lo"),
        greatest(col("source_a"), col("source_b")).as("src_hi"))
      .groupBy("src_lo", "src_hi")
      .agg(count(lit(1)).cast(IntegerType).as("n_pairs"))
      .orderBy("src_lo", "src_hi")
  }

  /** q131 — EXACT n-gram benchmark decontamination, the operator q75's
    * LSH near-dup pass deliberately is not: eval-suite leakage policy is
    * usually stated as "any shared 13-gram" (the GPT-3/PaLM convention),
    * an exact-match predicate with zero false positives, run between a
    * training corpus and every eval source before release.
    *
    * Shape (the one that survives 100 TB): explode each doc's DISTINCT
    * word 13-grams (map-side, codegen'd — `array_distinct` dedups before
    * the explode so a repeated phrase inside one doc costs one row),
    * hash each to a 128-bit key, and reduce to two small frames — the
    * distinct (gram, source) inventory and the distinct
    * (doc, source, gram) incidence. One equi-join of incidence against
    * inventory on the gram hash (source ≠ source) yields contaminated
    * docs; fan-out per gram is bounded by |sources| carrying it, never
    * by docs × docs. Per unordered source pair this reports distinct
    * contaminated docs on each side plus the distinct shared-gram count
    * — the go/no-go numbers a decontamination gate acts on. Pairs with
    * zero shared grams are absent on both sides (inner joins). */
  def ngramContamination(s: SparkSession, dir: String, n: Int = 13): DataFrame = {
    val grams = Tables.fanOut(
        docs(s, dir).select("doc_id", "source", "text"), "doc_id")
      .select(col("doc_id"), col("source"),
        explode(array_distinct(shinglesC(tokensC(col("text")), n))).as("sh"))
      // 16-byte binary key, not 32-char hex: same 128 bits, half the
      // join-shuffle key bytes (and the cached frame shrinks with it)
      .select(col("doc_id"), col("source"), unhex(md5(col("sh"))).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      grams.count() // materialize once: inventory + incidence both read this
      val srcs = grams.select("h", "source").distinct()
      val hits = grams.as("g")
        .join(srcs.as("o"),
          col("g.h") === col("o.h") && col("g.source") =!= col("o.source"))
        .select(col("g.doc_id").as("doc_id"), col("g.source").as("src_doc"),
          col("o.source").as("src_other"))
        .distinct()
        .withColumn("src_lo", least(col("src_doc"), col("src_other")))
        .withColumn("src_hi", greatest(col("src_doc"), col("src_other")))
      val docCounts = hits.groupBy("src_lo", "src_hi")
        .agg(
          countDistinct(when(col("src_doc") === col("src_lo"), col("doc_id")))
            .cast(IntegerType).as("n_docs_lo"),
          countDistinct(when(col("src_doc") === col("src_hi"), col("doc_id")))
            .cast(IntegerType).as("n_docs_hi"))
      val gramCounts = srcs.as("a")
        .join(srcs.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_lo"), col("b.source").as("src_hi"))
        .agg(countDistinct(col("a.h")).cast(IntegerType).as("n_shared_grams"))
      // materialize the ≤|sources|² result so the gram cache (the suite's
      // largest intermediate) can be released before returning
      docCounts.join(gramCounts, Seq("src_lo", "src_hi"))
        .orderBy("src_lo", "src_hi")
        .localCheckpoint()
    } finally { grams.unpersist(); () }
  }

  /** Longest run of consecutive integers in a collection of DISTINCT
    * ints — a higher-order fold over the sorted array. Replaces the
    * row_number-window gaps-and-islands idiom: the run assembly happens
    * inside the aggregation's group instead of a separate
    * partition+sort window stage, so the match frame crosses the wire
    * ONCE (the ×100 ramp's shared_spans lesson — the window's
    * sort-shuffle was half the family's cost). */
  private def maxConsecRun(positions: Column): Column = {
    val xs = sort_array(positions)
    aggregate(
      slice(xs, lit(2), size(xs) - 1),
      struct(lit(1).as("run"), lit(1).as("best"),
        element_at(xs, 1).as("prev")),
      (acc, x) => {
        val r = when(x === acc("prev") + 1, acc("run") + 1).otherwise(lit(1))
        struct(r.as("run"), greatest(acc("best"), r).as("best"),
          x.as("prev"))
      },
      acc => acc("best"))
  }

  /** Gaps-and-islands over a collection of DISTINCT ints, as data:
    * the sorted array folds to `array<struct<p0,len>>` — one struct
    * per maximal run of consecutive values. Same shuffle-once
    * rationale as [[maxConsecRun]], for the consumers that need each
    * island's start and length (span stripping), not just the max. */
  private def islandsOf(positions: Column): Column = {
    val xs = sort_array(positions)
    // empty array<struct<p0,len>> via slice: array().cast(...) can't
    // name struct fields, and sequence(1,0) is DESCENDING, not empty
    val noneYet = slice(
      array(struct(lit(0).as("p0"), lit(0).as("len"))), 1, 0)
    def closed(acc: Column) =
      array(struct(acc("p0").as("p0"),
        (acc("prev") - acc("p0") + 1).as("len")))
    aggregate(
      slice(xs, lit(2), size(xs) - 1),
      struct(noneYet.as("done"), element_at(xs, 1).as("p0"),
        element_at(xs, 1).as("prev")),
      (acc, x) => when(x === acc("prev") + 1,
          struct(acc("done").as("done"), acc("p0").as("p0"),
            x.as("prev")))
        .otherwise(struct(concat(acc("done"), closed(acc)).as("done"),
          x.as("p0"), x.as("prev"))),
      acc => concat(acc("done"), closed(acc)))
  }

  /** q237: LONGEST SHARED TOKEN SPAN — exact-substring decontamination
    * at span granularity (Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better", public): q131 says WHICH source
    * pairs share 13-grams; this says HOW LONG the shared passages
    * actually run, per cross-source doc pair — the number that
    * separates a quoted sentence from a wholesale copied document, and
    * the one a decontamination policy thresholds on ("strip spans ≥ 50
    * tokens" is the paper's rule). Gaps-and-islands over positional
    * gram matches: explode grams WITH POSITION, equi-join on the gram
    * hash across sources, and within each (pair, pos_a − pos_b)
    * diagonal a run of consecutive pos_a values is one shared span of
    * run_length + n − 1 tokens. Reports the top-`k` pairs by their
    * longest span.
    *
    * Shape at 100 TB: the join is hash-equi on the gram key — the
    * positional variant of q131's incidence join, bounded by shared-gram
    * occurrences (not corpus²); in production it runs on the doc pairs
    * q131's source gate already flagged, with q227's hub exclusion
    * keeping boilerplate grams out of the key. The match frame crosses
    * the wire exactly ONCE, as narrow as it gets: 16-byte binary gram
    * keys in the join (not 32-char hex), sources and pos_b dropped
    * before the shuffle (sources re-attach to the k survivors; pos_b
    * folds into the diagonal), and span assembly is a sorted-array
    * fold INSIDE the one aggregation ([[maxConsecRun]]) — no distinct
    * pass (joined tuples are unique by construction: (doc,pos)
    * identifies a gram row and dg fixes pos_b) and no
    * row_number-window sort-shuffle. The ×100 ramp measured the old
    * 3-shuffle chain at 28.5×; this is the fix. */
  def sharedSpans(s: SparkSession, dir: String, n: Int = 13,
                  k: Int = 20): DataFrame = {
    // deliberately NOT cached: the pos-exploded gram frame is the
    // suite's largest intermediate, and the ×100 ramp measured every
    // storage choice — MEMORY_AND_DISK 38 s / 22 GB peak, DISK_ONLY
    // 33 s / 14 GB (the serialized round-trip costs more than the
    // scan), recompute-per-join-side 23 s / 11 GB. The narrow
    // scan+shingle is cheaper to redo than to move.
    val grams = Tables.fanOut(
        docs(s, dir).select("doc_id", "source", "text"), "doc_id")
      .select(col("doc_id"), col("source"),
        posexplode(shinglesC(tokensC(col("text")), n)).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("source"), col("pos"),
        unhex(md5(col("sh"))).as("h"))
    val m = grams.as("a")
      .join(grams.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("a.pos") - col("b.pos")).as("dg"), col("a.pos").as("pos_a"))
    // top-k over the pair-level frame via sort+limit, NOT a global
    // row_number window: the tie-break order is total, so the rows are
    // identical, but Spark plans TakeOrderedAndProject (per-partition
    // heap + driver merge of k) instead of a single-partition window —
    // the ×100 ramp surfaced the all-pairs frame collapsing onto one
    // task through WindowExec
    val topk = m.groupBy("doc_a", "doc_b", "dg")
      .agg(maxConsecRun(collect_list(col("pos_a"))).as("run"))
      .groupBy("doc_a", "doc_b")
      .agg((max(col("run")) + (n - 1)).cast(IntegerType).as("span_tokens"))
      .orderBy(col("span_tokens").desc, col("doc_a"), col("doc_b"))
      .limit(k)
    // sources re-attach to the ≤k survivors (broadcast side), not to
    // the match frame — they'd otherwise ride every shuffled row
    val srcOf = docs(s, dir).select(col("doc_id"), col("source"))
    val withA = srcOf.join(broadcast(topk), col("doc_id") === col("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("source").as("src_a"),
        col("span_tokens"))
    srcOf.withColumnRenamed("source", "src_b")
      .join(broadcast(withA), col("doc_id") === col("doc_b"))
      .select("doc_a", "doc_b", "src_a", "src_b", "span_tokens")
      .orderBy(col("span_tokens").desc, col("doc_a"), col("doc_b"))
  }

  /** q238: SPAN-STRIP ACCOUNTING — the ACTION side of q237: if policy
    * strips every shared span of ≥ `minSpan` tokens from the
    * lexicographically-later source of each contaminated pair (the
    * deterministic "benchmark wins, crawl loses" priority rule), how
    * much text actually goes? Per source: docs touched, tokens flagged
    * (the UNION of covered positions — overlapping spans from different
    * pairs must not double-count, so the flagged set is
    * distinct-position counting, not a sum of span lengths), the
    * source's total tokens, and the flagged fraction — the number that
    * says whether decontamination is a trim or an amputation.
    *
    * Shape at 100 TB: q237's one-shuffle diagonal chain (narrow match
    * frame, [[islandsOf]] fold instead of a window — no no-op distinct,
    * no sort-shuffle) plus one sequence-explode of qualifying spans
    * (bounded by flagged-span volume, not corpus size) and two
    * hash-aggs; sources re-attach at doc granularity AFTER the
    * position-level dedup, so the strings never ride the wide
    * shuffles; the source token totals ride the existing corpus
    * scan. */
  def spanStripPlan(s: SparkSession, dir: String, n: Int = 13,
                    minSpan: Int = 30): DataFrame = {
    val grams = Tables.fanOut(
        docs(s, dir).select("doc_id", "source", "text"), "doc_id")
      .select(col("doc_id"), col("source"),
        posexplode(shinglesC(tokensC(col("text")), n)).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("source"), col("pos"),
        unhex(md5(col("sh"))).as("h"))
    val m = grams.as("a")
      .join(grams.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      // strip side = the LATER source (b): accounting runs in b's
      // position coordinates
      .select(col("b.doc_id").as("doc_id"), col("a.doc_id").as("doc_o"),
        (col("a.pos") - col("b.pos")).as("dg"), col("b.pos").as("pos_b"))
    val perDoc = m.groupBy("doc_id", "doc_o", "dg")
      .agg(islandsOf(collect_list(col("pos_b"))).as("isls"))
      .select(col("doc_id"), explode(filter(col("isls"),
        i => i("len") + (n - 1) >= minSpan)).as("isl"))
      // covered token positions of the island: p0 .. p0 + len - 1 + n - 1
      .select(col("doc_id"), explode(sequence(col("isl")("p0"),
        col("isl")("p0") + col("isl")("len") + (n - 2))).as("tp"))
      .distinct() // REAL: overlapping spans must not double-count
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ntok"))
    val flagged = docs(s, dir).select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).cast(IntegerType).as("n_docs_flagged"),
        sum(col("ntok")).cast(IntegerType).as("n_tokens_flagged"))
    val totals = docs(s, dir)
      .select(col("source"), size(tokensC(col("text"))).as("nt"))
      .groupBy("source")
      .agg(sum(col("nt")).cast(IntegerType).as("n_tokens_total"))
    totals.join(flagged, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_docs_flagged"), lit(0)).as("n_docs_flagged"),
        coalesce(col("n_tokens_flagged"), lit(0)).as("n_tokens_flagged"),
        col("n_tokens_total"),
        // a token-free source makes the fraction 0/0 — NULL on both
        // engines instead of an engine-specific NaN (q232 lesson)
        round(when(col("n_tokens_total") > 0,
          coalesce(col("n_tokens_flagged"), lit(0)).cast(DoubleType) /
            col("n_tokens_total")), 6).as("flagged_frac"))
      .orderBy("source")
  }

  /** The (b, r) sweep grid for q272: band sizes over the 8-permutation
    * signature; bands = 8 / rows. */
  val TuneRows: Seq[Int] = Seq(1, 2, 4, 8)

  /** s^n / (1−s)^n as an explicit LEFT-ASSOCIATED multiply chain —
    * no libm pow(), so the value is the identical IEEE product tree on
    * both engines. */
  private def powChainC(c: Column, n: Int): Column =
    (2 to n).foldLeft(c)((acc, _) => acc * c)

  /** q272: LSH PARAMETER TUNING CURVE — the (bands, rows) sweep every
    * MinHash deployment runs before fixing its config: for each band
    * shape over the SAME 8-permutation signatures, the empirical
    * candidate count and truth recall, next to the analytic capture
    * probability E[1 − (1 − j^r)^b] evaluated on the truth pairs' exact
    * Jaccards — observed vs S-curve on one table. Truth = the r=1
    * candidate superset (any shared permutation; banding at r>1 can
    * only subset it) verified to exact Jaccard ≥ [[JaccardThreshold]].
    *
    * Determinism: Jaccard is a ratio of integer counts; the S-curve
    * uses explicit multiply chains (no pow()); per-pair capture rounds
    * at 9 dp and sums as exact DECIMAL. Shape at 100 TB: signatures are
    * computed ONCE (the expensive stage); each config re-bands the tiny
    * per-doc signature table and pays only its own bucket-join — the
    * sweep costs one corpus scan plus |configs| band shuffles. */
  def lshTuning(s: SparkSession, dir: String): DataFrame = {
    val shs = shingleRows(nearDupCorpus(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shs.count() // eager fill: signatures + both jaccard sides
    try {
      val sigs = signaturesFrom(shs).localCheckpoint()
      val cand1 = bandPairsFrom(sigs, DedupConfig(bandSize = 1))
        .localCheckpoint()
      val sizes = shs.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val truth = cand1
        .join(shs.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(shs.as("sb"), col("doc_b") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
        .join(sizes.withColumnsRenamed(
          Map("doc_id" -> "doc_a", "sz" -> "sza")), Seq("doc_a"))
        .join(sizes.withColumnsRenamed(
          Map("doc_id" -> "doc_b", "sz" -> "szb")), Seq("doc_b"))
        .withColumn("jac", col("ni").cast(DoubleType) /
          (col("sza") + col("szb") - col("ni")).cast(DoubleType))
        .filter(col("jac") >= JaccardThreshold)
        .select("doc_a", "doc_b", "jac")
        .localCheckpoint()
      val rows = TuneRows.map { r =>
        val b = NumHashes / r
        val candR =
          if (r == 1) cand1
          else bandPairsFrom(sigs, DedupConfig(bandSize = r))
        val capture = lit(1.0) -
          powChainC(lit(1.0) - powChainC(col("jac"), r), b)
        val nc = candR.agg(count(lit(1)).as("n_cand"))
        val ca = truth.join(candR, Seq("doc_a", "doc_b"), "left_semi")
          .agg(count(lit(1)).as("n_caught"))
        val tm = truth.agg(count(lit(1)).as("n_truth"),
          sum(round(capture, 9).cast(DecimalType(28, 9)))
            .cast(DoubleType).as("cap_sum"))
        tm.crossJoin(nc).crossJoin(ca)
          .select(lit(r).as("band_rows"), lit(b).as("n_bands"),
            col("n_cand"), col("n_truth"), col("n_caught"),
            round(when(col("n_truth") > 0,
              col("n_caught").cast(DoubleType) / col("n_truth")), 6)
              .as("recall"),
            round(when(col("n_truth") > 0,
              col("cap_sum") / col("n_truth")), 6).as("mean_capture"))
      }
      rows.reduce(_ unionByName _).orderBy("band_rows").localCheckpoint()
    } finally { shs.unpersist(); () }
  }

  /** q274: CROSS-SOURCE CONTAMINATION MATRIX — pairwise 13-gram overlap
    * between sources: the triage table a decontamination pass reads
    * BEFORE q237's per-pair span work ("which source pairs share
    * material at all, and how much of the smaller one is implicated").
    * Per source pair: hub-excluded shared distinct grams and the
    * overlap coefficient shared / min(|A|, |B|). Grams present in more
    * than `maxHub` sources are boilerplate (the q227 hub rule) — they
    * say nothing about PAIRWISE contamination and would blow the
    * gram-join quadratically, so they are excluded from the numerator
    * (denominators stay full distinct-gram counts).
    *
    * Shape at 100 TB: (source, gram-hash) distinct is one hash agg;
    * the hub gate bounds the self-join to ≤ maxHub² rows per gram; the
    * matrix is |sources|² max. */
  def sourceOverlap(s: SparkSession, dir: String, n: Int = 13,
                    maxHub: Int = 8): DataFrame = {
    val sg = Tables.fanOut(
        docs(s, dir).select("doc_id", "source", "text"), "doc_id")
      .select(col("source"),
        explode(array_distinct(shinglesC(tokensC(col("text")), n)))
          .as("sh"))
      .select(col("source"), md5(col("sh")).as("h"))
      .distinct()
      .localCheckpoint() // sizes + hub census + pair join
    val sizes = sg.groupBy("source").agg(count(lit(1)).as("sz"))
    val nonHub = sg.join(
      sg.groupBy("h").agg(count(lit(1)).as("ns"))
        .filter(col("ns") <= maxHub && col("ns") > 1)
        .select("h"),
      Seq("h"))
    val shared = nonHub.as("a").join(nonHub.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnsRenamed(
        Map("source" -> "src_a", "sz" -> "sza")), Seq("src_a"))
      .join(sizes.withColumnsRenamed(
        Map("source" -> "src_b", "sz" -> "szb")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        round(col("n_shared").cast(DoubleType) /
          least(col("sza"), col("szb")).cast(DoubleType), 6)
          .as("overlap"))
      .orderBy("src_a", "src_b")
  }

  /** q299's estimator width and merge fan-in. */
  val SrcMinhashK = 32
  val SrcMinhashShards = 16

  /** q299: SOURCE-LEVEL MINHASH JACCARD — the sketch twin of q274's
    * exact overlap matrix (the q257/q259 estimate-vs-exact pattern, at
    * corpus-mix granularity): each source's 3-gram shingle SET gets a
    * [[SrcMinhashK]]-permutation MinHash signature, pairwise Jaccard is
    * estimated as the matched-component fraction, and the exact
    * |A∩B|/|A∪B| rides along with the absolute error — the table that
    * says how far the cheap signature would have misjudged the mix.
    *
    * The signatures are computed the way a 100 TB run MUST: per-shard
    * partial minima (here [[SrcMinhashShards]] hash shards standing in
    * for per-partition combiners across machines) min-merged into the
    * source signature. The DuckDB oracle computes the single-level
    * min directly, so hash-equality IS the merge certificate —
    * min-lattice associativity executed, not assumed (the q262
    * compact≡probe move, applied to sketches).
    *
    * Shape at 100 TB: the k permutations are map-side integer
    * arithmetic on each distinct (source, gram) row; both aggregation
    * levels are partial-agg-friendly mins; the exact-intersection join
    * fans out ≤ |sources|² per gram (a constant), and the pair matrix
    * is |sources|² rows. Nothing is quadratic in the corpus. */
  def sourceMinhashJaccard(s: SparkSession, dir: String, n: Int = 3,
                           k: Int = SrcMinhashK,
                           shards: Int = SrcMinhashShards): DataFrame = {
    val sg = Tables.fanOut(
        docs(s, dir).select("doc_id", "source", "text"), "doc_id")
      .select(col("source"),
        explode(array_distinct(shinglesC(tokensC(col("text")), n)))
          .as("sh"))
      .select(col("source"), hex60C(md5(col("sh"))).as("h"))
      .distinct()
      .localCheckpoint() // sizes + intersection + signature chain
    val pSigs = (0 until k).map(i => min(permC(col("h"), i)).as(s"sig$i"))
    val mSigs = (0 until k).map(i => min(col(s"sig$i")).as(s"sig$i"))
    val partial = sg.withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .groupBy("source", "shard")
      .agg(pSigs.head, pSigs.tail: _*)
    val merged = partial.groupBy("source")
      .agg(mSigs.head, mSigs.tail: _*)
      .localCheckpoint() // both sides of the tiny pair matrix
    val nMatch = (0 until k)
      .map(i => when(col(s"a.sig$i") === col(s"b.sig$i"), 1).otherwise(0))
      .reduce(_ + _)
    val pairs = merged.as("a")
      .join(broadcast(merged.as("b")), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        nMatch.cast(LongType).as("n_match"))
    val sizes = sg.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = sg.as("x").join(sg.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("ni"))
    val exactJ = col("n_inter").cast(DoubleType) /
      col("n_union").cast(DoubleType)
    val estJ = col("n_match").cast(DoubleType) / lit(k.toDouble)
    pairs
      .join(inter, Seq("src_a", "src_b"), "left")
      .join(sizes.withColumnsRenamed(
        Map("source" -> "src_a", "sz" -> "sza")), Seq("src_a"))
      .join(sizes.withColumnsRenamed(
        Map("source" -> "src_b", "sz" -> "szb")), Seq("src_b"))
      .select(col("src_a"), col("src_b"),
        coalesce(col("ni"), lit(0L)).as("n_inter"),
        (col("sza") + col("szb") - coalesce(col("ni"), lit(0L)))
          .as("n_union"),
        col("n_match"))
      .select(col("src_a"), col("src_b"), col("n_inter"), col("n_union"),
        col("n_match"),
        round(exactJ, 6).as("jaccard_exact"),
        estJ.as("jaccard_est"),
        round(abs(estJ - exactJ), 6).as("abs_err"))
      .orderBy("src_a", "src_b")
  }

  /** q281: DECONTAMINATION STRIP-AND-REVERIFY — the certificate q238
    * only plans: APPLY the strip (every flagged token position removed
    * from the later source of each contaminated pair), re-run the
    * q237 span detector on the stripped corpus, and report
    * before/after counts of pairs still sharing a ≥ `minSpan` span.
    * The residual is reported honestly rather than asserted zero:
    * removing tokens joins previously-separate segments, so NEW
    * n-grams can form across strip boundaries — exactly the edge a
    * release gate needs to see measured (rerun-until-fixpoint is the
    * production loop; this is one iteration with its evidence).
    *
    * Shape at 100 TB: two passes of the q237 chain (hash-equi gram
    * join, diagonal islands on doc-partitioned windows) plus one
    * rebuild (positional anti-join + per-doc ordered re-concat) —
    * everything keyed, nothing quadratic beyond shared-gram
    * occurrence lists. */
  def stripVerify(s: SparkSession, dir: String, n: Int = 13,
                  minSpan: Int = 30): DataFrame = {
    def gramRowsOf(c: DataFrame): DataFrame =
      c.select(col("doc_id"), col("source"),
        posexplode(shinglesC(tokensC(col("text")), n)).as(Seq("pos", "sh")))
        .select(col("doc_id"), col("source"), col("pos"),
          unhex(md5(col("sh"))).as("h"))
    // q281 keeps the gram checkpoints q237 dropped: each frame feeds
    // a SELF-join (2 reads) — at bench scale the store beats the
    // recomputes, and q281 is not a ramp family, so the ×100 heap
    // argument is q237's. Takes the PRE-BUILT gram frame so the
    // before-pass reuses the strip pass's checkpoint instead of
    // rebuilding the identical explode+md5 frame (round-16: one of the
    // three gram builds was a duplicate of the checkpointed `grams`).
    def pairsFromGrams(grams: DataFrame): DataFrame = {
      grams.as("a").join(grams.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (col("a.pos") - col("b.pos")).as("dg"), col("a.pos").as("pos_a"))
        .groupBy("doc_a", "doc_b", "dg")
        .agg(maxConsecRun(collect_list(col("pos_a"))).as("run"))
        .groupBy("doc_a", "doc_b")
        .agg(max(col("run")).as("run"))
        .filter(col("run") + (n - 1) >= minSpan)
        .select("doc_a", "doc_b")
    }
    val orig = Tables.fanOut(
      docs(s, dir).select("doc_id", "source", "text"), "doc_id")
      .localCheckpoint() // gram pass, flag pass, rebuild all read it
    val grams = gramRowsOf(orig).localCheckpoint()
    val m = grams.as("a").join(grams.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .select(col("b.doc_id").as("doc_id"), col("a.doc_id").as("doc_o"),
        (col("a.pos") - col("b.pos")).as("dg"), col("b.pos").as("pos_b"))
    val fl = m.groupBy("doc_id", "doc_o", "dg")
      .agg(islandsOf(collect_list(col("pos_b"))).as("isls"))
      .select(col("doc_id"), explode(filter(col("isls"),
        i => i("len") + (n - 1) >= minSpan)).as("isl"))
      .select(col("doc_id"), explode(sequence(col("isl")("p0"),
        col("isl")("p0") + col("isl")("len") + (n - 2))).as("pos"))
      .distinct() // REAL: overlapping spans share covered positions
      .localCheckpoint() // strip + the stripped-token census read it
    val toks = orig.select(col("doc_id"), col("source"),
      posexplode(tokensC(col("text"))).as(Seq("pos", "tk")))
    val rebuilt = toks.join(fl, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id", "source")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tk")))),
          x => x.getField("tk"))).as("text"))
    val before = pairsFromGrams(grams)
      .agg(count(lit(1)).as("n_pairs_before"))
    val after = pairsFromGrams(gramRowsOf(rebuilt).localCheckpoint())
      .agg(count(lit(1)).as("n_pairs_after"))
    val stripped = fl.agg(
      countDistinct(col("doc_id")).as("n_docs_stripped"),
      count(lit(1)).as("n_tokens_stripped"))
    before.crossJoin(after).crossJoin(stripped)
      .select(col("n_pairs_before"), col("n_pairs_after"),
        col("n_docs_stripped"), col("n_tokens_stripped"),
        round(when(col("n_pairs_before") > 0,
          col("n_pairs_after").cast(DoubleType) /
            col("n_pairs_before").cast(DoubleType)), 6)
          .as("residual_frac"))
  }

  /** q291: DUP-QUALITY CORRELATION — does duplication track quality?
    * Every doc flagged as exact-dup (shares a q26 norm-hash with
    * another doc) or unique, its q23 quality score quantized to
    * micro-units, and per source: group means and the point-biserial
    * correlation between the dup flag and quality — the evidence
    * behind "dedup first, then filter" (if dups skew low-quality, the
    * two passes overlap; if not, both are load-bearing). Moments are
    * exact DECIMAL(38,0) integer sums (the q258 overflow lesson);
    * degenerate groups (no dups / all dups / zero variance) yield
    * NULL, not NaN, on both engines. */
  def dupQualityCorr(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanOut(docs(s, dir), "doc_id")
      .select(col("doc_id"), col("source"), normHash(col("text")).as("h"),
        (graft.text.TextOps.qualityScoreC.cast(DecimalType(18, 6)) *
          1000000).cast(LongType).as("qm"))
    val dupc = d.groupBy("h").agg(count(lit(1)).as("nh"))
    val base = d.join(dupc, Seq("h"))
      .select(col("source"), col("qm"),
        when(col("nh") > 1, 1L).otherwise(0L).as("dd"))
    def exact(c: Column) = sum(c.cast(DecimalType(38, 0)))
    val g = base.groupBy("source").agg(
      count(lit(1)).as("n"), sum("dd").as("n_dup"),
      exact(col("qm")).cast(DoubleType).as("sq"),
      exact(col("qm") * col("qm")).cast(DoubleType).as("sqq"),
      exact(col("qm") * col("dd")).cast(DoubleType).as("sdq"))
    val nD = col("n").cast(DoubleType)
    val ndD = col("n_dup").cast(DoubleType)
    val varQ = nD * col("sqq") - col("sq") * col("sq")
    val num = nD * col("sdq") - ndD * col("sq")
    val den = sqrt((nD * ndD - ndD * ndD) * varQ)
    g.select(col("source"), col("n"), col("n_dup"),
      round(when(col("n_dup") > 0,
        col("sdq") / ndD / 1000000.0), 6).as("mean_q_dup"),
      round(when(col("n_dup") < col("n"),
        (col("sq") - col("sdq")) / (nD - ndD) / 1000000.0), 6)
        .as("mean_q_uniq"),
      round(when(col("n_dup") > 0 && col("n_dup") < col("n") &&
        varQ > 0, num / den), 6).as("pb_corr"))
      .orderBy("source")
  }

  private def q291OracleS: String = {
    val qs = graft.text.TextOps.qualityScoreExprS
    val mcols = graft.text.TextOps.qualityMeasureColsS
    s"""WITH m AS (SELECT doc_id, source, ${normHashS("text")} AS h,
       |    CAST(CAST($qs AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS qm
       |  FROM (SELECT doc_id, source, text,
       |    $mcols
       |  FROM (SELECT doc_id, source, text, ${tokensS("text")} AS t
       |    FROM documents))),
       |dupc AS (SELECT h, COUNT(*) AS nh FROM m GROUP BY h),
       |b AS MATERIALIZED (SELECT m.source, m.qm,
       |    CASE WHEN d.nh > 1 THEN 1 ELSE 0 END AS dd
       |  FROM m JOIN dupc d ON m.h = d.h),
       |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(dd) AS BIGINT) AS n_dup,
       |    CAST(SUM(CAST(qm AS DECIMAL(38,0))) AS DOUBLE) AS sq,
       |    CAST(SUM(CAST(qm * qm AS DECIMAL(38,0))) AS DOUBLE) AS sqq,
       |    CAST(SUM(CAST(qm * dd AS DECIMAL(38,0))) AS DOUBLE) AS sdq
       |  FROM b GROUP BY source)
       |SELECT source, n, n_dup,
       |  round(CASE WHEN n_dup > 0
       |    THEN sdq / CAST(n_dup AS DOUBLE) / 1000000.0 END, 6)
       |    AS mean_q_dup,
       |  round(CASE WHEN n_dup < n
       |    THEN (sq - sdq) / (CAST(n AS DOUBLE) - CAST(n_dup AS DOUBLE))
       |      / 1000000.0 END, 6) AS mean_q_uniq,
       |  round(CASE WHEN n_dup > 0 AND n_dup < n
       |      AND CAST(n AS DOUBLE) * sqq - sq * sq > 0
       |    THEN (CAST(n AS DOUBLE) * sdq - CAST(n_dup AS DOUBLE) * sq) /
       |      sqrt((CAST(n AS DOUBLE) * CAST(n_dup AS DOUBLE) -
       |        CAST(n_dup AS DOUBLE) * CAST(n_dup AS DOUBLE)) *
       |        (CAST(n AS DOUBLE) * sqq - sq * sq)) END, 6) AS pb_corr
       |FROM g ORDER BY source""".stripMargin
  }

  // ------------------------------------------------------------- oracles
  private def sigSelectS(corpus: String): String = {
    val t = tokensS("text")
    val sigs = (0 until NumHashes)
      .map(i => s"list_min(list_transform(hl, h -> ${permS("h", i)})) AS sig$i")
      .mkString(", ")
    s"""WITH corpus AS ($corpus),
       |shs AS (SELECT doc_id, list_distinct(${shinglesS(t, ShingleN)}) AS sh
       |        FROM corpus),
       |sigsrc AS (SELECT doc_id,
       |  list_transform(sh, x -> ${hex60S("md5(x)")}) AS hl FROM shs),
       |sig AS (SELECT doc_id, $sigs FROM sigsrc)""".stripMargin
  }

  /** The recursive component chain (signatures → bands → pairs → edges →
    * reach → comp) over an arbitrary corpus SQL — shared by the
    * q72/q172/q173 (near-dup corpus) and q180 (raw documents) oracles. */
  private def compChainFor(corpusSql: String): String =
    s"""${sigSelectS(corpusSql).replaceFirst("WITH ", "WITH RECURSIVE ")},
       |bk AS ($bandUnnestS),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM corpus
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
       |comp AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id)""".stripMargin

  private lazy val compChainS: String = compChainFor(nearDupCorpusS)

  private def bandUnnestS: String = {
    val bands = (0 until NumHashes / BandSize).map { b =>
      val parts = (0 until BandSize)
        .map(i => s"CAST(sig${b * BandSize + i} AS VARCHAR)")
      s"md5('$b' || '|' || ${parts.mkString(" || '|' || ")})"
    }
    s"SELECT doc_id, unnest([${bands.mkString(", ")}]) AS bk FROM sig"
  }

  /** [[bandUnnestS]] parametrized by band size (q272's sweep). */
  private def bandUnnestFor(rows: Int): String = {
    val bands = (0 until NumHashes / rows).map { b =>
      val parts = (0 until rows)
        .map(i => s"CAST(sig${b * rows + i} AS VARCHAR)")
      s"md5('$b' || '|' || ${parts.mkString(" || '|' || ")})"
    }
    s"SELECT doc_id, unnest([${bands.mkString(", ")}]) AS bk FROM sig"
  }

  private def q272OracleS: String = {
    def powChainS(e: String, n: Int): String =
      Seq.fill(n)(e).mkString(" * ")
    val configs = TuneRows.map { r =>
      val b = NumHashes / r
      val cand = if (r == 1) "cand1" else s"cand$r"
      val extra = if (r == 1) "" else
        s"""tbk$r AS (${bandUnnestFor(r)}),
           |cand$r AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a,
           |    b.doc_id AS doc_b
           |  FROM tbk$r a JOIN tbk$r b ON a.bk = b.bk
           |    AND a.doc_id < b.doc_id),
           |""".stripMargin
      val f = s"(1.0 - (${powChainS("jac", r)}))"
      val cap = s"1.0 - (${powChainS(f, b)})"
      (extra, s"""SELECT $r AS band_rows, $b AS n_bands,
         |  nc.n AS n_cand, nt.n AS n_truth, ca.n AS n_caught,
         |  round(CASE WHEN nt.n > 0
         |    THEN CAST(ca.n AS DOUBLE) / nt.n END, 6) AS recall,
         |  round(CASE WHEN nt.n > 0 THEN cp.s / nt.n END, 6)
         |    AS mean_capture
         |FROM (SELECT COUNT(*) AS n FROM $cand) nc,
         |  (SELECT COUNT(*) AS n FROM truth) nt,
         |  (SELECT COUNT(*) AS n FROM truth t JOIN $cand c
         |    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) ca,
         |  (SELECT CAST(SUM(CAST(round($cap, 9) AS DECIMAL(28,9)))
         |    AS DOUBLE) AS s FROM truth) cp""".stripMargin)
    }
    s"""${sigSelectS(nearDupCorpusS)},
       |shr AS MATERIALIZED (SELECT doc_id, unnest(sh) AS shingle
       |  FROM shs),
       |sz AS (SELECT doc_id, len(sh) AS sz FROM shs),
       |tbk1 AS (${bandUnnestFor(1)}),
       |cand1 AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a,
       |    b.doc_id AS doc_b
       |  FROM tbk1 a JOIN tbk1 b ON a.bk = b.bk AND a.doc_id < b.doc_id),
       |truth AS MATERIALIZED (SELECT doc_a, doc_b, jac FROM (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(COUNT(*) AS DOUBLE) /
       |      CAST(za.sz + zb.sz - COUNT(*) AS DOUBLE) AS jac
       |  FROM cand1 c JOIN shr sa ON sa.doc_id = c.doc_a
       |    JOIN shr sb ON sb.doc_id = c.doc_b
       |      AND sa.shingle = sb.shingle
       |    JOIN sz za ON za.doc_id = c.doc_a
       |    JOIN sz zb ON zb.doc_id = c.doc_b
       |  GROUP BY c.doc_a, c.doc_b, za.sz, zb.sz)
       | WHERE jac >= $JaccardThreshold),
       |${configs.map(_._1).mkString("")}dummy AS (SELECT 1)
       |${configs.map(_._2).mkString("\nUNION ALL\n")}
       |ORDER BY band_rows""".stripMargin
  }

  /** The q281 oracle: the q238 flag chain + rebuild + a second span
    * pass, all from the shared shingle/token spellings. */
  private def q281OracleS: String = {
    val t = tokensS("text")
    def gramsOf(rel: String, gname: String): String =
      s"""${gname}0 AS (SELECT doc_id, source,
         |    ${shinglesS(t, 13)} AS sh
         |  FROM $rel),
         |$gname AS (SELECT doc_id, source,
         |    CAST(u['pos'] AS INTEGER) AS pos, u['h'] AS h
         |  FROM (SELECT doc_id, source,
         |      unnest(list_transform(generate_series(1, len(sh)),
         |        i -> {'pos': i - 1, 'h': md5(sh[i])})) AS u
         |    FROM ${gname}0))""".stripMargin
    def pairsOf(g: String, out: String): String =
      s"""${out}m AS (SELECT DISTINCT a.doc_id AS doc_a,
         |    b.doc_id AS doc_b, a.pos AS pos_a, a.pos - b.pos AS dg
         |  FROM $g a JOIN $g b ON a.h = b.h AND a.source < b.source),
         |${out}r AS (SELECT doc_a, doc_b, dg,
         |    pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, dg
         |      ORDER BY pos_a) AS isl
         |  FROM ${out}m),
         |$out AS (SELECT DISTINCT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b FROM ${out}r
         |  GROUP BY doc_a, doc_b, dg, isl HAVING COUNT(*) + 12 >= 30))"""
        .stripMargin
    s"""WITH ${gramsOf("documents", "g")},
       |${pairsOf("g", "pb")},
       |mB AS (SELECT DISTINCT b.doc_id AS doc_id, a.doc_id AS doc_o,
       |    b.pos AS pos_b, a.pos - b.pos AS dg
       |  FROM g a JOIN g b ON a.h = b.h AND a.source < b.source),
       |rB AS (SELECT doc_id, doc_o, dg, pos_b,
       |    pos_b - ROW_NUMBER() OVER (PARTITION BY doc_id, doc_o, dg
       |      ORDER BY pos_b) AS isl
       |  FROM mB),
       |isles AS (SELECT doc_id, MIN(pos_b) AS p0, COUNT(*) AS len
       |  FROM rB GROUP BY doc_id, doc_o, dg, isl
       |  HAVING COUNT(*) + 12 >= 30),
       |fl AS MATERIALIZED (SELECT DISTINCT doc_id, tp FROM (
       |  SELECT doc_id, unnest(generate_series(p0, p0 + len + 11)) AS tp
       |  FROM isles)),
       |tk AS (SELECT doc_id, source, CAST(u['pos'] AS INTEGER) AS pos,
       |    u['tk'] AS tk
       |  FROM (SELECT doc_id, source,
       |      unnest(list_transform(generate_series(1, len(t)),
       |        i -> {'pos': i - 1, 'tk': t[i]})) AS u
       |    FROM (SELECT doc_id, source, $t AS t FROM documents))),
       |kept AS (SELECT k.doc_id, k.source, k.pos, k.tk
       |  FROM tk k LEFT JOIN fl ON fl.doc_id = k.doc_id AND fl.tp = k.pos
       |  WHERE fl.doc_id IS NULL),
       |reb AS MATERIALIZED (SELECT doc_id, source,
       |    array_to_string(list(tk ORDER BY pos), ' ') AS text
       |  FROM kept GROUP BY doc_id, source),
       |${gramsOf("reb", "h2")},
       |${pairsOf("h2", "pa")}
       |SELECT
       |  (SELECT COUNT(*) FROM pb) AS n_pairs_before,
       |  (SELECT COUNT(*) FROM pa) AS n_pairs_after,
       |  (SELECT COUNT(DISTINCT doc_id) FROM fl) AS n_docs_stripped,
       |  (SELECT COUNT(*) FROM fl) AS n_tokens_stripped,
       |  round(CASE WHEN (SELECT COUNT(*) FROM pb) > 0
       |    THEN CAST((SELECT COUNT(*) FROM pa) AS DOUBLE) /
       |      CAST((SELECT COUNT(*) FROM pb) AS DOUBLE) END, 6)
       |    AS residual_frac""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    // q320: the identical winnowing selection in DuckDB — 1-based list
    // positions (vs Spark's 0-based posexplode) shift every packed key by
    // one, which changes no window minimum; valid starts are i ≤ m−w+1
    "q320_winnow_fingerprints" -> {
      val (n, w, maxPostings, minShared) = (4, 4, 8, 3)
      s"""WITH c AS ($nearDupCorpusS),
         |g AS (SELECT doc_id, ${shinglesS(tokensS("text"), n)} AS gs FROM c),
         |sh AS (SELECT doc_id, CAST(u['pos'] AS BIGINT) AS pos,
         |    CAST(u['sh'] AS VARCHAR) AS sh
         |  FROM (SELECT doc_id, unnest(list_transform(
         |      generate_series(1, len(gs)), i -> {'pos': i, 'sh': gs[i]})) AS u
         |    FROM g)),
         |keyed AS (SELECT doc_id, pos,
         |    ${hex32S(seededMd5S(320, "sh"))} * 16777216
         |      + (16777215 - pos) AS key,
         |    COUNT(*) OVER (PARTITION BY doc_id) AS m
         |  FROM sh),
         |wk AS (SELECT doc_id, pos, m,
         |    MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS wkey
         |  FROM keyed),
         |fp AS (SELECT DISTINCT doc_id, wkey // 16777216 AS fph
         |  FROM wk WHERE pos <= greatest(m - $w + 1, 1)),
         |docn AS (SELECT doc_id, COUNT(*) AS n_fp FROM fp GROUP BY doc_id),
         |rare AS (SELECT fph FROM fp GROUP BY fph
         |  HAVING COUNT(*) <= $maxPostings),
         |ff AS (SELECT f.doc_id, f.fph FROM fp f JOIN rare r
         |  ON f.fph = r.fph),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    COUNT(*) AS n_shared
         |  FROM ff a JOIN ff b ON a.fph = b.fph AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= $minShared)
         |SELECT p.doc_a, p.doc_b, p.n_shared, x.n_fp AS n_fp_a,
         |  y.n_fp AS n_fp_b,
         |  round(CAST(p.n_shared AS DOUBLE) / least(x.n_fp, y.n_fp), 6)
         |    AS overlap
         |FROM pairs p JOIN docn x ON x.doc_id = p.doc_a
         |JOIN docn y ON y.doc_id = p.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // q318: the identical blocked prefix-filter algorithm in DuckDB —
    // the canonical (global df, tok) ordering via list(... ORDER BY),
    // the prefix slice, the (source, token) candidate equi-join, and
    // the exact Jaccard verify
    "q318_prefix_sim_join" -> {
      s"""WITH c AS (SELECT doc_id, text, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + $VariantIdOffset,
         |    CASE WHEN len(t) > 1
         |      THEN array_to_string(list_slice(t, 1, len(t) - 1), ' ')
         |      ELSE text END,
         |    source
         |  FROM (SELECT doc_id, text, source, ${tokensS("text")} AS t
         |    FROM documents)
         |  WHERE doc_id % 20 = 0),
         |tk AS MATERIALIZED (SELECT doc_id, source, unnest(
         |    list_distinct(${tokensS("text")})) AS tok FROM c),
         |dfc AS (SELECT tok, COUNT(*) AS df FROM tk GROUP BY tok),
         |arrs AS MATERIALIZED (SELECT t.doc_id, t.source,
         |    list(t.tok ORDER BY d.df, t.tok) AS ts
         |  FROM tk t JOIN dfc d ON t.tok = d.tok
         |  GROUP BY t.doc_id, t.source),
         |sz AS MATERIALIZED (SELECT doc_id, source, ts, len(ts) AS n,
         |    len(ts) - CAST(ceil(0.9 * len(ts)) AS INTEGER) + 1 AS p
         |  FROM arrs),
         |pre AS (SELECT doc_id, source, n,
         |    unnest(list_slice(ts, 1, p)) AS tok
         |  FROM sz),
         |cand AS (SELECT DISTINCT a.source, a.doc_id AS doc_a,
         |    b.doc_id AS doc_b
         |  FROM pre a JOIN pre b ON a.source = b.source
         |    AND a.tok = b.tok AND a.doc_id < b.doc_id
         |    AND greatest(a.n, b.n) * 0.9 <= least(a.n, b.n)),
         |v AS (SELECT c.source, c.doc_a, c.doc_b,
         |    len(list_intersect(x.ts, y.ts)) AS inter,
         |    x.n AS na, y.n AS nb
         |  FROM cand c JOIN sz x ON x.doc_id = c.doc_a
         |  JOIN sz y ON y.doc_id = c.doc_b)
         |SELECT source, doc_a, doc_b, CAST(inter AS BIGINT) AS n_common,
         |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 6)
         |    AS jaccard
         |FROM v
         |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.9
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "q291_dup_quality_corr" -> q291OracleS,
    "q281_strip_verify" -> q281OracleS,
    "q272_lsh_tuning" -> q272OracleS,
    "q274_source_overlap" -> {
      val t = tokensS("text")
      s"""WITH d AS (SELECT source,
         |    list_distinct(${shinglesS("t", 13)}) AS sh
         |  FROM (SELECT source, $t AS t FROM documents)),
         |sg AS MATERIALIZED (SELECT DISTINCT source, md5(s) AS h
         |  FROM (SELECT source, unnest(sh) AS s FROM d)),
         |sizes AS (SELECT source, COUNT(*) AS sz FROM sg GROUP BY source),
         |nh AS MATERIALIZED (SELECT sg.source, sg.h FROM sg JOIN (
         |    SELECT h, COUNT(*) AS ns FROM sg GROUP BY h) hh
         |  ON sg.h = hh.h WHERE hh.ns <= 8 AND hh.ns > 1),
         |sh AS (SELECT a.source AS src_a, b.source AS src_b,
         |    COUNT(*) AS n_shared
         |  FROM nh a JOIN nh b ON a.h = b.h AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT src_a, src_b, n_shared,
         |  round(CAST(n_shared AS DOUBLE) /
         |    CAST(least(za.sz, zb.sz) AS DOUBLE), 6) AS overlap
         |FROM sh JOIN sizes za ON za.source = sh.src_a
         |  JOIN sizes zb ON zb.source = sh.src_b
         |ORDER BY src_a, src_b""".stripMargin
    },
    // q299: single-level mins here vs the Spark side's shard-merged
    // mins — hash-equality is the merge certificate
    "q299_source_minhash" -> {
      val t = tokensS("text")
      val k = SrcMinhashK
      val sigCols = (0 until k)
        .map(i => s"min(${permS("h", i)}) AS sig$i").mkString(",\n    ")
      val matchSum = (0 until k)
        .map(i => s"(CASE WHEN a.sig$i = b.sig$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH d AS (SELECT source,
         |    list_distinct(${shinglesS("t", 3)}) AS sh
         |  FROM (SELECT source, $t AS t FROM documents)),
         |sg AS MATERIALIZED (SELECT DISTINCT source,
         |    ${hex60S("md5(s)")} AS h
         |  FROM (SELECT source, unnest(sh) AS s FROM d)),
         |sig AS (SELECT source,
         |    $sigCols
         |  FROM sg GROUP BY source),
         |sizes AS (SELECT source, COUNT(*) AS sz FROM sg GROUP BY source),
         |iv AS (SELECT x.source AS src_a, y.source AS src_b,
         |    COUNT(*) AS ni
         |  FROM sg x JOIN sg y ON x.h = y.h AND x.source < y.source
         |  GROUP BY 1, 2),
         |p AS (SELECT a.source AS src_a, b.source AS src_b,
         |    CAST($matchSum AS BIGINT) AS n_match
         |  FROM sig a JOIN sig b ON a.source < b.source),
         |m AS (SELECT p.src_a, p.src_b,
         |    CAST(COALESCE(iv.ni, 0) AS BIGINT) AS n_inter,
         |    CAST(za.sz + zb.sz - COALESCE(iv.ni, 0) AS BIGINT)
         |      AS n_union,
         |    p.n_match
         |  FROM p LEFT JOIN iv
         |    ON iv.src_a = p.src_a AND iv.src_b = p.src_b
         |  JOIN sizes za ON za.source = p.src_a
         |  JOIN sizes zb ON zb.source = p.src_b)
         |SELECT src_a, src_b, n_inter, n_union, n_match,
         |  round(CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE), 6)
         |    AS jaccard_exact,
         |  CAST(n_match AS DOUBLE) / $k.0 AS jaccard_est,
         |  round(abs(CAST(n_match AS DOUBLE) / $k.0 -
         |    CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE)), 6)
         |    AS abs_err
         |FROM m ORDER BY src_a, src_b""".stripMargin
    },
    "q232_lsh_planted_pr" ->
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |truth AS (SELECT doc_id AS doc_a,
         |    doc_id + $VariantIdOffset AS doc_b
         |  FROM documents WHERE doc_id % 20 = 0),
         |hit AS (SELECT COUNT(*) AS n_hit FROM pairs
         |  JOIN truth ON pairs.doc_a = truth.doc_a
         |    AND pairs.doc_b = truth.doc_b),
         |nc AS (SELECT COUNT(*) AS n_cand FROM pairs),
         |nt AS (SELECT COUNT(*) AS n_truth FROM truth)
         |SELECT CAST(n_cand AS INTEGER) AS n_cand,
         |  CAST(n_truth AS INTEGER) AS n_truth,
         |  CAST(n_hit AS INTEGER) AS n_hit,
         |  round(CASE WHEN n_cand > 0
         |    THEN CAST(n_hit AS DOUBLE) / n_cand END, 6)
         |    AS precision_planted,
         |  round(CAST(n_hit AS DOUBLE) / n_truth, 6) AS recall,
         |  round(CASE WHEN n_cand > 0 AND
         |      CAST(n_hit AS DOUBLE) / n_cand
         |        + CAST(n_hit AS DOUBLE) / n_truth > 0
         |    THEN 2.0 * (CAST(n_hit AS DOUBLE) / n_cand)
         |      * (CAST(n_hit AS DOUBLE) / n_truth) /
         |      (CAST(n_hit AS DOUBLE) / n_cand
         |        + CAST(n_hit AS DOUBLE) / n_truth) END, 6) AS f1_planted
         |FROM nc, nt, hit""".stripMargin,
    "q226_dup_cluster_sizes" ->
      s"""$compChainS
         |SELECT CAST(sz AS INTEGER) AS cluster_size,
         |  CAST(COUNT(*) AS INTEGER) AS n_clusters
         |FROM (SELECT comp.comp, COUNT(*) AS sz FROM comp GROUP BY comp.comp)
         |GROUP BY sz ORDER BY cluster_size""".stripMargin,
    // q327: DuckDB's NATIVE jaro_winkler_similarity over the same
    // candidate pairs — an independent implementation of the published
    // definition, agreeing to 6 dp (flag applied to the rounded score
    // on both sides)
    "q327_jw_linkage" ->
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |c AS (SELECT doc_id, substr(lower(trim(text)), 1, 80) AS k
         |  FROM corpus),
         |j AS (SELECT p.doc_a, p.doc_b,
         |    round(jaro_winkler_similarity(ca.k, cb.k), 6) AS jw
         |  FROM pairs p JOIN c ca ON ca.doc_id = p.doc_a
         |  JOIN c cb ON cb.doc_id = p.doc_b)
         |SELECT doc_a, doc_b, jw,
         |  CAST(jw >= 0.9 AS INTEGER) AS link
         |FROM j ORDER BY doc_a, doc_b""".stripMargin,
    // q350: same candidate pairs, same 64-char normalized prefixes,
    // DuckDB's levenshtein — integer-exact comparator parity
    "q350_edit_linkage" ->
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |c AS (SELECT doc_id, substr(lower(trim(text)), 1, 64) AS k
         |  FROM corpus)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(levenshtein(ca.k, cb.k) AS INTEGER) AS dist,
         |  CAST(levenshtein(ca.k, cb.k) <= 24 AS INTEGER) AS link
         |FROM pairs p JOIN c ca ON ca.doc_id = p.doc_a
         |JOIN c cb ON cb.doc_id = p.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    // q336: THE SAME recursive SQL as the Spark side (q63's oracle text)
    "q336_recursive_cte" ->
      s"""${sigSelectS(nearDupCorpusS).replaceFirst("WITH ", "WITH RECURSIVE ")},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(id, r, lvl) AS (
         |  SELECT doc_id, doc_id, 0 FROM corpus
         |  UNION ALL
         |  SELECT e.dst, reach.r, reach.lvl + 1
         |  FROM reach JOIN edges e ON e.src = reach.id
         |  WHERE reach.lvl < $RecursionDepth AND reach.r < e.dst)
         |SELECT id AS doc_id, min(r) AS comp FROM reach
         |GROUP BY id ORDER BY doc_id""".stripMargin,
    // q325: the identical peel unrolled KcoreRounds times (idempotent
    // once the fixpoint is reached — the Spark side proves convergence
    // within the bound or fails loudly)
    "q325_kcore" -> {
      // MATERIALIZED per round: each e_i is read three times by round
      // i+1 — inlining would re-expand the corpus scan 3^rounds times
      val rounds = (1 to KcoreRounds).map { i =>
        s"""d$i AS (SELECT id, COUNT(*) AS d FROM (
           |    SELECT doc_a AS id FROM e${i - 1}
           |    UNION ALL SELECT doc_b FROM e${i - 1}) GROUP BY id),
           |a$i AS (SELECT id FROM d$i WHERE d >= $KcoreK),
           |e$i AS MATERIALIZED (SELECT e.doc_a, e.doc_b FROM e${i - 1} e
           |  JOIN a$i x ON e.doc_a = x.id
           |  JOIN a$i y ON e.doc_b = y.id)""".stripMargin
      }.mkString(",\n")
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |$rounds
         |SELECT id AS doc_id, CAST(COUNT(*) AS INTEGER) AS core_deg
         |FROM (SELECT doc_a AS id FROM e$KcoreRounds
         |  UNION ALL SELECT doc_b FROM e$KcoreRounds)
         |GROUP BY id ORDER BY doc_id""".stripMargin
    },
    // q341: the identical walk unrolled PagerankIters times; every
    // double op mirrors the Spark side (literal 0.15/0.85, double
    // division, round-12, DECIMAL(28,12) sum) — see [[pagerank]]
    "q341_pagerank" -> {
      val steps = (1 to PagerankIters).map { i =>
        s"""p$i AS MATERIALIZED (
           |  SELECT d.id, d.deg,
           |    round(CAST($PagerankTeleport AS DOUBLE) / (SELECT n FROM nn)
           |      + CAST($PagerankDamping AS DOUBLE) *
           |        CAST(SUM(CAST(round(p.pr / CAST(p.deg AS DOUBLE), 12)
           |          AS DECIMAL(28,12))) AS DOUBLE), 12) AS pr
           |  FROM edges e JOIN p${i - 1} p ON p.id = e.src
           |    JOIN deg d ON d.id = e.dst
           |  GROUP BY d.id, d.deg)""".stripMargin
      }.mkString(",\n")
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg
         |  FROM edges GROUP BY src),
         |nn AS (SELECT COUNT(*) AS n FROM deg),
         |p0 AS MATERIALIZED (SELECT id, deg,
         |  round(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 12) AS pr
         |  FROM deg),
         |$steps
         |SELECT id AS doc_id, round(pr, 9) AS pr
         |FROM p$PagerankIters ORDER BY doc_id""".stripMargin
    },
    "q254_dup_graph_triangles" ->
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |deg AS (SELECT id, COUNT(*) AS d FROM
         |  (SELECT doc_a AS id FROM pairs
         |   UNION ALL SELECT doc_b FROM pairs) GROUP BY id),
         |ds AS (SELECT CAST(COUNT(*) AS INTEGER) AS n_nodes,
         |    CAST(SUM(d * (d - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
         |ne AS (SELECT COUNT(*) AS n_edges FROM pairs),
         |tri AS (SELECT COUNT(*) AS n_triangles FROM (
         |  SELECT e1.doc_a AS a, e2.doc_b AS c
         |  FROM pairs e1 JOIN pairs e2 ON e1.doc_b = e2.doc_a) p
         |  WHERE EXISTS (SELECT 1 FROM pairs e3
         |    WHERE e3.doc_a = p.a AND e3.doc_b = p.c))
         |SELECT n_nodes, n_edges, n_wedges, n_triangles,
         |  CASE WHEN n_wedges > 0
         |    THEN 3.0 * n_triangles / n_wedges END AS transitivity
         |FROM ds CROSS JOIN ne CROSS JOIN tri""".stripMargin,
    "q227_dup_graph_degrees" ->
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |deg AS (SELECT id, COUNT(*) AS degree FROM
         |  (SELECT doc_a AS id FROM pairs
         |   UNION ALL SELECT doc_b FROM pairs) GROUP BY id),
         |hist AS (SELECT 'hist' AS kind, CAST(degree AS BIGINT) AS k,
         |    CAST(COUNT(*) AS BIGINT) AS v
         |  FROM deg GROUP BY degree),
         |hubs AS (SELECT 'hub' AS kind, id AS k,
         |    CAST(degree AS BIGINT) AS v
         |  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY degree DESC, id)
         |      AS rk FROM deg)
         |  WHERE rk <= 5)
         |SELECT * FROM hist UNION ALL SELECT * FROM hubs
         |ORDER BY kind, k""".stripMargin,
    "q222_crawl_novelty" -> {
      val t = tokensS("text")
      s"""WITH sliced AS (SELECT doc_id, text,
         |    NTILE(4) OVER (ORDER BY doc_id) AS slice
         |  FROM documents),
         |g AS (SELECT doc_id, slice,
         |    unnest(list_distinct(${shinglesS(t, ShingleN)})) AS sh
         |  FROM sliced),
         |fs AS (SELECT sh, MIN(slice) AS fs FROM g GROUP BY sh)
         |SELECT CAST(g.slice AS INTEGER) AS slice,
         |  CAST(COUNT(DISTINCT g.doc_id) AS INTEGER) AS n_docs,
         |  COUNT(*) AS n_grams,
         |  CAST(SUM(CASE WHEN fs.fs = g.slice THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_new,
         |  round(CAST(SUM(CASE WHEN fs.fs = g.slice THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS pct_new
         |FROM g JOIN fs ON g.sh = fs.sh
         |GROUP BY g.slice ORDER BY g.slice""".stripMargin
    },
    "q195_bloom_prefilter" -> {
      def posList(h: String) = (0 until 4)
        .map(j => s"${hex60S(s"md5('$j#' || $h)")} % 65536")
        .mkString("[", ", ", "]")
      s"""WITH inc AS ($stagedIncrementS),
         |idx AS (SELECT DISTINCT ${normHashS("text")} AS h FROM documents),
         |ih AS (SELECT doc_id, ${normHashS("text")} AS h FROM inc),
         |bits AS (SELECT DISTINCT pos FROM
         |  (SELECT unnest(${posList("h")}) AS pos FROM idx)),
         |probe AS (SELECT DISTINCT doc_id, pos FROM
         |  (SELECT doc_id, unnest(${posList("h")}) AS pos FROM ih)),
         |pm AS (SELECT probe.doc_id,
         |    CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM probe LEFT JOIN bits ON probe.pos = bits.pos),
         |cd AS (SELECT doc_id, COUNT(*) AS np, SUM(hit) AS nh
         |  FROM pm GROUP BY doc_id),
         |cand AS (SELECT doc_id FROM cd WHERE np = nh),
         |td AS (SELECT COUNT(*) AS n FROM ih
         |  WHERE doc_id IN (SELECT doc_id FROM cand)
         |    AND h IN (SELECT h FROM idx))
         |SELECT
         |  CAST((SELECT COUNT(*) FROM ih) AS INTEGER) AS n_incoming,
         |  CAST((SELECT COUNT(*) FROM cand) AS INTEGER) AS n_candidates,
         |  CAST((SELECT n FROM td) AS INTEGER) AS n_true_dup,
         |  CAST((SELECT COUNT(*) FROM cand) - (SELECT n FROM td)
         |    AS INTEGER) AS n_false_pos,
         |  round(CAST((SELECT COUNT(*) FROM cand) - (SELECT n FROM td)
         |      AS DOUBLE) /
         |    CAST((SELECT COUNT(*) FROM ih) - (SELECT n FROM td)
         |      AS DOUBLE), 6) AS fp_rate""".stripMargin
    },
    "q190_containment_pairs" -> {
      // single-signature banding: band b's key is md5('b|sig_b')
      val bands = (0 until NumHashes)
        .map(b => s"md5('$b' || '|' || CAST(sig$b AS VARCHAR))")
        .mkString(", ")
      s"""${sigSelectS(containedCorpusS)},
         |bk AS (SELECT doc_id, unnest([$bands]) AS bk FROM sig),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |i AS (SELECT doc_a, doc_b,
         |    len(list_intersect(sa.sh, sb.sh)) AS ni,
         |    len(sa.sh) AS sza, len(sb.sh) AS szb
         |  FROM pairs
         |  JOIN shs sa ON pairs.doc_a = sa.doc_id
         |  JOIN shs sb ON pairs.doc_b = sb.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(sza AS INTEGER) AS sz_a, CAST(szb AS INTEGER) AS sz_b,
         |  round(CAST(ni AS DOUBLE) / least(sza, szb), 6) AS containment,
         |  round(CAST(ni AS DOUBLE) / (sza + szb - ni), 6) AS jaccard
         |FROM i WHERE CAST(ni AS DOUBLE) / least(sza, szb) >= 0.9
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "q188_gram_novelty" -> {
      val t = tokensS("text")
      s"""WITH shs AS (SELECT doc_id,
         |    unnest(list_distinct(${shinglesS(t, ShingleN)})) AS sh
         |  FROM documents),
         |fo AS (SELECT sh, min(doc_id) AS fd FROM shs GROUP BY sh),
         |nv AS (SELECT fd, COUNT(*) AS n_novel FROM fo GROUP BY fd),
         |sz AS (SELECT doc_id, COUNT(*) AS n_shingles FROM shs
         |  GROUP BY doc_id)
         |SELECT sz.doc_id, CAST(sz.n_shingles AS INTEGER) AS n_shingles,
         |  CAST(COALESCE(nv.n_novel, 0) AS INTEGER) AS n_novel,
         |  round(CAST(COALESCE(nv.n_novel, 0) AS DOUBLE) /
         |    CAST(sz.n_shingles AS DOUBLE), 6) AS novelty
         |FROM sz LEFT JOIN nv ON sz.doc_id = nv.fd
         |ORDER BY sz.doc_id""".stripMargin
    },
    "q187_chunk_dup_ratio" ->
      """WITH c AS (SELECT doc_id,
        |    md5(substr(text, CAST(s AS INTEGER), 200)) AS h
        |  FROM (SELECT doc_id, text,
        |      unnest(range(1, greatest(length(text), 1) + 1, 150)) AS s
        |    FROM documents)),
        |dup AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd
        |    FROM c GROUP BY h) WHERE nd >= 2),
        |f AS (SELECT doc_id, COUNT(*) AS n_dup FROM c
        |  WHERE h IN (SELECT h FROM dup) GROUP BY doc_id),
        |t AS (SELECT doc_id, COUNT(*) AS n_chunks FROM c GROUP BY doc_id)
        |SELECT t.doc_id, CAST(t.n_chunks AS INTEGER) AS n_chunks,
        |  CAST(COALESCE(f.n_dup, 0) AS INTEGER) AS n_dup,
        |  round(CAST(COALESCE(f.n_dup, 0) AS DOUBLE) /
        |    CAST(t.n_chunks AS DOUBLE), 6) AS dup_ratio,
        |  CAST(CAST(COALESCE(f.n_dup, 0) AS DOUBLE) /
        |    CAST(t.n_chunks AS DOUBLE) < 0.5 AS INTEGER) AS keep
        |FROM t LEFT JOIN f ON t.doc_id = f.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q153_incremental_dedup" ->
      s"""WITH inc AS ($stagedIncrementS),
         |idx AS (SELECT DISTINCT ${normHashS("text")} AS h FROM documents),
         |ih AS (SELECT doc_id, ${normHashS("text")} AS h FROM inc),
         |fresh AS (SELECT h, COUNT(*) AS c FROM ih
         |  WHERE h NOT IN (SELECT h FROM idx) GROUP BY h)
         |SELECT
         |  (SELECT CAST(COUNT(*) AS INTEGER) FROM ih) AS n_incoming,
         |  (SELECT CAST(COUNT(*) AS INTEGER) FROM ih
         |     WHERE h IN (SELECT h FROM idx)) AS n_dup_vs_existing,
         |  (SELECT CAST(COUNT(*) AS INTEGER) FROM fresh) AS n_new_contents,
         |  (SELECT CAST(COALESCE(SUM(c - 1), 0) AS INTEGER) FROM fresh)
         |    AS n_within_batch_extra""".stripMargin,
    "q26_dedup_exact" ->
      s"""WITH corpus AS ($dupCorpusS)
         |SELECT min(doc_id) AS canonical_id,
         |  CAST(count(*) AS INTEGER) AS n_copies
         |FROM (SELECT doc_id, ${normHashS("text")} AS h
         |      FROM corpus)
         |GROUP BY h ORDER BY canonical_id""".stripMargin,
    "q27_minhash_sig" -> {
      val cols = (0 until NumHashes).map(i => s"sig$i").mkString(", ")
      s"""${sigSelectS("SELECT doc_id, text FROM documents")}
         |SELECT doc_id, $cols FROM sig ORDER BY doc_id""".stripMargin
    },
    "q162_incremental_admission" -> {
      val t = tokensS("text")
      val T = graft.text.TextOps
      val sigChain = sigSelectS(
        "SELECT doc_id, text FROM documents" +
          " UNION ALL SELECT doc_id, text FROM fresh")
        .replaceFirst("WITH ", "")
      s"""WITH inc AS (
         |  SELECT doc_id + $VariantIdOffset AS doc_id, source, text
         |    FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id + ${2 * VariantIdOffset}, source,
         |    text || ' zqbatchdup' FROM documents WHERE doc_id % 21 = 0
         |  UNION ALL SELECT doc_id + ${3 * VariantIdOffset}, source,
         |    text || ' zqbatchdup' FROM documents WHERE doc_id % 21 = 0
         |  UNION ALL SELECT doc_id + ${4 * VariantIdOffset}, source,
         |    text || ' zqunique' FROM documents WHERE doc_id % 13 = 0
         |  UNION ALL SELECT doc_id + ${5 * VariantIdOffset}, source,
         |    array_to_string(list_reverse($t), ' ')
         |    FROM documents WHERE doc_id % 11 = 0),
         |idx AS (SELECT DISTINCT ${normHashS("text")} AS h FROM documents),
         |exg AS (SELECT doc_id, source, text, h,
         |    CASE WHEN h IN (SELECT h FROM idx) THEN 1 END AS seen,
         |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rk
         |  FROM (SELECT inc.*, ${normHashS("text")} AS h FROM inc) z),
         |fresh AS (SELECT doc_id, text FROM exg WHERE seen IS NULL AND rk = 1),
         |$sigChain,
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk
         |  AND a.doc_id < $VariantIdOffset AND b.doc_id >= $VariantIdOffset),
         |ver AS (SELECT DISTINCT doc_b AS doc_id FROM pairs
         |  JOIN shs sa ON pairs.doc_a = sa.doc_id
         |  JOIN shs sb ON pairs.doc_b = sb.doc_id
         |  WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |      len(list_distinct(list_concat(sa.sh, sb.sh))), 6)
         |    >= $JaccardThreshold),
         |m0 AS (SELECT exg.*, CASE WHEN exg.doc_id IN (SELECT doc_id FROM ver)
         |      THEN 1 END AS nd, $t AS t FROM exg),
         |m AS (SELECT doc_id, source, seen, rk, nd,
         |    CAST(${bpeTokensS("text")} AS BIGINT) AS toks,
         |    ${T.qualityMeasureColsS}
         |  FROM m0),
         |q AS (SELECT doc_id, source, seen, rk, nd, toks,
         |    ${T.qualityScoreExprS} AS qs FROM m),
         |c AS (SELECT *, CASE WHEN seen = 1 THEN 'dup_corpus'
         |      WHEN rk > 1 THEN 'dup_batch'
         |      WHEN nd = 1 THEN 'near_dup'
         |      WHEN qs < $AdmissionQualityMin THEN 'low_quality' END AS status0
         |  FROM q),
         |w AS (SELECT *, SUM(CASE WHEN status0 IS NULL THEN toks ELSE 0 END)
         |    OVER (PARTITION BY source ORDER BY qs DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c),
         |f AS (SELECT source, toks, COALESCE(status0,
         |    CASE WHEN cum <= $AdmissionBudgetTokens THEN 'admitted'
         |      ELSE 'over_budget' END) AS status FROM w)
         |SELECT source, CAST(COUNT(*) AS INTEGER) AS n_incoming,
         |  CAST(SUM(CASE WHEN status = 'dup_corpus' THEN 1 ELSE 0 END)
         |    AS INTEGER) AS n_dup_corpus,
         |  CAST(SUM(CASE WHEN status = 'dup_batch' THEN 1 ELSE 0 END)
         |    AS INTEGER) AS n_dup_batch,
         |  CAST(SUM(CASE WHEN status = 'near_dup' THEN 1 ELSE 0 END)
         |    AS INTEGER) AS n_near_dup,
         |  CAST(SUM(CASE WHEN status = 'low_quality' THEN 1 ELSE 0 END)
         |    AS INTEGER) AS n_low_quality,
         |  CAST(SUM(CASE WHEN status = 'over_budget' THEN 1 ELSE 0 END)
         |    AS INTEGER) AS n_over_budget,
         |  CAST(SUM(CASE WHEN status = 'admitted' THEN 1 ELSE 0 END)
         |    AS INTEGER) AS n_admitted,
         |  CAST(SUM(CASE WHEN status = 'admitted' THEN toks ELSE 0 END)
         |    AS BIGINT) AS admitted_tokens
         |FROM f GROUP BY source ORDER BY source""".stripMargin
    },
    "q154_incremental_neardup" ->
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |ver AS (SELECT doc_a, doc_b,
         |    round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |      len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
         |  FROM pairs
         |  JOIN shs sa ON pairs.doc_a = sa.doc_id
         |  JOIN shs sb ON pairs.doc_b = sb.doc_id
         |  WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |      len(list_distinct(list_concat(sa.sh, sb.sh))), 6)
         |    >= $JaccardThreshold),
         |cr AS (SELECT doc_b AS inc_doc, doc_a AS match_doc, jaccard
         |  FROM ver WHERE doc_a < $VariantIdOffset
         |    AND doc_b >= $VariantIdOffset),
         |r AS (SELECT inc_doc, match_doc, jaccard,
         |    ROW_NUMBER() OVER (PARTITION BY inc_doc
         |      ORDER BY jaccard DESC, match_doc) AS rk,
         |    CAST(COUNT(*) OVER (PARTITION BY inc_doc) AS INTEGER)
         |      AS n_matches
         |  FROM cr)
         |SELECT inc_doc, match_doc, jaccard, n_matches
         |FROM r WHERE rk = 1 ORDER BY inc_doc""".stripMargin,
    "q28_lsh_band_pairs" ->
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q29_ngram_jaccard" ->
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |    len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
         |FROM pairs
         |JOIN shs sa ON pairs.doc_a = sa.doc_id
         |JOIN shs sb ON pairs.doc_b = sb.doc_id
         |WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |    len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= $JaccardThreshold
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q30_simhash" ->
      s"""WITH ${simhashCtesS("SELECT doc_id, text FROM documents")}
         |SELECT doc_id, simhash FROM s ORDER BY doc_id""".stripMargin,
    "q62_simhash_pairs" -> {
      val idxs = (0 until SimhashBlocks).mkString(", ")
      s"""WITH ${simhashCtesS(nearDupCorpusS)},
         |blk AS (SELECT doc_id, simhash, unnest([$idxs]) AS bi FROM s),
         |blv AS (SELECT doc_id, simhash, bi,
         |    (simhash >> (bi * 8)) & 255 AS bv FROM blk)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hd
         |FROM blv a JOIN blv b ON a.bi = b.bi AND a.bv = b.bv
         |  AND a.doc_id < b.doc_id
         |  AND bit_count(xor(a.simhash, b.simhash)) <= $HammingThreshold
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "q68_edit_distance" ->
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(levenshtein(ca.text, cb.text) AS INTEGER) AS edit_dist,
         |  CAST(greatest(length(ca.text), length(cb.text)) AS INTEGER)
         |    AS max_len
         |FROM pairs
         |JOIN corpus ca ON pairs.doc_a = ca.doc_id
         |JOIN corpus cb ON pairs.doc_b = cb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q63_dedup_components" ->
      s"""${sigSelectS(nearDupCorpusS).replaceFirst("WITH ", "WITH RECURSIVE ")},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id)
         |SELECT id AS doc_id, min(r) AS comp FROM reach
         |GROUP BY id ORDER BY doc_id""".stripMargin,
    "q75_contamination" ->
      s"""${sigSelectS(nearDupCorpusS)},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |x AS (SELECT sa.source AS source_a, sb.source AS source_b
         |  FROM pairs
         |  JOIN documents sa ON pairs.doc_a % $VariantIdOffset = sa.doc_id
         |  JOIN documents sb ON pairs.doc_b % $VariantIdOffset = sb.doc_id
         |  WHERE sa.source <> sb.source)
         |SELECT least(source_a, source_b) AS src_lo,
         |  greatest(source_a, source_b) AS src_hi,
         |  CAST(count(*) AS INTEGER) AS n_pairs
         |FROM x GROUP BY 1, 2 ORDER BY src_lo, src_hi""".stripMargin,
    "q180_curated_export" -> {
      val T = graft.text.TextOps
      s"""${compChainFor("SELECT doc_id, source, text FROM documents")},
         |m0 AS (SELECT doc_id, text, ${tokensS("text")} AS t FROM corpus),
         |m AS (SELECT doc_id, ${T.qualityMeasureColsS}
         |  FROM m0),
         |sc AS (SELECT doc_id, ${T.qualityScoreExprS} AS qs FROM m),
         |kept AS (SELECT m0.doc_id, m0.text FROM m0
         |  JOIN comp ON m0.doc_id = comp.doc_id
         |  JOIN sc ON m0.doc_id = sc.doc_id
         |  WHERE comp.comp = m0.doc_id AND sc.qs >= $AdmissionQualityMin),
         |sh AS (SELECT doc_id, text,
         |    ${hex60S("md5(CAST(doc_id AS VARCHAR))")} % $CuratedShards
         |      AS shard,
         |    CAST(${bpeTokensS("text")} AS BIGINT) AS toks FROM kept)
         |SELECT CAST(shard AS INTEGER) AS shard,
         |  CAST(COUNT(*) AS INTEGER) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS total_tokens,
         |  bit_xor(${hex60S("md5(text)")}) AS xor_hash
         |FROM sh GROUP BY shard ORDER BY shard""".stripMargin
    },
    "q174_split_text_leakage" -> {
      val splitS = (e: String) =>
        s"""CASE WHEN ${hex60S(s"md5(CAST($e AS VARCHAR))")} % 100 < 80
           | THEN 'train'
           | WHEN ${hex60S(s"md5(CAST($e AS VARCHAR))")} % 100 < 90
           | THEN 'val' ELSE 'test' END""".stripMargin.replace("\n", "")
      s"""${sigSelectS("SELECT doc_id, text FROM documents")},
         |bk AS ($bandUnnestS),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
         |ver AS (SELECT doc_a, doc_b FROM pairs
         |  JOIN shs sa ON pairs.doc_a = sa.doc_id
         |  JOIN shs sb ON pairs.doc_b = sb.doc_id
         |  WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |      len(list_distinct(list_concat(sa.sh, sb.sh))), 6)
         |    >= $JaccardThreshold),
         |sp AS (SELECT doc_a, doc_b,
         |    ${splitS("doc_a")} AS spa, ${splitS("doc_b")} AS spb
         |  FROM ver),
         |x AS (SELECT doc_a, doc_b, spa, spb,
         |    least(spa, spb) AS split_lo, greatest(spa, spb) AS split_hi
         |  FROM sp WHERE spa <> spb)
         |SELECT split_lo, split_hi, CAST(COUNT(*) AS INTEGER) AS n_pairs,
         |  CAST(COUNT(DISTINCT CASE WHEN spa = split_lo THEN doc_a
         |    WHEN spb = split_lo THEN doc_b END) AS INTEGER) AS n_docs_lo,
         |  CAST(COUNT(DISTINCT CASE WHEN spa = split_hi THEN doc_a
         |    WHEN spb = split_hi THEN doc_b END) AS INTEGER) AS n_docs_hi
         |FROM x GROUP BY 1, 2 ORDER BY split_lo, split_hi""".stripMargin
    },
    "q172_quality_keep" -> {
      val T = graft.text.TextOps
      s"""$compChainS,
         |m0 AS (SELECT doc_id, text, ${tokensS("text")} AS t FROM corpus),
         |m AS (SELECT doc_id, ${T.qualityMeasureColsS}
         |  FROM m0),
         |sc AS (SELECT doc_id, ${T.qualityScoreExprS} AS qs FROM m),
         |j AS (SELECT c.doc_id, c.comp, sc.qs FROM comp c JOIN sc USING (doc_id)),
         |p AS (SELECT j.*, ROW_NUMBER() OVER (PARTITION BY comp
         |      ORDER BY qs DESC, doc_id) AS rk,
         |    MIN(doc_id) OVER (PARTITION BY comp) AS min_id FROM j)
         |SELECT d.source, CAST(COUNT(*) AS INTEGER) AS n_docs,
         |  CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
         |  CAST(SUM(CASE WHEN rk = 1 AND p.doc_id <> min_id THEN 1 ELSE 0 END)
         |    AS INTEGER) AS n_quality_picks,
         |  CAST(SUM(CASE WHEN rk = 1
         |      THEN CAST(CAST(qs AS DECIMAL(18,6)) * 1000000 AS BIGINT)
         |      ELSE 0 END) AS DOUBLE)
         |    / NULLIF(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END), 0)
         |    / 1000000.0 AS mean_kept_quality
         |FROM p JOIN documents d ON p.doc_id % $VariantIdOffset = d.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin
    },
    "q173_dedup_token_budget" ->
      s"""$compChainS,
         |tk AS (SELECT doc_id,
         |    CAST(${bpeTokensS("text")} AS BIGINT) AS toks FROM corpus),
         |j AS (SELECT c.doc_id, c.comp, tk.toks FROM comp c JOIN tk USING (doc_id))
         |SELECT d.source, CAST(COUNT(*) AS INTEGER) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS raw_tokens,
         |  CAST(SUM(CASE WHEN j.doc_id = comp THEN 1 ELSE 0 END) AS INTEGER)
         |    AS n_kept,
         |  CAST(SUM(CASE WHEN j.doc_id = comp THEN toks ELSE 0 END) AS BIGINT)
         |    AS kept_tokens,
         |  CAST(SUM(CASE WHEN j.doc_id = comp THEN toks ELSE 0 END) AS DOUBLE)
         |    / NULLIF(SUM(toks), 0) AS token_keep_ratio
         |FROM j JOIN documents d ON j.doc_id % $VariantIdOffset = d.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q72_dedup_keep" ->
      s"""$compChainS
         |SELECT d.source,
         |  CAST(count(*) AS INTEGER) AS n_docs,
         |  CAST(sum(CASE WHEN c.doc_id = c.comp THEN 1 ELSE 0 END) AS INTEGER)
         |    AS n_kept,
         |  CAST(count(*) - sum(CASE WHEN c.doc_id = c.comp THEN 1 ELSE 0 END)
         |    AS INTEGER) AS n_dropped
         |FROM comp c JOIN documents d ON c.doc_id % $VariantIdOffset = d.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q131_ngram_contamination" ->
      s"""WITH tok AS (SELECT doc_id, source, ${tokensS("text")} AS t
         |  FROM documents),
         |g AS (SELECT DISTINCT doc_id, source, md5(x) AS h
         |  FROM tok, unnest(${shinglesS("t", 13)}) AS u(x)),
         |s AS (SELECT DISTINCT h, source FROM g),
         |hits AS (SELECT DISTINCT gg.doc_id, gg.source AS src_doc,
         |    ss.source AS src_other
         |  FROM g gg JOIN s ss
         |    ON gg.h = ss.h AND gg.source <> ss.source),
         |dc AS (SELECT least(src_doc, src_other) AS src_lo,
         |    greatest(src_doc, src_other) AS src_hi,
         |    CAST(COUNT(DISTINCT CASE WHEN src_doc = least(src_doc, src_other)
         |      THEN doc_id END) AS INTEGER) AS n_docs_lo,
         |    CAST(COUNT(DISTINCT CASE WHEN src_doc = greatest(src_doc, src_other)
         |      THEN doc_id END) AS INTEGER) AS n_docs_hi
         |  FROM hits GROUP BY 1, 2),
         |gc AS (SELECT a.source AS src_lo, b.source AS src_hi,
         |    CAST(COUNT(DISTINCT a.h) AS INTEGER) AS n_shared_grams
         |  FROM s a JOIN s b ON a.h = b.h AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT dc.src_lo AS src_lo, dc.src_hi AS src_hi,
         |  n_docs_lo, n_docs_hi, n_shared_grams
         |FROM dc JOIN gc ON dc.src_lo = gc.src_lo AND dc.src_hi = gc.src_hi
         |ORDER BY dc.src_lo, dc.src_hi""".stripMargin,
    "q237_shared_spans" ->
      s"""WITH tok AS (SELECT doc_id, source,
         |    ${shinglesS(tokensS("text"), 13)} AS sh
         |  FROM documents),
         |g AS (SELECT doc_id, source,
         |    CAST(u['pos'] AS INTEGER) AS pos, u['h'] AS h
         |  FROM (SELECT doc_id, source,
         |      unnest(list_transform(generate_series(1, len(sh)),
         |        i -> {'pos': i - 1, 'h': md5(sh[i])})) AS u
         |    FROM tok)),
         |m AS (SELECT DISTINCT a.doc_id AS doc_a, a.source AS src_a,
         |    b.doc_id AS doc_b, b.source AS src_b,
         |    a.pos AS pos_a, b.pos AS pos_b
         |  FROM g a JOIN g b ON a.h = b.h AND a.source < b.source),
         |r AS (SELECT doc_a, src_a, doc_b, src_b,
         |    pos_a - pos_b AS dg,
         |    pos_a - ROW_NUMBER() OVER (
         |      PARTITION BY doc_a, doc_b, pos_a - pos_b
         |      ORDER BY pos_a) AS isl
         |  FROM m),
         |runs AS (SELECT doc_a, src_a, doc_b, src_b, COUNT(*) AS len
         |  FROM r GROUP BY doc_a, src_a, doc_b, src_b, dg, isl),
         |best AS (SELECT doc_a, src_a, doc_b, src_b,
         |    CAST(MAX(len) + 12 AS INTEGER) AS span_tokens
         |  FROM runs GROUP BY doc_a, src_a, doc_b, src_b)
         |SELECT doc_a, doc_b, src_a, src_b, span_tokens
         |FROM (SELECT *, ROW_NUMBER() OVER (
         |    ORDER BY span_tokens DESC, doc_a, doc_b) AS rk FROM best)
         |WHERE rk <= 20
         |ORDER BY span_tokens DESC, doc_a, doc_b""".stripMargin,
    "q238_span_strip_plan" ->
      s"""WITH tok AS (SELECT doc_id, source,
         |    ${shinglesS(tokensS("text"), 13)} AS sh
         |  FROM documents),
         |g AS (SELECT doc_id, source,
         |    CAST(u['pos'] AS INTEGER) AS pos, u['h'] AS h
         |  FROM (SELECT doc_id, source,
         |      unnest(list_transform(generate_series(1, len(sh)),
         |        i -> {'pos': i - 1, 'h': md5(sh[i])})) AS u
         |    FROM tok)),
         |m AS (SELECT DISTINCT b.doc_id AS doc_id, b.source AS source,
         |    a.doc_id AS doc_o, b.pos AS pos_b, a.pos - b.pos AS dg
         |  FROM g a JOIN g b ON a.h = b.h AND a.source < b.source),
         |r AS (SELECT doc_id, source, doc_o, dg, pos_b,
         |    pos_b - ROW_NUMBER() OVER (
         |      PARTITION BY doc_id, doc_o, dg ORDER BY pos_b) AS isl
         |  FROM m),
         |isles AS (SELECT doc_id, source, MIN(pos_b) AS p0,
         |    COUNT(*) AS len
         |  FROM r GROUP BY doc_id, source, doc_o, dg, isl
         |  HAVING COUNT(*) + 12 >= 30),
         |fl AS (SELECT DISTINCT doc_id, source, tp
         |  FROM (SELECT doc_id, source,
         |      unnest(generate_series(p0, p0 + len + 11)) AS tp
         |    FROM isles)),
         |fagg AS (SELECT source,
         |    CAST(COUNT(DISTINCT doc_id) AS INTEGER) AS n_docs_flagged,
         |    CAST(COUNT(*) AS INTEGER) AS n_tokens_flagged
         |  FROM fl GROUP BY source),
         |tot AS (SELECT source,
         |    CAST(SUM(len(${tokensS("text")})) AS INTEGER) AS n_tokens_total
         |  FROM documents GROUP BY source)
         |SELECT tot.source AS source,
         |  COALESCE(n_docs_flagged, 0) AS n_docs_flagged,
         |  COALESCE(n_tokens_flagged, 0) AS n_tokens_flagged,
         |  n_tokens_total,
         |  round(CASE WHEN n_tokens_total > 0
         |    THEN CAST(COALESCE(n_tokens_flagged, 0) AS DOUBLE)
         |      / n_tokens_total END, 6) AS flagged_frac
         |FROM tot LEFT JOIN fagg ON tot.source = fagg.source
         |ORDER BY tot.source""".stripMargin,
  )

  /** DuckDB CTE chain ending in `s AS (SELECT doc_id, simhash)` — the
    * 32-bit SimHash of `corpus`, bit-identical to [[simhashOf]]. */
  private def simhashCtesS(corpus: String): String = {
    val sums = (0 until 32).map { j =>
      s"""SUM((((strpos('$HexDigits', substr(h, ${1 + j / 4}, 1)) - 1)
         | >> ${j % 4}) & 1) * 2 - 1) AS s_$j"""
        .stripMargin.replace("\n", " ")
    }.mkString(", ")
    val fp = (0 until 32)
      .map(j => s"CASE WHEN s_$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""corpus AS ($corpus),
       |tk AS (SELECT doc_id, md5(unnest(${tokensS("text")})) AS h
       |  FROM corpus),
       |b AS (SELECT doc_id, $sums FROM tk GROUP BY doc_id),
       |s AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM b)""".stripMargin
  }
}
