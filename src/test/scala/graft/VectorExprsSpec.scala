package graft

import graft.functions.VectorExprs.dotp
import org.apache.spark.sql.functions._

class VectorExprsSpec extends SparkSpec {

  test("DotProduct matches the higher-order fold bit-exactly (codegen + interpreted)") {
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .withColumn("e", col("embedding").cast("array<double>"))
      .withColumn("e2", reverse(col("e")))
    val both = emb.select(
      dotp(col("e"), col("e2")).as("native"),
      aggregate(zip_with(col("e"), col("e2"), _ * _), lit(0.0), _ + _).as("fold"))
    // bitwise equality — same sequential fold order
    assert(both.filter(col("native") =!= col("fold")).count() === 0)
    assert(both.count() > 0)
  }

  test("DotProduct handles nulls and length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 9.0))), // min length → 11
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(dotp(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
  }

  test("DotProduct participates in whole-stage codegen") {
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .withColumn("e", col("embedding").cast("array<double>"))
      .select(dotp(col("e"), col("e")).as("d"))
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage;
    // dot_product must appear inside one, not in a fallback Project
    val plan = emb.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("dot_product") && l.trim.startsWith("*(")), plan.take(500))
  }

  test("LowerBound matches the HOF form bit-exactly over fixture data") {
    import graft.functions.VectorExprs.lowerBound
    // probe every lineitem quantity against a sorted candidate array —
    // the exact shape GiniStump's bin assignment runs
    val cands = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .agg(sort_array(collect_set(col("l_quantity"))).as("ts"))
    val probed = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select((col("l_quantity") * 0.7).as("v")).crossJoin(cands)
      .select(
        lowerBound(col("ts"), col("v")).as("native"),
        array_min(filter(col("ts"), x => x >= col("v"))).as("hof"))
    assert(probed.filter(
      (col("native").isNull =!= col("hof").isNull) ||
      (col("native").isNotNull && col("native") =!= col("hof")))
      .count() === 0)
    assert(probed.count() > 0)
  }

  test("LowerBound edge cases: below-all, above-all, exact hit, null inputs") {
    import spark.implicits._
    import graft.functions.VectorExprs.lowerBound
    val df = Seq(
      (Some(Seq(1.0, 3.0, 5.0)), Some(0.5)),  // below all -> first
      (Some(Seq(1.0, 3.0, 5.0)), Some(3.0)),  // exact hit -> itself
      (Some(Seq(1.0, 3.0, 5.0)), Some(5.5)),  // above all -> null
      (Some(Seq(1.0, 3.0, 5.0)), None),       // null probe -> null
      (None, Some(1.0))                        // null array -> null
    ).toDF("ts", "v")
    val out = df.select(lowerBound(col("ts"), col("v"))).collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(1).getDouble(0) === 3.0)
    assert(out(2).isNullAt(0))
    assert(out(3).isNullAt(0))
    assert(out(4).isNullAt(0))
  }

  test("LowerBound participates in whole-stage codegen") {
    import graft.functions.VectorExprs.lowerBound
    // parquet-backed input so the projection can't constant-fold away
    val df = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select(lowerBound(array(lit(10.0), lit(25.0), lit(40.0)),
        col("l_quantity")).as("lb"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("lower_bound") && l.trim.startsWith("*(")), plan.take(500))
  }

  test("NfcNormalize: golden compositions, NFC-invariant controls, null " +
      "propagation, idempotence, SQL registration, and codegen") {
    import spark.implicits._
    import graft.functions.StringExprs.nfcNormalize
    val golden = Seq(
      ("e\u0301", "\u00E9"),           // combining acute composes
      ("\u212B", "\u00C5"),            // Angstrom singleton maps
      ("A\u030A", "\u00C5"),           // combining ring composes
      ("\uFB01", "\uFB01"),            // fi-ligature: NFC-invariant
      ("ascii only", "ascii only"),      // fast path
      ("", ""))
    val got = golden.toDF("a", "want")
      .select(nfcNormalize(col("a")).as("n"), col("want"),
        nfcNormalize(nfcNormalize(col("a"))).as("nn")).collect()
    got.foreach { r =>
      assert(r.getString(0) === r.getString(1), r)
      assert(r.getString(2) === r.getString(0), "not idempotent")
    }
    val nr = Seq(None: Option[String]).toDF("a")
      .select(nfcNormalize(col("a"))).head()
    assert(nr.isNullAt(0))
    // registered as a SQL function with DuckDB's name (the combining
    // mark is embedded directly \u2014 Spark's chr() is ASCII-mod-256, not
    // codepoint-based like DuckDB's)
    assert(spark.sql("SELECT nfc_normalize('e\u0301')").head()
      .getString(0) === "\u00E9")
    // inside whole-stage codegen, like the other native string exprs
    val plan = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(nfcNormalize(col("text")).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("nfc_normalize") && l.trim.stripPrefix("+- ")
        .stripPrefix(":- ").startsWith("*(")), plan.take(800))
  }

  test("JaroWinklerSim: published golden values, edge cases, and " +
      "symmetry over fixture text") {
    import spark.implicits._
    import graft.functions.StringExprs.jaroWinkler
    // Winkler's published comparator values + probes pinned against
    // DuckDB's independent built-in (see StringSim scaladoc)
    val golden = Seq(
      ("MARTHA", "MARHTA", 0.961111), ("DWAYNE", "DUANE", 0.84),
      ("DIXON", "DICKSONX", 0.813333), ("AB", "BA", 0.0),
      ("A", "A", 1.0), ("", "ABC", 0.0),
      ("ABCDEF", "ABZZZZZZZZ", 0.511111), // jaro < 0.7 ⇒ no boost
      ("prefixaa", "prefixbb", 0.9),      // prefix capped at 4
      ("CRATE", "TRACE", 0.733333))
    val got = golden.toDF("a", "b", "want")
      .select(round(jaroWinkler(col("a"), col("b")), 6).as("jw"),
        col("want")).collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1), r))
    // nulls propagate
    val nr = Seq((Some("x"), None: Option[String]))
      .toDF("a", "b").select(jaroWinkler(col("a"), col("b"))).head()
    assert(nr.isNullAt(0))
    // symmetry + range on real fixture candidate keys
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(substring(lower(trim(col("text"))), 1, 40).as("k"))
      .limit(50).localCheckpoint()
    val pairs = docs.select(col("k").as("ka"))
      .crossJoin(docs.select(col("k").as("kb")))
      .select(jaroWinkler(col("ka"), col("kb")).as("ab"),
        jaroWinkler(col("kb"), col("ka")).as("ba"),
        (col("ka") === col("kb")).as("eq"))
      .collect()
    pairs.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // symmetric
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      if (r.getBoolean(2)) assert(r.getDouble(0) === 1.0)
    }
  }

  test("JaroWinklerSim participates in whole-stage codegen") {
    import graft.functions.StringExprs.jaroWinkler
    val plan = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(jaroWinkler(col("text"), reverse(col("text"))).as("jw"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("jaro_winkler") && l.trim.startsWith("*(")), plan.take(500))
  }
}
