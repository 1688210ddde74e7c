package graft

import graft.functions.VectorExprs.{dotp, lowerBound}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties pinning the custom codegen expressions against
  * BOTH the composable HOF form they replaced and a driver-side Scala
  * reference, over generated inputs the fixture-based cases can't cover
  * systematically (empty arrays, duplicate runs, all-below/all-above
  * probes, mixed magnitudes, length mismatches). Each property sample is
  * a BATCH of cases evaluated in one Spark job — ScalaCheck drives
  * generation and shrinking, Spark evaluates the whole batch at once
  * (per-case jobs would be 100× slower for the same coverage). Bitwise
  * equality throughout: the expressions claim bit-identity, not
  * tolerance. */
class VectorExprsPropertySpec extends SparkSpec {

  private val special =
    Gen.oneOf(0.0, 1.0, -1.5, 2.5, 0.1, 1e300, -1e300, 1e-300, 3.141592653589793)
  private val anyD = Gen.oneOf(special, Gen.choose(-10.0, 10.0))

  private def run(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  test("property: LowerBound ≡ array_min(filter) ≡ Scala reference") {
    import spark.implicits._
    val caseGen = for {
      n  <- Gen.choose(0, 12)
      ts <- Gen.listOfN(n, anyD)
      v  <- Gen.oneOf(anyD, if (ts.nonEmpty) Gen.oneOf(ts) else anyD)
    } yield (ts.sorted, v) // sorted ascending — the documented precondition
    run(Prop.forAll(Gen.listOfN(100, caseGen)) { cases =>
      cases.isEmpty || {
        val out = cases.toDF("ts", "v")
          .select(col("ts"), col("v"),
            lowerBound(col("ts"), col("v")).as("nat"),
            array_min(filter(col("ts"), x => x >= col("v"))).as("hof"))
          .collect()
        out.forall { r =>
          val ref = r.getSeq[Double](0).find(_ >= r.getDouble(1))
          val nat = if (r.isNullAt(2)) None else Some(r.getDouble(2))
          val hof = if (r.isNullAt(3)) None else Some(r.getDouble(3))
          nat == ref && hof == ref
        }
      }
    })
  }

  test("property: DotProduct ≡ aggregate(zip_with) on equal lengths ≡ fold reference") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.choose(0, 16)
      a <- Gen.listOfN(n, anyD)
      b <- Gen.listOfN(n, anyD)
    } yield (a, b)
    run(Prop.forAll(Gen.listOfN(60, caseGen)) { cases =>
      cases.isEmpty || {
        val out = cases.toDF("a", "b")
          .select(col("a"), col("b"),
            dotp(col("a"), col("b")).as("nat"),
            aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _)
              .as("hof"))
          .collect()
        out.forall { r =>
          // the documented fold order: ((0+p0)+p1)+… — same IEEE ops
          val ref = r.getSeq[Double](0).zip(r.getSeq[Double](1))
            .foldLeft(0.0) { case (s, (x, y)) => s + x * y }
          java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
            java.lang.Double.doubleToLongBits(ref) &&
          java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
            java.lang.Double.doubleToLongBits(ref)
        }
      }
    })
  }

  test("property: mortonC ≡ driver-side bit interleave over random 31-bit keys") {
    import spark.implicits._
    def spreadRef(v: Long): Long = {
      var x = v & 0x7FFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      x = (x | (x << 1)) & 0x5555555555555555L
      x
    }
    val keyGen = Gen.oneOf(
      Gen.choose(0L, 0x7FFFFFFFL), Gen.oneOf(0L, 1L, 2L, 0x7FFFFFFFL))
    val caseGen = for { x <- keyGen; y <- keyGen } yield (x, y)
    run(Prop.forAll(Gen.listOfN(100, caseGen)) { cases =>
      cases.isEmpty || {
        val out = cases.toDF("x", "y")
          .select(col("x"), col("y"),
            graft.sources.Sinks.mortonC(col("x"), col("y")).as("z"))
          .collect()
        out.forall { r =>
          val ref = spreadRef(r.getLong(0)) | (spreadRef(r.getLong(1)) << 1)
          r.getLong(2) == ref && ref >= 0
        }
      }
    })
  }

  test("property: DotProduct truncates to the shorter array (fold reference)") {
    import spark.implicits._
    val caseGen = for {
      na <- Gen.choose(0, 10)
      nb <- Gen.choose(0, 10)
      a  <- Gen.listOfN(na, anyD)
      b  <- Gen.listOfN(nb, anyD)
    } yield (a, b)
    run(Prop.forAll(Gen.listOfN(60, caseGen)) { cases =>
      cases.isEmpty || {
        val out = cases.toDF("a", "b")
          .select(col("a"), col("b"), dotp(col("a"), col("b")).as("nat"))
          .collect()
        out.forall { r =>
          val ref = r.getSeq[Double](0).zip(r.getSeq[Double](1))
            .foldLeft(0.0) { case (s, (x, y)) => s + x * y }
          java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
            java.lang.Double.doubleToLongBits(ref)
        }
      }
    })
  }

  test("property: NfcNormalize == java.text.Normalizer over generated " +
      "mixes of ASCII, combining marks, singletons, and ligatures") {
    import spark.implicits._
    // building blocks chosen to exercise composition, singleton mapping,
    // NFC-invariant compatibility chars, and reordering of combining
    // marks with different canonical combining classes
    val pieces = Gen.oneOf(
      "a", "e", "Z", " ", "\u0301", "\u030A", "\u0323", // marks (ccc 230/230/220)
      "\u212B", "\u00C5", "\u00E9", "\uFB01", "x\u0301\u0323")
    val strs = Gen.listOf(pieces).map(_.mkString).map(_.take(40))
    val batch = Gen.listOfN(24, strs)
    run(Prop.forAll(batch) { ss0 =>
      val ss = ss0.filter(_.nonEmpty)
      if (ss.isEmpty) true
      else {
        val got = ss.toDF("s")
          .select(graft.functions.StringExprs.nfcNormalize(col("s")))
          .collect().map(_.getString(0)).toSeq
        val want = ss.map(s => java.text.Normalizer.normalize(
          s, java.text.Normalizer.Form.NFC))
        got == want
      }
    })
  }
}
