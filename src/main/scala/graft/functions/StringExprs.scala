package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JARO-WINKLER similarity kernel — the record-linkage scorer (Winkler's
  * census string comparator): Jaro's matching-window similarity boosted by
  * up to 4 characters of exact common prefix when the base score clears
  * 0.7. The textbook definition, matching DuckDB's built-in
  * `jaro_winkler_similarity` (verified on the published MARTHA/DWAYNE/
  * DIXON values and on prefix-cap / boost-threshold probes):
  *
  *   window  = max(⌊max(|a|,|b|)/2⌋ − 1, 0)
  *   matches = greedy left-to-right within the window, each b-char used once
  *   t       = ⌊(# matched positions whose sequences disagree)/2⌋
  *   jaro    = (m/|a| + m/|b| + (m−t)/m)/3   (0 when m = 0 or a side is empty)
  *   jw      = jaro > 0.7 ? jaro + min(ℓ,4)·0.1·(1−jaro) : jaro
  *
  * Contract: character-level comparison on the JVM; identical to DuckDB's
  * byte-level comparison for ASCII inputs (the oracle fixture — callers
  * linking non-ASCII text should normalize first). */
object StringSim {
  /** Static kernel invoked by both the interpreted and the generated
    * code path — the same shape as Spark's own levenshtein codegen. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    jw(a.toString, b.toString)

  def jw(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mt = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - mt).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val maxL = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** Native Catalyst expression for [[StringSim.jaroWinkler]].
  *
  * Why a custom Expression (SURVEY.md §2.11): Spark has no built-in
  * Jaro-Winkler and the algorithm (stateful two-array matching scan) is
  * inexpressible as composed built-ins without per-row array explosions;
  * a Scala UDF would box every row and break whole-stage codegen. Like
  * Spark's own `levenshtein`, the generated code is a static call into
  * the kernel — the enclosing stage stays fused. */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires string inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC kernel — canonical composition via the JDK's
  * `java.text.Normalizer` (the Unicode-standard algorithm; DuckDB's
  * `nfc_normalize` implements the same UAX#15 spec through utf8proc, so
  * the two engines agree byte-for-byte — that agreement IS the q378
  * oracle). The fast path: most corpus text is already NFC, and
  * `isNormalized` is a cheap quick-check scan that avoids allocating a
  * copy for it. */
object UnicodeNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression for Unicode NFC normalization.
  *
  * Why a custom Expression (SURVEY.md §2.11): text entering an LLM
  * corpus from multiple sources mixes composed and decomposed forms
  * ("é" vs "e"+U+0301) — identical text that hashes differently, so
  * exact dedup, shingling, and fingerprinting all silently miss
  * duplicates until the text is canonicalized. Spark has NO
  * normalization builtin; a Scala UDF would box every row and break
  * whole-stage codegen on the hottest scan of the pipeline. Like
  * `levenshtein`/[[JaroWinklerSim]], the generated code is one static
  * call into the kernel — the stage stays fused. */
case class NfcNormalize(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object StringExprs {
  /** Column wrapper for [[JaroWinklerSim]]. */
  def jaroWinkler(a: Column, b: Column): Column =
    bridge.column(JaroWinklerSim(bridge.expression(a), bridge.expression(b)))

  /** Column wrapper for [[HilbertIndex]]. */
  def hilbertIndex(x: Column, y: Column, order: Int): Column =
    bridge.column(HilbertIndex(bridge.expression(x), bridge.expression(y),
      order))

  /** Column wrapper for [[NfcNormalize]]. */
  def nfcNormalize(c: Column): Column =
    bridge.column(NfcNormalize(bridge.expression(c)))
}

/** Static Hilbert xy→d kernel — the per-level compare/accumulate/
  * reflect+transpose loop as tight JVM integer code, shared by the
  * interpreted and generated paths of [[HilbertIndex]]. Semantics are
  * the classic formulation (reflection about n−1); the spec asserts
  * bijectivity and the unit-step walk on a full grid. */
object HilbertKernel {
  def index(x0: Long, y0: Long, order: Int): Long = {
    val n = 1L << order
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Native Catalyst expression for the Hilbert curve index.
  *
  * Why a custom Expression: the `aggregate` HOF fold of the same loop
  * is CodegenFallback — interpreted per row, it made the q323 layout
  * write ~10× the q137 Morton write (13.3 s vs 1.4 s measured). As a
  * static-call BinaryExpression the 16-level loop runs as compiled
  * JVM code inside WholeStageCodegen — the layout key costs what the
  * Morton key costs. */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
  extends BinaryExpression {
  require(order > 0 && order <= 31, s"order out of range: $order")

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == org.apache.spark.sql.types.LongType ||
      t == org.apache.spark.sql.types.IntegerType
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires integral inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hilbert_index"

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case other => other.asInstanceOf[Long]
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKernel.index(asLong(a), asLong(b), order)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertKernel.index((long)$a, (long)$b, $order)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
