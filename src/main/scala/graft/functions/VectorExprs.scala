package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense dot product of two
  * `array<double>` columns.
  *
  * Why a custom Expression (SURVEY.md §2.11 scale note): the composable form
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` is a higher-order function
  * — evaluated interpreted (no whole-stage codegen), allocating an
  * intermediate array per row. On an O(|pairs|) similarity join that
  * interpretation dominates the whole query. This expression generates a
  * tight fused multiply-add loop inside WholeStageCodegen: zero allocation,
  * zero virtual calls per element.
  *
  * Determinism: the accumulation is a FIXED left-to-right sequential fold —
  * bit-identical to the higher-order form it replaces ((0+p0)+p1)+… — so
  * results are independent of partitioning and match the DuckDB oracle's
  * list_reduce exactly.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |int ${ev.value}_n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double ${ev.value}_s = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_s += $x.getDouble(${ev.value}_i) * $y.getDouble(${ev.value}_i);
         |}
         |${ev.value} = ${ev.value}_s;
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: binary-search lower bound over a SORTED
  * ascending `array<double>` — the smallest element ≥ the probe value,
  * NULL when every element is smaller.
  *
  * Why a custom Expression: the composable form
  * `array_min(filter(arr, x -> x >= v))` is a higher-order function —
  * HOFs are `CodegenFallback`, so every probing row drops the enclosing
  * projection out of whole-stage codegen AND allocates a filtered array,
  * then scans it linearly. On a bin-assignment pass probing |rows| ×
  * |features| times (GiniStump's hot path), that interpretation dominates
  * the stage. This expression is an O(log n) branch-free-ish search
  * inside WholeStageCodegen: zero allocation, zero virtual calls.
  *
  * PRECONDITIONS (callers must guarantee, as GiniStump does via
  * `sort_array(collect_list(...))`): elements sorted ascending, no null
  * elements, probe never NaN. Result is then bit-identical to the HOF
  * form and to DuckDB's `list_min(list_filter(...))`.
  */
case class LowerBound(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lower_bound requires (array<double>, double), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "lower_bound"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[Double]
    val n = arr.numElements()
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getDouble(mid) >= v) hi = mid else lo = mid + 1
    }
    if (lo == n) null else java.lang.Double.valueOf(arr.getDouble(lo))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, v) =>
      s"""
         |int ${ev.value}_n = $arr.numElements();
         |int ${ev.value}_lo = 0;
         |int ${ev.value}_hi = ${ev.value}_n;
         |while (${ev.value}_lo < ${ev.value}_hi) {
         |  int ${ev.value}_mid = (${ev.value}_lo + ${ev.value}_hi) >>> 1;
         |  if ($arr.getDouble(${ev.value}_mid) >= $v) {
         |    ${ev.value}_hi = ${ev.value}_mid;
         |  } else {
         |    ${ev.value}_lo = ${ev.value}_mid + 1;
         |  }
         |}
         |if (${ev.value}_lo == ${ev.value}_n) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $arr.getDouble(${ev.value}_lo);
         |}
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LowerBound =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column wrapper: codegen'd dense dot product. */
  def dotp(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  /** Column wrapper: codegen'd sorted-array lower bound (≥ probe, else
    * NULL). See [[LowerBound]] for the sortedness precondition. */
  def lowerBound(sortedArr: Column, v: Column): Column =
    bridge.column(LowerBound(bridge.expression(sortedArr), bridge.expression(v)))
}
