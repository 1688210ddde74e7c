package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  Add, Alias, ArrayAggregate, Attribute, CurrentRow, EqualTo, Expression,
  ExpressionInfo, LambdaFunction, LessThan, LessThanOrEqual, Literal,
  Multiply, NamedLambdaVariable, RowFrame, RowNumber, SpecifiedWindowFrame,
  UnboundedPreceding, WindowExpression, WindowSpecDefinition, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
import graft.functions.DotProduct

/** Catalyst optimizer rule: rewrite the declarative higher-order-function
  * dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
  *
  * into the codegen'd [[graft.functions.DotProduct]] expression. The HOF
  * form is what a user writes naturally in SQL; it evaluates interpreted
  * (no whole-stage codegen) and allocates the zipped array per row — on an
  * O(|pairs|) similarity join that interpretation dominates the query.
  * On equal-length arrays of non-null doubles the rewrite is
  * bit-identical: DotProduct runs the same fixed left fold
  * ((0+p0)+p1)+… . The rule therefore only fires on
  * `array<double> NOT NULL`-element inputs (containsNull=false — e.g. any
  * array built by transform/cast of a non-null source). Known deviation,
  * engine-defined: on UNEQUAL lengths the HOF form null-pads and returns
  * NULL, DotProduct folds the common prefix; vector columns are
  * fixed-dimension so the case is degenerate, and callers needing strict
  * NULL propagation keep it by disabling the rule
  * (spark.sql.optimizer.excludedRules).
  *
  * This is the (c) extension path of the engine design: optimizations that
  * need engine internals go through SparkSessionExtensions as proper
  * Catalyst rules, not through wrappers users must remember to call.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def sameVars(body: (NamedLambdaVariable, NamedLambdaVariable),
                       args: Seq[NamedLambdaVariable]): Boolean =
    args.length == 2 &&
      ((body._1.exprId == args(0).exprId && body._2.exprId == args(1).exprId) ||
       (body._1.exprId == args(1).exprId && body._2.exprId == args(0).exprId))

  private def isArrayOfDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  private object ProductLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable,
          y: NamedLambdaVariable, _), args, _) =>
        sameVars((x, y), args.collect { case v: NamedLambdaVariable => v })
      case _ => false
    }
  }

  private object SumLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(a: NamedLambdaVariable,
          b: NamedLambdaVariable, _), args, _) =>
        sameVars((a, b), args.collect { case v: NamedLambdaVariable => v })
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        v.exprId == arg.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, ProductLambda()),
            Literal(0.0, DoubleType),
            SumLambda(),
            IdentityFinish())
          if isArrayOfDouble(a) && isArrayOfDouble(b) =>
        DotProduct(a, b)
    }
}

/** Catalyst optimizer rule: rewrite the ubiquitous per-key top-k window
  * idiom
  *
  *   SELECT <cols ⊆ input> FROM
  *     (SELECT *, row_number() OVER (PARTITION BY p ORDER BY o) rn ...)
  *   WHERE rn <= k
  *
  * into [[graft.plans.TopKPerKeyNode]] (partial→final bounded per-key
  * heaps). The window plan SORTS every partition's full row set after a
  * full-data shuffle and then discards all but k rows per key; the heap
  * form ships at most k rows per (key, map task) into the exchange and
  * never sorts — the shape that survives a 100 TB fact input. The rule
  * fires only when the rewrite is provably transparent:
  *
  *  - the rank function is row_number (rank/dense_rank can retain more
  *    than k rows on ties);
  *  - the Window computes NOTHING but that one row_number (any sibling
  *    window expression still needs the window);
  *  - the rank is used ONLY by the `<= k` / `< k+1` / `= 1` filter — the
  *    projection above references input columns exclusively, so no
  *    downstream consumer needs the rank value (this Project is exactly
  *    what ColumnPruning leaves when the rank is filter-only);
  *  - the partition spec is non-empty (a global top-k is a different
  *    physical problem — Spark's own TakeOrderedAndProject).
  *
  * Row selection is identical whenever the window order is total (the
  * engine's convention — every query tie-breaks on a unique key); with a
  * non-total order both forms keep an arbitrary representative, so the
  * rewrite stays within the idiom's contract. The 170-query DuckDB oracle
  * gate runs with this rule active — hash-equality across the suite is
  * the transparency proof. Disable via spark.sql.optimizer.excludedRules
  * = graft.plans.RewriteWindowTopK. */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  private object RankLimit {
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(k: Int, IntegerType)) if k == 1 =>
        Some((a, 1))
      case _ => None
    }
  }

  private object RowNumberOverKeys {
    def unapply(e: Expression): Option[(Seq[Expression], Seq[org.apache.spark.sql.catalyst.expressions.SortOrder])] =
      e match {
        case Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(parts, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
            _) if parts.nonEmpty => Some((parts, order))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(plist,
        Filter(RankLimit(rn, k),
          Window(Seq(al @ RowNumberOverKeys(parts, order)), _, _, child, _)))
        if k > 0 &&
          al.asInstanceOf[Alias].toAttribute.semanticEquals(rn) &&
          plist.forall(_.references.subsetOf(child.outputSet)) =>
      Project(plist, graft.plans.TopKPerKeyNode(parts, order, k, child))
  }
}

/** Engine extensions, installed in every graft session via
  * `spark.sql.extensions=graft.plans.GraftExtensions`
  * (see [[graft.sources.Tables.sessionConfigs]]):
  *
  *  - `dot_product(array<double>, array<double>)` as a first-class SQL
  *    function (SQL users get the codegen'd expression directly);
  *  - [[RewriteHofDotProduct]] so the equivalent HOF spelling optimizes
  *    to the same physical form.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))
    // same name and UAX#15 semantics as DuckDB's builtin — SQL text
    // runs unchanged on either engine
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.NfcNormalize].getCanonicalName,
        "nfc_normalize"),
      (args: Seq[Expression]) => graft.functions.NfcNormalize(args.head)))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectOptimizerRule(_ => RewriteWindowTopK)
    // whole-operator path: TopKPerKeyNode plans to partial→final
    // TopKPerKeyExec (bounded per-key heaps, no per-partition sort)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKPerKeyStrategy)
  }
}
