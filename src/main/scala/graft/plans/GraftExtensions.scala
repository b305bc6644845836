package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotFold, MoneyParse, VersionCmp}

/** SparkSessionExtensions entry point: injects the engine's custom Catalyst
  * functions into any session built with
  * `.withExtensions(new GraftExtensions)` or launched with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` — the
  * deployment-grade registration path (GraftFunctions.register covers
  * already-running sessions).
  *
  * No planner strategies or optimizer rules are injected by design: every
  * operator in SURVEY.md §2 plans onto standard physical shapes
  * (broadcast/sort-merge joins, hash aggregates, windows), so a custom
  * Strategy would only duplicate Catalyst (SURVEY.md §4). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("money_parse"),
      new ExpressionInfo(classOf[MoneyParse].getName, "money_parse"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MoneyParse(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("version_cmp"),
      new ExpressionInfo(classOf[VersionCmp].getName, "version_cmp"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VersionCmp(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_fold"),
      new ExpressionInfo(classOf[DotFold].getName, "dot_fold"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotFold(exprs(0), exprs(1), zeroNulls = false)))
  }
}
