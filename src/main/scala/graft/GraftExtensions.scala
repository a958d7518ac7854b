package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProduct, EditDistanceCapped, EditDistanceLe1, UnicodeNormalize}

/** Spark-native installation point: registers graft's custom codegen'd
  * Catalyst expressions as plain SQL functions, so a cluster that sets
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * can call them from `spark.sql(...)`, views, and any SQL-speaking
  * client — no Scala imports, no UDF registration, full codegen (these
  * are the same Expression classes the DataFrame operators mount, not
  * UDF wrappers). The functions:
  *
  *   graft_normalize(str, form)        — Unicode normalization (NFC,
  *                                       NFD, NFKC, NFKD, NFKCCaseFold)
  *   graft_edit_distance(a, b, cap)    — banded Levenshtein, cost
  *                                       capped at `cap` (returns
  *                                       cap+1 when exceeded)
  *   graft_edit_distance_le1(a, b)     — min(distance, 2), one O(n) pass
  *   graft_dot(vec_a, vec_b)           — double-array dot product
  *
  * Literal-argument extraction mirrors Spark's own builders: the
  * normalization form and the distance cap must be foldable literals,
  * with loud errors otherwise.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Number, _) => v.intValue
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** The single source of truth both installation paths share. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_normalize"),
      info("graft_normalize", "graft_normalize(str, form) - Unicode normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_normalize(str, form)")
        UnicodeNormalize(args.head, strLit(args(1), "normalization form"))
      }),
    (FunctionIdentifier("graft_edit_distance"),
      info("graft_edit_distance",
        "graft_edit_distance(a, b, cap) - capped Levenshtein"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_edit_distance(a, b, cap)")
        EditDistanceCapped(args.head, args(1), intLit(args(2), "cap"))
      }),
    (FunctionIdentifier("graft_edit_distance_le1"),
      info("graft_edit_distance_le1",
        "graft_edit_distance_le1(a, b) - min(Levenshtein(a, b), 2) in one O(n) pass"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_edit_distance_le1(a, b)")
        EditDistanceLe1(args.head, args(1))
      }),
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double-array dot product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b)")
        DotProduct(args.head, args(1))
      }))

  /** Register into an ALREADY-RUNNING session (the extensions conf is
    * builder-time only). Same triples, so behavior is identical to the
    * `spark.sql.extensions` path.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
