package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply}

import graft.functions.VectorExpressions.{DotProduct, L2DistanceSq, L2Norm, SortedIntersectCount}

/** SQL-surface registration of the engine's native Catalyst expressions —
  * the `SparkSessionExtensions` integration path for functions Spark lacks
  * (SURVEY §7.3: custom scalar expressions, not custom strategies).
  *
  * Two entry points, same function list:
  *
  *   - config-based: `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (applies at session build — cluster-wide, no code change for users);
  *   - runtime: `GraftFunctions.register(spark)` on an existing session.
  *
  * After either, plain SQL can call `graft_dot`, `graft_l2norm`,
  * `graft_l2distsq`, `graft_cosine` and they stay inside WholeStageCodegen
  * like any built-in (no UDF boxing, no codegen fallback).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[VectorExpressions.type].getName, null, name,
      usage, "", "", "", "", "", "", "built-in")

  private def binary(name: String, f: (Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  /** (name, info, builder) for every engine SQL function. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - sequential-order dot product of two numeric arrays"),
      binary("graft_dot", DotProduct(_, _)) _),
    ("graft_l2norm",
      info("graft_l2norm", "graft_l2norm(a) - L2 norm of a numeric array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_l2norm expects 1 argument, got ${args.length}")
        L2Norm(args.head)
      }),
    ("graft_l2distsq",
      info("graft_l2distsq", "graft_l2distsq(a, b) - squared L2 distance of two numeric arrays"),
      binary("graft_l2distsq", L2DistanceSq(_, _)) _),
    ("graft_cosine",
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two numeric arrays"),
      binary("graft_cosine", (a, b) =>
        Divide(DotProduct(a, b), Multiply(L2Norm(a), L2Norm(b)))) _),
    ("graft_sorted_intersect",
      info("graft_sorted_intersect",
        "graft_sorted_intersect(a, b) - common-element count of two sorted string arrays"),
      binary("graft_sorted_intersect", SortedIntersectCount(_, _)) _),
    ("graft_char_trigrams",
      info("graft_char_trigrams",
        "graft_char_trigrams(s) - all overlapping character trigrams of a string"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_char_trigrams expects 1 argument, got ${args.length}")
        TextExpressions.CharTrigrams(args.head)
      }))

  /** Register every engine function into an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
