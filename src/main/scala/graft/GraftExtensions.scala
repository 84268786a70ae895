package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CanonicalPkExpr, CosineSimExpr, TopKByScore}

/** SQL surface for the library's custom Catalyst expressions.
  *
  * Two wiring paths, same function list:
  *
  *  - session config (cluster-wide, no code):
  *    `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - an already-running session: `GraftFunctions.register(spark)`
  *
  * Registered functions:
  *  - `graft_canonical_pk(col, ...)` → binary canonical PK encoding
  *    (zero-stripped, length-prefixed composite — byte parity with the
  *    reference's ByteArray semantics; reference util/ByteArray.java)
  *  - `graft_cosine(a, b)` → fused single-pass cosine similarity over
  *    two array<double> columns
  *  - `graft_top_k(struct(score, id), k)` → aggregate: top k entries
  *    by (score desc, id asc) as array<struct<id, score>>, reduced via
  *    per-partition partial buffers (map-side combinable)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // partition-aligned union (durable delta-chain composition) + its
    // per-child Filter/Project pushdown
    ext.injectPlannerStrategy(_ => graft.plans.BucketUnionStrategy)
    ext.injectOptimizerRule(_ => graft.plans.BucketUnionPushdown)
  }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  private def info(name: String, clazz: Class[_], usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  val all: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_canonical_pk",
      info("graft_canonical_pk", classOf[CanonicalPkExpr],
        "graft_canonical_pk(col, ...) - canonical binary PK encoding"),
      (es: Seq[Expression]) => {
        require(es.nonEmpty, "graft_canonical_pk needs at least one argument")
        CanonicalPkExpr(es)
      }),
    ("graft_cosine",
      info("graft_cosine", classOf[CosineSimExpr],
        "graft_cosine(a, b) - cosine similarity of two array<double>"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "graft_cosine(a, b) needs exactly two arguments")
        CosineSimExpr(es.head, es(1))
      }),
    ("graft_top_k",
      info("graft_top_k", classOf[TopKByScore],
        "graft_top_k(struct(score, id), k) - top-k by (score desc, id asc)"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "graft_top_k(input, k) needs exactly two arguments")
        val k = es(1) match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"graft_top_k's k must be an integer literal, got $other")
        }
        // returned unwrapped: the analyzer wraps AggregateFunctions in
        // an AggregateExpression, as for every built-in aggregate
        TopKByScore(es.head, k)
      }))

  /** Register every graft SQL function on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, i, b) =>
      org.apache.spark.sql.graftbridge.FunctionRegistryBridge
        .register(spark, name, i, b)
    }
}
