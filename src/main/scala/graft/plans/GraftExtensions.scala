package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{AsciiPolyHash, ShingleSids, VecDot}

/**
 * Session extension registering the engine's custom Catalyst expressions
 * as SQL functions, so `spark.sql("SELECT vec_dot(a, b) ...")` works and
 * the kernels compose with the whole SQL surface:
 *
 *   - `vec_dot(a, b)`          — codegen'd sequential-fold dot product
 *   - `ascii_poly_hash(s, m, p)` — rolling polynomial string hash
 *   - `shingle_sids(toks, k)`  — fused token-fingerprint → k-shingle ids
 *
 * Wire up with
 * `SparkSession.builder().withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.plans.GraftExtensions`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    // Range joins: plan `lo <= p AND p <= hi` as the bucketed equi-join
    // instead of BroadcastNestedLoopJoin (see RewriteIntervalJoin).
    ext.injectOptimizerRule(_ => RewriteIntervalJoin())
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      /* arguments */ "", /* examples */ "", /* note */ "",
      /* group */ "misc_funcs", /* since */ "", /* deprecated */ "",
      /* source */ "built-in")

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case other => throw new IllegalArgumentException(s"$what must be a literal int, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential-fold dot product of two numeric arrays"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))),
    (FunctionIdentifier("ascii_poly_hash"),
      info("ascii_poly_hash",
        "ascii_poly_hash(s, mult, mod) - rolling polynomial hash over the bytes of s"),
      (children: Seq[Expression]) =>
        AsciiPolyHash(children(0),
          longArg(children(1), "mult"), longArg(children(2), "mod"))),
    (FunctionIdentifier("shingle_sids"),
      info("shingle_sids",
        "shingle_sids(tokens, k) - fingerprints tokens and returns k-shingle ids"),
      (children: Seq[Expression]) =>
        ShingleSids(children(0), longArg(children(1), "k").toInt)))

  /** Register on an already-running session (extensions normally apply
    * only at session construction via `spark.sql.extensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, i, b) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, id, i, b)
    }
}
