package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Expressions, InferType}

/** SQL-surface registration for graft's custom functions, usable two ways:
  *
  *   - new sessions: `.withExtensions(new GraftExtensions)` or
  *     `spark.sql.extensions=graft.GraftExtensions`
  *   - existing sessions: `GraftExtensions.register(spark)`
  *
  * Registered functions:
  *   - `hk_infer_type(str)`       — reference's value-string type inference
  *   - `graft_fingerprint(arr)`   — 64-bit polynomial document fingerprint
  *   - `graft_simhash64(arr)`     — 64-bit SimHash over token-hash longs
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // rank-filter → bounded-heap rewrite (graft.plans.BoundedRankRewrite):
    // injected into the operator-optimization batch, so the rewritten
    // aggregate/generate subtree still gets column pruning etc.
    ext.injectOptimizerRule(_ => graft.plans.BoundedRankRewrite)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(
      "graft.GraftExtensions", null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def unary(name: String)(f: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(e) => f(e)
    case exprs =>
      throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${exprs.length}")
  }

  private def intLit(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$name expects a literal int argument, got $other")
  }

  private[graft] val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "hk_infer_type",
      info("hk_infer_type", "hk_infer_type(str) - HealthKit SQL type for a value string"),
      unary("hk_infer_type")(InferType.inferTypeExpr)
    ),
    (
      "graft_fingerprint",
      info("graft_fingerprint", "graft_fingerprint(array<string>) - 64-bit rolling-hash fingerprint"),
      unary("graft_fingerprint")(Expressions.PolyFingerprint(_))
    ),
    (
      "graft_simhash64",
      info("graft_simhash64", "graft_simhash64(array<bigint>) - 64-bit simhash"),
      unary("graft_simhash64")(Expressions.SimHash64(_))
    ),
    (
      "graft_dot",
      info("graft_dot", "graft_dot(array<double>, array<double>) - codegen'd left-fold dot product"),
      (exprs: Seq[Expression]) =>
        exprs match {
          case Seq(a, b) => Expressions.DotProduct(a, b)
          case other =>
            throw new IllegalArgumentException(
              s"graft_dot expects exactly 2 arguments, got ${other.length}")
        }
    ),
    (
      "graft_l2norm",
      info("graft_l2norm", "graft_l2norm(array<double>) - codegen'd L2 norm"),
      unary("graft_l2norm")(Expressions.L2Norm(_))
    ),
    (
      "graft_top2gram",
      info("graft_top2gram", "graft_top2gram(array<string>) - most-frequent-2-gram count (compiled)"),
      unary("graft_top2gram")(Expressions.Top2GramCount(_))
    ),
    (
      "graft_int8_summary",
      info(
        "graft_int8_summary",
        "graft_int8_summary(array<double>) - int8 max-abs quantization summaries (q_min, q_max, q_sum, q_sumsq)"),
      unary("graft_int8_summary")(Expressions.Int8QuantSummary(_))
    ),
    (
      "graft_winnow",
      info(
        "graft_winnow",
        "graft_winnow(array<string>, k, w) - winnowing fingerprints (pos, fp) over token k-grams"),
      (exprs: Seq[Expression]) =>
        exprs match {
          case Seq(toks, k, w) =>
            Expressions.WinnowFps(toks, intLit("graft_winnow", k), intLit("graft_winnow", w))
          case other =>
            throw new IllegalArgumentException(
              s"graft_winnow expects exactly 3 arguments, got ${other.length}")
        }
    ),
    (
      "graft_grams",
      info(
        "graft_grams",
        "graft_grams(array<string>, n) - distinct xxhash64 token n-grams (compiled)"),
      (exprs: Seq[Expression]) =>
        exprs match {
          case Seq(toks, n) => Expressions.HashedGrams(toks, intLit("graft_grams", n))
          case other =>
            throw new IllegalArgumentException(
              s"graft_grams expects exactly 2 arguments, got ${other.length}")
        }
    ),
    (
      "graft_minhash",
      info(
        "graft_minhash",
        "graft_minhash(array<bigint>, k) - k MinHash signature minima in one pass"),
      (exprs: Seq[Expression]) =>
        exprs match {
          case Seq(bh, k) => Expressions.MinHashSignatures(bh, intLit("graft_minhash", k))
          case other =>
            throw new IllegalArgumentException(
              s"graft_minhash expects exactly 2 arguments, got ${other.length}")
        }
    ),
    (
      // SQLite-compat alias so the reference README's example queries run
      // verbatim (json_extract(col, '$.path') ≡ get_json_object).
      "json_extract",
      info("json_extract", "json_extract(json, path) - SQLite-compatible JSON path extraction"),
      (exprs: Seq[Expression]) =>
        exprs match {
          case Seq(json, path) =>
            org.apache.spark.sql.catalyst.expressions.GetJsonObject(json, path)
          case other =>
            throw new IllegalArgumentException(
              s"json_extract expects exactly 2 arguments, got ${other.length}")
        }
    )
  )

  /** Register on an already-built session (extensions normally bind at
    * builder time). The optimizer rule lands in
    * `spark.experimental.extraOptimizations` here — a late batch, so the
    * rewritten subtree skips column pruning (the builder-time
    * `injectOptimizerRule` path doesn't); prefer `.withExtensions` for
    * new sessions.
    */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BoundedRankRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BoundedRankRewrite
  }
}
