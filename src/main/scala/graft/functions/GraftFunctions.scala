package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.{ColumnBridge, FunctionBridge}

/** The graft operator tier as NAMED SQL FUNCTIONS — the
  * `SparkSessionExtensions` surface of the library: a SQL-console
  * user (q115's surface) gets the same deterministic text/dedup/
  * sketch kernels the DataFrame entries use, by name, with no UDF
  * anywhere — every builder returns the SAME Catalyst expression tree
  * the Column helpers build, so codegen, predicate behavior, and the
  * DuckDB-oracle determinism story carry over verbatim.
  *
  * Two installation paths, same builders:
  *  - session construction: `.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.functions.GraftExtensions` — the
  *    idiomatic deployment;
  *  - a running session: [[GraftFunctions.register]] (idempotent),
  *    used by the q158 entry because the driver owns session
  *    construction.
  */
object GraftFunctions {
  // toCatalyst, not ColumnBridge.expression: a registry builder must
  // return a tree of REAL catalyst nodes (see FunctionBridge.toCatalyst)
  private def ex(c: Column): Expression = FunctionBridge.toCatalyst(c)
  private def cc(e: Expression): Column = ColumnBridge.column(e)

  type FnDesc = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def unary(name: String)(f: Column => Column): FnDesc =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getName, name),
      es => {
        require(es.length == 1, s"$name expects exactly 1 argument")
        ex(f(cc(es.head)))
      })

  /** Every registered function. Scalars compose the canonical Column
    * helpers; the aggregate registers the native
    * [[graft.expressions.KmvMinK]] buffer (the analyzer wraps a bare
    * AggregateFunction returned from a builder, exactly as for
    * built-ins). */
  val all: Seq[FnDesc] = Seq(
    // graft_fingerprint(text): md5 of the canonical (lowercased,
    // whitespace-collapsed) form — the exact-dedup key
    unary("graft_fingerprint")(TextFns.fingerprint),
    // graft_quality(text): composite Gopher/C4-style score in [0,1]
    unary("graft_quality")(TextFns.qualityScore),
    // graft_lang_guess(text): script-heuristic language id
    unary("graft_lang_guess")(TextFns.langGuess),
    // graft_hash60(str): the portable 60-bit md5 hash every
    // deterministic sketch in the tier is built on
    unary("graft_hash60")(DedupFns.portableHash60),
    // quant tier (r13 ask #6): the §2.5 trailing-window w-ops by
    // name, applied to a `collect_list(x) OVER w` array built in SQL
    // text — the SAME array-form kernels the TsOps WindowSpec helpers
    // delegate to, so a SQL-console alpha formula and the DataFrame
    // factor engine share one Catalyst subtree (parity pinned in
    // GraftFunctionsSpec; q162 runs an Alpha formula in pure SQL)
    unary("graft_ts_rank")(graft.ops.TsOps.tsRankArr),
    unary("graft_ts_argmax")(graft.ops.TsOps.tsArgMaxArr),
    unary("graft_decay_linear")(graft.ops.TsOps.decayLinearArr),
    // graft_kmv_min_k(hash, k): bottom-k KMV distinct sketch (array
    // of the k smallest distinct values); k must be a literal
    (FunctionIdentifier("graft_kmv_min_k"),
      new ExpressionInfo(GraftFunctions.getClass.getName, "graft_kmv_min_k"),
      es => {
        require(es.length == 2 && es(1).foldable,
          "graft_kmv_min_k(x, k) requires a literal k")
        val k = es(1).eval() match {
          case i: java.lang.Integer => i.intValue
          case l: java.lang.Long => l.intValue
          case other => throw new IllegalArgumentException(
            s"graft_kmv_min_k: k must be an integer literal, got $other")
        }
        graft.expressions.KmvMinK(es.head, k)
      }),
    // graft_kmv_estimate(n_mins, kth_min, k): the ONE estimator
    // definition ([[SketchFns.kmvEstimate]]) as a named function —
    // q158 consumes it from SQL text, collapsing the inline
    // estimator duplication (r13 ask #8): an arithmetic fix lands on
    // the DataFrame entries and the SQL console at once
    (FunctionIdentifier("graft_kmv_estimate"),
      new ExpressionInfo(GraftFunctions.getClass.getName, "graft_kmv_estimate"),
      es => {
        require(es.length == 3,
          "graft_kmv_estimate(n_mins, kth_min, k) expects exactly 3 arguments")
        ex(SketchFns.kmvEstimate(cc(es(0)), cc(es(1)), cc(es(2))))
      }))

  /** Install (or re-install) every function on a running session. */
  def register(s: SparkSession): Unit =
    all.foreach { case (id, info, b) =>
      FunctionBridge.registerFunction(s, id, info, b)
    }
}

/** `spark.sql.extensions` entry point (see [[GraftFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(e.injectFunction)
}
