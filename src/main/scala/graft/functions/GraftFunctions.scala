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
