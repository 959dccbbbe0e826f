package graft.functions

import graft.ops.TextAnalysis
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, Multiply, ScalaUDF, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.ColumnBridge

/** The engine's scalar-function surface, registered for `spark.sql` so
  * every capability is reachable from SQL as well as the DataFrame API.
  *
  *   epoch_to_timestamp / timestamp_to_epoch  — U1/U2 column algebra
  *   cbor_decode_long / cbor_decode_cid       — T1/U7 dag-cbor codec
  *   graft_language_id / graft_fingerprint64  — text analysis
  *   vector_dot / vector_sq / cosine_sim      — native embedding math
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    EpochFunctions.register(spark)

    // native expressions (null on non-matching shape, dead-letter style)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cbor_decode_long", exprs => graft.codec.CborExpressions.CborLong(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cbor_decode_cid", exprs => graft.codec.CborExpressions.CborCid(exprs.head), "scala_udf")
    spark.udf.register("graft_language_id",
      (s: String) => TextAnalysis.detectLanguage(s))
    spark.udf.register("graft_fingerprint64",
      (s: String) => if (s == null) null else Long.box(TextAnalysis.fingerprint64(s)))

    // native expressions registered straight into the function registry
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorExpressions.VectorDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_sq", exprs => VectorExpressions.VectorSq(exprs.head), "scala_udf")
    // dot truncates to the shorter array; norms run over each FULL
    // array — exactly VectorDot/VectorSq semantics, so the optimizer
    // rewrite below is bit-identical for ANY input lengths (a norms-
    // over-min variant would silently diverge from the native tree on
    // ragged input)
    spark.udf.register("cosine_sim", (a: Seq[Float], b: Seq[Float]) => {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      i = 0
      while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      i = 0
      while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    })

    // PII scrub for SQL users: expands to the SAME codegen'd
    // regexp_replace chain as TextAnalysis.scrubPii — an expression
    // registration, not a UDF, so it stays inside whole-stage codegen.
    // Optional second arg = min digit-run length (default 4), required
    // to be a literal (it parameterizes the PATTERN, not the row).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "scrub_pii", exprs => {
        import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
        if (exprs.isEmpty || exprs.length > 2) throw new IllegalArgumentException(
          s"scrub_pii takes (text[, minDigitRun literal]), got ${exprs.length} arguments")
        val minRun = exprs.lift(1) match {
          case None => 4
          case Some(Literal(v: Int, _)) => v
          case Some(other) => throw new IllegalArgumentException(
            s"scrub_pii's second argument must be an integer literal, got $other")
        }
        // the chain comes from TextAnalysis — one source of truth, so
        // the SQL and DataFrame surfaces cannot drift
        TextAnalysis.piiPatternChain(minRun).foldLeft(exprs.head) {
          case (e, (pattern, mask)) =>
            RegExpReplace(e, Literal(pattern), Literal(mask))
        }
      }, "scala_udf")

    // de-UDF rewrite active even without spark.sql.extensions wiring
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[ReplaceCosineUdf.type]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ReplaceCosineUdf
  }
}

/** Optimizer rule: rewrite the black-box `cosine_sim` ScalaUDF into the
  * native codegen'd expression tree
  * `vector_dot(a,b) / sqrt(vector_sq(a) * vector_sq(b))`.
  *
  * A ScalaUDF is an optimization barrier — un-codegen'd (per-row
  * serialization into Scala), opaque to constant folding, and a
  * whole-stage-codegen fence. The rewrite keeps the whole projection
  * inside one codegen span and is numerically IDENTICAL: both sides
  * compute the same double accumulations in index order (VectorDot /
  * VectorSq loop exactly like the UDF body), and IEEE division-by-zero
  * semantics match because doubles never throw under ANSI.
  *
  * This is the preference ladder from the survey made executable:
  * users write the obvious UDF call in SQL; the plan runs the native
  * expression. (SURVEY §2.10/§4 — custom Rule[LogicalPlan] via
  * SparkSessionExtensions or `experimental.extraOptimizations`.)
  *
  * Edge parity: an all-zero vector yields NaN on both paths (pinned
  * explicitly — legacy Divide would return NULL). NULL input is the
  * one deliberate divergence: the UDF NPEs the task, the native tree
  * returns NULL (dead-letter semantics, strictly better). */
object ReplaceCosineUdf extends Rule[LogicalPlan] {
  private def rewrite(a: Expression, b: Expression): Expression = {
    // sqrt(na) * sqrt(nb), NOT sqrt(na*nb): the two differ by an ulp on
    // some inputs and the rewrite must be bit-identical to the UDF body.
    // A zero divisor (an all-zero vector) forces dot = 0, and the UDF's
    // IEEE 0.0/0.0 is NaN — but Catalyst's legacy Divide returns NULL
    // on ANY zero divisor, so that case is pinned to NaN explicitly
    // (ANSI Divide would error; both differ from the UDF).
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, If, Literal}
    val divisor =
      Multiply(Sqrt(VectorExpressions.VectorSq(a)), Sqrt(VectorExpressions.VectorSq(b)))
    If(EqualTo(divisor, Literal(0.0)),
      Literal(Double.NaN),
      Divide(VectorExpressions.VectorDot(a, b), divisor,
        evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case udf: ScalaUDF if udf.udfName.contains("cosine_sim") && udf.children.size == 2 =>
      rewrite(udf.children(0), udf.children(1))
  }
}

/** Session extensions: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VectorExpressions.VectorDot].getName, "vector_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExpressions.VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vector_sq"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VectorExpressions.VectorSq].getName, "vector_sq"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExpressions.VectorSq(exprs.head)))
    ext.injectOptimizerRule(_ => ReplaceCosineUdf)
  }
}
