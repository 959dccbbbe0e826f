package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * evaluates a lambda per element through the interpreter — fine for
  * correctness, ~10× too slow in the ANN hot path. These are proper
  * codegen'd expressions: one fused loop over the two float arrays, no
  * per-element closures, whole-stage-codegen friendly.
  *
  * Summation is sequential in index order in both the interpreted and
  * generated paths — bit-identical to the HOF formulation and to
  * DuckDB's list arithmetic, so oracle hash-matching is preserved.
  */
object VectorExpressions {

  /** dot(a, b) over array<float> in double precision. */
  case class VectorDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double ${ev.value}Acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value}Acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = ${ev.value}Acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** sum(a[i]^2) over array<float> in double precision (norm = sqrt). */
  case class VectorSq(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = DoubleType

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < x.numElements()) {
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val v = ctx.freshName("v")
        s"""
           |double ${ev.value}Acc = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = (double) $a.getFloat($i);
           |  ${ev.value}Acc += $v * $v;
           |}
           |${ev.value} = ${ev.value}Acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def vectorDot(a: Column, b: Column): Column = column(VectorDot(expression(a), expression(b)))
  def vectorSq(a: Column): Column = column(VectorSq(expression(a)))

  /** Cosine similarity with one fused dot + two fused norms. */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vectorDot(a, b) / (sqrt(vectorSq(a)) * sqrt(vectorSq(b)))
  }
}
