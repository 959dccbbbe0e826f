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

  /** All hyperplane-LSH table keys in ONE fused pass: bit b of key t is
    * sign(vec · plane[t*planesPerTable+b]), result = array<int> of one
    * key per table (posexplode → (tbl, bucket)).
    *
    * Why an expression and not `tables × planes` [[VectorDot]]s: a
    * projection holding 48 inlined dot loops generates a method past
    * HotSpot's JIT bytecode threshold, so the hot path runs INTERPRETED
    * (measured ~10× wall on the sf1 corpus). Here the plane matrix is
    * a codegen REFERENCE object (never a literal tree) and the
    * generated code is one compact triple loop — small enough to JIT
    * regardless of tables × planes.
    *
    * `planesFlat` is a structural-equality Seq (canonicalization-safe),
    * laid out [(table, plane), dim]; arithmetic is bit-identical to the
    * VectorDot formulation (float elements, double accumulation in
    * index order, key bit set iff dot >= 0 — NaN sets nothing). */
  case class HyperplaneKeys(child: Expression, planesFlat: Seq[Float],
      planesPerTable: Int, dim: Int)
      extends UnaryExpression {
    require(planesPerTable > 0 && dim > 0 &&
      planesFlat.length % (planesPerTable * dim) == 0,
      "planesFlat must hold tables × planesPerTable plane vectors of length dim")

    private val nTables = planesFlat.length / (planesPerTable * dim)
    @transient private lazy val flat: Array[Float] = planesFlat.toArray

    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), dim)
      val keys = new Array[Int](nTables)
      var t = 0
      while (t < nTables) {
        var key = 0
        var b = 0
        while (b < planesPerTable) {
          val off = (t * planesPerTable + b) * dim
          var acc = 0.0
          var i = 0
          while (i < n) { acc += x.getFloat(i).toDouble * flat(off + i).toDouble; i += 1 }
          if (acc >= 0) key |= (1 << b)
          b += 1
        }
        keys(t) = key
        t += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val planesRef = ctx.addReferenceObj("planesFlat", flat, "float[]")
        val keys = ctx.freshName("keys")
        val n = ctx.freshName("n")
        val t = ctx.freshName("t")
        val b = ctx.freshName("b")
        val i = ctx.freshName("i")
        val off = ctx.freshName("off")
        val acc = ctx.freshName("acc")
        val key = ctx.freshName("key")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $dim);
           |int[] $keys = new int[$nTables];
           |for (int $t = 0; $t < $nTables; $t++) {
           |  int $key = 0;
           |  for (int $b = 0; $b < $planesPerTable; $b++) {
           |    int $off = ($t * $planesPerTable + $b) * $dim;
           |    double $acc = 0.0;
           |    for (int $i = 0; $i < $n; $i++) {
           |      $acc += (double) $a.getFloat($i) * (double) $planesRef[$off + $i];
           |    }
           |    if ($acc >= 0.0) $key |= (1 << $b);
           |  }
           |  $keys[$t] = $key;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def vectorDot(a: Column, b: Column): Column = column(VectorDot(expression(a), expression(b)))
  def vectorSq(a: Column): Column = column(VectorSq(expression(a)))
  def hyperplaneKeys(vec: Column, planesFlat: Seq[Float],
      planesPerTable: Int, dim: Int): Column =
    column(HyperplaneKeys(expression(vec), planesFlat, planesPerTable, dim))

  /** Cosine similarity with one fused dot + two fused norms. */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vectorDot(a, b) / (sqrt(vectorSq(a)) * sqrt(vectorSq(b)))
  }
}
