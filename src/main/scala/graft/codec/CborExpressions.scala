package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions over the dag-cbor codec (T1/U7) — the
  * Expression-tier alternative to the registered UDFs. SQL semantics:
  * null in → null out, non-matching CBOR shape → null (dead-letter,
  * consistent with the ingest policy), instead of the UDF's throw.
  * CodegenFallback is appropriate here: the decode is branchy byte
  * work with no profitable codegen form, and it sits on the narrow
  * ingest map, not in any analytical hot loop. */
object CborExpressions {

  /** base64(CBOR uint/negint) → long, else null. */
  case class CborLong(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(v: Any): Any =
      try DagCbor.decodeBase64(v.asInstanceOf[UTF8String].toString) match {
        case DagCbor.IntVal(l) => l
        case _ => null
      } catch { case _: Exception => null }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** base64(CBOR tag-42 CID) → canonical base32 string, else null. */
  case class CborCid(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def nullSafeEval(v: Any): Any =
      try DagCbor.decodeBase64(v.asInstanceOf[UTF8String].toString) match {
        case DagCbor.CidVal(s) => UTF8String.fromString(s)
        case _ => null
      } catch { case _: Exception => null }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def cborLong(c: Column): Column = column(CborLong(expression(c)))
  def cborCid(c: Column): Column = column(CborCid(expression(c)))
}
