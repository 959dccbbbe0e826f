package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The entries-array → ClaimEvent pivot as a NATIVE Catalyst expression
  * (closing ARCHITECTURE §6's last deferred ingest item).
  *
  * The UDF formulation pays a catalyst→Scala conversion per event: the
  * `array<struct>` column is materialized as `Seq[Row]`, each `Value`
  * string copied out, and the result re-encoded — measurable on a
  * 100 TB backfill where every event passes through this map. This
  * expression works directly on `ArrayData`/`UTF8String` and emits one
  * `GenericInternalRow`, and its codegen is a single static call that
  * keeps the ingest projection inside whole-stage codegen (no
  * CodegenFallback stage break).
  *
  * Semantics are identical to the UDF path (reference
  * backend/lib/rpc-service/utils.js:19-53 + service.js:59-85): non-claim
  * `$type`, missing fields, or undecodable CBOR → null (dead-letter).
  */
object ClaimPivot extends Serializable {

  /** ClaimEvent struct — field order matches the case class / UDF. */
  val schema: StructType = StructType(Seq(
    StructField("claimId", LongType, nullable = true),
    StructField("client", LongType, nullable = true),
    StructField("provider", LongType, nullable = true),
    StructField("pieceCid", StringType, nullable = true),
    StructField("pieceSize", LongType, nullable = true),
    StructField("termMin", LongType, nullable = true),
    StructField("termMax", LongType, nullable = true),
    StructField("termStart", LongType, nullable = true),
    StructField("sector", LongType, nullable = true)))

  // field slots in the output row
  private val slots = Map(
    "id" -> 0, "client" -> 1, "provider" -> 2, "pieceCid" -> 3,
    "pieceSize" -> 4, "termMin" -> 5, "termMax" -> 6, "termStart" -> 7,
    "sector" -> 8)
  // kebab-case wire keys → camelCase slots (reference utils.js:27)
  private val wireKeys = Map(
    "id" -> "id", "client" -> "client", "provider" -> "provider",
    "piece-cid" -> "pieceCid", "piece-size" -> "pieceSize",
    "term-min" -> "termMin", "term-max" -> "termMax",
    "term-start" -> "termStart", "sector" -> "sector")

  /** Decode one entries array (struct<Codec,Flags,Key,Value>) to a
    * ClaimEvent InternalRow, or null. Called from generated code. */
  def decode(entries: ArrayData): InternalRow = {
    if (entries == null) return null
    try {
      val out = new Array[Any](9)
      // last-wins like the UDF path (pivotEntries): a later duplicate
      // `$type` entry overwrites an earlier one, so validation happens
      // AFTER the loop; only a non-text `$type` dead-letters immediately
      var lastType: String = null
      var i = 0
      val n = entries.numElements()
      while (i < n) {
        val e = entries.getStruct(i, 4)
        if (e == null) return null
        val key = e.getUTF8String(2).toString
        val b64 = e.getUTF8String(3).toString
        if (key == "$type") {
          DagCbor.decodeBase64(b64) match {
            case DagCbor.TextVal(t) => lastType = t
            case _ => return null
          }
        } else {
          // UNKNOWN keys are decoded and validated too (not skipped):
          // the reference's pivot dead-letters the whole event when any
          // entry value is not an int/CID or fails to decode
          // (utils.js:29-49) — the UDF equivalence spec relies on this.
          val decoded = DagCbor.decodeBase64(b64)
          wireKeys.get(key) match {
            case Some(name) =>
              val slot = slots(name)
              decoded match {
                case DagCbor.IntVal(v) if name != "pieceCid" => out(slot) = v
                case DagCbor.CidVal(s) if name == "pieceCid" =>
                  out(slot) = UTF8String.fromString(s)
                case _ => return null
              }
            case None => decoded match {
              case DagCbor.IntVal(_) | DagCbor.CidVal(_) => () // valid, ignored
              case _ => return null
            }
          }
        }
        i += 1
      }
      if (lastType != "claim") return null
      var s = 0
      while (s < 9) { if (out(s) == null) return null; s += 1 }
      new GenericInternalRow(out)
    } catch {
      case _: Exception => null // dead-letter, same policy as the UDF
    }
  }

  case class DecodeClaimEvent(child: Expression) extends UnaryExpression {
    override def dataType: DataType = schema
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      decode(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val helper = ctx.addReferenceObj("claimPivot", ClaimPivot, "graft.codec.ClaimPivot$")
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $helper.decode($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Column form: `claim_event(entries)`. */
  def decodeClaimEvent(entries: Column): Column =
    column(DecodeClaimEvent(expression(entries)))
}
