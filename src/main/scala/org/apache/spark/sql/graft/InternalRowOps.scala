package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Internal-row pass-through for the streamed prefix-sum operators
  * (optimization round 18). The pack family's `mapPartitions` ran on
  * EXTERNAL `Row`s (`Encoders.row`): every column of every row —
  * including the document text payload — paid a
  * deserialize-to-external / serialize-back round-trip just so a
  * running long could be appended. This bridge maps partitions over
  * the operator's own `InternalRow`s (the cached columnar scan's
  * output) and appends the computed longs with one `UnsafeProjection`
  * per partition — no external object materializes, no per-column
  * codec. Lives under `org.apache.spark.sql` by design (the
  * [[ColumnBridge]] pattern) because `internalCreateDataFrame` is
  * `private[sql]`.
  *
  * Contract: `make()` is invoked once per partition and returns the
  * stateful row → appended-longs function; input rows may be reused
  * buffers (the standard InternalRow iterator contract), so the
  * function must not retain references across rows — copy any value it
  * carries over (the callers convert carried stratum keys to external
  * Scala values, which copies). */
object InternalRowOps {

  def appendLongs(df: DataFrame, names: Seq[String])(
      make: () => InternalRow => Array[Long]): DataFrame = {
    val outSchema = StructType(df.schema.fields ++
      names.map(StructField(_, LongType, nullable = false)))
    val n = names.length
    val rdd = df.queryExecution.toRdd.mapPartitions { it =>
      val f = make()
      val proj = UnsafeProjection.create(outSchema)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(n)
      it.map { row =>
        val vals = f(row)
        var i = 0
        while (i < n) { extra.update(i, vals(i)); i += 1 }
        proj(joined(row, extra)): InternalRow
      }
    }
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, outSchema)
  }
}
