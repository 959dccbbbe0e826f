package graft.codec

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CborExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("expression decode: valid values, shape mismatch → null, garbage → null") {
    val df = Seq(
      ("uint", "GwAAAAgAAAAA"),          // 34359738368
      ("cid", "2CpYKAABgeIDkiAgR4YG+O8RvPGtJY29gurIsQs2sjrcDHTDje72xmhxxCY="),
      ("text", "ZWNsYWlt"),              // text string: neither long nor cid
      ("garbage", "!!!")
    ).toDF("kind", "b64")
      .withColumn("as_long", CborExpressions.cborLong(col("b64")))
      .withColumn("as_cid", CborExpressions.cborCid(col("b64")))
    val rows = df.collect().map(r =>
      r.getString(0) -> ((Option(r.get(2)), Option(r.get(3))))).toMap
    assert(rows("uint") == ((Some(34359738368L), None)))
    assert(rows("cid")._1.isEmpty)
    assert(rows("cid")._2.exists(_.toString.startsWith("baga6ea4seaq")))
    assert(rows("text") == ((None, None)))
    assert(rows("garbage") == ((None, None)))
  }

  test("null propagates") {
    val df = Seq(Option.empty[String]).toDF("b64")
      .withColumn("v", CborExpressions.cborLong(col("b64")))
    assert(df.collect()(0).isNullAt(1))
  }
}
