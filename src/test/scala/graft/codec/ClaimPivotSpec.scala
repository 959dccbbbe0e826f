package graft.codec

import graft.{SparkSpec, TestSpark}
import graft.model.RawActorEvent
import org.apache.spark.sql.functions._

/** The native ClaimPivot expression vs the UDF reference formulation:
  * identical output on the full golden fixture AND on garbage. */
class ClaimPivotSpec extends SparkSpec {

  lazy val raw = spark.read.schema(RawActorEvent.schema)
    .json(s"${TestSpark.fixtures}/rawActorEvents.json")

  test("native expression decodes the fixture identically to the UDF") {
    val native = raw.withColumn("event", ClaimPivot.decodeClaimEvent(col("entries")))
      .filter(col("event").isNotNull)
    val viaUdf = raw.withColumn("event", EventCodec.decodeClaimUdf(col("entries")))
      .filter(col("event").isNotNull)
    assert(native.count() == 360)
    val a = native.select("height", "event.*").orderBy("height", "claimId").collect()
    val b = viaUdf.select("height", "event.*").orderBy("height", "claimId").collect()
    assert(a.toSeq == b.toSeq)
    // spot-check decoded values against the raw CBOR scalar expressions
    val big = native.filter(col("event.pieceSize") === 34359738368L)
    assert(big.count() > 0)
  }

  /** Minimal CBOR text encoding (major type 3, short form) for probes. */
  private def cborText(s: String): String = {
    val utf8 = s.getBytes("UTF-8")
    require(utf8.length < 24)
    java.util.Base64.getEncoder.encodeToString(
      (0x60 | utf8.length).toByte +: utf8)
  }

  test("garbage and non-claim events dead-letter to null, not throw") {
    import spark.implicits._
    val bad = Seq(
      // not base64 at all
      RawActorEvent("f0x", 1, reverted = false,
        Seq(graft.model.EventEntry(81, 0, "$type", "!!not-base64!!"))),
      // valid CBOR but not a claim type
      RawActorEvent("f0x", 2, reverted = false,
        Seq(graft.model.EventEntry(81, 0, "$type", cborText("other")))),
      // claim with a missing field set
      RawActorEvent("f0x", 3, reverted = false,
        Seq(graft.model.EventEntry(81, 0, "$type", cborText("claim"))))
    ).toDS().toDF()
    val out = bad.withColumn("event", ClaimPivot.decodeClaimEvent(col("entries")))
    assert(out.filter(col("event").isNotNull).count() == 0)
    assert(out.count() == 3) // nothing threw
  }

  test("unknown entry keys are validated like the reference pivot (dead-letter on bad values)") {
    import spark.implicits._
    // a complete valid claim event taken from the fixture...
    val good = raw.limit(1).as[RawActorEvent].collect()(0)
    def decodeOne(e: RawActorEvent): Long = {
      Seq(e).toDS().toDF()
        .withColumn("ev", ClaimPivot.decodeClaimEvent(col("entries")))
        .filter(col("ev").isNotNull).count()
    }
    assert(decodeOne(good) == 1)
    // ...plus an unknown key with garbage → whole event dead-letters
    // (reference utils.js decodes every entry value; UDF path agrees)
    val extraBad = good.copy(entries = good.entries :+
      graft.model.EventEntry(81, 0, "mystery", "!!garbage!!"))
    assert(decodeOne(extraBad) == 0)
    val viaUdf = Seq(extraBad).toDS().toDF()
      .withColumn("ev", EventCodec.decodeClaimUdf(col("entries")))
      .filter(col("ev").isNotNull).count()
    assert(viaUdf == 0)
    // an unknown key with a VALID int value is ignored, event decodes
    val extraOk = good.copy(entries = good.entries :+
      graft.model.EventEntry(81, 0, "mystery",
        java.util.Base64.getEncoder.encodeToString(Array(0x05.toByte)))) // CBOR uint 5
    assert(decodeOne(extraOk) == 1)
  }

  test("codegen and interpreted paths agree") {
    // force the interpreted path via eval on the expression directly
    val entriesCol = col("entries")
    val df = raw.limit(5)
    val viaPlan = df.withColumn("event", ClaimPivot.decodeClaimEvent(entriesCol))
      .select("event.claimId").collect().map(_.getLong(0)).sorted
    // interpreted: spark.sql.codegen.wholeStage=false session clone
    val noCodegen = spark.newSession()
    noCodegen.conf.set("spark.sql.codegen.wholeStage", "false")
    noCodegen.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val df2 = noCodegen.read.schema(RawActorEvent.schema)
      .json(s"${TestSpark.fixtures}/rawActorEvents.json").limit(5)
    val interp = df2.withColumn("event", ClaimPivot.decodeClaimEvent(entriesCol))
      .select("event.claimId").collect().map(_.getLong(0)).sorted
    assert(viaPlan.toSeq == interp.toSeq)
  }
}
