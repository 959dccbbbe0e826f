package graft.sources

import java.util
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.{EventEntry, RawActorEvent}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource v2 source for the epoch-keyed actor-event log:
  * `spark.readStream.format("graft.sources.EpochEventSource")`.
  *
  * This is the Spark-native restatement of the reference's ingest source
  * (S2): `Filecoin.GetActorEventsRaw` polled per epoch with a
  * source-side filter (reference: backend/lib/rpc-service/service.js:
  * 51-86,105-116), the chain head as high-watermark (service.js:92-99),
  * and the finality/lookback gating of `observeBuiltinActorEvents`
  * (backend/lib/deal-observer.js:17-28).
  *
  *   - **offset = epoch**: the streaming offset is the last finalized
  *     epoch; checkpoint restart resumes exactly where the reference's
  *     `MAX(activated_at_epoch)+1` cursor would.
  *   - **finality as source gating (ST3)**: `latestOffset` never exposes
  *     epochs younger than `head − finalityEpochs`; un-finalized events
  *     cannot enter any plan.
  *   - **lookback cap (ST2)**: the initial offset starts at
  *     `head − maxPastEpochs`.
  *   - **pushdown**: each input partition carries its epoch sub-range;
  *     readers drop events outside it at the source, and files named
  *     `epochs-<lo>-<hi>.json` are pruned without being opened.
  *
  * The backing transport here is NDJSON files (the test/backfill path);
  * a live deployment swaps the file iterator for the RPC client with
  * the same offset/partition mechanics.
  *
  * Options: `path` (log dir), `headFile` (JSON `{"Height": N}`,
  * re-read every poll), `finalityEpochs`, `maxPastEpochs`.
  */
class EpochEventSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RawActorEvent.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EpochEventTable(new CaseInsensitiveStringMap(properties))
}

final class EpochEventTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"epoch_events(${options.get("path")})"
  override def schema(): StructType = RawActorEvent.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new EpochEventScan(opts)
}

final case class EpochOffset(epoch: Int) extends Offset {
  override def json(): String = s"""{"epoch":$epoch}"""
}

final class EpochEventScan(options: CaseInsensitiveStringMap) extends Scan {
  private val path = options.get("path")
  private val headFile = options.get("headFile")
  private val finality = options.getInt("finalityEpochs", 940)
  private val maxPast = options.getInt("maxPastEpochs", 1999)

  override def readSchema(): StructType = RawActorEvent.schema

  private def spark = org.apache.spark.sql.SparkSession.active
  private def hadoopConf = new SerializableConfiguration(
    spark.sparkContext.hadoopConfiguration)

  private def readHead(): Int = Retry.withRetries() {
    val p = new Path(headFile)
    val fs = p.getFileSystem(hadoopConf.value)
    val in = fs.open(p)
    try new ObjectMapper().readTree(in).get("Height").asInt
    finally in.close()
  }

  /** Epoch range → one partition per `epochsPerPartition` chunk. */
  private def partitions(fromEpoch: Int, toEpoch: Int): Array[InputPartition] = {
    if (fromEpoch > toEpoch) return Array.empty
    val per = math.max(1, (toEpoch - fromEpoch + 1) / 32)
    (fromEpoch to toEpoch by per).map { lo =>
      EpochRangePartition(path, lo, math.min(lo + per - 1, toEpoch), hadoopConf)
        .asInstanceOf[InputPartition]
    }.toArray
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val head = readHead()
      partitions(head - maxPast, head - finality)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      EpochEventReaderFactory()
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      override def latestOffset(): Offset = {
        val head = readHead()
        EpochOffset(head - finality) // ST3: only finalized epochs
      }

      override def initialOffset(): Offset = {
        val head = readHead()
        EpochOffset(head - maxPast - 1) // exclusive lower bound
      }

      override def deserializeOffset(json: String): Offset =
        EpochOffset(new ObjectMapper().readTree(json).get("epoch").asInt)

      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        partitions(start.asInstanceOf[EpochOffset].epoch + 1,
          end.asInstanceOf[EpochOffset].epoch)

      override def createReaderFactory(): PartitionReaderFactory =
        EpochEventReaderFactory()

      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

final case class EpochRangePartition(
    path: String, fromEpoch: Int, toEpoch: Int,
    conf: SerializableConfiguration) extends InputPartition

final case class EpochEventReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EpochEventPartitionReader(partition.asInstanceOf[EpochRangePartition])
}

final class EpochEventPartitionReader(p: EpochRangePartition)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val serializer = ExpressionEncoder(
    org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.agnosticEncoderFor(
      org.apache.spark.sql.Encoders.product[RawActorEvent])).createSerializer()

  /** Files named `epochs-<lo>-<hi>.json` are range-pruned without being
    * opened; other names are scanned and row-filtered. */
  private val files: Array[Path] = {
    val dir = new Path(p.path)
    val fs = dir.getFileSystem(p.conf.value)
    val namePat = "epochs-(\\d+)-(\\d+)\\.json".r
    fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".json"))
      .filter { f =>
        f.getName match {
          case namePat(lo, hi) => lo.toInt <= p.toEpoch && hi.toInt >= p.fromEpoch
          case _ => true
        }
      }
  }

  private val rows: Iterator[InternalRow] = files.iterator.flatMap { f =>
    val fs = f.getFileSystem(p.conf.value)
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(f), "UTF-8"))
    Iterator.continually(in.readLine()).takeWhile { l =>
      if (l == null) in.close(); l != null
    }.flatMap { line =>
      // dead-letter malformed lines / foreign files instead of failing
      // the partition (one bad record must not poison a backfill)
      try {
        val node = mapper.readTree(line)
        val hNode = node.get("height")
        if (hNode == null || node.get("entries") == null) None
        else {
          val h = hNode.asInt
          if (h < p.fromEpoch || h > p.toEpoch) None
          else Some(serializer(toEvent(node, h)).copy())
        }
      } catch {
        case _: com.fasterxml.jackson.core.JacksonException => None
      }
    }
  }

  private def toEvent(node: JsonNode, height: Int): RawActorEvent = {
    val entries = Vector.newBuilder[EventEntry]
    val it = node.get("entries").elements()
    while (it.hasNext) {
      val e = it.next()
      entries += EventEntry(e.get("Codec").asInt, e.get("Flags").asInt,
        e.get("Key").asText, e.get("Value").asText)
    }
    RawActorEvent(node.get("emitter").asText, height,
      node.get("reverted").asBoolean, entries.result())
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
