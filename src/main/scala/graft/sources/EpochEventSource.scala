package graft.sources

import java.util
import com.fasterxml.jackson.databind.ObjectMapper
import graft.model.RawActorEvent
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
  *     the transport fetches only that range (RPC: node-side range +
  *     `$type` filter; files: name-pruning + row filter).
  *
  * Transport is pluggable (S3, [[EventTransport]]):
  *   - `transport=file` (default) — NDJSON log files; options `path`
  *     (log dir) and `headFile` (JSON `{"Height": N}`, re-read every
  *     poll).
  *   - `transport=rpc` — live Filecoin JSON-RPC; options
  *     `rpcEndpoints` (comma-separated, random pick per request) and
  *     optional `rpcAuthToken`.
  *
  * Parallelism: `epochsPerPartition` sets the epoch-range chunk handled
  * by one input partition (one transport fetch). Unset, the range is
  * split into `defaultParallelism` chunks — NOT a hard-coded constant,
  * so a 1000-executor cluster fans out 1000-wide automatically.
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
  private val finality = options.getInt("finalityEpochs", 940)
  private val maxPast = options.getInt("maxPastEpochs", 1999)
  private val epochsPerPartition = options.getInt("epochsPerPartition", 0)

  override def readSchema(): StructType = RawActorEvent.schema

  private def spark = org.apache.spark.sql.SparkSession.active
  private def hadoopConf = new SerializableConfiguration(
    spark.sparkContext.hadoopConfiguration)

  /** The serializable transport recipe shipped in every partition. */
  private def transportConfig: TransportConfig =
    Option(options.get("transport")).getOrElse("file") match {
      case "rpc" =>
        RpcTransportConfig(
          endpoints = options.get("rpcEndpoints").split(",").map(_.trim).toSeq,
          authToken = Option(options.get("rpcAuthToken")))
      case "file" =>
        FileTransportConfig(options.get("path"), options.get("headFile"), hadoopConf)
      case other =>
        throw new IllegalArgumentException(s"unknown transport '$other'")
    }

  private def readHead(): Int = transportConfig.create().chainHead()

  /** Epoch range → one partition per `epochsPerPartition` chunk (or
    * `defaultParallelism` chunks when the option is unset). */
  private[sources] def partitions(fromEpoch: Int, toEpoch: Int): Array[InputPartition] = {
    if (fromEpoch > toEpoch) return Array.empty
    val range = toEpoch - fromEpoch + 1
    val per =
      if (epochsPerPartition > 0) epochsPerPartition
      else math.max(1, range / math.max(1, spark.sparkContext.defaultParallelism))
    val tc = transportConfig
    (fromEpoch to toEpoch by per).map { lo =>
      EpochRangePartition(lo, math.min(lo + per - 1, toEpoch), tc)
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
    fromEpoch: Int, toEpoch: Int, transport: TransportConfig) extends InputPartition

final case class EpochEventReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EpochEventPartitionReader(partition.asInstanceOf[EpochRangePartition])
}

final class EpochEventPartitionReader(p: EpochRangePartition)
    extends PartitionReader[InternalRow] {

  private val serializer = ExpressionEncoder(
    org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.agnosticEncoderFor(
      org.apache.spark.sql.Encoders.product[RawActorEvent])).createSerializer()

  private val cursor: EventCursor =
    p.transport.create().actorEvents(p.fromEpoch, p.toEpoch)

  private var current: InternalRow = _
  override def next(): Boolean =
    if (cursor.hasNext) { current = serializer(cursor.next()).copy(); true }
    else false
  override def get(): InternalRow = current
  // releases any stream the transport still holds when the task ends
  // early (failure, kill, limit) — not just at iterator EOF
  override def close(): Unit = cursor.close()
}
