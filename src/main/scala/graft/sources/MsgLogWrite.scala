package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** Produce path of the graft message log as a DataSource V2 writer — the
  * reference's send pipeline (§3.1: serialize → sequence → frame → await
  * receipt) with task-commit standing in for the broker receipt:
  *
  *  - each task writes its partition's frames to a temp ledger, so a
  *    failed/speculative task leaves no partial ledger visible (the
  *    reference correlates receipts by `(producer_id, sequence_id)` to
  *    the same end — exactly-once visibility of sent data);
  *  - task commit atomically renames the temp ledger into place;
  *    `abort` deletes it (reference: retry/reconnect with epoch bump,
  *    `src/entity/producer.rs:132-176`);
  *  - routing is NOT the writer's job: callers route declaratively
  *    (`df.repartition(n, col("user_id"))`) and the writer preserves the
  *    partitioning — one ledger per input partition, like one producer
  *    per topic partition (`src/entity/producer.rs:39-52`).
  *
  * Streaming epochs land as separate ledger files tagged by epoch id —
  * restart-safe because an epoch re-commit overwrites the same names.
  */
class MsgLogWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {

  /** Per-frame payload codec (reference compression feature gates,
    * `src/message/producer.rs:54-131`):
    * `compression=none|zlib|lz4|zstd|snappy`.
    */
  private val codec: Byte = Option(info.options.get("compression")) match {
    case Some("zlib") => MsgLogCodec.CodecZlib
    case Some("lz4") => MsgLogCodec.CodecLz4
    case Some("zstd") => MsgLogCodec.CodecZstd
    case Some("snappy") => MsgLogCodec.CodecSnappy
    case Some("none") | None => MsgLogCodec.CodecNone
    case Some(other) =>
      throw new IllegalArgumentException(
        s"graft-msglog: unsupported compression '$other' (use none, zlib, lz4, zstd or snappy)")
  }

  /** Messages packed per wire frame (reference `BatchedMessage`,
    * `src/message/codec.rs:23-60`): `batchSize=N` amortizes the frame
    * header + CRC + compression context over N messages — the
    * small-message throughput lever. 1 (default) writes the unbatched
    * layout byte-for-byte.
    */
  private val batchSize: Int = Option(info.options.get("batchSize")) match {
    case None => 1
    case Some(s) =>
      val n = try s.toInt catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"graft-msglog: invalid batchSize '$s'")
      }
      if (n < 1 || n > MsgLogCodec.MaxBatchCount)
        throw new IllegalArgumentException(
          s"graft-msglog: batchSize $n out of range 1..${MsgLogCodec.MaxBatchCount}")
      n
  }

  /** Chunked large messages (reference `uuid`/`chunk_id`/
    * `num_chunks_from_msg`, `src/PulsarApi.proto:142-145`):
    * `maxFrameBytes=N` splits any message whose encoded body exceeds N
    * into N-byte chunk frames ([[MsgLogCodec.writeMessageAuto]]) — the
    * only way to write a payload past the 64 MiB frame cap. Mutually
    * exclusive with `batchSize` > 1, the reference's own producer
    * constraint (chunking requires batching disabled). Capped at half
    * [[MsgLogCodec.MaxFrameBytes]] so a chunk slice plus header and
    * worst-case compression expansion always fits a legal frame.
    */
  private val maxFrameBytes: Int = Option(info.options.get("maxFrameBytes")) match {
    case None => 0
    case Some(s) =>
      val n = try s.toInt catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"graft-msglog: invalid maxFrameBytes '$s'")
      }
      if (n < 1 || n > MsgLogCodec.MaxFrameBytes / 2)
        throw new IllegalArgumentException(
          s"graft-msglog: maxFrameBytes $n out of range 1..${MsgLogCodec.MaxFrameBytes / 2}")
      if (batchSize > 1)
        throw new IllegalArgumentException(
          "graft-msglog: maxFrameBytes (chunking) requires batchSize=1 — " +
            "chunking and batching are mutually exclusive, as in the reference producer")
      n
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new MsgLogBatchWrite(path, info.schema(), codec, batchSize, maxFrameBytes)
    override def toStreaming: StreamingWrite =
      new MsgLogStreamingWrite(path, info.schema(), info.queryId(), codec, batchSize,
        maxFrameBytes)
  }
}

case class MsgLogCommit(file: String) extends WriterCommitMessage

class MsgLogBatchWrite(path: String, schema: StructType, codec: Byte, batchSize: Int,
    maxFrameBytes: Int = 0)
    extends BatchWrite {
  /** Per-write id in the ledger names: two appends to one topic must not
    * collide on `ledger-<partition>` (that would silently replace the
    * first write's ledgers — observed, fixed). Streaming epochs stay
    * deterministic instead: an epoch replayed after restart SHOULD
    * overwrite its own files (idempotent re-commit).
    */
  private val writeId = java.util.UUID.randomUUID().toString.take(8)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    MsgLogWriterFactory(path, schema, writeId, codec, batchSize, maxFrameBytes)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Streaming ledger names carry the QUERY id (stable across restarts of
  * the same checkpoint): epoch ids alone restart at 0 for a fresh
  * checkpoint, so two streaming queries producing into one topic — or a
  * re-pointed query after a checkpoint reset — would rename over each
  * other's `epoch-N` ledgers. Including queryId isolates queries while
  * keeping an epoch re-commit of the SAME query idempotent.
  */
class MsgLogStreamingWrite(path: String, schema: StructType, queryId: String,
    codec: Byte, batchSize: Int, maxFrameBytes: Int = 0)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    MsgLogWriterFactory(path, schema, queryId, codec, batchSize, maxFrameBytes)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

/** Serializable factory shipped to executors (one writer per task). */
case class MsgLogWriterFactory(path: String, schema: StructType, writeId: String,
    codec: Byte, batchSize: Int, maxFrameBytes: Int = 0)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new MsgLogDataWriter(path, schema, f"ledger-$writeId-$partitionId%04d", taskId,
      codec, batchSize, maxFrameBytes)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new MsgLogDataWriter(path, schema, f"epoch-$writeId-$epochId%06d-$partitionId%04d", taskId,
      codec, batchSize, maxFrameBytes)
}

/** Frames one partition's rows into `<stem>.glog` via a temp file +
  * atomic rename on commit. Expects the payload columns (by name):
  * event_id, ts, user_id, event_type, value, props. The optional
  * `MessageMetadata` envelope columns (producer_name, sequence_id,
  * event_time, partition_key, ordering_key, properties,
  * redelivery_count, deliver_at — `src/PulsarApi.proto:89-149`) are
  * picked up by name when the write schema carries them; NULL cells and
  * absent columns encode as absent fields, so a write without them is
  * byte-identical to the pre-envelope layout.
  */
class MsgLogDataWriter(dir: String, schema: StructType, stem: String, taskId: Long,
    codec: Byte = MsgLogCodec.CodecNone, batchSize: Int = 1, maxFrameBytes: Int = 0)
    extends DataWriter[InternalRow] {

  private val iEvent = schema.fieldIndex("event_id")
  private val iTs = schema.fieldIndex("ts")
  private val iUser = schema.fieldIndex("user_id")
  private val iType = schema.fieldIndex("event_type")
  private val iValue = schema.fieldIndex("value")
  private val iProps = schema.fieldIndex("props")

  private def optIdx(name: String): Int = schema.fields.indexWhere(_.name == name)
  private val iProducer = optIdx("producer_name")
  private val iSeq = optIdx("sequence_id")
  private val iEventTime = optIdx("event_time")
  private val iPartKey = optIdx("partition_key")
  private val iOrderKey = optIdx("ordering_key")
  private val iProperties = optIdx("properties")
  private val iRedelivery = optIdx("redelivery_count")
  private val iDeliverAt = optIdx("deliver_at")

  private def has(i: Int, row: InternalRow): Boolean = i >= 0 && !row.isNullAt(i)

  private val tmp: Path = Paths.get(dir, s".$stem-$taskId${MsgLogCodec.Extension}.tmp")
  private var out: DataOutputStream = _
  private var n = 0L

  private def ensureOpen(): Unit = if (out == null) {
    Files.createDirectories(Paths.get(dir))
    out = new DataOutputStream(
      new BufferedOutputStream(Files.newOutputStream(tmp), 1 << 16))
  }

  /** Pending messages of the frame under assembly (batchSize > 1). */
  private val batch = new scala.collection.mutable.ArrayBuffer[MsgFrame](batchSize)

  private def flushBatch(): Unit = if (batch.nonEmpty) {
    MsgLogCodec.writeBatch(out, batch.toSeq, codec)
    batch.clear()
  }

  /** The wire encodes `-1` as "absent" for these fields, so a negative
    * value would silently round-trip to NULL. The proto fields are
    * unsigned (`sequence_id`/`event_time`/`deliver_at_time`,
    * `src/PulsarApi.proto:91,113,125`), so refusing is reference-faithful
    * — and loud beats silent data loss.
    */
  private def nonNeg(field: String, v: Long): Long = {
    if (v < 0)
      throw new IllegalArgumentException(
        s"graft-msglog: negative $field ($v) is unwritable — the wire format reads " +
          "negative values back as NULL (the reference proto field is unsigned)")
    v
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val m = MsgFrame(
      row.getLong(iEvent),
      row.getLong(iTs), // TimestampType is epoch-µs internally
      row.getLong(iUser),
      row.getUTF8String(iType).toString,
      row.getDouble(iValue),
      row.getUTF8String(iProps).toString,
      producerName =
        if (has(iProducer, row)) row.getUTF8String(iProducer).toString else null,
      sequenceId = if (has(iSeq, row)) nonNeg("sequence_id", row.getLong(iSeq)) else -1L,
      eventTimeUs =
        if (has(iEventTime, row)) nonNeg("event_time", row.getLong(iEventTime)) else -1L,
      partitionKey =
        if (has(iPartKey, row)) row.getUTF8String(iPartKey).toString else null,
      orderingKey =
        if (has(iOrderKey, row))
          scala.collection.immutable.ArraySeq.unsafeWrapArray(row.getBinary(iOrderKey))
        else null,
      properties = if (has(iProperties, row)) {
        val md = row.getMap(iProperties)
        val ks = md.keyArray(); val vs = md.valueArray()
        (0 until md.numElements())
          .map(j => ks.getUTF8String(j).toString -> vs.getUTF8String(j).toString).toMap
      } else null,
      redeliveryCount = if (has(iRedelivery, row)) row.getInt(iRedelivery) else 0,
      deliverAtUs =
        if (has(iDeliverAt, row)) nonNeg("deliver_at", row.getLong(iDeliverAt)) else -1L)
    if (maxFrameBytes > 0) MsgLogCodec.writeMessageAuto(out, m, codec, maxFrameBytes)
    else {
      batch += m
      if (batch.length >= batchSize) flushBatch()
    }
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) return MsgLogCommit("")
    flushBatch() // the final short frame
    out.close()
    val dest = Paths.get(dir, s"$stem${MsgLogCodec.Extension}")
    Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    MsgLogCommit(dest.toString)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    Files.deleteIfExists(tmp)
  }

  override def close(): Unit = ()
}
