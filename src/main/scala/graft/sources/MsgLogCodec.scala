package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8

import graft.functions.Crc32C

/** One message of the graft message log: the full §1.3 envelope — entry
  * coordinates are assigned by position in the ledger (reference
  * `MessageIdData{ledgerId, entryId}`, `src/PulsarApi.proto:52-58`); the
  * optional fields mirror `MessageMetadata`
  * (`src/PulsarApi.proto:89-149`): `producer_name`/`sequence_id`
  * (proto:90-91), `event_time` distinct from publish time (proto:113),
  * `partition_key` (proto:98), `ordering_key` (proto:123, bytes — it
  * overrides partition_key for Key_Shared dispatch), free-form
  * `properties` (proto:96), `redelivery_count` (CommandMessage,
  * proto:475), and `deliver_at_time` (proto:125-126, delayed delivery).
  *
  * Absence encoding keeps the core fixture payload allocation-free:
  * `null` for reference-typed fields, `-1` for the non-negative numeric
  * ones, `0` for redeliveryCount (the proto default).
  */
case class MsgFrame(
    eventId: Long,
    tsUs: Long,
    userId: Long,
    eventType: String,
    value: Double,
    props: String,
    producerName: String = null,
    sequenceId: Long = -1L,
    eventTimeUs: Long = -1L,
    partitionKey: String = null,
    orderingKey: Seq[Byte] = null,
    properties: Map[String, String] = null,
    redeliveryCount: Int = 0,
    deliverAtUs: Long = -1L)

/** Wire codec for graft message-log ledger files — the reference's frame
  * discipline (`/root/reference/src/message/codec.rs:114-206`)
  * re-expressed for a file-backed log:
  *
  * {{{
  * frame   := [totalSize: int32] [crc32c: uint32 over checked] [checked]
  * checked := [flags: u8] [count: int32 when flags&0x80] [stored]
  * stored  := payload                      when codec = 0 (NONE)
  *          | deflate(payload)             when codec = 1 (ZLIB)
  *          | [rawLen: int32] lz4(payload) when codec = 2 (LZ4)
  *          | [rawLen: int32] zstd(payload)when codec = 3 (ZSTD)
  *          | snappy(payload)              when codec = 4 (SNAPPY;
  *                                          self-describing length)
  * payload := body{count}                  (bodies are self-delimiting)
  * body    := [event_id: int64] [ts_us: int64] [user_id: int64]
  *            [value: float64] [len: int32][event_type utf8]
  *            [len: int32][props utf8] [env when flags&0x40]
  * env     := [bits: u8]                   (presence bitmask)
  *            [len: int32][producer_name utf8]   when bits&0x01
  *            [sequence_id: int64]               when bits&0x02
  *            [event_time_us: int64]             when bits&0x04
  *            [len: int32][partition_key utf8]   when bits&0x08
  *            [len: int32][ordering_key bytes]   when bits&0x10
  *            [n: int32]([klen][k][vlen][v]){n}  when bits&0x20
  *            [redelivery_count: int32]          when bits&0x40
  *            [deliver_at_us: int64]             when bits&0x80
  * }}}
  *
  * `codec = flags & 0x1F`; `flags & 0x80` marks a BATCHED frame carrying
  * `count` messages (reference `BatchedMessage`,
  * `src/message/codec.rs:23-60` — the send side the reference left
  * `unimplemented!` at `producer.rs:226-229`). An unbatched frame omits
  * the count field, so every pre-batching ledger parses unchanged.
  * `flags & 0x40` marks an ENVELOPE frame whose bodies carry the optional
  * `MessageMetadata` fields (`src/PulsarApi.proto:89-149`) behind a
  * per-message presence bitmask — a write with no envelope columns stays
  * byte-identical to the pre-envelope layout, and every pre-envelope
  * ledger decodes with the envelope fields absent (NULL column values).
  * Properties are encoded in sorted key order so frames are deterministic
  * for a given message.
  *
  * `flags & 0x20` marks a CHUNK frame (reference chunked large messages,
  * `src/PulsarApi.proto:142-145`: `uuid`, `chunk_id`,
  * `num_chunks_from_msg`): one oversized logical message's encoded body
  * split across frames, each `[uuid: 2×int64] [chunk_id: int32]
  * [num_chunks: int32] [stored slice]` after the flags byte, slices
  * compressed independently. Chunk frames are never batched. Entry
  * accounting puts the group's single logical entry on chunk 0 (the
  * discipline [[readFrameHeader]], [[countEntries]] and the reader's
  * seek all share): a seek that skips chunk 0 skips the whole message,
  * and a reader that decodes chunk 0 owns its entry until emission.
  * A message's `entry` coordinate is its ordinal across ALL frames —
  * `(frame, batch_index)` flattened, like `MessageIdData.batch_index`
  * (`proto:52-58`).
  *
  * Differences from the reference, on purpose:
  *  - CRC32C is VERIFIED on read. The reference computes the checksum on
  *    write (`codec.rs:147-149`) but left read-side verification as a TODO
  *    (`codec.rs:185`); a storage-backed log cannot skip it.
  *  - No protobuf: the envelope is fixed, so fixed-width fields +
  *    length-prefixed strings decode with zero copies beyond the strings.
  *  - Compression is per-frame with a codec id, like the reference's
  *    payload compression (`src/message/producer.rs:54-131`, proto:81-87);
  *    the codec set matches the reference's feature gates: zlib via the
  *    JDK, LZ4/Zstd/Snappy via the lz4-java/zstd-jni/snappy-java
  *    libraries that ship with Spark. Readers auto-detect per frame.
  */
object MsgLogCodec {

  val Extension = ".glog"

  val CodecNone: Byte = 0
  val CodecZlib: Byte = 1
  val CodecLz4: Byte = 2
  val CodecZstd: Byte = 3
  val CodecSnappy: Byte = 4

  val BatchFlag: Int = 0x80
  val EnvelopeFlag: Int = 0x40
  val ChunkFlag: Int = 0x20

  /** Low bits of the flags byte that carry the codec id (the high bits
    * are the batch/envelope/chunk markers). */
  val CodecMask: Int = 0x1F

  /** Upper bound on a frame's stored size: a corrupt size prefix (the one
    * field the CRC cannot cover) must fail as a decode error, not as a
    * NegativeArraySizeException or a multi-GB allocation.
    */
  val MaxFrameBytes: Int = 1 << 26 // 64 MiB

  /** Upper bound on a batched frame's message count — like the size
    * prefix, the header is validated structurally before the CRC verdict
    * so a corrupt count cannot drive entry accounting insane.
    */
  val MaxBatchCount: Int = 1 << 20

  private def checkSize(totalSize: Int): Unit =
    if (totalSize < 5 || totalSize > MaxFrameBytes)
      throw new java.io.IOException(
        s"graft-msglog: corrupt frame size $totalSize (valid: 5..$MaxFrameBytes)")

  private def checkCount(count: Int): Unit =
    if (count < 1 || count > MaxBatchCount)
      throw new java.io.IOException(
        s"graft-msglog: corrupt batch count $count (valid: 1..$MaxBatchCount)")

  // --- compression -------------------------------------------------------

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 16)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    val i = new java.util.zip.Inflater()
    i.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 2 + 16)
    val buf = new Array[Byte](4096)
    while (!i.finished()) out.write(buf, 0, i.inflate(buf))
    i.end()
    out.toByteArray
  }

  /** LZ4 block format carries no length header of its own and Zstd's is
    * optional, so both store an explicit rawLen prefix — the exact-size
    * allocation on decode, validated against [[MaxFrameBytes]].
    */
  private def withRawLen(raw: Int, compressed: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + compressed.length)
    out.putInt(raw).put(compressed)
    out.array()
  }

  private def compress(payload: Array[Byte], codec: Byte): Array[Byte] = codec match {
    case CodecNone => payload
    case CodecZlib => deflate(payload)
    case CodecLz4 =>
      val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
      withRawLen(payload.length, c.compress(payload))
    case CodecZstd =>
      withRawLen(payload.length, com.github.luben.zstd.Zstd.compress(payload))
    case CodecSnappy =>
      org.xerial.snappy.Snappy.compress(payload)
    case other =>
      throw new IllegalArgumentException(s"graft-msglog: unknown codec id $other")
  }

  private def rawLen(stored: Array[Byte]): Int = {
    val n = java.nio.ByteBuffer.wrap(stored, 0, 4).getInt
    if (n < 0 || n > MaxFrameBytes)
      throw new java.io.IOException(s"graft-msglog: corrupt rawLen $n")
    n
  }

  private def decompress(stored: Array[Byte], codec: Byte): Array[Byte] = codec match {
    case CodecNone => stored
    case CodecZlib => inflate(stored)
    case CodecLz4 =>
      val d = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
      d.decompress(stored, 4, rawLen(stored))
    case CodecZstd =>
      // offset-taking variant: no copy of the compressed payload just to
      // strip the 4-byte rawLen prefix (the lz4 branch gets this free)
      val n = rawLen(stored)
      val dst = new Array[Byte](n)
      val written = com.github.luben.zstd.Zstd.decompressByteArray(
        dst, 0, n, stored, 4, stored.length - 4)
      if (written != n)
        throw new java.io.IOException(
          s"graft-msglog: zstd raw length mismatch ($written != $n)")
      dst
    case CodecSnappy =>
      org.xerial.snappy.Snappy.uncompress(stored)
    case other =>
      throw new java.io.IOException(s"graft-msglog: unknown codec id $other")
  }

  // --- message bodies ------------------------------------------------------

  // envelope presence bits (see the layout comment above)
  private val BitProducer = 0x01
  private val BitSequence = 0x02
  private val BitEventTime = 0x04
  private val BitPartKey = 0x08
  private val BitOrderKey = 0x10
  private val BitProperties = 0x20
  private val BitRedelivery = 0x40
  private val BitDeliverAt = 0x80

  private def envBits(m: MsgFrame): Int = {
    var b = 0
    if (m.producerName != null) b |= BitProducer
    if (m.sequenceId >= 0) b |= BitSequence
    if (m.eventTimeUs >= 0) b |= BitEventTime
    if (m.partitionKey != null) b |= BitPartKey
    if (m.orderingKey != null) b |= BitOrderKey
    if (m.properties != null) b |= BitProperties
    if (m.redeliveryCount != 0) b |= BitRedelivery
    if (m.deliverAtUs >= 0) b |= BitDeliverAt
    b
  }

  /** Whether any envelope field is set — the frame-level flag is the OR
    * over the batch, so an all-core batch stays on the compact layout.
    */
  def hasEnvelope(m: MsgFrame): Boolean = envBits(m) != 0

  private def encodeBody(m: MsgFrame, envelope: Boolean): Array[Byte] = {
    val et = m.eventType.getBytes(UTF_8)
    val pr = m.props.getBytes(UTF_8)
    var size = 8 + 8 + 8 + 8 + 4 + et.length + 4 + pr.length
    var bits = 0
    var pn: Array[Byte] = null
    var pk: Array[Byte] = null
    var ok: Array[Byte] = null
    var kvs: Seq[(Array[Byte], Array[Byte])] = null
    if (envelope) {
      bits = envBits(m)
      size += 1
      if ((bits & BitProducer) != 0) { pn = m.producerName.getBytes(UTF_8); size += 4 + pn.length }
      if ((bits & BitSequence) != 0) size += 8
      if ((bits & BitEventTime) != 0) size += 8
      if ((bits & BitPartKey) != 0) { pk = m.partitionKey.getBytes(UTF_8); size += 4 + pk.length }
      if ((bits & BitOrderKey) != 0) { ok = m.orderingKey.toArray; size += 4 + ok.length }
      if ((bits & BitProperties) != 0) {
        kvs = m.properties.toSeq.sortBy(_._1)
          .map { case (k, v) => (k.getBytes(UTF_8), v.getBytes(UTF_8)) }
        size += 4 + kvs.iterator.map(e => 8 + e._1.length + e._2.length).sum
      }
      if ((bits & BitRedelivery) != 0) size += 4
      if ((bits & BitDeliverAt) != 0) size += 8
    }
    val body = java.nio.ByteBuffer.allocate(size)
    body.putLong(m.eventId).putLong(m.tsUs).putLong(m.userId).putDouble(m.value)
    body.putInt(et.length).put(et).putInt(pr.length).put(pr)
    if (envelope) {
      body.put(bits.toByte)
      if (pn != null) body.putInt(pn.length).put(pn)
      if ((bits & BitSequence) != 0) body.putLong(m.sequenceId)
      if ((bits & BitEventTime) != 0) body.putLong(m.eventTimeUs)
      if (pk != null) body.putInt(pk.length).put(pk)
      if (ok != null) body.putInt(ok.length).put(ok)
      if (kvs != null) {
        body.putInt(kvs.length)
        kvs.foreach { case (k, v) =>
          body.putInt(k.length).put(k).putInt(v.length).put(v)
        }
      }
      if ((bits & BitRedelivery) != 0) body.putInt(m.redeliveryCount)
      if ((bits & BitDeliverAt) != 0) body.putLong(m.deliverAtUs)
    }
    body.array()
  }

  private def readBytes(buf: java.nio.ByteBuffer): Array[Byte] = {
    val b = new Array[Byte](buf.getInt); buf.get(b); b
  }

  private def decodeBody(buf: java.nio.ByteBuffer, envelope: Boolean): MsgFrame = {
    val eventId = buf.getLong; val tsUs = buf.getLong
    val userId = buf.getLong; val value = buf.getDouble
    val et = readBytes(buf)
    val pr = readBytes(buf)
    val core = MsgFrame(eventId, tsUs, userId, new String(et, UTF_8), value, new String(pr, UTF_8))
    if (!envelope) core
    else {
      val bits = buf.get() & 0xFF
      core.copy(
        producerName =
          if ((bits & BitProducer) != 0) new String(readBytes(buf), UTF_8) else null,
        sequenceId = if ((bits & BitSequence) != 0) buf.getLong else -1L,
        eventTimeUs = if ((bits & BitEventTime) != 0) buf.getLong else -1L,
        partitionKey =
          if ((bits & BitPartKey) != 0) new String(readBytes(buf), UTF_8) else null,
        orderingKey =
          if ((bits & BitOrderKey) != 0)
            scala.collection.immutable.ArraySeq.unsafeWrapArray(readBytes(buf))
          else null,
        properties =
          if ((bits & BitProperties) != 0)
            Seq.fill(buf.getInt)(
              (new String(readBytes(buf), UTF_8), new String(readBytes(buf), UTF_8))).toMap
          else null,
        redeliveryCount = if ((bits & BitRedelivery) != 0) buf.getInt else 0,
        deliverAtUs = if ((bits & BitDeliverAt) != 0) buf.getLong else -1L)
    }
  }

  // --- write ---------------------------------------------------------------

  def writeFrame(out: DataOutputStream, m: MsgFrame, codec: Byte = CodecNone): Unit =
    writeBatch(out, Seq(m), codec)

  /** Frame `msgs` as one wire frame — unbatched layout for a single
    * message (back-compatible), batched (`flags|0x80` + count) otherwise.
    */
  def writeBatch(out: DataOutputStream, msgs: Seq[MsgFrame], codec: Byte = CodecNone): Unit = {
    require(msgs.nonEmpty, "graft-msglog: empty batch")
    checkCount(msgs.length)
    val envelope = msgs.exists(hasEnvelope)
    val bodies = msgs.map(encodeBody(_, envelope))
    val payload = new Array[Byte](bodies.map(_.length).sum)
    var off = 0
    bodies.foreach { b => System.arraycopy(b, 0, payload, off, b.length); off += b.length }
    val stored = compress(payload, codec)
    val batched = msgs.length > 1
    val headerLen = 1 + (if (batched) 4 else 0)
    val checked = java.nio.ByteBuffer.allocate(headerLen + stored.length)
    val flags = codec | (if (batched) BatchFlag else 0) | (if (envelope) EnvelopeFlag else 0)
    checked.put(flags.toByte)
    if (batched) checked.putInt(msgs.length)
    checked.put(stored)
    emitFrame(out, checked.array())
  }

  private def emitFrame(out: DataOutputStream, checked: Array[Byte]): Unit = {
    out.writeInt(4 + checked.length)
    out.writeInt(Crc32C.compute(checked).toInt)
    out.write(checked)
  }

  /** Write one message, CHUNKING it when its encoded body exceeds
    * `maxChunkBytes` (reference chunked messages, `proto:142-145`): the
    * body is split into `ceil(len / maxChunkBytes)` slices, each framed
    * as `(uuid, chunk_id, num_chunks)` with its slice compressed
    * independently. A body that fits writes the ordinary unbatched frame
    * (byte-identical to `writeBatch(Seq(m))`), so chunk-enabled topics
    * stay readable by any reader.
    */
  def writeMessageAuto(out: DataOutputStream, m: MsgFrame, codec: Byte,
      maxChunkBytes: Int): Unit = {
    require(maxChunkBytes > 0, "graft-msglog: maxChunkBytes must be positive")
    val envelope = hasEnvelope(m)
    val envFlag = if (envelope) EnvelopeFlag else 0
    val body = encodeBody(m, envelope)
    if (body.length <= maxChunkBytes) {
      val stored = compress(body, codec)
      val checked = java.nio.ByteBuffer.allocate(1 + stored.length)
      checked.put((codec | envFlag).toByte).put(stored)
      emitFrame(out, checked.array())
    } else {
      val n = ((body.length.toLong + maxChunkBytes - 1) / maxChunkBytes).toInt
      checkCount(n)
      val uuid = java.util.UUID.randomUUID()
      var off = 0
      var cid = 0
      while (off < body.length) {
        val slice = java.util.Arrays.copyOfRange(
          body, off, math.min(off + maxChunkBytes, body.length))
        val stored = compress(slice, codec)
        val checked = java.nio.ByteBuffer.allocate(1 + 24 + stored.length)
        checked.put((codec | ChunkFlag | envFlag).toByte)
        checked.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
        checked.putInt(cid).putInt(n)
        checked.put(stored)
        emitFrame(out, checked.array())
        off += maxChunkBytes
        cid += 1
      }
    }
  }

  // --- read ----------------------------------------------------------------

  /** One decoded wire frame. `Corrupt` carries the verbatim frame bytes
    * (for dead-letter diversion) and the entry count the frame CLAIMS —
    * the same count [[countEntries]] assigns it, so entry numbering stays
    * consistent whether or not the frame verifies.
    */
  sealed trait FrameResult
  case class Entries(msgs: Array[MsgFrame]) extends FrameResult
  case class Corrupt(raw: Array[Byte], claimedCount: Int, error: String) extends FrameResult
  case object FrameEof extends FrameResult

  /** One chunk of a split oversized message: the decompressed body slice
    * plus the group coordinates. `envelope` is carried per frame so the
    * reassembled body decodes without peeking back at chunk 0's flags.
    */
  case class ChunkPiece(uuidHi: Long, uuidLo: Long, chunkId: Int, numChunks: Int,
      envelope: Boolean, payload: Array[Byte]) extends FrameResult

  /** Entry accounting for a frame whose CRC may not hold: a batch count
    * outside 1..MaxBatchCount in a CRC-FAILED frame claims 1 — the true
    * count is unknowable, and what matters is that [[readFrameResult]]
    * and [[skipFrame]] (hence [[countEntries]]) assign the SAME number
    * from the same bytes, so offsets stay consistent whether the frame is
    * decoded, skipped, or dead-lettered. A CRC-VALID frame with an
    * out-of-range count is a writer bug and raises ([[checkCount]]).
    */
  private def lenientCount(n: Int): Int =
    if (n >= 1 && n <= MaxBatchCount) n else 1

  /** Decode the next frame without raising on checksum failure — the
    * caller decides fail vs dead-letter; header corruption inside the
    * CRC-covered bytes (a flipped batch flag, a garbage count) lands in
    * `Corrupt` like any payload corruption, because the frame boundary
    * (the size prefix) is still intact. Only structural corruption the
    * stream cannot safely advance past — a bad size prefix, a truncated
    * file, a batched frame too short for its own count field — raises.
    */
  def readFrameResult(in: DataInputStream): FrameResult = {
    val totalSize =
      try in.readInt()
      catch { case _: EOFException => return FrameEof }
    checkSize(totalSize)
    val storedCrc = in.readInt() & 0xFFFFFFFFL
    val checked = new Array[Byte](totalSize - 4)
    in.readFully(checked)
    val flags = checked(0) & 0xFF
    val batched = (flags & BatchFlag) != 0
    val chunked = (flags & ChunkFlag) != 0
    // structural checks mirror skipFrame's (the stream can advance past
    // CRC failures, never past truncation); chunk takes precedence over
    // batch in BOTH the corrupt-claim and the header-walk paths, so a
    // garbage flags byte yields the same claim either way
    if (chunked && checked.length < 25)
      throw new java.io.IOException("graft-msglog: truncated chunk header")
    if (!chunked && batched && checked.length < 5)
      throw new java.io.IOException("graft-msglog: truncated batch header")
    val rawCount =
      if (chunked) {
        val cid = java.nio.ByteBuffer.wrap(checked, 17, 4).getInt
        if (cid == 0) 1 else 0
      } else if (batched) java.nio.ByteBuffer.wrap(checked, 1, 4).getInt
      else 1
    val actual = Crc32C.compute(checked)
    if (actual != storedCrc) {
      val raw = java.nio.ByteBuffer.allocate(8 + checked.length)
        .putInt(totalSize).putInt(storedCrc.toInt).put(checked).array()
      return Corrupt(raw, if (chunked) rawCount else lenientCount(rawCount),
        f"graft-msglog: CRC32C mismatch (stored 0x$storedCrc%08x, computed 0x$actual%08x)")
    }
    val envelope = (flags & EnvelopeFlag) != 0
    if (chunked) {
      if (batched)
        throw new java.io.IOException("graft-msglog: chunk frame with batch flag (writer bug)")
      val hdr = java.nio.ByteBuffer.wrap(checked, 1, 24)
      val uuidHi = hdr.getLong; val uuidLo = hdr.getLong
      val cid = hdr.getInt; val n = hdr.getInt
      if (n < 1 || n > MaxBatchCount || cid < 0 || cid >= n)
        throw new java.io.IOException(
          s"graft-msglog: corrupt chunk coordinates $cid/$n (writer bug)")
      val stored = java.util.Arrays.copyOfRange(checked, 25, checked.length)
      return ChunkPiece(uuidHi, uuidLo, cid, n, envelope,
        decompress(stored, (flags & CodecMask).toByte))
    }
    Entries(decodeCheckedPlain(checked))
  }

  /** Decode the checked region of a NON-chunk frame (flags byte +
    * optional batch count + stored payload) into its messages — the ONE
    * implementation behind the verified read path and the DLQ's lenient
    * decode, so the two cannot drift on a wire-format change. An invalid
    * count here is a writer bug or unverified corruption and raises.
    */
  private def decodeCheckedPlain(checked: Array[Byte]): Array[MsgFrame] = {
    val flags = checked(0) & 0xFF
    val batched = (flags & BatchFlag) != 0
    val count =
      if (batched) {
        if (checked.length < 5)
          throw new java.io.IOException("graft-msglog: truncated batch header")
        java.nio.ByteBuffer.wrap(checked, 1, 4).getInt
      } else 1
    checkCount(count)
    val headerLen = if (batched) 5 else 1
    val stored = java.util.Arrays.copyOfRange(checked, headerLen, checked.length)
    val payload = decompress(stored, (flags & CodecMask).toByte)
    val buf = java.nio.ByteBuffer.wrap(payload)
    Array.fill(count)(decodeBody(buf, (flags & EnvelopeFlag) != 0))
  }

  /** Decode the next frame's messages, verifying the checksum (corrupt
    * frames raise). Returns None at clean EOF.
    */
  def readEntries(in: DataInputStream): Option[Array[MsgFrame]] =
    readFrameResult(in) match {
      case Entries(msgs) => Some(msgs)
      case Corrupt(_, _, err) => throw new ChecksumException(err)
      case FrameEof => None
      case _: ChunkPiece => throw new java.io.IOException(
        "graft-msglog: chunk frame in a per-frame read (use foreachEntry or the partition reader)")
    }

  /** Single-message convenience over [[readEntries]] for unbatched
    * streams (codec tests, probes).
    */
  def readFrame(in: DataInputStream): Option[MsgFrame] =
    readEntries(in).map { msgs =>
      require(msgs.length == 1, s"readFrame on a batched frame (${msgs.length} messages)")
      msgs(0)
    }

  /** One frame's header: its wire size, the entry count it claims (the
    * [[lenientCount]] discipline), how many bytes the header walk
    * consumed past the size prefix's 4, and — for a chunk frame — its
    * chunk ordinal (`-1` for non-chunk frames). A chunk frame claims the
    * group's single entry on chunk 0 and nothing on continuations,
    * mirroring [[readFrameResult]] exactly so skip/count/seek and the
    * decode path can never drift on a chunked ledger.
    */
  case class FrameHeader(totalSize: Int, claimedCount: Int, headerConsumed: Int,
      chunkId: Int = -1) {
    /** Continuation frame of a chunk group (carries no entry of its own). */
    def isChunkCont: Boolean = chunkId > 0
  }

  /** Read the next frame's size prefix + header without touching the
    * payload — THE single header-walk implementation behind skip, count,
    * and reader seek (three call sites sharing one set of structural
    * checks, so they cannot drift). None at clean EOF. Strict on what
    * frame-boundary accounting depends on (size prefix range, a batched
    * frame big enough for its count field, a chunk frame big enough for
    * its coordinates); lenient on the count VALUE (see [[lenientCount]];
    * for chunk frames the claim is `chunk_id == 0 ? 1 : 0` from the
    * unverified header bytes — the same claim [[readFrameResult]] assigns
    * a CRC-failed chunk frame).
    */
  def readFrameHeader(in: DataInputStream): Option[FrameHeader] = {
    val totalSize =
      try in.readInt()
      catch { case _: EOFException => return None }
    checkSize(totalSize)
    in.readInt() // crc: not verified on a header walk
    val flags = in.readUnsignedByte()
    var consumed = 5
    if ((flags & ChunkFlag) != 0) {
      if (totalSize < 29) // uuid+chunk coordinates would extend past the frame
        throw new java.io.IOException("graft-msglog: truncated chunk header")
      in.readLong(); in.readLong() // uuid: not needed on a header walk
      val cid = in.readInt()
      in.readInt() // num_chunks
      consumed += 24
      Some(FrameHeader(totalSize, if (cid == 0) 1 else 0, consumed, chunkId = cid))
    } else {
      val count = if ((flags & BatchFlag) != 0) {
        if (totalSize < 9) // count field would extend past the frame
          throw new java.io.IOException("graft-msglog: truncated batch header")
        val n = in.readInt(); consumed += 4
        lenientCount(n)
      } else 1
      Some(FrameHeader(totalSize, count, consumed))
    }
  }

  /** Skip the payload remainder of a frame whose header was just read. */
  def skipPayload(in: DataInputStream, h: FrameHeader): Unit = {
    var remaining = h.totalSize - h.headerConsumed
    while (remaining > 0) {
      val skipped = in.skipBytes(remaining)
      if (skipped <= 0)
        throw new java.io.IOException("graft-msglog: truncated ledger (short frame)")
      remaining -= skipped
    }
  }

  /** Skip one frame without decoding or CRC work, returning the entry
    * count it claims. None at clean EOF; a truncated or size-corrupt
    * frame raises.
    */
  def skipFrame(in: DataInputStream): Option[Int] =
    readFrameHeader(in).map { h => skipPayload(in, h); h.claimedCount }

  /** Bytes a header walk may consume past its `mark` before a `reset`:
    * size prefix (4) + crc (4) + flags (1) + the larger of the batch
    * count (4) and the chunk coordinates (24). Seek loops must
    * `mark(SeekMarkLimit)` per frame or a chunk header straddling the
    * buffer boundary invalidates the mark.
    */
  val SeekMarkLimit: Int = 4 + 4 + 1 + 24

  /** Position `in` at the first frame carrying entries >= `from`,
    * skipping earlier frames via headers (no decode, no CRC) — THE
    * single seek implementation behind the partition reader and
    * [[deliverableFrontier]]. Returns the entry ordinal at the resulting
    * position. Chunk-group aware: skipping a group's chunk 0 (which
    * claims the group's single entry) also skips its continuation frames
    * even once the entry target is reached, so a reader never starts
    * mid-group; a group whose entry IS wanted is left intact with the
    * stream positioned at its chunk 0. The stream must support
    * mark/reset ([[SeekMarkLimit]]).
    */
  def seekToEntry(in: DataInputStream, from: Long): Long =
    seekFrames(in, from, 0L)._1

  /** The seek walk with byte accounting: starting at a frame boundary
    * whose next entry ordinal is `entry0`, skip frames wholly below
    * `from`, returning the `(entry, bytesConsumed)` boundary reached —
    * the resume coordinates byte-budget admission memoizes.
    */
  private[sources] def seekFrames(in: DataInputStream, from: Long,
      entry0: Long): (Long, Long) = {
    var entry = entry0
    var bytes = 0L
    var inSkippedGroup = false
    while (true) {
      in.mark(SeekMarkLimit)
      readFrameHeader(in) match {
        case None => return (entry, bytes)
        case Some(h) =>
          if (h.isChunkCont && inSkippedGroup) { // claims 0 entries
            skipPayload(in, h)
            bytes += 4L + h.totalSize
          } else if (entry < from && entry + h.claimedCount <= from) {
            skipPayload(in, h)
            bytes += 4L + h.totalSize
            entry += h.claimedCount
            inSkippedGroup = h.chunkId == 0
          } else { in.reset(); return (entry, bytes) }
      }
    }
    (entry, bytes) // unreachable
  }

  /** Reassembles chunk groups from consecutive [[ChunkPiece]] frames.
    * Groups are contiguous within a ledger by construction: each ledger
    * has exactly one writer task and [[writeMessageAuto]] emits a group's
    * frames back-to-back — the file-backed analog of the reference
    * constraint that a producer cannot interleave chunks of one message
    * (chunking and batching are mutually exclusive, and a chunked send
    * completes before the next message; `src/PulsarApi.proto:142-145`).
    * Out-of-order, orphaned, or uuid-mismatched pieces are writer bugs or
    * corruption and raise.
    */
  /** The buffered state of a chunk group abandoned mid-assembly: its
    * uuid and the decompressed slices received so far (chunk ids are the
    * indices — contiguity is enforced on offer). */
  case class OpenGroup(uuidHi: Long, uuidLo: Long, pieces: Seq[Array[Byte]])

  final class ChunkAssembler {
    private var uuidHi = 0L
    private var uuidLo = 0L
    private var total = -1
    private var envelope = false
    private val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    /** No group under assembly. */
    def isEmpty: Boolean = total < 0

    /** Drop the group under assembly (dead-letter recovery). */
    def reset(): Unit = { total = -1; parts.clear() }

    /** Drop the group under assembly, returning its buffered slices so a
      * dead-letter policy can preserve them (the healthy 99% of a large
      * message whose one corrupt chunk would otherwise take the rest
      * with it). None when nothing is open. */
    def drain(): Option[OpenGroup] =
      if (isEmpty) None
      else {
        val g = OpenGroup(uuidHi, uuidLo, parts.toSeq)
        reset()
        Some(g)
      }

    /** Buffer one piece; decode and return the logical message when the
      * group completes (its entry is the one chunk 0 claimed).
      */
    def offer(c: ChunkPiece): Option[MsgFrame] = {
      if (c.chunkId == 0) {
        if (!isEmpty)
          throw new java.io.IOException(
            "graft-msglog: chunk 0 arrived while another chunk group was open")
        uuidHi = c.uuidHi; uuidLo = c.uuidLo; total = c.numChunks; envelope = c.envelope
        parts += c.payload
      } else {
        if (isEmpty || c.uuidHi != uuidHi || c.uuidLo != uuidLo ||
            c.chunkId != parts.length || c.numChunks != total)
          throw new java.io.IOException(
            s"graft-msglog: out-of-order or orphaned chunk ${c.chunkId}/${c.numChunks}")
        parts += c.payload
      }
      if (parts.length < total) None
      else {
        val body = new Array[Byte](parts.iterator.map(_.length).sum)
        var off = 0
        parts.foreach { p => System.arraycopy(p, 0, body, off, p.length); off += p.length }
        val env = envelope
        reset()
        Some(decodeBody(java.nio.ByteBuffer.wrap(body), env))
      }
    }
  }

  /** A byte-budget admission walk's result: the granted entry frontier,
    * the frame-boundary coordinates REACHED by the walk, and the
    * boundary coordinates AT the requested start (`seekEntry`/
    * `seekBytes` ≤ `fromEntry`). The next walk resumes from whichever
    * boundary is still at/behind its own start — the reached boundary in
    * the common case, the seek boundary when a tighter co-limit (row
    * budget, delayed-delivery cap) clamped the committed frontier below
    * the walked one — so per-trigger cost stays O(granted frames), never
    * O(consumed prefix).
    */
  case class ByteWalk(frontier: Long, resumeEntry: Long, resumeBytes: Long,
      seekEntry: Long, seekBytes: Long)

  /** Entries admissible from `fromEntry` within a wire-byte budget: walk
    * frame headers (no decode, no CRC) summing each frame's on-disk cost
    * (size prefix + frame) until the budget is exhausted, returning the
    * new entry frontier. A SOFT limit, like Kafka's maxBytes admission:
    * at least one frame is granted when any backlog exists (so a frame
    * larger than the budget still makes progress), and a chunk group is
    * granted atomically with its chunk 0 (its continuation frames claim
    * no entries, and the reader reads the whole group for the group's
    * one entry anyway). `resumeEntry`/`resumeBytes` — a frame boundary
    * from a previous walk's [[ByteWalk]], with `resumeEntry <= fromEntry`
    * — let the walk fast-skip the already-walked prefix in one raw skip.
    */
  def entriesWithinBytes(path: java.nio.file.Path, fromEntry: Long,
      byteBudget: Long, resumeEntry: Long = 0L, resumeBytes: Long = 0L): ByteWalk = {
    require(resumeEntry <= fromEntry,
      s"entriesWithinBytes: resumeEntry $resumeEntry past fromEntry $fromEntry")
    val in = new DataInputStream(
      new java.io.BufferedInputStream(java.nio.file.Files.newInputStream(path)))
    try {
      var toSkip = resumeBytes
      while (toSkip > 0) {
        val s = in.skipBytes(math.min(toSkip, Int.MaxValue.toLong).toInt)
        if (s <= 0)
          throw new java.io.IOException("graft-msglog: truncated ledger (stale resume point)")
        toSkip -= s
      }
      val (entry, seekBytes) = seekFrames(in, fromEntry, resumeEntry)
      val seekBoundaryBytes = resumeBytes + seekBytes
      var boundaryBytes = seekBoundaryBytes
      var spent = 0L
      var granted = 0L
      var more = true
      while (more) {
        readFrameHeader(in) match {
          case None => more = false
          case Some(h) =>
            val cost = 4L + h.totalSize
            // grant the first frame unconditionally (soft limit), then
            // stop BEFORE the first frame that would overrun; chunk
            // continuations ride with their chunk 0 (claim 0 entries)
            if (spent > 0 && spent + cost > byteBudget && !h.isChunkCont) more = false
            else {
              skipPayload(in, h)
              spent += cost
              boundaryBytes += cost
              granted += h.claimedCount
            }
        }
      }
      ByteWalk(entry + granted, entry + granted, boundaryBytes, entry, seekBoundaryBytes)
    } finally in.close()
  }

  /** Decode every message of a ledger in order, reassembling chunk
    * groups; corrupt frames and truncated groups raise. The full-decode
    * walk behind maintenance scans (sequence-frontier recovery, tests) —
    * the partition reader keeps its own incremental loop for
    * slice/predicate/DLQ handling.
    */
  def foreachEntry(path: java.nio.file.Path)(f: MsgFrame => Unit): Unit = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(java.nio.file.Files.newInputStream(path)))
    val assembler = new ChunkAssembler
    try {
      var more = true
      while (more) readFrameResult(in) match {
        case FrameEof =>
          if (!assembler.isEmpty)
            throw new java.io.IOException("graft-msglog: ledger ends mid chunk group")
          more = false
        case Corrupt(_, _, err) => throw new ChecksumException(err)
        case Entries(msgs) => msgs.foreach(f)
        case c: ChunkPiece => assembler.offer(c).foreach(f)
      }
    } finally in.close()
  }

  /** Delayed-delivery frontier (reference `deliver_at_time`,
    * `src/PulsarApi.proto:125-126`): the first entry index at/after
    * `from` whose `deliver_at` is after `nowUs`, paired with that
    * message's deliver time (for memoization — the frontier cannot move
    * until the clock reaches it). Returns `(totalEntries, -1)` when
    * everything is deliverable. Frames wholly below `from` are skipped
    * via headers (no decode, no CRC): the walk costs O(held backlog),
    * not O(ledger), when resumed from a previous frontier.
    */
  def deliverableFrontier(path: java.nio.file.Path, from: Long, nowUs: Long): (Long, Long) = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(java.nio.file.Files.newInputStream(path)))
    val assembler = new ChunkAssembler
    try {
      var entry = seekToEntry(in, from)
      while (true) {
        readFrameResult(in) match {
          case FrameEof =>
            // a truncated group still claimed its entry via chunk 0 —
            // count it so the frontier agrees with countEntries
            return (if (assembler.isEmpty) entry else entry + 1, -1L)
          case Corrupt(_, claimed, _) =>
            // offset accounting must stay as lenient as countEntries: a
            // corrupt piece drops its group (entry consumed, deliver_at
            // unknowable → counted deliverable; the READ path still fails
            // loud or dead-letters, this walk only numbers entries)
            if (!assembler.isEmpty) { assembler.reset(); entry += 1 }
            entry += claimed
          case Entries(msgs) =>
            msgs.foreach { m =>
              if (entry >= from && m.deliverAtUs > nowUs) return (entry, m.deliverAtUs)
              entry += 1
            }
          case c: ChunkPiece =>
            // the group's entry (claimed by chunk 0) advances only when
            // the message completes — matching the reader's emission
            // point; a continuation of a corrupt-dropped group carries no
            // entry and is skipped
            if (!(c.chunkId > 0 && assembler.isEmpty))
              assembler.offer(c).foreach { m =>
                if (entry >= from && m.deliverAtUs > nowUs) return (entry, m.deliverAtUs)
                entry += 1
              }
        }
      }
      (entry, -1L) // unreachable
    } finally in.close()
  }

  /** Best-effort decode of a diverted frame's messages, IGNORING the CRC
    * verdict — the frame is in the DLQ precisely because verification
    * failed, but single-bit payload corruption usually leaves the body
    * structurally decodable (and a flipped checksum leaves it perfectly
    * intact). For DLQ inspection/repair tooling only; the read path never
    * uses this. Left(reason) when the body cannot be walked.
    */
  def decodeFrameLenient(bytes: Array[Byte]): Either[String, Array[MsgFrame]] =
    try {
      if (bytes.length < 9) return Left("truncated frame (shorter than size+crc+flags)")
      val checked = java.util.Arrays.copyOfRange(bytes, 8, bytes.length)
      if ((checked(0) & ChunkFlag) != 0)
        return Left("chunk frame: reassemble from its .part siblings by group uuid")
      Right(decodeCheckedPlain(checked))
    } catch {
      case e: Exception =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName))
    }

  /** Diagnostic counter of full ledger entry-walks, for asserting that
    * offset computation does NOT re-walk unchanged ledgers per trigger.
    */
  val entryWalks = new java.util.concurrent.atomic.AtomicLong()

  /** Count messages in a ledger by walking frame headers — the
    * `GetLastMessageId` probe (§2.1 #11): O(frames) seeks, no payload
    * decode, no CRC work.
    */
  def countEntries(path: java.nio.file.Path): Long = {
    entryWalks.incrementAndGet()
    val in = new DataInputStream(
      new java.io.BufferedInputStream(java.nio.file.Files.newInputStream(path)))
    try {
      var n = 0L
      var more = true
      while (more) skipFrame(in) match {
        case Some(c) => n += c
        case None => more = false
      }
      n
    } finally in.close()
  }
}
