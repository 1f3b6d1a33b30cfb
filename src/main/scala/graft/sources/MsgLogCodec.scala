package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8

import graft.functions.Crc32C

/** One message of the graft message log: the §1.3 envelope essentials —
  * entry coordinates are assigned by position in the ledger (reference
  * `MessageIdData{ledgerId, entryId}`, `src/PulsarApi.proto:52-58`).
  */
case class MsgFrame(
    eventId: Long,
    tsUs: Long,
    userId: Long,
    eventType: String,
    value: Double,
    props: String)

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
  *            [len: int32][props utf8]
  * }}}
  *
  * `codec = flags & 0x7F`; `flags & 0x80` marks a BATCHED frame carrying
  * `count` messages (reference `BatchedMessage`,
  * `src/message/codec.rs:23-60` — the send side the reference left
  * `unimplemented!` at `producer.rs:226-229`). An unbatched frame omits
  * the count field, so every pre-batching ledger parses unchanged.
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

  private def encodeBody(m: MsgFrame): Array[Byte] = {
    val et = m.eventType.getBytes(UTF_8)
    val pr = m.props.getBytes(UTF_8)
    val body = java.nio.ByteBuffer.allocate(8 + 8 + 8 + 8 + 4 + et.length + 4 + pr.length)
    body.putLong(m.eventId).putLong(m.tsUs).putLong(m.userId).putDouble(m.value)
    body.putInt(et.length).put(et).putInt(pr.length).put(pr)
    body.array()
  }

  private def decodeBody(buf: java.nio.ByteBuffer): MsgFrame = {
    val eventId = buf.getLong; val tsUs = buf.getLong
    val userId = buf.getLong; val value = buf.getDouble
    val et = new Array[Byte](buf.getInt); buf.get(et)
    val pr = new Array[Byte](buf.getInt); buf.get(pr)
    MsgFrame(eventId, tsUs, userId, new String(et, UTF_8), value, new String(pr, UTF_8))
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
    val bodies = msgs.map(encodeBody)
    val payload = new Array[Byte](bodies.map(_.length).sum)
    var off = 0
    bodies.foreach { b => System.arraycopy(b, 0, payload, off, b.length); off += b.length }
    val stored = compress(payload, codec)
    val batched = msgs.length > 1
    val headerLen = 1 + (if (batched) 4 else 0)
    val checked = java.nio.ByteBuffer.allocate(headerLen + stored.length)
    checked.put((if (batched) codec | BatchFlag else codec.toInt).toByte)
    if (batched) checked.putInt(msgs.length)
    checked.put(stored)
    out.writeInt(4 + checked.capacity())
    out.writeInt(Crc32C.compute(checked.array()).toInt)
    out.write(checked.array())
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
    if (batched && checked.length < 5) // mirrors skipFrame's structural check
      throw new java.io.IOException("graft-msglog: truncated batch header")
    val rawCount =
      if (batched) java.nio.ByteBuffer.wrap(checked, 1, 4).getInt else 1
    val actual = Crc32C.compute(checked)
    if (actual != storedCrc) {
      val raw = java.nio.ByteBuffer.allocate(8 + checked.length)
        .putInt(totalSize).putInt(storedCrc.toInt).put(checked).array()
      return Corrupt(raw, lenientCount(rawCount),
        f"graft-msglog: CRC32C mismatch (stored 0x$storedCrc%08x, computed 0x$actual%08x)")
    }
    checkCount(rawCount) // CRC holds: an invalid count is a writer bug
    val headerLen = if (batched) 5 else 1
    val stored = java.util.Arrays.copyOfRange(checked, headerLen, checked.length)
    val payload = decompress(stored, (flags & ~BatchFlag).toByte)
    val buf = java.nio.ByteBuffer.wrap(payload)
    Entries(Array.fill(rawCount)(decodeBody(buf)))
  }

  /** Decode the next frame's messages, verifying the checksum (corrupt
    * frames raise). Returns None at clean EOF.
    */
  def readEntries(in: DataInputStream): Option[Array[MsgFrame]] =
    readFrameResult(in) match {
      case Entries(msgs) => Some(msgs)
      case Corrupt(_, _, err) => throw new java.io.IOException(err)
      case FrameEof => None
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
    * [[lenientCount]] discipline), and how many bytes the header walk
    * consumed past the size prefix's 4.
    */
  case class FrameHeader(totalSize: Int, claimedCount: Int, headerConsumed: Int)

  /** Read the next frame's size prefix + header without touching the
    * payload — THE single header-walk implementation behind skip, count,
    * and reader seek (three call sites sharing one set of structural
    * checks, so they cannot drift). None at clean EOF. Strict on what
    * frame-boundary accounting depends on (size prefix range, a batched
    * frame big enough for its count field); lenient on the count VALUE
    * (see [[lenientCount]]).
    */
  def readFrameHeader(in: DataInputStream): Option[FrameHeader] = {
    val totalSize =
      try in.readInt()
      catch { case _: EOFException => return None }
    checkSize(totalSize)
    in.readInt() // crc: not verified on a header walk
    val flags = in.readUnsignedByte()
    var consumed = 5
    val count = if ((flags & BatchFlag) != 0) {
      if (totalSize < 9) // count field would extend past the frame
        throw new java.io.IOException("graft-msglog: truncated batch header")
      val n = in.readInt(); consumed += 4
      lenientCount(n)
    } else 1
    Some(FrameHeader(totalSize, count, consumed))
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
