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
  * frame := [totalSize: int32] [crc32c: uint32 over codec+stored] [codec: u8] [stored]
  * stored := body            when codec = 0 (NONE)
  *         | deflate(body)   when codec = 1 (ZLIB)
  * body  := [event_id: int64] [ts_us: int64] [user_id: int64]
  *          [value: float64] [len: int32][event_type utf8]
  *          [len: int32][props utf8]
  * }}}
  *
  * Differences from the reference, on purpose:
  *  - CRC32C is VERIFIED on read. The reference computes the checksum on
  *    write (`codec.rs:147-149`) but left read-side verification as a TODO
  *    (`codec.rs:185`); a storage-backed log cannot skip it.
  *  - No protobuf: the envelope is fixed, so fixed-width fields +
  *    length-prefixed strings decode with zero copies beyond the strings.
  *  - Compression is per-frame with a codec id, like the reference's
  *    payload compression (`src/message/producer.rs:54-131`, proto:81-87);
  *    zlib is the JDK-available codec standing in for the reference's
  *    LZ4/Zlib/Zstd/Snappy set. Readers auto-detect per frame.
  */
object MsgLogCodec {

  val Extension = ".glog"

  val CodecNone: Byte = 0
  val CodecZlib: Byte = 1

  /** Upper bound on a frame's stored size: a corrupt size prefix (the one
    * field the CRC cannot cover) must fail as a decode error, not as a
    * NegativeArraySizeException or a multi-GB allocation.
    */
  val MaxFrameBytes: Int = 1 << 26 // 64 MiB

  private def checkSize(totalSize: Int): Unit =
    if (totalSize < 5 || totalSize > MaxFrameBytes)
      throw new java.io.IOException(
        s"graft-msglog: corrupt frame size $totalSize (valid: 5..$MaxFrameBytes)")

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

  def writeFrame(out: DataOutputStream, m: MsgFrame, codec: Byte = CodecNone): Unit = {
    val et = m.eventType.getBytes(UTF_8)
    val pr = m.props.getBytes(UTF_8)
    val body = java.nio.ByteBuffer.allocate(8 + 8 + 8 + 8 + 4 + et.length + 4 + pr.length)
    body.putLong(m.eventId).putLong(m.tsUs).putLong(m.userId).putDouble(m.value)
    body.putInt(et.length).put(et).putInt(pr.length).put(pr)
    val stored = if (codec == CodecZlib) deflate(body.array()) else body.array()
    val checked = new Array[Byte](1 + stored.length)
    checked(0) = codec
    System.arraycopy(stored, 0, checked, 1, stored.length)
    out.writeInt(4 + checked.length)
    out.writeInt(Crc32C.compute(checked).toInt)
    out.write(checked)
  }

  /** Decode the next frame, verifying the checksum. Returns None at clean
    * EOF; corrupt frames raise (a real connector would route these to the
    * dead-letter path, §2.1 #9).
    */
  def readFrame(in: DataInputStream): Option[MsgFrame] = {
    val totalSize =
      try in.readInt()
      catch { case _: EOFException => return None }
    checkSize(totalSize)
    val storedCrc = in.readInt() & 0xFFFFFFFFL
    val checked = new Array[Byte](totalSize - 4)
    in.readFully(checked)
    val actual = Crc32C.compute(checked)
    if (actual != storedCrc) {
      throw new java.io.IOException(
        f"graft-msglog: CRC32C mismatch (stored 0x$storedCrc%08x, computed 0x$actual%08x)")
    }
    val stored = java.util.Arrays.copyOfRange(checked, 1, checked.length)
    val body = checked(0) match {
      case CodecZlib => inflate(stored)
      case CodecNone => stored
      case other => throw new java.io.IOException(s"graft-msglog: unknown codec id $other")
    }
    val buf = java.nio.ByteBuffer.wrap(body)
    val eventId = buf.getLong; val tsUs = buf.getLong
    val userId = buf.getLong; val value = buf.getDouble
    val et = new Array[Byte](buf.getInt); buf.get(et)
    val pr = new Array[Byte](buf.getInt); buf.get(pr)
    Some(MsgFrame(eventId, tsUs, userId, new String(et, UTF_8), value, new String(pr, UTF_8)))
  }

  /** Skip one frame without decoding (offset seek path). False at clean
    * EOF; a truncated or size-corrupt frame raises.
    */
  def skipFrame(in: DataInputStream): Boolean = {
    val totalSize =
      try in.readInt()
      catch { case _: EOFException => return false }
    checkSize(totalSize)
    var remaining = totalSize
    while (remaining > 0) {
      val skipped = in.skipBytes(remaining)
      if (skipped <= 0)
        throw new java.io.IOException("graft-msglog: truncated ledger (short frame)")
      remaining -= skipped
    }
    true
  }

  /** Count frames in a ledger by walking the size prefixes — the
    * `GetLastMessageId` probe (§2.1 #11): O(frames) seeks, no payload
    * decode, no CRC work.
    */
  def countFrames(path: java.nio.file.Path): Long = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(java.nio.file.Files.newInputStream(path)))
    try {
      var n = 0L
      while (skipFrame(in)) n += 1
      n
    } finally in.close()
  }
}
