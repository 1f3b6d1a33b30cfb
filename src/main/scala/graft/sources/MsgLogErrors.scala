package graft.sources

/** Typed connector errors keyed to the wire protocol's `ServerError`
  * taxonomy (reference `src/PulsarApi.proto:171-197`; clients receive
  * these through `validate_response`,
  * `src/message/validation.rs:12-25`). Every RAISABLE failure class in
  * this engine carries its wire code and name, so a caller migrating
  * from the reference keeps its error-handling structure:
  * `catch { case e: MsgLogServerError if e.code == 9 => … }`.
  *
  * Each class extends the conventional JVM base type its call-site
  * contract already implied (IOException for data corruption,
  * argument/state errors for verb misuse), so pre-existing generic
  * handlers and tests keep working unchanged.
  *
  * Codes with no file-backed analog in this sandbox scope — auth (3/4),
  * quota (7/8), ServiceNotReady (6), TooManyRequests (14),
  * TopicTerminated (15), ConsumerAssign (19) — are broker-runtime
  * conditions recorded in SURVEY §2.1 rows 20-26/35; they are
  * deliberately absent rather than stubbed.
  */
trait MsgLogServerError { this: Throwable =>
  /** `ServerError` enum value (proto:171-197). */
  def code: Int
  /** `ServerError` variant name, verbatim. */
  def codeName: String
}

/** proto:183 — CRC32C verification failed on read. */
final class ChecksumException(msg: String)
    extends java.io.IOException(msg) with MsgLogServerError {
  val code = 9; val codeName = "ChecksumError"
}

/** proto:178-179 — a consumer with this name is already attached. */
final class ConsumerBusyException(msg: String)
    extends IllegalArgumentException(msg) with MsgLogServerError {
  val code = 5; val codeName = "ConsumerBusy"
}

/** proto:187 — verb against a consumer the subscription doesn't hold. */
final class ConsumerNotFoundException(msg: String)
    extends IllegalArgumentException(msg) with MsgLogServerError {
  val code = 13; val codeName = "ConsumerNotFound"
}

/** proto:191 — a producer with this name is already connected. */
final class ProducerBusyException(msg: String)
    extends IllegalStateException(msg) with MsgLogServerError {
  val code = 16; val codeName = "ProducerBusy"
}

/** proto:194 — declared schema conflicts with the topic's registered one
  * (or a payload fails validation under it). */
final class IncompatibleSchemaException(msg: String, cause: Throwable = null)
    extends IllegalArgumentException(msg, cause) with MsgLogServerError {
  val code = 18; val codeName = "IncompatibleSchema"
}
