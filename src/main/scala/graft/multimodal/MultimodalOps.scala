package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Fixtures

/** Opaque media payload riding the pipeline: bytes + typed metadata.
  * Mirrors the reference's payload model (opaque `Vec<u8>` + properties,
  * `/root/reference/src/message/codec.rs:20`, `src/PulsarApi.proto:93`).
  */
case class MediaRecord(
    media_id: Long,
    kind: String,
    bytes: Array[Byte],
    props: Map[String, String])

/** Decoded-media features: what a real image/audio decoder would emit. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    width: Int,
    height: Int,
    n_frames: Int,
    byte_len: Int,
    feature: Array[Float])

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batched executor-side passes.
  *
  * The decode itself is a STUB — no media codecs exist in this
  * environment — replaced by a deterministic arithmetic fake
  * ([[MultimodalOps.stubDecode]]). Everything around it is real and is
  * what this module demonstrates: the envelope schema, the
  * `Dataset[MediaRecord] → mapPartitions → Dataset[MediaFeatures]` batch
  * boundary (the Scala analog of `mapInPandas`: one iterator per
  * partition, amortizing per-batch decoder setup), the partition-count
  * preservation, and frame-sampling as a post-decode projection. Swapping
  * `stubDecode` for a JNI/FFmpeg call changes no plumbing.
  *
  * The stub is pure integer arithmetic on (byte length, first byte), so
  * the whole flow stays DuckDB-expressible and the oracle can check the
  * executor-side pass end-to-end.
  */
object MultimodalOps {

  /** Media table derived from the documents fixture: text bytes stand in
    * for media payloads; kind cycles deterministically.
    */
  def mediaTable(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("props"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic fake in place of a real codec.
    * Real shape: parse container header → dims/frames; emit a feature
    * vector from the decoded frames. Fake shape: dims/frames from the
    * payload's code-point count + first code point; feature = 8
    * pseudo-channel means derived by integer arithmetic. Code points,
    * not raw bytes, so the arithmetic means the same thing in the SQL
    * oracle (`length`/`ascii` are character-based there) for non-ASCII
    * payloads too; `byte_len` stays the true byte size (`strlen` in the
    * oracle). Deterministic, portable, and cheap — the mapPartitions
    * boundary it sits behind is the real artifact.
    */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    val text = new String(r.bytes, java.nio.charset.StandardCharsets.UTF_8)
    val len = text.codePointCount(0, text.length)
    val first = if (text.nonEmpty) text.codePointAt(0) else 0
    val width = 16 + (len % 64)
    val height = 16 + (first % 32)
    val nFrames = r.kind match {
      case "video" => 1 + (len % 24)
      case "audio" => 1 + (len % 100)
      case _ => 1
    }
    val feature = Array.tabulate(8)(i => ((len * 31 + i * 7) % 97) / 97.0f)
    MediaFeatures(r.media_id, r.kind, width, height, nFrames, r.bytes.length, feature)
  }

  /** Batched decode: one decoder pass per partition (`mapPartitions`), the
    * Scala analog of a pandas-batch UDF. Partitioning is preserved — at
    * 100 TB each executor decodes its partition's payloads with no
    * shuffle; decoder init (the expensive part with real codecs) is
    * amortized per-partition, not per-row.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it => it.map(stubDecode) }
  }

  /** Resize (STUB geometry, real plumbing): letterbox every decoded frame
    * into a target box preserving aspect ratio — the standard pre-model
    * normalization. Pure integer/double projection over the decoded
    * metadata; a real implementation swaps the arithmetic for a pixel
    * kernel inside the same column contract.
    */
  def resizeStub(features: Dataset[MediaFeatures], targetW: Int, targetH: Int): DataFrame =
    features.toDF()
      .withColumn("scale",
        least(lit(targetW) / col("width"), lit(targetH) / col("height")))
      .select(
        col("media_id"), col("kind"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("int").as("out_w"),
        floor(col("height") * col("scale")).cast("int").as("out_h"),
        round(col("scale"), 6).as("scale"))

  /** Frame sampling: every k-th frame index per video/audio — a projection
    * over the decoded metadata (`sequence` + HOF), no second decode pass.
    */
  def frameSample(features: Dataset[MediaFeatures], k: Int): DataFrame =
    features.toDF()
      .select(
        col("media_id"), col("kind"), col("n_frames"),
        expr(s"filter(sequence(0, n_frames - 1), f -> f % $k = 0)").as("sampled_frames"))
      .withColumn("n_sampled", size(col("sampled_frames")))

  /** Contract query: per-kind stats over the decoded features — proves the
    * full mediaTable → mapPartitions decode → aggregate path. Feature-mean
    * is an exact integer-derived double; everything hash-compares.
    */
  def multimodalDecodeStats(docs: DataFrame): DataFrame = {
    val decoded = decodeFeatures(mediaTable(docs)).toDF()
    decoded
      .select(
        col("kind"), col("width"), col("height"), col("n_frames"), col("byte_len"),
        aggregate(transform(col("feature"), x => x.cast("double")), lit(0.0),
          (a, x) => a + x).as("feat_sum"))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        min("width").as("min_w"),
        max("width").as("max_w"),
        max("n_frames").as("max_frames"),
        sum("byte_len").as("total_bytes"),
        round(avg(col("feat_sum") / 8.0), 6).as("avg_feat_mean"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stats" ->
      ((s, d) => multimodalDecodeStats(Fixtures.documents(s, d))))

  /** The stub decode re-expressed in SQL: length/first-byte arithmetic.
    * Float feature values are k/97 single-precision quotients; the oracle
    * reproduces them with an explicit float cast before the double sum.
    */
  def oracle: Map[String, String] = Map(
    "mm_decode_stats" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
                  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
                  length(text) AS len,
                  strlen(text) AS nbytes,
                  ascii(substring(text, 1, 1)) AS first_b
           FROM documents),
         d AS (
           SELECT kind,
                  16 + (len % 64) AS width,
                  16 + (first_b % 32) AS height,
                  CASE kind WHEN 'video' THEN 1 + (len % 24)
                            WHEN 'audio' THEN 1 + (len % 100)
                            ELSE 1 END AS n_frames,
                  nbytes AS byte_len,
                  list_sum([CAST(CAST(((len * 31 + i * 7) % 97) / 97.0 AS FLOAT) AS DOUBLE)
                            for i in range(0, 8)]) AS feat_sum
           FROM m)
         SELECT kind, CAST(count(*) AS BIGINT) AS n,
                CAST(min(width) AS INTEGER) AS min_w,
                CAST(max(width) AS INTEGER) AS max_w,
                CAST(max(n_frames) AS INTEGER) AS max_frames,
                CAST(sum(byte_len) AS BIGINT) AS total_bytes,
                round(avg(feat_sum / 8.0), 6) AS avg_feat_mean
         FROM d GROUP BY kind ORDER BY kind""")
}
