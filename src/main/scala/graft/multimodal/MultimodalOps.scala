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
  * IMAGE decode is REAL — `javax.imageio` (JDK built-in PNG/JPEG codecs,
  * zero new deps): [[MultimodalOps.decodeAny]] sniffs the container magic
  * and decodes genuine rasters to true dims + per-channel means
  * ([[MultimodalOps.decodeImage]]); the `mm_img` contract key drives a
  * full encode → decode round-trip through it. Audio/video (no codecs in
  * the JDK) keep the deterministic arithmetic stand-in
  * ([[MultimodalOps.stubDecode]]), which any non-image payload falls
  * back to. Around either codec, the plumbing this module demonstrates
  * is the same: the envelope schema, the `Dataset[MediaRecord] →
  * mapPartitions → Dataset[MediaFeatures]` batch boundary (the Scala
  * analog of `mapInPandas`: one iterator per partition, amortizing
  * per-batch decoder setup), the partition-count preservation, and
  * frame-sampling as a post-decode projection. Swapping the stub for a
  * JNI/FFmpeg call changes no plumbing.
  *
  * The stub is pure integer arithmetic on (byte length, first byte), so
  * the stub-backed flow stays DuckDB-expressible; the image flow stays
  * oracle-checkable because the synthesized PNGs' dims/fill derive from
  * `media_id` and PNG is lossless.
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

  /** PNG/JPEG container sniff. Only magics whose FIRST byte cannot open
    * well-formed UTF-8 text (0x89 is a continuation byte, 0xFF is
    * invalid anywhere) — so text-derived payloads can never
    * false-positive into the image branch. */
  def isImagePayload(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte))

  /** REAL image decode — `javax.imageio` (JDK built-in, zero new deps):
    * sniff the container, decode the full raster, emit true
    * width/height/component-count and exact per-channel means over the
    * decoded pixels. Feature layout: [r̄, ḡ, b̄, gray, channels, 0, 0, 0]
    * (means normalized /255; gray = channel-sum mean /3 — divisions
    * ordered so a constant-fill image reproduces the encoder's color
    * bit-for-bit, which the oracle states arithmetically). Returns None
    * when the payload does not decode — `ImageIO.read` signals corrupt
    * containers inconsistently (null for unknown formats, IIOException
    * for truncated ones), both normalized here so callers fall back to
    * [[stubDecode]] rather than poisoning the partition. */
  def decodeImage(r: MediaRecord): Option[MediaFeatures] =
    (try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes)))
     catch { case scala.util.control.NonFatal(_) => None })
      .map { img =>
        val w = img.getWidth
        val h = img.getHeight
        var rs = 0L; var gs = 0L; var bs = 0L
        // bulk raster copy: per-pixel getRGB(x, y) pays a ColorModel
        // conversion per CALL — 12M virtual dispatches on a 4000×3000
        // crawl image; one row-batch copy per row bounds the buffer at
        // O(width) while keeping the conversion vectorized
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        def mean(s: Long): Float = (s / n / 255.0).toFloat
        val gray = ((rs + gs + bs) / n / 3.0 / 255.0).toFloat
        val feature = Array(mean(rs), mean(gs), mean(bs), gray,
          img.getColorModel.getNumComponents.toFloat, 0f, 0f, 0f)
        MediaFeatures(r.media_id, r.kind, w, h, 1, r.bytes.length, feature)
      }

  /** Production decode dispatch: payloads carrying a real image
    * container (PNG/JPEG magic) decode through the genuine
    * `javax.imageio` codec; everything else — and any corrupt container
    * — takes the deterministic [[stubDecode]] fallback, so one bad
    * payload degrades one row, never the partition. */
  def decodeAny(r: MediaRecord): MediaFeatures =
    if (isImagePayload(r.bytes)) decodeImage(r).getOrElse(stubDecode(r))
    else stubDecode(r)

  /** Batched decode: one decoder pass per partition (`mapPartitions`), the
    * Scala analog of a pandas-batch UDF. Partitioning is preserved — at
    * 100 TB each executor decodes its partition's payloads with no
    * shuffle; decoder init (the expensive part with real codecs) is
    * amortized per-partition, not per-row.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it => it.map(decodeAny) }
  }

  /** REAL pixel resize (AWT raster kernel): decode, aspect-preserving
    * scale into the target box with the same floor geometry as
    * [[resizeStub]], re-encode PNG. Returns None when the payload does
    * not decode — callers keep the original record rather than fail the
    * partition (the [[decodeImage]] contract). Bilinear interpolation:
    * the standard pre-model normalization kernel. */
  def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    (try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
     catch { case scala.util.control.NonFatal(_) => None })
      .map { img =>
        val scale = math.min(targetW.toDouble / img.getWidth,
          targetH.toDouble / img.getHeight)
        val outW = math.max(1, math.floor(img.getWidth * scale).toInt)
        val outH = math.max(1, math.floor(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, outW, outH, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }

  /** Batched REAL resize over a media table: image payloads come back
    * re-encoded at letterboxed size, everything else passes through
    * untouched — same `mapPartitions` envelope as the decode, so at
    * scale each executor resizes its partition with no shuffle. */
  def resizeMedia(media: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      if (isImagePayload(r.bytes))
        resizeImage(r.bytes, targetW, targetH)
          .map(b => r.copy(bytes = b)).getOrElse(r)
      else r
    })
  }

  /** Resize GEOMETRY as a pure column projection (the arithmetic twin of
    * [[resizeImage]]'s kernel — same floor semantics, asserted
    * equivalent in tests): letterbox every decoded frame into a target
    * box preserving aspect ratio. Useful when only the output dims are
    * needed (batch-shape planning) — no pixels touched.
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

  /** Deterministic tiny-image synthesis through the REAL `javax.imageio`
    * PNG ENCODER: dims and a constant fill color derive from `media_id`,
    * so the oracle can state the decoded stats arithmetically while the
    * engine path genuinely round-trips encode → decode through a
    * production codec (PNG is lossless, so the constant fill survives
    * bit-for-bit). */
  def synthPng(mediaId: Long): Array[Byte] = {
    // floorMod: a negative id must not produce a non-positive dimension
    // (BufferedImage would throw and fail the whole partition); fixture
    // ids are non-negative, so the oracle's sign-following % agrees on
    // every id it ever sees
    val w = 16 + Math.floorMod(mediaId, 64).toInt
    val h = 16 + Math.floorMod(mediaId, 48).toInt
    val rgb = (Math.floorMod(mediaId * 37, 256).toInt << 16) |
      (Math.floorMod(mediaId * 59, 256).toInt << 8) |
      Math.floorMod(mediaId * 83, 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** An image-payload media table: real PNG bytes per document row,
    * synthesized executor-side in the same batched `mapPartitions` shape
    * the decode uses (encode cost stays in the scan task; nothing
    * corpus-sized crosses an exchange). */
  def imageTable(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, source, lang) =>
        MediaRecord(id, "image", synthPng(id),
          Map("source" -> source, "lang" -> lang))
      })
  }

  private val imageTableDirs =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  /** How many times the image table actually SYNTHESIZED — staging
    * observability for tests. */
  val imageTableBuilds = new java.util.concurrent.atomic.AtomicLong(0)

  def dropStagedImageTable(): Unit = imageTableDirs.clear()

  /** The synthesized PNG corpus staged to parquet once per corpus dir —
    * a real pipeline decodes images that already EXIST in storage, so
    * the served/benched path must measure decode throughput, not
    * fixture synthesis. Binary payloads + props land in one parquet
    * table (the landing-zone shape of a media crawl); repeated reads
    * scan it like any other fixture. */
  def stagedImageTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    val dir = imageTableDirs.computeIfAbsent(sfDir, _ => {
      imageTableBuilds.incrementAndGet()
      val d = java.nio.file.Files.createTempDirectory("graft_media_images_")
      graft.util.TempDirs.track(d)
      imageTable(Fixtures.documents(spark, sfDir))
        .write.mode("overwrite").parquet(d.toString)
      d
    })
    spark.read.parquet(dir.toString).as[MediaRecord]
  }

  /** Contract query: per-image decoded geometry + channel means through
    * the REAL codec round-trip (synthesize PNG → `javax.imageio` decode
    * → project). `byte_len` (the encoded PNG size) is deliberately NOT
    * in the contract — it is codec-version-dependent; the decoded
    * raster properties are the portable witness. */
  def multimodalImageDecode(docs: DataFrame): DataFrame =
    imageDecodeProjection(decodeFeatures(imageTable(docs)))

  /** [[multimodalImageDecode]] against the STAGED image table: synthesis
    * runs once per corpus dir; every serve/bench pass measures the real
    * decode over stored payloads. Row-identical (same ids → same PNGs →
    * same rasters; asserted in tests). */
  def multimodalImageDecodeStaged(spark: SparkSession, sfDir: String): DataFrame =
    imageDecodeProjection(decodeFeatures(stagedImageTable(spark, sfDir)))

  private def imageDecodeProjection(decoded: Dataset[MediaFeatures]): DataFrame =
    decoded.toDF()
      .select(
        col("media_id"), col("width"), col("height"),
        element_at(col("feature"), 5).cast("int").as("channels"),
        element_at(col("feature"), 1).as("r_mean"),
        element_at(col("feature"), 2).as("g_mean"),
        element_at(col("feature"), 3).as("b_mean"),
        element_at(col("feature"), 4).as("gray_mean"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stats" ->
      ((s, d) => multimodalDecodeStats(Fixtures.documents(s, d))),
    // staged: timed passes measure decode over stored payloads, not
    // fixture synthesis (the stagedLmModel discipline)
    "mm_img" ->
      ((s, d) => multimodalImageDecodeStaged(s, d)))

  /** The stub decode re-expressed in SQL: length/first-byte arithmetic.
    * Float feature values are k/97 single-precision quotients; the oracle
    * reproduces them with an explicit float cast before the double sum.
    */
  def oracle: Map[String, String] = Map(
    // mm_img: the synthesized PNG's dims/fill derive from doc_id, and the
    // PNG round-trip is lossless, so the decoded raster properties are
    // stated arithmetically. Division order mirrors the Scala decode
    // ((sum/n)/3.0/255.0) so the float casts agree bit-for-bit.
    "mm_img" ->
      """SELECT doc_id AS media_id,
                CAST(16 + doc_id % 64 AS INTEGER) AS width,
                CAST(16 + doc_id % 48 AS INTEGER) AS height,
                CAST(3 AS INTEGER) AS channels,
                CAST((doc_id*37 % 256)/255.0 AS FLOAT) AS r_mean,
                CAST((doc_id*59 % 256)/255.0 AS FLOAT) AS g_mean,
                CAST((doc_id*83 % 256)/255.0 AS FLOAT) AS b_mean,
                CAST(((doc_id*37 % 256)+(doc_id*59 % 256)+(doc_id*83 % 256))/3.0/255.0
                     AS FLOAT) AS gray_mean
         FROM documents""",
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
