package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside. The Spark-side machinery —
  * schema, batched per-partition decode, frame sampling, feature columns — is
  * real and tested. Three codec tiers plug into it: the in-JVM
  * `javax.imageio` path ([[decodeImage]]/[[resizeImage]] — real PNG/BMP
  * raster decode, spec-driven over encoded fixtures), the in-JVM
  * `javax.sound.sampled` path ([[decodeAudio]] — real WAV/PCM parse +
  * RMS level, spec-driven over encoded fixtures), and a deterministic
  * STUB ([[decodeStub]]/[[resizeStub]]) standing in for the native codecs
  * this container lacks (libjpeg/ffmpeg video), which stays the ORACLE
  * variant because DuckDB can recompute its arithmetic.
  *
  * Scale design: payload bytes stay columnar in parquet and are never
  * shuffled — decode/feature-extract are mapPartitions-style row-local
  * transforms; only the small extracted features flow into joins/aggregates
  * downstream.
  */
object Multimodal {

  /** A media row: payload + metadata (mirrors an image-table schema). */
  final case class MediaRow(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      n_bytes: Int)

  /** Extracted features for one media item. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      channels: Int,
      mean_intensity: Double)

  /** Build a media table from `documents` (text bytes stand in for encoded
    * media payloads; a real pipeline reads payloads from parquet the same
    * way).
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        length(encode(col("text"), "UTF-8")).as("n_bytes"))
      .as[MediaRow]
  }

  /** STUB DECODER — deterministic fake standing in for a real codec
    * (e.g. libjpeg / ffmpeg). Consumes the payload bytes in fixed-size
    * batches exactly as a vectorized decode would; returns a fake channel
    * count and mean "intensity" derived from the bytes so tests have stable
    * expectations. Swap the body for a real decoder without touching the
    * Spark plumbing around it.
    */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val channels = if (row.media_type == "image") 3 else 1
    // fake "decode": mean unsigned byte value, batch-processed
    val sum = row.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
    val mean = if (row.payload.isEmpty) 0.0 else sum.toDouble / row.payload.length
    MediaFeatures(row.doc_id, row.media_type, row.n_bytes, channels, mean)
  }

  /** REAL CODEC tier — `javax.imageio` (PNG/BMP/GIF decode ship with the
    * JVM; no native libraries needed): channels = the raster's band
    * count, mean_intensity = the mean of every pixel's every band value
    * (0–255) — the actual quantity the stub's mean-byte fake stands in
    * for. Plugs into the SAME [[extractFeatures]] plumbing as
    * [[decodeStub]]; the stub stays the ORACLE variant (DuckDB can
    * recompute mean code points, not PNG rasters), this is the variant
    * MultimodalImageSpec drives over real encoded images.
    */
  def decodeImage(row: MediaRow): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
    require(img != null, s"payload of doc ${row.doc_id} is not a decodable image")
    val raster = img.getRaster
    val bands = raster.getNumBands
    var sum = 0L
    var n = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        var b = 0
        while (b < bands) { sum += raster.getSample(x, y, b); n += 1; b += 1 }
        x += 1
      }
      y += 1
    }
    MediaFeatures(row.doc_id, row.media_type, row.n_bytes, bands,
      if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Extracted features for one audio item (the audio analogue of
    * [[MediaFeatures]]): PCM stream facts plus RMS level.
    */
  final case class AudioFeatures(
      doc_id: Long,
      n_bytes: Int,
      channels: Int,
      sample_rate: Double,
      n_frames: Long,
      duration_s: Double,
      rms: Double)

  /** REAL AUDIO CODEC tier — `javax.sound.sampled` (WAV/AIFF/AU PCM
    * parse ships with the JVM; no native libraries): container header →
    * (channels, sample rate, frame count, duration), then one pass over
    * the 16-bit PCM samples for the RMS level — the loudness feature a
    * training-data audio filter cuts on (silence / clipped uploads).
    * Row-local like [[decodeImage]]; plugs into [[extractAs]].
    */
  def decodeAudio(row: MediaRow): AudioFeatures = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(row.payload))
    try {
      val fmt = in.getFormat
      require(
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16,
        s"doc ${row.doc_id}: only 16-bit signed PCM supported, got $fmt")
      val big = fmt.isBigEndian
      val buf = new Array[Byte](8192)
      var ss = 0.0
      var n = 0L
      var carry = -1 // pending first byte of a split sample across reads
      var read = in.read(buf)
      while (read > 0) {
        var i = 0
        if (carry >= 0 && read >= 1) {
          val v = if (big) (carry << 8) | (buf(0) & 0xff)
                  else ((buf(0) & 0xff) << 8) | carry
          val s16 = v.toShort / 32768.0
          ss += s16 * s16; n += 1; i = 1; carry = -1
        }
        while (i + 1 < read) {
          val v = if (big) ((buf(i) & 0xff) << 8) | (buf(i + 1) & 0xff)
                  else ((buf(i + 1) & 0xff) << 8) | (buf(i) & 0xff)
          val s16 = v.toShort / 32768.0
          ss += s16 * s16; n += 1; i += 2
        }
        if (i < read) carry = buf(i) & 0xff
        read = in.read(buf)
      }
      val frames = in.getFrameLength
      AudioFeatures(row.doc_id, row.n_bytes, fmt.getChannels,
        fmt.getSampleRate.toDouble, frames,
        if (fmt.getFrameRate > 0) frames / fmt.getFrameRate.toDouble else 0.0,
        if (n == 0) 0.0 else math.sqrt(ss / n))
    } finally in.close()
  }

  /** [[extractFeatures]] generalized over the output row type, so codec
    * tiers with different feature schemas ([[decodeAudio]]) reuse the
    * identical batched per-partition plumbing.
    */
  def extractAs[T: org.apache.spark.sql.Encoder](
      media: Dataset[MediaRow], batchSize: Int, decoder: MediaRow => T): Dataset[T] =
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup would happen here
        batch.iterator.map(decoder)
      }
    }

  /** Batched per-partition decode: the real pattern for codec-heavy work —
    * amortizes per-batch setup (codec contexts, buffers) across rows and
    * keeps the decode row-local (no shuffle). `decoder` selects the codec
    * ([[decodeStub]] for the oracle-checked fake, [[decodeImage]] for the
    * real in-JVM image path) without touching the plumbing.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64,
      decoder: MediaRow => MediaFeatures = decodeStub): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    extractAs(media, batchSize, decoder)
  }

  /** Frame sampling: keep every `stride`-th fixed-size chunk of the payload
    * (the video-frame-subsample shape; chunks stand in for frames).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      row.payload.grouped(frameBytes).zipWithIndex.collect {
        case (frame, i) if i % stride == 0 => (row.doc_id, i, frame)
      }
    }.toDF("doc_id", "frame_no", "frame")
  }

  /** One decoded video frame's features. */
  final case class VideoFrame(
      doc_id: Long, frame_no: Int, width: Int, height: Int,
      mean_intensity: Double)

  /** REAL VIDEO tier — multi-frame container decode via
    * `javax.imageio`'s sequence reader (animated GIF: the one motion
    * format the JVM decodes without native codecs — ffmpeg-class
    * libraries are absent in this container, which is exactly the
    * boundary the stub tier documents). Retains every `stride`-th frame
    * (mm3's sampling rule) and computes the per-frame mean raster
    * intensity — the real quantity [[sampleFrames]]'s byte-chunk fake
    * stands in for. Row-local; MultimodalVideoSpec drives it over
    * in-test-encoded animated GIFs.
    */
  def decodeVideoFrames(row: MediaRow, stride: Int): Seq[VideoFrame] = {
    require(stride >= 1, "stride must be >= 1")
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(row.payload))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, s"payload of doc ${row.doc_id} has no image reader")
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n).collect {
        case i if i % stride == 0 =>
          val img = reader.read(i)
          // measure through the COLOR MODEL, not raw raster samples: GIF
          // frames are palette-indexed, so a raster sample is a palette
          // INDEX — getRGB resolves it to the actual color
          var sum = 0L
          var cnt = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              cnt += 3
              x += 1
            }
            y += 1
          }
          VideoFrame(row.doc_id, i, img.getWidth, img.getHeight,
            if (cnt == 0) 0.0 else sum.toDouble / cnt)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** The video twin of [[extractAs]]: batched per-partition multi-frame
    * decode, frames exploded row-locally — payload bytes never shuffle,
    * only the small per-frame feature rows leave the partition.
    */
  def sampleVideoFrames(media: Dataset[MediaRow], stride: Int,
      batchSize: Int = 16): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup would happen here
        batch.iterator.flatMap(decodeVideoFrames(_, stride))
      }
    }
  }

  /** STUB RESIZE — deterministic fake standing in for a real image/audio
    * resampler: keep every `factor`-th payload byte (nearest-neighbor
    * downsampling on the byte plane). Row-local like the decode; swap the
    * body for a real resampler without touching the Spark plumbing.
    */
  def resizeStub(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { row =>
      val resized = row.payload.grouped(factor).map(_.head).toArray
      row.copy(payload = resized, n_bytes = resized.length)
    }
  }

  /** REAL RESIZE — decode, nearest-neighbor rescale to `width`x`height`
    * via Graphics2D, re-encode with `javax.imageio` (PNG by default:
    * lossless, so a round-trip preserves pixel values exactly — what the
    * resize spec asserts). Same row-local map shape as [[resizeStub]].
    */
  def resizeImage(media: Dataset[MediaRow], width: Int, height: Int,
      format: String = "png"): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { row =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
      require(img != null, s"payload of doc ${row.doc_id} is not a decodable image")
      val out = new java.awt.image.BufferedImage(width, height,
        if (img.getType == java.awt.image.BufferedImage.TYPE_CUSTOM)
          java.awt.image.BufferedImage.TYPE_INT_RGB
        else img.getType)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, width, height, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(out, format, bos),
        s"no $format encoder available")
      val bytes = bos.toByteArray
      row.copy(payload = bytes, n_bytes = bytes.length)
    }
  }

  /** Oracle-checked slices of the plumbing. mm1 is pure column work; mm2
    * runs the REAL typed mapPartitions decode path (the stub decoder is
    * deterministic — mean unsigned byte value — so DuckDB can recompute
    * it from the text's code points); mm3 runs the frame sampler.
    */
  val all: Seq[Q] = Seq(
    Q(
      "mm1_binary_meta",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("media_type"),
            length(encode(col("text"), "UTF-8")).as("n_bytes"),
            md5(col("text")).as("content_hash"))
          .withColumn("shard", pmod(col("n_bytes"), lit(16)))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
             |  CAST(strlen(text) AS INT) AS n_bytes,
             |  md5(text) AS content_hash,
             |  CAST(strlen(text) % 16 AS INT) AS shard
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // The batched per-partition decode path end-to-end (mediaTable →
    // extractFeatures). Payloads are ASCII text bytes, so the stubbed
    // mean intensity equals the mean code point — oracle-expressible.
    Q(
      "mm2_media_features",
      (s, dir) =>
        extractFeatures(mediaTable(s, dir))
          .toDF()
          .select("doc_id", "media_type", "n_bytes", "channels", "mean_intensity")
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
             |  CAST(strlen(text) AS INT) AS n_bytes,
             |  CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INT) AS channels,
             |  CAST(list_sum(list_transform(generate_series(1, strlen(text)),
             |         i -> ascii(text[i]))) AS DOUBLE) / strlen(text) AS mean_intensity
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Resize: the typed downsampling path end-to-end — every 4th payload
    // byte survives; the oracle recomputes the surviving characters.
    Q(
      "mm4_resize",
      (s, dir) =>
        resizeStub(mediaTable(s, dir), factor = 4)
          .toDF()
          .select(
            col("doc_id"),
            col("n_bytes").as("resized_bytes"),
            decode(col("payload"), "UTF-8").as("resized_payload"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(p) AS INT) AS resized_bytes,
             |  array_to_string(p, '') AS resized_payload
             |FROM (SELECT doc_id,
             |        list_transform(generate_series(0, CAST((strlen(text) - 1) // 4 AS INT)),
             |          i -> text[CAST(i * 4 + 1 AS INT)]) AS p
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)
    ),

    // Frame sampling: every 2nd 32-byte chunk of the payload (frames
    // decoded back to text for the oracle compare).
    Q(
      "mm3_frame_sample",
      (s, dir) =>
        sampleFrames(mediaTable(s, dir), frameBytes = 32, stride = 2)
          .select(
            col("doc_id"),
            col("frame_no").cast("long").as("frame_no"),
            decode(col("frame"), "UTF-8").as("frame"))
          .orderBy("doc_id", "frame_no"),
      Some("""SELECT doc_id, u AS frame_no, substr(text, CAST(u * 32 + 1 AS INT), 32) AS frame
             |FROM (SELECT doc_id, text,
             |        unnest(generate_series(0, CAST((strlen(text) - 1) // 32 AS INT))) AS u
             |      FROM documents)
             |WHERE u % 2 = 0 ORDER BY doc_id, frame_no""".stripMargin)
    ),

    // MM5: perceptual-hash near-dup over the media payloads — image
    // dedup's difference-hash (dHash) shape on the byte plane: 32
    // gradient bits from 33 evenly spaced payload samples, then the
    // SimHash pairing discipline (dd5): candidates share one of four
    // 8-bit bands (never all-pairs), survivors verified by hamming
    // distance on the full hash. A real deployment swaps the sampled
    // byte gradient for the resized-grayscale gradient the decode stub
    // stands in for; banding, verification, and the integer-only hash
    // algebra (both engines compute identical BIGINTs) are the
    // deliverable. One shuffle on (band-slot, band-value).
    Q(
      "mm5_phash_neardup",
      (s, dir) => {
        val h = expr(
          """aggregate(
            |  transform(sequence(0, 31), i ->
            |    IF(ascii(substring(text, CAST(i * length(text) / 33 AS INT) + 1, 1)) >
            |       ascii(substring(text, CAST((i + 1) * length(text) / 33 AS INT) + 1, 1)),
            |       shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
            |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin)
        val hashes = graft.CacheScope.track(
          Tables(s, dir, "documents")
            .filter(col("doc_id") % 2 === 0) // the image half of the corpus
            .select(col("doc_id"), h.as("h"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val bands = hashes.select(
          col("doc_id"), col("h"), explode(sequence(lit(0), lit(3))).as("k"))
          .withColumn("band", expr("shiftright(h, CAST(k * 8 AS INT)) & 255"))
        val cand = bands.as("a")
          .join(bands.as("b"),
            col("a.k") === col("b.k") && col("a.band") === col("b.band") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("doc_a"), col("a.h").as("ha"),
            col("b.doc_id").as("doc_b"), col("b.h").as("hb"))
          .distinct()
        cand
          .withColumn("hamming",
            bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
          .filter(col("hamming") <= 8)
          .select("doc_a", "doc_b", "hamming")
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH h AS (SELECT doc_id,
             |    CAST(list_sum(list_transform(generate_series(0, 31), i ->
             |      CASE WHEN ascii(substr(text, (i * length(text)) // 33 + 1, 1)) >
             |                ascii(substr(text, ((i + 1) * length(text)) // 33 + 1, 1))
             |           THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS h
             |  FROM documents WHERE doc_id % 2 = 0),
             |b AS (SELECT doc_id, h, unnest(generate_series(0, 3)) AS k FROM h),
             |bb AS (SELECT doc_id, h, k, (h >> CAST(k * 8 AS INT)) & 255 AS band FROM b),
             |cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.h AS ha, c.doc_id AS doc_b, c.h AS hb
             |         FROM bb a JOIN bb c ON a.k = c.k AND a.band = c.band AND a.doc_id < c.doc_id)
             |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
             |FROM cand WHERE bit_count(xor(ha, hb)) <= 8
             |ORDER BY doc_a, doc_b""".stripMargin)
    )
  )
}
