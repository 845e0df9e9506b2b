package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video travel as opaque
  * `binary` columns plus a typed metadata struct, and per-batch decode /
  * feature-extraction runs inside `mapPartitions` so one task processes a
  * whole batch of payloads (the Scala analog of `mapInPandas`).
  *
  * Decode is REAL for two fixed-header formats that need no codec libs:
  * 24-bit uncompressed BMP ([[decodeBmp24]] — bottom-up/top-down rows,
  * BGR order, 4-byte row padding) and 16-bit PCM mono WAV
  * ([[decodeWavPcm16]] — RIFF chunk walk, unknown chunks skipped).  The
  * matching encoders exist so fixtures are generated in-test/in-query and
  * the decode path is verified against an independent oracle computing
  * the same statistics from the source pattern.  Payloads in any OTHER
  * format fall back to [[byteFeatures]] — deterministic features over the
  * raw bytes — which keeps the batch plumbing exercised for opaque
  * modalities (a jpeg/ffmpeg decoder would slot into the same dispatch).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  /** Fallback featurizer for OPAQUE payload formats — deterministic
    * features from the raw bytes (FNV fold → mixed per-dimension).  Not a
    * media decode; the real decoders below handle the supported formats.
    */
  def byteFeatures(payload: Array[Byte], featureDim: Int): Array[Float] =
    fnvFeatures(0xCBF29CE484222325L, payload, featureDim)

  /** [[byteFeatures]] with a 4-byte big-endian `tag` folded into the FNV
    * state FIRST — bit-identical to hashing `[tag bytes] ++ payload`
    * without materializing the concatenation (so a per-frame caller does
    * zero payload copies).
    */
  def taggedByteFeatures(payload: Array[Byte], featureDim: Int, tag: Int): Array[Float] = {
    var h = 0xCBF29CE484222325L
    var t = 24
    while (t >= 0) { h = (h ^ ((tag >>> t) & 0xFF).toLong) * 0x100000001B3L; t -= 8 }
    fnvFeatures(h, payload, featureDim)
  }

  private def fnvFeatures(seed: Long, payload: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    var h = seed
    var i = 0
    while (i < payload.length) { h = (h ^ (payload(i) & 0xFFL)) * 0x100000001B3L; i += 1 }
    var d = 0
    while (d < featureDim) {
      out(d) = (Hashing.mix64(h ^ d.toLong).toDouble / Long.MaxValue.toDouble).toFloat
      d += 1
    }
    out
  }

  // ---- real 24-bit BMP codec (BITMAPFILEHEADER + BITMAPINFOHEADER) ------

  /** Encode a top-down RGB byte array (3 bytes/pixel, row-major) as a
    * standard bottom-up 24-bit uncompressed BMP with 4-byte row padding.
    */
  def encodeBmp24(width: Int, height: Int, rgbTopDown: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(rgbTopDown.length == width * height * 3,
      s"pixel array ${rgbTopDown.length} != ${width * height * 3}")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val imageSize = rowSize * height
    val buf = java.nio.ByteBuffer.allocate(54 + imageSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, bottom-up
      .putShort(1).putShort(24).putInt(0)       // planes, bpp, BI_RGB
      .putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // rows stored bottom-up
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        buf.put(rgbTopDown(p + 2)).put(rgbTopDown(p + 1)).put(rgbTopDown(p)) // BGR
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a 24-bit uncompressed BMP to (width, height, top-down RGB
    * bytes).  Handles both bottom-up (positive biHeight) and top-down
    * (negative) row orders and the 4-byte row padding; rejects anything
    * that is not plain BI_RGB 24bpp.
    */
  def decodeBmp24(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(payload.length >= 54, s"BMP too short: ${payload.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte, "not a BMP (magic)")
    val pixelOffset = buf.getInt(10)
    val dibSize = buf.getInt(14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    require(bpp == 24, s"only 24bpp supported, got $bpp")
    require(compression == 0, s"only BI_RGB supported, got compression=$compression")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    val rowSize = ((width * 3 + 3) / 4) * 4
    require(payload.length >= pixelOffset + rowSize * height,
      s"truncated pixel data: need ${pixelOffset + rowSize * height}, have ${payload.length}")
    val rgb = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      val srcY = if (topDown) row else height - 1 - row // storage row of output row
      val base = pixelOffset + srcY * rowSize
      var x = 0
      while (x < width) {
        val p = (row * width + x) * 3
        rgb(p) = payload(base + x * 3 + 2)     // R
        rgb(p + 1) = payload(base + x * 3 + 1) // G
        rgb(p + 2) = payload(base + x * 3)     // B
        x += 1
      }
      row += 1
    }
    (width, height, rgb)
  }

  // ---- real 16-bit PCM mono WAV codec (RIFF) ----------------------------

  /** Encode 16-bit PCM mono samples as a standard RIFF/WAVE file. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                // PCM
      .putShort(1)                // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)     // byte rate
      .putShort(2)                // block align
      .putShort(16)               // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decode a RIFF/WAVE payload to (sampleRate, samples).  Walks the chunk
    * list (skipping unknown chunks, honoring the odd-size pad byte), so
    * files with extra LIST/INFO chunks decode fine; rejects non-PCM,
    * non-mono, or non-16-bit streams.
    */
  def decodeWavPcm16(payload: Array[Byte]): (Int, Array[Short]) = {
    require(payload.length >= 12, s"WAV too short: ${payload.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      new String(payload, off, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE", "not a RIFF/WAVE file")
    var pos = 12
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= payload.length && (sampleRate < 0 || dataOff < 0)) {
      val id = fourcc(pos)
      val size = buf.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size <= payload.length,
        s"truncated chunk $id at $pos (size=$size)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val audioFormat = buf.getShort(pos + 8).toInt
          val channels = buf.getShort(pos + 10).toInt
          val bits = buf.getShort(pos + 22).toInt
          require(audioFormat == 1, s"only PCM supported, got format=$audioFormat")
          require(channels == 1, s"only mono supported, got $channels channels")
          require(bits == 16, s"only 16-bit supported, got $bits")
          sampleRate = buf.getInt(pos + 12)
        case "data" => dataOff = pos + 8; dataLen = size
        case _      => () // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = buf.getShort(dataOff + i * 2); i += 1 }
    (sampleRate, samples)
  }

  /** Features from a decoded image: dimensions, per-channel means, and a
    * global std — truncated/zero-padded to `featureDim`.
    */
  private def imageFeatures(payload: Array[Byte], featureDim: Int): Array[Float] = {
    val (w, h, rgb) = decodeBmp24(payload)
    var sr = 0L; var sg = 0L; var sb = 0L; var ss = 0L
    var i = 0
    while (i < rgb.length) {
      val v = rgb(i) & 0xFF
      (i % 3) match {
        case 0 => sr += v
        case 1 => sg += v
        case _ => sb += v
      }
      ss += v.toLong * v
      i += 1
    }
    val n = (w * h).toDouble
    val mean = (sr + sg + sb) / (3 * n)
    val variance = ss / (3 * n) - mean * mean
    val full = Array[Float](w.toFloat, h.toFloat,
      (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
      math.sqrt(math.max(variance, 0.0)).toFloat)
    java.util.Arrays.copyOf(full, featureDim)
  }

  /** Features from decoded audio: length, rate, mean, rms, min, max. */
  private def audioFeatures(payload: Array[Byte], featureDim: Int): Array[Float] = {
    val (rate, samples) = decodeWavPcm16(payload)
    var s = 0L; var ss = 0L
    var mn = Int.MaxValue; var mx = Int.MinValue
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toInt
      s += v; ss += v.toLong * v
      if (v < mn) mn = v; if (v > mx) mx = v
      i += 1
    }
    val n = math.max(samples.length, 1).toDouble
    val full = Array[Float](samples.length.toFloat, rate.toFloat,
      (s / n).toFloat, math.sqrt(ss / n).toFloat,
      (if (samples.isEmpty) 0 else mn).toFloat,
      (if (samples.isEmpty) 0 else mx).toFloat)
    java.util.Arrays.copyOf(full, featureDim)
  }

  /** Format-dispatched decode: real BMP/WAV parsing for the supported
    * formats, [[byteFeatures]] for anything else.
    */
  def decodeFeatures(payload: Array[Byte], format: String, featureDim: Int): Array[Float] =
    format match {
      case "bmp/rgb24"  => imageFeatures(payload, featureDim)
      case "wav/pcm16"  => audioFeatures(payload, featureDim)
      case _            => byteFeatures(payload, featureDim)
    }

  /** Wrap a text table as fake media rows (fixture adapter: the driver
    * testdata has no binary table, so payload = UTF-8 bytes).
    */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("modality"),
      col(textCol).cast("binary").as("payload"),
      struct(
        (length(col(textCol)) % 640 + 32).cast("int").as("width"),
        (length(col(textCol)) % 480 + 32).cast("int").as("height"),
        lit("fake/raw").as("format")).as("meta"))

  /** Batch feature extraction over the payload column: one decode call
    * per row (dispatched on `meta.format` — real BMP/WAV parse for the
    * supported formats, byte features otherwise), batched per partition;
    * output is (media_id, modality, byte_len, features) — the `meta`
    * struct does not pass through (join it back on media_id downstream).
    */
  def extractFeatures(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("byte_len", LongType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = media.schema.fieldIndex("media_id")
    val modIdx = media.schema.fieldIndex("modality")
    val payIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        val meta = if (r.isNullAt(metaIdx)) null else r.getStruct(metaIdx)
        val format =
          if (meta == null || meta.isNullAt(2)) "" else meta.getString(2)
        val feats =
          if (payload == null) null else decodeFeatures(payload, format, featureDim)
        Row(r.getLong(idIdx), r.getString(modIdx),
          if (payload == null) 0L else payload.length.toLong,
          if (feats == null) null else feats.toSeq)
      }
    }
    media.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Resize/frame-sample style metadata transform (pure column ops —
    * shows the typed-metadata path stays in codegen).
    */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame =
    media.withColumn("meta",
      struct(
        least(col("meta.width"), lit(maxDim)).as("width"),
        least(col("meta.height"), lit(maxDim)).as("height"),
        col("meta.format").as("format")))

  /** Video-style frame sampling: one payload row → `nFrames` frame rows,
    * each with its own stub-decoded feature vector (the frame index is
    * mixed into the decode so frames differ deterministically).  This is
    * the row-explosion plumbing a real frame sampler needs — partition
    * sizing must account for the ×nFrames fan-out, which is why the
    * explode happens AFTER any payload-level filtering.
    */
  def frameSample(media: DataFrame, nFrames: Int, featureDim: Int = 8): DataFrame = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = media.schema.fieldIndex("media_id")
    val payIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        if (payload == null) Iterator.empty
        else (0 until nFrames).iterator.map { f =>
          // 4-byte frame tag seeds the FNV state so each sampled frame
          // decodes differently (a single byte would wrap at 256 frames);
          // seeding instead of prepending avoids copying the payload
          // once per frame
          Row(r.getLong(idIdx), f, taggedByteFeatures(payload, featureDim, f).toSeq)
        }
      }
    }
    media.sparkSession.createDataFrame(rdd, outSchema)
  }
}
