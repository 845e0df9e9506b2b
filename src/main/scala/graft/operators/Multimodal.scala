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
  * The actual media decode is STUBBED (`decodeStub`): the container has
  * no image/audio codecs.  The stub is deterministic (features derived
  * from the payload bytes) so the surrounding plumbing — schema, batch
  * iteration, partition sizing, downstream joins — is fully real and
  * testable; swapping in a javax.imageio / ffmpeg decoder changes only
  * that one function.
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

  /** STUB decoder — deterministic fake features from payload bytes.
    * Real implementation would decode pixels/samples here (???, requires
    * codec libs absent from this container).
    */
  def decodeStub(payload: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < payload.length) { h = (h ^ (payload(i) & 0xFFL)) * 0x100000001B3L; i += 1 }
    var d = 0
    while (d < featureDim) {
      out(d) = (Hashing.mix64(h ^ d.toLong).toDouble / Long.MaxValue.toDouble).toFloat
      d += 1
    }
    out
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
    * per row, batched per partition; output is (media_id, modality,
    * byte_len, features) — the `meta` struct does not pass through (join
    * it back on media_id downstream if needed).
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
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        val feats = if (payload == null) null else decodeStub(payload, featureDim)
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
          // 4-byte frame tag prepended so each sampled frame decodes
          // differently (a single byte would wrap at 256 frames)
          val tagged = Array[Byte](
            (f >>> 24).toByte, (f >>> 16).toByte, (f >>> 8).toByte, f.toByte) ++ payload
          Row(r.getLong(idIdx), f, decodeStub(tagged, featureDim).toSeq)
        }
      }
    }
    media.sparkSession.createDataFrame(rdd, outSchema)
  }
}
