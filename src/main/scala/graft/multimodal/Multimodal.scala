package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video assets ride through the
 * engine as opaque `binary` payloads + typed metadata, processed in
 * partition-local batches. The Spark-side machinery (schema,
 * partitioning, batch shape, feature output) is real; the codec call is
 * a clearly-marked deterministic STUB because no image/audio libraries
 * exist in this environment — swap `StubCodec.decode` for an opencv/
 * ffmpeg/JNI call and nothing else changes.
 */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val manifestSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", metaSchema)))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false)),
    StructField("frames_sampled", IntegerType, nullable = false)))

  /**
   * ======================= STUB CODEC =======================
   * Deterministic fake decoder: derives pseudo-pixels from payload
   * bytes. Replace with a real codec binding in production; the
   * signature (byte batch in, fixed-dim feature out) is the contract.
   */
  object StubCodec {
    val featureDim = 8
    def decode(payload: Array[Byte], modality: String): Array[Float] = {
      // accumulate in DOUBLE, emit float: double addition is sequential
      // IEEE and therefore reproducible verbatim in an external SQL
      // twin, whereas a float accumulator's per-step rounding is not
      val acc = new Array[Double](featureDim)
      var i = 0
      while (i < payload.length) {
        acc(i % featureDim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      val n = math.max(1, payload.length / featureDim)
      val f = new Array[Float](featureDim)
      (0 until featureDim).foreach(j => f(j) = (acc(j) / n).toFloat)
      f
    }
    def frameCount(meta: Row): Int =
      if (meta == null || meta.isNullAt(4)) 1
      else math.max(1, (meta.getLong(4) / 1000L).toInt)
  }

  /**
   * Build a manifest from any table: payload is the utf-8 of a text
   * column here (deterministic stand-in for real image/audio bytes —
   * at 100 TB this column comes from object-store binary files via
   * `spark.read.format("binaryFile")`).
   */
  def manifestFrom(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        // pmod, not %: Spark's % keeps the dividend's sign, so a
        // negative id would hit index 0 (error) or wrap from the end
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("stub").as("format"),
        (lit(32) + (col(idCol) % 7) * 64).cast("int").as("width"),
        (lit(32) + (col(idCol) % 5) * 48).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate"),
        (length(col(textCol)) * 10L).as("duration_ms")).as("meta"))

  /**
   * ==================== REAL CODEC (opt-in) ====================
   * JDK-only image decode (javax.imageio — PNG/JPEG/GIF/BMP readers
   * ship with the JRE; no new dependencies): proves the mapPartitions
   * plumbing carries a REAL pixel decode unchanged. Feature layout
   * (dim 8): [width, height, meanR, meanG, meanB, meanLuma(Rec.601),
   * pixel_count, aspect_ratio] — channel means accumulate in double
   * over the row-major pixel walk, deterministic for a given decoder.
   * An undecodable payload yields a NULL feature (a corrupt image in a
   * 100 TB manifest must not kill the job; count them downstream with
   * feature IS NULL). Audio/video have no JDK codec — they stay on the
   * stub in real mode too, keeping the swap boundary per-modality.
   */
  object ImageIoCodec {
    val featureDim = 8
    def decode(payload: Array[Byte], modality: String): Array[Float] = {
      if (modality != "image") return StubCodec.decode(payload, modality)
      // NonFatal, not just IOException: javax.imageio readers throw
      // RuntimeExceptions (ArrayIndexOutOfBounds, IllegalArgument,
      // NegativeArraySize) on malformed/truncated payloads, and the
      // contract is that a corrupt image yields NULL, never a dead task
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return null // not a decodable image
      val (w, h) = (img.getWidth, img.getHeight)
      var (r, g, b) = (0.0, 0.0, 0.0)
      var y = 0
      try {
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y) // sRGB regardless of source model
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
      } catch { case scala.util.control.NonFatal(_) => return null }
      val pixels = w.toLong * h // Int w*h overflows past 46341x46341
      val n = math.max(1L, pixels).toDouble
      val (mr, mg, mb) = (r / n / 255.0, g / n / 255.0, b / n / 255.0)
      Array(w.toFloat, h.toFloat, mr.toFloat, mg.toFloat, mb.toFloat,
        (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat,
        pixels.toFloat, (w.toDouble / math.max(1, h)).toFloat)
    }
  }

  /**
   * Batched decode over partitions: each task walks its partition once,
   * decoding payloads in-place — no shuffle, no driver involvement;
   * scale-out is purely by partition count. (mapPartitions is the
   * right tool here: imperative per-batch codec work, cf. pandas-UDF
   * batching in the PySpark world.) `real = true` swaps the stub for
   * the javax.imageio pixel decode (images only) with NOTHING else
   * changing — schema, partitioning, and batch shape are shared, which
   * is the production-shaped claim the stub gates stand in for.
   */
  def decodeFeatures(manifest: DataFrame, real: Boolean = false): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    manifest.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val modality = r.getAs[String]("modality")
        val meta = r.getAs[Row]("meta")
        val bytes = if (payload == null) Array.emptyByteArray else payload
        Row(
          r.getAs[Long]("asset_id"),
          modality,
          bytes.length,
          if (real) ImageIoCodec.decode(bytes, modality)
          else StubCodec.decode(bytes, modality),
          StubCodec.frameCount(meta))
      }
    }(enc)
  }

  /**
   * Resize planning: fit each asset's (width, height) into a bounding
   * box preserving aspect ratio (the standard image-pipeline pre-step).
   * Pure metadata arithmetic — integer floor scaling, deterministic —
   * so the actual pixel resample (a codec call) stays behind the same
   * stub boundary as decode. No shuffle; scales as a projection.
   */
  def planResize(manifest: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width").cast("long")
    val h = col("meta.height").cast("long")
    // scale = min(maxW/w, maxH/h, 1) as exact rational arithmetic:
    // out_w = floor(w * min-numerator / min-denominator) avoids float
    val wide = w * maxH >= h * maxW // width is the binding dimension
    // floor of an exact double division (operands << 2^53) — the same
    // computation is expressible verbatim in the oracle SQL
    val outW = when(w <= maxW && h <= maxH, w)
      .otherwise(when(wide, lit(maxW)).otherwise(floor((w * maxH).cast("double") / h.cast("double"))))
    val outH = when(w <= maxW && h <= maxH, h)
      .otherwise(when(wide, floor((h * maxW).cast("double") / w.cast("double"))).otherwise(lit(maxH)))
    manifest.select(
      col("asset_id"), col("modality"),
      col("meta.width").as("in_w"), col("meta.height").as("in_h"),
      outW.cast("int").as("out_w"), outH.cast("int").as("out_h"))
  }

  /** video-style frame sampling: one row per sampled frame (explode, no shuffle) */
  def sampleFrames(manifest: DataFrame, everyMs: Long): DataFrame =
    manifest
      .where(col("modality") === "video")
      .select(
        col("asset_id"),
        posexplode(sequence(lit(0L), greatest(col("meta.duration_ms") - 1, lit(0L)), lit(everyMs)))
          .as(Seq("frame_idx", "frame_ts_ms")))
}
