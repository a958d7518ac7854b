package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media travel
  * as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per partition in bounded batches so a row
  * group of large blobs never materializes at once.
  *
  * IMAGE decode is REAL: the JDK ships PNG/JPEG/BMP/GIF codecs in
  * `javax.imageio`, so width/height probing, average-pooled grayscale
  * features, and resize all run on actual pixels with zero external
  * dependencies. AUDIO decode is REAL for uncompressed PCM: the JDK
  * ships WAV/AIFF/AU readers in `javax.sound.sampled`, so sample
  * decode, RMS-grid features, and duration probing run on actual
  * samples. VIDEO and compressed-audio kernels remain STUBBED with a
  * deterministic fake (the JDK has no such codecs and this container
  * cannot fetch any) — clearly marked below. Everything around the
  * kernels is real and load-bearing at scale: the schema contract, the
  * mapPartitions batch shape (the Scala analog of a pandas_udf/
  * mapInPandas batch), partition sizing by byte budget, and the
  * frame-sampling row expansion.
  */
object Multimodal {

  // BufferedImage/Graphics2D need no display; make that explicit so
  // executor JVMs never try to open one
  System.setProperty("java.awt.headless", "true")

  /** The codec seam: a pluggable, serializable per-blob decoder that
    * ships to executors inside the `mapPartitions` closure. A build
    * that links ffmpeg (or any other codec library) implements this
    * one method and passes it to `extractFeatures` — the batch shape,
    * byte budgeting, and schema contract stay identical. Return None
    * for payloads the decoder does not claim; the kernel falls through
    * to the next decoder in the chain and ultimately to the
    * deterministic stub, so a partial decoder never fails a task.
    *
    * THIS CONTRACT IS FINAL (round 17): registration = implement
    * `decode`, compose with [[MediaDecoder.orElse]] ahead of
    * [[JdkDecoder]], pass via `extractFeatures(decoder = ...)` — the
    * shape the OperatorsSpec "injectable decoder seam" test pins
    * end-to-end with a fake video codec. Video/compressed-audio
    * kernels stay honestly stubbed in THIS offline build (no JDK
    * codecs exist and none can be fetched); everything around the
    * kernel — dispatch, chaining, batching, schema — is real and
    * spec-tested, so linking a codec library is a one-method change.
    */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, content: Array[Byte], dims: Int): Option[Array[Float]]

    /** Chain decoders: try `this`, fall back to `other` (ffmpeg first,
      * JDK built-ins second is the expected composition).
      */
    final def orElse(other: MediaDecoder): MediaDecoder = {
      val first = this
      new MediaDecoder {
        def decode(kind: String, content: Array[Byte], dims: Int): Option[Array[Float]] =
          first.decode(kind, content, dims).orElse(other.decode(kind, content, dims))
      }
    }
  }

  /** Default decoder: the JDK's real codecs — imageio for images, PCM
    * WAV/AIFF/AU for audio. Video and compressed audio are not claimed
    * (None), so they reach the stub unless a custom decoder is chained
    * in front.
    */
  object JdkDecoder extends MediaDecoder {
    def decode(kind: String, content: Array[Byte], dims: Int): Option[Array[Float]] =
      kind match {
        case "image" => decodeImage(content).map(imageFeatures(_, dims))
        case "audio" => decodeAudio(content).map { case (s, _) => audioFeatures(s, dims) }
        case _       => None
      }
  }

  /** Canonical media schema: content + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  // ---------------- real image kernels (JDK codecs) ----------------

  private def decodeImage(content: Array[Byte]): Option[BufferedImage] =
    if (content == null) None
    else try Option(ImageIO.read(new ByteArrayInputStream(content)))
    catch { case _: Exception => None }

  private def scaleTo(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    out
  }

  /** Average-pooled grayscale over a √dims × √dims grid → dims floats
    * in [0,1] — a real (if tiny) image embedding: downscale with
    * bilinear interpolation, then per-cell luminance.
    */
  private def imageFeatures(img: BufferedImage, dims: Int): Array[Float] = {
    val side = math.max(1, math.sqrt(dims.toDouble).toInt)
    val small = scaleTo(img, side, side)
    val feats = Array.fill(dims)(0.0f)
    var i = 0
    while (i < side * side && i < dims) {
      val rgb = small.getRGB(i % side, i / side)
      val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
      feats(i) = ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat
      i += 1
    }
    feats
  }

  // ---------------- real audio kernels (JDK codecs) ----------------
  // The JDK ships PCM WAV/AIFF/AU readers in `javax.sound.sampled` —
  // uncompressed audio decodes for real, like images. Compressed
  // codecs (mp3/aac/ogg) still take the stub below behind the
  // documented ffmpeg seam.

  /** Decode PCM audio to mono float samples in [-1, 1] plus the sample
    * rate. Channels average down to mono; 8-bit (signed/unsigned) and
    * 16/24/32-bit signed PCM in either endianness are handled directly
    * from the frame bytes — no float conversion service needed, so this
    * works on a stock executor JVM.
    */
  private[operators] def decodeAudio(content: Array[Byte]): Option[(Array[Float], Float)] =
    if (content == null) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        import javax.sound.sampled.AudioFormat.Encoding._
        val enc = fmt.getEncoding
        if (enc != PCM_SIGNED && enc != PCM_UNSIGNED) None
        else {
          val bytesPerSample = (fmt.getSampleSizeInBits + 7) / 8
          val channels = fmt.getChannels
          val frameBytes = bytesPerSample * channels
          val raw = in.readAllBytes()
          val nFrames = raw.length / frameBytes
          val mono = new Array[Float](nFrames)
          val big = fmt.isBigEndian
          val signed = enc == PCM_SIGNED
          val full = 1L << (bytesPerSample * 8 - 1)
          var i = 0
          while (i < nFrames) {
            var acc = 0.0
            var c = 0
            while (c < channels) {
              val off = i * frameBytes + c * bytesPerSample
              var v = 0L
              var b = 0
              while (b < bytesPerSample) {
                val byteVal = raw(off + (if (big) b else bytesPerSample - 1 - b)) & 0xFF
                v = (v << 8) | byteVal
                b += 1
              }
              // sign-extend signed PCM; center unsigned PCM on zero
              val s = if (signed) (v << (64 - bytesPerSample * 8)) >> (64 - bytesPerSample * 8)
                      else v - full
              acc += s.toDouble / full
              c += 1
            }
            mono(i) = (acc / channels).toFloat
            i += 1
          }
          Some((mono, fmt.getSampleRate))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** RMS-grid features over mono samples: `dims` equal time cells, each
    * cell's root-mean-square amplitude — the audio analog of the
    * average-pooled grayscale grid, and a real (if tiny) waveform
    * embedding. Empty audio → zeros.
    */
  private[operators] def audioFeatures(samples: Array[Float], dims: Int): Array[Float] = {
    val feats = Array.fill(dims)(0.0f)
    val n = samples.length
    if (n == 0) return feats
    var cell = 0
    while (cell < dims) {
      val lo = (cell.toLong * n / dims).toInt
      val hi = ((cell + 1).toLong * n / dims).toInt
      if (hi > lo) {
        var acc = 0.0
        var i = lo
        while (i < hi) { acc += samples(i).toDouble * samples(i); i += 1 }
        feats(cell) = math.sqrt(acc / (hi - lo)).toFloat
      }
      cell += 1
    }
    feats
  }

  /** ===== STUB ===== deterministic fake for VIDEO and compressed audio
    * only: the JDK has no codecs for these and none can be fetched
    * offline. (PCM WAV/AIFF/AU audio decodes for REAL above.) The fake
    * derives "samples" from a content hash so tests are stable and the
    * per-row kernel cost is representative; a real build links ffmpeg
    * here behind the same per-partition batch shape.
    */
  private def stubDecodeFeatures(content: Array[Byte], dims: Int): Array[Float] = {
    if (content == null) return Array.fill(dims)(0.0f)
    var h = 1125899906842597L
    content.foreach(b => h = 31 * h + b)
    Array.tabulate(dims) { i =>
      val x = java.lang.Long.rotateLeft(h, i % 63) * 0x9E3779B97F4A7C15L
      ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  /** Feature extraction over the binary column: per-partition batched
    * mapPartitions (the pandas_udf batch analog). `batchBytes` bounds
    * how much media is resident per batch — the partition-sizing knob
    * that matters at 100 TB (pair with
    * spark.sql.files.maxPartitionBytes at read time). Image rows
    * decode for real; audio/video take the stub kernel; undecodable
    * images fall back to the stub rather than failing the task.
    */
  def extractFeatures(df: DataFrame, dims: Int = 16,
                      batchBytes: Long = 64L << 20,
                      decoder: MediaDecoder = JdkDecoder): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val contentIdx = df.schema.fieldIndex("content")
    val kindIdx = df.schema.fieldIndex("kind")
    df.mapPartitions { rows =>
      // bounded batches: accumulate up to batchBytes of payload, flush
      new Iterator[Row] {
        private val buf = scala.collection.mutable.Queue.empty[Row]
        private def refill(): Unit = {
          var bytes = 0L
          while (rows.hasNext && bytes < batchBytes) {
            val r = rows.next()
            val content = r.get(contentIdx).asInstanceOf[Array[Byte]]
            bytes += (if (content == null) 0 else content.length)
            // decoder chain first (custom codecs, then JDK built-ins by
            // default); unclaimed/undecodable payloads take the
            // deterministic ===== STUB ===== kernel instead of failing
            val feats = decoder.decode(r.getString(kindIdx), content, dims)
              .getOrElse(stubDecodeFeatures(content, dims))
            buf.enqueue(Row.fromSeq(r.toSeq :+ feats.toSeq))
          }
        }
        def hasNext: Boolean = { if (buf.isEmpty) refill(); buf.nonEmpty }
        def next(): Row = { if (buf.isEmpty) refill(); buf.dequeue() }
      }
    }
  }

  /** Probe real metadata from the bytes: image rows get (mime, width,
    * height) from an actual decode — the ingest-time sanity pass that
    * catches mislabeled/corrupt media before a 100 TB job wastes a
    * shuffle on it.
    */
  def probeMeta(df: DataFrame, batchBytes: Long = 64L << 20): DataFrame = {
    val probed = StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    val outSchema = df.schema.add("probed", probed)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.map { r =>
        val content = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val image = (for {
          bytes <- Option(content)
          iis <- Option(ImageIO.createImageInputStream(new ByteArrayInputStream(bytes)))
          reader <- {
            val it = ImageIO.getImageReaders(iis)
            if (it.hasNext) Some(it.next()) else None
          }
        } yield try {
          reader.setInput(iis)
          Row("image/" + reader.getFormatName.toLowerCase,
            reader.getWidth(0), reader.getHeight(0), null)
        } finally reader.dispose())
        // not an image: try the real audio header (file-type probe reads
        // the container header only, no full decode)
        val p = image.orElse(for {
          bytes <- Option(content)
          aff <- try Option(javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new ByteArrayInputStream(bytes))) catch { case _: Exception => None }
        } yield {
          val fmt = aff.getFormat
          val durMs =
            if (aff.getFrameLength > 0 && fmt.getFrameRate > 0)
              (aff.getFrameLength * 1000.0 / fmt.getFrameRate).toLong
            else null
          Row("audio/" + aff.getType.getExtension.toLowerCase, null, null, durMs)
        }).getOrElse(Row(null, null, null, null))
        Row.fromSeq(r.toSeq :+ p)
      }
    }
  }

  /** Real image resize: decode → bilinear scale → re-encode (PNG),
    * emitted as a `resized` binary column; non-image or undecodable
    * rows carry null. Batched like extractFeatures.
    */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    val outSchema = df.schema.add("resized", BinaryType)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val contentIdx = df.schema.fieldIndex("content")
    val kindIdx = df.schema.fieldIndex("kind")
    df.mapPartitions { rows =>
      rows.map { r =>
        val resized =
          if (r.getString(kindIdx) == "image")
            decodeImage(r.get(contentIdx).asInstanceOf[Array[Byte]]).map { img =>
              val bos = new ByteArrayOutputStream()
              ImageIO.write(scaleTo(img, w, h), "png", bos)
              bos.toByteArray
            }.orNull
          else null
        Row.fromSeq(r.toSeq :+ resized)
      }
    }
  }

  /** Video frame sampling: one output row per sampled frame index,
    * derived from metadata duration — a pure row expansion (explode),
    * no decode needed until features are requested downstream.
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)),
          lit(everyMs))))

  /** Image resize request plan: records target size in metadata; the
    * actual pixel work is `resizeImages`.
    */
  def withResizeTarget(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("resize_target", struct(lit(w).as("w"), lit(h).as("h")))
}
