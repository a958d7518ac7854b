package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media travel
  * as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per partition in bounded batches so a row
  * group of large blobs never materializes at once.
  *
  * The decode kernels themselves are STUBBED with a deterministic fake
  * (this container has no image/audio codecs) — clearly marked below.
  * Everything around them is real and load-bearing at scale: the
  * schema contract, the mapPartitions batch shape (the Scala analog of
  * a pandas_udf/mapInPandas batch), partition sizing by byte budget,
  * and the frame-sampling row expansion.
  */
object Multimodal {

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

  /** ===== STUB ===== deterministic fake decode: a real build links an
    * image codec here (per-partition native lib init, then one decode
    * per row). The fake derives "pixels" from a content hash so tests
    * are stable and decode cost is representative of a per-row kernel.
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
    * spark.sql.files.maxPartitionBytes at read time).
    */
  def extractFeatures(df: DataFrame, dims: Int = 16,
                      batchBytes: Long = 64L << 20): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val contentIdx = df.schema.fieldIndex("content")
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
            // ===== STUB decode happens batch-locally =====
            val feats = stubDecodeFeatures(content, dims)
            buf.enqueue(Row.fromSeq(r.toSeq :+ feats.toSeq))
          }
        }
        def hasNext: Boolean = { if (buf.isEmpty) refill(); buf.nonEmpty }
        def next(): Row = { if (buf.isEmpty) refill(); buf.dequeue() }
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
    * decode/resize kernel itself is the stubbed batch step above.
    */
  def withResizeTarget(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("resize_target", struct(lit(w).as("w"), lit(h).as("h")))
}
