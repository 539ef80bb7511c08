package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from a media blob. */
case class MediaMeta(
    id: Long,
    byte_len: Long,
    format: String,
    width: Int,
    height: Int,
    n_frames: Int)

/** One sampled "frame" of a media blob. */
case class Frame(id: Long, frame_idx: Int, offset: Long, frame_bytes: Array[Byte])

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (reference reads raw blobs via
  * `read_files`, pyquokka/df.py:213-253 + unordered_readers.py:206-271,
  * and leaves decoding to user transforms — here the decode/resize/
  * frame-sample stages are first-class operators).
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * container): [[Multimodal.decodeStub]] derives deterministic fake
  * dimensions from the header bytes. Everything around it — binary
  * schema, partition-wise batch iteration, typed Encoders, frame
  * explosion shape — is the real distributed plumbing a codec would plug
  * into: swap `decodeStub` for an actual decoder and nothing else
  * changes.
  *
  * Scale design: blobs never shuffle — metadata extraction and frame
  * sampling are narrow (per-partition) operations; only the small typed
  * outputs flow into joins/aggregations downstream.
  */
object Multimodal {

  /** Attach a binary payload column (here derived from text for the
    * synthetic tables; in production this IS the stored bytes). */
  def withBlob(df: DataFrame, srcCol: String, blobCol: String = "blob"): DataFrame =
    df.withColumn(blobCol, col(srcCol).cast("binary"))

  /** STUB decode — deterministic fake codec: "format" from the first
    * byte, dimensions from header bytes. A real implementation calls the
    * image/audio library here (per-partition, so codec state/buffers are
    * reused across the batch). */
  def decodeStub(bytes: Array[Byte]): (String, Int, Int, Int) = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    val format = if (b0 % 3 == 0) "img" else if (b0 % 3 == 1) "audio" else "video"
    val width = 16 + (b0 % 64)
    val height = 16 + (b1 % 64)
    val nFrames = 1 + (bytes.length % 30)
    (format, width, height, nFrames)
  }

  /** Partition-wise metadata extraction over (id, blob) rows → typed
    * Dataset[MediaMeta]. The mapPartitions boundary is where a real codec
    * would amortize per-task init (dictionary load, JNI handles). */
  def decodeMeta(df: DataFrame, idCol: String, blobCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (format, w, h, n) = decodeStub(bytes)
          MediaMeta(id, bytes.length.toLong, format, w, h, n)
        }
      }
  }

  /** Sample every `every`-th fixed-size chunk ("frame") of each blob —
    * the video-frame-sampling shape: narrow explode, no blob shuffle. */
  def frameSample(
      df: DataFrame, idCol: String, blobCol: String,
      frameSize: Int, every: Int): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nChunks = math.max(1, (bytes.length + frameSize - 1) / frameSize)
          (0 until nChunks by every).iterator.map { i =>
            val off = i * frameSize
            val end = math.min(off + frameSize, bytes.length)
            Frame(id, i, off.toLong, java.util.Arrays.copyOfRange(bytes, off, end))
          }
        }
      }
  }

  /** Pure-SQL blob statistics (no decode): byte length + content digest.
    * These stay in whole-stage codegen and are oracle-verifiable. */
  def blobStats(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    df.select(col(idCol),
      length(col(blobCol)).as("byte_len"),
      md5(col(blobCol)).as("digest"))

  /** STUB resize — deterministic byte-stride downsample standing in for a
    * real image scaler. Output schema (id, blob, width, height) is the
    * production shape: resized payload stays binary and never shuffles. */
  def resize(df: DataFrame, idCol: String, blobCol: String,
             targetW: Int, targetH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val target = math.max(1, targetW * targetH)
          val stride = math.max(1, bytes.length / target)
          val out = Array.range(0, math.min(target, bytes.length))
            .map(i => bytes(math.min(i.toLong * stride, bytes.length - 1).toInt))
          (id, out, targetW, targetH)
        }
      }
      .toDF(idCol, blobCol, "width", "height")
  }

  /** STUB feature extraction — a normalized 16-bin byte histogram as the
    * embedding. The output is a dense `array<double>` column compatible
    * with every vector operator (nnJoin / annJoin / embedding near-dup),
    * i.e. the multimodal → embedding → similarity pipeline end-to-end.
    * A real model inference call replaces the histogram; the per-partition
    * batch boundary (where model weights would be loaded once per task)
    * and the output schema are unchanged. */
  def featureExtract(df: DataFrame, idCol: String, blobCol: String,
                     embCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Double](16)
          bytes.foreach(b => hist((b & 0xff) >> 4) += 1.0)
          val n = math.max(1, bytes.length).toDouble
          (id, hist.map(_ / n))
        }
      }
      .toDF(idCol, embCol)
  }
}
