package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode/feature-extraction
  * as partition-wise typed pipelines.
  *
  * This is the Scala analogue of a `mapInPandas` decode stage: a
  * `Dataset[MediaRow].mapPartitions` with an explicit output Encoder (the
  * reference's `meta=` requirement — Catalyst cannot infer schemas from
  * opaque functions, reference `lib/core.py:2072-2204`). The actual codec
  * call is STUBBED (no image/audio libraries in this container) behind
  * [[Codecs.decodeImageStub]]: a deterministic fake that derives plausible
  * dimensions from the bytes. The Spark-side plumbing — schema, batch
  * iteration, partitioning, null handling — is real and tested.
  *
  * Scale notes: decode is the classic CPU-heavy map stage — no shuffle, so
  * at 100 TB it scales linearly with executors; keep payloads in their own
  * parquet column (columnar pruning skips them unless touched) and size
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory.
  */
object Multimodal {

  /** A row carrying an opaque media payload. */
  case class MediaRow(id: Long, payload: Array[Byte], mimeHint: String)

  /** Typed decode output — what a real image decode would yield, minus the
    * pixels. */
  case class MediaMeta(id: Long, nBytes: Long, sha256: String,
      width: Int, height: Int, format: String)

  /** Per-frame sample output for video-like payloads. */
  case class FrameSample(id: Long, frameIdx: Int, frameHash: String)

  object Codecs {
    /** STUB: a real implementation would call an image codec here. The fake
      * derives deterministic "dimensions" from the payload so the pipeline
      * shape (schema, nullability, batching) is fully exercisable. */
    def decodeImageStub(payload: Array[Byte]): (Int, Int, String) = {
      val n = payload.length
      val w = 16 + (n % 640)
      val h = 16 + ((n * 7) % 480)
      val fmt = (n % 3) match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "webp"
      }
      (w, h, fmt)
    }

    def sha256Hex(payload: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      d.digest(payload).map("%02x".format(_)).mkString
    }
  }

  /** The decode stage: one pass per partition, explicit Encoder. */
  def decodeMeta(ds: Dataset[MediaRow])(implicit s: SparkSession): Dataset[MediaMeta] = {
    import s.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, fmt) = Codecs.decodeImageStub(r.payload)
        MediaMeta(r.id, r.payload.length.toLong, Codecs.sha256Hex(r.payload),
          w, h, fmt)
      }
    }
  }

  /** Frame sampling stage: fixed-size chunks of the payload, one output row
    * per sampled frame (every `stride`-th chunk). */
  def sampleFrames(ds: Dataset[MediaRow], frameBytes: Int, stride: Int)(
      implicit s: SparkSession): Dataset[FrameSample] = {
    import s.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex.collect {
          case (frame, i) if i % stride == 0 =>
            FrameSample(r.id, i, Codecs.sha256Hex(frame).take(16))
        }
      }
    }
  }

  /** STUB feature extraction: a deterministic fake embedding over the
    * payload text (dim values derived from polyHash — a real pipeline
    * calls the vision/audio encoder here). Column-level, so it composes
    * with the relational plan; exact cross-engine oracle since the hash
    * is engine-reproducible. */
  def featuresStub(textCol: org.apache.spark.sql.Column, dim: Int)
      : org.apache.spark.sql.Column = {
    val h = graft.functions.HashExprs.polyHashFast(textCol)
    transform(sequence(lit(0), lit(dim - 1)),
      j => pmod(h * (j + 1), lit(1000L)).cast("double") / 1000.0)
  }

  /** STUB resize: target box scaling of the fake-decoded dimensions —
    * real pipelines put the interpolation kernel here; the aspect-ratio
    * arithmetic and schema are the Spark-side contract. */
  def resizeStub(width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column, maxSide: Int)
      : org.apache.spark.sql.Column = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(width, height).cast("double"))
    struct(floor(width * scale).cast("int").as("w"),
      floor(height * scale).cast("int").as("h"))
  }

  /** Build a MediaRow dataset from the documents table (text bytes standing
    * in for image payloads — same plumbing, no codec needed). */
  def mediaFromDocuments(df: DataFrame)(implicit s: SparkSession): Dataset[MediaRow] = {
    import s.implicits._
    df.select(col("doc_id").as("id"),
        col("text").cast("binary").as("payload"),
        lit("image/png").as("mimeHint"))
      .as[MediaRow]
  }
}
