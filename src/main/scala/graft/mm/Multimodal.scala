package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side machinery — schema, partition-parallel batch processing
  * via `mapPartitions` over a typed Dataset (the Scala analogue of
  * PySpark's `mapInPandas` batch UDF), output schema, and the
  * queries-surface wiring — is real and tested. The codec itself is STUBBED
  * (this container has no image/audio libraries): [[Codecs.decodeStub]] is a
  * deterministic fake that "decodes" bytes into a pixel/sample stream.
  * Swapping in a real codec changes only that one function; every
  * distributed concern (no driver collect, per-partition batching, binary
  * columns never shuffled except by explicit repartition) stays as-is.
  */
case class MediaMeta(width: Int, height: Int, sampleRate: Int,
  durationMs: Long, format: String)

case class MediaFile(media_id: Long, kind: String, content: Array[Byte],
  meta: MediaMeta)

case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
  byte_mean: Double, byte_entropy: Double, hist: Array[Long],
  thumb_bytes: Int)

object Codecs {
  /** STUB — deterministic fake decode: interprets content bytes as the
    * decoded sample stream. A real implementation would call an image/audio
    * codec here (`???` territory); everything downstream only sees the
    * returned array, so the contract is identical. */
  def decodeStub(content: Array[Byte], meta: MediaMeta): Array[Int] =
    content.map(b => b & 0xff)

  /** "Resize": stride-sample the decoded stream to ≤ target elements. */
  def resize(samples: Array[Int], target: Int): Array[Int] =
    if (samples.length <= target) samples
    else {
      val stride = samples.length.toDouble / target
      Array.tabulate(target)(i => samples((i * stride).toInt))
    }

  /** "Frame sample": every k-th frame of `frameSize` samples. */
  def frameSample(samples: Array[Int], frameSize: Int, everyK: Int): Array[Array[Int]] =
    samples.grouped(frameSize).zipWithIndex
      .collect { case (f, i) if i % everyK == 0 => f }.toArray
}

object Multimodal {

  /** Deterministic synthetic media corpus derived from the documents table:
    * content bytes are the UTF-8 text (a stand-in for real image/audio
    * payloads), metadata is derived per doc. Partitioning follows the
    * source scan — binary blobs are never shuffled. */
  def syntheticMedia(docs: DataFrame): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaFile(id, kind, text.getBytes("UTF-8"),
          MediaMeta(width = (nChars % 640).toInt + 64, height = 480,
            sampleRate = 16000, durationMs = nChars * 10, format = kind match {
              case "image" => "png-stub"; case "audio" => "wav-stub"; case _ => "mp4-stub"
            }))
      }
  }

  val HistBins = 16

  /** Partition-parallel decode + feature extraction. One codec invocation
    * per row, batched by partition — no per-row task overhead, no driver
    * involvement; the natural Scala counterpart of a `mapInPandas` batch. */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val samples = Codecs.decodeStub(m.content, m.meta)
        val n = samples.length
        val hist = new Array[Long](HistBins)
        var s = 0.0
        samples.foreach { v => hist(v * HistBins / 256) += 1; s += v }
        val entropy = hist.foldLeft(0.0) { (acc, c) =>
          if (c == 0) acc else { val p = c.toDouble / n; acc - p * math.log(p) / math.log(2) }
        }
        val thumb = Codecs.resize(samples, 64)
        val mean = if (n == 0) 0.0 else math.rint(s / n * 1e6) / 1e6
        MediaFeatures(m.media_id, m.kind, n,
          mean, math.rint(entropy * 1e6) / 1e6,
          hist, thumb.length)
      }
    }
  }
}
