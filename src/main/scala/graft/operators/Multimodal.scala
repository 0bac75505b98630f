package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, pushed through a partition-wise feature-extraction
  * stage. The Spark-side shape — schema, `Dataset[T]` encoders, batch-wise
  * `mapPartitions`, partitioning — is real and tested. The codec slot is
  * filled for REAL on the audio path: [[audioWindowsWav]] decodes
  * RIFF/WAVE PCM16 container bytes via the pure-JVM [[WavCodec]]. Image
  * and video decode remain STUBBED with a deterministic fake (no image/
  * video libs in this environment): features derive from the payload
  * bytes via the same base-31 rolling hash the text layer uses, so
  * results are reproducible and oracle-checkable.
  *
  * Scale design: `mapPartitions` keeps the decode batched per partition
  * (one decoder init per partition, not per row — the same reason the
  * Python path would use mapInPandas); payloads never shuffle — feature
  * extraction is map-side, and only the small feature columns flow on.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      payload_fp: Long,
      width: Int,
      height: Int,
      feature: Array[Double])

  private val Prime = graft.functions.TextFunctions.Prime

  /** Deterministic stand-in for a real media decoder (???): rolling hash of
    * the payload + fake dimensions/features derived from it. Byte values are
    * taken unsigned so ASCII payloads hash identically to their text form.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var acc = 0L
    var i = 0
    while (i < r.payload.length) {
      acc = (acc * 31 + (r.payload(i) & 0xff)) % Prime
      i += 1
    }
    val feat = Array.tabulate(4)(d => ((acc + d * 40503L) % 1000L).toDouble / 1000.0)
    MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, acc,
      width = (acc % 640L).toInt, height = (acc % 480L).toInt, feature = feat)
  }

  /** Wrap a text table as a media table: payload = UTF-8 bytes of the text
    * column (the fixture corpus has no real binaries; this keeps the byte
    * path honest end-to-end).
    */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("media_type"))

  /** The featurize stage: typed, partition-batched, decoder init amortized
    * per partition. At 100 TB the input would be
    * `spark.read.format("binaryFile")` or a parquet table of blobs with the
    * same three-column schema.
    */
  def featurize(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real pipeline: init decoder/model once per partition here.
      // NULL payloads (NULL binary cell, encode(NULL)) contribute zero
      // rows rather than an executor NPE — the poison-blob contract;
      // audit drops by comparing input vs output doc_id counts
      it.filter(_.payload != null).map(decodeStub)
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Long, frame_fp: Long)

  /** Frame sampling for video-shaped payloads: the decoder stub treats the
    * payload as fixed-size `frameBytes` chunks and emits every `stride`-th
    * one (`???` in a real pipeline: container demux + keyframe decode).
    * One input row explodes to 0..n output rows — the Spark-side shape
    * (iterator-to-iterator mapPartitions, no full-payload buffering beyond
    * the row) is the part that matters at 100 TB.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): Dataset[Frame] = {
    // fail fast on the driver: a zero frame size or stride would otherwise
    // surface as an ArithmeticException inside a distributed stage
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.filter(_.payload != null).flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          var acc = 0L
          var i = f * frameBytes
          val end = i + frameBytes
          while (i < end) { acc = (acc * 31 + (r.payload(i) & 0xff)) % Prime; i += 1 }
          Frame(r.doc_id, f, frameBytes.toLong, acc)
        }
      }
    }
  }

  final case class AudioWindow(doc_id: Long, win_idx: Int, rms: Double, zero_crossings: Long)

  /** Audio-shaped featurization: the payload as unsigned 8-bit PCM centered
    * at 128, windowed (`win` samples, `hop` stride), per window the RMS
    * (integer-exact sum of squares, one sqrt on an identical double in any
    * engine) and the zero-crossing count (sign changes — integer-exact).
    * The codec decode to PCM that a real pipeline needs here EXISTS for
    * WAV — [[audioWindowsWav]] runs this same windowed DSP on decoded
    * container bytes; this byte-stub variant remains for payloads with no
    * container framing. Map-side only, payloads never shuffle; one row
    * explodes to its window count.
    */
  def audioWindows(media: DataFrame, win: Int = 256, hop: Int = 128): Dataset[AudioWindow] = {
    require(win > 0, s"win must be positive, got $win")
    require(hop > 0, s"hop must be positive, got $hop")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.filter(_.payload != null).flatMap { r =>
        val n = r.payload.length
        val nw = if (n >= win) (n - win) / hop + 1 else 0
        (0 until nw).iterator.map { w =>
          val start = w * hop
          var s = 0L
          var i = start
          while (i < start + win) {
            val c = (r.payload(i) & 0xff) - 128
            s += c.toLong * c
            i += 1
          }
          var zc = 0L
          i = start
          while (i < start + win - 1) {
            val a = (r.payload(i) & 0xff) - 128
            val b = (r.payload(i + 1) & 0xff) - 128
            if (a * b < 0) zc += 1
            i += 1
          }
          AudioWindow(r.doc_id, w, math.sqrt(s.toDouble / win), zc)
        }
      }
    }
  }

  /** [[audioWindows]] on REAL container bytes: payloads are RIFF/WAVE
    * PCM16 decoded by [[WavCodec]] (the codec slot, filled — no stub on
    * this path), then the identical windowed DSP over the decoded 16-bit
    * samples: per window the RMS (integer-exact sum of squares, one sqrt
    * at the end) and the zero-crossing count. Multi-channel payloads use
    * channel 0 (deinterleaved) — deterministic, integer-exact, and the
    * usual mono-ize choice for VAD-style features. An undecodable payload
    * (not WAV, compressed, truncated) contributes ZERO windows rather
    * than failing the stage: at 100 TB one poison blob must never kill
    * the featurize job; count input vs output doc_ids to audit drops.
    * Decode is per-row inside iterator-to-iterator mapPartitions —
    * payloads never shuffle, only the small window rows flow on.
    */
  def audioWindowsWav(media: DataFrame, win: Int = 256, hop: Int = 128): Dataset[AudioWindow] = {
    require(win > 0, s"win must be positive, got $win")
    require(hop > 0, s"hop must be positive, got $hop")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        WavCodec.decode(r.payload).iterator.flatMap { pcm =>
          val ch = pcm.channels
          val n = pcm.samples.length / ch
          val nw = if (n >= win) (n - win) / hop + 1 else 0
          (0 until nw).iterator.map { w =>
            val start = w * hop
            var s = 0L
            var i = start
            while (i < start + win) {
              val c = pcm.samples(i * ch).toLong
              s += c * c
              i += 1
            }
            var zc = 0L
            i = start
            while (i < start + win - 1) {
              val a = pcm.samples(i * ch).toInt
              val b = pcm.samples((i + 1) * ch).toInt
              if (a * b < 0) zc += 1
              i += 1
            }
            AudioWindow(r.doc_id, w, math.sqrt(s.toDouble / win), zc)
          }
        }
      }
    }
  }

  /** Full stub pipeline as a DataFrame (feature array exploded to fixed
    * columns so the parquet dump is flat and oracle-comparable).
    */
  def featurePipeline(spark: SparkSession, docs: DataFrame): DataFrame =
    featurize(asMediaTable(docs)).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("payload_fp"),
        col("width"), col("height"),
        element_at(col("feature"), 1).as("f0"), element_at(col("feature"), 2).as("f1"),
        element_at(col("feature"), 3).as("f2"), element_at(col("feature"), 4).as("f3"))
      .orderBy("doc_id")
}
