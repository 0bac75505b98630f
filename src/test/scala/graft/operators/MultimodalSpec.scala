package graft.operators

import graft.{GraftSession, SparkTestSession}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MultimodalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs =
    GraftSession.table(spark, SparkTestSession.sf0001, "documents")

  test("binary payload hash equals the text fingerprint on ASCII corpora") {
    // byte-level rolling hash (mapPartitions stub) ≡ char-level rolling hash
    // (codegen'd SQL) — the two paths cross-check each other
    val viaBinary = Multimodal.featurePipeline(spark, docs)
      .select("doc_id", "payload_fp").as[(Long, Long)].collect().toMap
    val viaText = docs.select($"doc_id", TextFunctions.fingerprint("text"))
      .as[(Long, Long)].collect().toMap
    viaBinary shouldBe viaText
  }

  test("featurize preserves row count and schema shape") {
    val out = Multimodal.featurize(Multimodal.asMediaTable(docs))
    out.columns.toSeq shouldBe Seq("doc_id", "media_type", "n_bytes",
      "payload_fp", "width", "height", "feature")
    out.count() shouldBe docs.count()
    val r = out.head()
    r.n_bytes should be > 0L
    r.feature should have length 4
    all(r.feature.toSeq) should (be >= 0.0 and be < 1.0)
  }

  test("NULL payloads contribute zero rows, never an executor NPE") {
    // NULL binary cell (encode(NULL), a null blob column): the poison-blob
    // contract is dropped rows on every featurize path, not a task crash
    val media = Seq((1L, Some(Array[Byte](1, 2, 3, 4)), "text/plain"),
        (2L, Option.empty[Array[Byte]], "text/plain"))
      .toDF("doc_id", "payload", "media_type")
    Multimodal.featurize(media).collect().map(_.doc_id) shouldBe Array(1L)
    Multimodal.sampleFrames(media, frameBytes = 2, stride = 1)
      .collect().map(_.doc_id).distinct shouldBe Array(1L)
    Multimodal.audioWindows(media, win = 2, hop = 1)
      .collect().map(_.doc_id).distinct shouldBe Array(1L)
    Multimodal.audioWindowsWav(media).collect() shouldBe empty // not WAV
    WavCodec.decode(null) shouldBe None
  }

  test("zero or negative window parameters fail fast on the driver") {
    val media = Multimodal.asMediaTable(docs)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.sampleFrames(media, frameBytes = 0, stride = 1)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.sampleFrames(media, frameBytes = 4, stride = 0)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.audioWindows(media, win = 0, hop = 1)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.audioWindowsWav(media, win = 256, hop = 0)
  }

  test("featurize is map-side only — no shuffle in the plan") {
    val plan = Multimodal.featurize(Multimodal.asMediaTable(docs))
      .queryExecution.sparkPlan.toString
    plan should not include "Exchange"
  }

  // ------------------------------------------------- WAV codec (real) —

  test("WavCodec round trip: encode → decode recovers rate and samples exactly") {
    val samples = Array.tabulate(1000)(i => (math.sin(i / 10.0) * 20000).toShort)
    val pcm = WavCodec.decode(WavCodec.encode(samples, sampleRate = 8000)).get
    pcm.sampleRate shouldBe 8000
    pcm.channels shouldBe 1
    pcm.samples.toSeq shouldBe samples.toSeq
  }

  test("WavCodec rejects garbage, truncation, compressed formats, and 8-bit PCM") {
    WavCodec.decode(Array.fill[Byte](100)(42)) shouldBe None
    WavCodec.decode(WavCodec.encode(Array.fill[Short](64)(1)).take(30)) shouldBe None
    val wav = WavCodec.encode(Array.fill[Short](64)(1))
    val compressed = wav.clone(); compressed(20) = 3 // fmt audioFormat ≠ PCM
    WavCodec.decode(compressed) shouldBe None
    val eightBit = wav.clone(); eightBit(34) = 8 // bitsPerSample
    WavCodec.decode(eightBit) shouldBe None
    // a chunk whose declared size runs past the payload must not crash
    val lying = wav.clone(); lying(43) = 0x7f
    WavCodec.decode(lying) shouldBe None
    // near-Int.MaxValue size field: body + size wraps negative in Int
    // arithmetic — the bounds check must not overflow (poison-blob
    // contract: None, never a thrown exception)
    val overflowing = wav.clone()
    overflowing(16) = -12; overflowing(17) = -1
    overflowing(18) = -1; overflowing(19) = 0x7f // fmt size = 0x7FFFFFF4
    WavCodec.decode(overflowing) shouldBe None
  }

  test("WavCodec skips unknown chunks between fmt and data") {
    // hand-assemble RIFF [fmt ][LIST junk][data] — decoders must walk, not
    // assume the canonical 44-byte layout
    val samples = Array[Short](100, -200, 300)
    val canon = WavCodec.encode(samples)
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 9, 9, 9, 9)
    val patched = java.nio.ByteBuffer.allocate(canon.length + junk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    patched.put(canon, 0, 36) // RIFF..WAVE + fmt chunk
    patched.put(junk)
    patched.put(canon, 36, canon.length - 36) // data chunk
    val bytes = patched.array()
    // fix RIFF size field
    val fixed = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fixed.putInt(4, bytes.length - 8)
    WavCodec.decode(bytes).get.samples.toSeq shouldBe samples.toSeq
  }

  test("audioWindowsWav: square wave has exact RMS and zero-crossing count; stereo uses channel 0") {
    // ±1000 square, half-period 16 → window RMS exactly 1000.0 and 15 sign
    // changes in 256 samples (transitions every 16 samples)
    val square = Array.tabulate(256)(i => (if ((i / 16) % 2 == 0) 1000 else -1000).toShort)
    val mono = Seq((1L, WavCodec.encode(square), "audio/wav"))
      .toDF("doc_id", "payload", "media_type")
    val w = Multimodal.audioWindowsWav(mono, win = 256, hop = 256).collect()
    w should have length 1
    w.head.rms shouldBe 1000.0
    w.head.zero_crossings shouldBe 15L
    // stereo: channel 1 carries silence; channel 0's square must win through
    val stereo = Array.tabulate(512)(i => if (i % 2 == 0) square(i / 2) else 0.toShort)
    val wavStereo = {
      val b = WavCodec.encode(stereo) // mono header, then patch to 2 channels
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putShort(22, 2) // numChannels
      bb.putShort(32, 4) // blockAlign
      b
    }
    val s = Multimodal.audioWindowsWav(
      Seq((2L, wavStereo, "audio/wav")).toDF("doc_id", "payload", "media_type"),
      win = 256, hop = 256).collect()
    s should have length 1
    s.head.rms shouldBe 1000.0
    s.head.zero_crossings shouldBe 15L
  }

  test("audioWindowsWav: undecodable payloads contribute zero windows, not failures") {
    val mixed = Seq(
      (1L, WavCodec.encode(Array.fill[Short](300)(500)), "audio/wav"),
      (2L, Array.fill[Byte](400)(7), "audio/wav")) // not a container
      .toDF("doc_id", "payload", "media_type")
    val out = Multimodal.audioWindowsWav(mixed).collect()
    out.map(_.doc_id).distinct.toSeq shouldBe Seq(1L)
  }
}
