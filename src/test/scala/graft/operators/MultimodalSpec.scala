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

  // ------------------------------------------------- BMP codec (real) —

  private def testImage(w: Int, h: Int): ImageCodec.Image =
    ImageCodec.Image(w, h, Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x * 7 + y) % 256) << 16) | (((y * 11 + x) % 256) << 8) | ((x * y) % 256)
    })

  test("ImageCodec round trip recovers dimensions and pixels exactly for every padding case") {
    // widths 16..19 cover row padding of 0..3 bytes — the classic BMP bug
    for (w <- 16 to 19) {
      val img = testImage(w, 7)
      val back = ImageCodec.decode(ImageCodec.encode(img)).get
      back.width shouldBe w
      back.height shouldBe 7
      back.pixels.toSeq shouldBe img.pixels.toSeq
    }
  }

  test("ImageCodec decodes top-down BMPs (negative height) to the same top-down pixels") {
    val img = testImage(5, 4)
    val bytes = ImageCodec.encode(img)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -4) // declare top-down
    // flip the stored row order so the image content is unchanged
    val rowBytes = (5 * 3 + 3) & ~3
    val flipped = bytes.clone()
    for (y <- 0 until 4)
      System.arraycopy(bytes, 54 + y * rowBytes, flipped, 54 + (3 - y) * rowBytes, rowBytes)
    ImageCodec.decode(flipped).get.pixels.toSeq shouldBe img.pixels.toSeq
  }

  test("ImageCodec rejects garbage, truncation, wrong depth, compression, and forged geometry") {
    ImageCodec.decode(null) shouldBe None
    ImageCodec.decode(Array.fill[Byte](100)(42)) shouldBe None
    val ok = ImageCodec.encode(testImage(8, 8))
    ImageCodec.decode(ok.take(60)) shouldBe None // truncated pixel data
    val bpp8 = ok.clone(); bpp8(28) = 8
    ImageCodec.decode(bpp8) shouldBe None
    val rle = ok.clone(); rle(30) = 1 // BI_RLE8
    ImageCodec.decode(rle) shouldBe None
    // forged width near Int.MaxValue: Long bounds check must catch it,
    // not overflow past it (poison-blob contract: None, never a crash)
    val wide = ok.clone()
    val wb = java.nio.ByteBuffer.wrap(wide).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wb.putInt(18, Int.MaxValue - 2)
    ImageCodec.decode(wide) shouldBe None
    val minH = ok.clone()
    val mb = java.nio.ByteBuffer.wrap(minH).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    mb.putInt(22, Int.MinValue) // -height would overflow
    ImageCodec.decode(minH) shouldBe None
    val badOff = ok.clone()
    val ob = java.nio.ByteBuffer.wrap(badOff).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ob.putInt(10, -1000) // negative pixel offset
    ImageCodec.decode(badOff) shouldBe None
    // COMBINED forgeries that defeat single-field checks via overflow
    // (round-13 review): infoSize near Int.MaxValue wraps `14 + infoSize`
    // negative in Int, letting a negative dataOff through to a crash
    val wrapInfo = ok.clone()
    val ib = java.nio.ByteBuffer.wrap(wrapInfo).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ib.putInt(10, -52)
    ib.putInt(14, Int.MaxValue)
    ImageCodec.decode(wrapInfo) shouldBe None
    // width·height both ~1.8e9: rowBytes·height wraps negative in LONG,
    // passing a naive length check into NegativeArraySizeException
    val wrapGeom = ok.clone()
    val gb = java.nio.ByteBuffer.wrap(wrapGeom).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    gb.putInt(18, 1800000000)
    gb.putInt(22, 1800000000)
    ImageCodec.decode(wrapGeom) shouldBe None
  }

  test("featurize dispatches on content: BMP gets real dimensions, WAV real audio stats, text the byte branch") {
    val img = testImage(17, 9) // width 17 → 3 pad bytes per row
    val wav = WavCodec.encode(Array.tabulate(400)(i => (i * 3 - 600).toShort), sampleRate = 8000)
    val media = Seq(
      (1L, ImageCodec.encode(img), "image/bmp"),
      (2L, wav, "audio/wav"),
      (3L, "plain text payload".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "payload", "media_type")
    val out = Multimodal.featurize(media).collect().map(f => f.doc_id -> f).toMap
    out(1L).width shouldBe 17
    out(1L).height shouldBe 9
    val stats = Multimodal.imageStats(img)
    out(1L).feature(0) shouldBe stats.sumR.toDouble / (17 * 9)
    out(2L).width shouldBe 0
    out(2L).feature(0) shouldBe 8000.0 // sample rate
    out(2L).feature(2) shouldBe 400.0 // frames
    out(3L).width shouldBe 0
    out(3L).height shouldBe 0
    out(3L).payload_fp should be >= 0L
  }

  // ------------------------------------------------- AVI codec (real) —

  private def testFrames(n: Int): Seq[Array[Byte]] =
    (0 until n).map(f => Array.tabulate(50 + f * 13)(i => ((f * 31 + i) % 251).toByte))

  test("AviCodec round trip: the container walk resolves every frame's exact bytes") {
    val frames = testFrames(5) // lengths 50,63,76,89,102 — odd sizes pad
    val payload = AviCodec.encode(frames, width = 32, height = 24)
    val avi = AviCodec.decode(payload).get
    avi.width shouldBe 32
    avi.height shouldBe 24
    avi.frames.length shouldBe 5
    avi.frames.zip(frames).foreach { case ((off, len), expect) =>
      payload.slice(off, off + len).toSeq shouldBe expect.toSeq
    }
  }

  test("AviCodec walks movi sequentially when idx1 is missing, and handles absolute-offset indexes") {
    val frames = testFrames(4)
    val payload = AviCodec.encode(frames, 8, 8)
    // strip idx1: truncate after movi and fix the RIFF size
    val idxAt = {
      var o = 12; var found = -1
      while (found < 0 && o + 8 <= payload.length) {
        if (new String(payload, o, 4, "US-ASCII") == "idx1") found = o
        else o += 8 + ((payload(o + 4) & 0xff) | ((payload(o + 5) & 0xff) << 8) |
          ((payload(o + 6) & 0xff) << 16) | ((payload(o + 7) & 0xff) << 24))
      }
      found
    }
    val noIdx = payload.take(idxAt)
    java.nio.ByteBuffer.wrap(noIdx).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, noIdx.length - 8)
    val walked = AviCodec.decode(noIdx).get
    walked.frames.length shouldBe 4
    walked.frames.zip(frames).foreach { case ((off, len), expect) =>
      noIdx.slice(off, off + len).toSeq shouldBe expect.toSeq
    }
    // rewrite idx1 offsets to ABSOLUTE file offsets (the in-the-wild
    // variant): decode must disambiguate per entry and still resolve
    val abs = payload.clone()
    val bb = java.nio.ByteBuffer.wrap(abs).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val moviFourcc = {
      var o = 12; var found = -1
      while (found < 0 && o + 12 <= abs.length) {
        if (new String(abs, o, 4, "US-ASCII") == "LIST" &&
          new String(abs, o + 8, 4, "US-ASCII") == "movi") found = o + 8
        else o += 8 + ((abs(o + 4) & 0xff) | ((abs(o + 5) & 0xff) << 8) |
          ((abs(o + 6) & 0xff) << 16) | ((abs(o + 7) & 0xff) << 24))
      }
      found
    }
    for (i <- 0 until 4) {
      val entry = idxAt + 8 + 16 * i
      val rel = bb.getInt(entry + 8)
      bb.putInt(entry + 8, moviFourcc + rel)
    }
    val resolved = AviCodec.decode(abs).get
    resolved.frames.zip(frames).foreach { case ((off, len), expect) =>
      abs.slice(off, off + len).toSeq shouldBe expect.toSeq
    }
  }

  test("AviCodec rejects garbage, truncation, and forged index offsets/sizes") {
    AviCodec.decode(null) shouldBe None
    AviCodec.decode(Array.fill[Byte](64)(3)) shouldBe None
    val ok = AviCodec.encode(testFrames(3), 8, 8)
    AviCodec.decode(ok.take(ok.length / 2)) shouldBe None // truncated movi chunk
    val forged = ok.clone()
    // forge the first idx1 entry's size to run past the payload
    var o = 12
    while (new String(forged, o, 4, "US-ASCII") != "idx1")
      o += 8 + ((forged(o + 4) & 0xff) | ((forged(o + 5) & 0xff) << 8) |
        ((forged(o + 6) & 0xff) << 16) | ((forged(o + 7) & 0xff) << 24))
    java.nio.ByteBuffer.wrap(forged).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(o + 8 + 12, Int.MaxValue - 4)
    AviCodec.decode(forged) shouldBe None
  }

  test("sampleFramesAvi: stride sampling via the index; undecodable payloads drop") {
    val frames = testFrames(6)
    val media = Seq(
      (1L, AviCodec.encode(frames, 8, 8), "video/avi"),
      (2L, Array.fill[Byte](500)(11), "video/avi"))
      .toDF("doc_id", "payload", "media_type")
    val out = Multimodal.sampleFramesAvi(media, stride = 2).collect()
      .sortBy(f => (f.doc_id, f.frame_idx))
    out.map(_.doc_id).distinct.toSeq shouldBe Seq(1L)
    out.map(_.frame_idx).toSeq shouldBe Seq(0, 2, 4)
    out.map(_.n_bytes).toSeq shouldBe Seq(50L, 76L, 102L)
    // fingerprint equals the rolling hash of the original frame bytes
    def fp(b: Array[Byte]): Long =
      b.foldLeft(0L)((acc, v) => (acc * 31 + (v & 0xff)) % graft.functions.TextFunctions.Prime)
    out.map(_.frame_fp).toSeq shouldBe Seq(fp(frames(0)), fp(frames(2)), fp(frames(4)))
  }

  test("imageFeaturesBmp: undecodable payloads contribute zero rows, not failures") {
    val media = Seq(
      (1L, ImageCodec.encode(testImage(6, 5)), "image/bmp"),
      (2L, Array.fill[Byte](300)(9), "image/bmp"))
      .toDF("doc_id", "payload", "media_type")
    val out = Multimodal.imageFeaturesBmp(media).collect()
    out.map(_.doc_id).toSeq shouldBe Seq(1L)
    out.head.width shouldBe 6
    val s = Multimodal.imageStats(testImage(6, 5))
    (out.head.sum_r, out.head.sum_g, out.head.sum_b, out.head.grad) shouldBe
      ((s.sumR, s.sumG, s.sumB, s.grad))
  }
}
