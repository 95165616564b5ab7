package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 1.toByte, 2.toByte)),
    (2L, Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)),
    (3L, Array('R'.toByte, 'I'.toByte, 'F'.toByte, 'F'.toByte, 9.toByte)),
    (4L, "plain text".getBytes("UTF-8"))
  ).toDF("id", "media")

  test("format sniffing from magic bytes") {
    val got = Multimodal.withMetadata(media, "media")
      .select($"id", $"media_meta.format").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "riff", 4L -> "unknown"))
  }

  test("metadata carries byte length and content hash") {
    val row = Multimodal.withMetadata(media, "media").filter($"id" === 4)
      .select($"media_meta.n_bytes", $"media_meta.sha256").head()
    assert(row.getLong(0) == 10L)
    assert(row.getString(1).length == 64)
  }

  test("byte sampling: n evenly spaced values, endpoints included") {
    val got = media.filter($"id" === 1)
      .select(Multimodal.sampleBytes($"media", 3)).as[Seq[Int]].head()
    assert(got.length == 3)
    assert(got.head == 0x89 && got.last == 2)
  }

  test("byte sampling: n=1 yields the first byte, not nulls") {
    val got = media.filter($"id" === 1)
      .select(Multimodal.sampleBytes($"media", 1)).as[Seq[Int]].head()
    assert(got == Seq(0x89))
    intercept[IllegalArgumentException](Multimodal.sampleBytes($"media", 0))
  }

  test("feature extraction runs on a STREAMING plan (MemoryStream)") {
    // .rdd would throw here (forces batch execution); Dataset.mapPartitions
    // + Encoders.row serves batch and streaming from the same operator
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Array[Byte])](spark)
    val feats = Multimodal.extractFeatures(
      in.toDF().toDF("id", "media"), "id", "media", batchSize = 2)
    val q = feats.writeStream.outputMode("append").format("memory")
      .queryName("mm_stream_feats").start()
    val payloads = media.as[(Long, Array[Byte])].collect()
    in.addData(payloads.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("mm_stream_feats")
      .select($"id", $"features").as[(Long, Seq[Float])].collect().toMap
    val batch = Multimodal.extractFeatures(media, "id", "media")
      .select($"id", $"features").as[(Long, Seq[Float])].collect().toMap
    assert(streamed == batch)
  }

  test("real PNG/JPEG decode recovers true dimensions; stubs and poison yield nulls") {
    // genuine container bytes through the JDK encoder, decoded by the JDK
    // decoder — plus a RIFF payload (no JDK codec) and a poison payload
    // (PNG magic, garbage body) that must degrade to nulls, not throw
    val png = Multimodal.ImageIoDecode.encode("png", 7, 3, 0x336699)
    val jpg = Multimodal.ImageIoDecode.encode("jpeg", 4, 9, 0xAA5511)
    val poison = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 42.toByte)
    val df = Seq(
      (1L, png), (2L, jpg),
      (3L, Array('R'.toByte, 'I'.toByte, 'F'.toByte, 'F'.toByte, 9.toByte)),
      (4L, poison)).toDF("id", "media")
    val got = Multimodal.decodeDims(df, "id", "media")
      .as[(Long, Option[Int], Option[Int], Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((Some(7), Some(3), Some(3))))
    assert(got(2L) == ((Some(4), Some(9), Some(3))))
    assert(got(3L) == ((None, None, None)))
    assert(got(4L) == ((None, None, None)))
    // the encoded bytes are REAL containers: the magic-byte router agrees
    val fmts = Multimodal.withMetadata(df, "media")
      .select($"id", $"media_meta.format").as[(Long, String)].collect().toMap
    assert(fmts(1L) == "png" && fmts(2L) == "jpeg")
  }

  test("WAV header parse: round trip through real container bytes, null off-format") {
    val wav = Multimodal.WavCodec.encode(
      channels = 2, sampleRate = 44100, bitsPerSample = 16, nFrames = 441)
    val df = Seq((1L, wav), (2L, "not a wav".getBytes("UTF-8"))).toDF("id", "media")
    val got = df.select($"id", Multimodal.wavHeader($"media").as("w"))
      .select($"id", $"w.channels", $"w.sample_rate", $"w.bits_per_sample",
        $"w.n_frames", $"w.duration_ms")
      .collect().map(r => r.getLong(0) -> r).toMap
    val ok = got(1L)
    assert(ok.getInt(1) == 2 && ok.getLong(2) == 44100L && ok.getInt(3) == 16)
    assert(ok.getLong(4) == 441L && ok.getLong(5) == 10L) // 441/44100 s = 10 ms
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(5))
    // the real container routes through the sniffer as RIFF
    val fmt = df.filter($"id" === 1)
      .select(Multimodal.sniffFormat($"media")).as[String].head()
    assert(fmt == "riff")
  }

  test("aHash64: analytic two-tone PNG, lossy-uniform JPEG, poison") {
    import Multimodal.ImageIoDecode
    // left darker than right → high-nibble bits; reversed → low nibbles
    val darkLeft = ImageIoDecode.encodeHalves("png", 16, 16, 0x101010, 0xf0f0f0)
    val darkRight = ImageIoDecode.encodeHalves("png", 16, 16, 0xf0f0f0, 0x101010)
    assert(ImageIoDecode.aHash64(darkLeft).contains(0xF0F0F0F0F0F0F0F0L))
    assert(ImageIoDecode.aHash64(darkRight).contains(0x0F0F0F0F0F0F0F0FL))
    // equal halves: no cell strictly exceeds the mean → 0
    val uniformPng = ImageIoDecode.encode("png", 16, 16, 0x123456)
    assert(ImageIoDecode.aHash64(uniformPng).contains(0L))
    // a UNIFORM image survives lossy JPEG with hash 0 (any DC-preserving
    // codec decodes a flat image to a flat image)
    val uniformJpeg = ImageIoDecode.encode("jpeg", 16, 16, 0x808080)
    assert(ImageIoDecode.aHash64(uniformJpeg).contains(0L))
    // ragged 10×6 blocks still hash exactly via the cross-multiplied compare
    val ragged = ImageIoDecode.encodeHalves("png", 10, 6, 0x000000, 0xffffff)
    assert(ImageIoDecode.aHash64(ragged).isDefined)
    assert(ImageIoDecode.aHash64("not an image".getBytes("UTF-8")).isEmpty)
    assert(ImageIoDecode.aHash64(Array.emptyByteArray).isEmpty)
    // the batch kernel carries the same values end-to-end, null on poison
    val df = Seq((1L, darkLeft), (2L, darkRight),
      (3L, "junk".getBytes("UTF-8"))).toDF("id", "media")
    val got = Multimodal.perceptualHash(df, "id", "media")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(0xF0F0F0F0F0F0F0F0L))
    assert(got(2L).contains(0x0F0F0F0F0F0F0F0FL))
    assert(got(3L).isEmpty)
  }

  test("batch-shaped feature extraction: deterministic, normalized, keyed") {
    val f1 = Multimodal.extractFeatures(media, "id", "media", batchSize = 2)
      .select($"id", $"features").as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.extractFeatures(media, "id", "media", batchSize = 64)
      .select($"id", $"features").as[(Long, Seq[Float])].collect().toMap
    assert(f1 == f2) // batch size must not change results
    assert(f1(4L).length == Multimodal.FakeDecode.FeatureDim)
    assert(math.abs(f1(4L).sum - 1.0f) < 1e-5) // normalized histogram
  }
}
