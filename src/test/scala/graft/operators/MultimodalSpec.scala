package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "an image stand-in payload"),   // even id -> BMP
    (1L, "an audio stand-in payload")    // odd id  -> WAV
  ).toDF("doc_id", "text")

  test("binary payload plumbing preserves ids, byte lengths, media types") {
    val out = Multimodal.attachBinary(docs).collect()
    assert(out.map(_.doc_id).toSet == Set(0L, 1L))
    assert(out.forall(r => r.payload.length == r.n_bytes))
    assert(out.map(r => r.doc_id -> r.media_type).toMap ==
      Map(0L -> "image/bmp", 1L -> "audio/wav"))
  }

  test("REAL BMP decode: known 2x2 pixels give exact channel means") {
    // red, green, blue, white -> each channel averages (255+255)/4/255 = 0.5
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", out)
    val f = Multimodal.decodeImage(out.toByteArray)
    assert(f(0) == 2f && f(1) == 2f)                       // width, height
    assert(f(2) == 0.5f && f(3) == 0.5f && f(4) == 0.5f)   // mean R, G, B
    assert(math.abs(f(5) - 0.5f) < 1e-6)                   // luminance
  }

  test("bilinear resize: 2x downscale of a known gradient is the exact pixel math") {
    // 4x1 grayscale ramp 0,40,80,120 -> 2x1 with half-pixel centers:
    // out x=0 samples srcX=0.5 -> (0+40)/2=20; out x=1 samples srcX=2.5 -> 100
    val img = new java.awt.image.BufferedImage(4, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4) { val v = 40 * x; img.setRGB(x, 0, (v << 16) | (v << 8) | v) }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", out)
    val resized = ImageIO.read(new ByteArrayInputStream(
      Multimodal.resizeBmp(out.toByteArray, 2, 1)))
    assert(resized.getWidth == 2 && resized.getHeight == 1)
    assert((resized.getRGB(0, 0) & 0xff) == 20)
    assert((resized.getRGB(1, 0) & 0xff) == 100)
  }

  test("bilinear resize: upscale interpolates between neighbors, clamps edges") {
    // 2x1 black|white -> 4x1: centers at srcX -0.25,0.25,0.75,1.25
    // -> clamp,64(=0.25*255 rounded),191,clamp
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", out)
    val r = ImageIO.read(new ByteArrayInputStream(
      Multimodal.resizeBmp(out.toByteArray, 4, 1)))
    val px = (0 until 4).map(x => r.getRGB(x, 0) & 0xff)
    assert(px == Seq(0, 64, 191, 255), s"got $px")
  }

  test("resize preserves mean luminance within quantization, and is deterministic") {
    val payload = Multimodal.synthesizeBmp("the quick brown fox jumps over it")
    val a = Multimodal.resizeBmp(payload, 16, 16)
    val b = Multimodal.resizeBmp(payload, 16, 16)
    assert(java.util.Arrays.equals(a, b), "resize must be bit-deterministic")
    val lumIn = Multimodal.meanLuminance(payload)
    val lumOut = Multimodal.meanLuminance(a)
    // bilinear resampling conserves mean up to edge rounding; 8x8 -> 16x16
    // of a byte-noise fixture stays within ~2% in practice
    assert(math.abs(lumIn - lumOut) < 0.02, s"lum drifted: $lumIn -> $lumOut")
    val up = ImageIO.read(new ByteArrayInputStream(a))
    assert(up.getWidth == 16 && up.getHeight == 16)
  }

  test("REAL WAV decode: sine fixture has the analytic RMS and crossing rate") {
    // doc_id 1 -> 250 Hz sine, amp 12000, 8 kHz, 400 samples
    val f = Multimodal.decodeAudio(Multimodal.synthesizeWav(1L))
    assert(f(0) == 400f)                                    // n_samples
    val expectedRms = 12000.0 / math.sqrt(2.0) / 32768.0
    assert(math.abs(f(1) - expectedRms) < 0.01, s"rms=${f(1)}")
    val expectedZcr = 2.0 * 250.0 / 8000.0                  // 2f/fs
    assert(math.abs(f(2) - expectedZcr) < 0.01, s"zcr=${f(2)}")
  }

  test("pipeline decodes per media type, deterministically") {
    val run1 = Multimodal.pipeline(spark, docs).orderBy("doc_id").collect()
    val run2 = Multimodal.pipeline(spark, docs).orderBy("doc_id").collect()
    assert(run1.sameElements(run2))
    val image = run1(0); val audio = run1(1)
    assert(image.getAs[Double]("f0") == 8.0 && image.getAs[Double]("f1") == 8.0)
    assert(audio.getAs[Double]("f0") == 400.0)
    assert(audio.getAs[Double]("f1") > 0.2 && audio.getAs[Double]("f1") < 0.3)
  }
}

/** dHash invariants: identical pixels ⇒ identical hash; a uniform
  * brightness shift preserves every luminance ORDERING so the hash is
  * bit-identical; unrelated images sit far apart; the banded pair join
  * reports exactly the near pairs. */
class ImageDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def bmp(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, f(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  private def grey(v: Int): Int = { val c = v.max(0).min(255); (c << 16) | (c << 8) | c }

  test("dHash is invariant under a uniform brightness shift") {
    val gradient = bmp((x, y) => grey(20 + 25 * x + y))
    val brighter = bmp((x, y) => grey(60 + 25 * x + y))
    assert(Multimodal.dHash(gradient) == Multimodal.dHash(brighter))
  }

  test("banded pair join reports exactly the near pairs") {
    val rnd = new scala.util.Random(5L)
    val base = bmp((x, y) => grey(20 + 25 * x + y))
    val shifted = bmp((x, y) => grey(50 + 25 * x + y))     // same orderings
    val noise1 = bmp((_, _) => grey(rnd.nextInt(256)))
    val noise2 = bmp((_, _) => grey(rnd.nextInt(256)))
    val media = Seq(
      Multimodal.MediaRecord(0L, base, "image/bmp", base.length),
      Multimodal.MediaRecord(2L, shifted, "image/bmp", shifted.length),
      Multimodal.MediaRecord(4L, noise1, "image/bmp", noise1.length),
      Multimodal.MediaRecord(6L, noise2, "image/bmp", noise2.length),
      // audio rows must be ignored by the image path
      Multimodal.MediaRecord(1L, Array[Byte](1, 2), "audio/wav", 2)).toDS()
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((0L, 2L)), pairs.toString)
    assert(pairs.head._3 == 0) // brightness shift ⇒ Hamming 0
  }
}

/** Audio fingerprint invariants: gain scaling preserves every window-
  * energy ordering (identical hash); different tones diverge; the banded
  * pair join reports exactly the near pairs and ignores images. */
class AudioDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def wav(freq: Double, amp: Int): Array[Byte] = {
    val n = 400
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = (amp * math.sin(2.0 * math.Pi * freq * i / 8000.0)).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("fingerprint is invariant under gain scaling") {
    assert(Multimodal.audioFingerprint(wav(300, 12000)) ==
      Multimodal.audioFingerprint(wav(300, 3000)))
  }

  test("banded pair join reports exactly the same-tone pairs") {
    val media = Seq(
      Multimodal.MediaRecord(1L, wav(300, 12000), "audio/wav", 0),
      Multimodal.MediaRecord(3L, wav(300, 4000), "audio/wav", 0),  // same tone, quieter
      Multimodal.MediaRecord(5L, wav(707, 12000), "audio/wav", 0), // different tone
      Multimodal.MediaRecord(0L, Array[Byte](1), "image/bmp", 1)   // ignored
    ).toDS()
    val pairs = Multimodal.audioNearDupPairs(media, maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 3L)), pairs.toString)
    assert(pairs.head._3 == 0)
  }
}

class FrameSampleSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("frame sampling: image rows and audio windows, every 2nd frame") {
    val docs = Seq((0L, "image doc"), (1L, "audio doc")).toDF("doc_id", "text")
    val media = Multimodal.attachBinary(docs)
    val frames = Multimodal.sampleFrames(media, frameSamples = 100, everyNth = 2)
      .collect()
    // image: 8 pixel rows, every 2nd -> rows 0,2,4,6
    assert(frames.filter(_.doc_id == 0L).map(_.frame_idx).sorted.toSeq ==
      Seq(0, 2, 4, 6))
    // audio: 400 samples / 100 -> windows 0..3, every 2nd -> 0,2
    assert(frames.filter(_.doc_id == 1L).map(_.frame_idx).sorted.toSeq ==
      Seq(0, 2))
    // a steady sine's per-window RMS is flat across windows
    val rms = frames.filter(_.doc_id == 1L).map(_.features(0))
    assert(math.abs(rms(0) - rms(1)) < 0.01)
  }
}
