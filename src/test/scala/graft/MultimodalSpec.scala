package graft

import graft.ops.Multimodal

/** Multimodal plumbing: binary payload metadata, the mapPartitions decode
  * seam, and frame-sampling fan-out arithmetic.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val sfDir: String = {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", Seq(
      (0L, "abcd", "en", "s", 4L),     // image (even id), 4 bytes
      (1L, "xyz", "en", "s", 3L),      // video (odd id), 3 bytes
      (2L, "abcdefgh", "en", "s", 8L)  // image, 8 bytes
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    dir
  }

  test("mediaMeta: byte length and sha256 straight off the BINARY column") {
    val rows = Multimodal.mediaMeta(spark, sfDir).collect()
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getString(1) === "image")
    assert(r0.getLong(2) === 4L)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest("abcd".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r0.getString(3) === sha)
  }

  test("real PNG round-trip: imageio decode recovers the generator's parameters") {
    val feats = Multimodal.decodedImageFeatures(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // id 0: 2x2 gray 0 -> luma 0; id 2: 4x4 gray 2 -> luma 2000 milli
    assert(feats === Seq((0L, 2L, 2L, 0L), (2L, 4L, 4L, 2000L)))
  }

  test("decodeImages: real pixel math on a hand-built non-uniform image") {
    import spark.implicits._
    // 2x1 PNG: one black pixel, one white pixel -> mean luma 127.5 ->
    // floor(1000 * (0 + 3*255) / (3*2)) = 127500 milli... = 127500/1000
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000)
    img.setRGB(1, 0, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((42L, bos.toByteArray)).toDF("id", "payload")
    val got = Multimodal.decodeImages(spark, df).collect().toSeq
    assert(got === Seq(Multimodal.ImageFeatures(42L, 2L, 1L, 127500L)))
  }

  test("decodeImages fails loudly on undecodable payload bytes") {
    import spark.implicits._
    val df = Seq((7L, "not a png".getBytes("UTF-8"))).toDF("id", "payload")
    val e = intercept[Exception](Multimodal.decodeImages(spark, df).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("undecodable image payload")), s"got: $e")
  }

  test("resizeExec: executed resample chain preserves constant-fill luma at planned dims") {
    val rows = Multimodal.resizeExec(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // both fixture images are square -> 224x224; gray 0 and 2 preserved
    assert(rows === Seq((0L, 224L, 224L, 0L), (2L, 224L, 224L, 2000L)))
  }

  test("resizeImages: nearest-neighbor really samples a non-uniform source") {
    import spark.implicits._
    // 2x1 black|white upscaled to 224x112: left half black, right half
    // white (sx = x*2 div 224 flips at x=112) -> mean luma exactly 127500
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000)
    img.setRGB(1, 0, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val got = Multimodal.resizeImages(
        spark, Seq((5L, bos.toByteArray)).toDF("id", "payload"), 224)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((5L, 224L, 112L, 127500L)))
  }

  test("featureSummary: real image dims + stubbed video dims per modality") {
    val feats = Multimodal.featureSummary(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // images ids 0,2: real decoded dims (2,2) and (4,4); video len 3 -> w 4 h 4
    assert(feats("image") === ((2L, 6L, 6L)))
    assert(feats("video") === ((1L, 4L, 4L)))
  }

  test("real WAV round-trip: sampled decode recovers the generator's parameters") {
    val feats = Multimodal.decodedAudioFeatures(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    // id 1: n = 1%100+8 = 9 samples at 8 kHz, sample(i) = (31+7i)%65536-32768
    val expected = (0 until 9).map(i => math.abs((1L * 31 + i * 7) % 65536 - 32768))
    assert(feats === Seq((1L, 9L, 8000L, expected.sum, expected.max)))
  }

  test("decodeAudio round-trips a hand-built WAV and fails loudly on junk") {
    import spark.implicits._
    // two samples: -32768 (peak) and 100
    val pcm = Array[Byte](0x00, 0x80.toByte, 100, 0x00)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 2L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val got = Multimodal.decodeAudio(
      spark, Seq((9L, bos.toByteArray)).toDF("id", "payload")).collect().toSeq
    assert(got === Seq(Multimodal.AudioFeatures(9L, 2L, 8000L, 32868L, 32768L)))
    val bad = Seq((8L, "not a wav".getBytes("UTF-8"))).toDF("id", "payload")
    intercept[Exception](Multimodal.decodeAudio(spark, bad).collect())
  }

  test("sampleFrames: evenly spaced frame indices per image") {
    val rows = Multimodal.sampleFrames(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // id 0: 4 bytes -> frames at floor(k*4/4) = 0,1,2,3
    assert(rows.filter(_._1 == 0L).map(_._3) === Seq(0L, 1L, 2L, 3L))
    // id 2: 8 bytes -> 0,2,4,6
    assert(rows.filter(_._1 == 2L).map(_._3) === Seq(0L, 2L, 4L, 6L))
  }

  test("scene cuts: boundary exactly where the frame delta crosses threshold") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", Seq(
      // 8 bytes: frames sample every byte; 'a'(97) -> ' '(32) jumps 65
      // >= 30 at k=4 -> two scenes
      (0L, "aaaa    ", "en", "s", 8L),
      // adjacent letters: max delta 1 -> a single scene
      (2L, "abcdefgh", "en", "s", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Multimodal.sceneCuts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows === Seq(
      (0L, 0L, 0L, 3L, 4L), (0L, 1L, 4L, 7L, 4L),
      (2L, 0L, 0L, 7L, 8L)))
    // the in-row (stateless-streaming) formulation is row-for-row equal
    // to the window formulation — the shared-oracle contract
    val inline = Multimodal.sceneFrame(Multimodal.mediaTable(spark, dir))
      .orderBy("id", "scene_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(inline === rows)
  }

  test("aHash through the real codec chain equals the generator arithmetic") {
    val rows = Multimodal.imageAHash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // replay the pattern + 8x8 floor-grid + floor-mean threshold in
    // plain Scala — what the DuckDB oracle does; the decode path must
    // land on exactly these bits
    def expected(id: Long): (Long, Long, Long, Long, Long) = {
      val w = id % 31 + 2
      val h = id % 17 + 2
      val s = (0 until 64).map { j =>
        val sx = (j % 8) * w / 8
        val sy = (j / 8) * h / 8
        (id * 31 + sx * 7 + sy * 13) % 256
      }
      val avg = s.sum / 64
      var lo = 0L; var hi = 0L
      s.zipWithIndex.foreach { case (v, j) =>
        if (v > avg) { if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32) }
      }
      (id, w, h, lo, hi)
    }
    assert(rows === Seq(expected(0L), expected(2L)))
    // the patterned images are non-degenerate: some bits set
    assert(rows.exists(r => r._4 != 0L || r._5 != 0L))
  }

  test("aHash pairing: banded candidates find the exact-duplicate image, d<=3 verified") {
    import spark.implicits._
    val dir = tempSfDir()
    // 134912 = lcm(31*17 dims, 256 pattern period)-aligned: its pattern
    // image is IDENTICAL to id 0's -> a guaranteed hamming-0 pair
    val ids = Seq(0L, 2L, 134912L)
    writeTable(dir, "documents",
      ids.map(i => (i, "t", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Multimodal.aHashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // brute-force replay over the generator-arithmetic hashes
    def hash(id: Long): (Long, Long) = {
      val w = id % 31 + 2; val h = id % 17 + 2
      val s = (0 until 64).map { j =>
        (id * 31 + ((j % 8) * w / 8) * 7 + ((j / 8) * h / 8) * 13) % 256
      }
      val avg = s.sum / 64
      var lo = 0L; var hi = 0L
      s.zipWithIndex.foreach { case (v, j) =>
        if (v > avg) { if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32) }
      }
      (lo, hi)
    }
    val exp = (for {
      a <- ids; b <- ids if a < b
      (la, ha) = hash(a); (lb, hb) = hash(b)
      d = java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (a, b, d.toLong)).sorted
    assert(rows === exp)
    assert(rows.contains((0L, 134912L, 0L)))
  }
}
