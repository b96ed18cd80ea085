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
      (1L, "xyz", "en", "s", 3L),      // audio (odd id), 3 bytes
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

  test("decode seam: per-partition decode produces deterministic features") {
    val feats = Multimodal.featureSummary(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // image: lens 4 and 8 -> widths 5,9 heights 5,9; audio: len 3 -> w 4 h 4
    assert(feats("image") === ((2L, 12L, 14L, 14L)))
    assert(feats("audio") === ((1L, 3L, 4L, 4L)))
  }

  test("sampleFrames: evenly spaced frame indices per image") {
    val rows = Multimodal.sampleFrames(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // id 0: 4 bytes -> frames at floor(k*4/4) = 0,1,2,3
    assert(rows.filter(_._1 == 0L).map(_._3) === Seq(0L, 1L, 2L, 3L))
    // id 2: 8 bytes -> 0,2,4,6
    assert(rows.filter(_._1 == 2L).map(_._3) === Seq(0L, 2L, 4L, 6L))
  }
}
