package graft

import graft.ops.{Corpus, EventWindows, UrlCount}
import org.apache.spark.sql.functions._

/** Corpus-management semantics on constructed inputs: priority-merge
  * winner rule, shard-plan prefix-sum contiguity, shard write layout,
  * and the result-equivalence of the explicit skew-mitigation shapes.
  */
class CorpusSpec extends SparkSpec {

  // docs 1, 2, 4 share the first-5-token lead fingerprint (doc 4 only
  // after case folding); doc 5 is shorter than the lead width
  private lazy val sfDir: String = {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", Seq(
      (1L, "alpha beta gamma delta epsilon tail one", "en", "src2", 38L),
      (2L, "alpha beta gamma delta epsilon other tail", "en", "src0", 40L),
      (3L, "unique opening line for doc three xyz", "en", "src1", 37L),
      (4L, "ALPHA beta GAMMA delta epsilon zeta", "en", "src10", 35L),
      (5L, "short", "en", "src3", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    dir
  }

  test("priorityMerge keeps the most-trusted source per lead fingerprint") {
    val rows = Corpus.priorityMerge(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.length === 3) // {1,2,4}, {3}, {5}
    // the shared-lead group resolves to doc 2 (src0 outranks src2/src10)
    assert(rows.contains((2L, "src0", 3L)))
    assert(rows.contains((3L, "src1", 1L)))
    assert(rows.contains((5L, "src3", 1L)))
  }

  test("priorityMerge fails loudly (in-plan) on unrankable source names") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "src1", 30L),
      (2L, "other text entirely here now", "en", "weird", 28L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    // construction is lazy (no eager scan-doubling require); the guard
    // raises from inside the plan when the bad dimension row evaluates
    val df = Corpus.priorityMerge(spark, dir)
    val e = intercept[Exception](df.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("unrankable source name")),
      s"unexpected failure: $e")
  }

  test("shardPlan emits a contiguous global token interval per doc") {
    val rows = Corpus.shardPlan(spark, sfDir, tokensPerShard = 5, bucketSize = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // token counts: 7, 7, 7, 6, 1 -> starts 0, 7, 14, 21, 27
    assert(rows.map(_._2).toSeq === Seq(7L, 7L, 7L, 6L, 1L))
    // contiguity: each start = previous start + previous tokens
    rows.sliding(2).foreach { case Array((_, n1, s1, _), (_, _, s2, _)) =>
      assert(s2 === s1 + n1)
    }
    // shard = floor(global_start / budget)
    rows.foreach { case (_, _, start, shard) => assert(shard === start / 5) }
    assert(rows.map(_._4).toSeq === Seq(0L, 1L, 2L, 4L, 5L))
  }

  test("writeShards materializes one partition directory per shard") {
    val out = tempSfDir() + "/shards"
    Corpus.writeShards(spark, sfDir, out, tokensPerShard = 5)
    val back = spark.read.parquet(out)
    assert(back.count() === 5)
    // partition column survives the round trip with the planned values
    // (read back via directory-name inference, so cast explicitly)
    val shards = back.select(col("shard_id").cast("long")).distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(shards === Seq(0L, 1L, 2L, 4L, 5L))
    // every doc carries its full row (text intact) plus the plan columns
    assert(back.columns.toSet.contains("text") &&
      back.columns.toSet.contains("global_start"))
  }

  test("salted two-phase counts equal the plain single-phase counts") {
    val docs = GraftSession.table(spark, sfDir, "documents")
    val plain = UrlCount.tokenCounts(docs, "text").collect().toSeq
    val salted = UrlCount.saltedTokenCounts(docs, "text", "doc_id", salts = 4)
      .collect().toSeq
    assert(salted === plain)
  }

  test("mix sampler: decisions match an independent md5 computation, and repeat exactly") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = Seq("src0", "src1", "src2", "src3", "src10").map { src =>
      val docs = Seq(1L, 2L, 3L, 4L, 5L).zip(
        Seq("src2", "src0", "src1", "src10", "src3")).filter(_._2 == src).map(_._1)
      val rate = h60(s"rate:$src") % 800 + 100
      (src, rate, docs.length.toLong,
        docs.count(id => h60(s"mix:$id") % 1000 < rate).toLong)
    }.filter(_._3 > 0).sortBy(_._1)
    def run() = Corpus.mixSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = run()
    assert(got === expected.sortBy(_._1))
    assert(got === run()) // hash coin, not RNG: identical on re-run
  }

  test("two-phase distinct users equals COUNT(DISTINCT)") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      ("view", 1L), ("view", 1L), ("view", 2L),
      ("purchase", 1L), ("purchase", 1L)
    ).toDF("event_type", "user_id"))
    val rows = EventWindows.distinctUsersPerType(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === Map("view" -> 2L, "purchase" -> 1L))
  }

  test("temperature mix: sqrt-damped ppm weights and integer targets") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", (
      (1L to 4L).map(i => (i, "t", "en", "a", 1L)) :+ ((9L, "t", "en", "b", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.temperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // s_milli: sqrt(4)*1000 = 2000, sqrt(1)*1000 = 1000; tot 3000
    // w_ppm: 2e9/3000 = 666666, 1e9/3000 = 333333; targets of 5 docs: 3, 1
    assert(rows === Seq(
      ("a", 4L, 2000L, 666666L, 3L),
      ("b", 1L, 1000L, 333333L, 1L)))
  }

  test("source cap: k smallest ids kept per source via the bounded aggregate") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", (
      Seq(4L, 2L, 7L, 1L).map(i => (i, "t", "en", "a", 1L)) :+ ((9L, "t", "en", "b", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.sourceCap(spark, dir, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(
      ("a", 4L, 1L, 1L),
      ("a", 4L, 2L, 2L),
      ("b", 1L, 9L, 1L)))
  }

  test("dsir weights: exact smoothed ratio, collision-free by shared vocab") {
    import spark.implicits._
    val dir = tempSfDir()
    // both docs use the SAME word, so bucket collisions are impossible:
    // t_x = 2 (src0), c_x = 6 -> r = (1000*3) div 7 = 428 for every token
    writeTable(dir, "documents", Seq(
      (1L, "x x", "en", "src0", 3L),
      (2L, "x x x x", "en", "src1", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.dsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, 2L, 428L), (2L, 4L, 428L)))
  }

  test("dsir weights: target-only corpus scores exactly 1000 everywhere") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", Seq(
      (1L, "alpha beta gamma", "en", "src0", 16L),
      (2L, "delta beta", "en", "src0", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    // target == corpus -> t_b = c_b for every bucket -> r_milli = 1000
    val rows = Corpus.dsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows === Seq((1L, 1000L), (2L, 1000L)))
  }

  test("dsir scoring: map-literal serving form equals the join form") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", Seq(
      (1L, "alpha beta alpha gamma", "en", "src0", 22L),
      (2L, "beta beta delta", "en", "src1", 15L),
      (3L, "gamma epsilon", "en", "src2", 13L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val joined = Corpus.dsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ratio = Corpus.dsirRatioTable(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mapped = Corpus.dsirScoreFrame(docs, ratio).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mapped === joined)
  }

  test("epoch shuffle: per-epoch permutation, contiguous shard positions, epochs differ") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", (1L to 40L).map(i =>
      (i, s"doc $i", "en", "s", 6L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.epochShuffle(spark, dir, epochs = 2, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // each epoch covers every doc exactly once
    for (e <- 0L to 1L) {
      val ep = rows.filter(_._1 == e)
      assert(ep.map(_._2).sorted === (1L to 40L))
      // positions within each shard are contiguous 1..size
      ep.groupBy(_._3).foreach { case (_, sh) =>
        assert(sh.map(_._4).sorted === (1L to sh.length.toLong))
      }
    }
    // the seeded hash gives each epoch a DIFFERENT order: compare the
    // doc sequence read shard-major (the trainer's stream order)
    val order = (e: Long) => rows.filter(_._1 == e).sortBy(r => (r._3, r._4)).map(_._2)
    assert(order(0L) !== order(1L))
    // deterministic: a second plan produces the identical assignment
    val again = Corpus.epochShuffle(spark, dir, epochs = 2, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(again === rows)
  }

  test("pack plan: accounting matches a plain-Scala replay of the shuffle order") {
    import spark.implicits._
    val dir = tempSfDir()
    // doc i carries i tokens — spans differ, so small windows force
    // boundary crossings
    writeTable(dir, "documents", (1L to 40L).map(i =>
      (i, (1L to i).map(_ => "w").mkString(" "), "en", "s", 2 * i)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val c = 16L
    val got = Corpus.packPlan(spark, dir, contextLen = c, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // independent replay: epochShuffle's epoch-0 (shard, pos) IS the
    // pack order by construction; fold token counts per shard in Scala
    val order = Corpus.epochShuffle(spark, dir, epochs = 1, nShards = 8).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(1))) // (shard, pos, doc)
    val expected = order.groupBy(_._1).toSeq.sortBy(_._1).map { case (shard, sh) =>
      val ns = sh.sortBy(_._2).map(_._3) // token count of doc i = i
      val cums = ns.scanLeft(0L)(_ + _).tail
      val total = cums.last
      val nWin = (total + c - 1) / c
      val nBoundary = ns.zip(cums).count { case (n, end) =>
        (end - n) / c != (end - 1) / c }
      (shard, ns.length.toLong, total, nWin, nWin * c - total, nBoundary.toLong)
    }
    assert(got === expected)
    // every shard must be populated and windows cover tokens exactly once
    assert(got.map(_._1) === (0L to 7L))
    assert(got.map(t => t._4 * c) === got.map(t => t._3 + t._5))
  }

  test("padding audit: hand-computed waste under global and bucketed caps") {
    import spark.implicits._
    val dir = tempSfDir()
    // token counts 3, 70, 130 -> global cap 130; bucket64 caps 64/128/192
    writeTable(dir, "documents", Seq(
      (1L, (1 to 3).map(_ => "w").mkString(" "), "en", "s", 5L),
      (2L, (1 to 70).map(_ => "w").mkString(" "), "en", "s", 139L),
      (3L, (1 to 130).map(_ => "w").mkString(" "), "en", "s", 259L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.paddingAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val padded64 = 64L + 128L + 192L   // 384
    val padded256 = 256L * 3           // 768
    val padded_g = 130L * 3            // 390
    assert(rows === Seq(
      ("bucket256", 3L, 203L, padded256, 1000L * (padded256 - 203) / padded256),
      ("bucket64", 3L, 203L, padded64, 1000L * (padded64 - 203) / padded64),
      ("global", 3L, 203L, padded_g, 1000L * (padded_g - 203) / padded_g)))
  }

  test("curriculum mix: uniform at epoch 0, quality-proportional at the last epoch") {
    import spark.implicits._
    val dir = tempSfDir()
    // two sources with clearly different corpus-LM fluency: src_a is
    // pure repetition (all conditionals 1000); src_b's first words fan
    // out to many successors (every conditional is a genuine split —
    // one-off bigrams would still score 1000 since c_w1 would be 1)
    writeTable(dir, "documents", Seq(
      (1L, "x y x y x y x y", "en", "src_a", 15L),
      (2L, "x y x y x y", "en", "src_a", 11L),
      (3L, "p a p b p c p d", "en", "src_b", 15L),
      (4L, "q a q b q c q d", "en", "src_b", 15L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.curriculumMix(spark, dir, epochs = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // epoch 0: exactly uniform 1000 div 2 regardless of quality
    val e0 = rows.filter(_._1 == 0L).map(_._4).toSet
    assert(e0 === Set(500L))
    // last epoch: exactly (1000 * q) div sum_q
    val qs = rows.filter(_._1 == 2L).map(r => r._2 -> (r._3, r._4)).toMap
    val sumQ = qs.values.map(_._1).sum
    qs.foreach { case (_, (q, w)) => assert(w === (1000L * q) / sumQ) }
    // the fluent source ends the schedule over-weighted
    assert(qs("src_a")._2 > qs("src_b")._2)
    // middle epoch is the floor-average of the endpoints' formulas
    rows.filter(_._1 == 1L).foreach { case (_, s, q, w, _) =>
      assert(w === (500L + (1000L * q) / sumQ) / 2L)
    }
  }

  test("ccnet buckets: hand-computed tercile edges over the lm histogram") {
    import spark.implicits._
    val dir = tempSfDir()
    // corpus bigrams: "a b" x3, "a c" x1, "b a" x1 -> c_a. = 4, c_b. = 1
    // conds: a b = 750, a c = 250, b a = 1000
    // lm: d1 = 750, d2 = 250, d3 = (750+1000+750)/3 = 833
    // edges (n=3, one doc per value): e1 = 250, e2 = 750
    writeTable(dir, "documents", Seq(
      (1L, "a b", "en", "s", 3L),
      (2L, "a c", "en", "s", 3L),
      (3L, "a b a b", "en", "s", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.ccnetBuckets(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(
      ("en", "head", 1L, 3L),
      ("en", "middle", 1L, 1L),
      ("en", "tail", 1L, 1L)))
  }

  // —— distillation: exact Cramer solve re-derived with BigInt ——

  private lazy val distillDir: String = {
    import spark.implicits._
    val dir = tempSfDir()
    // ids 1..10: % 5 < 4 -> 8 train, 2 holdout (4, 9); varied length,
    // stopword mix, and bigram repetition so the teacher has spread.
    // doc 11 is a 1-token doc: no teacher, still servable by the student
    writeTable(dir, "documents", Seq(
      (1L, "the cat sat on the mat", "en", "s", 22L),
      (2L, "the cat sat on a hat", "en", "s", 20L),
      (3L, "a dog ran in the park", "en", "s", 21L),
      (4L, "the dog sat in the park", "en", "s", 23L),
      (5L, "word salad entropy maximal chaos", "en", "s", 32L),
      (6L, "the cat sat on the mat again and again", "en", "s", 39L),
      (7L, "a cat and a dog sat", "en", "s", 19L),
      (8L, "the park is full of dogs", "en", "s", 24L),
      (9L, "chaos reigns in the park of dogs", "en", "s", 32L),
      (10L, "the mat sat on the cat", "en", "s", 22L),
      (11L, "singleton", "en", "s", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    dir
  }

  private def bigIntSolve(train: Seq[(Long, Long, Long)])
    : (BigInt, BigInt, BigInt, BigInt) = {
    val n = BigInt(train.length)
    val s1 = train.map(t => BigInt(t._1)).sum
    val s2 = train.map(t => BigInt(t._2)).sum
    val s11 = train.map(t => BigInt(t._1) * t._1).sum
    val s12 = train.map(t => BigInt(t._1) * t._2).sum
    val s22 = train.map(t => BigInt(t._2) * t._2).sum
    val sy = train.map(t => BigInt(t._3)).sum
    val s1y = train.map(t => BigInt(t._1) * t._3).sum
    val s2y = train.map(t => BigInt(t._2) * t._3).sum
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b0n = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val b1n = n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val b2n = n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    (det, b0n, b1n, b2n)
  }

  // pred via the clamp-then-divide rule; all operands nonneg at the
  // division, so BigInt / (trunc) == floor == both engines' int div
  private def bigIntPred(c: (BigInt, BigInt, BigInt, BigInt),
                         x1: Long, x2: Long): Long = {
    val (det, b0n, b1n, b2n) = c
    val num = b0n + b1n * x1 + b2n * x2
    ((num.max(BigInt(0)).min(det * 1000)) / det).toLong
  }

  test("distill: Spark's decimal Cramer solve equals the exact BigInt solve") {
    val (j, c) = Corpus.distillParts(spark, distillDir)
    val jr = j.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // split rule: doc_id % 5 < 4, and the 1-token doc never joins a teacher
    assert(jr.count(_._5 == "train") === 8)
    assert(jr.filter(_._5 == "holdout").map(_._1).sorted.toSeq === Seq(4L, 9L))
    assert(!jr.exists(_._1 == 11L))
    val expected = bigIntSolve(jr.filter(_._5 == "train")
      .map(t => (t._2, t._3, t._4)).toSeq)
    val cr = c.collect()(0)
    val got = (BigInt(cr.getDecimal(0).toBigInteger), BigInt(cr.getDecimal(1).toBigInteger),
      BigInt(cr.getDecimal(2).toBigInteger), BigInt(cr.getDecimal(3).toBigInteger))
    assert(got === expected)
    assert(expected._1 > 0, "Gram determinant must be positive")
  }

  test("distillFit: per-split MAE and micro coefficients match the rationals") {
    val (j, _) = Corpus.distillParts(spark, distillDir)
    val jr = j.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val cc = bigIntSolve(jr.filter(_._5 == "train").map(t => (t._2, t._3, t._4)).toSeq)
    def microOf(num: BigInt): Long =
      (if (num >= 0) (num * 1000000) / cc._1
       else -((-num * 1000000) / cc._1)).toLong
    val bySplit = jr.groupBy(_._5).map { case (s, rs) =>
      val errs = rs.map(t => math.abs(bigIntPred(cc, t._2, t._3) - t._4))
      val preds = rs.map(t => bigIntPred(cc, t._2, t._3))
      s -> (rs.length.toLong, errs.sum / rs.length, preds.sum / rs.length,
        rs.map(_._4).sum / rs.length)
    }
    val rows = Corpus.distillFit(spark, distillDir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("holdout", "train"))
    rows.foreach { r =>
      val (n, mae, mp, ml) = bySplit(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === mae)
      assert(r.getLong(3) === mp)
      assert(r.getLong(4) === ml)
      assert(r.getLong(5) === microOf(cc._2))
      assert(r.getLong(6) === microOf(cc._3))
      assert(r.getLong(7) === microOf(cc._4))
    }
  }

  test("distillScoreFrame: serving equals the fit's predictions, teacher-free docs included") {
    val (j, _) = Corpus.distillParts(spark, distillDir)
    val jr = j.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val cc = bigIntSolve(jr.filter(_._5 == "train").map(t => (t._2, t._3, t._4)).toSeq)
    val coeffs = Corpus.distillCoeffStrings(spark, distillDir)
    assert(coeffs._1 === cc._1.toString)
    val served = Corpus.distillScoreFrame(
        GraftSession.table(spark, distillDir, "documents"), coeffs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // every doc with tokens is scored — including the teacher-free 1-token doc
    assert(served.keySet === (1L to 11L).toSet)
    served.foreach { case (_, (x1, x2, pred)) =>
      assert(pred === bigIntPred(cc, x1, x2))
      assert(pred >= 0L && pred <= 1000L)
    }
  }

  test("snapshotDiff: one cohort per status, hand-checked residues") {
    import spark.implicits._
    val dir = tempSfDir()
    // %10 residues: 3 -> removed (absent from new), 7 -> added (absent
    // from old), 5 -> changed (re-edited in new), 4 -> unchanged
    writeTable(dir, "documents", Seq(
      (3L, "x", "en", "s1", 1L), (7L, "y", "en", "s1", 1L),
      (5L, "z", "en", "s2", 1L), (4L, "w", "en", "s2", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.snapshotDiff(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq(
      ("s1", "added", 1L), ("s1", "removed", 1L),
      ("s2", "changed", 1L), ("s2", "unchanged", 1L)))
  }

  test("termDrift: add-one smoothed lift, movers ordered by distance from 1000") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "documents", Seq(
      (0L, "a a b", "en", "s", 5L),   // old half: a=2 b=1, T=3
      (1L, "a b b b", "en", "s", 7L)  // new half: a=1 b=3, T=4
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    // V=2; lift(a) = (3*6*1000) div (2*5) = 1800; lift(b) = 12000 div 20 = 600
    val rows = Corpus.termDrift(spark, dir, minSupport = 1L, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(("a", 2L, 1L, 1800L), ("b", 1L, 3L, 600L)))
  }

  test("tokenBudget: exact integer allocation with the epoch cap") {
    import spark.implicits._
    val dir = tempSfDir()
    // s1: 9 tokens, s2: 16 tokens -> s_milli 3000/4000, tot_s 7000
    writeTable(dir, "documents", Seq(
      (1L, "t t t t t t t t t", "en", "s1", 17L),
      (2L, "u u u u u u u u u u u u u u u u", "en", "s2", 31L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.tokenBudget(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // w_ppm: (1e6*3000) div 7000 = 428571, (1e6*4000) div 7000 = 571428
    // want: (w_ppm * 25 * 2) div 1e6 -> 21 / 28
    // epochs: min(4000, 21000 div 9)=2333, min(4000, 28000 div 16)=1750
    // alloc: 9*2333 div 1000 = 20, 16*1750 div 1000 = 28
    assert(rows === Seq(
      ("s1", 9L, 428571L, 21L, 2333L, 20L, 1L),
      ("s2", 16L, 571428L, 28L, 1750L, 28L, 0L)))
  }

  test("sourceGini: Lorenz shares and rank-form Gini, hand-computed") {
    import spark.implicits._
    val dir = tempSfDir()
    // token counts 9 / 16: S=25, S1 = 1*9 + 2*16 = 41
    // gini = floor(1000 * (2*41 - 3*25) / (2*25)) = 140
    writeTable(dir, "documents", Seq(
      (1L, "t t t t t t t t t", "en", "s1", 17L),
      (2L, "u u u u u u u u u u u u u u u u", "en", "s2", 31L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.sourceGini(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(rows === Seq(
      (1L, "s1", 9L, 360L, 140L),
      (2L, "s2", 16L, 1000L, 140L)))
  }

  test("sketchProfile: shard union dedups cross-shard tokens, gate true") {
    import spark.implicits._
    val dir = tempSfDir()
    // source s1 spreads token "x" over BOTH shards (doc_id 0 and 1):
    // a sum of per-shard distincts would say 4; the union must say 3
    writeTable(dir, "documents", Seq(
      (0L, "x a", "en", "s1", 3L),  // shard 0
      (1L, "x b", "en", "s1", 3L),  // shard 1
      (2L, "y y y", "en", "s2", 5L) // shard 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.sketchProfile(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(rows === Seq(
      ("s1", 2L, 4L, 3L, true),
      ("s2", 1L, 3L, 1L, true)))
  }

  test("profileRefreshAudit: fold-in loses nothing; store rollup is exchange-free") {
    import spark.implicits._
    val dir = tempSfDir()
    // doc 0 (0 % 4 == 0) arrives in the FOLD-IN batch; its token "x"
    // also lives in base doc 1 — the union over the folded store must
    // still dedup it for the gate to hold
    writeTable(dir, "documents", Seq(
      (0L, "x a", "en", "s1", 3L),
      (1L, "x b", "en", "s1", 3L),
      (2L, "y y y", "en", "s2", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.profileRefreshAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(rows === Seq(
      ("s1", 2L, 4L, 3L, true),
      ("s2", 1L, 3L, 1L, true)))
    // the serving rollup on the source-bucketed store plans with no
    // Exchange: the shuffle was paid once at write time
    val name = graft.sources.Bucketed.scopedName(spark, "graft_profile_store")
    val rollup = spark.table(name).groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("n").as("t"))
    assert(!rollup.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("profileCompactAudit: colliding batch halves compact to one sketch per shard") {
    import spark.implicits._
    val dir = tempSfDir()
    // docs 1 (base) and 9 (fresh, 9 % 3 == 0) both land in s1 shard 1:
    // before = 2 sketch rows, after = 1; the compacted union must still
    // see tokens from BOTH batches ("x" dedups, "a"/"b" both count)
    writeTable(dir, "documents", Seq(
      (1L, "x a", "en", "s1", 3L),
      (9L, "x b", "en", "s1", 3L),
      (2L, "y y y", "en", "s2", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = Corpus.profileCompactAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(rows === Seq(
      ("s1", 2L, 1L, 4L, 3L, true),
      ("s2", 1L, 1L, 3L, 1L, true)))
  }

  test("weighted sample: k smallest u-div-w priorities per source, heavier docs favored") {
    import spark.implicits._
    val dir = tempSfDir()
    // one source, 20 docs; doc 7 gets weight 1000000 so its priority
    // (u div w) is near-certainly the smallest — the weighted draw must
    // rank it first while the rest order by their own u div 1 hashes
    writeTable(dir, "documents",
      (1L to 20L).map(i =>
        (i, "t", "en", "s0", if (i == 7L) 1000000L else 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = graft.ops.Corpus.weightedSample(spark, dir, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows.length === 3)
    assert(rows.head._1 === "s0" && rows.head._2 === (19L + 1000000L))
    assert(rows.head._4 === 7L) // rk 1 = the heavy doc
    // priorities replay exactly: u div w with the shared md5 family
    def h60(s: String): BigInt = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(hex.substring(0, 15), 16)
    }
    assert(rows.head._5 === (h60("samp:7") / 1000000L).toLong)
    // ranks are ordered by priority
    assert(rows.map(_._5) === rows.map(_._5).sorted)
  }

  test("epoch repeat plan: chained decay marginals, prefix-closed greedy under the budget") {
    import spark.implicits._
    val dir = tempSfDir()
    // two sources: s0 has 10 tokens/doc x 1 doc, s1 has 2 tokens.
    // total = 12, budget = 24. marginals: s0: 10,6,3,1; s1: 2,1,0,0.
    // greedy order: 10,6,3(cum 30>24 stop taking s0)...
    // cum_raw order: s0e1=10, s0e2=20, s0e3=30x, s1e1=22, s1e2=24, then
    // ... recompute precisely in the assert below
    writeTable(dir, "documents", Seq(
      (1L, "a b c d e f g h i j", "en", "s0", 19L),
      (2L, "k l", "en", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = graft.ops.Corpus.epochRepeatPlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // marginals: s0: 10, 6, 3, 1; s1: 2, 1, 0, 0. budget = 2*12 = 24.
    // ranked: s0e1(10) cum10, s0e2(6) cum20, s0e3(3) cum30 REJECT,
    // s1e1(2) cum32 REJECT, ... all later cums only grow -> s0 takes 2
    // epochs, s1 none (greedy is cumulative, not best-fit: the audit
    // shows exactly what a budget pass would stream out)
    assert(rows === Seq(
      ("s0", 10L, 2L, 20L, 16L),
      ("s1", 2L, 0L, 0L, 0L)))
  }

  test("bootstrap CI: deterministic Poisson weights replay exactly, point estimate exact") {
    import spark.implicits._
    val dir = tempSfDir()
    // 20 docs: P(a replicate draws zero total weight) ~ 0.368^20 — the
    // div-safety guard never fires, so the rank-2/31 band is stable
    val docs = (1L to 20L).map(i => (i, i * 7L))
    writeTable(dir, "documents",
      docs.map { case (i, n) => (i, "t", "en", "s", n) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = graft.ops.Corpus.bootstrapMeanLength(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // full replay of the operator's math in plain Scala
    def u(b: Long, id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"boot:$b:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(hex.substring(0, 15), 16) % 1000000).toLong
    }
    def pois(x: Long): Long =
      if (x < 367879) 0 else if (x < 735759) 1 else if (x < 919699) 2
      else if (x < 981012) 3 else if (x < 996340) 4 else 5
    val means = (1L to 32L).map { b =>
      val ws = docs.map { case (id, n) => (pois(u(b, id)), n) }
      val nEff = ws.map(_._1).sum
      (1000L * ws.map { case (w, n) => w * n }.sum / nEff, b)
    }.sorted
    val point = 1000L * docs.map(_._2).sum / docs.length
    assert(rows === Seq((32L, point, means(1)._1, means(30)._1)))
  }

  test("chi2 drift audit: hand-computed 2x2 contingency contributions and total") {
    import spark.implicits._
    val dir = tempSfDir()
    // counts: en/s0=30, en/s1=10, fr/s0=10, fr/s1=50 -> N=100,
    // r_en=40 r_fr=60 c_s0=40 c_s1=60; e_milli: 16000/24000/24000/36000;
    // contribs: 196e6/(1000*e) -> 12, 8, 8, 5; total 33
    val rows0 =
      (1 to 30).map(i => (i.toLong, "en", "s0")) ++
      (31 to 40).map(i => (i.toLong, "en", "s1")) ++
      (41 to 50).map(i => (i.toLong, "fr", "s0")) ++
      (51 to 100).map(i => (i.toLong, "fr", "s1"))
    writeTable(dir, "documents",
      rows0.map { case (i, l, s) => (i, "t", l, s, 1L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = graft.ops.Corpus.langSourceChi2(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows === Seq(
      ("en", "s0", 30L, 16000L, 12L, 33L),
      ("en", "s1", 10L, 24000L, 8L, 33L),
      ("fr", "s0", 10L, 24000L, 8L, 33L),
      ("fr", "s1", 50L, 36000L, 5L, 33L)))
  }

  test("ngram novelty: anti-joined distinct grams between the parity snapshots") {
    import spark.implicits._
    val dir = tempSfDir()
    // old side (id%10 != 7): docs 3, 10 -> unigrams {a, b}
    // new side (id%10 != 3): docs 7, 10 -> unigrams {a, b, c}; novel {c}
    writeTable(dir, "documents", Seq(
      (3L, "a b", "en", "s", 3L),
      (7L, "b c", "en", "s", 3L),
      (10L, "a b", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = graft.ops.Corpus.ngramNovelty(spark, dir, ns = Seq(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows === Seq((1L, 2L, 3L, 1L, 333333L)))
  }
}
