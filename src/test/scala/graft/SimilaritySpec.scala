package graft

import graft.ops.Similarity

/** Similarity search over constructed 64-dim vectors with known geometry:
  * vec 0 and vec 100 identical (cos=1), vec 50 orthogonal to both.
  * IDs are multiples of 50 so the default stride picks them as queries.
  */
class SimilaritySpec extends SparkSpec {

  private def vec(axis: Int): Seq[Float] =
    (0 until 64).map(d => if (d == axis) 1.0f else 0.0f)

  private def mix(a: Int, b: Int, wa: Float, wb: Float): Seq[Float] =
    (0 until 64).map(d =>
      (if (d == a) wa else 0.0f) + (if (d == b) wb else 0.0f))

  private lazy val sfDir: String = {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      (0L, vec(0), 0),
      (50L, vec(1), 1),
      (100L, vec(0), 0),          // duplicate of 0
      (150L, mix(0, 1, 3f, 1f), 0) // mostly axis-0: cos with vec0 = 3/sqrt(10)
    ).toDF("vec_id", "embedding", "label"))
    dir
  }

  test("brute-force top-k: exact neighbors in cosine order with defined ties") {
    val rows = Similarity.bruteForceTopK(spark, sfDir, k = 3, stride = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q0 = rows.filter(_._1 == 0L).map(t => (t._3, t._4)).toSeq
    // for query 0: dup 100 at cos 1000, then 150 at floor(3/sqrt(10)*1000)=948, then 50 at 0
    assert(q0 === Seq((100L, 1000L), (150L, 948L), (50L, 0L)))
  }

  test("LSH near-dup rung: bit-identical copies collapse out; the exact rung owns them") {
    // 0 and 100 are bit-identical: the identical-vector hot-bucket guard
    // (vectorRepresentatives) keeps them out of the pair rung — m copies
    // would otherwise pair quadratically in every band at scale
    val pairs = Similarity.lshNearDupPairs(spark, sfDir, minCosMilli = 990L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs === Seq.empty)
    val dups = Similarity.exactVectorDups(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dups === Seq((0L, 2L), (50L, 1L), (150L, 1L)))
  }

  test("near-dup pairs relate DISTINCT vectors sharing buckets") {
    import spark.implicits._
    val dir = tempSfDir()
    // 9 is 1 SCALED (distinct bits, cosine exactly 1, same hyperplane
    // signs -> same buckets); 5 is a bit-identical copy of 1
    writeTable(dir, "embeddings", Seq(
      (1L, vec(0), 0),
      (5L, vec(0), 0),
      (9L, (0 until 64).map(d => if (d == 0) 2.0f else 0.0f), 0),
      (3L, vec(1), 1)
    ).toDF("vec_id", "embedding", "label"))
    val pairs = Similarity.lshNearDupPairs(spark, dir, minCosMilli = 990L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs === Seq((1L, 9L, 1000L)))
    val dups = Similarity.exactVectorDups(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dups === Seq((1L, 2L), (3L, 1L), (9L, 1L)))
  }

  test("LSH ANN: rep-collapsed form equals the naive full-corpus join on a dup-heavy corpus") {
    import spark.implicits._
    // the harness corpora carry no duplicate vectors, so the gate never
    // exercises lshAnn's copy-expansion paths — this corpus does: four
    // distinct directions with 15, 14, 3 and 1 copies (15 > k+1 = 11
    // forces the per-rep copy-list truncation; interleaved ids force
    // the ascending-id tie-breaks), plus a near-axis vector bridging
    // buckets. Equivalence must be bit-for-bit.
    val dir = tempSfDir()
    val base = Seq(vec(0), vec(1), vec(2), mix(0, 1, 3f, 1f))
    val copiesPer = Seq(15, 14, 3, 1)
    val rows = for {
      (v, g) <- base.zipWithIndex
      c <- 0 until copiesPer(g)
    } yield ((c.toLong * 7L + g.toLong) * 10L + g.toLong, v, g) // interleaved ids
    writeTable(dir, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val k = 10
    val got = Similarity.lshAnn(spark, dir, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = Similarity.lshAnnNaive(spark, dir, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.size === want.size)
    assert(got === want)
    // sanity: every query emits exactly k rows (33 vectors, every bucket
    // holds >= its rep's 14+ same-direction copies)
    assert(got.groupBy(_._1).forall(_._2.size == k))
  }

  test("LSH ANN: duplicate is rank-1 neighbor of its twin") {
    val rows = Similarity.lshAnn(spark, sfDir, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q0r1 = rows.find(r => r._1 == 0L && r._2 == 1L)
    assert(q0r1.exists(r => r._3 == 100L && r._4 == 1000L), s"got: ${rows.toSeq}")
  }

  /** Deterministic pseudo-random noise in [-0.5, 0.5) — fixed by (i, d),
    * so the corpus (and every recall number below) is reproducible. */
  private def prand(i: Int, d: Int): Float = {
    val x = i * 1315423911L + d * 2654435761L + 97531L
    val h = (x ^ (x >>> 13)) * 1099511628211L
    (((h >>> 20) & 0xffff).toFloat / 65536f) - 0.5f
  }

  /** 240 vectors in 6 tight clusters (center = spike on axis cluster*10
    * plus noise); cluster membership i % 6 is DECORRELATED from the
    * strided centroid seeds (ids 0,50,100,150,200), which cover only
    * clusters {0,2,4} — the geometry Lloyd iterations are supposed to
    * fix by moving seeds onto the true cluster means.
    */
  private lazy val clusteredDir: String = {
    import spark.implicits._
    val dir = tempSfDir()
    val rows = (0 until 240).map { i =>
      val c = i % 6
      val v = (0 until 64).map(d => (if (d == c * 10) 4.0f else 0.0f) + prand(i, d))
      (i.toLong, v, c)
    }
    writeTable(dir, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    dir
  }

  test("k-means IVF: Lloyd rounds improve recall@10 over strided seeds") {
    def topSets(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = topSets(Similarity.bruteForceTopK(spark, clusteredDir, k = 10, stride = 50).collect())
    def recall(got: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) => (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
        .sum / truth.size
    val rStrided = recall(topSets(Similarity.ivfAnn(spark, clusteredDir).collect()))
    val rKMeans = recall(topSets(Similarity.ivfAnnKMeans(spark, clusteredDir).collect()))
    assert(rKMeans >= rStrided,
      s"Lloyd rounds regressed recall: kmeans=$rKMeans strided=$rStrided")
    assert(rKMeans >= 0.9, s"kmeans recall@10 too low: $rKMeans (strided: $rStrided)")
  }

  test("dot/cosine algebra: cosMilli is floor(cos * 1000)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 1.0, 2.0))).toDF("a", "b")
    val got = df.select(Similarity.cosMilli(col("a"), col("b"))).as[Long].head()
    assert(got === 888L) // cos = 8/9 = 0.888..
  }

  test("native DotProduct expression: bit-identical to the higher-order fold, null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // irrational components: any re-association of the fold changes the
    // double result, so equality here proves identical fold order
    val df = Seq.tabulate(32) { i =>
      ((0 until 64).map(d => math.sqrt(d + i + 2)), (0 until 64).map(d => 1.0 / (d + i + 1)))
    }.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val mismatches = df.select(Similarity.dot(col("a"), col("b")).as("native"), hof.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(mismatches === 0L)
    val withNull = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]])).toDF("a", "b")
    assert(withNull.select(Similarity.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("int8 quantization report: hand-computed scale and dequant error") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      // micros [500000, -250000, 0]; scale 500000
      // q = [127, -63, 0]; recon = [500000, -248031, 0] -> errs [0, 1969, 0]
      (1L, Seq(0.5f, -0.25f, 0.0f), 0),
      // all-zero vector: scale 0, every error 0 by the guard
      (2L, Seq(0.0f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.quantizeInt8Report(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq((1L, 500000L, 1969L, 1969L), (2L, 0L, 0L, 0L)))
  }

  test("int8 gram: exact upper-triangle products over quantized vectors") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      // q1 = [127, -63, 0] (scale 500000), q2 = [0, 0, 0] (scale-0 guard)
      (1L, Seq(0.5f, -0.25f, 0.0f), 0),
      (2L, Seq(0.0f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.int8Gram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // G = q1 q1^T only (q2 is zero): (0,0)=16129, (0,1)=-8001, (0,2)=0,
    // (1,1)=3969, (1,2)=0, (2,2)=0; n_vecs counts BOTH rows per cell
    assert(rows === Seq(
      (0L, 0L, 2L, 16129L), (0L, 1L, 2L, -8001L), (0L, 2L, 2L, 0L),
      (1L, 1L, 2L, 3969L), (1L, 2L, 2L, 0L), (2L, 2L, 2L, 0L)))
  }

  test("recall gate covers all four serving paths, composed path included") {
    val methods = Similarity.annRecall(spark, clusteredDir).collect()
      .map(_.getString(0)).toSeq
    assert(methods === Seq("ivf", "ivf_pq", "lsh", "pq"))
  }

  test("pca power: milli iterates converge toward the dominant direction") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      (1L, Seq(0.5f, 0.0f), 0),  // q = [127, 0]
      (2L, Seq(0.5f, 0.25f), 0)  // q = [127, 63]
    ).toDF("vec_id", "embedding", "label"))
    // Gram: (0,0)=32258 (0,1)=8001 (1,1)=3969; gm = g div 2 =
    // [[16129, 4000], [4000, 1984]]; v0 = [1000, 1000]
    // it1: Gv = [20129000, 5984000] -> [1000, 297]
    // it2: Gv = [17317000, 4589248] -> [1000, 265]
    // it3: Gv = [17189000, 4525760] -> [1000, 263]  (dim 0 dominates)
    val rows = Similarity.pcaPower(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq(
      (1L, 0L, 1000L), (1L, 1L, 297L),
      (2L, 0L, 1000L), (2L, 1L, 265L),
      (3L, 0L, 1000L), (3L, 1L, 263L)))
    // ABTT on the same fixture: u = [1000, 263], uu = 1069169
    // v1: q=[127,0], dot=127000, qq=16129
    //   ppm = 127000^2*1e6 div (16129*1069169) = 935305
    // v2: q=[127,63], dot=127000+63*263=143569, qq=20098 -> 959228
    val ab = Similarity.abttAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ab === Seq((1L, 127000L, 935305L), (2L, 143569L, 959228L)))
  }

  test("semantic decontamination: best eval match with id tie-break, flag at threshold") {
    import spark.implicits._
    val dir = tempSfDir()
    // evalMod 2 -> eval = even ids {0, 2}; train = odd ids {1, 3}
    writeTable(dir, "embeddings", Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (2L, Seq(0f, 1f, 0f, 0f), 0),
      (1L, Seq(1f, 0f, 0f, 0f), 0), // identical to eval 0: cos 1000, leaked
      (3L, Seq(0f, 0f, 1f, 0f), 0)  // orthogonal to both: cos-0 tie -> eval 0
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.semanticDecontaminate(spark, dir, evalMod = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq((1L, 0L, 1000L, 1L), (3L, 0L, 0L, 0L)))
    // the streaming twin's unrolled-argmax frame produces the identical
    // relation over the same rows (shared tie-break)
    import org.apache.spark.sql.functions.col
    val eval = Similarity.evalVectors(spark, dir, evalMod = 2)
    val unrolled = Similarity.semanticDeconFrame(
        spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") % 2 =!= 0), eval, 400L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(unrolled === rows)
  }

  test("semdedup: drops within-cell near-copies toward the smallest id; copies collapse first") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      (0L, vec(0), 0),                                            // centroid, cell 0
      (50L, vec(1), 1),                                           // centroid, cell 50
      (7L, (0 until 64).map(d => if (d == 0) 2.0f else 0.0f), 0), // axis0 scaled: cos(., 0)=1000
      (11L, (0 until 64).map(d => if (d == 0) 2.0f else 0.0f), 0), // bit-identical copy of 7
      (9L, mix(0, 1, 3f, 1f), 0),                                 // cell 0, cos with axis0 = 948
      (3L, (0 until 64).map(d => if (d == 1) 5.0f else 0.0f), 1)  // axis1 scaled: cell 50
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.semDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // 11 never appears (identical-vector copy collapses to rep 7 before
    // pairing); 7 and 9 prune toward vec 0 inside cell 0; the CENTROID
    // vec 50 itself prunes toward the smaller-id near-copy 3 in its cell
    assert(rows === Seq(
      (7L, 0L, 0L, 1000L),
      (9L, 0L, 0L, 948L),
      (50L, 50L, 3L, 1000L)))
  }

  test("dim stats: integral mean/variance/extremes per dimension, hand-computed") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      (1L, Seq(0.5f, -0.5f), 0),
      (2L, Seq(1.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.dimStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // dim 0: micros (500000, 1000000) -> mean 750000, var 62.5e9
    // dim 1: micros (-500000, 0) -> floor mean -250000, var 62.5e9
    assert(rows === Seq(
      (0L, 2L, 750000L, 62500000000L, 500000L, 1000000L),
      (1L, 2L, -250000L, 62500000000L, -500000L, 0L)))
  }

  test("ivf balance: per-cell counts, shares, and the 2x fair-share hot flag") {
    import spark.implicits._
    val dir = tempSfDir()
    // cells: 0 holds {0, 7, 9, 13} (4 vecs), 50 holds {50, 3} (2):
    // fair share = 3, hot threshold = 6 -> neither hot; shares 666/333
    writeTable(dir, "embeddings", Seq(
      (0L, vec(0), 0),
      (50L, vec(1), 1),
      (7L, (0 until 64).map(d => if (d == 0) 2.0f else 0.0f), 0),
      (9L, mix(0, 1, 3f, 1f), 0),
      (13L, mix(0, 2, 1f, 3f), 0),
      (3L, (0 until 64).map(d => if (d == 1) 5.0f else 0.0f), 1)
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.ivfBalance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(rows === Seq((0L, 4L, 666L, false), (50L, 2L, 333L, false)))
  }

  test("epsilon sweep: per-threshold pair/drop counts from one pairing pass") {
    import spark.implicits._
    val dir = tempSfDir()
    // semdedup's fixture plus vec 13 (axis0+3*axis2: cell 0, cos 316 to
    // axis0 members, 300 to vec 9) so the curve actually steps at 400
    writeTable(dir, "embeddings", Seq(
      (0L, vec(0), 0),
      (50L, vec(1), 1),
      (7L, (0 until 64).map(d => if (d == 0) 2.0f else 0.0f), 0),
      (11L, (0 until 64).map(d => if (d == 0) 2.0f else 0.0f), 0), // copy: collapses
      (9L, mix(0, 1, 3f, 1f), 0),
      (13L, mix(0, 2, 1f, 3f), 0),
      (3L, (0 until 64).map(d => if (d == 1) 5.0f else 0.0f), 1)
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.epsilonSweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // reps {0,7,9,13} in cell 0, {3,50} in cell 50: pair cosines
    // [1000,948,948,316,316,299,1000] (9.13 dot floors to 299 through
    // the double norm product); per-victim maxima 7->1000, 9->948,
    // 13->316, 50->1000; n_reps = 6
    assert(rows === (0L to 900L by 100L).map { t =>
      if (t <= 200L) (t, 7L, 4L, 6L, 666L)
      else if (t == 300L) (t, 6L, 4L, 6L, 666L)
      else (t, 4L, 3L, 6L, 500L)
    })
  }

  test("pq audit: sign codebook means and reconstruction error, hand-computed") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      (1L, (0 until 64).map(_ => 0.5f), 0),   // all micros 500000, code 255 every sub
      (2L, (0 until 64).map(_ => -0.5f), 0),  // all micros -500000, code 0 every sub
      (3L, vec(0), 0)                         // d0 = 1e6, rest 0 -> code 255 every sub
    ).toDF("vec_id", "embedding", "label"))
    // code-255 group = {1, 3}: mean 750000 at d0 (err 250000 each side),
    // 250000 elsewhere (err 250000 each side); vec 2 alone in code 0 ->
    // zero error. Every sub: sum = 2 vecs * 8 dims * 250000 = 4,000,000.
    val rows = Similarity.pqAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(rows === (0L to 7L).map(s => (s, 2L, 3L, 4000000L, 250000L)))
  }

  test("norm audit: zero vectors counted, norms exact to the micro") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      (1L, (0 until 64).map(_ => 0.0f), 0),                        // zero vector
      (2L, (0 until 64).map(d => if (d == 0) 0.5f else 0.0f), 0),  // norm 0.5
      (3L, vec(0), 1)                                              // norm 1.0
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.normAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows === Seq(
      (0L, 2L, 1L, 0L, 500000L, 500000L),
      (1L, 1L, 0L, 1000000L, 1000000L, 1000000L)))
  }

  test("pq ADC serving: scores are exact LUT sums over the reconstructed vectors") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      (0L, (0 until 64).map(_ => 0.5f), 0),   // query (0 % 50 == 0), code 255
      (1L, (0 until 64).map(_ => -0.5f), 0),  // code 0, alone -> recon exact
      (2L, vec(0), 0)                         // code 255, shares codebook with 0
    ).toDF("vec_id", "embedding", "label"))
    // codebook code-255 means: 750000 at d0, 250000 elsewhere; code-0: -500000.
    // LUT for q=0 (qm=500000 everywhere):
    //   (sub0, 255) = .5e6*.75e6 + 7*.5e6*.25e6 = 1.25e12; other subs = 1e12
    //   (sub*, 0)   = 8 * .5e6*(-.5e6) = -2e12
    // vec 2 scores 1.25e12 + 7e12 = 8.25e12; vec 1 scores -1.6e13
    val rows = Similarity.pqAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(
      (0L, 1L, 2L, 8250000000000L),
      (0L, 2L, 1L, -16000000000000L)))
  }

  test("triplet mining: hardest positive pulls, hardest negative pushes, exact margins") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      (0L, vec(0), 0),                 // anchor (0 % 50 == 0), label 0
      (1L, vec(0), 0),                 // same-label exact dup: cos 1000
      (2L, vec(1), 0),                 // same-label orthogonal: cos 0 -> hardest positive
      (3L, mix(0, 1, 3f, 1f), 1),      // other label, cos 948 -> hardest negative
      (4L, vec(2), 1)                  // other label, cos 0
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.tripletMining(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // cos(anchor, id3) = 3/sqrt(10) -> floor(948.68) = 948
    assert(rows === Seq((0L, 2L, 0L, 3L, 948L, -948L)))
  }

  test("JL projection audit: exact integer distances, identical pair -> NULL ratio") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      (0L, vec(0), 0), (1L, vec(1), 0),   // orthogonal unit pair
      (50L, vec(2), 1), (51L, vec(2), 1), // identical pair: d2 = 0
      (100L, vec(3), 0)                   // anchor with no +1 partner: dropped
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.jlProjectionAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    // recompute the Rademacher signs the operator derives (md5 parity,
    // the h60 family) and the expected projected distance for the
    // orthogonal pair: q = 127*e_axis, so dp2 = 127^2 * sum_j (s_j0 - s_j1)^2
    def sign(j: Int, i: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl:$j:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1L else -1L
    }
    val dp2 = (0 until 16).map { j =>
      val d = sign(j, 0) - sign(j, 1); 127L * 127L * d * d
    }.sum
    val d2 = 2L * 127L * 127L
    assert(rows === Seq(
      (0L, 1L, d2, dp2, Some((1000L * dp2) / (16L * d2))),
      (50L, 51L, 0L, 0L, None)))
  }

  test("multiprobe LSH: pointwise recall dominance over single-probe") {
    // multiprobe's candidate set is a superset of the exact-signature
    // probe's ON THE SAME representative corpus (maxFlips = 0 degrades
    // to exactly that baseline), so after the k-cut its ranked list
    // must dominate POINTWISE: at every (query, rank) the multiprobe
    // cosine is >= the single-probe cosine (plain set-subset is the
    // wrong invariant — better candidates legitimately evict weaker
    // ones from the top-k). On sf0.001 the hamming-1 probes must also
    // fill ranks single-probe starved (strictly more rows).
    val dir = "/root/testdata/sf0.001"
    val single = Similarity.lshMultiprobe(spark, dir, maxFlips = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val multi = Similarity.lshMultiprobe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val regressions = single.filter { case (key, cs) =>
      !multi.get(key).exists(_ >= cs) }
    assert(regressions.isEmpty,
      s"multiprobe scored worse at: ${regressions.take(5)}")
    assert(multi.size > single.size,
      s"multiprobe filled no extra ranks (${multi.size} vs ${single.size})")
  }

  test("knn graph: ranked cell-local neighbors, duplicates collapsed first") {
    import spark.implicits._
    // dedicated fixture: only id 0 is a centroid (ids 1-3 are not % 50),
    // so all representatives share one cell and the cell-local graph is
    // the exact complete ranked graph. id 1 is bit-identical to 0 and
    // must collapse out before pairing.
    val dir = tempSfDir()
    writeTable(dir, "embeddings", Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(1f, 0f, 0f, 0f), 0),  // duplicate of 0
      (2L, Seq(3f, 1f, 0f, 0f), 0),  // cos w/ 0 = 3/sqrt(10) -> 948
      (3L, Seq(0f, 1f, 0f, 0f), 1)   // cos w/ 0 = 0; w/ 2 = 316
    ).toDF("vec_id", "embedding", "label"))
    val rows = Similarity.knnGraph(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(
      (0L, 1L, 2L, 948L), (0L, 2L, 3L, 0L),
      (2L, 1L, 0L, 948L), (2L, 2L, 3L, 316L),
      (3L, 1L, 2L, 316L), (3L, 2L, 0L, 0L)))
  }

  test("ANN result store: distinct parameters never serve each other's frames") {
    // the run-lifetime result store keys on the FULL parameter tuple; a
    // key collision would silently serve k=3's cached top-k to a k=2
    // caller (same corpus, same method) — assert the frames differ and
    // the repeat call is row-identical to its first build
    val k3 = Similarity.bruteForceTopK(spark, sfDir, k = 3, stride = 50)
      .collect().map(_.toSeq).toSeq
    val k2 = Similarity.bruteForceTopK(spark, sfDir, k = 2, stride = 50)
      .collect().map(_.toSeq).toSeq
    assert(k3.size > k2.size, "k=2 must not be served the stored k=3 frame")
    assert(k2 === k3.filter(r => r(1).asInstanceOf[Long] <= 2L),
      "k=2 is exactly the k=3 frame cut at rank 2")
    val k3Again = Similarity.bruteForceTopK(spark, sfDir, k = 3, stride = 50)
      .collect().map(_.toSeq).toSeq
    assert(k3Again === k3, "repeat call serves the identical stored frame")
  }
}
