package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftSession.table
import graft.functions.OracleHash

/** Similarity search over the `embeddings` table (ARRAY<FLOAT>, 64-dim).
  *
  * Two rungs:
  *  - brute-force cosine top-k: exact, O(|Q| x |N|) — correct baseline and
  *    perfectly fine when |Q| is small (the re-rank stage of any ANN);
  *  - LSH-bucketed ANN: random-hyperplane signatures shrink the candidate
  *    set to same-bucket vectors, the scale path when |Q| ~ |N|.
  *
  * Dot products use higher-order functions (`zip_with` + `aggregate`) —
  * codegen'd, no UDF, no driver collect. Vectors are cast to DOUBLE
  * before any arithmetic: deterministic left-fold, same order the oracle
  * (DuckDB `list_reduce`) uses, so results hash-match exactly.
  *
  * Scale notes (100 TB of vectors): the brute-force form broadcasts the
  * query set (small side) against a partitioned corpus — linear scan,
  * embarrassing parallel, no shuffle of the corpus. The LSH form is one
  * shuffle on (band, signature). A production IVF would add a k-means
  * coarse quantizer; the plumbing (bucket column + co-partitioned join)
  * is identical to lshAnn below.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays (oracle twin:
    * list_dot_product / list_reduce(list_transform(...))).
    *
    * Backed by the native codegen'd expression graft.functions.DotProduct
    * — Spark's higher-order `aggregate(zip_with(...))` formulation is
    * CodegenFallback (interpreted per-element lambda dispatch) and was
    * the hot path of the similarity suite. Identical fold order, so
    * results are bit-identical to the previous formulation.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(graft.functions.DotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
  }

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in exact thousandths (BIGINT) — integer surface,
    * no float-hash drift; the underlying double math is order-fixed.
    */
  def cosMilli(a: Column, b: Column): Column =
    floor(dot(a, b) / (norm2(a) * norm2(b)) * 1000).cast("long")

  private def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))

  /** Brute-force cosine top-k: every `stride`-th vector queries the whole
    * corpus. Query side is tiny -> broadcast; corpus is scanned once.
    */
  def bruteForceTopK(spark: SparkSession, sfDir: String,
                     k: Int = 10, stride: Int = 50): DataFrame = {
    val emb = embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosMilli(col("qv"), col("v")).as("cos_milli"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_milli").desc, col("n_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("n_id"), col("cos_milli"))
      .orderBy("q_id", "rk")
  }

  /** All-pairs cosine over a strided sample (exact verification stage for
    * embedding near-dup). Pair space is (n/stride choose 2) — keep the
    * stride such that the sample fits the budget; full-corpus near-dup
    * goes through lshAnn buckets instead.
    */
  def allPairsCosine(spark: SparkSession, sfDir: String, stride: Int = 1): DataFrame = {
    val emb = embeddings(spark, sfDir).filter(col("vec_id") % stride === 0)
    val a = emb.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosMilli(col("va"), col("vb")).as("cos_milli"))
  }

  /** LSH-bucketed candidate PAIRS (for embedding near-dup): vectors
    * sharing any (band, signature) bucket are paired once, verified with
    * exact cosine. The corpus-wide cross join never exists — pair space
    * is bounded by bucket sizes, and near-identical vectors (the near-dup
    * target, cos >= ~0.99) almost surely agree on all sign bits of some
    * band. Same shuffle shape as lshAnn: one exchange on (band, sig).
    */
  def lshNearDupPairs(spark: SparkSession, sfDir: String,
                      minCosMilli: Long = 990,
                      nBits: Int = 8, nBands: Int = 4, dim: Int = 64): DataFrame = {
    val bucketed = lshBuckets(spark, sfDir, nBits, nBands, dim)
    val a = bucketed.select(col("band"), col("sig"), col("vec_id").as("vec_a"), col("v").as("va"))
    val b = bucketed.select(col("band"), col("sig"), col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, Seq("band", "sig")).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("va"), col("vb"))
      .dropDuplicates("vec_a", "vec_b") // multi-band collisions pair once
      .select(col("vec_a"), col("vec_b"), cosMilli(col("va"), col("vb")).as("cos_milli"))
      .filter(col("cos_milli") >= minCosMilli)
      .orderBy("vec_a", "vec_b")
  }

  /** Deterministic random-hyperplane component: h60("band:bit:d") scaled
    * to [-1, 1). Derivable by the oracle (md5-based, see OracleHash).
    */
  private[ops] def planeComponent(band: Int, bit: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$band:$bit:$d".getBytes("UTF-8"))
    val h60 = java.lang.Long.parseLong(
      md.take(8).map("%02x".format(_)).mkString.substring(0, 15), 16)
    h60.toDouble / math.pow(2, 59) - 1.0 // [-1, 1)
  }

  /** (vec_id, v, band, sig) — each vector exploded to its nBands sign
    * signatures. Shared by lshAnn (query top-k) and lshNearDupPairs.
    *
    * Materialized via localCheckpoint: every caller self-joins this frame,
    * and the signature expressions embed nBands*nBits*dim (=2048) plane
    * literals — re-optimizing and re-executing that tree once per join
    * side dominated the runtime (measured 148s -> ~3s at sf0.1 for the
    * near-dup query). Checkpointing computes the buckets once and hands
    * the joins a flat, literal-free relation.
    */
  private[ops] def lshBuckets(spark: SparkSession, sfDir: String,
                              nBits: Int, nBands: Int, dim: Int): DataFrame = {
    val emb = embeddings(spark, sfDir)
    val sigCols = (0 until nBands).map { band =>
      val bits = (0 until nBits).map { bit =>
        val plane = array((0 until dim).map(d => lit(planeComponent(band, bit, d))): _*)
        when(dot(plane, col("v")) > 0, 1L << bit).otherwise(0L)
      }
      bits.reduce(_ + _).as(s"sig_$band")
    }
    emb.select(col("vec_id") +: col("v") +: sigCols: _*)
      .select(col("vec_id"), col("v"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"), col(s"sig_$b").as("sig"))): _*)).as("bk"))
      .select(col("vec_id"), col("v"), col("bk.band").as("band"), col("bk.sig").as("sig"))
      .localCheckpoint()
  }

  /** IVF-style ANN: a coarse quantizer partitions the corpus into cells,
    * each query probes its `nprobe` nearest cells, exact cosine re-ranks
    * inside the probed cells. The classic inverted-file trade: recall is
    * bounded by the probed fraction, and the per-query candidate set
    * shrinks by ~|cells|/nprobe versus a full scan.
    *
    * The quantizer here is deterministic (centroids = every
    * `centroidMod`-th vector, no Lloyd iterations) so the oracle can
    * replay it; a production build would run a few k-means rounds and
    * broadcast the learned centroids — the plan shape (tiny broadcast
    * cross-score -> argmax cell -> co-grouped probe join) is identical.
    *
    * Scale notes: assignment is one broadcast pass over the corpus (no
    * shuffle of the vectors); the probe join shuffles on the cell id —
    * the IVF posting-list access pattern.
    */
  def ivfAnn(spark: SparkSession, sfDir: String,
             centroidMod: Int = 50, nprobe: Int = 2, k: Int = 10): DataFrame = {
    val emb = embeddings(spark, sfDir)
    val cent = emb.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    // score every vector against every centroid (broadcast: |cells| is
    // tiny); integer cosine + id tie-break keeps everything total
    val scored = emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("v"), col("c_id"),
        cosMilli(col("v"), col("cv")).as("cs"))
      .localCheckpoint()
    // cell assignment: argmax cosine, ties to the smallest centroid id
    val assigned = scored
      .groupBy("vec_id")
      .agg(max(struct(col("cs"), (-col("c_id")).as("neg_c"))).as("best"))
      .select(col("vec_id"), (-col("best.neg_c")).as("cell"))
      .join(emb, Seq("vec_id"))
      .localCheckpoint()
    // each strided query probes its nprobe best cells
    val w = Window.partitionBy("vec_id").orderBy(col("cs").desc, col("c_id").asc)
    val probes = scored.filter(col("vec_id") % centroidMod === 0)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= nprobe)
      .select(col("vec_id").as("q_id"), col("c_id").as("cell"))
    val queries = emb.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val cand = probes.join(queries, Seq("q_id"))
      .join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosMilli(col("qv"), col("v")).as("cos_milli"))
      .distinct()
    val wr = Window.partitionBy("q_id").orderBy(col("cos_milli").desc, col("n_id").asc)
    cand.withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("n_id"), col("cos_milli"))
      .orderBy("q_id", "rk")
  }

  /** Random-hyperplane LSH ANN: `nBits`-bit sign signature per band,
    * candidates = same (band, signature) bucket, exact cosine re-rank
    * within bucket, top-k per query.
    *
    * Hyperplanes are pseudo-random but deterministic: component d of
    * plane (band,bit) = h60("band:bit:d") scaled to [-1,1). Deterministic
    * => reproducible across runs AND expressible to the oracle.
    */
  def lshAnn(spark: SparkSession, sfDir: String,
             nBits: Int = 8, nBands: Int = 4, k: Int = 10, dim: Int = 64): DataFrame = {
    val bucketed = lshBuckets(spark, sfDir, nBits, nBands, dim)
    val q = bucketed
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("band"), col("sig"))
    val cand = bucketed.join(q,
        Seq("band", "sig")).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosMilli(col("qv"), col("v")).as("cos_milli"))
      .distinct() // a pair can collide in several bands; score is deterministic
    val w = Window.partitionBy("q_id").orderBy(col("cos_milli").desc, col("n_id").asc)
    cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("n_id"), col("cos_milli"))
      .orderBy("q_id", "rk")
  }
}
