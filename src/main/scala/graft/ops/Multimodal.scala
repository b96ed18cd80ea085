package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession.table

/** Multimodal column handling: images/audio/video as opaque BINARY
  * columns plus typed metadata, with the decode/feature stage isolated
  * behind a narrow per-partition seam.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but everything around it is the
  * real production shape:
  *  - schema: (id, modality, payload BINARY, meta fields);
  *  - batch-at-a-time decode via `mapPartitions` (the Scala analog of
  *    `mapInPandas`: one library/model init per partition, amortized
  *    over the rows — NEVER a per-row UDF that re-inits the codec);
  *  - decoded features come back as columnar-friendly fixed-width
  *    fields, so downstream stays in Tungsten/codegen land;
  *  - payload stays out of every shuffle until after decode, and decode
  *    output drops the payload — at 100 TB the binary bytes cross the
  *    wire zero times.
  */
object Multimodal {

  case class MediaRow(id: Long, modality: String, payload: Array[Byte])
  case class MediaFeatures(id: Long, modality: String, byte_len: Long,
                           width: Int, height: Int, mean_luma: Double)

  /** Synthesize a BINARY media column from the documents table (the
    * harness ships no real media; UTF-8 bytes stand in for an encoded
    * image). Production: spark.read.format("binaryFile") or a payload
    * column in parquet.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")
      .select(col("doc_id").as("id"),
        (when(col("doc_id") % 2 === 0, "image").otherwise("audio")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: a real implementation would hand `payload` to an image
    * codec (e.g. javax.imageio / ffmpeg bindings) here. The fake derives
    * deterministic pseudo-features from the bytes so tests are stable.
    * The seam — signature, batching, schema — is exactly what a real
    * decoder plugs into.
    */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val len = r.payload.length.toLong
    // ??? real codec goes here; deterministic fake below
    val w = (len % 640 + 1).toInt
    val h = (len % 480 + 1).toInt
    val luma = if (len == 0) 0.0
               else r.payload.iterator.map(b => (b & 0xff).toDouble).sum / len
    MediaFeatures(r.id, r.modality, len, w, h, math.floor(luma * 1000) / 1000)
  }

  /** Per-partition decode: init-once-per-partition, stream rows through.
    * This is where a model/codec handle would be created (once per
    * partition, not per row).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // val codec = Codec.open()  <- once per partition in production
      rows.map(decodeStub)
    }
  }

  /** Metadata pass that never touches a decoder: byte length + content
    * hash straight off the BINARY column (pure codegen, oracle-checkable).
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("id"), col("modality"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("sha"))
      .orderBy("id")

  /** Decoded-feature aggregate: per modality, count + mean dimensions.
    * Runs the full mapPartitions decode path.
    */
  def featureSummary(spark: SparkSession, sfDir: String): DataFrame = {
    decodeFeatures(spark, mediaTable(spark, sfDir)).toDF()
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"))
      .orderBy("modality")
  }

  /** Resize planning: aspect-preserving fit of each decoded image into a
    * target box (the standard pre-train normalization step). Runs the
    * real mapPartitions decode seam for source dimensions, then pure
    * integer arithmetic (BIGINT floor division — oracle-exact) for the
    * output dims. The pixel resample itself belongs inside the decode
    * stub's codec; the plan (who, from what dims, to what dims) is the
    * Spark-side contract and is fully real.
    */
  def resizePlan(spark: SparkSession, sfDir: String, target: Int = 224): DataFrame =
    decodeFeatures(spark, mediaTable(spark, sfDir)).toDF()
      .filter(col("modality") === "image")
      .select(col("id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .withColumn("out_w",
        expr(s"CASE WHEN width >= height THEN ${target}L ELSE (width * $target) div height END"))
      .withColumn("out_h",
        expr(s"CASE WHEN width >= height THEN (height * $target) div width ELSE ${target}L END"))
      .orderBy("id")

  /** Frame-sampling shape for video: explode N evenly-spaced frame
    * indices per media row — the fan-out stage before a per-frame decode.
    * Deterministic arithmetic only.
    */
  def sampleFrames(spark: SparkSession, sfDir: String, nFrames: Int = 4): DataFrame =
    mediaTable(spark, sfDir)
      .filter(col("modality") === "image")
      .withColumn("total_frames", octet_length(col("payload")).cast("long"))
      .select(col("id"), col("total_frames"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("k"))
      .withColumn("frame_idx",
        floor(col("k") * col("total_frames") / nFrames).cast("long"))
      .select(col("id"), col("k").cast("long").as("k"), col("frame_idx"))
      .orderBy("id", "k")
}
