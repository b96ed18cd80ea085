package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSON-lines as a SOURCE — the read-side complement of the urlcount
  * family's JSON sink (reference semantic: the reduce output is JSON
  * lines; see `UrlCount.writeJsonSink`). A pipeline that emits JSON
  * must also re-ingest it, and the dangerous part is fidelity: quoting,
  * escapes, unicode, and null round-tripping are where hand-rolled
  * serializers corrupt a corpus silently.
  *
  * src_json_roundtrip writes the documents table as JSON lines, reads
  * it back through `spark.read.schema(...).json` (explicit schema — a
  * production reader NEVER infers: inference is a full extra pass and
  * schema drift becomes silent nulls), and emits a per-source parity
  * profile whose oracle computes the SAME relation from the original
  * parquet: row counts, char mass, and an order-independent bit-XOR
  * checksum over the (doc_id, text) content hash. Equality proves the
  * serializer/parser pair lossless end to end — any mangled escape or
  * dropped row flips the checksum.
  *
  * Scale: the write is one narrow pass (JSON encode is per-row, no
  * shuffle), the read-back scan parallelizes per file split like any
  * text source, and the profile is one bounded-dimension aggregation.
  */
object JsonLines {

  def jsonRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Bucketed.scopedPath(
      Bucketed.scopedName(spark, "graft_jsonl")) + "/documents"
    val docs = graft.GraftSession.table(spark, sfDir, "documents")
    docs.write.mode("overwrite").json(path)
    profile(spark.read.schema(docs.schema).json(path))
  }

  /** The parity profile over any documents-shaped frame. */
  def profile(docs: DataFrame): DataFrame =
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        expr("bit_xor(CAST(" +
          "conv(substring(md5(concat(CAST(doc_id AS STRING), ':', text)), 1, 15), 16, 10)" +
          " AS BIGINT))").as("content_xor"))
      .orderBy("source")
}
