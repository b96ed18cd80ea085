package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format coverage beyond parquet: CSV and JSON-lines read paths
  * with explicit schemas round-trip the documents table losslessly, and
  * the reads prune columns (the formats a corpus actually arrives in
  * before it is parqueted; the reference's own interchange format is
  * JSON lines — common_reduce.go:43-54).
  */
class SourcesSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta, with \"quotes\" and, commas", "en", "src0", 37L),
      (2L, "newline-free but unicode: é 中", "fr", "src1", 29L),
      (3L, "", "en", "src2", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("CSV round-trip: quoted text survives, schema explicit, columns prune") {
    val dir = tempSfDir() + "/csv"
    // emptyValue: bare CSV cannot distinguish "" from NULL — an empty
    // doc would silently come back null without the quoted empty marker
    docs.write.option("header", "true").option("emptyValue", "\"\"").csv(dir)
    // and the READER folds empty to null unless nullValue is pointed at
    // a marker that never occurs — both options together make the
    // round-trip lossless
    val back = spark.read.schema(docSchema).option("header", "true")
      .option("nullValue", "\\N").csv(dir)
    assert(back.orderBy("doc_id").collect().map(_.getString(1)).toSeq ===
      docs.orderBy("doc_id").collect().map(_.getString(1)).toSeq)
    // column pruning reaches the scan: a doc_id-only projection reads one column
    val pruned = back.select("doc_id")
    assert(pruned.queryExecution.executedPlan.toString.contains("ReadSchema: struct<doc_id:bigint>"))
  }

  test("JSON-lines round-trip (the reference's interchange format)") {
    val dir = tempSfDir() + "/json"
    docs.write.json(dir)
    val back = spark.read.schema(docSchema).json(dir)
    val a = back.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val b = docs.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // JSON writes omit empty-string? no — but null vs "" must round-trip as written
    assert(a === b)
  }

  test("text source: one row per line, the reference's input format") {
    val dir = tempSfDir() + "/text"
    import spark.implicits._
    Seq("a b c", "d e").toDF("value").coalesce(1).write.text(dir)
    val counts = ops.UrlCount.tokenCounts(
      spark.read.text(dir).withColumnRenamed("value", "text"), "text")
    assert(counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L, "e" -> 1L))
  }

  test("ORC round-trip: lossless incl unicode/empty, predicate pushes to the scan") {
    val dir = tempSfDir() + "/orc"
    docs.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      docs.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    // ORC is the other columnar lake format: both column pruning and
    // predicate pushdown must reach the scan, as with parquet
    val filtered = back.filter(col("doc_id") === 2L).select("doc_id", "lang")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), scan.take(1500))
    assert(scan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,2)]"), scan.take(1500))
    assert(filtered.collect().map(_.getString(1)).toSeq === Seq("fr"))
  }

  test("JSON-lines round-trip: escapes/unicode lossless, parity profile matches") {
    val dir = tempSfDir() + "/jsonl"
    // text includes JSON-hostile content: quotes, backslash, unicode
    import spark.implicits._
    val tricky = docs.union(Seq(
      (4L, "back\\slash and \"nested \\\" quote\" plus tab\tchar", "en", "src0", 46L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    tricky.write.json(dir)
    val back = spark.read.schema(docSchema).json(dir)
    assert(back.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      tricky.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    // the registered query's parity contract: profile(read-back) ==
    // profile(original) — checksum flips on any serializer mangle
    assert(graft.sources.JsonLines.profile(back).collect().toSeq ===
      graft.sources.JsonLines.profile(tricky).collect().toSeq)
  }

  test("CSV multiLine round-trip: quoted embedded newlines survive as ONE record") {
    import spark.implicits._
    val sf = tempSfDir()
    // the corpus-killer case: a text field containing CR/LF — the
    // line-splitting reader would shear this into two broken records
    writeTable(sf, "documents", docs.union(Seq(
      (4L, "line one\nline two\r\nline three", "en", "src0", 29L),
      (5L, "quoted \"middle\" and,\ncomma", "fr", "src1", 26L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")))
    val prof = graft.sources.JsonLines.csvRoundTrip(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val expect = graft.sources.JsonLines.profile(
      spark.read.parquet(s"$sf/documents.parquet")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(prof === expect)
  }
}
