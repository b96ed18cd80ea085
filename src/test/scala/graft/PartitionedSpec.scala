package graft

/** Pins the storage-level contract of graft.sources.Partitioned: a scan
  * filtering on the partition column prunes at planning time — the
  * predicate appears under PartitionFilters on the FileScan (never
  * reaching the row reader), and the result equals the same relation
  * over the unpartitioned table.
  */
class PartitionedSpec extends SparkSpec {

  test("partitioned scan prunes on the partition column and matches the plain relation") {
    import spark.implicits._
    val sfDir = tempSfDir()
    writeTable(sfDir, "documents", Seq(
      (1L, "a b", "en", "s1", 3L),
      (2L, "c d", "en", "s1", 3L),
      (3L, "e f", "de", "s2", 3L),
      (4L, "g h", "en", "s3", 3L),
      (5L, "i j", "en", "s3", 3L),
      (6L, "k l", "de", "s3", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = graft.sources.Partitioned.prunedDocCounts(spark, sfDir, Seq("s1", "s3"))
    val rows = got.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(
      ("s1", "en", 2L, 6L), ("s3", "de", 1L, 3L), ("s3", "en", 2L, 6L)))
    val plan = got.queryExecution.executedPlan.toString
    // the source predicate must be a PLANNING-time partition filter,
    // not a row-level pushed filter
    assert(plan.contains("PartitionFilters"), s"no PartitionFilters in plan:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*source".r.findFirstIn(plan).isDefined,
      s"source predicate not under PartitionFilters:\n$plan")
    assert(!"PushedFilters: \\[[^\\]]*source".r.findFirstIn(plan).isDefined,
      s"source predicate leaked into PushedFilters:\n$plan")
  }
}
