package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamingOps

/** Pins the Update-mode sink's idempotence under micro-batch REPLAY
  * (VERDICT r14 "What's wrong" #1): `foreachBatch` is at-least-once — a
  * failure between a batch's sink write and its offset-log commit
  * re-runs that batch on restart — so the sink must land each batch in
  * its own batch-stamped directory with overwrite semantics, making the
  * replay replace rather than duplicate. The spec simulates exactly that
  * failure window: run a two-batch AvailableNow query to completion,
  * DELETE the last commit-log entry (the state an interrupted run leaves
  * behind: offsets written, commit missing), restart the same query on
  * the same checkpoint, and prove the read-back row multiset unchanged.
  */
class UpdateSinkReplaySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def sorted(df: DataFrame): Seq[(Long, String)] = {
    import spark.implicits._
    df.as[(Long, String)].collect().toSeq.sorted
  }

  test("update-mode foreachBatch sink: replayed batch replaces itself, never double-appends") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-replay-in").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
      .write.parquet(s"$in/f0.parquet")
    Seq((4L, "d"), (5L, "e"), (6L, "f")).toDF("doc_id", "text")
      .write.parquet(s"$in/f1.parquet")
    val sink = Files.createTempDirectory("graft-replay-sink").toString

    def stream(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force >= 2 micro-batches
      .parquet(s"$in/*.parquet")
      .select(col("doc_id"), upper(col("text")).as("text"))
    def readBack(): DataFrame = spark.read.schema(schema)
      .option("recursiveFileLookup", "true").parquet(s"$sink/out")

    StreamingOps.updateSinkWriter(stream(), sink).start().awaitTermination()
    val first = sorted(readBack())
    assert(first === Seq((1L, "A"), (2L, "B"), (3L, "C"),
      (4L, "D"), (5L, "E"), (6L, "F")))
    val batchDirs = new java.io.File(s"$sink/out").listFiles
      .filter(_.getName.startsWith("batch-")).map(_.getName).toSet
    assert(batchDirs.size >= 2, s"expected >=2 batch dirs, got $batchDirs")

    // simulate the at-least-once failure window: the last batch's sink
    // write committed but its offset-log commit did not
    val commits = new java.io.File(s"$sink/ckpt/commits").listFiles
      .filter(_.getName.forall(_.isDigit))
    val last = commits.maxBy(_.getName.toLong)
    assert(last.delete(), s"could not delete commit ${last.getName}")
    // the local FS keeps a checksum shadow per entry; leaving it stale
    // would make the re-commit's rename fail as a spurious concurrent-
    // modification, which is not the failure mode under test
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()

    // restart on the same checkpoint: Structured Streaming re-runs the
    // uncommitted batch through foreachBatch with the SAME batch id
    StreamingOps.updateSinkWriter(stream(), sink).start().awaitTermination()
    assert(sorted(readBack()) === first,
      "replayed batch must overwrite its own directory, not append")
    val after = new java.io.File(s"$sink/out").listFiles
      .filter(_.getName.startsWith("batch-")).map(_.getName).toSet
    assert(after === batchDirs, "replay must not create new batch dirs")
  }
}
