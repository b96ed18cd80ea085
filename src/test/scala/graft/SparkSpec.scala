package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one local SparkSession for the whole JVM (suites
  * share it via getOrCreate), plus temp-dir fixtures shaped like the
  * harness sfDir (a `<name>.parquet` per table), so ops that read
  * `GraftSession.table` run unchanged against synthetic inputs.
  */
abstract class SparkSpec extends AnyFunSuite {

  // local[4] WITHOUT task retry: a genuinely flaky task in any ordinary
  // suite must fail the test, not be silently re-run and masked. The
  // fault-tolerance suite overrides this with a dedicated local[4, 2]
  // session (maxFailures=2) for the injected-failure path only.
  lazy val spark: SparkSession =
    GraftSession.build("graft-test", "local[4]", shufflePartitions = 4)

  /** A fresh sfDir-shaped temp dir; write tables into it with writeTable. */
  def tempSfDir(): String =
    Files.createTempDirectory("graft-test-sf").toString

  def writeTable(sfDir: String, name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$sfDir/$name.parquet")
}
