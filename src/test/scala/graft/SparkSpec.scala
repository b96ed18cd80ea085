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

  // local[4, 2]: 4 threads, maxFailures=2 — task retry enabled so the
  // fault-tolerance suite can exercise the re-queue-on-failure path the
  // reference tests via worker kills (test_test.go:193-227)
  lazy val spark: SparkSession =
    GraftSession.build("graft-test", "local[4, 2]", shufflePartitions = 4)

  /** A fresh sfDir-shaped temp dir; write tables into it with writeTable. */
  def tempSfDir(): String =
    Files.createTempDirectory("graft-test-sf").toString

  def writeTable(sfDir: String, name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$sfDir/$name.parquet")
}
