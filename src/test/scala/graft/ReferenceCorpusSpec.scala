package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.ops.UrlCount

/** End-to-end run over the reference's OWN shipped corpus
  * (/root/reference/src/main/data0.txt..data7.txt — 8 files x 10,000
  * space-separated URLs), asserting the engine's top-100 equals an
  * independently computed answer — the parity check the reference's
  * `main.sh:3` pipeline (`sort -n -k2 | tail -100`) never pins down
  * because its tie-break at rank 100 is arbitrary; ours is defined
  * (count desc, url asc).
  */
class ReferenceCorpusSpec extends SparkSpec {

  private val refDir = Paths.get("/root/reference/src/main")

  private def dataFiles: Seq[String] =
    (0 until 8).map(i => refDir.resolve(s"data$i.txt"))
      .filter(Files.exists(_)).map(_.toString)

  test("reference corpus: top-100 URL counts match an independent count") {
    assume(dataFiles.size == 8, "reference corpus present")
    // independent oracle: plain-JVM read + tokenize + count
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    dataFiles.foreach { f =>
      Files.readAllLines(Paths.get(f)).asScala.foreach { line =>
        line.split(" ", -1).iterator.filter(_.nonEmpty).foreach { tok =>
          counts(tok) = counts.getOrElse(tok, 0L) + 1L
        }
      }
    }
    val expectedTop = counts.toSeq
      .sortBy { case (url, c) => (-c, url) }
      .take(100)

    val got = UrlCount.topKFromTextFiles(spark, dataFiles, 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    assert(got === expectedTop)
    // sanity from the reference's own docs (README.md:52): 80k tokens,
    // 17,401 distinct, max frequency 16
    assert(counts.values.sum === 80000L)
    assert(counts.size === 17401)
    assert(got.head._2 === counts.values.max)
  }

  test("reference corpus: distinct-keys job matches (test_test.go reduce)") {
    assume(dataFiles.size == 8, "reference corpus present")
    val expectedDistinct = dataFiles
      .flatMap(f => Files.readAllLines(Paths.get(f)).asScala)
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .distinct.sorted
    val got = UrlCount.distinctTokens(
      spark.read.text(dataFiles: _*).withColumnRenamed("value", "text"), "text")
      .collect().map(_.getString(0)).toSeq
    assert(got === expectedDistinct)
  }
}
