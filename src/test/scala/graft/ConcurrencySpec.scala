package graft

import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import scala.concurrent.{Await, Future}

import graft.ops.{Dedup, Graph}
import org.apache.spark.sql.functions._

/** Multi-tenant invariant (VERDICT r6 #1): the iterative loops
  * (connected components, PageRank) size their per-round shuffles via
  * explicit repartition of the edge relation — NOT by mutating the
  * session-global spark.sql.shuffle.partitions — so a query running
  * concurrently on the same SparkSession keeps the session's batch
  * width. The spec samples the session conf from a second thread for
  * the whole duration of each loop: under the old conf-set pattern the
  * samples flip to the loop's tiny edge-sized width mid-run.
  */
class ConcurrencySpec extends SparkSpec {

  private def sampleWhile[A](work: => A): (A, Set[String], Int) = {
    val fut = Future(work)
    val deadline = System.nanoTime() + 2.minutes.toNanos
    var widths = Set.empty[String]
    var samples = 0
    // bounded poll: a future whose worker died on a fatal error never
    // completes, so the deadline (not isCompleted) ends the loop
    while (!fut.isCompleted && System.nanoTime() < deadline) {
      widths += spark.conf.get("spark.sql.shuffle.partitions")
      samples += 1
      Thread.sleep(10)
    }
    (Await.result(fut, 5.seconds), widths, samples)
  }

  test("connectedComponents never mutates the session shuffle width") {
    import spark.implicits._
    // chain 1-2-...-12: min-label propagation walks one hop per round
    // (11 rounds), keeping the loop busy for several seconds of samples
    // — also a high-diameter regression pin for the one-label-reference
    // round shape (the old two-reference round rendered a 2^rounds plan
    // string per action and OOM'd the driver past ~25 rounds)
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      .localCheckpoint()
    val (labels, widths, samples) = sampleWhile(Dedup.connectedComponents(pairs))
    assert(labels.select("cluster_id").distinct().count() === 1L)
    assert(samples > 0, "loop finished before any sample; grow the graph")
    assert(widths === Set("4"), s"session width mutated mid-loop: $widths")
  }

  test("pageRankFromPairs never mutates the session shuffle width") {
    import spark.implicits._
    // bipartite toy graph, enough iterations to cross a persist boundary
    val pairs = (1L to 60L).map(i => (i % 12, 100L + i % 7)).distinct
      .toDF("c", "s").localCheckpoint()
    val (ranks, widths, samples) = sampleWhile(Graph.pageRankFromPairs(pairs, 12))
    assert(ranks.count() > 0)
    assert(samples > 0, "loop finished before any sample; grow the graph")
    assert(widths === Set("4"), s"session width mutated mid-loop: $widths")
  }

  test("streaming twins never mutate the session shuffle width (scoped clone)") {
    import spark.implicits._
    // the streaming harness used to set/restore the session conf around
    // each query; it now builds every stream on a CLONED session, so the
    // shared session's width must stay fixed for the whole run
    val sfDir = tempSfDir()
    writeTable(sfDir, "documents", (1L to 200L).map(i =>
      (i, s"tok$i a b", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val (out, widths, samples) = sampleWhile(
      graft.streaming.StreamingOps.streamExactDedup(spark, sfDir).collect())
    assert(out.length === 200)
    assert(samples > 0, "stream finished before any sample; grow the corpus")
    assert(widths === Set("4"), s"session width mutated during stream: $widths")
    // and the stateful plan itself ran at the scoped 8-partition width,
    // not the session's: the state store count is frozen at query start
    // (behavioral pin: results identical either way — StreamingSpec —
    // so the isolation is what this asserts)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
  }
}
