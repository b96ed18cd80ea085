package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Pins the large-star/small-star connected-components contraction
  * (Dedup.connectedComponentsTwoStar) against the min-label propagation
  * form on adversarial topologies, and measures the claim that makes it
  * the at-scale choice: round count logarithmic in component size on a
  * high-DIAMETER graph, where propagation pays one round per hop.
  */
class TwoStarSpec extends SparkSpec {

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph: component min labels in logarithmically few rounds") {
    import spark.implicits._
    // chain 1-2-...-64: diameter 63, so min-label propagation needs 63
    // rounds; the star contraction must stay in single digits
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      .localCheckpoint()
    val (out, rounds) = Dedup.twoStarWithRounds(pairs)
    val lab = labelsOf(out)
    assert(lab.size === 64)
    assert(lab.values.toSet === Set(1L), s"non-min labels: ${lab.filter(_._2 != 1L)}")
    assert(rounds <= 8, s"chain-64 took $rounds rounds; the O(log n) claim is broken")
  }

  test("matches min-label propagation on a mixed multi-component graph") {
    import spark.implicits._
    // two chains, a star, a triangle with a cross edge, a self-loop
    // singleton, and duplicate/reversed input pairs
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),            // chain A
      (10L, 11L), (11L, 12L),                  // chain B
      (20L, 21L), (20L, 22L), (20L, 23L),      // star centered at 20
      (30L, 31L), (31L, 32L), (30L, 32L), (32L, 33L), // triangle + tail
      (40L, 40L),                              // self-loop singleton
      (2L, 1L), (1L, 2L)                       // reversed + duplicate
    ).toDF("doc_a", "doc_b").localCheckpoint()
    val twoStar = labelsOf(Dedup.connectedComponentsTwoStar(edges))
    val prop = labelsOf(Dedup.connectedComponents(edges).orderBy("doc_id"))
    assert(twoStar === prop)
    assert(twoStar(4L) === 1L && twoStar(12L) === 10L &&
      twoStar(23L) === 20L && twoStar(33L) === 30L && twoStar(40L) === 40L)
  }

  test("converged star set is stable: re-running on star edges is round 1") {
    import spark.implicits._
    // feeding an already-contracted star back in must converge in one
    // verification round and change nothing
    val star = Seq((1L, 5L), (1L, 6L), (1L, 7L)).toDF("doc_a", "doc_b")
      .localCheckpoint()
    val (out, rounds) = Dedup.twoStarWithRounds(star)
    assert(rounds === 1)
    assert(labelsOf(out) === Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("never mutates the session shuffle width (ConcurrencySpec contract)") {
    import spark.implicits._
    val pairs = (1L until 32L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      .localCheckpoint()
    Dedup.connectedComponentsTwoStar(pairs)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
  }
}
