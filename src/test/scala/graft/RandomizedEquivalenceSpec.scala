package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, EventWindows}

/** Randomized cross-implementation equivalence — the property-test layer
  * over the round-12 rewrites. Each property pits an optimized
  * implementation against its direct executable-semantics twin on
  * seeded random inputs dense in edge cases (timestamp ties, window
  * boundaries, empty sides, self-contained components), far beyond what
  * hand-built fixtures enumerate. Seeds are FIXED: failures reproduce.
  */
class RandomizedEquivalenceSpec extends SparkSpec {

  test("linear attribution: prefix-sum == pairwise on random event streams " +
      "(ties, boundary hits, touch-free users, zero-value purchases)") {
    import spark.implicits._
    for (seed <- Seq(7, 41, 1003)) {
      val rnd = new Random(seed)
      val look = 50L // seconds — small window so boundaries hit often
      val types = Seq("view", "click", "purchase")
      // coarse timestamp grid => frequent exact ties and exact-boundary
      // (t == p - look, t == p) pairs; users 1..6 => dense per-user streams
      val evs = (1L to 400L).map { id =>
        val t = rnd.nextInt(40) * 25L // 0..975s on a 25s grid
        (id, t * 1000000000L, (rnd.nextInt(6) + 1).toLong,
          types(rnd.nextInt(3)),
          if (rnd.nextInt(10) == 0) 0.0 else rnd.nextInt(500) / 100.0, "p")
      }
      val dir = tempSfDir()
      writeTable(dir, "events",
        evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      val fast = EventWindows.linearAttribution(spark, dir, look).collect().toSeq
      val ref = EventWindows.linearAttributionPairwise(spark, dir, look).collect().toSeq
      assert(fast === ref, s"seed=$seed")
      // value conservation holds on every random stream
      val mass = evs.filter(_._4 == "purchase")
        .map(e => math.floor(e._5 * 1000d).toLong).sum
      assert(fast.map(_.getLong(2)).sum === mass, s"seed=$seed conservation")
    }
  }

  test("incremental cluster fold-in == full rebuild on random pair graphs " +
      "with random batch splits") {
    import spark.implicits._
    for (seed <- Seq(5, 99, 271)) {
      val rnd = new Random(seed)
      val n = 60
      val pairs = (1 to 120).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val df = pairs.toDF("doc_a", "doc_b")
      val mod = rnd.nextInt(4) + 2 // random batch marker density
      val inc = Dedup.incrementalClustersFromPairs(df, _ % mod === 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val full = Dedup.connectedComponents(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(inc === full, s"seed=$seed mod=$mod")
    }
  }

  test("two-star contraction == min-label propagation on random graphs " +
      "(chains, stars, isolated pairs mixed)") {
    import spark.implicits._
    for (seed <- Seq(13, 77)) {
      val rnd = new Random(seed)
      // mix shapes: random edges + a long chain (propagation's worst case)
      val randomEdges = (1 to 80).map { _ =>
        val a = rnd.nextInt(50).toLong; val b = rnd.nextInt(50).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)
      val chain = (100L until 140L).map(i => (i, i + 1))
      val df = (randomEdges ++ chain).distinct.toDF("doc_a", "doc_b")
      val ts = Dedup.connectedComponentsTwoStar(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val lp = Dedup.connectedComponents(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(ts === lp, s"seed=$seed")
    }
  }
}
