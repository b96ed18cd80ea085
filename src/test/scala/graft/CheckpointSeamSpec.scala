package graft

import graft.ops.{Dedup, Graph}

/** The materialization seam contract (VERDICT r10 #3): every iterative
  * family materializes per-round state through graft.Materialize, which
  * is localCheckpoint by default and persist(MEMORY_AND_DISK) +
  * RELIABLE checkpoint under `spark.graft.reliableCheckpoint=true` —
  * the cluster mode where executor loss must recover mid-run. This
  * suite flips the flag and proves the two deepest iterative queries
  * (near-dup cluster resolution: shingle/sketch/band self-joins plus
  * label-propagation rounds; PageRank: checkpointed edge table plus
  * per-round rank iterates) return IDENTICAL rows either way — the
  * seam changes durability, never results.
  */
class CheckpointSeamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def withReliable[A](body: => A): A = {
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try body
    finally spark.conf.set("spark.graft.reliableCheckpoint", "false")
  }

  test("dedup_clusters is result-identical with the reliable-checkpoint seam") {
    val default = Dedup.nearDupClusters(spark, sfDir).collect().toSeq
    val rel = withReliable(Dedup.nearDupClusters(spark, sfDir).collect().toSeq)
    assert(rel === default)
    assert(default.nonEmpty)
  }

  test("graph_pagerank is result-identical with the reliable-checkpoint seam") {
    val default = Graph.pageRank(spark, sfDir).collect().toSeq
    val rel = withReliable(Graph.pageRank(spark, sfDir).collect().toSeq)
    assert(rel === default)
    assert(default.nonEmpty)
  }

  test("reliable mode actually writes checkpoint files") {
    withReliable {
      Graph.pageRank(spark, sfDir).collect()
      val dir = spark.sparkContext.getCheckpointDir
      assert(dir.isDefined, "reliable mode must set a checkpoint dir")
      val fs = new org.apache.hadoop.fs.Path(dir.get)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(new org.apache.hadoop.fs.Path(dir.get)))
    }
  }
}
