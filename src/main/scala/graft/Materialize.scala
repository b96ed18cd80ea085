package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The ONE materialization seam for iterative/self-join intermediates
  * (shingle frames, minhash signatures, per-round label/rank tables).
  *
  * Why materialize at all: without it Catalyst re-derives the full
  * upstream pipeline for EACH side of every self-join and each loop
  * round's lineage grows unboundedly — the dedup suite measured
  * 468 s -> ~20 s at sf0.1 from flattening these points (see Dedup's
  * module doc).
  *
  * Two modes behind one call:
  *
  *  - DEFAULT (`spark.graft.reliableCheckpoint` unset/false):
  *    `localCheckpoint` — blocks live in executor storage, freed by the
  *    ContextCleaner when the plan is garbage-collected. Right for
  *    single-JVM local mode and for clusters where executor loss may
  *    simply rerun the query.
  *  - RELIABLE (`spark.graft.reliableCheckpoint=true`): persist to
  *    MEMORY_AND_DISK, then a RELIABLE checkpoint to
  *    `spark.graft.checkpointDir` (default: a per-application directory
  *    under java.io.tmpdir locally; point it at durable shared storage
  *    on a cluster). Executor loss mid-iteration then recovers from the
  *    checkpoint files instead of restarting a multi-hour dedup run —
  *    the mode a 100 TB multi-executor job runs in. The persist-first
  *    recipe matters: a bare checkpoint runs a SECOND job over the full
  *    lineage for the checkpoint write; persisting makes that write
  *    read the cached blocks instead.
  *
  * Checkpoint files are cleaned when the application exits only if
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`; long-lived
  * cluster sessions should set that, or sweep the checkpoint dir.
  *
  * CheckpointSeamSpec flips the flag and proves the iterative families
  * (near-dup clustering, PageRank) produce identical results either way.
  */
object Materialize {

  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.get("spark.graft.reliableCheckpoint", "false") == "true"

  def apply(df: DataFrame): DataFrame =
    if (!reliable(df)) df.localCheckpoint()
    else {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = df.sparkSession.conf.get("spark.graft.checkpointDir",
          s"${System.getProperty("java.io.tmpdir")}/graft-checkpoints-${sc.applicationId}")
        sc.setCheckpointDir(dir)
      }
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      val out = cached.checkpoint()
      cached.unpersist()
      out
    }

  /** Proactively free a materialized frame's storage (ArtifactStore
    * eviction, VERDICT r11 #2). A frame that went through [[apply]] plans
    * as `LogicalRDD` leaves over the checkpointed RDDs; walking the
    * analyzed plan finds them whether the stored value is the checkpoint
    * itself or a projection over one. For each: delete its reliable
    * checkpoint files (nothing references a superseded snapshot again —
    * every lookup re-fingerprints) and unpersist its blocks. Without this,
    * localCheckpoint blocks are freed only when the JVM GCs the plan and
    * the ContextCleaner notices — never, while a store map pins it.
    * Unpersisting an already-released RDD is a no-op, so artifacts that
    * share a checkpoint (a graph store holding another store's frame)
    * may release it twice safely.
    */
  def release(df: DataFrame): Unit = {
    import org.apache.spark.sql.execution.LogicalRDD
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
      .foreach { rdd =>
        rdd.getCheckpointFile.foreach { f =>
          try {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(p, true)
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        rdd.unpersist(blocking = false)
      }
  }

  /** `df.materialized` — the call-site form every operator uses. */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = Materialize(df)
  }
}
