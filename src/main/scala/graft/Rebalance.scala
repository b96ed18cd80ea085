package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Width control for CPU-DENSE per-row stages (round 17, guide §2.5).
  *
  * AQE's partition coalescing is a BYTE cost model: post-shuffle reads
  * are packed toward `minPartitionSize` (1 MB), which is right when a
  * task's cost is proportional to its bytes. The md5-family sketch /
  * winnow / codec stages invert that premise — a shingle costs ~16 md5
  * digests (~2.8 us) against ~40 shuffled bytes — so coalescing a
  * keyed repartition that exists precisely to SPREAD that work undoes
  * it: measured at sf0.1, `repartition(col("doc_id"))` upstream of the
  * minhash sketch aggregate coalesced to ONE partition (849 KB < 1 MB)
  * and the whole dedup family's hash work ran single-task on a 32-core
  * box (~0.9-1.2 s serial stages in the round-17 job census).
  *
  * [[cpuSpread]] pins the intended width explicitly: a user-specified
  * partition count is exempt from AQE coalescing, and the width is the
  * session's `spark.sql.shuffle.partitions` — the same scale-adaptive
  * knob every other exchange uses (cores locally, sized per job on a
  * cluster), never a constant.
  *
  * [[cpuSpreadIfNarrow]] is the gated form for stages that carry NO
  * exchange today (a heavy expression fused into the scan stage): it
  * inserts the spread exchange only when the source actually PLANS
  * narrower than the session width — true for a small or few-split
  * input, never true for a corpus whose scan already fills the
  * cluster, so at 100 TB the gate is off and no new corpus-byte
  * exchange appears (the TextAnalysis.serveRebalance discipline).
  */
object Rebalance {

  private def sessionWidth(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Mass targets per spread task (round 18, VERDICT r17 #2). Round 17
    * pinned every spread to the FULL session width, and the driver's
    * 8-vs-32-core scaling block showed the overshoot: on tiny inputs
    * the substring/winnow queries ran 2-4x FASTER 8-wide than 32-wide
    * (dedup_substring_rewrite ratio 0.22) — 32 task-waves of
    * scheduling/exchange overhead exceed the parallelism gain. The
    * width is now proportional to the probe's input mass, capped at
    * the session width: `min(sessionWidth, ceil(bytes / target))`; at
    * scale the byte mass saturates the cap immediately, so cluster
    * behavior is unchanged.
    *
    * The target is PER SITE CLASS because the optimum tracks the
    * stage's CPU density per input byte (measured A/B at sf0.1 on 32
    * cores, /tmp legs recorded in OPTIMIZATION_r18.md):
    *  - hashDense (~an md5 digest per handful of input bytes: the k=16
    *    minhash sketch ladder, DSIR token hashing): 16 KB/task — the
    *    session width until inputs shrink to a few hundred KB; the
    *    64 KB form cost dedup_clusters_incremental +41%.
    *  - windowDense (per-byte scans with cheaper per-unit work: winnow
    *    gram minima, n-token window folds): 64 KB/task — the full-width
    *    form cost dedup_winnow_pairs +53% and dedup_substring +49% in
    *    overhead at harness mass.
    * `spark.graft.spreadTargetBytes` overrides BOTH per deployment.
    */
  val hashDenseTargetBytes: Long = 16L << 10
  val windowDenseTargetBytes: Long = 64L << 10

  private def spreadWidth(df: DataFrame, probe: DataFrame,
                          siteTarget: Long): Int = {
    val spark = df.sparkSession
    val target = BigInt(spark.conf
      .get("spark.graft.spreadTargetBytes", siteTarget.toString)
      .toLong.max(1L))
    val bytes = probe.queryExecution.optimizedPlan.stats.sizeInBytes
    val w = sessionWidth(df)
    // absent/garbage stats (Catalyst's defaultSizeInBytes sentinel for
    // un-analyzed RDD leaves) must not collapse the spread: keep the
    // session width rather than trust a fictitious mass
    if (bytes <= 0 || bytes >= BigInt(Long.MaxValue) / 2) w
    else ((bytes + target - 1) / target).min(BigInt(w)).max(BigInt(1)).toInt
  }

  /** Keyed repartition to the mass-proportional width (capped at the
    * session's shuffle width), EXPLICIT so AQE cannot coalesce it below
    * the CPU parallelism it exists to provide. Use where the plan
    * already pays this exchange (it replaces a `repartition(keys…)`
    * call, adding nothing at any scale). The width derives from the
    * frame's own stats; when those are estimate-garbage (a materialized
    * RDD leaf), pass the source scan as `probe` via the overload.
    * `target` is the site's CPU-density class (see the targets above).
    */
  def cpuSpread(df: DataFrame, keys: Column*): DataFrame =
    cpuSpread(df, df, hashDenseTargetBytes, keys: _*)

  /** [[cpuSpread]] with the mass read from a separate probe frame and
    * an explicit per-site task target.
    */
  def cpuSpread(df: DataFrame, probe: DataFrame, target: Long,
                keys: Column*): DataFrame =
    df.repartition(spreadWidth(df, probe, target), keys: _*)

  /** Insert a spread exchange BEFORE a CPU-dense per-row stage, but
    * only when the stage would otherwise run narrower than the session
    * width (few-split scan, AQE-coalesced upstream aggregate). The
    * gate is STATS-ONLY — estimated input bytes vs the mass a
    * session-wide scan would cover (width x maxPartitionBytes) — so it
    * never plans or runs a probe job (an `.rdd` width probe costs a
    * full query plan per call, measured ~0.1-0.3 s of driver time at
    * 1x). A large input gates off: no new corpus-byte exchange at
    * scale. Keys make the exchange deterministic-by-hash; callers pass
    * the row identity column.
    *
    * Reserve this for stages whose SERIAL cost is substantial (~0.5 s+
    * of per-row CPU at the small scale): the exchange plus the extra
    * task waves cost ~0.2-0.4 s, so spreading a cheap stage is a net
    * loss (measured on sql_minhash/ngram_sweep in the round-17 A/B).
    */
  def cpuSpreadIfNarrow(df: DataFrame, keys: Column*): DataFrame =
    spreadIfProbeNarrow(df, df, keys: _*)

  /** [[cpuSpreadIfNarrow]] with an explicit per-site density target. */
  def cpuSpreadIfNarrow(df: DataFrame, target: Long,
                        keys: Column*): DataFrame =
    spreadIfProbeNarrow(df, df, target, keys: _*)

  /** [[cpuSpreadIfNarrow]] with the bytes gate read from a SEPARATE
    * frame's stats — for spreading an aggregate/join output whose own
    * stats are estimate-garbage, using the source corpus scan as the
    * scale proxy: a corpus whose scan fills the session leaves the
    * frame untouched.
    */
  def spreadIfProbeNarrow(df: DataFrame, probe: DataFrame,
                          keys: Column*): DataFrame =
    spreadIfProbeNarrow(df, probe, windowDenseTargetBytes, keys: _*)

  def spreadIfProbeNarrow(df: DataFrame, probe: DataFrame, target: Long,
                          keys: Column*): DataFrame = {
    if (!probeNarrow(df, probe)) df
    else df.repartition(spreadWidth(df, probe, target), keys: _*)
  }

  private def probeNarrow(df: DataFrame, probe: DataFrame): Boolean = {
    val conf = df.sparkSession.sessionState.conf
    probe.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(sessionWidth(df)) * conf.filesMaxPartitionBytes
  }

  /** The WRITE-side inverse of the spread: a bucketed/partitioned sink
    * writing from a session-wide tiny frame fans out to
    * partitions x buckets small files (round 17: the LSH index
    * lifecycle audits went 8 -> 256 files per write once the sketch
    * stage ran wide, costing ~2 s each in file churn at 1x). When the
    * source-corpus probe says harness scale, collapse to one input
    * partition before the write — reading a materialized tiny frame in
    * one task is cheap, and the write emits one file per bucket again.
    * At scale the gate is off and the write keeps its parallelism (file
    * sizing is then the bucket count's job, guide §6).
    */
  def writeCompactIfNarrow(df: DataFrame, probe: DataFrame): DataFrame =
    if (probeNarrow(df, probe)) df.coalesce(1) else df
}
