package graft

/** Whole-surface plan invariant: NO registered batch query may plan a
  * CartesianProduct or BroadcastNestedLoopJoin — the two shapes that
  * turn into corpus-squared work at 100 TB. This is the structural
  * "no quadratic plan" guarantee as a test: every future operator is
  * swept automatically the moment it is registered.
  *
  * Streaming twins are skipped (calling them RUNS the query; their
  * batch-visible plan is just the memory-sink read — the streaming
  * plans are pinned by StreamingSpec behaviorally). Queries whose
  * construction materializes intermediates (localCheckpoint in the
  * dedup ladder) execute those steps at sf0.001 — cheap, and the final
  * plan is exactly what the harness runs.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no registered batch query plans a cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("stream_"))
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter { op =>
          // broadcast-side crossJoins against tiny centroid/sketch sets
          // are the documented exception IF the build side is a
          // broadcast of an aggregate (Similarity IVF / CMS gate); a
          // plain NLJ over two scans is always a bug
          plan.contains(op)
        }
        bad.map(op => s"$name: $op")
      }
    // the ONLY sanctioned nested-loop joins — each a broadcast of a
    // BOUNDED side, by documented design: IVF/kmeans centroid sets and
    // the CMS one-row sketch; the brute-force exact baseline's strided
    // query set; the all-pairs verifier's FIXED 500-id sample; tfidf's
    // one-row corpus count; the z-order audit's one-row min/max
    // normalization constants; the dq audit's one-row per-table rule
    // aggregates. A nested loop over two unbounded scans fails this
    // sweep.
    val sanctioned = Set("sim_ivf", "sim_ivf_kmeans", "sim_ivf_indexed", "sim_recall",
      "urlcount_cms", "sql_cms", "emb_label_centroids",
      "sim_bruteforce", "sim_allpairs", "text_tfidf", "src_zorder",
      // triplet mining broadcasts the same bounded strided anchor set
      // as sim_bruteforce
      "emb_triplet_mining",
      // bm25's 1-row (tot, n_docs) corpus-stats broadcast, the same
      // shape as tfidf's one-row corpus count (the indexed form reads
      // the same stats from its stored metadata table)
      "text_bm25", "text_bm25_indexed",
      // hybrid RRF composes the text_bm25 stats broadcast AND the
      // sim_bruteforce strided-anchor broadcast; the fuse join itself
      // is a bounded hash join over the two top-k lists
      "text_hybrid_rrf",
      // the IVF-probed form swaps the brute-force broadcast for the
      // sim_ivf centroid broadcast — still bounded sides only
      "text_hybrid_rrf_ann",
      // semantic decontamination broadcasts the ABSOLUTE-size eval
      // vector set (<= 50 rows) against one corpus scan
      "pipeline_decontaminate_semantic",
      // the curriculum schedule's 1-row (sum_q, total_tokens, n_src)
      // totals broadcast into the |sources|-row stats table
      "mix_curriculum",
      // the padding audit's 1-row corpus-max broadcast
      "corpus_padding_audit",
      // the Heaps-law audit's 1-row corpus-max broadcast (bucket edges)
      "vocab_growth",
      // the distill fit's 1-row Cramer coefficient broadcast back onto
      // the scored relation (det + 3 numerators, constant by design)
      "mix_distill",
      "rel_dq_audit",
      // SemDeDup assigns cells through the same broadcast centroid
      // cross join as sim_ivf; the pair join itself is cell-keyed
      "sim_semdedup",
      // the kNN graph reuses that same centroid-broadcast assignment;
      // its neighbor join is cell-keyed, never all-pairs
      "sim_knn_graph",
      // the nprobe sweep composes the centroid broadcast, the
      // brute-force truth's strided-query broadcast, and a 1-row
      // query-count broadcast — all bounded sides
      "sim_nprobe_sweep",
      // the balance audit is the sim_ivf centroid-broadcast assignment
      // plus bounded rollups
      "sim_ivf_balance",
      // the purity audit is the same assignment plus a label join and
      // bounded per-cell rollups
      "emb_cell_purity",
      // the OOD audit is the same centroid-broadcast assignment plus
      // bounded per-cell rollups
      "emb_ood_audit",
      // the epsilon sweep reuses semdedup's centroid broadcast, then
      // expands a 10-row threshold grid against broadcast histograms
      // of <= 21 buckets each plus a 1-row rep count — every
      // nested-loop side is domain-bounded
      "sim_epsilon_sweep",
      // the graft_dot SQL twin of sim_bruteforce: same broadcast
      // strided-query cross join as the Column-API form
      "sql_cosine",
      // PMI's two 1-row corpus totals (N1, N2) broadcast onto the
      // supported-pair table — the tfidf one-row-count shape twice
      "text_pmi",
      // the held-out LM's 1-row train-vocabulary-size broadcast
      "text_lm_holdout",
      // Kneser-Ney's 1-row bigram-type-count broadcast (T in the
      // continuation term) onto the |types| stats table
      "text_lm_kn",
      // the KMV pair stage: |sources|-row sketch table (k longs per
      // row) non-equi-joined against itself — both sides bounded
      // aggregates by construction
      "corpus_kmv_overlap",
      // power iteration's per-step 1-row max-abs rescale broadcast
      // onto the 64-row iterate
      "emb_pca_power",
      // coverage curve: 3-row threshold literal range-joined against
      // the broadcast frequency-class table (O(sqrt N) rows by Zipf)
      "vocab_coverage",
      // ABTT composes pca_power's per-step rescale broadcast plus its
      // own 1-row direction-norm broadcast onto the projection pass
      "emb_abtt",
      // triangle census: the final audit row is two 1-row aggregates
      // cross-joined (stats x triangle count)
      "graph_triangles",
      // HITS' per-half-step 1-row max rescale broadcast onto the
      // bounded score table — the emb_pca_power shape
      "graph_hits",
      // the media funnel's final audit row: two 1-row aggregates
      // cross-joined — the graph_triangles shape
      "mm_media_funnel",
      // RFM's 1-row corpus-max-day broadcast onto the user rollup —
      // the vocab_growth bucket-edge shape
      "ev_rfm",
      // conversion latency's 1-row viewer-count broadcast onto the
      // single percentile row
      "ev_conversion_latency",
      // term drift's 1-row totals broadcast (T_old, T_new, V) onto the
      // joined term table — the tfidf one-row-count shape
      "corpus_term_drift",
      // Q22's 1-row (n_pos, sum_pos) balance-stats broadcast onto the
      // customer scan — the decorrelated scalar subquery, tfidf shape
      "rel_idle_customers")
    val real = offenders.filterNot(o => sanctioned.exists(o.startsWith))
    assert(real.isEmpty, s"quadratic plan shapes found:\n${real.mkString("\n")}")
  }
}
