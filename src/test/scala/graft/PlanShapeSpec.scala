package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Whole-surface plan invariant: NO registered batch query may plan a
  * CartesianProduct or BroadcastNestedLoopJoin over unbounded inputs —
  * the shapes that turn into corpus-squared work at 100 TB. This is the
  * structural "no quadratic plan" guarantee as a test: every future
  * operator is swept automatically the moment it is registered.
  *
  * Two layers (VERDICT r9 #4 hardened the second):
  *  1. a name allowlist — a nested loop in a query OUTSIDE the list
  *     fails the sweep, so new quadratic shapes can't land silently;
  *  2. a STRUCTURAL check on every sanctioned occurrence — the
  *     nested-loop build side must be a BroadcastExchange whose subtree
  *     is provably bounded (an Aggregate collapsing to group-key
  *     cardinality, a Limit, or a literal LocalTableScan), and a
  *     cartesian product needs BOTH children bounded. An edit that
  *     unbounds a sanctioned query's join side now fails the sweep
  *     instead of hiding behind its name.
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

  /** Flatten a physical plan, stepping through the adaptive/stage/reuse
    * wrappers that hide subtrees from `children`.
    */
  private def expand(p: SparkPlan): Seq[SparkPlan] = p match {
    // inputPlan predates EnsureRequirements (no exchanges yet);
    // executedPlan is the prepared initial plan when nothing has run
    case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
    case q: QueryStageExec        => expand(q.plan)
    case r: ReusedExchangeExec    => expand(r.child)
    case other                    => other +: other.children.flatMap(expand)
  }

  /** A subtree is BOUNDED when some node on every data path collapses
    * it to non-corpus-scale cardinality before the join: a GLOBAL
    * aggregate (1-row stats), a limit, or a literal local relation
    * (threshold grids, strided anchor literals). A GROUPED aggregate is
    * NOT bounded by itself — a groupBy over a corpus-cardinality key
    * (doc_id) has corpus-scale output (ADVICE r10 hardened this); it
    * counts only when its own input is bounded (group keys over a
    * bounded input: centroid sets grouped from a capped/limited anchor
    * frame). A bare scan/filter/project chain is NOT bounded — a
    * filter's selectivity is data, not structure.
    */
  private def isBounded(p: SparkPlan): Boolean = expand(p).exists {
    case a: BaseAggregateExec =>
      a.groupingExpressions.isEmpty || a.children.exists(isBounded)
    case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec => true
    case _: TakeOrderedAndProjectExec => true
    case _: LocalTableScanExec => true
    case _ => false
  }

  test("no registered batch query plans an unbounded cartesian or nested-loop join") {
    // the ONLY queries allowed to carry nested-loop joins at all — each
    // a broadcast of a BOUNDED side by documented design (centroid
    // sets, 1-row stats rows, fixed anchor samples, threshold grids);
    // the structural check below verifies that boundedness per node
    val sanctioned = Set("sim_ivf", "sim_ivf_kmeans", "sim_ivf_indexed", "sim_recall",
      // grow/pq reuse the sim_ivf centroid broadcast (the r9 list
      // matched these by PREFIX; they are now sanctioned by full name)
      "sim_ivf_grow", "sim_ivf_pq",
      "urlcount_cms", "sql_cms", "emb_label_centroids",
      "sim_bruteforce", "sim_allpairs", "text_tfidf", "src_zorder",
      "emb_triplet_mining", "text_bm25", "text_bm25_indexed",
      "text_hybrid_rrf", "text_hybrid_rrf_ann",
      "pipeline_decontaminate_semantic", "mix_curriculum",
      "corpus_padding_audit", "vocab_growth", "mix_distill",
      "rel_dq_audit", "sim_semdedup", "sim_knn_graph", "sim_nprobe_sweep",
      "sim_ivf_balance", "emb_cell_purity", "emb_ood_audit",
      "sim_epsilon_sweep", "sql_cosine", "text_pmi", "text_lm_holdout",
      "text_lm_kn", "corpus_kmv_overlap", "emb_pca_power",
      "vocab_coverage", "emb_abtt", "graph_triangles", "graph_hits",
      "mm_media_funnel", "ev_rfm", "ev_conversion_latency",
      "corpus_term_drift", "rel_idle_customers",
      // three 1-row global aggregates cross-joined (the family gate)
      "dedup_minhash_fast",
      // trained classifier: every cross join broadcasts a 1-row global
      // aggregate (the stats row, then each LMS weight row)
      "text_classifier_train", "text_classifier_auc", "text_classifier_pr")

    // Queries whose sanctioned broadcast build is a GROUPED aggregate
    // over corpus input whose group KEY has a bounded VALUE DOMAIN —
    // boundedness the structural check can't prove (a filter/grouping
    // key's cardinality is data, not plan shape), so it is sanctioned
    // per query with the domain spelled out:
    //  - sim_epsilon_sweep: cosine-milli buckets (|range/step| ~ 20)
    //  - corpus_kmv_overlap: source labels (fixed label set)
    //  - vocab_coverage: token-frequency classes (distinct counts,
    //    O(sqrt(corpus tokens)) by the heavy-tail bound)
    // A grouped-agg build in any OTHER query still fails the sweep.
    val groupKeyBounded = Set("sim_epsilon_sweep", "corpus_kmv_overlap",
      "vocab_coverage")

    val problems = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("stream_"))
      .flatMap { case (name, fn) =>
        val nodes = expand(fn(spark, sfDir).queryExecution.executedPlan)
        val joins = nodes.collect {
          case j: BroadcastNestedLoopJoinExec => j: SparkPlan
          case j: CartesianProductExec        => j: SparkPlan
        }
        joins.flatMap {
          case _ if !sanctioned.contains(name) =>
            Some(s"$name: nested-loop/cartesian join in an unsanctioned query")
          case j: BroadcastNestedLoopJoinExec =>
            val build = j.buildSide match {
              case BuildLeft  => j.left
              case BuildRight => j.right
            }
            val broadcast = expand(build).exists(_.isInstanceOf[BroadcastExchangeExec])
            val groupedAggBuild = expand(build).exists {
              case a: BaseAggregateExec => a.groupingExpressions.nonEmpty
              case _ => false
            }
            if (!broadcast)
              Some(s"$name: BroadcastNestedLoopJoin build side is not a broadcast")
            else if (!isBounded(build) &&
                !(groupKeyBounded.contains(name) && groupedAggBuild))
              Some(s"$name: BroadcastNestedLoopJoin build side is a broadcast of an " +
                "UNBOUNDED subtree (no global-agg/limit/literal below the exchange, " +
                "and the query is not in the group-key-bounded allowlist)")
            else None
          case j: CartesianProductExec =>
            if (!isBounded(j.left) || !isBounded(j.right))
              Some(s"$name: CartesianProduct with an unbounded side")
            else None
        }
      }
    assert(problems.isEmpty, s"quadratic plan shapes found:\n${problems.mkString("\n")}")
  }
}
