package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftSession.table
import graft.ops._
import graft.streaming.StreamingOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator of the library is registered here twice:
  *  - `queries`:   name -> (spark, sfDir) -> DataFrame  (the Spark plan)
  *  - `oracleSql`: name -> ANSI SQL DuckDB runs on the SAME parquet tables
  *
  * Cross-engine determinism rules baked into both sides (SURVEY.md §7
  * "what's hard"):
  *  - every query is totally ordered (ORDER BY on a key suffix);
  *  - counts/ranks are BIGINT on both sides (DuckDB sum() -> HUGEINT is
  *    always cast; Spark row_number() -> INT is always cast);
  *  - double->integer narrowing uses floor() in DuckDB (its CAST rounds,
  *    Spark's truncates; all narrowed values here are non-negative so
  *    floor == truncate);
  *  - money sums accumulate in DECIMAL and surface as DOUBLE (exact,
  *    partition-order independent);
  *  - hashes are md5-derived on both sides (graft.functions.OracleHash);
  *  - unix seconds are epoch_us(ts) // 1000000 in DuckDB (its epoch()
  *    returns fractional seconds). NOTE: DuckDB's integer `//` TRUNCATES
  *    toward zero like Spark's `div` (measured -7 // 2 = -3) — the plain
  *    `//` twins agree with the pmod-snapped Spark floorDiv only because
  *    corpus timestamps are non-negative; for negative operands the twin
  *    must spell floor explicitly ((x - ((x % d + d) % d)) // d), and
  *    contract_fuzz_rows pins that form against ±1e18 ns values;
  *  - array dot products are sequential left folds on both sides
  *    (Spark `aggregate`, DuckDB `list_dot_product` — verified identical
  *    on the test corpus).
  */
object SparkEntry {

  /** Rows per LSH band in every minhash oracle (k=16 over the family
    * banding default) — interpolated from the SAME constant the
    * implementation uses (graft.ops.Dedup.defaultLshBands, re-defaulted
    * b=4 -> b=8 in round 17 on the planted-dup Zipf evidence) so the
    * two sides cannot drift.
    */
  private val lshR: Int = 16 / graft.ops.Dedup.defaultLshBands

  /** Flagship query — the reference's one canonical pipeline
    * (tokenize -> count -> top-100, /root/reference/src/main/main.sh:3)
    * over the sf0.001 documents table. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    UrlCount.topK(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", 100)

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-pipeline extensions). Keys group by module:
    * urlcount_* rel_* ev_* text_* dedup_* sim_* mm_*.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // —— reference parity: O1-O10 (SURVEY.md §2) ——
    "urlcount_topk" -> ((s, dir) =>
      UrlCount.topK(table(s, dir, "documents"), "text", 100)),
    "urlcount_counts" -> ((s, dir) =>
      UrlCount.tokenCounts(table(s, dir, "documents"), "text")),
    "urlcount_distinct" -> ((s, dir) =>
      UrlCount.distinctTokens(table(s, dir, "documents"), "text")),
    // O8 merge sink parity: the reference's final "key: value" text lines
    // (master_splitmerge.go:46), globally sorted by key
    "urlcount_merged" -> ((s, dir) =>
      UrlCount.mergedLines(UrlCount.tokenCounts(table(s, dir, "documents"), "text"))),
    // HLL++ sketch counting — the distinct-count scale path; the 5%
    // tolerance check is computed IN the plan so the oracle verifies it
    "urlcount_approx_distinct" -> ((s, dir) =>
      UrlCount.approxDistinctTokens(table(s, dir, "documents"), "text")),
    // —— relational / analytic suite ——
    "rel_pricing" -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "rel_top_orders" -> ((s, dir) => Relational.topRevenueOrders(s, dir)),
    "rel_revenue_nation" -> ((s, dir) => Relational.revenueByNation(s, dir)),
    "rel_top_customers" -> ((s, dir) => Relational.topCustomersPerNation(s, dir)),
    "rel_rollup" -> ((s, dir) => Relational.salesRollup(s, dir)),
    "rel_cube" -> ((s, dir) => Relational.salesCube(s, dir)),
    "rel_part_type_revenue" -> ((s, dir) => Relational.partTypeRevenue(s, dir)),
    "rel_supplier_revenue" -> ((s, dir) => Relational.supplierRevenue(s, dir)),
    "rel_activity" -> ((s, dir) => Relational.customerOrderActivity(s, dir)),
    // order cadence: lag-window day gaps + same-key aggregate, 1 shuffle
    "rel_order_gaps" -> ((s, dir) => Relational.customerOrderGaps(s, dir)),
    // FK audit: distinct-key full outer join -> reconciliation counts
    "rel_fk_audit" -> ((s, dir) => Relational.fkAudit(s, dir)),
    // bucketed-storage co-located join: customer/orders written
    // bucketBy(custkey), joined bucket-to-bucket with no Exchange on
    // the join (the pay-the-shuffle-once layout; BucketingSpec pins
    // the exchange-free plan)
    "rel_bucketed_join" -> ((s, dir) => Relational.bucketedCustomerOrders(s, dir)),
    // partition-pruned scan: documents written partitionBy(source), a
    // two-source profile reads only those two partition directories —
    // the predicate prunes at planning time (PartitionFilters, not
    // PushedFilters; PartitionedSpec pins the plan shape)
    "src_pruned_scan" -> ((s, dir) => graft.sources.Partitioned.prunedDocCounts(s, dir)),
    // JSON-lines round-trip: write -> schema-pinned read-back ->
    // per-source parity profile (count, char mass, XOR content
    // checksum) whose oracle reads the ORIGINAL parquet
    "src_json_roundtrip" -> ((s, dir) => graft.sources.JsonLines.jsonRoundTrip(s, dir)),
    // CSV write -> multiLine read-back parity: RFC-4180 quoting with
    // embedded newlines, gated by the same checksummed profile
    "src_csv_roundtrip" -> ((s, dir) => graft.sources.JsonLines.csvRoundTrip(s, dir)),
    // streaming twin: foreachBatch JSON-lines file sink, then the
    // same schema-pinned read-back parity profile — shared oracle
    "stream_json_sink" -> ((s, dir) => StreamingOps.streamJsonSink(s, dir)),
    // Z-order layout audit: per-bucket min-max spans of the natural vs
    // Morton-interleaved (custkey x day) layout — the multi-dimensional
    // file-skipping design check, all-integer bit math
    "src_zorder" -> ((s, dir) => Layout.zorderAudit(s, dir)),
    // incremental MV maintenance: mergeable partials over a base
    // snapshot + mid-month delta, merged by re-aggregation; the oracle
    // recomputes directly, proving merge == recompute
    "rel_mv_merge" -> ((s, dir) => Relational.incrementalMvMerge(s, dir)),
    // PageRank over the customer<->supplier trade graph: 3 rounds of
    // integral-rank propagation over a checkpointed static edge list
    "graph_pagerank" -> ((s, dir) => Graph.pageRank(s, dir)),
    // HITS hubs/authorities on the directed customer->supplier graph:
    // integral power iteration, floor-div rescale each half-step
    "graph_hits" -> ((s, dir) => Graph.hits(s, dir)),
    // exact triangle census of the co-supplier graph via the
    // degree-ordered orientation (a star contributes zero oriented
    // wedges); one audit row with the global clustering coefficient
    "graph_triangles" -> ((s, dir) => Graph.triangleCensus(s, dir)),
    // k-core peel: fixed-round degeneracy decomposition over the same
    // ratio-thresholded edge set, one degree agg + two semi-joins per
    // round, edge lineage checkpointed flat
    "graph_kcore" -> ((s, dir) => Graph.kCore(s, dir)),
    // deterministic synchronous label-propagation communities (most
    // frequent neighbor label, ties to the smallest) — finds the dense
    // GROUPS where k-core finds the core and components reachability
    "graph_communities" -> ((s, dir) => Graph.communities(s, dir)),
    // set-operation family: churned/retained/new customer segments via
    // EXCEPT / INTERSECT over distinct year-activity key sets
    "rel_churn" -> ((s, dir) => Relational.customerChurnSetOps(s, dir)),
    // SCD2 dimension build from a changelog: gaps-and-islands run
    // collapse -> validity intervals, one shuffle, shared window
    // partitioning throughout
    "rel_scd2" -> ((s, dir) => Relational.scd2StatusDim(s, dir)),
    // point-in-time lookup against that dimension: key equi-join +
    // validity-range predicate (the warehouse temporal join), 'NONE'
    // for first orders
    "rel_scd2_asof" -> ((s, dir) => Relational.scd2AsOfLookup(s, dir)),
    // incremental SCD2 maintenance: delta-touched customers rebuild
    // from their own history, everyone else keeps stored rows (anti-
    // join) — merged == full rebuild, so the build oracle verifies it
    "rel_scd2_merge" -> ((s, dir) => Relational.scd2IncrementalMerge(s, dir)),
    // declarative constraint audit: six rules (unique/positive/range/
    // domain/FK), one fused aggregate pass per table + anti-join count
    "rel_dq_audit" -> ((s, dir) => Relational.dqAudit(s, dir)),
    // join-key skew pre-flight: per-key counts rolled into exact log2
    // bands (binary digit count, no float log) — the salt-or-not signal
    "rel_skew_audit" -> ((s, dir) => Relational.skewAudit(s, dir)),
    // TPC-H Q21 shape: sole-late-supplier blame via one orderkey
    // partitioning reused by the semi probe, the anti probe and the
    // lateness join; distributed top-k
    "rel_waiting_suppliers" -> ((s, dir) => Relational.waitingSuppliers(s, dir)),
    // TPC-H Q8 shape: supplier-nation revenue share per year inside one
    // region x part-type market; exact ppm shares, no float money
    "rel_market_share" -> ((s, dir) => Relational.marketShare(s, dir)),
    // TPC-H Q22 shape: above-average-balance customers with no orders
    // (1-row stats broadcast + cross-multiplied compare + anti join)
    "rel_idle_customers" -> ((s, dir) => Relational.idleCustomers(s, dir)),
    // right-to-be-forgotten impact audit: manifest + two-hop cascade
    // (customer -> orders -> lineitems), broadcast semi probes only
    "rel_forget_sweep" -> ((s, dir) => Relational.forgetSweep(s, dir)),
    // sweep-line interval stabbing: open-order depth from +1/-1
    // boundary deltas + one bounded running-sum window
    "rel_open_orders" -> ((s, dir) => Relational.openOrderDepth(s, dir)),
    // recency/frequency/monetary features + churn label in one user
    // rollup — the feature vector churn/LTV models train on
    "ev_rfm" -> ((s, dir) => EventWindows.rfmFeatures(s, dir)),
    // the same features maintained as Complete-mode streaming state —
    // the feature-store serving shape; shares ev_rfm's oracle
    "stream_rfm" -> ((s, dir) => StreamingOps.streamRfm(s, dir)),
    // last-touch attribution at ingest: O(1) last-view state per user,
    // purchases emit their attribution row in flight
    "stream_attribution" -> ((s, dir) => StreamingOps.streamAttribution(s, dir)),
    // TPC-H Q17 shape: correlated avg-quantity subquery decorrelated to
    // a per-part aggregate + broadcast brand probe; integer
    // cross-multiplied threshold, decimal-exact money
    "rel_small_qty_revenue" -> ((s, dir) => Relational.smallQuantityRevenue(s, dir)),
    // —— event-time windows (batch analog of graft.streaming) ——
    "ev_tumbling" -> ((s, dir) => EventWindows.tumbling(s, dir)),
    "ev_sliding" -> ((s, dir) => EventWindows.sliding(s, dir)),
    "ev_sessions" -> ((s, dir) => EventWindows.sessionize(s, dir)),
    "ev_daily_top" -> ((s, dir) => EventWindows.dailyTopTypes(s, dir)),
    // per-type top-1% trim audit (rank-based winsorization): exact
    // integer percentile cut, ties total by event_id
    "ev_outliers" -> ((s, dir) => EventWindows.outlierTrimAudit(s, dir)),
    // robust twin: modified z-score (median/MAD) flagging — doubled
    // medians keep the .5 interpolation integral, the 3.5 threshold
    // multiplies out to pure integer products
    "ev_mad_outliers" -> ((s, dir) => EventWindows.madOutliers(s, dir)),
    // hour-of-day seasonal baseline + held-out deviation audit — the
    // seasonality conditioning CUSUM/MAD population stats cannot see
    "ev_seasonal" -> ((s, dir) => EventWindows.seasonalAudit(s, dir)),
    // A/B readout: md5-coin arm split, per-arm conversion, treatment
    // lift with a one-pass Poisson-bootstrap CI over users
    "ev_ab_lift" -> ((s, dir) => EventWindows.abLift(s, dir)),
    // first-view -> first-purchase latency, exact rank percentiles —
    // the number that prices attribution windows
    "ev_conversion_latency" -> ((s, dir) => EventWindows.conversionLatency(s, dir)),
    // minimal detectable effect (squared, exact integers) + whether
    // the observed lift clears it — underpowered tests read as noise
    "ev_ab_power" -> ((s, dir) => EventWindows.abPower(s, dir)),
    // CUSUM drift alarm over daily volume: the recursive statistic in
    // its two-window closed form (running sum minus running extremum),
    // windows over the bounded |days| relation only
    "ev_cusum" -> ((s, dir) => EventWindows.cusumDailyVolume(s, dir)),
    // DAU/WAU stickiness: trailing-window distinct via bounded x7
    // day-explode + hash distinct — no per-user window sort
    "ev_stickiness" -> ((s, dir) => EventWindows.stickiness(s, dir)),
    // the same top-k-per-day via the custom TopKTagAgg aggregate: no
    // per-day sort, k-entry buffers combine map-side — the shuffle
    // carries k rows per day instead of every (day, type) row
    "ev_daily_top_agg" -> ((s, dir) => EventWindows.dailyTopTypesAgg(s, dir)),
    // RANGE (value-based) window frame: trailing one-hour same-user
    // same-type activity per event — the frame family member ROWS
    // framing can't express; partitioned on a high-cardinality key
    "ev_range_frame" -> ((s, dir) => EventWindows.rangeFrameCounts(s, dir)),
    // event-time disorder histogram: the measured distribution behind
    // every watermark-delay choice in the streaming twins
    "ev_lateness" -> ((s, dir) => EventWindows.latenessAudit(s, dir)),
    // explicit GROUPING SETS (the member between rollup and cube):
    // chosen aggregation levels with grouping() flags; pure SQL surface
    "rel_grouping_sets" -> ((s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT o_orderpriority, o_orderstatus,
          |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
          |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          |  CAST(count(*) AS BIGINT) AS n,
          |  sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
          |FROM graft_orders
          |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
          |                        (o_orderpriority), (o_orderstatus), ())
          |ORDER BY g_pri, g_status, o_orderpriority, o_orderstatus""".stripMargin)
    }),
    // as-of join (conversion attribution): each purchase joined to the
    // latest preceding view of the same user — composed as tag + one
    // shuffle + carry-forward window, not a quadratic range join
    "ev_asof_attribution" -> ((s, dir) => EventWindows.asOfAttribution(s, dir)),
    // batch interval join: purchases x views within the 1 h lookback,
    // equi-joined on (user, coarse time bucket) so candidate pairs are
    // bounded by true temporal neighbors, not per-user totals
    "ev_interval_join" -> ((s, dir) => EventWindows.intervalJoin(s, dir)),
    // funnel: view -> click -> purchase progression counted with k
    // chained running-min windows over ONE shuffle (no joins back)
    "ev_funnel" -> ((s, dir) => EventWindows.funnel(s, dir)),
    // conversion-window funnel: same single-Exchange window-chain plan,
    // the hour bound is one more predicate in each layer
    "ev_funnel_windowed" -> ((s, dir) =>
      EventWindows.funnel(s, dir, windowUs = Some(3600L * 1000000L))),
    // grouped HLL++ distinct users per type, in-plan ±5% gate vs exact
    "ev_approx_users" -> ((s, dir) => EventWindows.approxDistinctUsersPerType(s, dir)),
    // mergeable quantile sketch with a tie-aware rank-space gate vs the
    // exact disc quantiles (integral micros both sides)
    "ev_approx_quantiles" -> ((s, dir) => EventWindows.approxQuantileGate(s, dir)),
    // growth curve: first-day-per-user rewrite of running distinct
    "ev_daily_new_users" -> ((s, dir) => EventWindows.dailyNewUsers(s, dir)),
    // retention triangle: (cohort week, offset) counts from (user, week) pairs
    "ev_retention" -> ((s, dir) => EventWindows.retentionCohorts(s, dir)),
    // cohort LTV: weekly + cumulative purchase revenue per cohort —
    // the payback table beside the retention triangle
    "ev_cohort_revenue" -> ((s, dir) => EventWindows.cohortRevenue(s, dir)),
    // linear multi-touch attribution: exact value-conserving integer
    // split across in-window touches, remainder to the earliest
    "ev_attribution_linear" -> ((s, dir) => EventWindows.linearAttribution(s, dir)),
    // semi-structured: typed from_json parse of props, per-type stats
    "ev_props" -> ((s, dir) => EventWindows.propsStats(s, dir)),
    // changelog compaction: last-write-wins via max(struct), no window
    "ev_latest_state" -> ((s, dir) => EventWindows.latestState(s, dir)),
    // debounce audit: burst duplicates per type via lag on (user, type)
    "ev_bursts" -> ((s, dir) => EventWindows.burstDuplicates(s, dir)),
    // Markov transition matrix: (prev -> next) counts + integral ppm
    // row rates from per-user lag sequences; one full-data shuffle
    "ev_transitions" -> ((s, dir) => EventWindows.eventTransitions(s, dir)),
    // bounded-frame window: trailing 7-bucket moving average of daily
    // volume per type, integral milli
    "ev_moving_avg" -> ((s, dir) => EventWindows.movingAverage(s, dir)),
    // —— text analysis ——
    "text_stats" -> ((s, dir) => TextAnalysis.tokenStats(s, dir)),
    "text_quality" -> ((s, dir) => TextAnalysis.qualityScore(s, dir)),
    // Gopher rule filter: every structural rule as its own auditable
    // flag, keep = AND of all; exact integer-milli ratios, zero shuffle
    "text_gopher" -> ((s, dir) => TextAnalysis.gopherRules(s, dir)),
    // OOV rate vs the top-10 corpus vocabulary: urlcount agg cut to K,
    // broadcast left join, one doc_id shuffle for the rollup
    "text_oov" -> ((s, dir) => TextAnalysis.oovRate(s, dir)),
    // per-source rule rejection rates + keep rate: the drift audit table
    "text_quality_report" -> ((s, dir) => TextAnalysis.qualityReport(s, dir)),
    // vocab application: token->id broadcast join + order-preserving
    // sequence reassembly per doc, sequence proven by md5
    "text_tokenize" -> ((s, dir) => TextAnalysis.tokenizeDocs(s, dir)),
    // declared-column PIVOT cross-tab; zero-filled count cells
    "text_pivot" -> ((s, dir) => TextAnalysis.langSourcePivot(s, dir)),
    // UNPIVOT (stack) of the pivot back to long rows — proven round-trip
    "text_unpivot" -> ((s, dir) => TextAnalysis.langSourceUnpivot(s, dir)),
    // ntile(4) length bands per source, deterministic edges
    "text_ntile" -> ((s, dir) => TextAnalysis.lengthNtileBands(s, dir)),
    // compression-ratio quality proxy, gated in-plan: zlib output length
    // is not SQL-replayable, so the query asserts the codec claims
    // (deflate worst-case bound, repetition-compresses monotonicity) as
    // booleans the oracle pins TRUE; n_bytes anchors to real data. The
    // full per-doc signal stays as TextAnalysis.compressionSignal.
    "text_compression" -> ((s, dir) => TextAnalysis.compressionGate(s, dir)),
    // int8 quantization audit: exact integer scale/dequant error report
    "sim_quantize" -> ((s, dir) => Similarity.quantizeInt8Report(s, dir)),
    "text_langid" -> ((s, dir) => TextAnalysis.langId(s, dir)),
    // declared-vs-inferred language confusion matrix with zero-evidence
    // counts — the calibration table before trusting langid as a filter
    "text_langid_confusion" -> ((s, dir) => TextAnalysis.langIdConfusion(s, dir)),
    // per-source type-token + hapax ratios: collapsed TTR marks
    // template text, inflated hapax marks OCR noise
    "text_lexical_richness" -> ((s, dir) => TextAnalysis.lexicalRichness(s, dir)),
    "text_fingerprints" -> ((s, dir) => TextAnalysis.fingerprints(s, dir)),
    // intra-doc repeated-n-gram ratio (boilerplate/spam quality signal)
    "text_repetition" -> ((s, dir) => TextAnalysis.repetitionScore(s, dir)),
    // deterministic hash-bucket train/val/test split, per-source report
    "sample_split" -> ((s, dir) => TextAnalysis.stratifiedSplit(s, dir)),
    // cross-split exact-content leakage audit over the same hash-stable
    // split: one content-hash aggregation, 3-row stack, no joins
    "split_leakage" -> ((s, dir) => TextAnalysis.splitLeakage(s, dir)),
    // fuzzy complement: jaccard near-dup pairs labeled with every
    // copy's split membership per side + cross-split leak flag
    "split_leakage_fuzzy" -> ((s, dir) => Dedup.fuzzySplitLeakage(s, dir)),
    // source-concentration Lorenz curve + integer Gini (DECIMAL(38,0)
    // rank-weighted accumulator)
    "corpus_gini" -> ((s, dir) => Corpus.sourceGini(s, dir)),
    // Simpson concentration + effective group count (source and lang):
    // the diversity denominator a mix report actually needs
    "corpus_simpson" -> ((s, dir) => Corpus.simpsonDiversity(s, dir)),
    // k-anonymity over (source, lang, length band): combos under k
    // docs re-identify members — the metadata-side governance audit
    "corpus_kanon" -> ((s, dir) => Corpus.kAnonymity(s, dir)),
    // per-source integrity manifest: order-independent content
    // checksum + counts — the snapshot-transfer validation table
    "corpus_manifest" -> ((s, dir) => Corpus.sourceManifest(s, dir)),
    // the same manifest maintained as Complete-mode streaming state —
    // commutative sums merge order-free; shares the batch oracle
    "stream_manifest" -> ((s, dir) => StreamingOps.streamManifest(s, dir)),
    // inter-arrival regularity bot detection: exact gap variance via
    // the n*ss - s^2 identity, metronome users flagged
    "ev_bot_audit" -> ((s, dir) => EventWindows.botAudit(s, dir)),
    // mergeable per-source profile: per-shard HLL sketches unioned per
    // source (one sketch per (source, shard) shuffled, never tokens);
    // estimate gated in-plan vs exact, oracle expects the gate TRUE
    "corpus_sketch_profile" -> ((s, dir) => Corpus.sketchProfile(s, dir)),
    // persisted profile store: source-bucketed sketch table + fold-in
    // append; rollup reads co-located buckets (no store-side Exchange),
    // union gated vs exact over the full corpus
    "corpus_profile_refresh" -> ((s, dir) => Corpus.profileRefreshAudit(s, dir)),
    // store compaction: one sketch per (source, shard) by unioning the
    // STORED sketches — no token re-read; compacted union gated vs exact
    "corpus_profile_compact" -> ((s, dir) => Corpus.profileCompactAudit(s, dir)),
    // eval-set (benchmark) leakage check: train docs sharing >= 3
    // distinct 3-grams with the held-out set (threshold chosen so the
    // check is NON-VACUOUS on the synthetic corpus: overlaps reach 4)
    "pipeline_decontaminate" -> ((s, dir) => Dedup.decontaminate(s, dir)),
    // bloom-prefiltered twin: same relation, the eval-set-too-big-to-
    // broadcast scale path (bloom sketch ships instead of the set)
    "pipeline_decontaminate_bloom" -> ((s, dir) => Dedup.decontaminateBloom(s, dir)),
    // embedding-space complement: each train doc's closest eval item +
    // leak flag — catches paraphrased leakage n-grams cannot see
    "pipeline_decontaminate_semantic" ->
      ((s, dir) => Similarity.semanticDecontaminate(s, dir)),
    // context-window chunking (64-token windows, 8-token overlap);
    // chunk content is proven by md5, not shipped
    "text_chunks" -> ((s, dir) => TextAnalysis.chunkDocs(s, dir)),
    // per-source length quantiles: GK approx-percentile sketch gated
    // in-plan against exact quantiles at q±5% (the HLL++ gate pattern)
    "text_len_quantiles" -> ((s, dir) => TextAnalysis.lengthQuantiles(s, dir)),
    // top-3 characteristic terms per doc by TF-IDF (exact-rational
    // integer idf — cross-engine deterministic, no float log)
    "text_tfidf" -> ((s, dir) => TextAnalysis.tfidfTopTerms(s, dir)),
    // PMI collocations: exact integral lift ranking (log-free, PMI
    // order preserved), low-support guard before the unigram joins,
    // distributed top-k — never a global sort
    "text_pmi" -> ((s, dir) => TextAnalysis.pmiCollocations(s, dir)),
    // BM25 top-k retrieval: inverted index w/ length-carrying postings,
    // broadcast query-term dim, exact integer Robertson scoring, bounded
    // per-query top-k aggregate (no per-query window)
    "text_bm25" -> ((s, dir) => TextAnalysis.bm25TopK(s, dir)),
    // the index OUTLIVES the query: term-bucketed stored postings +
    // 1-row stats metadata; serving touches index tables only
    "text_bm25_indexed" -> ((s, dir) => TextAnalysis.bm25Indexed(s, dir)),
    // hybrid retrieval: query-by-document BM25 + exact-cosine rankings
    // fused with integer Reciprocal Rank Fusion over the top-k lists
    "text_hybrid_rrf" -> ((s, dir) => TextAnalysis.hybridRrf(s, dir)),
    // the production hybrid: same fuse, semantic side served from the
    // IVF probe (nprobe cells) instead of the brute-force corpus scan
    "text_hybrid_rrf_ann" -> ((s, dir) => TextAnalysis.hybridRrfAnn(s, dir)),
    // deny-list redaction with audit: blocklisted tokens masked per row
    // (no shuffle), scrubbed text proven by md5
    "text_scrub" -> ((s, dir) => TextAnalysis.scrubDocs(s, dir)),
    // PII detection + redaction: regex trio (email/phone/IP) counted on
    // the raw text, masked text proven by md5 — per-row, no shuffle
    "text_pii" -> ((s, dir) => TextAnalysis.piiScan(s, dir)),
    // Heaps-law vocabulary growth per corpus decile: new types, cum
    // types, and the token volume that bought them
    "vocab_growth" -> ((s, dir) => TextAnalysis.vocabGrowth(s, dir)),
    // vocab-sizing coverage curve: types collapse to frequency CLASSES
    // (O(sqrt N) rows by Zipf) before the one bounded running sum;
    // the p% boundary interpolates arithmetically within a class
    "vocab_coverage" -> ((s, dir) => TextAnalysis.coverageCurve(s, dir)),
    // hashed linear quality classifier (fastText-style stand-in): score
    // is one array fold per row — the model-based filter rung above the
    // gopher heuristics
    "text_classifier" -> ((s, dir) => TextAnalysis.classifierScore(s, dir)),
    // TRAINED quality classifier (rule distillation): standardized
    // integer quality signals, 6 unrolled fixed-point LMS steps — one
    // materialized feature pass, then 1-row gradient aggregates; the
    // oracle replays the exact weight trajectory
    "text_classifier_train" -> ((s, dir) => TextAnalysis.classifierTrain(s, dir)),
    // rank-sum ROC AUC over the trained scorer: the window runs over
    // the score HISTOGRAM (value-domain-bounded), never the corpus
    "text_classifier_auc" -> ((s, dir) => TextAnalysis.classifierAuc(s, dir)),
    // operating-point sweep: 11 thresholds from ONE conditional-sum
    // aggregate, unfolded by a constant explode
    "text_classifier_pr" -> ((s, dir) => TextAnalysis.classifierPr(s, dir)),
    // ordered filter cascade with attribution: first failing rule per
    // doc (lang -> gopher x5 -> classifier), per-source histogram; one
    // per-row projection, zero shuffles before the rollup
    "pipeline_cascade" -> ((s, dir) => TextAnalysis.filterCascade(s, dir)),
    // —— deduplication ladder ——
    "dedup_exact" -> ((s, dir) => Dedup.exact(s, dir)),
    // quality-aware survivor choice: same exact-content groups, but the
    // kept variant is argmax(quality gate, raw length, -doc_id) via one
    // max(struct) accumulator — map-side combinable, never a window
    "dedup_best_rep" -> ((s, dir) => Dedup.bestRep(s, dir)),
    // exact-substring duplication report: per-doc fraction of 8-token
    // windows shared with ANY other doc — overlap at every alignment
    // (passage dedup only sees fixed-aligned blocks); windows hashed to
    // 60 bits before the shuffle, document frequency via one
    // count-over-partition pass, no self-join
    "dedup_substring" -> ((s, dir) => Dedup.substringDupReport(s, dir)),
    // daily-ingest substring report: persisted (window, count) store
    // bucketed on the hash, fresh batch folds in and probes the merged
    // counts — old docs never re-read, equal to the full rebuild
    "dedup_substring_refresh" -> ((s, dir) => Dedup.substringRefresh(s, dir)),
    // substring-duplication REMOVAL (Lee et al. ExactSubstr): excise
    // every 8-token span occurring >= 2 times corpus-wide, keep the
    // rest of the doc in order; rebuilt text proven by md5, per-doc
    // token/char removal audit. Semi-join against duplicated window
    // keys + one per-doc rebuild projection — no self-join
    "dedup_substring_rewrite" -> ((s, dir) => Dedup.substringDupRewrite(s, dir)),
    // passage-level dedup (C4 "line dedup"): first occurrence of each
    // 32-token passage wins via argmin aggregation — no self-join, so a
    // million-copy boilerplate passage never materializes a pair
    "dedup_passages" -> ((s, dir) => Dedup.passageDedup(s, dir)),
    // composed C4-style pass: gopher gate (narrow, first) -> passage
    // dedup over survivors -> per-source curation summary
    "pipeline_gopher" -> ((s, dir) => Dedup.gopherClean(s, dir)),
    // filter-stack audit: pairwise confusion matrix of the three
    // independent keep signals in one narrow pass + scalar rollup
    "pipeline_rule_agreement" -> ((s, dir) => TextAnalysis.ruleAgreement(s, dir)),
    // source-pair containment matrix: per-window fanout bounded by the
    // source dimension (<= C(S,2) pair rows per window), never corpus
    "corpus_overlap" -> ((s, dir) => Dedup.sourceOverlap(s, dir)),
    // KMV bottom-k sketch twin of corpus_overlap: k longs per source
    // cross the wire (bounded top-k agg, no per-group sort); pairwise
    // union/intersection estimated from the mergeable sketches alone
    "corpus_kmv_overlap" -> ((s, dir) => Dedup.kmvSourceOverlap(s, dir)),
    // normalization-ladder audit: docs collapsed by each successive
    // canonicalization rung (raw/lower/ws/punct), one x4 narrow pass
    "dedup_normalization" -> ((s, dir) => Dedup.normalizationAudit(s, dir)),
    // token-weighted ladder audit: tokens each rung reclaims (the
    // number a budget allocator consumes), kept member via min(struct)
    "dedup_reclaim" -> ((s, dir) => Dedup.reclaimAudit(s, dir)),
    // crawl-health histogram: near-dup component sizes from the same
    // clustering machinery, two map-side-combinable rollups on top
    "dedup_cluster_sizes" -> ((s, dir) => Dedup.clusterSizeDistribution(s, dir)),
    // measured LSH S-curve: candidate volume + precision per (bands,
    // rows) split of ONE shared k=16 sketch
    "dedup_banding_sweep" -> ((s, dir) => Dedup.bandingSweep(s, dir)),
    // winnowing density vs the 2/(w+1) expectation, per window width
    "text_winnow_audit" -> ((s, dir) => Dedup.winnowDensityAudit(s, dir)),
    // MOSS matching: pairs sharing >= 8 winnow fingerprints (local
    // span evidence), stop-fp guard, posting-list-bounded pairing
    "dedup_winnow_pairs" -> ((s, dir) => Dedup.winnowPairs(s, dir)),
    // window-size calibration for substring dedup: dup fraction per n
    "dedup_ngram_sweep" -> ((s, dir) => Dedup.ngramSweep(s, dir)),
    // directed containment rung: |inter| / min(|A|,|B|) over
    // representatives — nested/quoted duplication symmetric jaccard
    // misses (big doc swallows the union)
    "dedup_containment" -> ((s, dir) => Dedup.ngramContainmentPairs(s, dir)),
    "dedup_minhash_lsh" -> ((s, dir) => Dedup.minHashLsh(s, dir)),
    // sketch-quality audit: estimated vs exact Jaccard over the SAME
    // LSH candidates, rolled into 21 error bands — the k/bands tuning
    // table a 100 TB dedup run reads before trusting the sketch
    "dedup_minhash_calibration" -> ((s, dir) => Dedup.minhashCalibration(s, dir)),
    // production-path hash family (xxhash64), gated in-plan: the fast
    // sketch is not DuckDB-reproducible, so the query runs BOTH families
    // over one shared shingle pass and asserts their pair sets agree
    // (recall/precision >= 90% as booleans the oracle pins TRUE;
    // n_ref_pairs replays exactly via the md5 LSH chain). The raw fast
    // rung stays as Dedup.minHashLsh(family = "xxh64"); DedupSpec pins
    // its semantics against the oracle variant.
    "dedup_minhash_fast" -> ((s, dir) => Dedup.minHashFastGate(s, dir)),
    // index-backed INCREMENTAL dedup (the daily-crawl shape): band
    // signatures of the "existing" 90% of the corpus persisted as a
    // bucketed table, the "new" 10% sketched and probed against ONLY the
    // matching buckets — no corpus rescan; the index side of the probe
    // join plans with no Exchange (PersistedIndexSpec)
    "dedup_incremental" -> ((s, dir) => Dedup.incrementalMinHash(s, dir)),
    // the fold-in half of the daily cycle: batch signatures APPENDED to
    // the stored bucketed index, audited per band against a full
    // rebuild — the redundancy is exactly the cross-split content dups
    "dedup_index_refresh" -> ((s, dir) => Dedup.indexRefreshAudit(s, dir)),
    // the maintenance step the refresh audit prices out: rewrite the
    // folded index keeping global representatives only — a semi-join of
    // STORED rows against the rep-id set, no re-sketch; compacted row
    // count must equal a from-scratch rebuild's
    "dedup_index_compact" -> ((s, dir) => Dedup.indexCompactAudit(s, dir)),
    "dedup_simhash" -> ((s, dir) => Dedup.simHashPairs(s, dir)),
    "dedup_jaccard" -> ((s, dir) => Dedup.ngramJaccardPairs(s, dir)),
    // threshold 400 (not the production 990): the synthetic corpus has no
    // true near-dups (max cos ~0.48), and a 990 cutoff would make the
    // oracle compare empty-vs-empty — vacuously green. 400 keeps the
    // LSH-bucket + exact-cosine path exercised on non-empty output.
    "dedup_embedding" -> ((s, dir) => Dedup.embeddingNearDups(s, dir, minCosMilli = 400L)),
    // exact vector dedup (the embedding twin of dedup_exact): grouping on
    // the raw DOUBLE array — identical-vector copies collapse here, so
    // the near-dup rung above pairs DISTINCT vectors only
    "emb_exact_dups" -> ((s, dir) => Similarity.exactVectorDups(s, dir)),
    // fuzzy cluster resolution: union of the three fuzzy rungs' pairs
    // over exact-content representatives -> connected components
    // (min-label propagation) -> membership expanded back to every copy
    "dedup_clusters" -> ((s, dir) => Dedup.nearDupClusters(s, dir)),
    // the same resolution via Kiveris et al.'s large-star/small-star
    // contraction — O(log n) rounds vs propagation's O(diameter); both
    // algorithms hash-compare against one recursive-CTE oracle
    "dedup_clusters_twostar" -> ((s, dir) => Dedup.nearDupClustersTwoStar(s, dir)),
    // SoftDedup: per-doc training weight = 1000 div near-dup cluster
    // size — duplicated content counts once in expectation, no removal
    "dedup_soft_weights" -> ((s, dir) => Dedup.softDedupWeights(s, dir)),
    // duplication x quality co-occurrence lift per source — the audit
    // behind quality-gate-first vs dedup-first pipeline order
    "dedup_quality_lift" -> ((s, dir) => Dedup.qualityDupLift(s, dir)),
    // Venn decomposition of the near-dup pair graph by detecting rung:
    // a rung with an empty exclusive cell is pure cost
    "dedup_rung_overlap" -> ((s, dir) => Dedup.rungOverlap(s, dir)),
    // fold the fresh batch's probe pairs into stored cluster labels via
    // contraction + star-merge; the oracle IS the full rebuild
    "dedup_clusters_incremental" -> ((s, dir) => Dedup.incrementalClusters(s, dir)),
    // composed cleaning pipeline: quality gate -> exact dedup survivors
    "pipeline_clean" -> ((s, dir) => Dedup.cleanCorpus(s, dir)),
    // full ladder: quality gate -> exact dedup -> fuzzy-cluster dedup
    // (keep the smallest surviving doc per near-dup component)
    "pipeline_fuzzy" -> ((s, dir) => Dedup.cleanCorpusFuzzy(s, dir)),
    // the ladder with a quality-aware cluster survivor: longest raw
    // member per cluster instead of the accidental min id
    "pipeline_fuzzy_best" -> ((s, dir) => Dedup.cleanCorpusFuzzyBest(s, dir)),
    // the END-TO-END funnel: every ladder stage composed in one run,
    // exact survivor counts per stage (raw -> quality -> exact ->
    // fuzzy -> decontaminated -> sampled)
    "pipeline_e2e" -> ((s, dir) => Dedup.curationFunnel(s, dir)),
    // —— similarity search ——
    "sim_bruteforce" -> ((s, dir) => Similarity.bruteForceTopK(s, dir)),
    "sim_lsh_ann" -> ((s, dir) => Similarity.lshAnn(s, dir)),
    // multiprobe LSH: each query also probes every hamming-1 neighbor
    // bucket — recall without more hash tables
    "sim_lsh_multiprobe" -> ((s, dir) => Similarity.lshMultiprobe(s, dir)),
    "sim_ivf" -> ((s, dir) => Similarity.ivfAnn(s, dir)),
    // trained-quantizer IVF (2 Lloyd rounds over the strided seeds) —
    // exact integer-micro centroid means make the training loop
    // oracle-replayable as chained CTEs (kmeansOracle); SimilaritySpec
    // additionally pins recall@10 against brute-force ground truth
    "sim_ivf_kmeans" -> ((s, dir) => Similarity.ivfAnnKMeans(s, dir)),
    // the index OUTLIVES the query: cell assignments written bucketed by
    // cell once, probes read the stored posting lists (no re-assignment
    // scan, no Exchange on the index side — SimilaritySpec pins it);
    // same quantizer as sim_ivf so the same oracle replays the result
    "sim_ivf_indexed" -> ((s, dir) => Similarity.ivfIndexed(s, dir)),
    // the index GROWS: new vectors assign against the stored day-one
    // quantizer and APPEND to the bucketed posting lists — per-vector
    // assignment is independent, so grown == rebuilt and the same
    // oracle replays the probe
    "sim_ivf_grow" -> ((s, dir) => Similarity.ivfIndexedGrow(s, dir)),
    // exact ground-truth verifier, quadratic BY DESIGN: the sample is a
    // FIXED absolute size (500 smallest vec_ids -> <=124,750 pairs), so
    // 100x the corpus cannot re-quadratize it
    "sim_allpairs" -> ((s, dir) =>
      Similarity.allPairsCosine(s, dir, maxSample = 500)
        .orderBy("vec_a", "vec_b")),
    // in-plan ANN quality gate: recall@10 of the LSH and IVF rungs vs
    // brute-force ground truth, surfaced as exact integers so the
    // driver (not just a spec) checks ANN quality every round
    "sim_recall" -> ((s, dir) => Similarity.annRecall(s, dir)),
    // per-label centroid stats (order-independent integer accumulation)
    "emb_label_centroids" -> ((s, dir) => Similarity.labelCentroids(s, dir)),
    // per-dim mean/var/min/max in integral micros: the embedding drift
    // alarm and dead-dimension detector, |dims| rows at any scale
    "emb_dim_stats" -> ((s, dir) => Similarity.dimStats(s, dir)),
    // exact int8 Gram matrix (PCA/whitening step one): per-row upper
    // triangle expanded in-row, ONE dim^2-key hash agg whose map-side
    // partials make the shuffle constant in corpus size
    "emb_gram" -> ((s, dir) => Similarity.int8Gram(s, dir)),
    // dominant principal direction by power iteration over the Gram:
    // one corpus pass, then dim^2-row arithmetic per fixed step —
    // exact-integer milli iterates the oracle replays as chained CTEs
    "emb_pca_power" -> ((s, dir) => Similarity.pcaPower(s, dir)),
    // all-but-the-top audit: per-vector energy fraction along the
    // converged direction — one more corpus pass with the 64-row
    // direction and its norm riding as broadcasts
    "emb_abtt" -> ((s, dir) => Similarity.abttAudit(s, dir)),
    // batch-hard triplet mining: hardest positive + hardest negative per
    // strided anchor via one min/max-struct aggregation (no rank window)
    "emb_triplet_mining" -> ((s, dir) => Similarity.tripletMining(s, dir)),
    // JL Rademacher projection (64 -> 16) over the int8 codes with a
    // measured distortion audit on strided pairs — per-row integer
    // multiply-adds against a constant-folded sign matrix, no shuffle
    // before the bounded pair join
    "emb_jl_project" -> ((s, dir) => Similarity.jlProjectionAudit(s, dir)),
    // embedding health check: zero-vector detection + exact-integer
    // norm stats per label (cosine is undefined on zero norms)
    "emb_norm_audit" -> ((s, dir) => Similarity.normAudit(s, dir)),
    // SemDeDup: semantic dedup scoped to IVF cells — near-copies prune
    // WITHIN a coarse cluster only (quadratic in cell size, never in
    // corpus size); bit-identical vectors collapse to representatives
    // before pairing (the emb_exact_dups guard)
    "sim_semdedup" -> ((s, dir) => Similarity.semDedup(s, dir)),
    // cell-local kNN graph over representatives: each vector's k best
    // same-cell peers by exact cosine — the batch primitive clustering
    // and graph-based dedup consume
    "sim_knn_graph" -> ((s, dir) => Similarity.knnGraph(s, dir)),
    // recall-vs-nprobe S-curve from ONE candidate pass (prk fan-out),
    // gated against the exact brute-force truth — the IVF tuning table
    "sim_nprobe_sweep" -> ((s, dir) => Similarity.nprobeSweep(s, dir)),
    // epsilon calibration for semdedup: per-threshold pair and drop
    // counts from ONE pairing pass — bucketed histograms + a 10-row
    // grid, never a per-threshold corpus re-scan
    "sim_epsilon_sweep" -> ((s, dir) => Similarity.epsilonSweep(s, dir)),
    // quantizer load audit: per-cell counts/shares + 2x-fair-share hot
    // flag over the exact sim_ivf assignment
    "sim_ivf_balance" -> ((s, dir) => Similarity.ivfBalance(s, dir)),
    // label purity per quantizer cell — the coherence audit beside the
    // balance audit; a coin-flip cell makes cell-local ops untrustworthy
    "emb_cell_purity" -> ((s, dir) => Similarity.cellPurity(s, dir)),
    // membership audit closing the quantizer triad: vectors whose best
    // cell barely wants them (defective/novel inputs a retrain needs)
    "emb_ood_audit" -> ((s, dir) => Similarity.oodAudit(s, dir)),
    // product-quantization audit: sign-pattern codebooks (deterministic
    // one-step training), per-subspace reconstruction error — the
    // vector-compression rung beyond scalar int8 (sim_quantize)
    "sim_pq" -> ((s, dir) => Similarity.pqAudit(s, dir)),
    // the PQ SERVING path: per-query (subspace, code) lookup tables,
    // approximate dot = nSub table hits per corpus item — a compressed
    // linear scan with exact-integer replayable scores
    "sim_pq_ann" -> ((s, dir) => Similarity.pqAnn(s, dir)),
    // IVF-ADC: the production serving composition — stored posting
    // lists hold PQ CODES bucketed by cell (probe side exchange-free),
    // probed cells scored via the per-query broadcast LUT; probe AND
    // compressed scoring replayed end-to-end by the oracle
    "sim_ivf_pq" -> ((s, dir) => Similarity.ivfPqAnn(s, dir)),
    // —— multimodal columns ——
    "mm_meta" -> ((s, dir) => Multimodal.mediaMeta(s, dir)),
    "mm_frames" -> ((s, dir) => Multimodal.sampleFrames(s, dir)),
    // scene segmentation over the sampled frames: per-media bounded
    // windows (nFrames rows), payload projected to the frame byte
    // BEFORE the shuffle — the shot-detection stage of video curation
    "mm_scenes" -> ((s, dir) => Multimodal.sceneCuts(s, dir)),
    // stateless streaming twin: a media item's frames all live in its
    // one payload row, so the in-row array-HOF form needs no state
    // store and no shuffle — shares the batch oracle
    "stream_scenes" -> ((s, dir) => StreamingOps.streamScenes(s, dir)),
    // REAL codec round-trip: deterministic PNGs rendered per row, then
    // decoded back with javax.imageio; the oracle states what a correct
    // decode must recover (dims + exact milli luma) from id arithmetic
    "mm_decode" -> ((s, dir) => Multimodal.decodedImageFeatures(s, dir)),
    // 8x8 average perceptual hash through the real encode->decode chain
    // (patterned PNGs): per-row codec seam + 64 integer samples, no
    // shuffle; the oracle replays the generator arithmetic bit-for-bit
    "mm_phash" -> ((s, dir) => Multimodal.imageAHash(s, dir)),
    // image near-dup pairs: 4x16-bit banded hamming over the decoded
    // aHash (pigeonhole-complete at d<=3), hot chunks dropped, the
    // decode chain checkpointed once
    "mm_phash_pairs" -> ((s, dir) => Multimodal.aHashPairs(s, dir)),
    // those pairs resolved into components via the star contraction —
    // the whole-cluster view image keep/drop decisions need
    "mm_phash_clusters" -> ((s, dir) => Multimodal.aHashClusters(s, dir)),
    // the image curation funnel in one audit row (arrived -> paired ->
    // clusters -> dropped -> kept), composed from the same machinery
    "mm_media_funnel" -> ((s, dir) => Multimodal.mediaFunnel(s, dir)),
    "mm_features" -> ((s, dir) => Multimodal.featureSummary(s, dir)),
    // REAL audio codec round-trip: deterministic WAVs rendered per row,
    // decoded back with javax.sound.sampled; the oracle states what a
    // correct decode recovers (sample count, rate, |amplitude| stats)
    "mm_audio_decode" -> ((s, dir) => Multimodal.decodedAudioFeatures(s, dir)),
    // sign-of-delta frame-energy fingerprint off the real decode — the
    // 3-integer row ingest persists so matching never re-decodes
    "mm_audio_fingerprint" -> ((s, dir) => Multimodal.audioFingerprints(s, dir)),
    "mm_resize" -> ((s, dir) => Multimodal.resizePlan(s, dir)),
    // the resample EXECUTED: decode -> nearest-neighbor to the planned
    // box -> re-encode -> decode the OUTPUT; constant-fill sources make
    // the whole chain's measured result id-arithmetic for the oracle
    "mm_resize_exec" -> ((s, dir) => Multimodal.resizeExec(s, dir)),
    // —— document fingerprinting (winnowing) ——
    "text_winnow" -> ((s, dir) => Dedup.winnowFingerprints(s, dir)),
    // —— Structured Streaming twins, run to completion (AvailableNow) and
    //    hash-compared against the same batch-SQL oracles ——
    "stream_tumbling" -> ((s, dir) => StreamingOps.streamTumbling(s, dir)),
    // Append-mode twin: watermark-evicting, state-bounded — emits only
    // windows the final watermark (max event time - 2h) finalized
    "stream_tumbling_append" -> ((s, dir) => StreamingOps.streamTumblingAppend(s, dir)),
    // sliding-window streaming twin (1h window / 30min slide)
    "stream_sliding" -> ((s, dir) => StreamingOps.streamSliding(s, dir)),
    "stream_sessions" -> ((s, dir) => StreamingOps.streamSessions(s, dir)),
    // Append-mode sessionization: watermark-evicting, emits only
    // sessions whose end (last event + gap) the final watermark passed
    "stream_sessions_append" -> ((s, dir) => StreamingOps.streamSessionsAppend(s, dir)),
    "stream_tokens" -> ((s, dir) => StreamingOps.streamTokenCounts(s, dir)),
    "stream_running" -> ((s, dir) => StreamingOps.streamRunningTotals(s, dir)),
    "stream_dedup" -> ((s, dir) => StreamingOps.streamExactDedup(s, dir)),
    // the same dedup as an explicit flatMapGroupsWithState state machine
    "stream_dedup_custom" -> ((s, dir) => StreamingOps.streamExactDedupCustom(s, dir)),
    // watermark-BOUNDED ingest dedup: dropDuplicatesWithinWatermark
    // evicts key state one retention window behind the watermark — the
    // state-bounded production path (the unbounded form is its oracle twin)
    "stream_dedup_bounded" -> ((s, dir) => StreamingOps.streamExactDedupBounded(s, dir)),
    // ingest-time FUZZY dedup: per-row minhash sketch, stateful
    // suppression of sketch-identical docs (the strictest LSH rung)
    "stream_dedup_fuzzy" -> ((s, dir) => StreamingOps.streamMinhashDedup(s, dir)),
    // bounded fuzzy twin: same sketch key, watermark-evicted state
    "stream_dedup_fuzzy_bounded" -> ((s, dir) => StreamingOps.streamMinhashDedupBounded(s, dir)),
    // stream-STREAM interval join: purchases x views within 1h, both
    // sides watermarked + time-bounded so the join state is evictable
    "stream_join" -> ((s, dir) => StreamingOps.streamViewPurchaseJoin(s, dir)),
    // streaming funnel: per-user flatMapGroupsWithState depth machine,
    // O(k) state, rolled into the batch funnel's exact table
    "stream_funnel" -> ((s, dir) => StreamingOps.streamFunnel(s, dir)),
    // streaming Markov transitions: per-user O(1) last-event state,
    // emitted pairs collapse to the batch transition matrix
    "stream_transitions" -> ((s, dir) => StreamingOps.streamTransitions(s, dir)),
    // LEFT OUTER stream-stream join: unmatched purchases surface with
    // NULLs once the watermark proves no matching view can arrive
    "stream_join_outer" -> ((s, dir) => StreamingOps.streamViewPurchaseJoinOuter(s, dir)),
    // ingest-time decontamination: stream-static broadcast join of
    // arriving docs' shingles against the eval-set shingle table
    "stream_decontaminate" -> ((s, dir) => StreamingOps.streamDecontaminate(s, dir)),
    // the streaming half of the daily-crawl cycle: arrivals sketch
    // per-row and probe the PERSISTED band index stream-static —
    // completely stateless (no watermark, no state store)
    "stream_dedup_incremental" -> ((s, dir) =>
      StreamingOps.streamIncrementalDedup(s, dir)),

    // BPE first-merge scoring: distinct-word compression -> weighted
    // adjacent-pair counts -> top-k (one tokenizer-training iteration)
    "vocab_bpe_pairs" -> ((s, dir) => TextAnalysis.bpePairCounts(s, dir)),
    // FULL BPE training loop: 3 greedy merge rounds over the
    // distinct-word table — pair-count aggregate, arg-max winner,
    // left-to-right non-overlapping merge fold per round
    "vocab_bpe_train" -> ((s, dir) => TextAnalysis.bpeTrain(s, dir)),
    // APPLY the trained tokenizer: learned merges fold in as plan
    // literals — zero-shuffle narrow encode pass over the corpus
    "vocab_bpe_encode" -> ((s, dir) => TextAnalysis.bpeEncode(s, dir)),
    // per-language tokenizer fertility under the trained vocab: the
    // table that decides multilingual vocab rebalancing
    "vocab_fertility" -> ((s, dir) => TextAnalysis.bpeFertility(s, dir)),
    // corpus-LM fluency score: exact-rational mean bigram conditional
    // (the n-gram perplexity stand-in; big-to-big join on the bigram key)
    "text_lm_score" -> ((s, dir) => TextAnalysis.lmScore(s, dir)),
    // held-out LM eval: train on %10!=0, score the rest with add-one
    // smoothing — unseen bigrams get the floor, coverage surfaced
    "text_lm_holdout" -> ((s, dir) => TextAnalysis.lmHoldout(s, dir)),
    // interpolated Kneser-Ney (d=1, exact-integer): discounted ML +
    // continuation-diversity mass — smoothing stats live on the
    // |types| table, scoring is the same one big-to-big join
    "text_lm_kn" -> ((s, dir) => TextAnalysis.kneserNeyScore(s, dir)),

    // —— corpus management: source merge + training-shard packing ——
    "pipeline_priority_merge" -> ((s, dir) => Corpus.priorityMerge(s, dir)),
    // deterministic mix sampler: stable hash coin per doc vs per-source
    // quota; output is the configured-vs-achieved audit report
    "pipeline_mix_sample" -> ((s, dir) => Corpus.mixSample(s, dir)),
    // stateless ingest-time sampling: same decisions as the batch form
    "stream_mix_sample" -> ((s, dir) => StreamingOps.streamMixSample(s, dir)),
    // stateless ingest-time redaction / classifier scoring: per-row
    // micro-batch maps with NO state store — same plans as the batch
    // forms, so they share the batch oracles
    "stream_scrub" -> ((s, dir) => StreamingOps.streamScrub(s, dir)),
    "stream_pii" -> ((s, dir) => StreamingOps.streamPii(s, dir)),
    // ingest-time canonical-host monitor: stateless per-row URL rules,
    // Complete-mode rollup bounded by |hosts|
    "stream_urlcount_canonical" -> ((s, dir) => StreamingOps.streamCanonicalHosts(s, dir)),
    // ingest-time cardinality monitor: one fixed-size HLL sketch per
    // source in the Complete-mode state, batch-gated vs exact distinct
    "stream_sketch_profile" -> ((s, dir) => StreamingOps.streamSketchProfile(s, dir)),
    // ingest-time quality-aware dedup: the bestRep argmax accumulator
    // as Complete-mode streaming state — a later better variant
    // replaces the kept one, which first-wins dedup cannot do
    "stream_best_rep" -> ((s, dir) => StreamingOps.streamBestRep(s, dir)),
    // streaming fold-in to the persisted profile store (foreachBatch +
    // appendBucketed); audit gates the stored union vs exact
    "stream_profile_fold" -> ((s, dir) => StreamingOps.streamProfileFold(s, dir)),
    // ingest-time span-dup probe vs the historical window store:
    // array_distinct before explode (stateless), bucketed probe join
    "stream_substring" -> ((s, dir) => StreamingOps.streamSubstringProbe(s, dir)),
    "stream_classifier" -> ((s, dir) => StreamingOps.streamClassifier(s, dir)),
    // ingest-time embedding-space leak gate: bounded eval vectors
    // unrolled into one stateless projection per arrival
    "stream_decontaminate_semantic" ->
      ((s, dir) => StreamingOps.streamSemanticDecontaminate(s, dir)),
    // ingest-time DSIR scoring: batch-derived ratio dimension shipped as
    // a map literal — stateless narrow fold, no stream-side join/shuffle
    "stream_dsir" -> ((s, dir) => StreamingOps.streamDsir(s, dir)),
    // per-arrival seasonal anomaly flag vs the broadcast hour-of-day
    // baseline: stateless stream-static join, Append
    "stream_seasonal" -> ((s, dir) => StreamingOps.streamSeasonal(s, dir)),
    // ingest-time BPE tokenization: trained merges as plan literals —
    // the broadcast-tokenizer serving shape, stateless append
    "stream_bpe_encode" -> ((s, dir) => StreamingOps.streamBpeEncode(s, dir)),
    // BM25 percolation: stored queries as unrolled literal scorers,
    // arriving docs match statelessly (Elasticsearch percolator shape)
    "stream_bm25" -> ((s, dir) => StreamingOps.streamBm25(s, dir)),
    // ingest-time distilled-quality scoring: batch-fitted rational
    // coefficients as decimal literals — stateless narrow projection
    "stream_distill" -> ((s, dir) => StreamingOps.streamDistill(s, dir)),
    // windowed hot-key monitor: CHAINED stateful aggs (counts -> bounded
    // top-k via window_time re-aggregation), O(k)-state per window
    "stream_hot_users" -> ((s, dir) => StreamingOps.streamHotUsers(s, dir)),
    // stateful per-source admission control: O(1) counter state admits
    // the first k arrivals per source in flight
    "stream_source_cap" -> ((s, dir) => StreamingOps.streamSourceCap(s, dir)),
    // ingest-time weighted sampling: O(k) evicting winner state per
    // source, bounded heap fold per batch (never a full-group buffer)
    "stream_sample_weighted" -> ((s, dir) => StreamingOps.streamWeightedSample(s, dir)),
    // perceptual hashing at ingest: stateless per-row codec map, the
    // append-only feed for the banded image-dedup index
    "stream_phash" -> ((s, dir) => StreamingOps.streamImageAHash(s, dir)),
    // the cascade live: per-row verdicts, bounded (source, verdict)
    // rollup — shares the batch cascade's oracle
    "stream_cascade" -> ((s, dir) => StreamingOps.streamCascade(s, dir)),
    // temperature-based (alpha=0.5) mixture weights: head sources
    // shrink, tail sources grow; integer ppm math after one aggregate
    "pipeline_mix_temperature" -> ((s, dir) => Corpus.temperatureMix(s, dir)),
    // per-source contribution cap via the bounded top-k aggregate: k
    // rows per source cross the shuffle, no per-source sort anywhere
    "pipeline_source_cap" -> ((s, dir) => Corpus.sourceCap(s, dir)),
    // weighted bottom-k priority sampling per source (integer u div w
    // priorities from the shared md5 family): the same bounded top-k
    // aggregate — k rows per source cross the shuffle, reproducible draw
    "sample_weighted" -> ((s, dir) => Corpus.weightedSample(s, dir)),
    // DSIR importance-resampling weights: one fused stats pass ->
    // <= 1024-row ratio table broadcast back -> shuffle-free scoring
    "mix_dsir" -> ((s, dir) => Corpus.dsirWeights(s, dir)),
    // CCNet fluency terciles: edges from the bounded (lang, lm_milli)
    // histogram — shuffles the histogram, never sorts the corpus
    "mix_ccnet" -> ((s, dir) => Corpus.ccnetBuckets(s, dir)),
    // epoch-annealed mixing schedule: uniform -> quality-proportional
    // source weights, all-integer interpolation over the lm-score means
    "mix_curriculum" -> ((s, dir) => Corpus.curriculumMix(s, dir)),
    // teacher->student quality distillation: one exact-integer
    // normal-equations pass fits a linear student of the bigram-LM
    // teacher; clamp-then-divide serving + train/holdout MAE audit
    "mix_distill" -> ((s, dir) => Corpus.distillFit(s, dir)),
    "shard_plan" -> ((s, dir) => Corpus.shardPlan(s, dir)),
    // deterministic per-epoch training-order shuffle: seeded-hash
    // permutation, contiguous hash-range shards, per-shard windows only
    "corpus_shuffle" -> ((s, dir) => Corpus.epochShuffle(s, dir)),
    // padding-waste table across batching schemes: global cap vs
    // round-to-256 vs round-to-64 length buckets
    "corpus_padding_audit" -> ((s, dir) => Corpus.paddingAudit(s, dir)),
    // concat-and-chunk packing into 2048-token windows over the
    // epoch-0 shuffle order: per-shard prefix sums, never a global sort
    "corpus_pack" -> ((s, dir) => Corpus.packPlan(s, dir)),
    // snapshot-over-snapshot incremental-ingest diff: per-source
    // added/removed/changed/unchanged via one full-outer join on doc_id
    "corpus_snapshot_diff" -> ((s, dir) => Corpus.snapshotDiff(s, dir)),
    // term-level drift movers between snapshots: add-one smoothed
    // lift in DECIMAL/HUGEINT, support floor, TakeOrdered top-k
    "corpus_term_drift" -> ((s, dir) => Corpus.termDrift(s, dir)),
    // token-budget allocator: temperature weights over token counts,
    // epoch-capped, DECIMAL(38,0) wide product — shortfall per source
    "mix_token_budget" -> ((s, dir) => Corpus.tokenBudget(s, dir)),
    // discrete-epoch allocation under geometric repeat decay: greedy
    // marginal take over the bounded |sources| x maxEpochs candidate
    // table; chained integer decay keeps values BIGINT-safe forever
    "mix_epoch_repeat" -> ((s, dir) => Corpus.epochRepeatPlan(s, dir)),
    // Poisson-bootstrap CI for the mean doc length: B deterministic
    // hash-weighted replicates + the exact point estimate on ONE pass,
    // quantile band over the B-row replicate table
    "corpus_bootstrap" -> ((s, dir) => Corpus.bootstrapMeanLength(s, dir)),
    // chi-square lang x source independence audit: one agg to the
    // bounded cell table, DECIMAL(38,0) products, windows over cells
    "corpus_chi2" -> ((s, dir) => Corpus.langSourceChi2(s, dir)),
    // n-gram novelty between snapshots: per-side distinct on (n, hash)
    // keys (grams never shuffle as strings), one anti-join per the
    // shared key, |ns|-row rollup
    "corpus_ngram_novelty" -> ((s, dir) => Corpus.ngramNovelty(s, dir)),
    // —— explicit skew-mitigation shapes (result-identical to the plain
    //    forms; the PLAN is what differs — see each operator's doc) ——
    "urlcount_salted" -> ((s, dir) =>
      UrlCount.saltedTokenCounts(table(s, dir, "documents"), "text", "doc_id")),
    // Zipf audit: two-level rollup, corpus-sized shuffle exactly once
    "urlcount_zipf" -> ((s, dir) =>
      UrlCount.freqOfFreqs(table(s, dir, "documents"), "text")),
    // count-min-sketch heavy hitters, gated in-plan vs exact counts
    // (the frequency member of the sketch family, like the HLL/GK gates)
    "urlcount_cms" -> ((s, dir) =>
      UrlCount.cmsHeavyHitters(table(s, dir, "documents"), "text")),
    // URL canonicalization (scheme/www/tracking-param rules) + host
    // rollup — the cleaning rung a crawl's URL list runs before counting
    "urlcount_canonical" -> ((s, dir) => UrlCount.canonicalHosts(s, dir)),
    "ev_distinct_users" -> ((s, dir) => EventWindows.distinctUsersPerType(s, dir)),

    // —— SQL surface: the custom expression/aggregate toolkit invoked
    //    from spark.sql via GraftExtensions (winnow fingerprints and the
    //    minhash sketch aggregate run as pure SQL; results match the
    //    Column-API twins' oracles) ——
    "sql_winnow" -> ((s, dir) => {
      GraftExtensions.register(s)
      // widen the view's base when the scan plans narrow (round 17):
      // the per-gram md5 fuses into the scan stage; the SQL text —
      // the surface under test — is unchanged, as are the results
      // (DISTINCT + total ORDER BY)
      graft.Rebalance.cpuSpreadIfNarrow(table(s, dir, "documents"),
        graft.Rebalance.hashDenseTargetBytes, // md5/gram: the dense class
        org.apache.spark.sql.functions.col("doc_id"))
        .createOrReplaceTempView("graft_documents")
      s.sql(
        """SELECT DISTINCT doc_id, fp FROM (
          |  SELECT doc_id,
          |    explode(graft_winnow_fps(
          |      lower(regexp_replace(trim(text), '\\s+', ' ')), 8, 4)) AS fp
          |  FROM graft_documents)
          |ORDER BY doc_id, fp""".stripMargin)
    }),
    "sql_minhash" -> ((s, dir) => {
      GraftExtensions.register(s)
      table(s, dir, "documents").createOrReplaceTempView("graft_documents")
      s.sql(
        """SELECT doc_id, element_at(graft_minhash_sketch(shingle, 4), 1) AS mh0
          |FROM (SELECT doc_id, explode(graft_word_shingles(text)) AS shingle
          |      FROM graft_documents)
          |GROUP BY doc_id
          |ORDER BY doc_id""".stripMargin)
    }),
    // the token-count HOF idiom written in pure SQL: TokenCountRewrite
    // (session-wide via GraftExtensions) turns BOTH size(filter(split))
    // occurrences into the native codegen'd token_count — PlanRewriteSpec
    // pins the rewrite fires from this exact SQL text; shares text_stats'
    // Column-API oracle
    "sql_tokencount" -> ((s, dir) => {
      GraftExtensions.register(s)
      table(s, dir, "documents").createOrReplaceTempView("graft_documents")
      s.sql(
        """SELECT doc_id,
          |  CAST(length(text) AS BIGINT) AS n_chars,
          |  CAST(size(filter(split(text, '\\s+'), t -> length(t) > 0)) AS BIGINT) AS n_tokens,
          |  CAST(size(filter(split(text, '[^a-zA-Z0-9]+'), t -> length(t) > 0)) AS BIGINT)
          |    + CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '')) AS BIGINT) AS n_subwords
          |FROM graft_documents ORDER BY doc_id""".stripMargin)
    }),
    // —— determinism-contract fuzz (VERDICT r12 #7): adversarial values
    // (negative nanos/moneys, near-edge BIGINTs, near-overflow decimals)
    // generated in-plan identically in both engines; the standing DuckDB
    // gate hash-compares every contract rule in isolation ——
    "contract_fuzz_rows" -> ((s, _) => Contract.fuzzRows(s)),
    "contract_fuzz_sums" -> ((s, _) => Contract.fuzzSums(s)),
    // count-min-sketch heavy hitters from pure SQL: the stock
    // count_min_sketch aggregate probed by the custom graft_cms_estimate
    // expression, gated in-plan exactly like the Column-API twin
    // (urlcount_cms), whose oracle it shares
    "sql_cms" -> ((s, dir) => {
      GraftExtensions.register(s)
      table(s, dir, "documents").createOrReplaceTempView("graft_documents")
      s.sql(
        """WITH toks AS (
          |  SELECT token
          |  FROM (SELECT explode(split(text, ' ')) AS token FROM graft_documents)
          |  WHERE length(token) > 0),
          |sk AS (SELECT count_min_sketch(token, 0.0001d, 0.99d, 42) AS cms FROM toks),
          |top AS (
          |  SELECT token, CAST(count(*) AS BIGINT) AS cnt
          |  FROM toks GROUP BY token
          |  ORDER BY cnt DESC, token ASC LIMIT 5)
          |SELECT t.token, t.cnt,
          |  abs(graft_cms_estimate(s.cms, t.token) - t.cnt) <= t.cnt * 0.05
          |    AS within_tolerance
          |FROM top t CROSS JOIN sk s
          |ORDER BY t.token""".stripMargin)
    }),
    // the native dot-product expression from pure SQL (graft_dot):
    // brute-force cosine top-k written as SQL text — same relation as
    // sim_bruteforce, whose oracle it shares
    "sql_cosine" -> ((s, dir) => {
      GraftExtensions.register(s)
      table(s, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
      s.sql(
        """WITH emb AS (
          |  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          |  FROM graft_embeddings),
          |q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 50 = 0
          |     ORDER BY vec_id LIMIT 4096),
          |scored AS (
          |  SELECT q.q_id, e.vec_id AS n_id,
          |    CAST(floor(graft_dot(q.qv, e.v) /
          |      (sqrt(graft_dot(q.qv, q.qv)) * sqrt(graft_dot(e.v, e.v))) * 1000)
          |      AS BIGINT) AS cos_milli
          |  FROM emb e CROSS JOIN q WHERE e.vec_id != q.q_id),
          |ranked AS (
          |  SELECT q_id, n_id, cos_milli,
          |    row_number() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, n_id ASC) AS rk
          |  FROM scored)
          |SELECT q_id, CAST(rk AS BIGINT) AS rk, n_id, cos_milli
          |FROM ranked WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin)
    }),
    // the custom top-k aggregate from pure SQL (graft_top_k), exploded
    // back to ranked rows — same relation as both daily-top twins
    "sql_topk" -> ((s, dir) => {
      GraftExtensions.register(s)
      table(s, dir, "events").createOrReplaceTempView("graft_events")
      s.sql(
        """WITH d AS (
          |  SELECT ((ts div 1000000000) div 86400) * 86400 AS day, event_type,
          |    CAST(count(*) AS BIGINT) AS n
          |  FROM graft_events GROUP BY 1, 2),
          |t AS (SELECT day, graft_top_k(n, event_type, 3) AS top FROM d GROUP BY day)
          |SELECT day, col.tag AS event_type, col.n AS n, CAST(pos + 1 AS BIGINT) AS rk
          |FROM t LATERAL VIEW posexplode(top) x AS pos, col
          |ORDER BY day, rk""".stripMargin)
    })
  )

  // Shared oracle fragments -------------------------------------------------

  /** Quality-aware exact-dedup survivor (Dedup.bestRepFrame): shared by
    * the batch query and its Complete-mode streaming twin, which
    * produce the identical relation over the same files. */
  private val bestRepOracle: String =
    """WITH q AS (
      |  SELECT doc_id,
      |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_key,
      |    length(text)::BIGINT AS n_chars_raw,
      |    CASE WHEN len(toks) >= 10 AND len(toks) <= 100000
      |      AND len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','on'))) * 100 >= len(toks)
      |      THEN 1 ELSE 0 END::BIGINT AS q_keep
      |  FROM (SELECT doc_id, text,
      |          list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
      |        FROM documents)),
      |g AS (
      |  SELECT content_key, count(*)::BIGINT AS n_copies,
      |    min(doc_id)::BIGINT AS min_doc_id
      |  FROM q GROUP BY content_key),
      |sel AS (
      |  SELECT content_key, doc_id, q_keep, n_chars_raw,
      |    row_number() OVER (PARTITION BY content_key
      |      ORDER BY q_keep DESC, n_chars_raw DESC, doc_id ASC) AS rk
      |  FROM q)
      |SELECT s.content_key, s.doc_id::BIGINT AS keep_doc_id, g.n_copies,
      |  s.q_keep AS kept_q_keep, s.n_chars_raw AS kept_n_chars,
      |  g.min_doc_id, (s.doc_id <> g.min_doc_id) AS diverges_from_min_id
      |FROM sel s JOIN g USING (content_key)
      |WHERE s.rk = 1
      |ORDER BY keep_doc_id""".stripMargin

  /** Non-empty space-separated tokens of lowercased documents.text
    * (mirror of Dedup.shingles' case normalization). */
  private val docToks =
    """SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
      |FROM documents""".stripMargin

  /** Distinct 3-word shingles per doc (mirror of Dedup.shingles(n=3)). */
  private val docShingles =
    s"""toks AS ($docToks),
       |sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+3], ' ') AS shingle
       |  FROM toks, UNNEST(range(0, len(toks) - 2)) AS u(i)
       |  WHERE len(toks) >= 3)""".stripMargin

  /** Exact-content representative collapse (mirror of Dedup.exactDupMap /
    * representatives — the identical-content hot-bucket guard): CTEs
    * `repmap` (doc_id, content_key) and `reps` (content_key, rep_id,
    * n_copies).
    */
  private val repMapCte =
    """repmap AS (
      |  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_key
      |  FROM documents),
      |reps AS (
      |  SELECT content_key, min(doc_id) AS rep_id, count(*)::BIGINT AS n_copies
      |  FROM repmap GROUP BY content_key)""".stripMargin

  /** docShingles restricted to exact-content representatives — what the
    * fuzzy rungs band over (mirror of shingles(representatives(docs))).
    */
  private val repDocShingles =
    s"""$repMapCte,
       |toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
       |  FROM documents
       |  WHERE doc_id IN (SELECT rep_id FROM reps)),
       |sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+3], ' ') AS shingle
       |  FROM toks, UNNEST(range(0, len(toks) - 2)) AS u(i)
       |  WHERE len(toks) >= 3)""".stripMargin

  /** 60-bit md5-derived integer hash (mirror of OracleHash.h60). */
  private def h60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** The hybrid retrieval oracle's shared head: BM25 corpus stats, the
    * ABSOLUTE-size anchor workload, the query-by-document lexical ranks
    * (self-match excluded), and the `emb` base relation — everything
    * except the semantic ranking, which differs between the exact form
    * (text_hybrid_rrf: brute-force scan) and the IVF-probed form
    * (text_hybrid_rrf_ann).
    */
  private lazy val hybridLexCtes: String =
    s"""$bm25CorpusCtes,
       |anchors AS (
       |  SELECT doc_id FROM documents WHERE doc_id % 50 = 0
       |  ORDER BY doc_id LIMIT 100),
       |q0 AS (
       |  SELECT d.doc_id::BIGINT AS query_id,
       |    unnest(list_distinct(list_filter(string_split(lower(d.text), ' '),
       |      t -> length(t) > 0))) AS term
       |  FROM documents d JOIN anchors a ON d.doc_id = a.doc_id),
       |q AS (
       |  SELECT query_id, term FROM (
       |    SELECT q0.query_id, q0.term,
       |      row_number() OVER (PARTITION BY q0.query_id
       |                         ORDER BY df.df ASC, q0.term ASC) AS trk
       |    FROM q0 JOIN df USING (term))
       |  WHERE trk <= ${graft.ops.TextAnalysis.hybridMaxQueryTerms}),
       |sc AS (
       |  SELECT q.query_id, tf.doc_id,
       |    sum((((2*n_docs - 2*df + 1) * 1000) // (2*df + 1))
       |        * ((22000 * tf * tot) // (10*tot*tf + 3*tot + 9*dl*n_docs)))::BIGINT
       |      AS score_micro
       |  FROM q JOIN tf USING (term) JOIN df USING (term)
       |    JOIN dl USING (doc_id) CROSS JOIN st
       |  WHERE tf.doc_id <> q.query_id
       |  GROUP BY 1, 2),
       |lex AS (
       |  SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY score_micro DESC, doc_id::VARCHAR ASC) AS rk_lex
       |  FROM sc QUALIFY rk_lex <= 20),
       |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)""".stripMargin

  /** The hybrid retrieval oracle's shared tail: the integer RRF fuse of
    * the `lex` and `sem` rank lists and the final per-anchor top-10.
    */
  private val hybridFuseTail: String =
    """fused AS (
      |  SELECT coalesce(l.query_id, s.query_id) AS query_id,
      |    coalesce(l.doc_id, s.doc_id) AS doc_id,
      |    (coalesce(1000000 // (60 + l.rk_lex), 0)
      |     + coalesce(1000000 // (60 + s.rk_sem), 0))::BIGINT AS rrf_micro
      |  FROM lex l FULL OUTER JOIN sem s
      |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
      |ranked AS (
      |  SELECT query_id, doc_id, rrf_micro,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY rrf_micro DESC, doc_id ASC)::BIGINT AS rk
      |  FROM fused)
      |SELECT query_id, doc_id, rrf_micro, rk
      |FROM ranked WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  /** Jaccard near-dup pairs over exact-content representatives (mirror
    * of Dedup.ngramJaccardPairs; final CTE `jp` = (doc_a, doc_b,
    * jaccard_milli)). Shared by the pair rung itself (dedup_jaccard)
    * and the fuzzy cross-split audit (split_leakage_fuzzy).
    */
  private lazy val jaccardPairsCtes: String =
    s"""$repDocShingles,
       |sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
       |dfreq AS (SELECT shingle, count(*)::BIGINT AS df FROM sh GROUP BY shingle),
       |rare AS (
       |  SELECT s.doc_id, s.shingle
       |  FROM sh s JOIN dfreq d ON s.shingle = d.shingle
       |  WHERE d.df <= 50),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS n_inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY c.doc_a, c.doc_b),
       |jp AS (
       |  SELECT i.doc_a, i.doc_b,
       |    floor(i.n_inter * 1000.0 / (za.sz + zb.sz - i.n_inter))::BIGINT AS jaccard_milli
       |  FROM inter i
       |  JOIN sizes za ON za.doc_id = i.doc_a
       |  JOIN sizes zb ON zb.doc_id = i.doc_b
       |  WHERE floor(i.n_inter * 1000.0 / (za.sz + zb.sz - i.n_inter)) >= 300)""".stripMargin

  /** Winnowing (k=8, w=4) oracle: gram hashes over the normalized text,
    * then per-position window minima, restricted to FULL windows
    * (i <= n_grams - (w-1)), distinct per doc. Shared by the Column-API
    * query (text_winnow) and its SQL-surface twin (sql_winnow) — same
    * relation by construction.
    */
  private lazy val winnowOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, i, ${h60("substr(norm, i::INT, 8)")} AS h,
       |         length(norm) - 7 AS n_grams
       |  FROM d, UNNEST(range(1, length(norm) - 6)) AS u(i)
       |  WHERE length(norm) >= 11),
       |w AS (
       |  SELECT doc_id, i, n_grams,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY i
       |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
       |  FROM g)
       |SELECT DISTINCT doc_id, fp FROM w
       |WHERE i <= n_grams - 3
       |ORDER BY doc_id, fp""".stripMargin

  /** One per-n block of the n-gram dup sweep: distinct-doc window
    * counts -> occurrence totals, dup = windows seen in >= 2 docs. */
  private def ngramSweepBlock(n: Int): String =
    s"""SELECT ${n}::BIGINT AS n, sum(c)::BIGINT AS n_windows,
       |  sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::BIGINT AS n_dup_windows
       |FROM (
       |  SELECT w, count(*)::BIGINT AS c FROM (
       |    SELECT DISTINCT doc_id,
       |      ${h60(s"array_to_string(toks[i+1:i+$n], ' ')")} AS w
       |    FROM toks, UNNEST(range(0, len(toks) - ${n - 1})) AS u(i)
       |    WHERE len(toks) >= ${n}) s
       |  GROUP BY w) t""".stripMargin

  /** One per-w block of the winnow density audit: per-doc distinct
    * fingerprint counts from the same gram CTE, full windows only. */
  private def winnowAuditBlock(w: Int): String =
    s"""SELECT ${w}::BIGINT AS w, doc_id, any_value(n_grams) AS n_grams,
       |  count(DISTINCT fp)::BIGINT AS n_fps
       |FROM (
       |  SELECT doc_id, i, n_grams,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY i
       |                 ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
       |  FROM g WHERE n_grams >= ${w}) t
       |WHERE i <= n_grams - ${w - 1}
       |GROUP BY doc_id""".stripMargin

  /** One side of the incremental-dedup oracle (suffix o = existing
    * corpus, n = new batch): documents under `pred` -> exact-content
    * representatives (skipped when collapse=false — the streaming probe
    * side, where every ARRIVAL probes) -> 3-shingles -> 16-slot minhash
    * -> band keys with the self-describing `band|run` prefix (mirror of
    * Dedup.bandKeys).
    */
  private def incSideCtes(sfx: String, pred: String,
                          collapse: Boolean = true): String = {
    val repCte = if (collapse)
      s"""rep_$sfx AS (
         |  SELECT min(doc_id) AS doc_id
         |  FROM (SELECT doc_id,
         |          md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS ck
         |        FROM d_$sfx)
         |  GROUP BY ck),
         |""".stripMargin
    else ""
    val repFilter = if (collapse) s" WHERE doc_id IN (SELECT doc_id FROM rep_$sfx)" else ""
    s"""d_$sfx AS (SELECT doc_id, text FROM documents WHERE $pred),
       |${repCte}toks_$sfx AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
       |  FROM d_$sfx$repFilter),
       |sh_$sfx AS (
       |  SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+3], ' ') AS shingle
       |  FROM toks_$sfx, UNNEST(range(0, len(toks) - 2)) AS u(i)
       |  WHERE len(toks) >= 3),
       |sig_$sfx AS (
       |  SELECT doc_id, i, min(${h60("i || ':' || shingle")}) AS mh
       |  FROM sh_$sfx, UNNEST(range(0, 16)) AS u(i)
       |  GROUP BY doc_id, i),
       |band_$sfx AS (
       |  SELECT doc_id,
       |    (i // $lshR)::VARCHAR || '|' || string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
       |  FROM sig_$sfx GROUP BY doc_id, (i // $lshR))""".stripMargin
  }

  /** IVF probe replay (mirror of Similarity.ivfAnn AND ivfIndexed —
    * the indexed variant persists the identical assignment, so one
    * oracle serves both): strided centroids, argmax-cosine cell
    * assignment, nprobe=2 probing, exact re-rank, orderings made total
    * by the (cos desc, id asc) tie-break everywhere.
    */
  /** One Lloyd round as CTEs (mirror of Similarity.ivfAnnKMeans's loop
    * body): given cent{k}(c_id, cv), assign every vector to its argmax
    * cosMilli cell (ties to the smallest c_id), then cent{k+1} is the
    * per-cell elementwise mean in EXACT integer micros — floor(x*1e6)
    * per component, summed in HUGEINT, explicit floor division by the
    * cell count, back to DOUBLE as one IEEE division. Every step
    * matches the Spark loop op-for-op, so the learned centroids are
    * bit-identical across engines.
    */
  private def kmeansRound(k: Int): String =
    s"""sc$k AS (
       |  SELECT e.vec_id, e.v, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
       |  FROM emb e CROSS JOIN cent$k c),
       |asg$k AS (
       |  SELECT v, c_id AS cell FROM (
       |    SELECT vec_id, v, c_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
       |    FROM sc$k) WHERE ark = 1),
       |dim$k AS (
       |  SELECT cell, i,
       |    sum(CAST(floor(v[i+1] * 1000000) AS HUGEINT)) AS sm,
       |    count(*)::HUGEINT AS n
       |  FROM asg$k, UNNEST(range(0, len(v))) AS u$k(i)
       |  GROUP BY cell, i),
       |cent${k + 1} AS (
       |  SELECT cell AS c_id,
       |    array_agg(((sm - (((sm % n) + n) % n)) // n)::DOUBLE / 1000000.0
       |              ORDER BY i) AS cv
       |  FROM dim$k GROUP BY cell)""".stripMargin

  /** sim_ivf_kmeans replay: two chained Lloyd rounds (the strided seeds
    * refined twice), then the standard IVF assign/probe/re-rank tail
    * over the TRAINED centroids — the ivfOracle tail with cent := cent2.
    */
  private lazy val kmeansOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent0 AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
       |${kmeansRound(0)},
       |${kmeansRound(1)},
       |scored AS (
       |  SELECT e.vec_id, e.v, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
       |  FROM emb e CROSS JOIN cent2 c),
       |assigned AS (
       |  SELECT vec_id, v, c_id AS cell FROM (
       |    SELECT vec_id, v, c_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
       |    FROM scored) WHERE ark = 1),
       |probes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT vec_id AS q_id, c_id AS cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS prk
       |    FROM scored WHERE vec_id % 50 = 0) WHERE prk <= 2),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 50 = 0),
       |cand AS (
       |  SELECT DISTINCT p.q_id, a.vec_id AS n_id, ${cosMilli("q.qv", "a.v")} AS cos_milli
       |  FROM probes p JOIN q USING (q_id) JOIN assigned a ON a.cell = p.cell
       |  WHERE a.vec_id != p.q_id),
       |ranked AS (
       |  SELECT q_id, n_id, cos_milli,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, n_id ASC) AS rk
       |  FROM cand)
       |SELECT q_id, rk, n_id, cos_milli FROM ranked WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  private lazy val ivfOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
       |scored AS (
       |  SELECT e.vec_id, e.v, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
       |  FROM emb e CROSS JOIN cent c),
       |assigned AS (
       |  SELECT vec_id, v, c_id AS cell FROM (
       |    SELECT vec_id, v, c_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
       |    FROM scored) WHERE ark = 1),
       |probes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT vec_id AS q_id, c_id AS cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS prk
       |    FROM scored WHERE vec_id % 50 = 0) WHERE prk <= 2),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 50 = 0),
       |cand AS (
       |  SELECT DISTINCT p.q_id, a.vec_id AS n_id, ${cosMilli("q.qv", "a.v")} AS cos_milli
       |  FROM probes p JOIN q USING (q_id) JOIN assigned a ON a.cell = p.cell
       |  WHERE a.vec_id != p.q_id),
       |ranked AS (
       |  SELECT q_id, n_id, cos_milli,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, n_id ASC) AS rk
       |  FROM cand)
       |SELECT q_id, rk, n_id, cos_milli FROM ranked WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  /** One BPE training round as CTEs (mirror of TextAnalysis.bpeTrain's
    * loop body): given words{k}(word, freq, syms), derive the arg-max
    * pair win{k} and the merged table words{k+1}. The greedy
    * left-to-right non-overlapping application is window math: merge
    * CANDIDATES at consecutive positions only exist for self-pairs
    * (pl = pr over a run of identical symbols), and within each such
    * run every other candidate applies (k2 % 2 = 1 after the
    * run-grouping rank); positions consumed as the right half of an
    * applied merge (b.i join) drop out of the rebuild.
    */
  private def bpeRound(k: Int): String =
    s"""pr$k AS (
       |  SELECT syms[i+1] AS pl, syms[i+2] AS pr, sum(freq)::BIGINT AS cnt
       |  FROM words$k, UNNEST(range(0, len(syms) - 1)) AS u(i)
       |  WHERE len(syms) >= 2 GROUP BY 1, 2),
       |win$k AS (SELECT pl, pr, cnt FROM pr$k ORDER BY cnt DESC, pl ASC, pr ASC LIMIT 1),
       |ex$k AS (
       |  SELECT word, freq, i, syms[i+1] AS s
       |  FROM words$k, UNNEST(range(0, len(syms))) AS u(i)),
       |cand$k AS (
       |  SELECT e.word, e.i FROM ex$k e
       |  JOIN ex$k f ON f.word = e.word AND f.i = e.i + 1
       |  JOIN win$k w ON e.s = w.pl AND f.s = w.pr),
       |app$k AS (
       |  SELECT word, i FROM (
       |    SELECT word, i, row_number() OVER (PARTITION BY word, i - rn ORDER BY i) AS k2
       |    FROM (SELECT word, i, row_number() OVER (PARTITION BY word ORDER BY i) AS rn
       |          FROM cand$k)) WHERE k2 % 2 = 1),
       |words${k + 1} AS (
       |  SELECT e.word, e.freq,
       |    array_agg(CASE WHEN a.i IS NOT NULL THEN w.pl || w.pr ELSE e.s END
       |              ORDER BY e.i) AS syms
       |  FROM ex$k e CROSS JOIN win$k w
       |  LEFT JOIN app$k a ON a.word = e.word AND a.i = e.i
       |  LEFT JOIN app$k b ON b.word = e.word AND b.i = e.i - 1
       |  WHERE b.i IS NULL
       |  GROUP BY e.word, e.freq)""".stripMargin

  /** BM25 score CTEs (mirror of TextAnalysis.bm25TopK's integral
    * Robertson scoring; the `sc` relation is per-(query, doc) scores
    * over docs matching >= 1 query term). Shared by the batch top-k
    * retrieval (text_bm25) and the stateless percolation twin
    * (stream_bm25) — identical scoring by construction (the twin
    * unrolls the same formula over batch-collected artifacts;
    * TextAnalysisSpec pins the hand-computed values).
    */
  /** The corpus half of the BM25 oracle — inverted-index statistics
    * shared by every BM25 replay regardless of where its query workload
    * comes from (corpus-derived workload for text_bm25/stream_bm25; the anchor
    * documents' own terms for text_hybrid_rrf).
    */
  private lazy val bm25CorpusCtes: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(lower(text), ' '), t -> length(t) > 0)) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
      |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
      |st AS (SELECT (SELECT count(*) FROM toks)::BIGINT AS tot,
      |              (SELECT count(*) FROM documents)::BIGINT AS n_docs)""".stripMargin

  // the workload mirrors TextAnalysis.defaultBm25Workload: corpus-derived
  // (round 16) — the 3 lexicographically largest distinct tokens of each
  // of the 5 smallest doc_id % 100 == 0 docs. ASCII-vocabulary assumption
  // (ADVICE r16): "same string order both sides" holds because Spark
  // sorts by UTF-16 code units while DuckDB's list_reverse_sort compares
  // UTF-8 bytes — identical ONLY for ASCII tokens (code points above
  // U+007F, e.g. U+E000-U+FFFF vs supplementary planes, order
  // differently). Both harness corpora (synthetic + Zipf) are ASCII; a
  // non-ASCII corpus needs a collation-stable normalization (e.g. sort
  // by unicode code point on both sides) at BOTH definition sites.
  private lazy val bm25ScoreCtes: String =
    s"""$bm25CorpusCtes,
      |qdocs AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS query_id
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 100 = 0
      |        ORDER BY doc_id LIMIT 5)),
      |q AS (
      |  SELECT qd.query_id::BIGINT AS query_id,
      |    unnest(list_reverse_sort(list_distinct(list_filter(
      |      string_split(lower(d.text), ' '), t -> length(t) > 0)))[1:3]) AS term
      |  FROM documents d JOIN qdocs qd USING (doc_id)),
      |sc AS (
      |  SELECT q.query_id::BIGINT AS query_id, tf.doc_id,
      |    sum((((2*n_docs - 2*df + 1) * 1000) // (2*df + 1))
      |        * ((22000 * tf * tot) // (10*tot*tf + 3*tot + 9*dl*n_docs)))::BIGINT
      |      AS score_micro
      |  FROM q JOIN tf USING (term) JOIN df USING (term)
      |    JOIN dl USING (doc_id) CROSS JOIN st
      |  GROUP BY 1, 2)""".stripMargin

  /** DSIR weights (mirror of Corpus.dsirWeights). Shared by the batch
    * join form (mix_dsir) and the stateless map-literal streaming twin
    * (stream_dsir) — identical relation by construction (CorpusSpec
    * pins join-form == map-literal-form equality).
    */
  private lazy val dsirOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    unnest(list_filter(string_split(lower(text), ' '), t -> length(t) > 0)) AS word
       |  FROM documents),
       |tb AS (
       |  SELECT doc_id, source, ${h60("word")} % 1024 AS b FROM tok),
       |stats AS (
       |  SELECT b, count(*)::BIGINT AS c_cnt,
       |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::BIGINT AS t_cnt
       |  FROM tb GROUP BY b),
       |ratio AS (
       |  SELECT b, ((1000 * (t_cnt + 1)) // (c_cnt + 1))::BIGINT AS r_milli FROM stats)
       |SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
       |  (sum(r.r_milli) // count(*))::BIGINT AS dsir_milli
       |FROM tb t JOIN ratio r USING (b)
       |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin

  /** Distillation CTEs (mirror of Corpus.distillParts): the bigram-LM
    * teacher, the cheap student features, the 80/20 doc_id split, the
    * 9 exact-integer moment sums on the train split, and the Cramer
    * solve (positive Gram determinant + 3 numerators) in HUGEINT.
    * Shared by mix_distill (fit + residual audit) and stream_distill
    * (per-doc serving with the same rational coefficients).
    */
  private lazy val distillCtes: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, array_to_string(toks[i+1:i+2], ' ') AS bigram
      |  FROM toks, UNNEST(range(0, len(toks) - 1)) AS u(i)
      |  WHERE len(toks) >= 2),
      |bs AS (SELECT bigram, count(*)::BIGINT AS c_bigram FROM bg GROUP BY bigram),
      |w1s AS (
      |  SELECT split_part(bigram, ' ', 1) AS w1, sum(c_bigram)::BIGINT AS c_w1
      |  FROM bs GROUP BY 1),
      |sc AS (
      |  SELECT bigram, (c_bigram * 1000) // c_w1 AS cond_milli
      |  FROM bs JOIN w1s ON split_part(bs.bigram, ' ', 1) = w1s.w1),
      |lm AS (
      |  SELECT g.doc_id, (sum(sc.cond_milli) // count(*))::BIGINT AS lm_milli
      |  FROM bg g JOIN sc ON g.bigram = sc.bigram
      |  GROUP BY g.doc_id),
      |feats AS (
      |  SELECT doc_id, least(len(toks), 255)::BIGINT AS x1,
      |    ((1000 * len(list_filter(toks,
      |        t -> list_contains(['the','a','of','and','to','in','is','on'], t))))
      |      // len(toks))::BIGINT AS x2
      |  FROM toks WHERE len(toks) > 0),
      |j AS (
      |  SELECT f.doc_id, f.x1, f.x2, l.lm_milli,
      |    CASE WHEN f.doc_id % 5 < 4 THEN 'train' ELSE 'holdout' END AS split
      |  FROM feats f JOIN lm l USING (doc_id)),
      |s AS (
      |  SELECT count(*)::HUGEINT AS n,
      |    sum(x1)::HUGEINT AS s1, sum(x2)::HUGEINT AS s2,
      |    sum(x1*x1)::HUGEINT AS s11, sum(x1*x2)::HUGEINT AS s12,
      |    sum(x2*x2)::HUGEINT AS s22, sum(lm_milli)::HUGEINT AS sy,
      |    sum(x1*lm_milli)::HUGEINT AS s1y, sum(x2*lm_milli)::HUGEINT AS s2y
      |  FROM j WHERE split = 'train'),
      |c AS (
      |  SELECT
      |    n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
      |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS b0n,
      |    n*(s1y*s22 - s2y*s12) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS b1n,
      |    n*(s11*s2y - s12*s1y) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS b2n
      |  FROM s)""".stripMargin

  private lazy val distillOracle: String =
    s"""$distillCtes,
       |p AS (
       |  SELECT j.split, j.lm_milli, c.det, c.b0n, c.b1n, c.b2n,
       |    (least(1000 * c.det, greatest(0, c.b0n + c.b1n * j.x1 + c.b2n * j.x2))
       |      // c.det)::BIGINT AS pred_milli
       |  FROM j, c)
       |SELECT split, count(*)::BIGINT AS n_docs,
       |  (sum(abs(pred_milli - lm_milli)) // count(*))::BIGINT AS mae_milli,
       |  (sum(pred_milli) // count(*))::BIGINT AS mean_pred_milli,
       |  (sum(lm_milli) // count(*))::BIGINT AS mean_lm_milli,
       |  (CASE WHEN max(b0n) >= 0 THEN (1000000 * max(b0n)) // max(det)
       |        ELSE -((1000000 * -max(b0n)) // max(det)) END)::BIGINT AS b0_micro,
       |  (CASE WHEN max(b1n) >= 0 THEN (1000000 * max(b1n)) // max(det)
       |        ELSE -((1000000 * -max(b1n)) // max(det)) END)::BIGINT AS b1_micro,
       |  (CASE WHEN max(b2n) >= 0 THEN (1000000 * max(b2n)) // max(det)
       |        ELSE -((1000000 * -max(b2n)) // max(det)) END)::BIGINT AS b2_micro
       |FROM p GROUP BY split ORDER BY split""".stripMargin

  private lazy val distillStreamOracle: String =
    s"""$distillCtes
       |SELECT f.doc_id, f.x1, f.x2,
       |  (least(1000 * c.det, greatest(0, c.b0n + c.b1n * f.x1 + c.b2n * f.x2))
       |    // c.det)::BIGINT AS pred_milli
       |FROM feats f, c
       |ORDER BY f.doc_id""".stripMargin

  /** BPE encode replay (mirror of TextAnalysis.bpeEncodeFrame over the
    * trained merges). Shared by the batch query (vocab_bpe_encode) and
    * its stateless streaming twin (stream_bpe_encode).
    */
  private lazy val bpeEncodeOracle: String =
    s"""WITH w0 AS (
       |  SELECT token AS word, count(*)::BIGINT AS freq
       |  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), t -> length(t) > 0)) AS token
       |        FROM documents)
       |  GROUP BY token),
       |words1 AS (
       |  SELECT word, freq,
       |    list_transform(range(1, length(word) + 1), i -> substr(word, i::INT, 1)) AS syms
       |  FROM w0),
       |${bpeRound(1)},
       |${bpeRound(2)},
       |${bpeRound(3)},
       |dt AS (
       |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> length(t) > 0)) AS word
       |  FROM documents)
       |SELECT d.doc_id,
       |  count(*)::BIGINT AS n_words,
       |  sum(length(d.word))::BIGINT AS n_syms0,
       |  sum(len(w.syms))::BIGINT AS n_bpe,
       |  ((1000 * sum(len(w.syms))) // sum(length(d.word)))::BIGINT AS compression_milli
       |FROM dt d JOIN words4 w ON d.word = w.word
       |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin

  private lazy val bpeTrainOracle: String =
    s"""WITH w0 AS (
       |  SELECT token AS word, count(*)::BIGINT AS freq
       |  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), t -> length(t) > 0)) AS token
       |        FROM documents)
       |  GROUP BY token),
       |words1 AS (
       |  SELECT word, freq,
       |    list_transform(range(1, length(word) + 1), i -> substr(word, i::INT, 1)) AS syms
       |  FROM w0),
       |${bpeRound(1)},
       |${bpeRound(2)},
       |${bpeRound(3)}
       |SELECT 1::BIGINT AS round, pl, pr, cnt FROM win1
       |UNION ALL SELECT 2::BIGINT, pl, pr, cnt FROM win2
       |UNION ALL SELECT 3::BIGINT, pl, pr, cnt FROM win3
       |ORDER BY round""".stripMargin

  /** Daily top-k event types (mirror of EventWindows.dailyTopTypes).
    * Shared by the window form (ev_daily_top) and the custom-aggregate
    * form (ev_daily_top_agg) — identical relation, identical total order.
    */
  private val dailyTopOracle: String =
    """WITH day AS (
      |  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS day, event_type,
      |    count(*)::BIGINT AS n
      |  FROM events GROUP BY day, event_type),
      |ranked AS (
      |  SELECT day, event_type, n,
      |    row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type ASC) AS rk
      |  FROM day)
      |SELECT day, event_type, n, rk FROM ranked WHERE rk <= 3
      |ORDER BY day, rk""".stripMargin

  /** Per-doc token statistics (mirror of TextAnalysis.tokenStats).
    * Shared by the Column-API query (text_stats) and its SQL-surface
    * twin (sql_tokencount) — identical relation by construction.
    */
  private val textStatsOracle: String =
    """SELECT doc_id,
      |  length(text)::BIGINT AS n_chars,
      |  len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0))::BIGINT AS n_tokens,
      |  (len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), t -> length(t) > 0))
      |    + length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')))::BIGINT AS n_subwords
      |FROM documents ORDER BY doc_id""".stripMargin

  /** CMS heavy-hitter gate (mirror of UrlCount.cmsHeavyHitters): exact
    * top-5 counts; within_tolerance is asserted TRUE because CMS
    * overestimates by at most eps*N at the configured confidence, so a
    * FALSE from the Spark side is a real sketch bug the hash-compare
    * must catch. Shared by urlcount_cms and the SQL twin sql_cms.
    */
  private val cmsOracle: String =
    """WITH c AS (
      |  SELECT token, count(*)::BIGINT AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE length(token) > 0
      |  GROUP BY token)
      |SELECT token, cnt, TRUE AS within_tolerance
      |FROM (SELECT token, cnt FROM c ORDER BY cnt DESC, token ASC LIMIT 5)
      |ORDER BY token""".stripMargin

  /** Deny-list scrub replay (mirror of TextAnalysis.scrubFrame). Shared
    * by the batch query (text_scrub) and its stateless streaming twin
    * (stream_scrub) — identical relation by construction.
    */
  /** Power-iteration CTE chain (int8 quantize -> mean-scaled Gram ->
    * three matrix-vector rounds, exact integers) — shared by
    * emb_pca_power (emits the iterates) and emb_abtt (projects each
    * vector onto the converged direction v3).
    */
  private val pcaCtes: String =
    """e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> floor(x::DOUBLE * 1000000)::BIGINT) AS vm
      |  FROM embeddings),
      |m AS (
      |  SELECT vec_id, vm,
      |    list_max(list_transform(vm, x -> abs(x))) AS scale
      |  FROM e),
      |q AS (
      |  SELECT vec_id,
      |    list_transform(vm, v -> CASE WHEN scale = 0 THEN 0
      |      ELSE (CASE WHEN v < 0 THEN -1 ELSE 1 END) * ((abs(v) * 127) // scale)
      |      END) AS q
      |  FROM m),
      |x AS (
      |  SELECT i::BIGINT AS di, j::BIGINT AS dj,
      |    q[(i + 1)::INT] * q[(j + 1)::INT] AS p
      |  FROM q,
      |    UNNEST(range(0, len(q))) AS gi(i),
      |    UNNEST(range(0, len(q))) AS gj(j)
      |  WHERE j >= i),
      |gc AS (
      |  SELECT di, dj, count(*)::BIGINT AS n_vecs, sum(p)::BIGINT AS g
      |  FROM x GROUP BY di, dj),
      |gm AS (
      |  SELECT di AS i, dj AS j, g // n_vecs AS gm FROM gc
      |  UNION ALL
      |  SELECT dj AS i, di AS j, g // n_vecs AS gm FROM gc WHERE di <> dj),
      |v0 AS (SELECT DISTINCT i AS j, 1000::BIGINT AS v FROM gm),
      |s1 AS (SELECT i, sum(gm * v)::BIGINT AS num FROM gm JOIN v0 USING (j) GROUP BY i),
      |m1 AS (SELECT max(abs(num)) AS mx FROM s1),
      |v1 AS (SELECT i AS j, CASE WHEN mx = 0 THEN 0
      |    ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END) * ((1000 * abs(num)) // mx)
      |  END AS v FROM s1, m1),
      |s2 AS (SELECT i, sum(gm * v)::BIGINT AS num FROM gm JOIN v1 USING (j) GROUP BY i),
      |m2 AS (SELECT max(abs(num)) AS mx FROM s2),
      |v2 AS (SELECT i AS j, CASE WHEN mx = 0 THEN 0
      |    ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END) * ((1000 * abs(num)) // mx)
      |  END AS v FROM s2, m2),
      |s3 AS (SELECT i, sum(gm * v)::BIGINT AS num FROM gm JOIN v2 USING (j) GROUP BY i),
      |m3 AS (SELECT max(abs(num)) AS mx FROM s3),
      |v3 AS (SELECT i AS j, CASE WHEN mx = 0 THEN 0
      |    ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END) * ((1000 * abs(num)) // mx)
      |  END AS v FROM s3, m3)""".stripMargin

  /** JSON round-trip parity oracle — the profile computed from the
    * ORIGINAL parquet table; shared by the batch writer/reader pair
    * and the streaming foreachBatch file-sink twin.
    */
  /** aHash replay from the image-generator arithmetic — shared by the
    * batch hash relation and its stateless streaming twin.
    */
  private val phashOracle: String =
    """WITH ids AS (
      |  SELECT doc_id AS id, (doc_id % 31 + 2) AS w, (doc_id % 17 + 2) AS h
      |  FROM documents WHERE doc_id % 2 = 0),
      |s AS (
      |  SELECT id, w, h, j,
      |    ((id * 31 + (((j % 8) * w) // 8) * 7 + (((j // 8) * h) // 8) * 13)
      |      % 256) AS v
      |  FROM ids, UNNEST(range(0, 64)) AS t(j)),
      |a AS (SELECT id, (sum(v) // 64) AS avg FROM s GROUP BY id)
      |SELECT s.id, max(s.w)::BIGINT AS width, max(s.h)::BIGINT AS height,
      |  sum(CASE WHEN s.j < 32 AND s.v > a.avg
      |           THEN (1::BIGINT << s.j::INT) ELSE 0 END)::BIGINT AS ahash_lo,
      |  sum(CASE WHEN s.j >= 32 AND s.v > a.avg
      |           THEN (1::BIGINT << (s.j - 32)::INT) ELSE 0 END)::BIGINT AS ahash_hi
      |FROM s JOIN a ON a.id = s.id
      |GROUP BY s.id ORDER BY s.id""".stripMargin

  private val jsonParityOracle: String =
    """SELECT source, count(*)::BIGINT AS n_docs,
      |  sum(n_chars)::BIGINT AS sum_chars,
      |  bit_xor(('0x' || substr(md5(doc_id::VARCHAR || ':' || text), 1, 15))::BIGINT)
      |    ::BIGINT AS content_xor
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Scene segmentation oracle — replays the WINDOW formulation of
    * sceneCuts; shared by the batch query and the stateless in-row
    * streaming twin (the two are row-for-row equal by construction).
    */
  private val scenesOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS id, text, octet_length(encode(text))::BIGINT AS total
      |  FROM documents WHERE doc_id % 2 = 0),
      |f AS (
      |  SELECT id, k::BIGINT AS k,
      |    ord(substr(text, (floor(k * total / 8) + 1)::INT, 1))::BIGINT AS feat
      |  FROM m, UNNEST(range(0, 8)) AS u(k)),
      |lg AS (
      |  SELECT id, k, feat,
      |    lag(feat) OVER (PARTITION BY id ORDER BY k) AS prev
      |  FROM f),
      |ct AS (
      |  SELECT id, k,
      |    CASE WHEN prev IS NULL OR abs(feat - prev) >= 30 THEN 1 ELSE 0 END AS cut
      |  FROM lg),
      |sc AS (
      |  SELECT id, k,
      |    sum(cut) OVER (PARTITION BY id ORDER BY k) - 1 AS scene_idx
      |  FROM ct)
      |SELECT id, scene_idx::BIGINT AS scene_idx, min(k)::BIGINT AS start_k,
      |  max(k)::BIGINT AS end_k, count(*)::BIGINT AS n_frames
      |FROM sc GROUP BY id, scene_idx ORDER BY id, scene_idx""".stripMargin

  private val scrubOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
      |  FROM documents)
      |SELECT doc_id,
      |  len(toks)::BIGINT AS n_tokens,
      |  len(list_filter(toks, t -> t IN ('customer', 'spark', 'vector')))::BIGINT AS n_redacted,
      |  md5(array_to_string(list_transform(toks,
      |    t -> CASE WHEN t IN ('customer', 'spark', 'vector') THEN '[REDACTED]' ELSE t END),
      |    ' ')) AS redacted_md5
      |FROM toks ORDER BY doc_id""".stripMargin

  /** PII detect + redact replay (mirror of TextAnalysis.piiFrame over
    * the piiInjected fixture); shared by text_pii and its stateless
    * streaming twin. The regex literals are the TextAnalysis pattern
    * constants verbatim (interpolated, so the two sides cannot drift);
    * DuckDB regexp_replace needs the explicit 'g' flag Spark applies by
    * default, and occurrence counting is len(regexp_extract_all).
    */
  private lazy val piiOracle: String = {
    import graft.ops.TextAnalysis.{piiEmailRe, piiIpRe, piiPhoneRe}
    s"""WITH injected AS (
       |  SELECT doc_id,
       |    text ||
       |    CASE WHEN doc_id % 3 = 0
       |      THEN ' contact user' || doc_id::VARCHAR || '@example.com' ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0
       |      THEN ' call 555-' || lpad(((doc_id * 7919) % 10000)::VARCHAR, 4, '0')
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0
       |      THEN ' host 10.' || (doc_id % 256)::VARCHAR || '.' ||
       |        ((doc_id * 31) % 256)::VARCHAR || '.' || ((doc_id * 17) % 256)::VARCHAR
       |      ELSE '' END AS text
       |  FROM documents),
       |counted AS (
       |  SELECT doc_id,
       |    len(regexp_extract_all(text, '$piiEmailRe'))::BIGINT AS n_emails,
       |    len(regexp_extract_all(text, '$piiPhoneRe'))::BIGINT AS n_phones,
       |    len(regexp_extract_all(text, '$piiIpRe'))::BIGINT AS n_ips,
       |    md5(regexp_replace(regexp_replace(regexp_replace(text,
       |      '$piiEmailRe', '<EMAIL>', 'g'),
       |      '$piiIpRe', '<IP>', 'g'),
       |      '$piiPhoneRe', '<PHONE>', 'g')) AS masked_md5
       |  FROM injected)
       |SELECT doc_id, n_emails, n_phones, n_ips,
       |  (n_emails + n_phones + n_ips)::BIGINT AS pii_total, masked_md5
       |FROM counted ORDER BY doc_id""".stripMargin
  }

  /** Hashed-unigram linear classifier replay (mirror of
    * TextAnalysis.classifierFrame); shared by text_classifier and its
    * stateless streaming twin.
    */
  private lazy val classifierOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
       |  FROM documents)
       |SELECT doc_id,
       |  len(toks)::BIGINT AS n_tokens,
       |  coalesce(list_sum(list_transform(toks,
       |    t -> ${h60("'w:' || t")} % 1001 - 500)), 0)::BIGINT AS score,
       |  coalesce(list_sum(list_transform(toks,
       |    t -> ${h60("'w:' || t")} % 1001 - 500)), 0) >= 0 AS kept
       |FROM toks ORDER BY doc_id""".stripMargin

  /** Trained-classifier CTE chain (mirror of TextAnalysis.classifier
    * Features/classifierTrained): raw integer quality signals -> one
    * stats row -> standardized milli z-scores -> classifierIters
    * unrolled fixed-point LMS steps. Ends with `feats` (f0..f8, y) and
    * `cw{iters}` (the final 1-row micro-weight vector). Every signed
    * division is sign-decomposed abs-// because DuckDB floors where
    * Spark truncates; on non-negative operands they agree. Dimension
    * count / iteration count / learning rate come from the SAME
    * constants the Spark operators use.
    */
  private def classifierSgnDiv(a: String, b: String): String =
    s"(CASE WHEN ($a) < 0 THEN -1 ELSE 1 END) * (abs($a) // ($b))"

  private lazy val classifierTrainCtes: String = {
    val nd = TextAnalysis.classifierDims      // 9 = 8 signals + bias
    val iters = TextAnalysis.classifierIters  // 6
    val lrDen = TextAnalysis.classifierLrDen  // 4
    val stop = "('the','a','of','and','to','in','is','on')"
    val sig = 0 until (nd - 1)
    // HUGEINT, not DECIMAL: DuckDB's `//` on DECIMAL operands degrades
    // to DOUBLE float division (measured); on HUGEINT it floors, which
    // is what Spark's `div` over DECIMAL(38,0) does on these
    // non-negative operands
    val stats = sig.map(d =>
      s"CAST(sum(r$d::HUGEINT) AS HUGEINT) AS s$d, " +
        s"CAST(sum(r$d::HUGEINT * r$d) AS HUGEINT) AS q$d")
      .mkString(",\n       |    ")
    val zs = sig.map { d =>
      val mean = s"(s$d // n)"
      val std = s"greatest(CAST(floor(sqrt(CAST((n * q$d - s$d * s$d) // (n * n) " +
        s"AS DOUBLE))) AS BIGINT), 1)"
      s"CAST(${classifierSgnDiv(s"(r$d - $mean) * 1000", std)} AS BIGINT) AS f$d"
    }.mkString(",\n       |    ")
    val head =
      s"""cd0 AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
         |  FROM documents),
         |craw AS (
         |  SELECT doc_id,
         |    (1000 * len(list_filter(toks, t -> t IN $stop))) // len(toks) AS r0,
         |    (1000 * (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))) // greatest(length(text), 1) AS r1,
         |    (1000 * (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))) // greatest(length(text), 1) AS r2,
         |    (100 * length(text)) // len(toks) AS r3,
         |    (1000 * len(list_distinct(toks))) // len(toks) AS r4,
         |    (1000 * len(list_filter(toks, t -> length(t) <= 2))) // len(toks) AS r5,
         |    (1000 * len(list_filter(toks, t -> length(t) >= 8))) // len(toks) AS r6,
         |    (1000 * (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))) // greatest(length(text), 1) AS r7,
         |    CASE WHEN len(toks) >= 10 AND len(toks) <= 100000 AND
         |      100 * len(list_filter(toks, t -> t IN $stop)) >= len(toks)
         |    THEN 1000 ELSE 0 END::BIGINT AS y
         |  FROM cd0 WHERE len(toks) > 0),
         |cstats AS (
         |  SELECT greatest(count(*), 1)::HUGEINT AS n,
         |    $stats
         |  FROM craw),
         |feats AS (
         |  SELECT doc_id,
         |    $zs,
         |    1000::BIGINT AS f8, y
         |  FROM craw, cstats)""".stripMargin
    val w0 = "cw0 AS (SELECT " +
      (0 until nd).map(d => s"0::BIGINT AS w$d").mkString(", ") + ")"
    val steps = (1 to iters).flatMap { it =>
      val prev = s"cw${it - 1}"
      val pred = classifierSgnDiv(
        (0 until nd).map(d => s"$prev.w$d * f$d").mkString(" + "), "1000000")
      val gs = (0 until nd).map(d =>
        s"CAST(sum(($pred - y)::HUGEINT * f$d) AS HUGEINT) AS g$d")
        .mkString(",\n       |    ")
      val ws = (0 until nd).map { d =>
        val step = classifierSgnDiv(classifierSgnDiv(s"g$d", "n"), lrDen.toString)
        s"CAST($prev.w$d - $step AS BIGINT) AS w$d"
      }.mkString(",\n       |    ")
      Seq(
        s"""cg$it AS (
           |  SELECT greatest(count(*), 1) AS n,
           |    $gs
           |  FROM feats, $prev)""".stripMargin,
        s"""cw$it AS (
           |  SELECT $ws
           |  FROM cg$it, $prev)""".stripMargin)
    }
    (Seq(head, w0) ++ steps).mkString(",\n")
  }

  /** Final-weights score CTE (`cscored`: y, s) over the trained model. */
  private lazy val classifierScoredCte: String = {
    val nd = TextAnalysis.classifierDims
    val last = s"cw${TextAnalysis.classifierIters}"
    val pred = classifierSgnDiv(
      (0 until nd).map(d => s"$last.w$d * f$d").mkString(" + "), "1000000")
    s"""cscored AS (
       |  SELECT y, $pred AS s FROM feats, $last)""".stripMargin
  }

  private lazy val classifierTrainOracle: String = {
    val nd = TextAnalysis.classifierDims
    val iters = TextAnalysis.classifierIters
    val arms = (1 to iters).map { it =>
      val cases = (0 until nd).map(d => s"WHEN $d THEN w$d").mkString(" ")
      s"""SELECT $it::BIGINT AS it, u.d::BIGINT AS dim,
         |    (CASE u.d $cases END)::BIGINT AS w_micro
         |  FROM cw$it, (SELECT unnest(range(0, $nd)) AS d) u""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $classifierTrainCtes
       |SELECT it, dim, w_micro FROM (
       |  $arms)
       |ORDER BY it, dim""".stripMargin
  }

  private lazy val classifierAucOracle: String =
    s"""WITH $classifierTrainCtes,
       |$classifierScoredCte,
       |cgrp AS (
       |  SELECT s, count(*) AS cnt,
       |    sum(CASE WHEN y = 1000 THEN 1 ELSE 0 END) AS pos
       |  FROM cscored GROUP BY s),
       |ccum AS (
       |  SELECT s, cnt, pos,
       |    coalesce(sum(cnt) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
       |  FROM cgrp),
       |cagg AS (
       |  SELECT sum(cnt) AS n, sum(pos) AS n_pos, sum(cnt - pos) AS n_neg,
       |    CAST(sum(pos::HUGEINT * (2 * cb + cnt + 1)) AS HUGEINT) AS r2s,
       |    sum(CASE WHEN s >= 500 THEN pos ELSE 0 END) AS tp,
       |    sum(CASE WHEN s >= 500 THEN cnt - pos ELSE 0 END) AS fp
       |  FROM ccum)
       |SELECT n::BIGINT AS n, n_pos::BIGINT AS n_pos, n_neg::BIGINT AS n_neg,
       |  tp::BIGINT AS tp, fp::BIGINT AS fp,
       |  (n_pos - tp)::BIGINT AS fn, (n_neg - fp)::BIGINT AS tn,
       |  ((1000 * (tp + n_neg - fp)) // n)::BIGINT AS acc_milli,
       |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
       |    ((1000000::HUGEINT * (r2s - n_pos::HUGEINT * (n_pos + 1))) //
       |      (2 * n_pos::HUGEINT * n_neg))::BIGINT END AS auc_ppm
       |FROM cagg""".stripMargin

  private lazy val classifierPrOracle: String =
    s"""WITH $classifierTrainCtes,
       |$classifierScoredCte,
       |cthr AS (SELECT unnest(range(0, 1001, 100)) AS tau),
       |cbase AS (
       |  SELECT tau,
       |    sum(CASE WHEN s >= tau AND y = 1000 THEN 1 ELSE 0 END)::BIGINT AS tp,
       |    sum(CASE WHEN s >= tau AND y <> 1000 THEN 1 ELSE 0 END)::BIGINT AS fp,
       |    sum(CASE WHEN s < tau AND y <> 1000 THEN 1 ELSE 0 END)::BIGINT AS tn,
       |    sum(CASE WHEN y = 1000 THEN 1 ELSE 0 END)::BIGINT AS npos
       |  FROM cscored, cthr GROUP BY tau),
       |cpr AS (
       |  SELECT tau::BIGINT AS tau, tp, fp, (npos - tp)::BIGINT AS fn, tn,
       |    CASE WHEN tp + fp > 0 THEN ((1000 * tp) // (tp + fp))::BIGINT END AS prec_milli,
       |    CASE WHEN npos > 0 THEN ((1000 * tp) // npos)::BIGINT END AS rec_milli
       |  FROM cbase)
       |SELECT tau, tp, fp, fn, tn, prec_milli, rec_milli,
       |  CASE WHEN coalesce(prec_milli, 0) + coalesce(rec_milli, 0) > 0 THEN
       |    ((2 * prec_milli * rec_milli) // (prec_milli + rec_milli))::BIGINT
       |  END AS f1_milli
       |FROM cpr ORDER BY tau""".stripMargin

  /** SCD2 dimension CTE chain (mirror of Relational.scd2StatusDim),
    * ending in `dim` (custkey, version, status, valid_from, valid_to,
    * n_orders). Shared by the build query (rel_scd2) and the
    * point-in-time lookup (rel_scd2_asof).
    */
  private val scd2Ctes: String =
    """ev AS (
      |  SELECT o_custkey AS custkey, o_orderkey, epoch_us(o_orderdate) AS t,
      |    o_orderstatus AS status
      |  FROM orders),
      |runs AS (
      |  SELECT *, CASE WHEN lag(status) OVER w IS NULL
      |    OR lag(status) OVER w <> status THEN 1 ELSE 0 END AS chg
      |  FROM ev WINDOW w AS (PARTITION BY custkey ORDER BY t, o_orderkey)),
      |grps AS (
      |  SELECT *, sum(chg) OVER (PARTITION BY custkey ORDER BY t, o_orderkey
      |    ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM runs),
      |v AS (
      |  SELECT custkey, grp, min(status) AS status, min(t)::BIGINT AS valid_from,
      |    count(*)::BIGINT AS n_orders
      |  FROM grps GROUP BY custkey, grp),
      |dim AS (
      |  SELECT custkey, grp::BIGINT AS version, status, valid_from,
      |    coalesce(lead(valid_from) OVER (PARTITION BY custkey ORDER BY grp),
      |      253402214400000000)::BIGINT AS valid_to,
      |    n_orders
      |  FROM v)""".stripMargin

  /** Product-quantization CTE chain (mirror of Similarity.pqCompsAndBook):
    * integerized components, per-(vec, sub) sign codes, per-(sub, code,
    * dim) exact-mean codebook. Shared by the reconstruction audit
    * (sim_pq) and the ADC serving path (sim_pq_ann).
    */
  private val pqCoreCtes: String =
    """comps AS (
      |  SELECT vec_id, d, d // 8 AS sub,
      |    floor(v[(d + 1)::INT] * 1000000)::BIGINT AS xm
      |  FROM emb, UNNEST(range(0, 64)) AS u(d)),
      |codes AS (
      |  SELECT vec_id, sub,
      |    sum(CASE WHEN xm >= 0 THEN (1 << (d % 8)) ELSE 0 END)::BIGINT AS code
      |  FROM comps GROUP BY vec_id, sub),
      |cb AS (
      |  SELECT c.sub, k.code, c.d, count(*)::BIGINT AS n, sum(c.xm)::BIGINT AS s
      |  FROM comps c JOIN codes k ON k.vec_id = c.vec_id AND k.sub = c.sub
      |  GROUP BY c.sub, k.code, c.d),
      |cbm AS (
      |  SELECT sub, code, d, (s - ((s % n + n) % n)) // n AS cm FROM cb)""".stripMargin

  private lazy val pqCtes: String =
    s"""emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |$pqCoreCtes""".stripMargin

  /** Cascade attribution replay (mirror of TextAnalysis.cascadeFrame
    * + the rollup). Shared by pipeline_cascade and its stateless
    * streaming twin (stream_cascade).
    */
  private lazy val cascadeOracle: String =
    s"""WITH t AS (
         |  SELECT doc_id, lang, source, text,
         |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang, source,
         |    len(toks)::BIGINT AS n_words,
         |    coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS char_mass,
         |    len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
         |    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
         |    ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS n_ellipsis,
         |    len(list_intersect(toks, ['the','a','of','and','to','in','is','on']))::BIGINT AS n_stop,
         |    coalesce(list_sum(list_transform(toks,
         |      x -> ${h60("'w:' || x")} % 1001 - 500)), 0)::BIGINT AS score
         |  FROM t),
         |r AS (
         |  SELECT doc_id, lang, source, n_words, n_stop, score,
         |    CASE WHEN n_words > 0 THEN char_mass * 1000 // n_words END AS mw,
         |    CASE WHEN n_words > 0 THEN n_alpha * 1000 // n_words END AS aw,
         |    CASE WHEN n_words > 0 THEN (n_hash + n_ellipsis) * 1000 // n_words END AS sy
         |  FROM m),
         |v AS (
         |  SELECT source,
         |    CASE
         |      WHEN lang <> 'en' THEN '1_lang'
         |      WHEN NOT (n_words >= 10 AND n_words <= 100000) THEN '2_words'
         |      WHEN NOT (mw IS NOT NULL AND mw BETWEEN 3000 AND 10000) THEN '3_meanlen'
         |      WHEN NOT (aw IS NOT NULL AND aw >= 800) THEN '4_alpha'
         |      WHEN NOT (sy IS NOT NULL AND sy < 100) THEN '5_symbol'
         |      WHEN NOT (n_stop >= 2) THEN '6_stop'
         |      WHEN score < 0 THEN '7_classifier'
         |      ELSE '0_keep' END AS verdict
         |  FROM r)
         |SELECT source, verdict, count(*)::BIGINT AS n_docs
         |FROM v GROUP BY source, verdict ORDER BY source, verdict""".stripMargin

  /** Semantic decontamination replay: best eval match per train vector
    * over the bounded held-out set (mirror of
    * Similarity.semanticDecontaminate). Shared by the batch gate and
    * the stateless unrolled ingest twin — identical relation by
    * construction (same cos-desc/id-asc tie-break; SimilaritySpec pins
    * stream-frame == batch equality).
    */
  private lazy val semanticDeconOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ev AS (SELECT vec_id AS eval_id, v AS ev FROM emb
       |       WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 50),
       |sc AS (
       |  SELECT t.vec_id AS doc_id, e.eval_id,
       |    ${cosMilli("t.v", "e.ev")} AS cos_milli
       |  FROM emb t CROSS JOIN ev e WHERE t.vec_id % 97 != 0),
       |best AS (
       |  SELECT doc_id, eval_id, cos_milli,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY cos_milli DESC, eval_id ASC) AS rk
       |  FROM sc)
       |SELECT doc_id, eval_id AS best_eval_id, cos_milli,
       |  (CASE WHEN cos_milli >= 400 THEN 1 ELSE 0 END)::BIGINT AS leaked
       |FROM best WHERE rk = 1 ORDER BY doc_id""".stripMargin

  /** Brute-force cosine top-k replay (mirror of
    * Similarity.bruteForceTopK). Shared by the Column-API query
    * (sim_bruteforce) and the graft_dot SQL-surface twin (sql_cosine).
    */
  private lazy val bruteForceOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
       |scored AS (
       |  SELECT q.q_id, e.vec_id AS n_id, ${cosMilli("q.qv", "e.v")} AS cos_milli
       |  FROM emb e CROSS JOIN q
       |  WHERE e.vec_id != q.q_id),
       |ranked AS (
       |  SELECT q_id, n_id, cos_milli,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, n_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, rk, n_id, cos_milli FROM ranked WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  /** Exact-thousandths cosine similarity (mirror of Similarity.cosMilli). */
  private def cosMilli(a: String, b: String): String =
    s"floor(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) * 1000)::BIGINT"

  /** Random-hyperplane LSH buckets (mirror of Similarity.lshBuckets with
    * nBits=8, nBands=4, dim=64): CTEs `emb` (vec_id, v) and `bucketed`
    * (vec_id, band, sig, v).
    */
  private val lshBucketsCte =
    s"""planes AS (
       |  SELECT band, bit, d,
       |         (${h60("band || ':' || bit || ':' || d")})::DOUBLE / power(2, 59) - 1.0 AS comp
       |  FROM range(0, 4) tb(band), range(0, 8) ti(bit), range(0, 64) td(d)),
       |plane AS (
       |  SELECT band, bit, list(comp ORDER BY d) AS pl
       |  FROM planes GROUP BY band, bit),
       |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sigs AS (
       |  SELECT e.vec_id, p.band,
       |         sum(CASE WHEN list_dot_product(p.pl, e.v) > 0
       |             THEN (1::BIGINT << p.bit) ELSE 0::BIGINT END)::BIGINT AS sig
       |  FROM emb e CROSS JOIN plane p
       |  GROUP BY e.vec_id, p.band),
       |bucketed AS (
       |  SELECT s.vec_id, s.band, s.sig, e.v
       |  FROM sigs s JOIN emb e USING (vec_id))""".stripMargin

  /** Fuzzy near-dup pair graph (mirror of Dedup.nearDupClusters' edge
    * union): CTE chain ending in `fedges(src, dst)` — the bidirectional
    * union of the minhash-LSH (est>=0.5), simhash (hamming<=3) and
    * n-gram-Jaccard (>=0.3) pair sets. Requires the `sh` CTE from
    * docShingles; prefixed names (mh_/sh_/jc_) keep the three rungs'
    * CTEs from colliding when composed into one query.
    */
  /** The MinHash-LSH rung alone (mh_sig -> mh_pairs) — split out so the
    * incremental-cluster oracle can close over JUST this rung (the one
    * the persisted band index serves). */
  private val minhashPairsCte =
    s"""mh_sig AS (
       |  SELECT doc_id, i, min(${h60("i || ':' || shingle")}) AS mh
       |  FROM sh, UNNEST(range(0, 16)) AS u(i)
       |  GROUP BY doc_id, i),
       |mh_band AS (
       |  SELECT doc_id, (i // $lshR) AS band, string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
       |  FROM mh_sig GROUP BY doc_id, (i // $lshR)),
       |mh_cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM mh_band a JOIN mh_band b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |mh_pairs AS (
       |  SELECT c.doc_a, c.doc_b
       |  FROM mh_cand c
       |  JOIN mh_sig sa ON sa.doc_id = c.doc_a
       |  JOIN mh_sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
       |  GROUP BY c.doc_a, c.doc_b
       |  HAVING sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END)::DOUBLE / 16 >= 0.5)""".stripMargin

  private val fuzzyEdgesCte =
    s"""$minhashPairsCte,
       |sh_hv AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
       |sh_ws AS (
       |  SELECT doc_id, j, sum(((h // CAST(power(2, j) AS BIGINT)) % 2) * 2 - 1)::BIGINT AS wsum
       |  FROM sh_hv, UNNEST(range(0, 32)) AS u(j)
       |  GROUP BY doc_id, j),
       |sh_64 AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN wsum > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)::BIGINT AS simhash
       |  FROM sh_ws GROUP BY doc_id),
       |sh_chunked AS (
       |  SELECT doc_id, simhash, c,
       |    (simhash // CAST(power(2, c * 8) AS BIGINT)) % 256 AS chunk
       |  FROM sh_64, UNNEST(range(0, 4)) AS u(c)),
       |sh_pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh_chunked a JOIN sh_chunked b
       |    ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |jc_sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
       |jc_dfreq AS (SELECT shingle, count(*)::BIGINT AS df FROM sh GROUP BY shingle),
       |jc_rare AS (
       |  SELECT s.doc_id, s.shingle
       |  FROM sh s JOIN jc_dfreq d ON s.shingle = d.shingle
       |  WHERE d.df <= 50),
       |jc_cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM jc_rare a JOIN jc_rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
       |jc_inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS n_inter
       |  FROM jc_cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY c.doc_a, c.doc_b),
       |jc_pairs AS (
       |  SELECT i.doc_a, i.doc_b
       |  FROM jc_inter i
       |  JOIN jc_sizes za ON za.doc_id = i.doc_a
       |  JOIN jc_sizes zb ON zb.doc_id = i.doc_b
       |  WHERE floor(i.n_inter * 1000.0 / (za.sz + zb.sz - i.n_inter)) >= 300),
       |fpairs AS (
       |  SELECT doc_a, doc_b FROM mh_pairs
       |  UNION SELECT doc_a, doc_b FROM sh_pairs
       |  UNION SELECT doc_a, doc_b FROM jc_pairs),
       |fedges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM fpairs
       |  UNION SELECT doc_b AS src, doc_a AS dst FROM fpairs)""".stripMargin

  /** Transitive closure over fedges + min-reachable-id per node: CTE
    * `clusters(doc_id, cluster_id)` — the oracle twin of
    * Dedup.connectedComponents (component = min reachable id; the
    * recursive closure is fine at oracle scale, the Spark side uses
    * label propagation instead).
    */
  private val clustersCte =
    """clreach(src, dst) AS (
      |  SELECT src, dst FROM fedges
      |  UNION
      |  SELECT r.src, e.dst FROM clreach r JOIN fedges e ON r.dst = e.src),
      |clusters AS (
      |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      |  FROM clreach GROUP BY src)""".stripMargin

  /** Membership expansion from representative clusters back to every
    * copy (mirror of nearDupClusters' dupMap re-join): CTE `expanded`
    * (doc_id, cluster_id) — a doc inherits its rep's component; an
    * exact-dup group (>= 2 copies) with an unclustered rep is its own
    * component keyed by the rep. Requires `repmap`/`reps` (repMapCte)
    * and `clusters` (clustersCte).
    */
  private val expandClustersCte =
    """expanded AS (
      |  SELECT m.doc_id, coalesce(c.cluster_id, r.rep_id) AS cluster_id
      |  FROM repmap m
      |  JOIN reps r USING (content_key)
      |  LEFT JOIN clusters c ON c.doc_id = r.rep_id
      |  WHERE c.cluster_id IS NOT NULL OR r.n_copies >= 2)""".stripMargin

  /** aHash banded-pairing replay (mirror of Multimodal.aHashPairs over
    * the arithmetic image fixture): same chunk split, df cap, distinct
    * candidates, exact xor bit_count. Ends in CTE `pp(id_a, id_b,
    * hamming)` — the hamming <= 3 near-dup pair relation — shared by
    * the pair listing and the cluster closure.
    */
  private val phashPairsCte =
    """ids AS (
      |  SELECT doc_id AS id, (doc_id % 31 + 2) AS w, (doc_id % 17 + 2) AS h
      |  FROM documents WHERE doc_id % 2 = 0),
      |s AS (
      |  SELECT id, w, h, j,
      |    ((id * 31 + (((j % 8) * w) // 8) * 7 + (((j // 8) * h) // 8) * 13)
      |      % 256) AS v
      |  FROM ids, UNNEST(range(0, 64)) AS t(j)),
      |a AS (SELECT id, (sum(v) // 64) AS avg FROM s GROUP BY id),
      |hh AS (
      |  SELECT s.id,
      |    sum(CASE WHEN s.j < 32 AND s.v > a.avg
      |             THEN (1::BIGINT << s.j::INT) ELSE 0 END)::BIGINT AS lo,
      |    sum(CASE WHEN s.j >= 32 AND s.v > a.avg
      |             THEN (1::BIGINT << (s.j - 32)::INT) ELSE 0 END)::BIGINT AS hi
      |  FROM s JOIN a ON a.id = s.id GROUP BY s.id),
      |c AS (
      |  SELECT id, lo, hi, b.band,
      |    CASE b.band WHEN 0 THEN lo & 65535
      |                WHEN 1 THEN (lo >> 16) & 65535
      |                WHEN 2 THEN hi & 65535
      |                ELSE (hi >> 16) & 65535 END AS chunk
      |  FROM hh, (VALUES (0), (1), (2), (3)) AS b(band)),
      |rare AS (
      |  SELECT band, chunk FROM c GROUP BY band, chunk
      |  HAVING count(*) <= 100),
      |p AS (
      |  SELECT DISTINCT x.id AS id_a, y.id AS id_b,
      |    x.lo AS la, x.hi AS ha, y.lo AS lb, y.hi AS hb
      |  FROM c x JOIN rare r ON x.band = r.band AND x.chunk = r.chunk
      |  JOIN c y ON y.band = x.band AND y.chunk = x.chunk AND x.id < y.id),
      |pp AS (
      |  SELECT id_a, id_b,
      |    (bit_count(xor(la, lb)::BIGINT) + bit_count(xor(ha, hb)::BIGINT))::BIGINT
      |      AS hamming
      |  FROM p
      |  WHERE bit_count(xor(la, lb)::BIGINT) + bit_count(xor(ha, hb)::BIGINT) <= 3)""".stripMargin

  /** One HITS round as CTEs (mirror of Graph.hitsFromPairs' loop body):
    * given h{k-1}(c, score), derive a{k} and h{k} — raw sums over the
    * `so` pair list, floor-div rescale to max 1,000,000 in HUGEINT.
    */
  private def hitsRound(k: Int): String =
    s"""a${k}r AS (
       |  SELECT s, sum(h.score) AS raw FROM so JOIN h${k - 1} h USING (c)
       |  GROUP BY s),
       |a$k AS (
       |  SELECT s, (1000000::HUGEINT * raw) // (SELECT max(raw) FROM a${k}r)
       |    AS score FROM a${k}r),
       |h${k}r AS (
       |  SELECT c, sum(a.score) AS raw FROM so JOIN a$k a USING (s)
       |  GROUP BY c),
       |h$k AS (
       |  SELECT c, (1000000::HUGEINT * raw) // (SELECT max(raw) FROM h${k}r)
       |    AS score FROM h${k}r)""".stripMargin

  /** Per-source manifest relation (mirror of Corpus.sourceManifest AND
    * the Complete-mode streaming twin). */
  private lazy val manifestOracle: String =
    s"""SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS n_chars,
       |  (sum((${h60("text")})::HUGEINT) % 2305843009213693952)::BIGINT
       |    AS content_sum
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** As-of attribution relation (mirror of EventWindows.asOfAttribution
    * AND the per-user last-view state machine streaming twin). */
  private lazy val asofOracle: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS tus,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |marked AS (
      |  SELECT event_id, user_id, tus, is_purchase,
      |    last_value(CASE WHEN is_purchase = 0
      |                    THEN {'vt': tus, 'vid': event_id} END IGNORE NULLS)
      |      OVER (PARTITION BY user_id
      |            ORDER BY tus ASC, is_purchase ASC, event_id ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv
      |  FROM ev)
      |SELECT event_id AS purchase_event_id, user_id, tus AS purchase_tus,
      |  lv.vid AS view_event_id, lv.vt AS view_tus,
      |  tus - lv.vt AS lag_us
      |FROM marked WHERE is_purchase = 1 ORDER BY purchase_event_id""".stripMargin

  /** RFM feature relation (mirror of EventWindows.rfmFeatures AND the
    * Complete-mode streaming twin, which maintains the identical
    * per-user state): recency vs the corpus max day, frequency,
    * monetary, churn label. */
  private lazy val rfmOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |    (epoch_us(ts) // 1000000) // 86400 AS day,
      |    floor(value * 1000)::BIGINT AS v_milli
      |  FROM events),
      |mx AS (SELECT max(day) AS corpus_max_day FROM ev),
      |g AS (
      |  SELECT user_id, max(day) AS last_day, count(*)::BIGINT AS frequency,
      |    sum(CASE WHEN event_type = 'purchase' THEN v_milli ELSE 0 END)::BIGINT
      |      AS monetary_milli
      |  FROM ev GROUP BY user_id)
      |SELECT user_id, (corpus_max_day - last_day)::BIGINT AS recency_days,
      |  frequency, monetary_milli,
      |  (corpus_max_day - last_day > 90) AS churned
      |FROM g CROSS JOIN mx ORDER BY user_id""".stripMargin

  /** Seasonal-baseline CTEs (mirror of EventWindows.seasonalBaseline /
    * seasonalScoreFrame): `sb(event_type, hod, n_train, baseline_milli)`
    * over the %10!=0 train split, `ssc` = the held-out split scored
    * against it (alert = value above 2x the bucket mean). Shared by the
    * batch rollup audit and the per-arrival streaming twin.
    */
  private val seasonalCte =
    """sb AS (
      |  SELECT event_type, hour(ts)::BIGINT AS hod, count(*)::BIGINT AS n_train,
      |    (sum(floor(value * 1000)::BIGINT) // count(*))::BIGINT AS baseline_milli
      |  FROM events WHERE event_id % 10 != 0
      |  GROUP BY 1, 2),
      |ssc AS (
      |  SELECT event_id, e.event_type, hour(e.ts)::BIGINT AS hod,
      |    floor(e.value * 1000)::BIGINT AS v_milli, b.baseline_milli,
      |    (b.baseline_milli > 0 AND
      |     floor(e.value * 1000)::BIGINT > 2 * b.baseline_milli) AS alert
      |  FROM events e JOIN sb b
      |    ON e.event_type = b.event_type AND hour(e.ts) = b.hod
      |  WHERE event_id % 10 = 0)""".stripMargin

  /** The near-dup cluster relation's ground truth — algorithm-agnostic
    * (recursive transitive closure, min reachable id per component), so
    * it serves BOTH registered resolutions: min-label propagation
    * (`dedup_clusters`) and the large-star/small-star contraction
    * (`dedup_clusters_twostar`).
    */
  private lazy val clustersOracle: String =
    s"""WITH RECURSIVE $repDocShingles,
       |$fuzzyEdgesCte,
       |$clustersCte,
       |$expandClustersCte
       |SELECT doc_id::BIGINT AS doc_id, cluster_id::BIGINT AS cluster_id
       |FROM expanded ORDER BY doc_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "urlcount_topk" ->
      """SELECT token, count(*)::BIGINT AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token
        |ORDER BY cnt DESC, token ASC
        |LIMIT 100""".stripMargin,
    "urlcount_counts" ->
      """SELECT token, count(*)::BIGINT AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token
        |ORDER BY token""".stripMargin,
    "urlcount_distinct" ->
      """SELECT DISTINCT token
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents)
        |WHERE length(token) > 0
        |ORDER BY token""".stripMargin,
    // the oracle recomputes the exact count and asserts the tolerance
    // flag is true — i.e. the gate verifies Spark's HLL++ estimate
    // landed within 5% of ground truth, not a vacuous constant
    "urlcount_approx_distinct" ->
      """SELECT count(DISTINCT token)::BIGINT AS n_exact, TRUE AS within_tolerance
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE length(token) > 0""".stripMargin,
    "urlcount_merged" ->
      """WITH c AS (
        |  SELECT token, count(*)::BIGINT AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY token)
        |SELECT token || ': ' || cnt AS line FROM c ORDER BY token""".stripMargin,
    "rel_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_base_price,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
        |  count(*)::BIGINT AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "rel_top_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)))::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "rel_revenue_nation" ->
      """SELECT r_name, n_name,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)))::DOUBLE AS revenue,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "rel_top_customers" ->
      """WITH spend AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS total_spend
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT n_name, o_custkey AS custkey, total_spend,
        |    row_number() OVER (PARTITION BY n_name ORDER BY total_spend DESC, o_custkey ASC) AS rk
        |  FROM spend
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, custkey, total_spend, rk
        |FROM ranked WHERE rk <= 3
        |ORDER BY n_name, rk""".stripMargin,
    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sales,
        |  count(*)::BIGINT AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "rel_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sales,
        |  count(*)::BIGINT AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "rel_part_type_revenue" ->
      """SELECT p_type,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)))::DOUBLE AS revenue,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type
        |ORDER BY p_type""".stripMargin,
    "rel_supplier_revenue" ->
      """SELECT n_name,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS supplier_revenue,
        |  count(DISTINCT s_suppkey)::BIGINT AS n_suppliers
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "rel_activity" ->
      """WITH a AS (
        |  SELECT c_custkey,
        |    EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_orders
        |  FROM customer)
        |SELECT CASE WHEN has_orders THEN 'active' ELSE 'inactive' END AS status,
        |  count(*)::BIGINT AS n_customers
        |FROM a GROUP BY status ORDER BY status""".stripMargin,
    // order cadence: integral day gaps (midnight dates divide exactly);
    // avg floors to millis in both engines
    "rel_order_gaps" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS t FROM orders),
        |g AS (
        |  SELECT o_custkey,
        |    (t - lag(t) OVER (PARTITION BY o_custkey ORDER BY t, o_orderkey))
        |      // 86400000000 AS gap_days
        |  FROM o)
        |SELECT o_custkey, count(*)::BIGINT AS n_gaps,
        |  sum(gap_days)::BIGINT AS sum_gap_days,
        |  max(gap_days)::BIGINT AS max_gap_days,
        |  (sum(gap_days) * 1000 // count(*))::BIGINT AS avg_gap_milli
        |FROM g WHERE gap_days IS NOT NULL
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "rel_fk_audit" ->
      """WITH o AS (SELECT DISTINCT o_orderkey FROM orders),
        |l AS (SELECT DISTINCT l_orderkey FROM lineitem)
        |SELECT CASE
        |    WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL THEN 'both'
        |    WHEN l_orderkey IS NULL THEN 'order_only'
        |    ELSE 'lineitem_only' END AS side,
        |  count(*)::BIGINT AS n_keys
        |FROM o FULL OUTER JOIN l ON o_orderkey = l_orderkey
        |GROUP BY side ORDER BY side""".stripMargin,
    // bucketing is physical layout, not semantics: the oracle is the
    // plain join/aggregate over the raw tables
    "rel_bucketed_join" ->
      """SELECT c_nationkey, count(*)::BIGINT AS n_orders,
        |  sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS total_spend
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // partition pruning is a pure I/O optimization: the pruned scan
    // must equal the same relation over the unpartitioned table
    "src_pruned_scan" ->
      """SELECT source, lang, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS sum_chars
        |FROM documents WHERE source IN ('src3', 'src7')
        |GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    // round-trip parity computed from the ORIGINAL table — any
    // serializer mangle flips the checksum; the streaming file-sink
    // twin shares it
    "src_json_roundtrip" -> jsonParityOracle,
    "src_csv_roundtrip" -> jsonParityOracle,
    "stream_json_sink" -> jsonParityOracle,
    // same normalize/interleave/bucket arithmetic, DuckDB operator
    // spelling of the interleave (generated next to the Spark spelling
    // in graft.ops.Layout so the two can never drift)
    "src_zorder" ->
      s"""WITH rows0 AS (
        |  SELECT o_orderkey AS ok, o_custkey AS ck,
        |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day
        |  FROM orders),
        |c AS (SELECT min(ck) AS ck_min, min(day) AS day_min,
        |             min(ok) AS ok_min, max(ok) AS ok_max FROM rows0),
        |n AS (SELECT ok, ck, day, ck - ck_min AS ckn, day - day_min AS dayn,
        |             ok_min, ok_max FROM rows0 CROSS JOIN c),
        |zz AS (SELECT *, ${graft.ops.Layout.zExprDuckDb("ckn", "dayn", 16)} AS z FROM n),
        |zc AS (SELECT min(z) AS z_min, max(z) AS z_max FROM zz),
        |b AS (SELECT zz.*,
        |        (16 * (ok - ok_min)) // (ok_max - ok_min + 1) AS bucket_nat,
        |        (16 * (z - z_min)) // (z_max - z_min + 1) AS bucket_z
        |      FROM zz CROSS JOIN zc)
        |SELECT layout, bucket, n_rows, ck_span, day_span FROM (
        |  SELECT 'natural' AS layout, bucket_nat AS bucket,
        |    count(*)::BIGINT AS n_rows, (max(ck) - min(ck))::BIGINT AS ck_span,
        |    (max(day) - min(day))::BIGINT AS day_span
        |  FROM b GROUP BY bucket_nat
        |  UNION ALL
        |  SELECT 'zorder' AS layout, bucket_z AS bucket,
        |    count(*)::BIGINT AS n_rows, (max(ck) - min(ck))::BIGINT AS ck_span,
        |    (max(day) - min(day))::BIGINT AS day_span
        |  FROM b GROUP BY bucket_z)
        |ORDER BY layout, bucket""".stripMargin,
    // the MV oracle recomputes the monthly aggregate DIRECTLY over the
    // full table: a pass proves merge(base, delta) == recompute(all)
    "rel_mv_merge" ->
      """SELECT o_orderpriority,
        |  (year(o_orderdate) * 100 + month(o_orderdate))::BIGINT AS yyyymm,
        |  count(*)::BIGINT AS n,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
        |  min(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS min_cents,
        |  max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS max_cents,
        |  (CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    // count(*))::BIGINT AS avg_cents
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // k-core peel replay: three chained filter rounds over the same
    // ratio-thresholded edge set, final degrees over the peeled graph
    "graph_kcore" ->
      """WITH so AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
        |no AS (SELECT s, count(*)::BIGINT AS n_orders FROM so GROUP BY s),
        |ew AS (
        |  SELECT a.s AS u, b.s AS v, count(*)::BIGINT AS shared
        |  FROM so a JOIN so b ON a.ok = b.ok AND a.s < b.s
        |  GROUP BY 1, 2),
        |e0 AS (
        |  SELECT u, v FROM ew
        |  JOIN no nu ON nu.s = ew.u JOIN no nv ON nv.s = ew.v
        |  WHERE (1000000 * shared) // least(nu.n_orders, nv.n_orders) >= 10000),
        |s1 AS (SELECT n FROM (SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0)
        |       GROUP BY n HAVING count(*) >= 3),
        |e1 AS (SELECT u, v FROM e0
        |  WHERE u IN (SELECT n FROM s1) AND v IN (SELECT n FROM s1)),
        |s2 AS (SELECT n FROM (SELECT u AS n FROM e1 UNION ALL SELECT v AS n FROM e1)
        |       GROUP BY n HAVING count(*) >= 3),
        |e2 AS (SELECT u, v FROM e1
        |  WHERE u IN (SELECT n FROM s2) AND v IN (SELECT n FROM s2)),
        |s3 AS (SELECT n FROM (SELECT u AS n FROM e2 UNION ALL SELECT v AS n FROM e2)
        |       GROUP BY n HAVING count(*) >= 3),
        |e3 AS (SELECT u, v FROM e2
        |  WHERE u IN (SELECT n FROM s3) AND v IN (SELECT n FROM s3))
        |SELECT node, count(*)::BIGINT AS d
        |FROM (SELECT u AS node FROM e3 UNION ALL SELECT v AS node FROM e3)
        |GROUP BY node ORDER BY node""".stripMargin,
    // HITS replay: three chained (auth, hub) rounds, HUGEINT sums,
    // floor-div rescale, top-10 per role
    "graph_hits" ->
      s"""WITH so AS (
         |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |h0 AS (SELECT DISTINCT c, 1000000::HUGEINT AS score FROM so),
         |${hitsRound(1)},
         |${hitsRound(2)},
         |${hitsRound(3)},
         |ta AS (
         |  SELECT 'authority' AS kind, s AS node, score::BIGINT AS score_micros
         |  FROM a3 ORDER BY score DESC, s ASC LIMIT 10),
         |th AS (
         |  SELECT 'hub' AS kind, c AS node, score::BIGINT AS score_micros
         |  FROM h3 ORDER BY score DESC, c ASC LIMIT 10)
         |SELECT kind, node, score_micros
         |FROM (SELECT * FROM ta UNION ALL SELECT * FROM th)
         |ORDER BY kind, score_micros DESC, node""".stripMargin,
    // LPA replay: three chained vote/argmax rounds over the same
    // ratio-thresholded edge set; tie order (cnt DESC, label ASC)
    // mirrors max(struct(cnt, -label))
    "graph_communities" ->
      """WITH so AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
        |no AS (SELECT s, count(*)::BIGINT AS n_orders FROM so GROUP BY s),
        |ew AS (
        |  SELECT a.s AS u, b.s AS v, count(*)::BIGINT AS shared
        |  FROM so a JOIN so b ON a.ok = b.ok AND a.s < b.s
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT u, v FROM ew
        |  JOIN no nu ON nu.s = ew.u JOIN no nv ON nv.s = ew.v
        |  WHERE (1000000 * shared) // least(nu.n_orders, nv.n_orders) >= 10000),
        |sym AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
        |l0 AS (SELECT DISTINCT src AS n, src AS label FROM sym),
        |v1 AS (SELECT src, label, count(*)::BIGINT AS cnt
        |       FROM sym JOIN l0 ON sym.dst = l0.n GROUP BY 1, 2),
        |l1 AS (SELECT src AS n, label FROM (
        |  SELECT src, label,
        |    row_number() OVER (PARTITION BY src ORDER BY cnt DESC, label ASC) AS rk
        |  FROM v1) WHERE rk = 1),
        |v2 AS (SELECT src, label, count(*)::BIGINT AS cnt
        |       FROM sym JOIN l1 ON sym.dst = l1.n GROUP BY 1, 2),
        |l2 AS (SELECT src AS n, label FROM (
        |  SELECT src, label,
        |    row_number() OVER (PARTITION BY src ORDER BY cnt DESC, label ASC) AS rk
        |  FROM v2) WHERE rk = 1),
        |v3 AS (SELECT src, label, count(*)::BIGINT AS cnt
        |       FROM sym JOIN l2 ON sym.dst = l2.n GROUP BY 1, 2),
        |l3 AS (SELECT src AS n, label FROM (
        |  SELECT src, label,
        |    row_number() OVER (PARTITION BY src ORDER BY cnt DESC, label ASC) AS rk
        |  FROM v3) WHERE rk = 1)
        |SELECT n AS node, label AS community FROM l3 ORDER BY node""".stripMargin,
    // triangle census: same degree-ordered orientation, wedge self-join
    // on the oriented low endpoint, EXISTS closure on the canonical
    // edge set
    "graph_triangles" ->
      """WITH so AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
        |no AS (SELECT s, count(*)::BIGINT AS n_orders FROM so GROUP BY s),
        |ew AS (
        |  SELECT a.s AS u, b.s AS v, count(*)::BIGINT AS shared
        |  FROM so a JOIN so b ON a.ok = b.ok AND a.s < b.s
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT u, v FROM ew
        |  JOIN no nu ON nu.s = ew.u JOIN no nv ON nv.s = ew.v
        |  WHERE (1000000 * shared) // least(nu.n_orders, nv.n_orders) >= 10000),
        |deg AS (
        |  SELECT n, count(*)::BIGINT AS d
        |  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        |  GROUP BY n),
        |ed AS (
        |  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS lo,
        |         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS hi
        |  FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v),
        |w AS (
        |  SELECT e1.hi AS u, e2.hi AS v
        |  FROM ed e1 JOIN ed e2 ON e1.lo = e2.lo AND e1.hi < e2.hi),
        |t AS (
        |  SELECT count(*)::BIGINT AS n_triangles FROM w
        |  WHERE EXISTS (SELECT 1 FROM e WHERE e.u = w.u AND e.v = w.v)),
        |st AS (
        |  SELECT count(*)::BIGINT AS n_nodes, (sum(d) / 2)::BIGINT AS n_edges,
        |    sum((d * (d - 1)) // 2)::BIGINT AS n_wedges
        |  FROM deg)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  CASE WHEN n_wedges > 0 THEN (3000 * n_triangles) // n_wedges
        |    ELSE 0 END AS global_cc_milli
        |FROM st, t""".stripMargin,
    // the oracle replays the integral-rank propagation as three chained
    // CTE rounds — same fixed-point formula, floor division throughout
    "graph_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o.o_custkey AS c, 1000000 + l.l_suppkey AS s
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edges AS (
        |  SELECT c AS src, s AS dst FROM pairs
        |  UNION ALL
        |  SELECT s AS src, c AS dst FROM pairs),
        |deg AS (SELECT src AS node, count(*)::BIGINT AS outdeg
        |        FROM edges GROUP BY src),
        |r0 AS (SELECT node, 1000000::BIGINT AS r FROM deg),
        |r1 AS (SELECT e.dst AS node,
        |         (150000 + (85 * CAST(sum(p.r // d.outdeg) AS BIGINT)) // 100)::BIGINT AS r
        |       FROM edges e JOIN r0 p ON e.src = p.node
        |         JOIN deg d ON e.src = d.node GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS node,
        |         (150000 + (85 * CAST(sum(p.r // d.outdeg) AS BIGINT)) // 100)::BIGINT AS r
        |       FROM edges e JOIN r1 p ON e.src = p.node
        |         JOIN deg d ON e.src = d.node GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS node,
        |         (150000 + (85 * CAST(sum(p.r // d.outdeg) AS BIGINT)) // 100)::BIGINT AS r
        |       FROM edges e JOIN r2 p ON e.src = p.node
        |         JOIN deg d ON e.src = d.node GROUP BY e.dst)
        |SELECT node,
        |  CASE WHEN node >= 1000000 THEN 'supplier' ELSE 'customer' END AS kind,
        |  r AS rank_micros
        |FROM r3 ORDER BY rank_micros DESC, node ASC LIMIT 20""".stripMargin,
    // Q17 shape: decorrelated per-part avg, integer cross-multiplied
    // 0.2x threshold, decimal money sum surfaced as double
    "rel_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l.l_partkey, l_quantity::BIGINT AS qty, l_extendedprice
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#1'),
        |a AS (
        |  SELECT l_partkey, sum(qty)::BIGINT AS sum_qty,
        |    count(*)::BIGINT AS n_lines
        |  FROM li GROUP BY l_partkey)
        |SELECT count(DISTINCT li.l_partkey)::BIGINT AS n_parts,
        |  count(*)::BIGINT AS n_small_lines,
        |  sum(li.l_extendedprice::DECIMAL(18,2))::DOUBLE AS small_revenue
        |FROM li JOIN a ON li.l_partkey = a.l_partkey
        |WHERE li.qty * 5 * a.n_lines < a.sum_qty""".stripMargin,
    // Q21 shape: per-(order, supplier) lateness, EXISTS another
    // participant, NOT EXISTS another late one, blame rollup
    "rel_waiting_suppliers" ->
      """WITH so AS (
        |  SELECT l.l_orderkey AS ok, l.l_suppkey AS s,
        |    max(CASE WHEN epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
        |      > 60::BIGINT * 86400 * 1000000 THEN 1 ELSE 0 END) AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |late AS (SELECT ok, s FROM so WHERE late = 1),
        |blame AS (
        |  SELECT l.ok, l.s FROM late l
        |  WHERE EXISTS (SELECT 1 FROM so p WHERE p.ok = l.ok AND p.s <> l.s)
        |    AND NOT EXISTS (SELECT 1 FROM late o WHERE o.ok = l.ok AND o.s <> l.s))
        |SELECT sup.s_name, count(*)::BIGINT AS numwait
        |FROM blame b JOIN supplier sup ON b.s = sup.s_suppkey
        |GROUP BY sup.s_name
        |ORDER BY numwait DESC, sup.s_name LIMIT 20""".stripMargin,
    // Q8 market share: integral units = cents x (100 - discount pct),
    // HUGEINT accumulation mirrors the DECIMAL(38,0) sums
    "rel_market_share" ->
      """WITH market AS (
        |  SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |sn AS (
        |  SELECT s_suppkey, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey),
        |f AS (
        |  SELECT year(o_orderdate)::BIGINT AS o_year, sn.n_name,
        |    (CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)))::HUGEINT
        |      AS units
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN market ON o_custkey = c_custkey
        |  JOIN sn ON l_suppkey = s_suppkey),
        |g AS (
        |  SELECT o_year, n_name, count(*)::BIGINT AS n_items,
        |    sum(units) AS units
        |  FROM f GROUP BY 1, 2)
        |SELECT o_year, n_name, n_items,
        |  ((1000000 * units) // sum(units) OVER (PARTITION BY o_year))::BIGINT
        |    AS share_ppm
        |FROM g ORDER BY o_year, n_name""".stripMargin,
    // sweep line: per-day boundary deltas, one running sum
    "rel_open_orders" ->
      """WITH b AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS day, 1::BIGINT AS d
        |  FROM orders
        |  UNION ALL
        |  SELECT epoch_us(o_orderdate) // 86400000000 + 30, -1::BIGINT
        |  FROM orders),
        |g AS (SELECT day, sum(d)::BIGINT AS delta FROM b GROUP BY day)
        |SELECT day, delta,
        |  sum(delta) OVER (ORDER BY day)::BIGINT AS n_open
        |FROM g ORDER BY day""".stripMargin,
    // RFM: one user rollup against the broadcast corpus max day; the
    // Complete-mode streaming twin maintains the identical relation
    "ev_rfm" -> rfmOracle,
    "stream_rfm" -> rfmOracle,
    // forget sweep: per-relation deletion reach incl. the order ->
    // lineitem cascade
    "rel_forget_sweep" ->
      """WITH delc AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |delo AS (SELECT o_orderkey FROM orders
        |         WHERE o_custkey IN (SELECT c_custkey FROM delc)),
        |u AS (
        |  SELECT 'customer' AS relation, count(*)::BIGINT AS n_rows,
        |    sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_deleted
        |  FROM customer
        |  UNION ALL
        |  SELECT 'orders', count(*)::BIGINT,
        |    sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM delc)
        |        THEN 1 ELSE 0 END)::BIGINT
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem', count(*)::BIGINT,
        |    sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM delo)
        |        THEN 1 ELSE 0 END)::BIGINT
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'events', count(*)::BIGINT,
        |    sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)::BIGINT
        |  FROM events)
        |SELECT relation, n_rows, n_deleted,
        |  ((1000 * n_deleted) // n_rows)::BIGINT AS share_milli
        |FROM u ORDER BY relation""".stripMargin,
    // Q22: the same cross-multiplied average compare, NOT EXISTS anti
    "rel_idle_customers" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM customer),
        |st AS (
        |  SELECT count(*)::BIGINT AS n_pos, sum(bal_cents)::BIGINT AS sum_pos
        |  FROM cust WHERE bal_cents > 0)
        |SELECT c_mktsegment, count(*)::BIGINT AS n_custs,
        |  sum(bal_cents)::BIGINT AS total_bal_cents
        |FROM cust CROSS JOIN st
        |WHERE bal_cents * n_pos > sum_pos
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // skew bands: floor(log2(cnt)) as binary digit count — DuckDB bin()
    // and Spark bin() render identically (no leading zeros)
    "rel_skew_audit" ->
      """WITH c1 AS (SELECT count(*)::BIGINT AS cnt FROM lineitem GROUP BY l_orderkey),
        |c2 AS (SELECT count(*)::BIGINT AS cnt FROM orders GROUP BY o_custkey),
        |c3 AS (SELECT count(*)::BIGINT AS cnt FROM events GROUP BY user_id),
        |h AS (
        |  SELECT 'lineitem.l_orderkey' AS relation, cnt FROM c1
        |  UNION ALL SELECT 'orders.o_custkey', cnt FROM c2
        |  UNION ALL SELECT 'events.user_id', cnt FROM c3)
        |SELECT relation, (length(bin(cnt)) - 1)::BIGINT AS band_log2,
        |  count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS n_rows,
        |  max(cnt)::BIGINT AS max_cnt
        |FROM h GROUP BY relation, band_log2
        |ORDER BY relation, band_log2""".stripMargin,
    "rel_dq_audit" ->
      """WITH o AS (SELECT count(*) AS n,
        |    count(*) - count(DISTINCT o_orderkey) AS dup_keys,
        |    sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos,
        |    sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS over_100k
        |  FROM orders),
        |l AS (SELECT count(*) AS n,
        |    sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS disc_over,
        |    sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS qty_out
        |  FROM lineitem),
        |fk AS (SELECT count(*) AS orphans FROM orders o2 WHERE NOT EXISTS
        |  (SELECT 1 FROM customer c WHERE c.c_custkey = o2.o_custkey))
        |SELECT rule, n_checked, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'lineitem.discount_le_5pct' AS rule, l.n::BIGINT AS n_checked,
        |    l.disc_over::BIGINT AS n_violations FROM l
        |  UNION ALL SELECT 'lineitem.quantity_in_1_50', l.n::BIGINT,
        |    l.qty_out::BIGINT FROM l
        |  UNION ALL SELECT 'orders.custkey_in_customer', o.n::BIGINT,
        |    fk.orphans::BIGINT FROM o, fk
        |  UNION ALL SELECT 'orders.orderkey_unique', o.n::BIGINT,
        |    o.dup_keys::BIGINT FROM o
        |  UNION ALL SELECT 'orders.totalprice_le_100k', o.n::BIGINT,
        |    o.over_100k::BIGINT FROM o
        |  UNION ALL SELECT 'orders.totalprice_positive', o.n::BIGINT,
        |    o.nonpos::BIGINT FROM o)
        |ORDER BY rule""".stripMargin,
    "rel_churn" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE year(o_orderdate) = 1995),
        |     b AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE year(o_orderdate) = 1996)
        |SELECT segment, o_custkey FROM (
        |  SELECT 'churned' AS segment, o_custkey FROM
        |    (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        |  UNION ALL
        |  SELECT 'retained' AS segment, o_custkey FROM
        |    (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        |  UNION ALL
        |  SELECT 'new' AS segment, o_custkey FROM
        |    (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a))
        |ORDER BY segment, o_custkey""".stripMargin,
    // the oracle recomputes the exact quantile comparators: n_docs and
    // the interpolated median must match exactly, and asserting TRUE on
    // the three gate flags verifies Spark's GK sketch landed within the
    // q±5% exact-quantile envelope (not a vacuous constant)
    "text_len_quantiles" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |  quantile_cont(n_chars, 0.5) AS p50_chars,
        |  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "ev_tumbling" ->
      """SELECT ((epoch_us(ts) // 1000000) // 3600) * 3600 AS win_start, event_type,
        |  count(*)::BIGINT AS n,
        |  sum(CAST(value AS DECIMAL(18,6)))::DOUBLE AS sum_value
        |FROM events
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    "ev_sliding" ->
      """WITH base AS (
        |  SELECT ((epoch_us(ts) // 1000000) // 1800) * 1800 AS base, event_type FROM events),
        |ex AS (SELECT base - off AS win_start, event_type FROM base, UNNEST([0, 1800]) AS t(off))
        |SELECT win_start, event_type, count(*)::BIGINT AS n
        |FROM ex GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    "ev_sessions" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS tsec, ts, event_id FROM events),
        |flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(tsec) OVER w IS NULL OR tsec - lag(tsec) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |numbered AS (
        |  SELECT user_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM flagged),
        |per_sess AS (
        |  SELECT user_id, sess_id, count(*)::BIGINT AS sess_events
        |  FROM numbered GROUP BY user_id, sess_id)
        |SELECT user_id, count(*)::BIGINT AS n_sessions,
        |  max(sess_events)::BIGINT AS max_session_events
        |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_daily_top" -> dailyTopOracle,
    // the custom-aggregate twin produces the identical relation (same
    // total order), so the window oracle replays it verbatim
    "ev_daily_top_agg" -> dailyTopOracle,
    // the SQL-surface twin of the custom aggregate — same relation again
    "sql_topk" -> dailyTopOracle,
    // disorder histogram: per-user running max over arrival order,
    // fixed 6-bucket rollup, integer milli shares
    "ev_lateness" ->
      """WITH e AS (
        |  SELECT event_id, user_id, (epoch_us(ts) // 1000000) AS tsec
        |  FROM events),
        |d AS (
        |  SELECT greatest(0, coalesce(
        |      max(tsec) OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - tsec,
        |      0))::BIGINT AS disorder_s
        |  FROM e),
        |b AS (
        |  SELECT CASE WHEN disorder_s = 0 THEN 0
        |    WHEN disorder_s <= 60 THEN 1
        |    WHEN disorder_s <= 300 THEN 2
        |    WHEN disorder_s <= 900 THEN 3
        |    WHEN disorder_s <= 3600 THEN 4
        |    ELSE 5 END::BIGINT AS bucket, disorder_s
        |  FROM d),
        |h AS (
        |  SELECT bucket, count(*)::BIGINT AS n_events,
        |    max(disorder_s)::BIGINT AS max_disorder_s
        |  FROM b GROUP BY bucket)
        |SELECT bucket, n_events, max_disorder_s,
        |  ((1000 * n_events) // sum(n_events) OVER ())::BIGINT AS share_milli
        |FROM h ORDER BY bucket""".stripMargin,
    // RANGE frame: DuckDB spells the same value-based trailing window
    "ev_range_frame" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    (epoch_us(ts) // 1000000) AS tsec
        |  FROM events)
        |SELECT event_id, user_id, event_type, tsec,
        |  count(*) OVER (PARTITION BY user_id, event_type ORDER BY tsec
        |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)::BIGINT AS n_user_hour
        |FROM e ORDER BY event_id""".stripMargin,
    // grouping-sets mirror: identical level set, identical grouping()
    // flags, NULL group columns constant within each level so the
    // cross-engine NULL sort order never participates in the ORDER BY
    "rel_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  count(*)::BIGINT AS n,
        |  sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |                        (o_orderpriority), (o_orderstatus), ())
        |ORDER BY g_pri, g_status, o_orderpriority, o_orderstatus""".stripMargin,
    // as-of attribution: same deterministic carry-forward formulation
    // (total order: ts, views-before-purchases, event_id) — DuckDB's
    // native ASOF JOIN leaves equal-ts ties implementation-defined, so
    // the oracle spells the window out instead
    "ev_asof_attribution" -> asofOracle,
    // the stateful ingest twin maintains the identical relation
    "stream_attribution" -> asofOracle,
    // batch interval join: the oracle states the relation as the plain
    // theta-join — the bucketed equi-join must produce exactly it
    "ev_interval_join" ->
      """SELECT p.event_id AS purchase_event_id, p.user_id,
        |  epoch_us(p.ts) AS purchase_tus,
        |  v.event_id AS view_event_id, epoch_us(v.ts) AS view_tus,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
        |FROM events p JOIN events v
        |  ON p.user_id = v.user_id
        | AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND epoch_us(v.ts) <= epoch_us(p.ts)
        | AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000
        |ORDER BY purchase_event_id, view_event_id""".stripMargin,
    // funnel: the oracle states reach times as dependent aggregations
    // (t2 from t1, t3 from t2) — the windowed single-shuffle plan must
    // reproduce them exactly, non-strict (>=) chaining
    "ev_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |t1 AS (
        |  SELECT user_id, min(tus) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, min(e.tus) AS t FROM e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.tus >= t1.t GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, min(e.tus) AS t FROM e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.tus >= t2.t GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1::BIGINT AS step_idx, 'view' AS step, count(*)::BIGINT AS n_users FROM t1
        |  UNION ALL
        |  SELECT 2::BIGINT, 'click', count(*)::BIGINT FROM t2
        |  UNION ALL
        |  SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM t3)
        |ORDER BY step_idx""".stripMargin,
    // windowed funnel replay: the same chained min-aggregations with
    // the 1-hour bound on each conversion hop
    "ev_funnel_windowed" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |t1 AS (
        |  SELECT user_id, min(tus) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, min(e.tus) AS t FROM e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.tus >= t1.t
        |    AND e.tus <= t1.t + 3600000000 GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, min(e.tus) AS t FROM e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.tus >= t2.t
        |    AND e.tus <= t2.t + 3600000000 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1::BIGINT AS step_idx, 'view' AS step, count(*)::BIGINT AS n_users FROM t1
        |  UNION ALL
        |  SELECT 2::BIGINT, 'click', count(*)::BIGINT FROM t2
        |  UNION ALL
        |  SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM t3)
        |ORDER BY step_idx""".stripMargin,
    // grouped sketch gate: the oracle recomputes the exact side and
    // requires the in-plan tolerance check to have passed
    "ev_approx_users" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact,
        |  TRUE AS within_tolerance
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // quantile sketch gate replay: the oracle recomputes the exact
    // disc quantiles (value at the ceil-rank) and requires the in-plan
    // rank-tolerance check to have passed
    "ev_approx_quantiles" ->
      """WITH e AS (
        |  SELECT event_type, floor(value * 1000000)::BIGINT AS vm
        |  FROM events WHERE value IS NOT NULL),
        |n AS (SELECT event_type, count(*)::BIGINT AS n FROM e GROUP BY event_type),
        |r AS (
        |  SELECT event_type, vm,
        |    row_number() OVER (PARTITION BY event_type ORDER BY vm ASC) AS rk
        |  FROM e),
        |x AS (
        |  SELECT n.event_type, p.pct::BIGINT AS pct, n.n,
        |    (n.n * p.pct + 99) // 100 AS tr
        |  FROM n, (VALUES (50), (90), (99)) AS p(pct))
        |SELECT x.event_type, x.pct, x.n, r.vm AS exact_micros,
        |  TRUE AS within_tolerance
        |FROM x JOIN r ON r.event_type = x.event_type AND r.rk = x.tr
        |ORDER BY x.event_type, x.pct""".stripMargin,
    // changelog compaction: the oracle states last-write-wins as a
    // rank-1 window at MICROS resolution, ties by event_id
    "ev_latest_state" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type,
        |    floor(value * 1000000)::BIGINT AS vm
        |  FROM events),
        |r AS (
        |  SELECT user_id, tus, event_id, event_type, vm,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY tus DESC, event_id DESC) AS rn
        |  FROM e)
        |SELECT user_id, tus AS last_tus, event_id AS last_event_id,
        |  event_type AS last_event_type, vm AS last_value_micros
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "ev_bursts" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus FROM events),
        |l AS (
        |  SELECT event_type,
        |    (lag(tus) OVER (PARTITION BY user_id, event_type
        |       ORDER BY tus ASC, event_id ASC)) AS prev, tus
        |  FROM e)
        |SELECT event_type, count(*)::BIGINT AS n_events,
        |  sum(CASE WHEN prev IS NOT NULL AND tus - prev <= 60000000
        |      THEN 1 ELSE 0 END)::BIGINT AS n_duplicates,
        |  (sum(CASE WHEN prev IS NOT NULL AND tus - prev <= 60000000
        |       THEN 1 ELSE 0 END) * 1000 // count(*))::BIGINT AS dup_milli
        |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ev_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
        |l AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tus ASC, event_id ASC) AS prev_type,
        |    event_type AS next_type
        |  FROM e),
        |t AS (
        |  SELECT prev_type, next_type, count(*)::BIGINT AS n
        |  FROM l WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type)
        |SELECT prev_type, next_type, n,
        |  ((1000000 * n) // (sum(n) OVER (PARTITION BY prev_type)))::BIGINT AS rate_ppm
        |FROM t ORDER BY prev_type, next_type""".stripMargin,
    "ev_moving_avg" ->
      """WITH daily AS (
        |  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS day,
        |    event_type, count(*)::BIGINT AS n
        |  FROM events GROUP BY day, event_type)
        |SELECT day, event_type, n,
        |  ((1000 * sum(n) OVER w) // (count(*) OVER w))::BIGINT AS avg_milli
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day ASC
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,
    "ev_daily_new_users" ->
      """WITH fd AS (
        |  SELECT user_id, min((epoch_us(ts) // 86400000000) * 86400) AS first_day
        |  FROM events GROUP BY user_id),
        |daily AS (
        |  SELECT first_day AS day, count(*)::BIGINT AS n_new_users
        |  FROM fd GROUP BY first_day)
        |SELECT day, n_new_users,
        |  sum(n_new_users) OVER (ORDER BY day ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS n_cumulative_users
        |FROM daily ORDER BY day""".stripMargin,
    // stickiness: same day bucketing; WAU via the x7 day-explode
    "ev_stickiness" ->
      """WITH du AS (
        |  SELECT DISTINCT (epoch_us(ts) // 86400000000) * 86400 AS day, user_id
        |  FROM events),
        |dau AS (SELECT day, count(*)::BIGINT AS dau FROM du GROUP BY day),
        |wx AS (
        |  SELECT DISTINCT day + k * 86400 AS day, user_id
        |  FROM du, UNNEST(range(0, 7)) AS u(k)),
        |wau AS (SELECT day, count(*)::BIGINT AS wau FROM wx GROUP BY day)
        |SELECT d.day, d.dau, w.wau, (1000 * d.dau) // w.wau AS stickiness_milli
        |FROM dau d JOIN wau w USING (day) ORDER BY day""".stripMargin,
    "ev_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    (epoch_us(ts) // 604800000000) * 604800 AS week
        |  FROM events),
        |c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id)
        |SELECT c.cohort_week, (uw.week - c.cohort_week) // 604800 AS week_offset,
        |  count(*)::BIGINT AS n_users
        |FROM uw JOIN c ON uw.user_id = c.user_id
        |GROUP BY c.cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // linear attribution: plain range join (oracle scale), same rank
    // order and remainder policy; shares sum back to purchase values
    "ev_attribution_linear" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus,
        |    floor(value * 1000)::BIGINT AS v
        |  FROM events),
        |t AS (SELECT user_id, event_type AS channel, event_id AS t_id, tus AS t_tus
        |      FROM ev WHERE event_type IN ('view', 'click')),
        |p AS (SELECT event_id AS p_id, user_id, tus AS p_tus, v AS v_milli
        |      FROM ev WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT p.p_id, p.v_milli, t.channel, t.t_tus, t.t_id
        |  FROM p JOIN t ON t.user_id = p.user_id
        |    AND t.t_tus >= p.p_tus - 604800000000 AND t.t_tus <= p.p_tus),
        |r AS (
        |  SELECT p_id, v_milli, channel,
        |    row_number() OVER (PARTITION BY p_id ORDER BY t_tus, t_id) AS rk,
        |    count(*) OVER (PARTITION BY p_id) AS n
        |  FROM c),
        |s AS (SELECT channel,
        |        v_milli // n + CASE WHEN rk <= v_milli % n THEN 1 ELSE 0 END AS share
        |      FROM r),
        |a AS (SELECT channel, count(*)::BIGINT AS n_touches,
        |        sum(share)::BIGINT AS attributed_milli
        |      FROM s GROUP BY channel),
        |d AS (SELECT 'direct' AS channel, count(*)::BIGINT AS n_touches,
        |        coalesce(sum(v_milli), 0)::BIGINT AS attributed_milli
        |      FROM p WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.p_id = p.p_id))
        |SELECT channel, n_touches, attributed_milli
        |FROM (SELECT * FROM a UNION ALL SELECT * FROM d)
        |ORDER BY channel""".stripMargin,
    // cohort LTV: the retention cohort CTE + purchase rollup + bounded
    // cumulative window
    "ev_cohort_revenue" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    (epoch_us(ts) // 604800000000) * 604800 AS week,
        |    floor(value * 1000)::BIGINT AS v_milli
        |  FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id),
        |wk AS (
        |  SELECT user_id, week, sum(v_milli)::BIGINT AS rev
        |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, week),
        |g AS (
        |  SELECT c.cohort_week, (wk.week - c.cohort_week) // 604800 AS week_offset,
        |    count(DISTINCT wk.user_id)::BIGINT AS n_buyers,
        |    sum(wk.rev)::BIGINT AS revenue_milli
        |  FROM wk JOIN c ON wk.user_id = c.user_id
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_buyers, revenue_milli,
        |  sum(revenue_milli) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset)::BIGINT AS cum_revenue_milli
        |FROM g ORDER BY cohort_week, week_offset""".stripMargin,
    "ev_props" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  sum(CASE WHEN json_extract_string(props, '$.k') IS NULL
        |      THEN 1 ELSE 0 END)::BIGINT AS n_null_props,
        |  sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        |  min(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS min_k,
        |  max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "text_stats" -> textStatsOracle,
    // the SQL-surface twin runs the identical relation through the
    // TokenCountRewrite path — same oracle by construction
    "sql_tokencount" -> textStatsOracle,
    "text_quality" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  length(text)::BIGINT AS n_chars,
        |  len(toks)::BIGINT AS n_tokens,
        |  CASE WHEN len(toks) > 0
        |    THEN floor((length(text) - (len(toks) - 1)) * 1000.0 / len(toks))::BIGINT
        |    ELSE NULL END AS mean_word_len_milli,
        |  (length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')))::BIGINT AS n_punct,
        |  len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','on')))::BIGINT AS n_stopwords,
        |  (len(toks) >= 10 AND len(toks) <= 100000
        |    AND len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','on'))) * 100 >= len(toks)) AS quality_keep
        |FROM d ORDER BY doc_id""".stripMargin,
    // Gopher rules: integer-milli ratios (// floors; Spark's double-div
    // + cast truncates — identical on these non-negative values)
    "text_gopher" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    len(toks)::BIGINT AS n_words,
        |    coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS char_mass,
        |    len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
        |    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
        |    ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS n_ellipsis,
        |    len(list_intersect(toks, ['the','a','of','and','to','in','is','on']))::BIGINT AS n_stop
        |  FROM t),
        |r AS (
        |  SELECT doc_id, n_words,
        |    CASE WHEN n_words > 0 THEN char_mass * 1000 // n_words END AS mean_word_len_milli,
        |    CASE WHEN n_words > 0 THEN n_alpha * 1000 // n_words END AS alpha_word_milli,
        |    CASE WHEN n_words > 0 THEN (n_hash + n_ellipsis) * 1000 // n_words END AS symbol_milli,
        |    n_stop AS n_stop_distinct
        |  FROM m)
        |SELECT doc_id, n_words, mean_word_len_milli, alpha_word_milli,
        |  symbol_milli, n_stop_distinct,
        |  (n_words >= 10 AND n_words <= 100000) AS r_words,
        |  (mean_word_len_milli IS NOT NULL
        |    AND mean_word_len_milli BETWEEN 3000 AND 10000) AS r_meanlen,
        |  (alpha_word_milli IS NOT NULL AND alpha_word_milli >= 800) AS r_alpha,
        |  (symbol_milli IS NOT NULL AND symbol_milli < 100) AS r_symbol,
        |  (n_stop_distinct >= 2) AS r_stop,
        |  ((n_words >= 10 AND n_words <= 100000)
        |    AND (mean_word_len_milli IS NOT NULL
        |         AND mean_word_len_milli BETWEEN 3000 AND 10000)
        |    AND (alpha_word_milli IS NOT NULL AND alpha_word_milli >= 800)
        |    AND (symbol_milli IS NOT NULL AND symbol_milli < 100)
        |    AND n_stop_distinct >= 2) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    // cascade replay: gopher rule CTEs + the classifier fold + the
    // ordered CASE chain, per-source attribution histogram; the
    // stateless streaming twin shares it
    "pipeline_cascade" -> cascadeOracle,
    "stream_cascade" -> cascadeOracle,
    // OOV: vocabulary cut is deterministic (count desc, token asc)
    "text_oov" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t -> length(t) > 0)) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
        |    ORDER BY cnt DESC, tok ASC LIMIT 10)),
        |j AS (
        |  SELECT t.doc_id, t.tok, v.tok IS NOT NULL AS in_vocab
        |  FROM tok t LEFT JOIN vocab v ON t.tok = v.tok)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  sum(CASE WHEN in_vocab THEN 0 ELSE 1 END)::BIGINT AS n_oov,
        |  (sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) * 1000 // count(*))::BIGINT AS oov_milli
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // quality drift report: gopher rule columns grouped per source
    "text_quality_report" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |    len(toks)::BIGINT AS n_words,
        |    coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS char_mass,
        |    len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
        |    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
        |    ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS n_ellipsis,
        |    len(list_intersect(toks, ['the','a','of','and','to','in','is','on']))::BIGINT AS n_stop
        |  FROM t),
        |r AS (
        |  SELECT source,
        |    (n_words >= 10 AND n_words <= 100000) AS r_words,
        |    (CASE WHEN n_words > 0 THEN char_mass * 1000 // n_words END)
        |      BETWEEN 3000 AND 10000 AS r_meanlen,
        |    (CASE WHEN n_words > 0 THEN n_alpha * 1000 // n_words END) >= 800 AS r_alpha,
        |    (CASE WHEN n_words > 0 THEN (n_hash + n_ellipsis) * 1000 // n_words END) < 100 AS r_symbol,
        |    n_stop >= 2 AS r_stop
        |  FROM m)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  (sum(CASE WHEN r_words THEN 0 ELSE 1 END) * 1000 // count(*))::BIGINT AS rej_words_milli,
        |  (sum(CASE WHEN coalesce(r_meanlen, FALSE) THEN 0 ELSE 1 END) * 1000 // count(*))::BIGINT AS rej_meanlen_milli,
        |  (sum(CASE WHEN coalesce(r_alpha, FALSE) THEN 0 ELSE 1 END) * 1000 // count(*))::BIGINT AS rej_alpha_milli,
        |  (sum(CASE WHEN coalesce(r_symbol, FALSE) THEN 0 ELSE 1 END) * 1000 // count(*))::BIGINT AS rej_symbol_milli,
        |  (sum(CASE WHEN r_stop THEN 0 ELSE 1 END) * 1000 // count(*))::BIGINT AS rej_stop_milli,
        |  (sum(CASE WHEN r_words AND coalesce(r_meanlen, FALSE)
        |        AND coalesce(r_alpha, FALSE) AND coalesce(r_symbol, FALSE)
        |        AND r_stop THEN 1 ELSE 0 END) * 1000 // count(*))::BIGINT AS keep_milli
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    // pivot: the oracle spells the declared columns as CASE counts
    "text_pivot" ->
      """SELECT source,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
        |  sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS n_de,
        |  sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)::BIGINT AS n_es,
        |  sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)::BIGINT AS n_fr,
        |  sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::BIGINT AS n_zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // tokenize: same vocab as text_oov (top-10 by cnt desc, token asc),
    // ids by rank, 0 = OOV; the ordered id sequence is md5-proven
    "text_tokenize" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |vc AS (
        |  SELECT token, count(*)::BIGINT AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0 GROUP BY token
        |  ORDER BY cnt DESC, token ASC LIMIT 10),
        |vocab AS (
        |  SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC)::BIGINT AS id
        |  FROM vc),
        |t AS (
        |  SELECT doc_id, i AS pos, toks[i+1] AS w
        |  FROM toks, UNNEST(range(0, len(toks))) AS u(i)),
        |m AS (
        |  SELECT t.doc_id, t.pos, coalesce(v.id, 0) AS tid
        |  FROM t LEFT JOIN vocab v ON t.w = v.token)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
        |  md5(string_agg(tid::VARCHAR, ',' ORDER BY pos)) AS seq_md5
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the unpivot round-trip must land on the DIRECT long-form counts
    "text_unpivot" ->
      """SELECT source, lang, count(*)::BIGINT AS n
        |FROM documents WHERE lang IN ('en', 'de', 'es', 'fr', 'zh')
        |GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    "text_ntile" ->
      """WITH b AS (
        |  SELECT source, n_chars,
        |    ntile(4) OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC)
        |      AS quartile
        |  FROM documents)
        |SELECT source, quartile::BIGINT AS quartile, count(*)::BIGINT AS n_docs,
        |  min(n_chars)::BIGINT AS min_chars, max(n_chars)::BIGINT AS max_chars
        |FROM b GROUP BY source, quartile ORDER BY source, quartile""".stripMargin,
    "text_langid" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    list_sort([
        |      {'neg': -len(list_filter(toks, t -> t IN ('der','und','die','nicht','das'))), 'lang': 'de'},
        |      {'neg': -len(list_filter(toks, t -> t IN ('the','and','of','to','is'))), 'lang': 'en'},
        |      {'neg': -len(list_filter(toks, t -> t IN ('el','la','los','que','de'))), 'lang': 'es'},
        |      {'neg': -len(list_filter(toks, t -> t IN ('le','la','les','et','est'))), 'lang': 'fr'},
        |      {'neg': -len(list_filter(toks, t -> t IN ('的','是','不','了','在'))), 'lang': 'zh'}
        |    ])[1] AS best
        |  FROM d)
        |SELECT doc_id, labeled_lang, best.lang AS pred_lang, (-best.neg)::BIGINT AS pred_hits
        |FROM scored ORDER BY doc_id""".stripMargin,
    // lexical richness: (source, token) counts then per-source rollup
    "text_lexical_richness" ->
      """WITH t AS (
        |  SELECT source, unnest(list_filter(string_split(lower(text), ' '),
        |    x -> length(x) > 0)) AS token
        |  FROM documents),
        |g AS (SELECT source, token, count(*)::BIGINT AS n FROM t GROUP BY 1, 2),
        |r AS (
        |  SELECT source, sum(n)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
        |    sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
        |  FROM g GROUP BY source)
        |SELECT source, n_tokens, n_types, n_hapax,
        |  ((1000 * n_types) // n_tokens)::BIGINT AS ttr_milli,
        |  ((1000 * n_hapax) // n_types)::BIGINT AS hapax_milli
        |FROM r ORDER BY source""".stripMargin,
    // confusion rollup over the same scored CTE, per-labeled-lang
    // row shares in millis
    "text_langid_confusion" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    list_sort([
        |      {'neg': -len(list_filter(toks, t -> t IN ('der','und','die','nicht','das'))), 'lang': 'de'},
        |      {'neg': -len(list_filter(toks, t -> t IN ('the','and','of','to','is'))), 'lang': 'en'},
        |      {'neg': -len(list_filter(toks, t -> t IN ('el','la','los','que','de'))), 'lang': 'es'},
        |      {'neg': -len(list_filter(toks, t -> t IN ('le','la','les','et','est'))), 'lang': 'fr'},
        |      {'neg': -len(list_filter(toks, t -> t IN ('的','是','不','了','在'))), 'lang': 'zh'}
        |    ])[1] AS best
        |  FROM d),
        |g AS (
        |  SELECT labeled_lang, best.lang AS pred_lang, count(*)::BIGINT AS n_docs,
        |    sum(CASE WHEN -best.neg = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero_evidence
        |  FROM scored GROUP BY 1, 2)
        |SELECT labeled_lang, pred_lang, n_docs, n_zero_evidence,
        |  ((1000 * n_docs) // sum(n_docs) OVER (PARTITION BY labeled_lang))::BIGINT
        |    AS row_milli
        |FROM g ORDER BY labeled_lang, pred_lang""".stripMargin,
    "text_repetition" ->
      s"""WITH toks AS ($docToks),
         |g AS (
         |  SELECT doc_id, array_to_string(toks[i+1:i+3], ' ') AS shingle
         |  FROM toks, UNNEST(range(0, len(toks) - 2)) AS u(i)
         |  WHERE len(toks) >= 3)
         |SELECT doc_id, count(*)::BIGINT AS n_shingles,
         |  count(DISTINCT shingle)::BIGINT AS n_distinct,
         |  floor((count(*) - count(DISTINCT shingle)) * 1000.0 / count(*))::BIGINT AS rep_milli
         |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // tf-idf mirror: same exact-rational integer idf ((N*1000) // df),
    // same (score desc, term asc) total order
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(lower(text), ' '), t -> length(t) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
        |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    (tf.tf * ((n.n_docs * 1000) // df.df))::BIGINT AS score_milli
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, score_milli,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score_milli DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, term, tf, df, score_milli, rk
        |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    // PMI collocations: lift = c12*N1^2*1e6 // (N2*c1*c2) in HUGEINT,
    // mirroring Spark's DECIMAL(38,0) floor division
    "text_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |uni AS (SELECT t.tok AS w FROM toks, unnest(toks) AS t(tok)),
        |uc AS (SELECT w, count(*)::BIGINT AS c FROM uni GROUP BY w),
        |n1 AS (SELECT sum(c)::BIGINT AS n FROM uc),
        |bg AS (
        |  SELECT toks[i+1] AS w1, toks[i+2] AS w2
        |  FROM toks, UNNEST(range(0, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bc AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY w1, w2),
        |n2 AS (SELECT sum(c12)::BIGINT AS n FROM bc)
        |SELECT b.w1, b.w2, b.c12 AS n_pair, u1.c AS n_w1, u2.c AS n_w2,
        |  ((b.c12::HUGEINT * n1.n * n1.n * 1000000)
        |    // (n2.n::HUGEINT * u1.c * u2.c))::BIGINT AS lift_micro
        |FROM bc b
        |JOIN uc u1 ON u1.w = b.w1
        |JOIN uc u2 ON u2.w = b.w2
        |CROSS JOIN n1 CROSS JOIN n2
        |WHERE b.c12 >= 5
        |ORDER BY lift_micro DESC, w1, w2 LIMIT 100""".stripMargin,
    // BM25 mirror: exact-rational Robertson idf in millis, tf norm with
    // every fraction cleared by 10*tot (k1=1.2, b=0.75, avgdl=tot/N as
    // exact rationals), floor div both engines; ties doc_id::VARCHAR asc
    // (the bounded top-k aggregate's STRING tag order)
    "text_bm25" ->
      s"""$bm25ScoreCtes,
        |ranked AS (
        |  SELECT query_id, doc_id, score_micro,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score_micro DESC, doc_id::VARCHAR ASC) AS rk
        |  FROM sc)
        |SELECT query_id, doc_id, score_micro, rk
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // hybrid RRF: the bm25 corpus CTEs with the anchors' own distinct
    // terms as the query workload (self-match excluded), the
    // sim_bruteforce cosine replay, and an integer-division fuse over
    // the two top-20 lists — every stage the exact mirror of the plan
    "text_hybrid_rrf" ->
      s"""$hybridLexCtes,
        |qv AS (SELECT e.vec_id AS q_id, e.v AS qv
        |       FROM emb e JOIN anchors a ON e.vec_id = a.doc_id),
        |semsc AS (
        |  SELECT qv.q_id, e.vec_id AS n_id, ${cosMilli("qv.qv", "e.v")} AS cos_milli
        |  FROM emb e CROSS JOIN qv WHERE e.vec_id != qv.q_id),
        |sem AS (
        |  SELECT q_id AS query_id, n_id AS doc_id,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY cos_milli DESC, n_id ASC) AS rk_sem
        |  FROM semsc QUALIFY rk_sem <= 20),
        |$hybridFuseTail""".stripMargin,
    // IVF-probed hybrid: the same lexical ranks and fuse, the semantic
    // side re-ranked inside nprobe=2 probed cells (sim_ivf's quantizer)
    "text_hybrid_rrf_ann" ->
      s"""$hybridLexCtes,
        |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
        |cscored AS (
        |  SELECT e.vec_id, e.v, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
        |  FROM emb e CROSS JOIN cent c),
        |assigned AS (
        |  SELECT vec_id, v, c_id AS cell FROM (
        |    SELECT vec_id, v, c_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
        |    FROM cscored) WHERE ark = 1),
        |qv AS (SELECT e.vec_id AS q_id, e.v AS qv
        |       FROM emb e JOIN anchors a ON e.vec_id = a.doc_id),
        |probes AS (
        |  SELECT q_id, cell FROM (
        |    SELECT s.vec_id AS q_id, s.c_id AS cell,
        |      row_number() OVER (PARTITION BY s.vec_id
        |                         ORDER BY s.cs DESC, s.c_id ASC) AS prk
        |    FROM cscored s JOIN qv ON s.vec_id = qv.q_id) WHERE prk <= 2),
        |cand AS (
        |  SELECT DISTINCT p.q_id, a.vec_id AS n_id,
        |    ${cosMilli("q.qv", "a.v")} AS cos_milli
        |  FROM probes p JOIN qv q USING (q_id) JOIN assigned a ON a.cell = p.cell
        |  WHERE a.vec_id != p.q_id),
        |sem AS (
        |  SELECT q_id AS query_id, n_id AS doc_id,
        |    row_number() OVER (PARTITION BY q_id
        |                       ORDER BY cos_milli DESC, n_id ASC) AS rk_sem
        |  FROM cand QUALIFY rk_sem <= 20),
        |$hybridFuseTail""".stripMargin,
    // stored-index serving: identical relation to the inline scorer by
    // construction (same scoring tail; df = posting-list length)
    "text_bm25_indexed" ->
      s"""$bm25ScoreCtes,
        |ranked AS (
        |  SELECT query_id, doc_id, score_micro,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score_micro DESC, doc_id::VARCHAR ASC) AS rk
        |  FROM sc)
        |SELECT query_id, doc_id, score_micro, rk
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // percolation twin: same score CTE, no top-k — every (doc, query)
    // match ranks stream-side readers' concern
    "stream_bm25" ->
      s"""$bm25ScoreCtes
        |SELECT doc_id, query_id, score_micro FROM sc ORDER BY 1, 2""".stripMargin,
    // chunking mirror: stride 56 = 64 - 8; DuckDB list slices are
    // 1-based inclusive, toks[s+1 : s+64] = 64 tokens from 0-based s
    "text_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, i AS chunk_idx,
        |    toks[(i * 56 + 1)::INT : (i * 56 + 64)::INT] AS chunk
        |  FROM toks, UNNEST(range(0, (len(toks) - 1) // 56 + 1)) AS u(i)
        |  WHERE len(toks) > 0)
        |SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
        |  len(chunk)::BIGINT AS n_chunk_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_md5
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    "sample_split" ->
      s"""WITH b AS (
         |  SELECT source, ${h60("doc_id::VARCHAR")} % 100 AS bucket
         |  FROM documents)
         |SELECT source,
         |  CASE WHEN bucket <= 97 THEN 'train'
         |       WHEN bucket = 98 THEN 'val' ELSE 'test' END AS split,
         |  count(*)::BIGINT AS n_docs
         |FROM b GROUP BY source, split ORDER BY source, split""".stripMargin,
    // cross-split exact-content leakage: same split assignment as
    // sample_split, conditional counts per content hash, 3-row unpivot
    "split_leakage" ->
      s"""WITH b AS (
         |  SELECT md5(text) AS h,
         |    CASE WHEN ${h60("doc_id::VARCHAR")} % 100 <= 97 THEN 'train'
         |         WHEN ${h60("doc_id::VARCHAR")} % 100 = 98 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |ph AS (
         |  SELECT h,
         |    sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
         |    sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val,
         |    sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)::BIGINT AS n_test
         |  FROM b GROUP BY h),
         |agg AS (
         |  SELECT
         |    sum(CASE WHEN n_train > 0 AND n_val > 0 THEN 1 ELSE 0 END)::BIGINT AS c_tv,
         |    sum(CASE WHEN n_train > 0 AND n_val > 0 THEN n_val ELSE 0 END)::BIGINT AS d_tv,
         |    sum(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)::BIGINT AS c_tt,
         |    sum(CASE WHEN n_train > 0 AND n_test > 0 THEN n_test ELSE 0 END)::BIGINT AS d_tt,
         |    sum(CASE WHEN n_val > 0 AND n_test > 0 THEN 1 ELSE 0 END)::BIGINT AS c_vt,
         |    sum(CASE WHEN n_val > 0 AND n_test > 0 THEN n_test ELSE 0 END)::BIGINT AS d_vt
         |  FROM ph)
         |SELECT 'train_val' AS pair, c_tv AS n_shared_contents, d_tv AS n_leaked_docs FROM agg
         |UNION ALL
         |SELECT 'train_test', c_tt, d_tt FROM agg
         |UNION ALL
         |SELECT 'val_test', c_vt, d_vt FROM agg
         |ORDER BY pair""".stripMargin,
    // mergeable sketch profile: the oracle replays the exact side and
    // the shard bookkeeping; the HLL union gate is expected TRUE
    "corpus_sketch_profile" ->
      """WITH toks AS (
        |  SELECT source, doc_id % 8 AS shard, t.tok AS token
        |  FROM documents,
        |    unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS t(tok)),
        |ps AS (
        |  SELECT source, shard, count(*)::BIGINT AS n
        |  FROM toks GROUP BY source, shard),
        |m AS (
        |  SELECT source, count(*)::BIGINT AS n_shards, sum(n)::BIGINT AS n_tokens
        |  FROM ps GROUP BY source),
        |ex AS (
        |  SELECT source, count(DISTINCT token)::BIGINT AS n_distinct_exact
        |  FROM toks GROUP BY source)
        |SELECT m.source, m.n_shards, m.n_tokens, ex.n_distinct_exact,
        |  TRUE AS union_within_tolerance
        |FROM m JOIN ex USING (source) ORDER BY source""".stripMargin,
    // persisted profile: stored rows = one sketch per (source, shard,
    // batch-half); union-over-store gate expected TRUE
    "corpus_profile_refresh" ->
      """WITH toks AS (
        |  SELECT source, doc_id % 8 AS shard, doc_id % 4 = 0 AS fresh, t.tok AS token
        |  FROM documents,
        |    unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS t(tok)),
        |gs AS (
        |  SELECT source, shard, fresh, count(*)::BIGINT AS n
        |  FROM toks GROUP BY source, shard, fresh),
        |m AS (
        |  SELECT source, count(*)::BIGINT AS n_sketches, sum(n)::BIGINT AS n_tokens
        |  FROM gs GROUP BY source),
        |ex AS (
        |  SELECT source, count(DISTINCT token)::BIGINT AS n_distinct_exact
        |  FROM toks GROUP BY source)
        |SELECT m.source, m.n_sketches, m.n_tokens, ex.n_distinct_exact,
        |  TRUE AS union_within_tolerance
        |FROM m JOIN ex USING (source) ORDER BY source""".stripMargin,
    // profile compaction: before = one row per (source, shard,
    // batch-half), after = one per (source, shard); gate expected TRUE
    "corpus_profile_compact" ->
      """WITH toks AS (
        |  SELECT source, doc_id % 8 AS shard, doc_id % 3 = 0 AS fresh, t.tok AS token
        |  FROM documents,
        |    unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS t(tok)),
        |gs AS (
        |  SELECT source, shard, fresh, count(*)::BIGINT AS n
        |  FROM toks GROUP BY source, shard, fresh),
        |b AS (
        |  SELECT source, count(*)::BIGINT AS n_sketches_before, sum(n)::BIGINT AS n_tokens
        |  FROM gs GROUP BY source),
        |a AS (
        |  SELECT source, count(DISTINCT shard)::BIGINT AS n_sketches_after
        |  FROM gs GROUP BY source),
        |ex AS (
        |  SELECT source, count(DISTINCT token)::BIGINT AS n_distinct_exact
        |  FROM toks GROUP BY source)
        |SELECT b.source, b.n_sketches_before, a.n_sketches_after, b.n_tokens,
        |  ex.n_distinct_exact, TRUE AS union_within_tolerance
        |FROM b JOIN a USING (source) JOIN ex USING (source)
        |ORDER BY source""".stripMargin,
    // source-concentration audit: Lorenz cumulative shares + rank-form
    // Gini; the rank-weighted sum runs in HUGEINT mirroring Spark's
    // DECIMAL(38,0) accumulator
    // manifest: commutative modular content-hash sum per source; the
    // Complete-mode ingest twin maintains the identical relation
    "corpus_manifest" -> manifestOracle,
    "stream_manifest" -> manifestOracle,
    // bot audit: per-user lag gaps, HUGEINT variance identity
    "ev_bot_audit" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |g AS (
        |  SELECT user_id,
        |    tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS gap
        |  FROM ev),
        |a AS (
        |  SELECT user_id, count(*)::BIGINT AS n_gaps,
        |    sum(gap::HUGEINT) AS s, sum(gap::HUGEINT * gap) AS ss
        |  FROM g WHERE gap IS NOT NULL GROUP BY user_id
        |  HAVING count(*) >= 9),
        |v AS (
        |  SELECT user_id, n_gaps, s,
        |    ((n_gaps * ss - s * s) // (n_gaps::HUGEINT * n_gaps)) AS var_us2
        |  FROM a)
        |SELECT user_id, n_gaps,
        |  ((s // n_gaps) // 1000000)::BIGINT AS mean_gap_sec,
        |  (var_us2 // 1000000000000)::BIGINT AS var_gap_sec2,
        |  (var_us2 // 1000000000000 < 3600) AS bot
        |FROM v ORDER BY user_id""".stripMargin,
    // k-anonymity: quasi-id combo counts, risky flag, global risk
    // share riding every bounded row
    "corpus_kanon" ->
      """WITH g AS (
        |  SELECT source, lang, (n_chars // 500)::BIGINT AS len_band,
        |    count(*)::BIGINT AS n_docs
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT source, lang, len_band, n_docs, (n_docs < 5) AS risky,
        |  ((1000 * sum(CASE WHEN n_docs < 5 THEN n_docs ELSE 0 END) OVER ())
        |    // sum(n_docs) OVER ())::BIGINT AS risk_share_milli
        |FROM g ORDER BY source, lang, len_band""".stripMargin,
    // Simpson: HUGEINT pair products per dimension, 2-row union
    "corpus_simpson" ->
      """WITH s1 AS (
        |  SELECT 'source' AS dim, count(*)::BIGINT AS n FROM documents GROUP BY source),
        |s2 AS (
        |  SELECT 'lang' AS dim, count(*)::BIGINT AS n FROM documents GROUP BY lang),
        |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
        |g AS (
        |  SELECT dim, count(*)::BIGINT AS n_groups, sum(n)::BIGINT AS n_docs,
        |    sum(n::HUGEINT * (n - 1)) AS pairs_same
        |  FROM u GROUP BY dim)
        |SELECT dim, n_groups, n_docs,
        |  ((1000000 * pairs_same) // (n_docs::HUGEINT * (n_docs - 1)))::BIGINT
        |    AS simpson_ppm,
        |  CASE WHEN pairs_same > 0
        |    THEN ((1000 * n_docs::HUGEINT * (n_docs - 1)) // pairs_same)::BIGINT
        |  END AS effective_milli
        |FROM g ORDER BY dim""".stripMargin,
    "corpus_gini" ->
      """WITH c AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(text, ' '), t -> length(t) > 0)))::BIGINT
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT source, n_tokens,
        |    row_number() OVER (ORDER BY n_tokens ASC, source ASC)::BIGINT AS rk,
        |    sum(n_tokens) OVER (ORDER BY n_tokens ASC, source ASC)::BIGINT AS cum_tokens,
        |    sum(n_tokens) OVER ()::BIGINT AS tot_tokens,
        |    count(*) OVER ()::BIGINT AS n_src
        |  FROM c),
        |g AS (SELECT *, sum(rk::HUGEINT * n_tokens) OVER () AS s1 FROM r)
        |SELECT rk, source, n_tokens,
        |  ((1000 * cum_tokens) // tot_tokens)::BIGINT AS cum_share_milli,
        |  ((1000 * (2 * s1 - (n_src + 1)::HUGEINT * tot_tokens))
        |    // (n_src::HUGEINT * tot_tokens))::BIGINT AS gini_milli
        |FROM g ORDER BY rk""".stripMargin,
    "pipeline_decontaminate" ->
      s"""WITH $docShingles,
         |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id, count(*)::BIGINT AS n_overlap
         |FROM sh s JOIN ev ON s.shingle = ev.shingle
         |WHERE s.doc_id % 97 != 0
         |GROUP BY s.doc_id
         |HAVING count(*) >= 3
         |ORDER BY doc_id""".stripMargin,
    // semantic complement: best eval match per train vector over the
    // bounded held-out set; leak flag is a column so the hash covers
    // the whole scoring surface
    "pipeline_decontaminate_semantic" -> semanticDeconOracle,
    // ingest twin: unrolled argmax over the same bounded eval artifact —
    // identical relation by construction (shared tie-break), same oracle
    "stream_decontaminate_semantic" -> semanticDeconOracle,
    // bloom twin: the exact-confirm join makes the relation identical to
    // pipeline_decontaminate — the bloom only pre-drops non-overlapping
    // train shingles, never a qualifying one
    "pipeline_decontaminate_bloom" ->
      s"""WITH $docShingles,
         |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id, count(*)::BIGINT AS n_overlap
         |FROM sh s JOIN ev ON s.shingle = ev.shingle
         |WHERE s.doc_id % 97 != 0
         |GROUP BY s.doc_id
         |HAVING count(*) >= 3
         |ORDER BY doc_id""".stripMargin,
    // streaming twin shares the batch decontamination relation (the
    // stream-static join is stateless; per-doc groups complete in-batch)
    "stream_decontaminate" ->
      s"""WITH $docShingles,
         |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id, count(*)::BIGINT AS n_overlap
         |FROM sh s JOIN ev ON s.shingle = ev.shingle
         |WHERE s.doc_id % 97 != 0
         |GROUP BY s.doc_id
         |HAVING count(*) >= 3
         |ORDER BY doc_id""".stripMargin,
    "text_fingerprints" ->
      s"""WITH d AS (
         |  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
         |  FROM documents)
         |SELECT doc_id, md5(norm) AS fp_md5, ${h60("norm")} AS fp_h60
         |FROM d ORDER BY doc_id""".stripMargin,
    // compression gate: n_bytes (UTF-8 length) replays exactly; the
    // DEFLATE-side claims (worst-case bound, repetition subadditivity)
    // are asserted in-plan and pinned TRUE here — zlib byte counts
    // themselves are not SQL-replayable (declared in SURVEY §2)
    "text_compression" ->
      """SELECT doc_id, strlen(text)::BIGINT AS n_bytes,
        |  TRUE AS within_deflate_bound, TRUE AS repeat_subadditive
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """WITH d AS (
        |  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_key
        |  FROM documents)
        |SELECT content_key, min(doc_id)::BIGINT AS keep_doc_id, count(*)::BIGINT AS n_copies
        |FROM d GROUP BY content_key ORDER BY keep_doc_id""".stripMargin,
    // quality-aware survivor: argmax restated as row_number over
    // (q_keep DESC, n_chars_raw DESC, doc_id ASC) within the group
    "dedup_best_rep" -> bestRepOracle,
    // passage dedup: same segmentation as text_chunks but non-overlapping
    // (stride = width = 32); first-occurrence-wins stated as row_number
    // over (doc_id, seg_idx); rebuilt text compared by md5
    "dedup_passages" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |seg AS (
        |  SELECT doc_id, i AS seg_idx,
        |    array_to_string(toks[(i * 32 + 1)::INT : (i * 32 + 32)::INT], ' ') AS ptext
        |  FROM toks, UNNEST(range(0, (len(toks) - 1) // 32 + 1)) AS u(i)
        |  WHERE len(toks) > 0),
        |ranked AS (
        |  SELECT doc_id, seg_idx, ptext,
        |    row_number() OVER (PARTITION BY ptext ORDER BY doc_id, seg_idx) AS rn
        |  FROM seg),
        |kept AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_kept,
        |    md5(string_agg(ptext, ' ' ORDER BY seg_idx)) AS clean_md5
        |  FROM ranked WHERE rn = 1 GROUP BY doc_id),
        |tot AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_passages FROM seg GROUP BY doc_id)
        |SELECT tot.doc_id, tot.n_passages,
        |  coalesce(kept.n_kept, 0)::BIGINT AS n_kept,
        |  coalesce(kept.clean_md5, md5('')) AS clean_md5
        |FROM tot LEFT JOIN kept ON tot.doc_id = kept.doc_id
        |ORDER BY tot.doc_id""".stripMargin,
    // rule-agreement audit: the three keep flags recomputed in one
    // CTE chain, pairwise confusion sums, 3-row matrix via UNION ALL
    "pipeline_rule_agreement" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    len(toks)::BIGINT AS n_words,
         |    coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS char_mass,
         |    len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
         |    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
         |    ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS n_ellipsis,
         |    len(list_intersect(toks, ['the','a','of','and','to','in','is','on']))::BIGINT AS n_stop_distinct,
         |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on')))::BIGINT AS n_stop_occ,
         |    coalesce(list_sum(list_transform(toks,
         |      x -> ${h60("'w:' || x")} % 1001 - 500)), 0)::BIGINT AS cscore
         |  FROM t),
         |r AS (
         |  SELECT doc_id, n_words, n_stop_distinct, n_stop_occ, cscore,
         |    CASE WHEN n_words > 0 THEN char_mass * 1000 // n_words END AS mean_word_len_milli,
         |    CASE WHEN n_words > 0 THEN n_alpha * 1000 // n_words END AS alpha_word_milli,
         |    CASE WHEN n_words > 0 THEN (n_hash + n_ellipsis) * 1000 // n_words END AS symbol_milli
         |  FROM m),
         |f AS (
         |  SELECT
         |    CASE WHEN n_words >= 10 AND n_words <= 100000
         |      AND mean_word_len_milli IS NOT NULL
         |      AND mean_word_len_milli BETWEEN 3000 AND 10000
         |      AND alpha_word_milli IS NOT NULL AND alpha_word_milli >= 800
         |      AND symbol_milli IS NOT NULL AND symbol_milli < 100
         |      AND n_stop_distinct >= 2 THEN 1 ELSE 0 END AS g,
         |    CASE WHEN cscore >= 0 THEN 1 ELSE 0 END AS c,
         |    CASE WHEN n_words >= 10 AND n_words <= 100000
         |      AND n_stop_occ * 100 >= n_words THEN 1 ELSE 0 END AS q
         |  FROM r),
         |s AS (
         |  SELECT count(*)::BIGINT AS n,
         |    sum(g*c)::BIGINT AS gc11, sum(g*(1-c))::BIGINT AS gc10,
         |    sum((1-g)*c)::BIGINT AS gc01,
         |    sum(g*q)::BIGINT AS gq11, sum(g*(1-q))::BIGINT AS gq10,
         |    sum((1-g)*q)::BIGINT AS gq01,
         |    sum(c*q)::BIGINT AS cq11, sum(c*(1-q))::BIGINT AS cq10,
         |    sum((1-c)*q)::BIGINT AS cq01
         |  FROM f),
         |p AS (
         |  SELECT 'gopher' AS rule_a, 'classifier' AS rule_b,
         |    gc11 AS n11, gc10 AS n10, gc01 AS n01,
         |    n - gc11 - gc10 - gc01 AS n00 FROM s
         |  UNION ALL SELECT 'gopher', 'quality', gq11, gq10, gq01,
         |    n - gq11 - gq10 - gq01 FROM s
         |  UNION ALL SELECT 'classifier', 'quality', cq11, cq10, cq01,
         |    n - cq11 - cq10 - cq01 FROM s)
         |SELECT rule_a, rule_b, n11::BIGINT AS n11, n10::BIGINT AS n10,
         |  n01::BIGINT AS n01, n00::BIGINT AS n00,
         |  ((1000 * (n11 + n00)) // (n11 + n10 + n01 + n00))::BIGINT AS agree_milli,
         |  CASE WHEN n11 + n10 + n01 > 0
         |    THEN ((1000 * n11) // (n11 + n10 + n01))::BIGINT END AS jaccard_milli
         |FROM p ORDER BY rule_a, rule_b""".stripMargin,
    // composed pipeline: gopher keep-set feeds the passage-dedup CTEs,
    // rolled up per source
    "pipeline_gopher" ->
      """WITH t AS (
        |  SELECT doc_id, text, source,
        |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    len(toks)::BIGINT AS n_words,
        |    coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS char_mass,
        |    len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
        |    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
        |    ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS n_ellipsis,
        |    len(list_intersect(toks, ['the','a','of','and','to','in','is','on']))::BIGINT AS n_stop
        |  FROM t),
        |keepids AS (
        |  SELECT doc_id FROM g
        |  WHERE n_words >= 10 AND n_words <= 100000
        |    AND (CASE WHEN n_words > 0 THEN char_mass * 1000 // n_words END)
        |      BETWEEN 3000 AND 10000
        |    AND (CASE WHEN n_words > 0 THEN n_alpha * 1000 // n_words END) >= 800
        |    AND (CASE WHEN n_words > 0 THEN (n_hash + n_ellipsis) * 1000 // n_words END) < 100
        |    AND n_stop >= 2),
        |s AS (SELECT t.* FROM t JOIN keepids ON t.doc_id = keepids.doc_id),
        |seg AS (
        |  SELECT doc_id, i AS seg_idx,
        |    array_to_string(toks[(i * 32 + 1)::INT : (i * 32 + 32)::INT], ' ') AS ptext
        |  FROM s, UNNEST(range(0, (len(toks) - 1) // 32 + 1)) AS u(i)
        |  WHERE len(toks) > 0),
        |ranked AS (
        |  SELECT doc_id, seg_idx,
        |    row_number() OVER (PARTITION BY ptext ORDER BY doc_id, seg_idx) AS rn
        |  FROM seg),
        |kept AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_kept
        |  FROM ranked WHERE rn = 1 GROUP BY doc_id),
        |tot AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_passages FROM seg GROUP BY doc_id),
        |p AS (
        |  SELECT tot.doc_id, tot.n_passages, coalesce(kept.n_kept, 0) AS n_kept
        |  FROM tot LEFT JOIN kept ON tot.doc_id = kept.doc_id)
        |SELECT d.source, count(*)::BIGINT AS n_docs,
        |  sum(p.n_passages)::BIGINT AS n_passages,
        |  sum(p.n_kept)::BIGINT AS n_kept_passages,
        |  sum(CASE WHEN p.n_kept = 0 THEN 1 ELSE 0 END)::BIGINT AS n_emptied_docs
        |FROM p JOIN documents d ON p.doc_id = d.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $repDocShingles,
         |sig AS (
         |  SELECT doc_id, i, min(${h60("i || ':' || shingle")}) AS mh
         |  FROM sh, UNNEST(range(0, 16)) AS u(i)
         |  GROUP BY doc_id, i),
         |band AS (
         |  SELECT doc_id, (i // $lshR) AS band, string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |  FROM sig GROUP BY doc_id, (i // $lshR)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM band a JOIN band b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT c.doc_a, c.doc_b,
         |    sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END)::DOUBLE / 16 AS est_jaccard
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.doc_a
         |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
         |  GROUP BY c.doc_a, c.doc_b)
         |SELECT doc_a, doc_b, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    // fast-family gate: n_ref_pairs replays the md5 LSH chain exactly;
    // the xxh64 side is not DuckDB-reproducible, so its agreement with
    // the md5 pair set is asserted in-plan and pinned TRUE here (the
    // urlcount_cms gate pattern) — a FALSE is a sketch-family bug the
    // hash compare catches
    "dedup_minhash_fast" ->
      s"""WITH $repDocShingles,
         |sig AS (
         |  SELECT doc_id, i, min(${h60("i || ':' || shingle")}) AS mh
         |  FROM sh, UNNEST(range(0, 16)) AS u(i)
         |  GROUP BY doc_id, i),
         |band AS (
         |  SELECT doc_id, (i // $lshR) AS band, string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |  FROM sig GROUP BY doc_id, (i // $lshR)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM band a JOIN band b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT c.doc_a, c.doc_b,
         |    sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END)::DOUBLE / 16 AS est_jaccard
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.doc_a
         |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
         |  GROUP BY c.doc_a, c.doc_b)
         |SELECT count(*)::BIGINT AS n_ref_pairs,
         |  TRUE AS fast_nonempty, TRUE AS recall_ok, TRUE AS precision_ok
         |FROM est WHERE est_jaccard >= 0.5""".stripMargin,
    // banding sweep replay: the LSH oracle's sig chain banded per
    // config via i // r grouping; VALUES grid keeps empty configs
    "dedup_banding_sweep" ->
      s"""WITH $repDocShingles,
         |sig AS (
         |  SELECT doc_id, i, min(${h60("i || ':' || shingle")}) AS mh
         |  FROM sh, UNNEST(range(0, 16)) AS u(i)
         |  GROUP BY doc_id, i),
         |cfg AS (SELECT bands::BIGINT AS bands, (16 // bands)::BIGINT AS rows_per_band
         |  FROM (VALUES (16), (8), (4), (2)) c(bands)),
         |bnd AS (
         |  SELECT c.bands, s.doc_id, (s.i // (16 // c.bands)) AS band,
         |    string_agg(s.mh::VARCHAR, ',' ORDER BY s.i) AS bsig
         |  FROM sig s CROSS JOIN cfg c
         |  GROUP BY c.bands, s.doc_id, (s.i // (16 // c.bands))),
         |cand AS (
         |  SELECT DISTINCT a.bands, a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bnd a JOIN bnd b ON a.bands = b.bands AND a.band = b.band
         |    AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT c.bands, c.doc_a, c.doc_b,
         |    ((1000 * sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END)) // 16)::BIGINT
         |      AS est_milli
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.doc_a
         |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
         |  GROUP BY c.bands, c.doc_a, c.doc_b),
         |agg AS (
         |  SELECT bands, count(*)::BIGINT AS n_candidates,
         |    sum(CASE WHEN est_milli >= 500 THEN 1 ELSE 0 END)::BIGINT AS n_kept_500
         |  FROM est GROUP BY bands)
         |SELECT f.bands, f.rows_per_band,
         |  coalesce(a.n_candidates, 0)::BIGINT AS n_candidates,
         |  coalesce(a.n_kept_500, 0)::BIGINT AS n_kept_500,
         |  CASE WHEN coalesce(a.n_candidates, 0) > 0
         |    THEN ((1000 * a.n_kept_500) // a.n_candidates)::BIGINT
         |    ELSE NULL END AS precision_milli
         |FROM cfg f LEFT JOIN agg a USING (bands)
         |ORDER BY f.bands DESC""".stripMargin,
    // sketch-calibration replay: same sig/band/cand chain as the LSH
    // oracle, exact Jaccard from shingle-set inter/union, integer error
    // bands shifted so floor-division never sees a negative numerator
    "dedup_minhash_calibration" ->
      s"""WITH $repDocShingles,
         |sig AS (
         |  SELECT doc_id, i, min(${h60("i || ':' || shingle")}) AS mh
         |  FROM sh, UNNEST(range(0, 16)) AS u(i)
         |  GROUP BY doc_id, i),
         |band AS (
         |  SELECT doc_id, (i // $lshR) AS band, string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |  FROM sig GROUP BY doc_id, (i // $lshR)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM band a JOIN band b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT c.doc_a, c.doc_b,
         |    ((1000 * sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END)) // 16)::BIGINT
         |      AS est_milli
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.doc_a
         |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
         |  GROUP BY c.doc_a, c.doc_b),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY c.doc_a, c.doc_b),
         |sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
         |ex AS (
         |  SELECT e.doc_a, e.doc_b, e.est_milli,
         |    ((1000 * coalesce(i.inter, 0))
         |      // (za.sz + zb.sz - coalesce(i.inter, 0)))::BIGINT AS exact_milli
         |  FROM est e
         |  LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
         |  JOIN sz za ON za.doc_id = e.doc_a
         |  JOIN sz zb ON zb.doc_id = e.doc_b)
         |SELECT ((est_milli - exact_milli + 1000) // 100)::BIGINT AS err_band,
         |  count(*)::BIGINT AS n_pairs,
         |  (sum(abs(est_milli - exact_milli)) // count(*))::BIGINT AS mean_abs_err_milli
         |FROM ex GROUP BY err_band ORDER BY err_band""".stripMargin,
    // compaction replay: folded = per-side band keys unioned; compacted
    // = the global-rep rebuild count (the semi-join keeps exactly the
    // rows a from-scratch rebuild would produce)
    "dedup_index_compact" ->
      s"""WITH ${incSideCtes("o", "doc_id % 10 <> 0")},
         |${incSideCtes("n", "doc_id % 10 = 0")},
         |${incSideCtes("g", "TRUE")},
         |folded AS (SELECT sig FROM band_o UNION ALL SELECT sig FROM band_n),
         |f AS (
         |  SELECT split_part(sig, '|', 1)::BIGINT AS band, count(*)::BIGINT AS n_folded
         |  FROM folded GROUP BY 1),
         |c AS (
         |  SELECT split_part(sig, '|', 1)::BIGINT AS band, count(*)::BIGINT AS n_compacted
         |  FROM band_g GROUP BY 1)
         |SELECT f.band, f.n_folded, c.n_compacted
         |FROM f JOIN c USING (band) ORDER BY band""".stripMargin,
    // fold-in audit replay: folded = per-side band keys unioned (what
    // build-then-append produces), rebuild = band keys over the GLOBAL
    // representative collapse; redundancy = cross-split content dups
    "dedup_index_refresh" ->
      s"""WITH ${incSideCtes("o", "doc_id % 10 <> 0")},
         |${incSideCtes("n", "doc_id % 10 = 0")},
         |${incSideCtes("g", "TRUE")},
         |folded AS (SELECT sig FROM band_o UNION ALL SELECT sig FROM band_n),
         |f AS (
         |  SELECT split_part(sig, '|', 1)::BIGINT AS band, count(*)::BIGINT AS n_folded
         |  FROM folded GROUP BY 1),
         |r AS (
         |  SELECT split_part(sig, '|', 1)::BIGINT AS band, count(*)::BIGINT AS n_rebuild
         |  FROM band_g GROUP BY 1)
         |SELECT f.band, f.n_folded, r.n_rebuild,
         |  (f.n_folded - r.n_rebuild)::BIGINT AS n_redundant
         |FROM f JOIN r USING (band) ORDER BY band""".stripMargin,
    // streaming probe replay: index side rep-collapsed (built by the
    // batch half), probe side NOT collapsed — every arriving doc probes;
    // the ingest asymmetry stated exactly
    "stream_dedup_incremental" ->
      s"""WITH ${incSideCtes("o", "doc_id % 10 <> 0")},
         |${incSideCtes("n", "doc_id % 10 = 0", collapse = false)},
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_idx
         |  FROM band_n n JOIN band_o o ON n.sig = o.sig),
         |est AS (
         |  SELECT c.doc_new, c.doc_idx,
         |    sum(CASE WHEN sn.mh = so.mh THEN 1 ELSE 0 END)::DOUBLE / 16 AS est_jaccard
         |  FROM cand c
         |  JOIN sig_n sn ON sn.doc_id = c.doc_new
         |  JOIN sig_o so ON so.doc_id = c.doc_idx AND so.i = sn.i
         |  GROUP BY c.doc_new, c.doc_idx)
         |SELECT doc_new, doc_idx, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5
         |ORDER BY doc_new, doc_idx""".stripMargin,
    // incremental probe replay: both sides' representative collapse,
    // sketches and band keys recomputed from scratch over the SAME mod-10
    // split, pairs = band-key matches scored by 16-slot agreement — the
    // Spark side's persisted index must reproduce exactly this relation
    "dedup_incremental" ->
      s"""WITH ${incSideCtes("o", "doc_id % 10 <> 0")},
         |${incSideCtes("n", "doc_id % 10 = 0")},
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_idx
         |  FROM band_n n JOIN band_o o ON n.sig = o.sig),
         |est AS (
         |  SELECT c.doc_new, c.doc_idx,
         |    sum(CASE WHEN sn.mh = so.mh THEN 1 ELSE 0 END)::DOUBLE / 16 AS est_jaccard
         |  FROM cand c
         |  JOIN sig_n sn ON sn.doc_id = c.doc_new
         |  JOIN sig_o so ON so.doc_id = c.doc_idx AND so.i = sn.i
         |  GROUP BY c.doc_new, c.doc_idx)
         |SELECT doc_new, doc_idx, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5
         |ORDER BY doc_new, doc_idx""".stripMargin,
    "dedup_simhash" ->
      s"""WITH $repDocShingles,
         |hv AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
         |ws AS (
         |  SELECT doc_id, j, sum(((h // CAST(power(2, j) AS BIGINT)) % 2) * 2 - 1)::BIGINT AS wsum
         |  FROM hv, UNNEST(range(0, 32)) AS u(j)
         |  GROUP BY doc_id, j),
         |sh64 AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN wsum > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)::BIGINT AS simhash
         |  FROM ws GROUP BY doc_id),
         |chunked AS (
         |  SELECT doc_id, simhash, c,
         |    (simhash // CAST(power(2, c * 8) AS BIGINT)) % 256 AS chunk
         |  FROM sh64, UNNEST(range(0, 4)) AS u(c)),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM chunked a JOIN chunked b
         |    ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
         |FROM pairs
         |WHERE bit_count(xor(sh_a, sh_b)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_jaccard" ->
      s"""WITH $jaccardPairsCtes
         |SELECT doc_a, doc_b, jaccard_milli FROM jp
         |ORDER BY doc_a, doc_b""".stripMargin,
    // fuzzy cross-split contamination: the jaccard pairs labeled with
    // EVERY copy's split membership per side (collapse cannot hide a
    // cross-split copy), leak flag when sides touch different splits
    "split_leakage_fuzzy" ->
      s"""WITH $jaccardPairsCtes,
         |memb AS (
         |  SELECT r.rep_id,
         |    max(CASE WHEN s.split = 'train' THEN 1 ELSE 0 END)::BIGINT AS in_train,
         |    max(CASE WHEN s.split = 'val' THEN 1 ELSE 0 END)::BIGINT AS in_val,
         |    max(CASE WHEN s.split = 'test' THEN 1 ELSE 0 END)::BIGINT AS in_test
         |  FROM repmap m JOIN reps r ON m.content_key = r.content_key
         |  JOIN (
         |    SELECT doc_id,
         |      CASE WHEN ${h60("doc_id::VARCHAR")} % 100 <= 97 THEN 'train'
         |           WHEN ${h60("doc_id::VARCHAR")} % 100 = 98 THEN 'val'
         |           ELSE 'test' END AS split
         |    FROM documents) s ON s.doc_id = m.doc_id
         |  GROUP BY r.rep_id),
         |lab AS (
         |  SELECT rep_id, in_train, in_val, in_test,
         |    concat_ws('+',
         |      CASE WHEN in_train = 1 THEN 'train' END,
         |      CASE WHEN in_val = 1 THEN 'val' END,
         |      CASE WHEN in_test = 1 THEN 'test' END) AS splits
         |  FROM memb)
         |SELECT p.doc_a, p.doc_b, p.jaccard_milli,
         |  a.splits AS splits_a, b.splits AS splits_b,
         |  (CASE WHEN a.in_train * (b.in_val + b.in_test)
         |           + a.in_val * (b.in_train + b.in_test)
         |           + a.in_test * (b.in_train + b.in_val) > 0
         |        THEN 1 ELSE 0 END)::BIGINT AS cross_split
         |FROM jp p
         |JOIN lab a ON a.rep_id = p.doc_a
         |JOIN lab b ON b.rep_id = p.doc_b
         |ORDER BY p.doc_a, p.doc_b""".stripMargin,
    "dedup_embedding" ->
      s"""WITH $lshBucketsCte,
         |vreps AS (SELECT min(vec_id) AS vec_id FROM emb GROUP BY v),
         |rb AS (
         |  SELECT * FROM bucketed
         |  WHERE vec_id IN (SELECT vec_id FROM vreps)),
         |pr AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM rb a JOIN rb b
         |    ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
         |scored AS (
         |  SELECT p.vec_a, p.vec_b, ${cosMilli("ea.v", "eb.v")} AS cos_milli
         |  FROM pr p
         |  JOIN emb ea ON ea.vec_id = p.vec_a
         |  JOIN emb eb ON eb.vec_id = p.vec_b)
         |SELECT vec_a, vec_b, cos_milli FROM scored
         |WHERE cos_milli >= 400
         |ORDER BY vec_a, vec_b""".stripMargin,
    // exact vector dedup: grouped on the raw DOUBLE list value — both
    // engines read the same parquet doubles, so equality is bit-exact
    "emb_exact_dups" ->
      """SELECT min(vec_id)::BIGINT AS keep_vec_id, count(*)::BIGINT AS n_copies
        |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |GROUP BY v ORDER BY keep_vec_id""".stripMargin,
    "sim_bruteforce" -> bruteForceOracle,
    // graft_dot SQL-surface twin: identical relation by construction
    "sql_cosine" -> bruteForceOracle,
    // batch-hard triplet mining: the min/max-struct extremes replayed as
    // rank-1 rows of the two orderings (ties on vec_id both sides)
    "emb_triplet_mining" ->
      s"""WITH emb AS (
         |  SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv
         |      FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |scored AS (
         |  SELECT q.q_id, q.q_label, e.label, e.vec_id AS n_id,
         |    ${cosMilli("q.qv", "e.v")} AS cos_milli
         |  FROM emb e JOIN q ON e.vec_id != q.q_id),
         |posr AS (
         |  SELECT q_id, n_id, cos_milli,
         |    row_number() OVER (PARTITION BY q_id
         |                       ORDER BY cos_milli ASC, n_id ASC) AS rk
         |  FROM scored WHERE label = q_label),
         |negr AS (
         |  SELECT q_id, n_id, cos_milli,
         |    row_number() OVER (PARTITION BY q_id
         |                       ORDER BY cos_milli DESC, n_id ASC) AS rk
         |  FROM scored WHERE label != q_label)
         |SELECT p.q_id, p.n_id AS pos_id, p.cos_milli AS pos_cos_milli,
         |  n.n_id AS neg_id, n.cos_milli AS neg_cos_milli,
         |  (p.cos_milli - n.cos_milli)::BIGINT AS margin_milli
         |FROM posr p JOIN negr n USING (q_id)
         |WHERE p.rk = 1 AND n.rk = 1
         |ORDER BY q_id""".stripMargin,
    "sim_lsh_ann" ->
      s"""WITH $lshBucketsCte,
         |q AS (SELECT vec_id AS q_id, v AS qv, band, sig FROM bucketed),
         |cand AS (
         |  SELECT DISTINCT q.q_id, b.vec_id AS n_id, ${cosMilli("q.qv", "b.v")} AS cos_milli
         |  FROM bucketed b JOIN q ON b.band = q.band AND b.sig = q.sig
         |  WHERE b.vec_id != q.q_id),
         |ranked AS (
         |  SELECT q_id, n_id, cos_milli,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, n_id ASC) AS rk
         |  FROM cand)
         |SELECT q_id, rk, n_id, cos_milli FROM ranked WHERE rk <= 10
         |ORDER BY q_id, rk""".stripMargin,
    // multiprobe: the bucket chain restricted to exact-content
    // representatives, then the (nBits+1)-way probe fan-out per band
    "sim_lsh_multiprobe" ->
      s"""WITH planes AS (
         |  SELECT band, bit, d,
         |         (${h60("band || ':' || bit || ':' || d")})::DOUBLE / power(2, 59) - 1.0 AS comp
         |  FROM range(0, 4) tb(band), range(0, 8) ti(bit), range(0, 64) td(d)),
         |plane AS (
         |  SELECT band, bit, list(comp ORDER BY d) AS pl
         |  FROM planes GROUP BY band, bit),
         |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |vreps AS (SELECT min(vec_id) AS vec_id FROM emb GROUP BY v),
         |remb AS (SELECT * FROM emb WHERE vec_id IN (SELECT vec_id FROM vreps)),
         |sigs AS (
         |  SELECT e.vec_id, p.band,
         |         sum(CASE WHEN list_dot_product(p.pl, e.v) > 0
         |             THEN (1::BIGINT << p.bit) ELSE 0::BIGINT END)::BIGINT AS sig
         |  FROM remb e CROSS JOIN plane p
         |  GROUP BY e.vec_id, p.band),
         |bucketed AS (
         |  SELECT s.vec_id, s.band, s.sig, e.v
         |  FROM sigs s JOIN remb e USING (vec_id)),
         |probes AS (
         |  SELECT vec_id AS q_id, v AS qv, band,
         |    CASE WHEN f = -1 THEN sig
         |         ELSE xor(sig, (1::BIGINT << f)) END AS sig
         |  FROM bucketed, UNNEST([-1, 0, 1, 2, 3, 4, 5, 6, 7]) AS u(f)),
         |cand AS (
         |  SELECT DISTINCT p.q_id, b.vec_id AS n_id, ${cosMilli("p.qv", "b.v")} AS cos_milli
         |  FROM bucketed b JOIN probes p ON b.band = p.band AND b.sig = p.sig
         |  WHERE b.vec_id != p.q_id),
         |ranked AS (
         |  SELECT q_id, n_id, cos_milli,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, n_id ASC) AS rk
         |  FROM cand)
         |SELECT q_id, rk, n_id, cos_milli FROM ranked WHERE rk <= 10
         |ORDER BY q_id, rk""".stripMargin,
    "sim_allpairs" ->
      s"""WITH emb AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |  ORDER BY vec_id LIMIT 500)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ${cosMilli("a.v", "b.v")} AS cos_milli
         |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
         |ORDER BY vec_a, vec_b""".stripMargin,
    // IVF mirror: strided centroids, argmax-cosine cell assignment,
    // nprobe=2 probing, exact re-rank — orderings made total by the
    // (cos desc, id asc) tie-break everywhere
    "sim_ivf" -> ivfOracle,
    // trained quantizer: the full Lloyd loop replays as chained CTEs
    // (exact integer-micro means), then the same probe tail
    "sim_ivf_kmeans" -> kmeansOracle,
    // the indexed variant persists the identical assignment and probes
    // the stored table — same quantizer, same parameters, so the same
    // replay is the oracle (the INDEX is what changed, not the answer)
    "sim_ivf_indexed" -> ivfOracle,
    // grown-incrementally index: same assignment, same probe, same oracle
    "sim_ivf_grow" -> ivfOracle,
    // ANN recall gate: brute-force truth, LSH and IVF top-10 replayed,
    // hits counted per method — integers, so the compare is exact
    "sim_recall" ->
      s"""WITH $lshBucketsCte,
         |q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |bf_scored AS (
         |  SELECT q.q_id, e.vec_id AS n_id, ${cosMilli("q.qv", "e.v")} AS cos_milli
         |  FROM emb e CROSS JOIN q WHERE e.vec_id != q.q_id),
         |bf AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, n_id ASC) AS rk
         |    FROM bf_scored) WHERE rk <= 10),
         |lq AS (SELECT b.vec_id AS q_id, b.v AS qv, b.band, b.sig
         |       FROM bucketed b WHERE b.vec_id % 50 = 0),
         |lsh_cand AS (
         |  SELECT DISTINCT lq.q_id, b.vec_id AS n_id, ${cosMilli("lq.qv", "b.v")} AS cos_milli
         |  FROM bucketed b JOIN lq ON b.band = lq.band AND b.sig = lq.sig
         |  WHERE b.vec_id != lq.q_id),
         |lsh AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, n_id ASC) AS rk
         |    FROM lsh_cand) WHERE rk <= 10),
         |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |iv_scored AS (
         |  SELECT e.vec_id, e.v, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
         |  FROM emb e CROSS JOIN cent c),
         |iv_assigned AS (
         |  SELECT vec_id, v, c_id AS cell FROM (
         |    SELECT vec_id, v, c_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
         |    FROM iv_scored) WHERE ark = 1),
         |iv_probes AS (
         |  SELECT q_id, cell FROM (
         |    SELECT vec_id AS q_id, c_id AS cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS prk
         |    FROM iv_scored WHERE vec_id % 50 = 0) WHERE prk <= 2),
         |iv_cand AS (
         |  SELECT DISTINCT p.q_id, a.vec_id AS n_id, ${cosMilli("q.qv", "a.v")} AS cos_milli
         |  FROM iv_probes p JOIN q USING (q_id) JOIN iv_assigned a ON a.cell = p.cell
         |  WHERE a.vec_id != p.q_id),
         |ivf AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos_milli DESC, n_id ASC) AS rk
         |    FROM iv_cand) WHERE rk <= 10),
         |$pqCoreCtes,
         |pq_lut AS (
         |  SELECT c.vec_id AS q_id, m2.sub, m2.code, sum(c.xm * m2.cm)::BIGINT AS p
         |  FROM comps c JOIN cbm m2 ON m2.sub = c.sub AND m2.d = c.d
         |  WHERE c.vec_id % 50 = 0
         |  GROUP BY q_id, m2.sub, m2.code),
         |pq_scored AS (
         |  SELECT l.q_id, k.vec_id, sum(l.p)::BIGINT AS s
         |  FROM codes k JOIN pq_lut l ON l.sub = k.sub AND l.code = k.code
         |  WHERE k.vec_id <> l.q_id
         |  GROUP BY l.q_id, k.vec_id),
         |pq AS (
         |  SELECT q_id, vec_id AS n_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY s DESC, vec_id ASC) AS rk
         |    FROM pq_scored) WHERE rk <= 10),
         |ivfpq_scored AS (
         |  SELECT p.q_id, a.vec_id, sum(l.p)::BIGINT AS s
         |  FROM iv_probes p
         |  JOIN iv_assigned a ON a.cell = p.cell
         |  JOIN codes k ON k.vec_id = a.vec_id
         |  JOIN pq_lut l ON l.q_id = p.q_id AND l.sub = k.sub AND l.code = k.code
         |  WHERE a.vec_id != p.q_id
         |  GROUP BY p.q_id, a.vec_id),
         |ivfpq AS (
         |  SELECT q_id, vec_id AS n_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY s DESC, vec_id ASC) AS rk
         |    FROM ivfpq_scored) WHERE rk <= 10),
         |m AS (
         |  SELECT 'ivf' AS method, (SELECT count(*) FROM bf JOIN ivf USING (q_id, n_id)) AS h
         |  UNION ALL
         |  SELECT 'lsh', (SELECT count(*) FROM bf JOIN lsh USING (q_id, n_id))
         |  UNION ALL
         |  SELECT 'pq', (SELECT count(*) FROM bf JOIN pq USING (q_id, n_id))
         |  UNION ALL
         |  SELECT 'ivf_pq', (SELECT count(*) FROM bf JOIN ivfpq USING (q_id, n_id)))
         |SELECT method,
         |  (SELECT count(DISTINCT q_id) FROM bf)::BIGINT AS n_queries,
         |  h::BIGINT AS n_hits,
         |  (h * 1000 // (SELECT count(*) FROM bf))::BIGINT AS recall_milli
         |FROM m ORDER BY method""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id AS id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS modality,
        |  octet_length(encode(text))::BIGINT AS byte_len,
        |  sha256(text) AS sha
        |FROM documents ORDER BY id""".stripMargin,
    "mm_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS id, octet_length(encode(text))::BIGINT AS total_frames
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT id, k, floor(k * total_frames / 4)::BIGINT AS frame_idx
        |FROM m, UNNEST(range(0, 4)) AS u(k)
        |ORDER BY id, k""".stripMargin,
    // scene cuts: same frame sampling at 8, frame feature = payload
    // byte at the sampled offset, cut where |delta| >= 30, scenes =
    // runs between cuts; the stateless streaming twin shares it
    "mm_scenes" -> scenesOracle,
    "stream_scenes" -> scenesOracle,
    // the codec round-trip contract: a correct javax.imageio decode of
    // the generated PNG for id recovers w=id%31+2, h=id%17+2 and mean
    // luma exactly 1000*(id%256) milli (constant gray fill)
    "mm_decode" ->
      """SELECT doc_id AS id,
        |  (doc_id % 31 + 2)::BIGINT AS width,
        |  (doc_id % 17 + 2)::BIGINT AS height,
        |  (1000 * (doc_id % 256))::BIGINT AS luma_milli
        |FROM documents WHERE doc_id % 2 = 0 ORDER BY id""".stripMargin,
    // aHash replay: the same 8x8 nearest-neighbor grid, floor-mean
    // threshold, and bit packing — pure generator arithmetic; the
    // streaming twin streams the identical relation
    "mm_phash" -> phashOracle,
    "stream_phash" -> phashOracle,
    // banded hamming pairing replay over the arithmetic hashes: same
    // chunk split, df cap, distinct candidates, exact xor bit_count
    "mm_phash_pairs" ->
      s"""WITH $phashPairsCte
         |SELECT id_a, id_b, hamming FROM pp ORDER BY id_a, id_b""".stripMargin,
    // image near-dup clusters: the same pair relation closed
    // transitively, min reachable id per component (algorithm-agnostic
    // ground truth for the star-contraction resolution)
    "mm_phash_clusters" ->
      s"""WITH RECURSIVE $phashPairsCte,
         |pedges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pp
         |  UNION SELECT id_b AS src, id_a AS dst FROM pp),
         |preach(src, dst) AS (
         |  SELECT src, dst FROM pedges
         |  UNION
         |  SELECT r.src, e.dst FROM preach r JOIN pedges e ON r.dst = e.src)
         |SELECT src AS id, least(src, min(dst))::BIGINT AS cluster_id
         |FROM preach GROUP BY src ORDER BY id""".stripMargin,
    // media funnel: counts over the same pair CTEs + transitive closure
    "mm_media_funnel" ->
      s"""WITH RECURSIVE $phashPairsCte,
         |pedges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pp
         |  UNION SELECT id_b AS src, id_a AS dst FROM pp),
         |preach(src, dst) AS (
         |  SELECT src, dst FROM pedges
         |  UNION
         |  SELECT r.src, e.dst FROM preach r JOIN pedges e ON r.dst = e.src),
         |cl AS (
         |  SELECT src AS id, least(src, min(dst)) AS cluster_id
         |  FROM preach GROUP BY src),
         |ni AS (SELECT count(*)::BIGINT AS n_images FROM documents WHERE doc_id % 2 = 0),
         |st AS (SELECT count(*)::BIGINT AS n_paired,
         |              count(DISTINCT cluster_id)::BIGINT AS n_clusters FROM cl)
         |SELECT n_images, n_paired, n_clusters,
         |  (n_paired - n_clusters)::BIGINT AS n_dropped,
         |  (n_images - (n_paired - n_clusters))::BIGINT AS n_kept
         |FROM ni CROSS JOIN st""".stripMargin,
    // image dims from the REAL decode (id arithmetic per mm_decode);
    // video dims from the labeled stub (len-derived)
    "mm_features" ->
      """WITH img AS (
        |  SELECT count(*)::BIGINT AS n,
        |    sum(doc_id % 31 + 2)::BIGINT AS sw, sum(doc_id % 17 + 2)::BIGINT AS sh
        |  FROM documents WHERE doc_id % 2 = 0),
        |vid AS (
        |  SELECT count(*)::BIGINT AS n,
        |    sum(octet_length(encode(text)) % 640 + 1)::BIGINT AS sw,
        |    sum(octet_length(encode(text)) % 480 + 1)::BIGINT AS sh
        |  FROM documents WHERE doc_id % 2 = 1)
        |SELECT 'image' AS modality, n, sw AS sum_width, sh AS sum_height FROM img
        |UNION ALL
        |SELECT 'video' AS modality, n, sw AS sum_width, sh AS sum_height FROM vid
        |ORDER BY modality""".stripMargin,
    // the audio codec contract: a correct javax.sound.sampled decode of
    // the generated WAV for id recovers n = id%100+8 samples at 8 kHz
    // with sample(i) = (id*31 + i*7) % 65536 - 32768
    "mm_audio_decode" ->
      """WITH a AS (
        |  SELECT doc_id AS id, (doc_id % 100 + 8)::BIGINT AS n
        |  FROM documents WHERE doc_id % 2 = 1),
        |s AS (
        |  SELECT id, n, abs((id * 31 + i * 7) % 65536 - 32768)::BIGINT AS v
        |  FROM a, UNNEST(range(0, n)) AS u(i))
        |SELECT id, n AS n_samples, 8000::BIGINT AS sample_rate,
        |  sum(v)::BIGINT AS sum_abs, max(v)::BIGINT AS peak_abs
        |FROM s GROUP BY id, n ORDER BY id""".stripMargin,
    // fingerprint replay from the generator's sample arithmetic: frame
    // of sample i = (8*i) // n, energy rise bits, earliest-peak argmax
    "mm_audio_fingerprint" ->
      """WITH a AS (
        |  SELECT doc_id AS id, (doc_id % 100 + 8)::BIGINT AS n
        |  FROM documents WHERE doc_id % 2 = 1),
        |s AS (
        |  SELECT id, n, i, abs((id * 31 + i * 7) % 65536 - 32768)::BIGINT AS v
        |  FROM a, UNNEST(range(0, n)) AS u(i)),
        |fr AS (
        |  SELECT id, ((8 * i) // n)::INT AS f, sum(v)::BIGINT AS e
        |  FROM s GROUP BY id, ((8 * i) // n)),
        |fp AS (
        |  SELECT x.id,
        |    sum(CASE WHEN y.e > x.e THEN (1::BIGINT << x.f) ELSE 0 END)::BIGINT AS fp
        |  FROM fr x JOIN fr y ON y.id = x.id AND y.f = x.f + 1
        |  GROUP BY x.id),
        |pk AS (
        |  SELECT id, f::BIGINT AS peak_frame FROM (
        |    SELECT id, f, row_number() OVER (PARTITION BY id ORDER BY e DESC, f ASC) AS rk
        |    FROM fr) WHERE rk = 1)
        |SELECT id, coalesce(fp, 0)::BIGINT AS fp, peak_frame
        |FROM pk LEFT JOIN fp USING (id) ORDER BY id""".stripMargin,
    // executed resample chain: output dims are the plan's box, and a
    // correct nearest-neighbor resample of a constant-gray source
    // preserves mean luma exactly through the re-encode/re-decode
    "mm_resize_exec" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    (doc_id % 31 + 2)::BIGINT AS width, (doc_id % 17 + 2)::BIGINT AS height
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT id,
        |  CASE WHEN width >= height THEN 224 ELSE (width * 224) // height END::BIGINT AS out_w,
        |  CASE WHEN width >= height THEN (height * 224) // width ELSE 224 END::BIGINT AS out_h,
        |  (1000 * (id % 256))::BIGINT AS luma_milli
        |FROM d ORDER BY id""".stripMargin,
    // mirror of Multimodal.resizePlan: REAL decoded dims (id arithmetic
    // per mm_decode) + aspect-preserving fit into 224
    "mm_resize" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    (doc_id % 31 + 2)::BIGINT AS width, (doc_id % 17 + 2)::BIGINT AS height
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT id, width, height,
        |  CASE WHEN width >= height THEN 224 ELSE (width * 224) // height END::BIGINT AS out_w,
        |  CASE WHEN width >= height THEN (height * 224) // width ELSE 224 END::BIGINT AS out_h
        |FROM d ORDER BY id""".stripMargin,
    "text_winnow" -> winnowOracle,
    // SQL-surface twins: same relations as their Column-API siblings
    "sql_winnow" -> winnowOracle,
    // n sweep: per-n distinct-doc window counts, occurrence rollup
    "dedup_ngram_sweep" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
         |  FROM documents),
         |per AS (
         |${ngramSweepBlock(2)}
         |UNION ALL
         |${ngramSweepBlock(4)}
         |UNION ALL
         |${ngramSweepBlock(8)}
         |UNION ALL
         |${ngramSweepBlock(16)})
         |SELECT n, n_windows, n_dup_windows,
         |  ((1000 * n_dup_windows) // n_windows)::BIGINT AS dup_permille
         |FROM per ORDER BY n""".stripMargin,
    // MOSS pair replay: rep-restricted winnow CTE, df guard, fp join
    "dedup_winnow_pairs" ->
      s"""WITH $repMapCte,
         |d AS (
         |  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
         |  FROM documents
         |  WHERE doc_id IN (SELECT rep_id FROM reps)),
         |g AS (
         |  SELECT doc_id, i, ${h60("substr(norm, i::INT, 8)")} AS h,
         |         length(norm) - 7 AS n_grams
         |  FROM d, UNNEST(range(1, length(norm) - 6)) AS u(i)
         |  WHERE length(norm) >= 11),
         |wn AS (
         |  SELECT doc_id, i, n_grams,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY i
         |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
         |  FROM g),
         |fps AS (SELECT DISTINCT doc_id, fp FROM wn WHERE i <= n_grams - 3),
         |rare AS (
         |  SELECT fp FROM (SELECT fp, count(*) AS df FROM fps GROUP BY fp) t
         |  WHERE df <= 50),
         |pr AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare r USING (fp))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  count(*)::BIGINT AS n_shared_fps
         |FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY doc_a, doc_b
         |HAVING count(*) >= 8
         |ORDER BY doc_a, doc_b""".stripMargin,
    // density sweep: the same gram CTE windowed per w, corpus rollup
    "text_winnow_audit" ->
      s"""WITH d AS (
         |  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, i, ${h60("substr(norm, i::INT, 8)")} AS h,
         |         (length(norm) - 7)::BIGINT AS n_grams
         |  FROM d, UNNEST(range(1, length(norm) - 6)) AS u(i)
         |  WHERE length(norm) >= 8),
         |per AS (
         |${winnowAuditBlock(2)}
         |UNION ALL
         |${winnowAuditBlock(4)}
         |UNION ALL
         |${winnowAuditBlock(8)}
         |UNION ALL
         |${winnowAuditBlock(16)})
         |SELECT w, count(*)::BIGINT AS n_docs, sum(n_grams)::BIGINT AS n_grams,
         |  sum(n_fps)::BIGINT AS n_fps,
         |  ((1000 * sum(n_fps)) // sum(n_grams))::BIGINT AS density_milli,
         |  (2000 // (w + 1))::BIGINT AS expected_milli
         |FROM per GROUP BY w ORDER BY w""".stripMargin,
    // minhash sketch slot 0 = min over shingles of h60("0:" || shingle);
    // min is duplicate-insensitive, so the distinct docShingles CTE
    // matches the non-distinct SQL-side explode exactly
    "sql_minhash" ->
      s"""WITH $docShingles
         |SELECT doc_id, min(${h60("'0:' || shingle")}) AS mh0
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // streaming twins: same relational semantics as their batch analogs,
    // so the oracles are plain batch SQL over the same tables
    "stream_tumbling" ->
      """SELECT ((epoch_us(ts) // 1000000) // 3600) * 3600 AS win_start, event_type,
        |  count(*)::BIGINT AS n,
        |  sum(CAST(value AS DECIMAL(18,6)))::DOUBLE AS sum_value
        |FROM events
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    // Append-mode emission = windows FINALIZED by the last watermark:
    // wm_ms = floor(max event-time micros / 1000) - 2h (Spark tracks the
    // watermark in ms), emitted iff window end <= wm. Events arrive as
    // TIMESTAMP_NS; both engines floor ns -> us identically.
    "stream_tumbling_append" ->
      """WITH wm AS (
        |  SELECT (max(epoch_us(ts)) // 1000 - 7200000) AS wm_ms FROM events)
        |SELECT ((epoch_us(ts) // 1000000) // 3600) * 3600 AS win_start, event_type,
        |  count(*)::BIGINT AS n,
        |  sum(CAST(value AS DECIMAL(18,6)))::DOUBLE AS sum_value
        |FROM events, wm
        |WHERE (((epoch_us(ts) // 1000000) // 3600) * 3600 + 3600) * 1000 <= wm_ms
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    "stream_sliding" ->
      """WITH base AS (
        |  SELECT ((epoch_us(ts) // 1000000) // 1800) * 1800 AS base, event_type FROM events),
        |ex AS (SELECT base - off AS win_start, event_type FROM base, UNNEST([0, 1800]) AS t(off))
        |SELECT win_start, event_type, count(*)::BIGINT AS n
        |FROM ex GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    // session_window MERGES an event landing exactly at the window end
    // (gap-touching), so a new session starts only when diff > gap —
    // same boundary as the batch ev_sessions; pinned by StreamingSpec's
    // boundary test
    "stream_sessions" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |flagged AS (
        |  SELECT user_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL OR tus - lag(tus) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus ASC)),
        |numbered AS (
        |  SELECT user_id, tus,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus ASC
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(tus)::BIGINT AS sess_start_us, count(*)::BIGINT AS n_events
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_us""".stripMargin,
    // Append-mode sessions: same session construction as stream_sessions,
    // emitted iff the session end (last event + 30min gap) is at or
    // before the final watermark (ms-floored max event time - 2h)
    "stream_sessions_append" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |wm AS (SELECT (max(tus) // 1000 - 7200000) * 1000 AS wm_us FROM ev),
        |flagged AS (
        |  SELECT user_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL OR tus - lag(tus) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus ASC)),
        |numbered AS (
        |  SELECT user_id, tus,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus ASC
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged),
        |sess AS (
        |  SELECT user_id, min(tus)::BIGINT AS sess_start_us,
        |    count(*)::BIGINT AS n_events,
        |    max(tus) + 1800000000 AS sess_end_us
        |  FROM numbered GROUP BY user_id, sid)
        |SELECT user_id, sess_start_us, n_events
        |FROM sess, wm
        |WHERE sess_end_us <= wm_us
        |ORDER BY user_id, sess_start_us""".stripMargin,
    "stream_tokens" ->
      """SELECT token, count(*)::BIGINT AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token
        |ORDER BY token""".stripMargin,
    "stream_running" ->
      """SELECT user_id, count(*)::BIGINT AS n_events,
        |  sum(floor(value * 1000000)::BIGINT)::BIGINT AS total_value_micros
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // stream-stream interval join: the batch relation is the plain
    // self-join — streaming emits each (purchase, view) pair exactly
    // once (inner join, append mode), so the sets coincide. Window is
    // inclusive both ends; micros on both sides (epoch_us floors nanos
    // the same way the stream's timestamp_micros conversion does).
    // streaming funnel: the state machine must land on the BATCH
    // funnel's dependent-aggregation relation exactly
    "stream_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |t1 AS (
        |  SELECT user_id, min(tus) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, min(e.tus) AS t FROM e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.tus >= t1.t GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, min(e.tus) AS t FROM e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.tus >= t2.t GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1::BIGINT AS step_idx, 'view' AS step, count(*)::BIGINT AS n_users FROM t1
        |  UNION ALL
        |  SELECT 2::BIGINT, 'click', count(*)::BIGINT FROM t2
        |  UNION ALL
        |  SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM t3)
        |ORDER BY step_idx""".stripMargin,
    // streaming transitions: one emitted pair per consecutive per-user
    // step == the batch lag relation, so the oracle is shared verbatim
    "stream_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
        |l AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tus ASC, event_id ASC) AS prev_type,
        |    event_type AS next_type
        |  FROM e),
        |t AS (
        |  SELECT prev_type, next_type, count(*)::BIGINT AS n
        |  FROM l WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type)
        |SELECT prev_type, next_type, n,
        |  ((1000000 * n) // (sum(n) OVER (PARTITION BY prev_type)))::BIGINT AS rate_ppm
        |FROM t ORDER BY prev_type, next_type""".stripMargin,
    "stream_join" ->
      """SELECT p.event_id AS purchase_event_id, p.user_id,
        |  epoch_us(p.ts) AS purchase_tus,
        |  v.event_id AS view_event_id, epoch_us(v.ts) AS view_tus,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
        |FROM events p JOIN events v
        |  ON p.user_id = v.user_id
        | AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND epoch_us(v.ts) <= epoch_us(p.ts)
        | AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000
        |ORDER BY purchase_event_id, view_event_id""".stripMargin,
    // outer emission boundary: matched pairs emit on arrival (the inner
    // relation); an unmatched purchase emits with NULLs iff the final
    // watermark passed it — wm = min(max view ts, max purchase ts)
    // floored to ms minus 2h (each side advances only its OWN watermark,
    // the join takes the min; Spark tracks watermarks in ms), STRICT
    // p_ts < wm (probe-verified; boundary also pinned by StreamingSpec).
    // Purchases later than wm stay in state, never emitted.
    "stream_join_outer" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_event_id, user_id,
        |    epoch_us(ts) AS purchase_tus
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT event_id AS view_event_id, user_id AS v_user,
        |    epoch_us(ts) AS view_tus
        |  FROM events WHERE event_type = 'view'),
        |wm AS (
        |  SELECT (least((SELECT max(view_tus) FROM v),
        |                (SELECT max(purchase_tus) FROM p)) // 1000 - 7200000) * 1000 AS wm_us),
        |matched AS (
        |  SELECT p.purchase_event_id, p.user_id, p.purchase_tus,
        |    v.view_event_id, v.view_tus
        |  FROM p JOIN v ON p.user_id = v.v_user
        |    AND v.view_tus <= p.purchase_tus
        |    AND v.view_tus >= p.purchase_tus - 3600000000),
        |unmatched AS (
        |  SELECT p.purchase_event_id, p.user_id, p.purchase_tus,
        |    NULL::BIGINT AS view_event_id, NULL::BIGINT AS view_tus
        |  FROM p, wm
        |  WHERE p.purchase_tus < wm.wm_us
        |    AND NOT EXISTS (
        |      SELECT 1 FROM v WHERE v.v_user = p.user_id
        |        AND v.view_tus <= p.purchase_tus
        |        AND v.view_tus >= p.purchase_tus - 3600000000))
        |SELECT * FROM matched
        |UNION ALL SELECT * FROM unmatched
        |ORDER BY purchase_event_id, view_event_id""".stripMargin,
    "stream_dedup" ->
      """SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_key
        |FROM documents ORDER BY content_key""".stripMargin,
    // the flatMapGroupsWithState machine emits exactly the same relation
    "stream_dedup_custom" ->
      """SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_key
        |FROM documents ORDER BY content_key""".stripMargin,
    // bounded twin: the harness corpus's ingest span (doc_id seconds)
    // fits inside the 2-hour retention window, so no key evicts and
    // the emission set equals the unbounded distinct relation; the
    // eviction/re-emission boundary itself is pinned by StreamingSpec
    "stream_dedup_bounded" ->
      """SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_key
        |FROM documents ORDER BY content_key""".stripMargin,
    // bounded fuzzy twin: same harness-scale relation as the unbounded
    // form (the corpus ingest span fits one retention window)
    "stream_dedup_fuzzy_bounded" ->
      s"""WITH $docShingles,
         |sig AS (
         |  SELECT doc_id, i, min(${h60("i || ':' || shingle")}) AS mh
         |  FROM sh, UNNEST(range(0, 16)) AS u(i)
         |  GROUP BY doc_id, i),
         |sigs AS (
         |  SELECT doc_id, string_agg(mh::VARCHAR, ',' ORDER BY i) AS sketch_sig
         |  FROM sig GROUP BY doc_id)
         |SELECT DISTINCT sketch_sig FROM sigs ORDER BY sketch_sig""".stripMargin,
    "stream_dedup_fuzzy" ->
      s"""WITH $docShingles,
         |sig AS (
         |  SELECT doc_id, i, min(${h60("i || ':' || shingle")}) AS mh
         |  FROM sh, UNNEST(range(0, 16)) AS u(i)
         |  GROUP BY doc_id, i),
         |sigs AS (
         |  SELECT doc_id, string_agg(mh::VARCHAR, ',' ORDER BY i) AS sketch_sig
         |  FROM sig GROUP BY doc_id)
         |SELECT DISTINCT sketch_sig FROM sigs ORDER BY sketch_sig""".stripMargin,
    // connected components: DuckDB replays the pair graph as a recursive
    // transitive closure (tiny at oracle scale); Spark's min-label
    // propagation converges to the same (doc, min-reachable-id) relation
    "dedup_clusters" -> clustersOracle,
    // same ground truth for the star-contraction algorithm: the oracle
    // is algorithm-agnostic (transitive closure + min id per component)
    "dedup_clusters_twostar" -> clustersOracle,
    // incremental clusters: the oracle is the FULL REBUILD over the
    // minhash rung — transitive closure + min reachable id — so the
    // hash compare proves the contraction merge equals it
    "dedup_clusters_incremental" ->
      s"""WITH RECURSIVE $repDocShingles,
         |$minhashPairsCte,
         |medges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
         |  UNION SELECT doc_b AS src, doc_a AS dst FROM mh_pairs),
         |mreach(src, dst) AS (
         |  SELECT src, dst FROM medges
         |  UNION
         |  SELECT r.src, e.dst FROM mreach r JOIN medges e ON r.dst = e.src)
         |SELECT src AS doc_id, least(src, min(dst))::BIGINT AS cluster_id
         |FROM mreach GROUP BY src ORDER BY doc_id""".stripMargin,
    // rung Venn: the three per-rung pair CTEs tagged and merged
    "dedup_rung_overlap" ->
      s"""WITH $repDocShingles,
         |$fuzzyEdgesCte,
         |fl AS (
         |  SELECT doc_a, doc_b,
         |    max(m) AS m, max(s) AS s, max(j) AS j
         |  FROM (
         |    SELECT doc_a, doc_b, 1 AS m, 0 AS s, 0 AS j FROM mh_pairs
         |    UNION ALL SELECT doc_a, doc_b, 0, 1, 0 FROM sh_pairs
         |    UNION ALL SELECT doc_a, doc_b, 0, 0, 1 FROM jc_pairs)
         |  GROUP BY doc_a, doc_b)
         |SELECT (m = 1) AS in_minhash, (s = 1) AS in_simhash,
         |  (j = 1) AS in_jaccard, count(*)::BIGINT AS n_pairs
         |FROM fl GROUP BY 1, 2, 3
         |ORDER BY in_minhash, in_simhash, in_jaccard""".stripMargin,
    // duplication x quality lift: clusters chain + gopher keep flag,
    // per-source margins, HUGEINT lift numerator
    "dedup_quality_lift" ->
      s"""WITH RECURSIVE $repDocShingles,
         |$fuzzyEdgesCte,
         |$clustersCte,
         |$expandClustersCte,
         |gt AS (
         |  SELECT doc_id,
         |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS gtoks
         |  FROM documents),
         |gm AS (
         |  SELECT doc_id,
         |    len(gtoks)::BIGINT AS n_words,
         |    coalesce(list_sum(list_transform(gtoks, x -> length(x))), 0)::BIGINT AS char_mass,
         |    len(list_filter(gtoks, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
         |    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
         |    ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS n_ellipsis,
         |    len(list_intersect(gtoks, ['the','a','of','and','to','in','is','on']))::BIGINT AS n_stop
         |  FROM documents JOIN gt USING (doc_id)),
         |gk AS (
         |  SELECT doc_id,
         |    coalesce(n_words >= 10 AND n_words <= 100000
         |     AND (CASE WHEN n_words > 0
         |          THEN char_mass * 1000 // n_words END) BETWEEN 3000 AND 10000
         |     AND (CASE WHEN n_words > 0
         |          THEN n_alpha * 1000 // n_words END) >= 800
         |     AND (CASE WHEN n_words > 0
         |          THEN (n_hash + n_ellipsis) * 1000 // n_words END) < 100
         |     AND n_stop >= 2, false) AS keep
         |  FROM gm),
         |j AS (
         |  SELECT d.source, gk.keep, (e.doc_id IS NOT NULL) AS is_dup
         |  FROM documents d
         |  JOIN gk ON gk.doc_id = d.doc_id
         |  LEFT JOIN (SELECT DISTINCT doc_id FROM expanded) e
         |    ON e.doc_id = d.doc_id),
         |g AS (
         |  SELECT source, count(*)::BIGINT AS n_docs,
         |    sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup,
         |    sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)::BIGINT AS n_lowq,
         |    sum(CASE WHEN is_dup AND NOT keep THEN 1 ELSE 0 END)::BIGINT AS n_both
         |  FROM j GROUP BY source)
         |SELECT source, n_docs, n_dup, n_lowq, n_both,
         |  CASE WHEN n_dup > 0 AND n_lowq > 0
         |    THEN ((1000 * n_both::HUGEINT * n_docs) // (n_dup * n_lowq))::BIGINT
         |  END AS lift_milli
         |FROM g ORDER BY source""".stripMargin,
    // SoftDedup weights: the expanded components' sizes joined back to
    // every document, factor 1 where unclustered
    "dedup_soft_weights" ->
      s"""WITH RECURSIVE $repDocShingles,
         |$fuzzyEdgesCte,
         |$clustersCte,
         |$expandClustersCte,
         |cs AS (
         |  SELECT cluster_id, count(*)::BIGINT AS cluster_n
         |  FROM expanded GROUP BY cluster_id),
         |dd AS (
         |  SELECT m.doc_id, coalesce(c.cluster_n, 1)::BIGINT AS dup_factor
         |  FROM repmap m
         |  LEFT JOIN expanded e ON e.doc_id = m.doc_id
         |  LEFT JOIN cs c ON c.cluster_id = e.cluster_id)
         |SELECT doc_id::BIGINT AS doc_id, dup_factor,
         |  (1000 // dup_factor)::BIGINT AS weight_milli
         |FROM dd ORDER BY doc_id""".stripMargin,
    // size histogram over the same expanded components
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $repDocShingles,
         |$fuzzyEdgesCte,
         |$clustersCte,
         |$expandClustersCte,
         |cs AS (
         |  SELECT cluster_id, count(*)::BIGINT AS cluster_size
         |  FROM expanded GROUP BY cluster_id),
         |h AS (
         |  SELECT cluster_size, count(*)::BIGINT AS n_clusters
         |  FROM cs GROUP BY cluster_size)
         |SELECT cluster_size, n_clusters,
         |  (cluster_size * n_clusters)::BIGINT AS n_docs,
         |  ((cluster_size - 1) * n_clusters)::BIGINT AS docs_removed
         |FROM h ORDER BY cluster_size""".stripMargin,
    "pipeline_fuzzy" ->
      s"""WITH RECURSIVE $repDocShingles,
         |$fuzzyEdgesCte,
         |$clustersCte,
         |$expandClustersCte,
         |pq AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
         |  FROM documents),
         |pkept AS (
         |  SELECT doc_id, text FROM pq
         |  WHERE len(tk) >= 10 AND len(tk) <= 100000
         |    AND len(list_filter(tk, t -> t IN ('the','a','of','and','to','in','is','on'))) * 100 >= len(tk)),
         |pkeyed AS (
         |  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_key
         |  FROM pkept),
         |surv AS (
         |  SELECT min(doc_id) AS doc_id, content_key
         |  FROM pkeyed GROUP BY content_key),
         |lab AS (
         |  SELECT s.doc_id, s.content_key, coalesce(c.cluster_id, s.doc_id) AS cid
         |  FROM surv s LEFT JOIN expanded c ON s.doc_id = c.doc_id),
         |win AS (
         |  SELECT doc_id, content_key,
         |    min(doc_id) OVER (PARTITION BY cid) AS keep_id
         |  FROM lab)
         |SELECT doc_id::BIGINT AS doc_id, content_key
         |FROM win WHERE doc_id = keep_id ORDER BY doc_id""".stripMargin,
    // best-survivor variant: identical chain, final selection by
    // row_number over (raw length DESC, doc_id ASC) within the cluster
    "pipeline_fuzzy_best" ->
      s"""WITH RECURSIVE $repDocShingles,
         |$fuzzyEdgesCte,
         |$clustersCte,
         |$expandClustersCte,
         |pq AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
         |  FROM documents),
         |pkept AS (
         |  SELECT doc_id, text FROM pq
         |  WHERE len(tk) >= 10 AND len(tk) <= 100000
         |    AND len(list_filter(tk, t -> t IN ('the','a','of','and','to','in','is','on'))) * 100 >= len(tk)),
         |pkeyed AS (
         |  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_key
         |  FROM pkept),
         |surv AS (
         |  SELECT min(doc_id) AS doc_id, content_key
         |  FROM pkeyed GROUP BY content_key),
         |lens AS (SELECT doc_id, length(text)::BIGINT AS n_chars_kept FROM documents),
         |lab AS (
         |  SELECT s.doc_id, s.content_key, l.n_chars_kept,
         |    coalesce(c.cluster_id, s.doc_id) AS cid
         |  FROM surv s
         |  JOIN lens l USING (doc_id)
         |  LEFT JOIN expanded c ON s.doc_id = c.doc_id),
         |win AS (
         |  SELECT doc_id, content_key, n_chars_kept,
         |    row_number() OVER (PARTITION BY cid
         |      ORDER BY n_chars_kept DESC, doc_id ASC) AS rk
         |  FROM lab)
         |SELECT doc_id::BIGINT AS doc_id, content_key, n_chars_kept
         |FROM win WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    // e2e funnel replay: the fuzzy chain's CTEs produce stages 2-4; the
    // decontamination overlap runs over its own (all-doc) shingle CTEs
    // (d-prefixed — repDocShingles' toks/sh are rep-restricted); stage 6
    // applies the mix coin to stage 5's survivors
    "pipeline_e2e" ->
      s"""WITH RECURSIVE $repDocShingles,
         |$fuzzyEdgesCte,
         |$clustersCte,
         |$expandClustersCte,
         |pq AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS tk
         |  FROM documents),
         |pkept AS (
         |  SELECT doc_id, text FROM pq
         |  WHERE len(tk) >= 10 AND len(tk) <= 100000
         |    AND len(list_filter(tk, t -> t IN ('the','a','of','and','to','in','is','on'))) * 100 >= len(tk)),
         |pkeyed AS (
         |  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_key
         |  FROM pkept),
         |surv AS (
         |  SELECT min(doc_id) AS doc_id, content_key
         |  FROM pkeyed GROUP BY content_key),
         |lab AS (
         |  SELECT s.doc_id, coalesce(c.cluster_id, s.doc_id) AS cid
         |  FROM surv s LEFT JOIN expanded c ON s.doc_id = c.doc_id),
         |win AS (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY cid) AS keep_id FROM lab),
         |fz AS (SELECT doc_id FROM win WHERE doc_id = keep_id),
         |dtoks AS (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
         |  FROM documents),
         |dsh AS (
         |  SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+3], ' ') AS shingle
         |  FROM dtoks, UNNEST(range(0, len(toks) - 2)) AS u(i)
         |  WHERE len(toks) >= 3),
         |ev AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id % 97 = 0),
         |flagged AS (
         |  SELECT s.doc_id FROM dsh s JOIN ev ON s.shingle = ev.shingle
         |  WHERE s.doc_id % 97 != 0
         |  GROUP BY s.doc_id HAVING count(*) >= 3),
         |dec AS (
         |  SELECT doc_id FROM fz
         |  WHERE doc_id % 97 != 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)),
         |smp AS (
         |  SELECT d.doc_id FROM dec d JOIN documents c USING (doc_id)
         |  WHERE ('0x' || substr(md5('mix:' || d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000
         |      < ('0x' || substr(md5('rate:' || c.source), 1, 15))::BIGINT % 800 + 100)
         |SELECT stage, n_docs FROM (
         |  SELECT '1_raw' AS stage, count(*)::BIGINT AS n_docs FROM documents
         |  UNION ALL SELECT '2_quality', count(*)::BIGINT FROM pkept
         |  UNION ALL SELECT '3_exact', count(*)::BIGINT FROM surv
         |  UNION ALL SELECT '4_fuzzy', count(*)::BIGINT FROM fz
         |  UNION ALL SELECT '5_decontaminated', count(*)::BIGINT FROM dec
         |  UNION ALL SELECT '6_sampled', count(*)::BIGINT FROM smp)
         |ORDER BY stage""".stripMargin,
    "pipeline_clean" ->
      """WITH q AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id, text FROM q
        |  WHERE len(toks) >= 10 AND len(toks) <= 100000
        |    AND len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','on'))) * 100 >= len(toks)),
        |keyed AS (
        |  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_key
        |  FROM kept)
        |SELECT min(doc_id)::BIGINT AS doc_id, content_key
        |FROM keyed GROUP BY content_key ORDER BY doc_id""".stripMargin,
    // BPE pair scoring: distinct-word freq table -> weighted adjacent
    // char pairs -> top-20 by (cnt desc, pair asc)
    "vocab_bpe_pairs" ->
      """WITH w AS (
        |  SELECT token AS word, count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), t -> length(t) > 0)) AS token
        |        FROM documents)
        |  GROUP BY token),
        |p AS (
        |  SELECT substr(word, i::INT, 2) AS pair, freq
        |  FROM w, UNNEST(range(1, length(word))) AS u(i)
        |  WHERE length(word) >= 2),
        |c AS (SELECT pair, sum(freq)::BIGINT AS cnt FROM p GROUP BY pair)
        |SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair ASC)::BIGINT AS rk
        |FROM c ORDER BY rk LIMIT 20""".stripMargin,
    // full BPE training replay: 3 chained rounds (the graph_pagerank
    // unrolling style) — per round, arg-max pair then the greedy
    // non-overlapping merge, applied via run-parity window math
    // (candidates at consecutive positions only exist for self-pairs;
    // within each run, every other candidate applies)
    "vocab_bpe_train" -> bpeTrainOracle,
    // tokenizer APPLICATION replay: chain the same 3 training rounds to
    // get each distinct word's post-merge symbol sequence (words4),
    // then join per-doc token occurrences and sum symbol counts
    "vocab_bpe_encode" -> bpeEncodeOracle,
    // fertility rollup: the encode replay's words4 symbol table joined
    // to per-doc occurrences + language, aggregated per lang
    "vocab_fertility" ->
      s"""WITH w0 AS (
         |  SELECT token AS word, count(*)::BIGINT AS freq
         |  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), t -> length(t) > 0)) AS token
         |        FROM documents)
         |  GROUP BY token),
         |words1 AS (
         |  SELECT word, freq,
         |    list_transform(range(1, length(word) + 1), i -> substr(word, i::INT, 1)) AS syms
         |  FROM w0),
         |${bpeRound(1)},
         |${bpeRound(2)},
         |${bpeRound(3)},
         |dt AS (
         |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> length(t) > 0)) AS word
         |  FROM documents)
         |SELECT dd.lang,
         |  count(*)::BIGINT AS n_words,
         |  sum(length(d.word))::BIGINT AS n_syms0,
         |  sum(len(w.syms))::BIGINT AS n_bpe,
         |  ((1000 * sum(len(w.syms))) // count(*))::BIGINT AS fertility_milli,
         |  ((1000 * sum(len(w.syms))) // sum(length(d.word)))::BIGINT AS compression_milli
         |FROM dt d JOIN words4 w ON d.word = w.word
         |JOIN documents dd ON d.doc_id = dd.doc_id
         |GROUP BY 1 ORDER BY lang""".stripMargin,
    // LM score: per-bigram exact conditionals floor((C(w1w2)*1000)/C(w1·)),
    // doc score = floor(mean); occurrences, not distinct bigrams
    "text_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, array_to_string(toks[i+1:i+2], ' ') AS bigram
        |  FROM toks, UNNEST(range(0, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bs AS (SELECT bigram, count(*)::BIGINT AS c_bigram FROM bg GROUP BY bigram),
        |w1s AS (
        |  SELECT split_part(bigram, ' ', 1) AS w1, sum(c_bigram)::BIGINT AS c_w1
        |  FROM bs GROUP BY 1),
        |sc AS (
        |  SELECT bigram, (c_bigram * 1000) // c_w1 AS cond_milli
        |  FROM bs JOIN w1s ON split_part(bs.bigram, ' ', 1) = w1s.w1)
        |SELECT g.doc_id, count(*)::BIGINT AS n_bigrams,
        |  (sum(sc.cond_milli) // count(*))::BIGINT AS lm_milli
        |FROM bg g JOIN sc ON g.bigram = sc.bigram
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // Kneser-Ney: same bigram stream; smoothing stats from the types
    // table (c_w1 + distinct continuations per w1, distinct left
    // contexts per w2, total types T), identical integer formula
    "text_lm_kn" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, array_to_string(toks[i+1:i+2], ' ') AS bigram
        |  FROM toks, UNNEST(range(0, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bs AS (
        |  SELECT bigram, count(*)::BIGINT AS c12,
        |    split_part(bigram, ' ', 1) AS w1,
        |    split_part(bigram, ' ', 2) AS w2
        |  FROM bg GROUP BY bigram),
        |w1s AS (
        |  SELECT w1, sum(c12)::BIGINT AS c_w1, count(*)::BIGINT AS n_fw
        |  FROM bs GROUP BY w1),
        |w2s AS (SELECT w2, count(*)::BIGINT AS n_bw FROM bs GROUP BY w2),
        |ty AS (SELECT count(*)::BIGINT AS t_types FROM bs),
        |sc AS (
        |  SELECT bigram,
        |    ((c12 - 1) * 1000) // c_w1 +
        |      (((1000 * n_fw) // c_w1) * ((1000 * n_bw) // t_types)) // 1000
        |      AS cond_milli
        |  FROM bs JOIN w1s USING (w1) JOIN w2s USING (w2), ty)
        |SELECT g.doc_id, count(*)::BIGINT AS n_bigrams,
        |  (sum(sc.cond_milli) // count(*))::BIGINT AS kn_milli
        |FROM bg g JOIN sc ON g.bigram = sc.bigram
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // held-out LM: train-split counts, add-one smoothing with the
    // train vocabulary size, coverage via seen-bigram count
    "text_lm_holdout" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, array_to_string(toks[i+1:i+2], ' ') AS bigram,
        |    toks[i+1] AS w1
        |  FROM toks, UNNEST(range(0, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |tb AS (
        |  SELECT bigram, count(*)::BIGINT AS c12
        |  FROM bg WHERE doc_id % 10 <> 0 GROUP BY bigram),
        |tu AS (
        |  SELECT t.tok AS w1, count(*)::BIGINT AS c1
        |  FROM toks, unnest(toks) AS t(tok)
        |  WHERE doc_id % 10 <> 0 GROUP BY t.tok),
        |v AS (SELECT count(*)::BIGINT AS v FROM tu),
        |sc AS (
        |  SELECT g.doc_id,
        |    ((1000 * (coalesce(tb.c12, 0) + 1)) // (coalesce(tu.c1, 0) + v.v))::BIGINT
        |      AS cond_milli,
        |    CASE WHEN tb.c12 IS NOT NULL THEN 1 ELSE 0 END::BIGINT AS seen
        |  FROM bg g
        |  LEFT JOIN tb USING (bigram)
        |  LEFT JOIN tu ON tu.w1 = g.w1
        |  CROSS JOIN v
        |  WHERE g.doc_id % 10 = 0)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(seen)::BIGINT AS n_seen,
        |  (sum(cond_milli) // count(*))::BIGINT AS lm_milli
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // CCNet terciles: same LM CTEs, histogram-derived edges
    // (e_k = min lm with 3*cum >= k*n), bucket + roll up
    "mix_ccnet" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, array_to_string(toks[i+1:i+2], ' ') AS bigram
        |  FROM toks, UNNEST(range(0, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bs AS (SELECT bigram, count(*)::BIGINT AS c_bigram FROM bg GROUP BY bigram),
        |w1s AS (
        |  SELECT split_part(bigram, ' ', 1) AS w1, sum(c_bigram)::BIGINT AS c_w1
        |  FROM bs GROUP BY 1),
        |sc AS (
        |  SELECT bigram, (c_bigram * 1000) // c_w1 AS cond_milli
        |  FROM bs JOIN w1s ON split_part(bs.bigram, ' ', 1) = w1s.w1),
        |lm AS (
        |  SELECT g.doc_id, count(*)::BIGINT AS n_bigrams,
        |    (sum(sc.cond_milli) // count(*))::BIGINT AS lm_milli
        |  FROM bg g JOIN sc ON g.bigram = sc.bigram
        |  GROUP BY g.doc_id),
        |scored AS (
        |  SELECT l.doc_id, l.n_bigrams, l.lm_milli, d.lang
        |  FROM lm l JOIN documents d ON d.doc_id = l.doc_id),
        |dist AS (SELECT lang, lm_milli, count(*)::BIGINT AS cnt FROM scored GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, lm_milli,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY lm_milli)::BIGINT AS cum
        |  FROM dist),
        |tot AS (SELECT lang, sum(cnt)::BIGINT AS n FROM dist GROUP BY lang),
        |edges AS (
        |  SELECT c.lang,
        |    min(CASE WHEN c.cum * 3 >= t.n THEN c.lm_milli END) AS e1,
        |    min(CASE WHEN c.cum * 3 >= t.n * 2 THEN c.lm_milli END) AS e2
        |  FROM cum c JOIN tot t ON c.lang = t.lang GROUP BY c.lang)
        |SELECT s.lang,
        |  CASE WHEN s.lm_milli <= e.e1 THEN 'tail'
        |       WHEN s.lm_milli <= e.e2 THEN 'middle'
        |       ELSE 'head' END AS bucket,
        |  count(*)::BIGINT AS n_docs, sum(s.n_bigrams)::BIGINT AS n_bigrams
        |FROM scored s JOIN edges e ON e.lang = s.lang
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // curriculum schedule mirror: same lm CTEs as mix_ccnet, per-source
    // means, then pure integer interpolation over the 1-row totals
    "mix_curriculum" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, array_to_string(toks[i+1:i+2], ' ') AS bigram
        |  FROM toks, UNNEST(range(0, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bs AS (SELECT bigram, count(*)::BIGINT AS c_bigram FROM bg GROUP BY bigram),
        |w1s AS (
        |  SELECT split_part(bigram, ' ', 1) AS w1, sum(c_bigram)::BIGINT AS c_w1
        |  FROM bs GROUP BY 1),
        |sc AS (
        |  SELECT bigram, (c_bigram * 1000) // c_w1 AS cond_milli
        |  FROM bs JOIN w1s ON split_part(bs.bigram, ' ', 1) = w1s.w1),
        |lm AS (
        |  SELECT g.doc_id, (sum(sc.cond_milli) // count(*))::BIGINT AS lm_milli
        |  FROM bg g JOIN sc ON g.bigram = sc.bigram
        |  GROUP BY g.doc_id),
        |dtok AS (
        |  SELECT doc_id, source, len(toks)::BIGINT AS n_toks FROM toks
        |  JOIN documents USING (doc_id)),
        |src AS (
        |  SELECT d.source, count(*)::BIGINT AS n_docs,
        |    sum(l.lm_milli)::BIGINT AS sum_lm, sum(d.n_toks)::BIGINT AS n_tokens
        |  FROM lm l JOIN dtok d USING (doc_id) GROUP BY 1),
        |q AS (SELECT source, n_tokens, (sum_lm // n_docs)::BIGINT AS q_milli FROM src),
        |tot AS (SELECT sum(q_milli)::BIGINT AS sum_q,
        |               sum(n_tokens)::BIGINT AS total_tokens,
        |               count(*)::BIGINT AS n_src FROM q),
        |e AS (SELECT unnest(range(0, 3)) AS epoch)
        |SELECT e.epoch::BIGINT AS epoch, q.source, q.q_milli,
        |  (((1000 // n_src) * (2 - e.epoch)
        |    + ((1000 * q.q_milli) // sum_q) * e.epoch) // 2)::BIGINT AS w_milli,
        |  ((((1000 // n_src) * (2 - e.epoch)
        |    + ((1000 * q.q_milli) // sum_q) * e.epoch) // 2)
        |   * total_tokens // 1000)::BIGINT AS planned_tokens
        |FROM q CROSS JOIN tot CROSS JOIN e
        |ORDER BY epoch, source""".stripMargin,
    // priority source merge: arg-min by (source rank, doc_id) per lead
    // fingerprint (md5 of the first 5 normalized tokens)
    // mix sampler: both engines derive rate and coin from md5 prefixes
    // (h60 parity: ('0x' || substr(md5(s), 1, 15))::BIGINT)
    // the streaming twin shares the batch sampler's relation verbatim —
    // stateless hash decisions are batch/stream invariant
    "stream_mix_sample" ->
      """WITH d AS (
        |  SELECT source,
        |    ('0x' || substr(md5('rate:' || source), 1, 15))::BIGINT % 800 + 100 AS rate_milli,
        |    ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000 AS toss
        |  FROM documents)
        |SELECT source, rate_milli, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN toss < rate_milli THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  (sum(CASE WHEN toss < rate_milli THEN 1 ELSE 0 END) * 1000 // count(*))::BIGINT
        |    AS achieved_milli
        |FROM d GROUP BY source, rate_milli ORDER BY source""".stripMargin,
    "pipeline_mix_sample" ->
      """WITH d AS (
        |  SELECT source,
        |    ('0x' || substr(md5('rate:' || source), 1, 15))::BIGINT % 800 + 100 AS rate_milli,
        |    ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000 AS toss
        |  FROM documents)
        |SELECT source, rate_milli, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN toss < rate_milli THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  (sum(CASE WHEN toss < rate_milli THEN 1 ELSE 0 END) * 1000 // count(*))::BIGINT
        |    AS achieved_milli
        |FROM d GROUP BY source, rate_milli ORDER BY source""".stripMargin,
    "pipeline_priority_merge" ->
      """WITH d AS (
        |  SELECT doc_id, source, CAST(substr(source, 4) AS BIGINT) AS prio,
        |    md5(array_to_string(
        |      (list_filter(string_split(lower(trim(text)), ' '), t -> length(t) > 0))[1:5],
        |      ' ')) AS lead_key
        |  FROM documents),
        |r AS (
        |  SELECT lead_key, doc_id, source,
        |    row_number() OVER (PARTITION BY lead_key ORDER BY prio, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lead_key) AS n_candidates
        |  FROM d)
        |SELECT lead_key, doc_id AS keep_doc_id, source AS keep_source,
        |  n_candidates::BIGINT AS n_candidates
        |FROM r WHERE rk = 1 ORDER BY lead_key""".stripMargin,
    // shard packing: distributed prefix sum mirrored as bucket-local
    // running sums + exclusive bucket offsets (bucketSize=100, budget=2048)
    "shard_plan" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0))::BIGINT AS n_tokens,
        |    doc_id // 100 AS bucket
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens, bucket,
        |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d),
        |b AS (SELECT bucket, sum(n_tokens) AS bucket_tokens FROM d GROUP BY bucket),
        |o AS (
        |  SELECT bucket,
        |    coalesce(sum(bucket_tokens) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bucket_offset
        |  FROM b)
        |SELECT c.doc_id, c.n_tokens,
        |  (o.bucket_offset + c.cum - c.n_tokens)::BIGINT AS global_start,
        |  ((o.bucket_offset + c.cum - c.n_tokens) // 2048)::BIGINT AS shard_id
        |FROM c JOIN o USING (bucket) ORDER BY c.doc_id""".stripMargin,
    // salted two-phase counts: result-identical to urlcount_counts (the
    // oracle proves the salt changes the PLAN, not the relation)
    "urlcount_salted" ->
      """SELECT token, count(*)::BIGINT AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token
        |ORDER BY token""".stripMargin,
    "urlcount_zipf" ->
      """WITH c AS (
        |  SELECT token, count(*)::BIGINT AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0 GROUP BY token)
        |SELECT cnt, count(*)::BIGINT AS n_tokens
        |FROM c GROUP BY cnt ORDER BY cnt""".stripMargin,
    // streaming canonical-host monitor: the batch oracle minus the
    // distinct-page column (unsupported under a streaming rollup)
    // streaming best-rep: the batch query's exact relation (shared
    // oracle) — Complete-mode state replays every arrival
    "stream_best_rep" -> bestRepOracle,
    // ingest probe replay: dup = window present in the % 4 != 0 split
    "stream_substring" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    ${h60("array_to_string(toks[i+1:i+8], ' ')")} AS w
         |  FROM toks, UNNEST(range(0, len(toks) - 7)) AS u(i)
         |  WHERE len(toks) >= 8),
         |hist AS (SELECT DISTINCT w FROM sh WHERE doc_id % 4 <> 0)
         |SELECT s.doc_id, count(*)::BIGINT AS n_windows,
         |  sum(CASE WHEN h.w IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hist_dup,
         |  ((1000 * sum(CASE WHEN h.w IS NOT NULL THEN 1 ELSE 0 END)::BIGINT)
         |    // count(*))::BIGINT AS dup_milli
         |FROM sh s LEFT JOIN hist h USING (w)
         |WHERE s.doc_id % 4 = 0
         |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,
    // streaming fold-in audit: totals + exact distinct + gate TRUE
    "stream_profile_fold" ->
      """WITH toks AS (
        |  SELECT source, t.tok AS token
        |  FROM documents,
        |    unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS t(tok))
        |SELECT source, count(*)::BIGINT AS n_tokens,
        |  count(DISTINCT token)::BIGINT AS n_distinct_exact,
        |  TRUE AS union_within_tolerance
        |FROM toks GROUP BY source ORDER BY source""".stripMargin,
    // streaming sketch profile: per-source token totals with the HLL
    // union gate expected TRUE (the corpus_sketch_profile discipline)
    "stream_sketch_profile" ->
      """WITH toks AS (
        |  SELECT source, t.tok AS token
        |  FROM documents,
        |    unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS t(tok))
        |SELECT source, count(*)::BIGINT AS n_tokens,
        |  TRUE AS union_within_tolerance
        |FROM toks GROUP BY source ORDER BY source""".stripMargin,
    "stream_urlcount_canonical" ->
      """WITH u AS (
        |  SELECT lower(
        |    CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
        |    source || '.example.COM/p/' || (doc_id % 50)::VARCHAR ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '?utm_source=feed&id=' || (doc_id % 7)::VARCHAR
        |      ELSE '?id=' || (doc_id % 7)::VARCHAR END) AS lu
        |  FROM documents),
        |c AS (
        |  SELECT regexp_replace(regexp_replace(lu, '^https?://', ''), '^www\.', '')
        |    AS nw, lu FROM u),
        |p AS (
        |  SELECT regexp_extract(nw, '^([^/?]+)', 1) AS host,
        |    CASE WHEN len(regexp_extract_all(lu, '[?&](utm_[a-z]+|ref)=')) > 0
        |      THEN 1 ELSE 0 END AS tracked
        |  FROM c)
        |SELECT host, count(*)::BIGINT AS n_urls, sum(tracked)::BIGINT AS n_tracked
        |FROM p GROUP BY host ORDER BY host""".stripMargin,
    // URL canonicalization: same fixture derivation, lowercase + strip
    // scheme/www + drop query for page identity, tracking-param audit
    "urlcount_canonical" ->
      """WITH u AS (
        |  SELECT lower(
        |    CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
        |    source || '.example.COM/p/' || (doc_id % 50)::VARCHAR ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '?utm_source=feed&id=' || (doc_id % 7)::VARCHAR
        |      ELSE '?id=' || (doc_id % 7)::VARCHAR END) AS lu
        |  FROM documents),
        |c AS (
        |  SELECT regexp_replace(regexp_replace(lu, '^https?://', ''), '^www\.', '')
        |    AS nw, lu FROM u),
        |p AS (
        |  SELECT regexp_extract(nw, '^([^/?]+)', 1) AS host,
        |    regexp_replace(nw, '\?.*$', '') AS page,
        |    CASE WHEN len(regexp_extract_all(lu, '[?&](utm_[a-z]+|ref)=')) > 0
        |      THEN 1 ELSE 0 END AS tracked
        |  FROM c)
        |SELECT host, count(*)::BIGINT AS n_urls,
        |  count(DISTINCT page)::BIGINT AS n_pages,
        |  sum(tracked)::BIGINT AS n_tracked
        |FROM p GROUP BY host ORDER BY host""".stripMargin,
    // int8 quantization: all integer math on non-negative magnitudes
    // with the sign reapplied — trunc and floor division agree there,
    // and every product stays far below 2^53 so the double-division
    // round-trip is exact (a nonzero integer numerator-residue cannot
    // land within one ulp of an integer quotient at these magnitudes)
    "sim_quantize" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> floor(x::DOUBLE * 1000000)::BIGINT) AS vm
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vm,
        |    list_max(list_transform(vm, x -> abs(x))) AS scale
        |  FROM e),
        |x AS (SELECT vec_id, scale, unnest(vm) AS v FROM m),
        |r AS (
        |  SELECT vec_id, scale, v,
        |    CASE WHEN scale = 0 THEN 0
        |      ELSE (CASE WHEN v < 0 THEN -1 ELSE 1 END) *
        |        ((((abs(v) * 127) // scale) * scale) // 127)
        |      END AS recon
        |  FROM x)
        |SELECT vec_id, scale::BIGINT AS scale_micros,
        |  sum(abs(v - recon))::BIGINT AS sum_err_micros,
        |  max(abs(v - recon))::BIGINT AS max_err_micros
        |FROM r GROUP BY vec_id, scale ORDER BY vec_id""".stripMargin,
    // Gram matrix over the same int8 quantization: lateral index pair
    // (i <= j), products summed per cell — all exact integers
    "emb_gram" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> floor(x::DOUBLE * 1000000)::BIGINT) AS vm
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vm,
        |    list_max(list_transform(vm, x -> abs(x))) AS scale
        |  FROM e),
        |q AS (
        |  SELECT vec_id,
        |    list_transform(vm, v -> CASE WHEN scale = 0 THEN 0
        |      ELSE (CASE WHEN v < 0 THEN -1 ELSE 1 END) * ((abs(v) * 127) // scale)
        |      END) AS q
        |  FROM m),
        |x AS (
        |  SELECT i::BIGINT AS di, j::BIGINT AS dj,
        |    q[(i + 1)::INT] * q[(j + 1)::INT] AS p
        |  FROM q,
        |    UNNEST(range(0, len(q))) AS gi(i),
        |    UNNEST(range(0, len(q))) AS gj(j)
        |  WHERE j >= i)
        |SELECT di, dj, count(*)::BIGINT AS n_vecs, sum(p)::BIGINT AS g
        |FROM x GROUP BY di, dj ORDER BY di, dj""".stripMargin,
    // JL projection replay: the same int8 codes, the sign matrix from
    // the shared md5 family (parity of h60("jl:j:i")), y via a
    // (vec, j) cross-join aggregation, distances as integer list math
    "emb_jl_project" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> floor(x::DOUBLE * 1000000)::BIGINT) AS vm
        |  FROM embeddings),
        |mm AS (
        |  SELECT vec_id, vm,
        |    list_max(list_transform(vm, x -> abs(x))) AS scale
        |  FROM e),
        |q AS (
        |  SELECT vec_id,
        |    list_transform(vm, v -> CASE WHEN scale = 0 THEN 0
        |      ELSE (CASE WHEN v < 0 THEN -1 ELSE 1 END) * ((abs(v) * 127) // scale)
        |      END) AS q
        |  FROM mm),
        |s AS (
        |  SELECT j, i,
        |    CASE WHEN ('0x' || substr(md5('jl:' || j || ':' || i), 1, 15))::BIGINT % 2 = 0
        |         THEN 1 ELSE -1 END AS sgn
        |  FROM UNNEST(range(0, 16)) AS tj(j), UNNEST(range(0, 64)) AS ti(i)),
        |y AS (
        |  SELECT vec_id, j, sum(sgn * q[(i + 1)::INT])::BIGINT AS yv
        |  FROM q, s GROUP BY vec_id, j),
        |yl AS (SELECT vec_id, list(yv ORDER BY j) AS y FROM y GROUP BY vec_id),
        |p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    a.q AS qa, b.q AS qb, ya.y AS ya, yb.y AS yb
        |  FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
        |  JOIN yl ya ON ya.vec_id = a.vec_id
        |  JOIN yl yb ON yb.vec_id = b.vec_id
        |  WHERE a.vec_id % 50 = 0)
        |SELECT vec_a, vec_b,
        |  list_sum(list_transform(range(1, 65),
        |    k -> (qa[k::INT] - qb[k::INT]) * (qa[k::INT] - qb[k::INT])))::BIGINT AS d2,
        |  list_sum(list_transform(range(1, 17),
        |    k -> (ya[k::INT] - yb[k::INT]) * (ya[k::INT] - yb[k::INT])))::BIGINT AS dp2,
        |  CASE WHEN d2 = 0 THEN NULL
        |       ELSE (1000 * dp2) // (16 * d2) END AS ratio_milli
        |FROM p ORDER BY vec_a""".stripMargin,
    // power iteration over the mean-scaled Gram: three chained CTE
    // rounds, each a matrix-vector product + max-abs milli rescale;
    // Spark div and DuckDB // both truncate toward zero, and the
    // rescale sign-decomposes anyway
    "emb_pca_power" ->
      s"""WITH $pcaCtes
         |SELECT 1::BIGINT AS it, j::BIGINT AS dim_idx, v::BIGINT AS v_milli FROM v1
         |UNION ALL SELECT 2, j, v FROM v2
         |UNION ALL SELECT 3, j, v FROM v3
         |ORDER BY it, dim_idx""".stripMargin,
    // ABTT audit: per-vector energy fraction along the power-iterated
    // dominant direction (HUGEINT for the ppm product)
    "emb_abtt" ->
      s"""WITH $pcaCtes,
         |u AS (SELECT j AS d, v AS u FROM v3),
         |uu AS (SELECT sum(u * u)::BIGINT AS uu FROM u),
         |qx AS (
         |  SELECT vec_id, i::BIGINT AS d, q[(i + 1)::INT] AS qd
         |  FROM q, UNNEST(range(0, len(q))) AS ui(i)),
         |qq AS (SELECT vec_id, sum(qd * qd)::BIGINT AS qq FROM qx GROUP BY vec_id),
         |dt AS (
         |  SELECT x.vec_id, sum(x.qd * u.u)::BIGINT AS dot_u
         |  FROM qx x JOIN u ON u.d = x.d GROUP BY x.vec_id)
         |SELECT d.vec_id, d.dot_u,
         |  CASE WHEN qq.qq > 0 AND uu.uu > 0
         |    THEN ((d.dot_u::HUGEINT * d.dot_u * 1000000) // (qq.qq::HUGEINT * uu.uu))::BIGINT
         |    ELSE 0 END AS energy_ppm
         |FROM dt d JOIN qq USING (vec_id), uu ORDER BY vec_id""".stripMargin,
    // dim stats: same integerization; mean via the floor-div guard,
    // variance via (n*sumsq - s^2) // n^2 in HUGEINT (nonneg numerator)
    "emb_dim_stats" ->
      """WITH e AS (
        |  SELECT i, floor(embedding[(i + 1)::INT]::DOUBLE * 1000000)::BIGINT AS micros
        |  FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)),
        |g AS (
        |  SELECT i::BIGINT AS i, count(*)::BIGINT AS n, sum(micros)::BIGINT AS s,
        |    sum(micros::HUGEINT * micros) AS sq,
        |    min(micros)::BIGINT AS min_micros, max(micros)::BIGINT AS max_micros
        |  FROM e GROUP BY i)
        |SELECT i, n,
        |  ((s - ((s % n + n) % n)) // n)::BIGINT AS mean_micros,
        |  ((n::HUGEINT * sq - s::HUGEINT * s) // (n::HUGEINT * n))::BIGINT AS var_micros2,
        |  min_micros, max_micros
        |FROM g ORDER BY i""".stripMargin,
    // centroid stats: per-element floor(v*1e6) integerization THEN the
    // integer sum — order-independent. Sums can be negative and BOTH
    // engines' integer division truncates toward zero, so both sides
    // spell exact floor division with a nonneg-mod guard (Spark: pmod +
    // div; DuckDB: ((s % n + n) % n) + //)
    "emb_label_centroids" ->
      """WITH e AS (
        |  SELECT label, i,
        |    floor(embedding[(i + 1)::INT]::DOUBLE * 1000000)::BIGINT AS micros
        |  FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)),
        |g AS (
        |  SELECT label, i, count(*)::BIGINT AS n, sum(micros)::BIGINT AS s
        |  FROM e GROUP BY label, i)
        |SELECT label::BIGINT AS label, i::BIGINT AS i, n,
        |  ((s - ((s % n + n) % n)) // n)::BIGINT AS mean_micros
        |FROM g ORDER BY label, i""".stripMargin,
    // CMS gate: oracle recomputes the exact top-5 and asserts the
    // tolerance flag — i.e. the sketch estimate landed within 5%
    "urlcount_cms" -> cmsOracle,
    // SQL-surface twin of urlcount_cms: same sketch, same gate, same oracle
    "sql_cms" -> cmsOracle,
    // determinism-contract fuzz (VERDICT r12 #7): both sides derive the
    // SAME adversarial rows from md5 of 'row:i' — no table input — and
    // apply each contract rule in isolation. Floor division is spelled
    // EXPLICITLY in the twin ((x - pmod-twin) // d, exact because the
    // numerator is snapped): DuckDB's bare `//` TRUNCATES toward zero
    // like Spark's `div` (measured -7 // 2 = -3), so the corpus oracles'
    // plain `epoch_us // 1e6` twins only agree because corpus timestamps
    // are non-negative — on these ±1e18 ns rows the explicit form is load-
    // bearing, which is exactly what this query exists to pin.
    "contract_fuzz_rows" ->
      """WITH r AS (
        |  SELECT i,
        |    CAST(('0x' || substr(md5('row:' || i), 1, 15)) AS BIGINT) AS h,
        |    CAST(('0x' || substr(md5('row:' || i), 1, 8)) AS BIGINT) AS h2
        |  FROM generate_series(1, 512) t(i)),
        |v AS (
        |  SELECT i, h, h2,
        |    (h % 2000000000000000000) - 1000000000000000000 AS ts_ns,
        |    (h2 % 97) + 3 AS m,
        |    ((h % 4000001) - 2000000) / 1000.0 AS money
        |  FROM r)
        |SELECT i, h AS h60, h2 AS h32, ts_ns,
        |  (ts_ns - ((ts_ns % 1000000000 + 1000000000) % 1000000000)) // 1000000000 AS unix_sec,
        |  (ts_ns - ((ts_ns % 1000000 + 1000000) % 1000000)) // 1000000 AS unix_ms,
        |  ((ts_ns % m + m) % m) AS r_pmod,
        |  money,
        |  CAST(floor(money * 997) AS BIGINT) AS floor_narrow,
        |  (h - 576460752303423488) * 8 AS big62
        |FROM v ORDER BY i""".stripMargin,
    // the accumulation rules over the same derived rows: DECIMAL-routed
    // mixed-sign money sums as DOUBLE, near-overflow DECIMAL(38,0) sums
    // as strings (representation must agree, not just value)
    "contract_fuzz_sums" ->
      """WITH r AS (
        |  SELECT i,
        |    CAST(('0x' || substr(md5('row:' || i), 1, 15)) AS BIGINT) AS h,
        |    CAST(('0x' || substr(md5('row:' || i), 1, 8)) AS BIGINT) AS h2
        |  FROM generate_series(1, 512) t(i)),
        |v AS (
        |  SELECT (h2 % 10) AS grp,
        |    (h % 2000000000000000000) - 1000000000000000000 AS ts_ns,
        |    ((h % 4000001) - 2000000) / 1000.0 AS money
        |  FROM r)
        |SELECT grp, count(*)::BIGINT AS n_rows,
        |  CAST(sum(CAST(money AS DECIMAL(18,6))) AS DOUBLE) AS money_sum,
        |  CAST(sum(CAST(ts_ns AS DECIMAL(38,0)) * 4000000000) AS VARCHAR) AS big_dec_sum
        |FROM v GROUP BY grp ORDER BY grp""".stripMargin,
    // two-phase exact distinct: same relation as COUNT(DISTINCT)
    "ev_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // deny-list scrub: token-level mask + audit counts; scrubbed text
    // compared by md5 (the chunkDocs pattern); the stateless streaming
    // twin produces the identical relation, so it shares the oracle
    "text_scrub" -> scrubOracle,
    "stream_scrub" -> scrubOracle,
    // PII detect + redact: injected deterministic contacts, regex trio
    // counted on raw text, masked text proven by md5; stateless
    // streaming twin shares the oracle
    "text_pii" -> piiOracle,
    "stream_pii" -> piiOracle,
    // Heaps-law growth: first bucket per token via min over one hash
    // aggregation; cumulative sums over the |buckets| result rows
    "vocab_growth" ->
      """WITH mx AS (SELECT max(doc_id) AS max_id FROM documents),
        |tok AS (
        |  SELECT (doc_id * 10) // (max_id + 1) AS bucket,
        |    unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS token
        |  FROM documents, mx),
        |occ AS (SELECT bucket, count(*)::BIGINT AS n_tokens FROM tok GROUP BY bucket),
        |fs AS (SELECT token, min(bucket) AS bucket FROM tok GROUP BY token),
        |nt AS (SELECT bucket, count(*)::BIGINT AS n_new_types FROM fs GROUP BY bucket)
        |SELECT o.bucket, o.n_tokens,
        |  coalesce(nt.n_new_types, 0)::BIGINT AS n_new_types,
        |  sum(o.n_tokens) OVER (ORDER BY o.bucket)::BIGINT AS cum_tokens,
        |  sum(coalesce(nt.n_new_types, 0)) OVER (ORDER BY o.bucket)::BIGINT AS cum_types
        |FROM occ o LEFT JOIN nt USING (bucket) ORDER BY bucket""".stripMargin,
    // coverage curve: frequency-class rollup, running sums over the
    // class table, arithmetic interpolation inside the boundary class;
    // need = ceil(p*T/1e6) in HUGEINT
    "vocab_coverage" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS token
        |  FROM documents),
        |tf AS (SELECT token, count(*)::BIGINT AS c FROM tok GROUP BY token),
        |cls AS (SELECT c, count(*)::BIGINT AS n_types FROM tf GROUP BY c),
        |cum AS (
        |  SELECT c, n_types, c * n_types AS cls_toks,
        |    sum(c * n_types) OVER (ORDER BY c DESC)::BIGINT AS cum_toks,
        |    sum(n_types) OVER (ORDER BY c DESC)::BIGINT AS cum_types
        |  FROM cls),
        |tot AS (
        |  SELECT max(cum_toks)::BIGINT AS t_tokens, max(cum_types)::BIGINT AS t_types
        |  FROM cum),
        |thr AS (SELECT unnest([500000, 900000, 990000])::BIGINT AS p),
        |nd AS (
        |  SELECT p, ((p::HUGEINT * t_tokens + 999999) // 1000000)::BIGINT AS need,
        |    t_tokens, t_types
        |  FROM thr, tot)
        |SELECT p AS threshold_ppm, need AS need_tokens,
        |  (cum_types - n_types
        |    + ((need - (cum_toks - cls_toks) + c - 1) // c))::BIGINT AS n_types_needed,
        |  t_types AS n_types_total, t_tokens AS n_tokens_total
        |FROM nd JOIN cum ON cum_toks >= need AND (cum_toks - cls_toks) < need
        |ORDER BY threshold_ppm""".stripMargin,
    // snapshot diff: deterministic old/new snapshot projections, one
    // full-outer join on doc_id, md5 content compare, per-source rollup
    "corpus_snapshot_diff" ->
      """WITH snap_old AS (
        |  SELECT doc_id, source, md5(text) AS h FROM documents WHERE doc_id % 10 <> 7),
        |snap_new AS (
        |  SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 10 = 5 THEN text || ' rev2' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 10 <> 3),
        |d AS (
        |  SELECT coalesce(o.source, n.source) AS source,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN o.h <> n.h THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM snap_old o FULL OUTER JOIN snap_new n ON o.doc_id = n.doc_id)
        |SELECT source, status, count(*)::BIGINT AS n_docs
        |FROM d GROUP BY source, status ORDER BY source, status""".stripMargin,
    // term drift: per-half term counts, full-outer on term, add-one
    // smoothed lift in HUGEINT, support floor, top-k movers
    "corpus_term_drift" ->
      """WITH ta AS (
        |  SELECT t.term, count(*)::BIGINT AS f_old
        |  FROM documents,
        |    unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS t(term)
        |  WHERE doc_id % 2 = 0 GROUP BY t.term),
        |tb AS (
        |  SELECT t.term, count(*)::BIGINT AS f_new
        |  FROM documents,
        |    unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS t(term)
        |  WHERE doc_id % 2 <> 0 GROUP BY t.term),
        |j AS (
        |  SELECT coalesce(ta.term, tb.term) AS term,
        |    coalesce(f_old, 0) AS f_old, coalesce(f_new, 0) AS f_new
        |  FROM ta FULL OUTER JOIN tb ON ta.term = tb.term),
        |tot AS (
        |  SELECT sum(f_old)::BIGINT AS t_old, sum(f_new)::BIGINT AS t_new,
        |    count(*)::BIGINT AS v
        |  FROM j)
        |SELECT term, f_old, f_new,
        |  (((f_old + 1)::HUGEINT * (t_new + v) * 1000)
        |    // ((f_new + 1)::HUGEINT * (t_old + v)))::BIGINT AS lift_milli
        |FROM j, tot WHERE f_old + f_new >= 20
        |ORDER BY abs(lift_milli - 1000) DESC, term LIMIT 20""".stripMargin,
    // token-budget allocator: temperature weights over token counts
    // (sqrt is IEEE-identical, as pipeline_mix_temperature), the wide
    // product in HUGEINT mirroring Spark's DECIMAL(38,0), 4-epoch cap
    "mix_token_budget" ->
      """WITH c AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(text, ' '), t -> length(t) > 0)))::BIGINT
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |s AS (SELECT source, n_tokens,
        |    floor(sqrt(n_tokens) * 1000)::BIGINT AS s_milli FROM c),
        |t AS (SELECT source, n_tokens, s_milli,
        |    sum(s_milli) OVER ()::BIGINT AS tot_s,
        |    sum(n_tokens) OVER ()::BIGINT AS tot_tokens FROM s),
        |p AS (SELECT source, n_tokens,
        |    ((1000000 * s_milli) // tot_s)::BIGINT AS w_ppm, tot_tokens FROM t),
        |q AS (SELECT source, n_tokens, w_ppm,
        |    ((w_ppm::HUGEINT * tot_tokens * 2) // 1000000)::BIGINT AS want_tokens FROM p),
        |e AS (SELECT source, n_tokens, w_ppm, want_tokens,
        |    least(4000, (want_tokens * 1000) // n_tokens)::BIGINT AS epochs_milli FROM q)
        |SELECT source, n_tokens, w_ppm, want_tokens, epochs_milli,
        |  ((n_tokens * epochs_milli) // 1000)::BIGINT AS alloc_tokens,
        |  (want_tokens - (n_tokens * epochs_milli) // 1000)::BIGINT AS shortfall
        |FROM e ORDER BY source""".stripMargin,
    // novelty replay: same lowercased word n-grams, hashed distinct
    // sides, anti-join per n
    "corpus_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT t.doc_id, nn.n,
        |    ('0x' || substr(md5(array_to_string(toks[i+1:i+nn.n], ' ')), 1, 15))::BIGINT AS w
        |  FROM toks t, (VALUES (1), (3), (8)) AS nn(n),
        |    UNNEST(range(0, len(toks) - nn.n + 1)) AS u(i)
        |  WHERE len(toks) >= nn.n),
        |old AS (SELECT DISTINCT n, w FROM g WHERE doc_id % 10 <> 7),
        |neu AS (SELECT DISTINCT n, w FROM g WHERE doc_id % 10 <> 3),
        |co AS (SELECT n, count(*)::BIGINT AS grams_old FROM old GROUP BY n),
        |cn AS (SELECT n, count(*)::BIGINT AS grams_new FROM neu GROUP BY n),
        |nv AS (SELECT n, count(*)::BIGINT AS novel
        |       FROM neu ANTI JOIN old USING (n, w) GROUP BY n)
        |SELECT cn.n::BIGINT AS n, co.grams_old, cn.grams_new,
        |  coalesce(nv.novel, 0)::BIGINT AS novel,
        |  ((1000000 * coalesce(nv.novel, 0)) // cn.grams_new)::BIGINT AS novel_ppm
        |FROM cn JOIN co ON co.n = cn.n LEFT JOIN nv ON nv.n = cn.n
        |ORDER BY n""".stripMargin,
    // chi-square replay: same floors, HUGEINT for the squared products
    "corpus_chi2" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*)::BIGINT AS o
        |  FROM documents GROUP BY lang, source),
        |m AS (
        |  SELECT lang, source, o,
        |    sum(o) OVER (PARTITION BY lang) AS r,
        |    sum(o) OVER (PARTITION BY source) AS c,
        |    sum(o) OVER () AS n
        |  FROM cells),
        |x AS (
        |  SELECT lang, source, o,
        |    ((1000 * r::HUGEINT * c) // n)::BIGINT AS e_milli
        |  FROM m),
        |y AS (
        |  SELECT lang, source, o, e_milli,
        |    (((1000 * o::HUGEINT - e_milli) * (1000 * o::HUGEINT - e_milli))
        |      // (1000 * greatest(e_milli, 1)))::BIGINT AS chi2_milli
        |  FROM x)
        |SELECT lang, source, o AS n_obs, e_milli, chi2_milli,
        |  sum(chi2_milli) OVER ()::BIGINT AS chi2_total_milli
        |FROM y ORDER BY lang, source""".stripMargin,
    // bootstrap replay: identical Poisson inverse-CDF weights from the
    // md5 family, rank the replicate means, pick the p5/p95 band
    "corpus_bootstrap" ->
      """WITH x AS (
        |  SELECT d.doc_id, d.n_chars, t.b,
        |    ('0x' || substr(md5('boot:' || t.b || ':' || d.doc_id), 1, 15))::BIGINT
        |      % 1000000 AS u
        |  FROM documents d, UNNEST(range(1, 33)) AS t(b)),
        |r AS (
        |  SELECT b,
        |    sum(CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
        |             WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
        |             WHEN u < 996340 THEN 4 ELSE 5 END) AS n_eff,
        |    sum(n_chars * CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
        |             WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
        |             WHEN u < 996340 THEN 4 ELSE 5 END) AS mass
        |  FROM x GROUP BY b HAVING sum(CASE WHEN u < 367879 THEN 0
        |    WHEN u < 735759 THEN 1 WHEN u < 919699 THEN 2
        |    WHEN u < 981012 THEN 3 WHEN u < 996340 THEN 4
        |    ELSE 5 END) > 0),
        |q AS (
        |  SELECT (1000 * mass) // n_eff AS rep_mean,
        |    row_number() OVER (ORDER BY (1000 * mass) // n_eff ASC, b ASC) AS rk
        |  FROM r)
        |SELECT 32::BIGINT AS n_resamples,
        |  (SELECT (1000 * sum(n_chars)) // count(*) FROM documents)::BIGINT
        |    AS mean_milli,
        |  (SELECT rep_mean FROM q WHERE rk = 2)::BIGINT AS ci_lo_milli,
        |  (SELECT rep_mean FROM q WHERE rk = 31)::BIGINT AS ci_hi_milli""".stripMargin,
    // epoch-repeat replay: the same chained integer decay per epoch,
    // one global greedy rank over the bounded candidate table
    "mix_epoch_repeat" ->
      """WITH c AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(text, ' '), t -> length(t) > 0)))::BIGINT
        |      AS u_tokens
        |  FROM documents GROUP BY source),
        |b AS (SELECT source, u_tokens,
        |    (SELECT sum(u_tokens) FROM c) * 2 AS budget FROM c),
        |cand AS (
        |  SELECT source, u_tokens, budget, e,
        |    CASE WHEN e = 1 THEN u_tokens
        |         WHEN e = 2 THEN ((u_tokens * 600) // 1000)
        |         WHEN e = 3 THEN ((((u_tokens * 600) // 1000) * 600) // 1000)
        |         ELSE ((((((u_tokens * 600) // 1000) * 600) // 1000) * 600) // 1000)
        |    END AS v
        |  FROM b, (VALUES (1), (2), (3), (4)) AS t(e)),
        |r AS (
        |  SELECT *, sum(u_tokens) OVER (ORDER BY v DESC, source ASC, e ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_raw
        |  FROM cand)
        |SELECT source, max(u_tokens)::BIGINT AS u_tokens,
        |  sum(CASE WHEN cum_raw <= budget THEN 1 ELSE 0 END)::BIGINT AS epochs,
        |  sum(CASE WHEN cum_raw <= budget THEN u_tokens ELSE 0 END)::BIGINT AS raw_tokens,
        |  sum(CASE WHEN cum_raw <= budget THEN v ELSE 0 END)::BIGINT AS eff_tokens
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "stream_dsir" -> dsirOracle,
    // distilled-quality serving: per-doc clamp-then-divide prediction
    // with the SAME train-split rational coefficients as mix_distill
    "stream_distill" -> distillStreamOracle,
    "stream_bpe_encode" -> bpeEncodeOracle,
    // hot-user monitor: append emission = windows whose END the final
    // watermark passed; tag ties break on the STRING form of user_id
    "stream_hot_users" ->
      """WITH wm AS (
        |  SELECT (max(epoch_us(ts)) // 1000 - 7200000) AS wm_ms FROM events),
        |pu AS (
        |  SELECT ((epoch_us(ts) // 1000000) // 3600) * 3600 AS win_start, user_id,
        |    count(*)::BIGINT AS n
        |  FROM events, wm
        |  WHERE ((((epoch_us(ts) // 1000000) // 3600) * 3600) + 3600) * 1000 <= wm_ms
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT win_start, user_id, n,
        |    row_number() OVER (PARTITION BY win_start
        |                       ORDER BY n DESC, user_id::VARCHAR ASC) AS rk
        |  FROM pu)
        |SELECT win_start, user_id, n, rk FROM rk WHERE rk <= 3
        |ORDER BY win_start, rk""".stripMargin,
    // hashed linear classifier: weight(token) = h60('w:'||token) % 1001
    // - 500, score = sum over token occurrences — pure integer math;
    // stateless streaming twin shares the oracle
    "text_classifier" -> classifierOracle,
    "stream_classifier" -> classifierOracle,
    // trained classifier: the oracle replays the exact fixed-point LMS
    // weight trajectory (all-integer, sign-decomposed //), then the
    // rank-sum AUC and the threshold sweep over the same final weights
    "text_classifier_train" -> classifierTrainOracle,
    "text_classifier_auc" -> classifierAucOracle,
    "text_classifier_pr" -> classifierPrOracle,
    // exact-substring duplication report: 8-token windows hashed to 60
    // bits, window document frequency, per-doc duplicated fraction
    // source-pair containment matrix over distinct 8-token windows;
    // string '<' is bytewise in both engines (ASCII source names)
    // normalization ladder mirror: identical regex rungs ('g' flag —
    // Spark replaces all matches by default), h60 keys, 4-row lag
    "dedup_normalization" ->
      s"""WITH kk AS (
         |  SELECT text AS c0, lower(text) AS c1,
         |    regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS c2
         |  FROM documents),
         |kk3 AS (
         |  SELECT c0, c1, c2,
         |    regexp_replace(c2, '[^a-z0-9 ]', '', 'g') AS c3
         |  FROM kk),
         |r AS (
         |  SELECT 0::BIGINT AS rung, ${h60("c0")} AS hkey FROM kk3
         |  UNION ALL SELECT 1, ${h60("c1")} FROM kk3
         |  UNION ALL SELECT 2, ${h60("c2")} FROM kk3
         |  UNION ALL SELECT 3, ${h60("c3")} FROM kk3),
         |p AS (
         |  SELECT rung, count(*)::BIGINT AS n_docs,
         |    count(DISTINCT hkey)::BIGINT AS n_distinct
         |  FROM r GROUP BY rung)
         |SELECT rung, n_docs, n_distinct,
         |  (n_docs - n_distinct)::BIGINT AS n_collapsible,
         |  ((n_docs - n_distinct)
         |    - coalesce(lag(n_docs - n_distinct) OVER (ORDER BY rung), 0))::BIGINT
         |    AS gain_vs_prev
         |FROM p ORDER BY rung""".stripMargin,
    // token-weighted ladder: per-(rung, key) kept member via min_by,
    // token sums in BIGINT, 4-row lag
    "dedup_reclaim" ->
      s"""WITH kk AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(text, ' '), t -> length(t) > 0))::BIGINT AS n_tok,
         |    text AS c0, lower(text) AS c1,
         |    regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS c2
         |  FROM documents),
         |kk3 AS (
         |  SELECT doc_id, n_tok, c0, c1, c2,
         |    regexp_replace(c2, '[^a-z0-9 ]', '', 'g') AS c3
         |  FROM kk),
         |r AS (
         |  SELECT 0::BIGINT AS rung, ${h60("c0")} AS hkey, doc_id, n_tok FROM kk3
         |  UNION ALL SELECT 1, ${h60("c1")}, doc_id, n_tok FROM kk3
         |  UNION ALL SELECT 2, ${h60("c2")}, doc_id, n_tok FROM kk3
         |  UNION ALL SELECT 3, ${h60("c3")}, doc_id, n_tok FROM kk3),
         |g AS (
         |  SELECT rung, hkey, count(*)::BIGINT AS n, sum(n_tok)::BIGINT AS tok_sum,
         |    min_by(n_tok, doc_id)::BIGINT AS kept_tok
         |  FROM r GROUP BY rung, hkey),
         |p AS (
         |  SELECT rung, sum(n)::BIGINT AS n_docs, count(*)::BIGINT AS n_groups,
         |    sum(tok_sum)::BIGINT AS tokens_total,
         |    sum(tok_sum - kept_tok)::BIGINT AS tokens_reclaimed
         |  FROM g GROUP BY rung)
         |SELECT rung, n_docs, n_groups, (n_docs - n_groups)::BIGINT AS n_collapsible,
         |  tokens_total, tokens_reclaimed,
         |  (tokens_reclaimed
         |    - coalesce(lag(tokens_reclaimed) OVER (ORDER BY rung), 0))::BIGINT
         |    AS reclaim_gain_vs_prev
         |FROM p ORDER BY rung""".stripMargin,
    // padding audit mirror: identical integer round-up caps, 1-row max
    "corpus_padding_audit" ->
      """WITH d AS (
        |  SELECT len(list_filter(string_split(lower(text), ' '), t -> length(t) > 0))::BIGINT AS n
        |  FROM documents),
        |dd AS (SELECT n FROM d WHERE n > 0),
        |mx AS (SELECT max(n)::BIGINT AS max_n FROM dd),
        |r AS (
        |  SELECT 'global' AS scheme, n, max_n AS cap FROM dd CROSS JOIN mx
        |  UNION ALL SELECT 'bucket256', n, ((n + 255) // 256) * 256 FROM dd
        |  UNION ALL SELECT 'bucket64', n, ((n + 63) // 64) * 64 FROM dd)
        |SELECT scheme, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS n_tokens,
        |  sum(cap)::BIGINT AS n_padded,
        |  ((1000 * (sum(cap) - sum(n))) // sum(cap))::BIGINT AS waste_milli
        |FROM r GROUP BY scheme ORDER BY scheme""".stripMargin,
    // epoch-shuffle mirror: h60('e:'||doc_id) sort keys, hash-range
    // shards (width = 2^60 div n_shards, last shard absorbs remainder),
    // per-shard row_number; 2 epochs x 8 shards
    "corpus_shuffle" ->
      s"""WITH e AS (SELECT unnest(range(0, 2)) AS epoch),
         |d AS (
         |  SELECT epoch, doc_id,
         |    ${h60("epoch::VARCHAR || ':' || doc_id::VARCHAR")} AS hkey
         |  FROM documents CROSS JOIN e),
         |s AS (
         |  SELECT epoch::BIGINT AS epoch, doc_id,
         |    least(hkey // ${(1L << 60) / 8}, 7)::BIGINT AS shard, hkey
         |  FROM d)
         |SELECT epoch, doc_id, shard,
         |  row_number() OVER (PARTITION BY epoch, shard
         |                     ORDER BY hkey, doc_id)::BIGINT AS pos
         |FROM s ORDER BY epoch, shard, pos""".stripMargin,
    // concat-and-chunk packing: same epoch-0 hash order and hash-range
    // shards as corpus_shuffle; prefix sums give each doc's span, the
    // rollup counts windows, tail padding and boundary-straddling docs
    "corpus_pack" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(lower(text), ' '), t -> length(t) > 0))::BIGINT AS n,
         |    ${h60("'0:' || doc_id::VARCHAR")} AS hkey
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, n, hkey,
         |    least(hkey // ${(1L << 60) / 8}, 7)::BIGINT AS shard
         |  FROM d WHERE n > 0),
         |c AS (
         |  SELECT shard, doc_id, n,
         |    sum(n) OVER (PARTITION BY shard ORDER BY hkey, doc_id
         |                 ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_end
         |  FROM s)
         |SELECT shard, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS total_tokens,
         |  ((sum(n) + 2047) // 2048)::BIGINT AS n_windows,
         |  (((sum(n) + 2047) // 2048) * 2048 - sum(n))::BIGINT AS pad_tokens,
         |  sum(CASE WHEN (cum_end - n) // 2048 <> (cum_end - 1) // 2048
         |      THEN 1 ELSE 0 END)::BIGINT AS n_boundary_docs
         |FROM c GROUP BY shard ORDER BY shard""".stripMargin,
    "corpus_overlap" ->
      s"""WITH toks AS (
         |  SELECT source, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
         |  FROM documents),
         |sw AS (
         |  SELECT DISTINCT source,
         |    ${h60("array_to_string(toks[i+1:i+8], ' ')")} AS w
         |  FROM toks, UNNEST(range(0, len(toks) - 7)) AS u(i)
         |  WHERE len(toks) >= 8),
         |tot AS (SELECT source, count(*)::BIGINT AS n_windows FROM sw GROUP BY source),
         |sh AS (
         |  SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_shared
         |  FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT s.src_a, s.src_b, s.n_shared,
         |  ta.n_windows AS n_windows_a, tb.n_windows AS n_windows_b,
         |  ((1000 * s.n_shared) // least(ta.n_windows, tb.n_windows))::BIGINT AS containment_milli
         |FROM sh s
         |JOIN tot ta ON ta.source = s.src_a
         |JOIN tot tb ON tb.source = s.src_b
         |ORDER BY src_a, src_b""".stripMargin,
    // KMV sketch twin: bottom-128 of the 32-bit window hashes per
    // source (row_number replays the bounded aggregate), estimates via
    // (k-1)*M // u_k with the under-filled-sketch exact branch
    "corpus_kmv_overlap" ->
      """WITH toks AS (
        |  SELECT source, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
        |  FROM documents),
        |sw AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(array_to_string(toks[i+1:i+8], ' ')), 1, 8))::BIGINT AS w
        |  FROM toks, UNNEST(range(0, len(toks) - 7)) AS u(i)
        |  WHERE len(toks) >= 8),
        |rk AS (
        |  SELECT source, w, row_number() OVER (PARTITION BY source ORDER BY w) AS r
        |  FROM sw),
        |sk AS (
        |  SELECT source, list_sort(list(w)) AS sk FROM rk WHERE r <= 128 GROUP BY source),
        |es AS (
        |  SELECT source, sk,
        |    CASE WHEN len(sk) < 128 THEN len(sk)::BIGINT
        |      ELSE (127 * 4294967296) // sk[128] END AS est
        |  FROM sk),
        |ux AS (
        |  SELECT a.source AS src_a, b.source AS src_b, a.est AS est_a, b.est AS est_b,
        |    list_sort(list_distinct(a.sk || b.sk))[1:128] AS uk,
        |    list_intersect(a.sk, b.sk) AS shared
        |  FROM es a JOIN es b ON a.source < b.source),
        |fin AS (
        |  SELECT src_a, src_b, len(uk)::BIGINT AS k_used,
        |    len(list_intersect(uk, shared))::BIGINT AS n_shared, est_a, est_b,
        |    CASE WHEN len(uk) < 128 THEN len(uk)::BIGINT
        |      ELSE (127 * 4294967296) // uk[128] END AS est_union
        |  FROM ux)
        |SELECT src_a, src_b, k_used, n_shared, est_a, est_b, est_union,
        |  (n_shared * est_union) // k_used AS est_inter
        |FROM fin ORDER BY src_a, src_b""".stripMargin,
    "dedup_substring" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    ${h60("array_to_string(toks[i+1:i+8], ' ')")} AS w
         |  FROM toks, UNNEST(range(0, len(toks) - 7)) AS u(i)
         |  WHERE len(toks) >= 8),
         |df AS (SELECT w, count(*)::BIGINT AS n_docs FROM sh GROUP BY w)
         |SELECT s.doc_id, count(*)::BIGINT AS n_windows,
         |  sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_windows,
         |  ((1000 * sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT) // count(*))::BIGINT AS dup_milli
         |FROM sh s JOIN df f USING (w)
         |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,
    // incremental replay: the SAME corpus-wide distinct-doc counts
    // (disjoint batches sum to them), restricted to the fresh split
    "dedup_substring_refresh" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS toks
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    ${h60("array_to_string(toks[i+1:i+8], ' ')")} AS w
         |  FROM toks, UNNEST(range(0, len(toks) - 7)) AS u(i)
         |  WHERE len(toks) >= 8),
         |df AS (SELECT w, count(*)::BIGINT AS n_docs FROM sh GROUP BY w)
         |SELECT s.doc_id, count(*)::BIGINT AS n_windows,
         |  sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_windows,
         |  ((1000 * sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT) // count(*))::BIGINT AS dup_milli
         |FROM sh s JOIN df f USING (w)
         |WHERE s.doc_id % 4 = 0
         |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,
    // span REMOVAL replay: total-occurrence window counts (within-doc
    // repeats included, per Lee et al.), a token is removed iff covered
    // by any duplicated window start in [p-7, p]; rebuild joins kept
    // original-case tokens in order
    "dedup_substring_rewrite" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks,
         |    list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS ltoks
         |  FROM documents),
         |base AS (
         |  SELECT doc_id, toks, len(toks)::BIGINT AS n_toks, ltoks
         |  FROM b WHERE len(toks) > 0),
         |sh AS (
         |  SELECT doc_id, i AS pos,
         |    ${h60("array_to_string(ltoks[i+1:i+8], ' ')")} AS w
         |  FROM base, UNNEST(range(0, n_toks - 7)) AS u(i)
         |  WHERE n_toks >= 8),
         |dupw AS (SELECT w FROM sh GROUP BY w HAVING count(*) >= 2),
         |dup AS (SELECT s.doc_id, s.pos FROM sh s JOIN dupw USING (w)),
         |posr AS (
         |  SELECT doc_id, i AS p, toks[i+1] AS tok
         |  FROM base, UNNEST(range(0, n_toks)) AS u(i)),
         |rem AS (
         |  SELECT DISTINCT p.doc_id, p.p
         |  FROM posr p JOIN dup d
         |    ON p.doc_id = d.doc_id AND p.p BETWEEN d.pos AND d.pos + 7),
         |keptr AS (
         |  SELECT p.doc_id, p.p, p.tok
         |  FROM posr p LEFT JOIN rem r ON p.doc_id = r.doc_id AND p.p = r.p
         |  WHERE r.p IS NULL),
         |reb AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_kept,
         |    string_agg(tok, ' ' ORDER BY p) AS clean_text,
         |    sum(length(tok))::BIGINT AS kept_chars
         |  FROM keptr GROUP BY doc_id),
         |mass AS (
         |  SELECT doc_id,
         |    coalesce(list_sum(list_transform(toks, t -> length(t))), 0)::BIGINT AS tot_chars
         |  FROM base)
         |SELECT base.doc_id, base.n_toks,
         |  (base.n_toks - coalesce(r.n_kept, 0))::BIGINT AS n_removed,
         |  ((1000 * (base.n_toks - coalesce(r.n_kept, 0))) // base.n_toks)::BIGINT AS removed_milli,
         |  (m.tot_chars - coalesce(r.kept_chars, 0))::BIGINT AS chars_removed,
         |  coalesce(md5(r.clean_text), md5('')) AS clean_md5
         |FROM base JOIN mass m ON base.doc_id = m.doc_id
         |LEFT JOIN reb r ON base.doc_id = r.doc_id
         |ORDER BY base.doc_id""".stripMargin,
    // SemDeDup replay: representative collapse, ivf cell assignment
    // (same strided quantizer as sim_ivf), within-cell pairs at
    // cos_milli >= 400, keeper = smallest qualifying same-cell id
    "sim_semdedup" ->
      s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |vreps AS (SELECT min(vec_id) AS vec_id FROM emb GROUP BY v),
         |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |remb AS (SELECT * FROM emb WHERE vec_id IN (SELECT vec_id FROM vreps)),
         |scored AS (
         |  SELECT e.vec_id, e.v, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
         |  FROM remb e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, v, c_id AS cell FROM (
         |    SELECT vec_id, v, c_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
         |    FROM scored) WHERE ark = 1),
         |pairs AS (
         |  SELECT a.cell, b.vec_id AS vec_id, a.vec_id AS a_id,
         |    ${cosMilli("a.v", "b.v")} AS cs
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id),
         |qual AS (SELECT * FROM pairs WHERE cs >= 400),
         |sel AS (
         |  SELECT vec_id, cell, a_id, cs,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY a_id ASC, cs ASC) AS rk
         |  FROM qual)
         |SELECT vec_id, cell, a_id AS keeper_id, cs AS cos_milli
         |FROM sel WHERE rk = 1 ORDER BY vec_id""".stripMargin,
    // cell-balance replay: full-corpus assignment (no rep collapse —
    // the index serves every vector), count + share + 2x-share flag
    "sim_ivf_balance" ->
      s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |scored AS (
         |  SELECT e.vec_id, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
         |  FROM emb e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, c_id AS cell FROM (
         |    SELECT vec_id, c_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
         |    FROM scored) WHERE ark = 1),
         |g AS (SELECT cell, count(*)::BIGINT AS n_vecs FROM assigned GROUP BY cell),
         |t AS (SELECT sum(n_vecs)::BIGINT AS total, count(*)::BIGINT AS n_cells FROM g)
         |SELECT g.cell, g.n_vecs,
         |  ((1000 * g.n_vecs) // t.total)::BIGINT AS share_milli,
         |  (g.n_vecs * t.n_cells >= t.total * 2) AS hot
         |FROM g CROSS JOIN t ORDER BY cell""".stripMargin,
    // OOD: same argmax assignment keeping the best cosine, bounded
    // per-cell rollup with an argmin worst member
    "emb_ood_audit" ->
      s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |scored AS (
         |  SELECT e.vec_id, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
         |  FROM emb e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, c_id AS cell, cs FROM (
         |    SELECT vec_id, c_id, cs,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
         |    FROM scored) WHERE ark = 1),
         |worst AS (
         |  SELECT cell, cs AS worst_cos_milli, vec_id AS worst_vec_id FROM (
         |    SELECT cell, cs, vec_id,
         |      row_number() OVER (PARTITION BY cell ORDER BY cs ASC, vec_id ASC) AS rk
         |    FROM assigned) WHERE rk = 1)
         |SELECT cell, count(*)::BIGINT AS n_vecs,
         |  sum(CASE WHEN a.cs < 200 THEN 1 ELSE 0 END)::BIGINT AS n_ood,
         |  max(w.worst_cos_milli)::BIGINT AS worst_cos_milli,
         |  max(w.worst_vec_id)::BIGINT AS worst_vec_id
         |FROM assigned a JOIN worst w USING (cell)
         |GROUP BY cell ORDER BY cell""".stripMargin,
    // cell purity: the shared assignment CTE + label join, argmax by
    // (cnt, -label) mirrored as (cnt DESC, label ASC)
    "emb_cell_purity" ->
      s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v, label::BIGINT AS label
         |            FROM embeddings),
         |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |scored AS (
         |  SELECT e.vec_id, e.label, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
         |  FROM emb e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, label, c_id AS cell FROM (
         |    SELECT vec_id, label, c_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
         |    FROM scored) WHERE ark = 1),
         |cl AS (
         |  SELECT cell, label, count(*)::BIGINT AS cnt
         |  FROM assigned GROUP BY cell, label),
         |best AS (
         |  SELECT cell, label AS top_label, cnt AS n_top FROM (
         |    SELECT cell, label, cnt,
         |      row_number() OVER (PARTITION BY cell ORDER BY cnt DESC, label ASC) AS rk
         |    FROM cl) WHERE rk = 1),
         |sz AS (SELECT cell, sum(cnt)::BIGINT AS n_vecs FROM cl GROUP BY cell)
         |SELECT cell, n_vecs, top_label, n_top,
         |  ((1000 * n_top) // n_vecs)::BIGINT AS purity_milli
         |FROM sz JOIN best USING (cell) ORDER BY cell""".stripMargin,
    // nprobe sweep: probe-ranked candidates fan out to covering sweep
    // points, per-point top-k vs the brute-force truth
    "sim_nprobe_sweep" ->
      s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |scored AS (
         |  SELECT e.vec_id, e.v, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
         |  FROM emb e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, v, c_id AS cell FROM (
         |    SELECT vec_id, v, c_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
         |    FROM scored) WHERE ark = 1),
         |probes AS (
         |  SELECT q_id, cell, prk FROM (
         |    SELECT vec_id AS q_id, c_id AS cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS prk
         |    FROM scored WHERE vec_id % 50 = 0) WHERE prk <= 4),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 50 = 0),
         |cand AS (
         |  SELECT p.q_id, p.prk, a.vec_id AS n_id, ${cosMilli("qq.qv", "a.v")} AS cs
         |  FROM probes p JOIN q qq USING (q_id) JOIN assigned a ON a.cell = p.cell
         |  WHERE a.vec_id != p.q_id),
         |grid AS (
         |  SELECT q_id, n_id, cs, np::BIGINT AS np
         |  FROM cand, UNNEST(range(prk, 5)) AS u(np)),
         |topk AS (
         |  SELECT np, q_id, n_id FROM (
         |    SELECT np, q_id, n_id,
         |      row_number() OVER (PARTITION BY np, q_id ORDER BY cs DESC, n_id ASC) AS rk
         |    FROM grid) WHERE rk <= 10),
         |truth AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q.q_id, e.vec_id AS n_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${cosMilli("q.qv", "e.v")} DESC, e.vec_id ASC) AS rk
         |    FROM q CROSS JOIN emb e WHERE e.vec_id != q.q_id) WHERE rk <= 10),
         |nq AS (SELECT count(DISTINCT q_id)::BIGINT AS n_queries FROM truth),
         |hits AS (
         |  SELECT np, count(*)::BIGINT AS n_hits
         |  FROM topk t
         |  WHERE EXISTS (SELECT 1 FROM truth x
         |                WHERE x.q_id = t.q_id AND x.n_id = t.n_id)
         |  GROUP BY np)
         |SELECT np AS nprobe, n_queries, n_hits,
         |  ((1000 * n_hits) // (10 * n_queries))::BIGINT AS recall_milli
         |FROM hits CROSS JOIN nq ORDER BY nprobe""".stripMargin,
    // kNN graph: the semdedup cell/rep CTEs, all ordered same-cell
    // pairs scored, rank window cut at k=5
    "sim_knn_graph" ->
      s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |vreps AS (SELECT min(vec_id) AS vec_id FROM emb GROUP BY v),
         |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |remb AS (SELECT * FROM emb WHERE vec_id IN (SELECT vec_id FROM vreps)),
         |scored AS (
         |  SELECT e.vec_id, e.v, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
         |  FROM remb e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, v, c_id AS cell FROM (
         |    SELECT vec_id, v, c_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
         |    FROM scored) WHERE ark = 1),
         |nbrs AS (
         |  SELECT a.vec_id AS src, b.vec_id AS n_id, ${cosMilli("a.v", "b.v")} AS cos_milli
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id != b.vec_id),
         |ranked AS (
         |  SELECT src, n_id, cos_milli,
         |    row_number() OVER (PARTITION BY src ORDER BY cos_milli DESC, n_id ASC) AS rk
         |  FROM nbrs)
         |SELECT src AS vec_id, rk, n_id, cos_milli
         |FROM ranked WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin,
    // epsilon sweep: the same cell/pair CTEs, then a naive grid
    // left-join restatement of the histogram cumulation ("bucket >= tau"
    // == "cs >= tau" since every tau is a bucket boundary)
    "sim_epsilon_sweep" ->
      s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |vreps AS (SELECT min(vec_id) AS vec_id FROM emb GROUP BY v),
         |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |remb AS (SELECT * FROM emb WHERE vec_id IN (SELECT vec_id FROM vreps)),
         |scored AS (
         |  SELECT e.vec_id, e.v, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
         |  FROM remb e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, v, c_id AS cell FROM (
         |    SELECT vec_id, v, c_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
         |    FROM scored) WHERE ark = 1),
         |pairs AS (
         |  SELECT b.vec_id AS vec_id, ${cosMilli("a.v", "b.v")} AS cs
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id),
         |grid AS (SELECT (100 * g)::BIGINT AS tau_milli FROM range(0, 10) t(g)),
         |per AS (SELECT vec_id, max(cs) AS maxcs FROM pairs GROUP BY vec_id),
         |nr AS (SELECT count(*)::BIGINT AS n_reps FROM assigned),
         |pg AS (
         |  SELECT g.tau_milli, count(p.cs)::BIGINT AS n_pairs_ge
         |  FROM grid g LEFT JOIN pairs p ON p.cs >= g.tau_milli
         |  GROUP BY g.tau_milli),
         |dg AS (
         |  SELECT g.tau_milli, count(p.maxcs)::BIGINT AS n_dropped
         |  FROM grid g LEFT JOIN per p ON p.maxcs >= g.tau_milli
         |  GROUP BY g.tau_milli)
         |SELECT pg.tau_milli, pg.n_pairs_ge, dg.n_dropped, nr.n_reps,
         |  ((1000 * dg.n_dropped) // nr.n_reps)::BIGINT AS drop_permille
         |FROM pg JOIN dg USING (tau_milli) CROSS JOIN nr
         |ORDER BY tau_milli""".stripMargin,
    // PQ replay: sign-pattern codes per 8-dim subspace, per-(sub, code,
    // dim) exact-floor-division means, per-subspace |err| rollup
    "sim_pq" ->
      s"""WITH $pqCtes,
         |err AS (
         |  SELECT c.sub, k.code, c.vec_id, abs(c.xm - m.cm) AS e
         |  FROM comps c
         |  JOIN codes k ON k.vec_id = c.vec_id AND k.sub = c.sub
         |  JOIN cbm m ON m.sub = c.sub AND m.code = k.code AND m.d = c.d)
         |SELECT sub::BIGINT AS sub, count(DISTINCT code)::BIGINT AS n_codes_used,
         |  count(DISTINCT vec_id)::BIGINT AS n_vecs,
         |  sum(e)::BIGINT AS sum_abs_err_micros, max(e)::BIGINT AS max_abs_err_micros
         |FROM err GROUP BY sub ORDER BY sub""".stripMargin,
    // ADC replay: per-query (sub, code) partial-dot LUT against the
    // codebook means, score = sum of the query's 8 code hits
    "sim_pq_ann" ->
      s"""WITH $pqCtes,
         |lut AS (
         |  SELECT c.vec_id AS q_id, m.sub, m.code, sum(c.xm * m.cm)::BIGINT AS p
         |  FROM comps c JOIN cbm m ON m.sub = c.sub AND m.d = c.d
         |  WHERE c.vec_id % 50 = 0
         |  GROUP BY q_id, m.sub, m.code),
         |scored AS (
         |  SELECT l.q_id, k.vec_id, sum(l.p)::BIGINT AS adc_micro2
         |  FROM codes k JOIN lut l ON l.sub = k.sub AND l.code = k.code
         |  WHERE k.vec_id <> l.q_id
         |  GROUP BY l.q_id, k.vec_id),
         |ranked AS (
         |  SELECT q_id, vec_id, adc_micro2,
         |    row_number() OVER (PARTITION BY q_id ORDER BY adc_micro2 DESC, vec_id ASC) AS rk
         |  FROM scored)
         |SELECT q_id, rk::BIGINT AS rk, vec_id AS n_id, adc_micro2
         |FROM ranked WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin,
    // IVF-ADC replay: the sim_ivf assignment/probe CTEs feed the
    // sim_pq_ann LUT scoring — candidates only from probed cells,
    // scored by the per-query (sub, code) partial-dot table
    "sim_ivf_pq" ->
      s"""WITH $pqCtes,
         |cent AS (SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 4096),
         |cscore AS (
         |  SELECT e.vec_id, c.c_id, ${cosMilli("e.v", "c.cv")} AS cs
         |  FROM emb e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, c_id AS cell FROM (
         |    SELECT vec_id, c_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS ark
         |    FROM cscore) WHERE ark = 1),
         |probes AS (
         |  SELECT q_id, cell FROM (
         |    SELECT vec_id AS q_id, c_id AS cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, c_id ASC) AS prk
         |    FROM cscore WHERE vec_id % 50 = 0) WHERE prk <= 2),
         |lut AS (
         |  SELECT c.vec_id AS q_id, m.sub, m.code, sum(c.xm * m.cm)::BIGINT AS p
         |  FROM comps c JOIN cbm m ON m.sub = c.sub AND m.d = c.d
         |  WHERE c.vec_id % 50 = 0
         |  GROUP BY q_id, m.sub, m.code),
         |cand AS (
         |  SELECT p.q_id, a.vec_id AS n_id
         |  FROM probes p JOIN assigned a ON a.cell = p.cell
         |  WHERE a.vec_id <> p.q_id),
         |scored AS (
         |  SELECT cd.q_id, cd.n_id, sum(l.p)::BIGINT AS adc_micro2
         |  FROM cand cd
         |  JOIN codes k ON k.vec_id = cd.n_id
         |  JOIN lut l ON l.q_id = cd.q_id AND l.sub = k.sub AND l.code = k.code
         |  GROUP BY cd.q_id, cd.n_id),
         |ranked AS (
         |  SELECT q_id, n_id, adc_micro2,
         |    row_number() OVER (PARTITION BY q_id ORDER BY adc_micro2 DESC, n_id ASC) AS rk
         |  FROM scored)
         |SELECT q_id, rk::BIGINT AS rk, n_id, adc_micro2
         |FROM ranked WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin,
    // temperature mixture replay: sqrt of exact integer counts is
    // IEEE-identical on both engines; everything after the floor is ppm
    // integer math
    "pipeline_mix_temperature" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source),
        |s AS (SELECT source, n_docs, floor(sqrt(n_docs) * 1000)::BIGINT AS s_milli FROM c),
        |t AS (SELECT source, n_docs, s_milli, sum(s_milli) OVER ()::BIGINT AS tot_s,
        |  sum(n_docs) OVER ()::BIGINT AS tot_docs FROM s)
        |SELECT source, n_docs, s_milli,
        |  ((1000000 * s_milli) // tot_s)::BIGINT AS w_ppm,
        |  ((((1000000 * s_milli) // tot_s) * tot_docs) // 1000000)::BIGINT AS n_target
        |FROM t ORDER BY source""".stripMargin,
    // source cap replay: the window rank form — row-for-row equal to
    // the bounded top-k aggregate (same total order: doc_id asc)
    // DSIR weights: add-one-smoothed target/corpus bucket-count ratio in
    // thousandths, doc weight = floor-mean over token occurrences
    "mix_dsir" -> dsirOracle,
    // teacher->student distillation: exact-integer normal equations on
    // the train split, Cramer rationals, clamp-then-divide serving
    "mix_distill" -> distillOracle,
    "pipeline_source_cap" ->
      """WITH ranked AS (
        |  SELECT source, doc_id,
        |    count(*) OVER (PARTITION BY source) AS n_docs,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) AS rk
        |  FROM documents)
        |SELECT source, n_docs::BIGINT AS n_docs, doc_id, rk::BIGINT AS rk
        |FROM ranked WHERE rk <= 10 ORDER BY source, rk""".stripMargin,
    // weighted priority sampling replay: identical integer priorities
    // (md5-hex prefix div weight), rank window per source
    "sample_weighted" ->
      """WITH d AS (
        |  SELECT source, doc_id, greatest(n_chars, 1) AS w,
        |    ('0x' || substr(md5('samp:' || doc_id), 1, 15))::BIGINT
        |      // greatest(n_chars, 1) AS prio
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, prio,
        |    sum(w) OVER (PARTITION BY source) AS w_total,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY prio ASC, lpad(doc_id::VARCHAR, 12, '0') ASC) AS rk
        |  FROM d)
        |SELECT source, w_total::BIGINT AS w_total, rk::BIGINT AS rk, doc_id, prio
        |FROM r WHERE rk <= 8 ORDER BY source, rk""".stripMargin,
    // ingest weighted sampling replay: the final winner set equals the
    // batch sampler's k smallest integer priorities per source
    "stream_sample_weighted" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    ('0x' || substr(md5('samp:' || doc_id), 1, 15))::BIGINT
        |      // greatest(n_chars, 1) AS prio
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, prio,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY prio ASC, doc_id ASC) AS rk
        |  FROM d)
        |SELECT source, rk::BIGINT AS rk, doc_id, prio
        |FROM r WHERE rk <= 8 ORDER BY source, rk""".stripMargin,
    // ingest admission control replay: in-order arrival => admitted set
    // is exactly the k smallest ids per source
    "stream_source_cap" ->
      """WITH ranked AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) AS rk
        |  FROM documents)
        |SELECT source, doc_id, rk::BIGINT AS rk
        |FROM ranked WHERE rk <= 10 ORDER BY source, rk""".stripMargin,
    // SCD2 replay: change flag -> running-sum run id -> interval rows,
    // current version closed at the 9999-12-31 sentinel (epoch micros)
    "rel_scd2" ->
      s"""WITH $scd2Ctes
         |SELECT custkey, version, status, valid_from, valid_to, n_orders
         |FROM dim ORDER BY custkey, version""".stripMargin,
    // incremental merge replay: merged == full rebuild by construction,
    // so the maintenance path shares the build query's exact relation
    "rel_scd2_merge" ->
      s"""WITH $scd2Ctes
         |SELECT custkey, version, status, valid_from, valid_to, n_orders
         |FROM dim ORDER BY custkey, version""".stripMargin,
    // top-1% trim replay: same rank window, same integer cut
    "ev_outliers" ->
      """WITH e AS (
        |  SELECT event_type, event_id, floor(value * 1000)::BIGINT AS v_milli
        |  FROM events),
        |r AS (
        |  SELECT event_type, event_id, v_milli,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY v_milli DESC, event_id ASC) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n_events
        |  FROM e)
        |SELECT event_type, max(n_events)::BIGINT AS n_events,
        |  count(*)::BIGINT AS n_outliers,
        |  min(v_milli)::BIGINT AS cut_value_milli,
        |  max(v_milli)::BIGINT AS max_value_milli,
        |  sum(v_milli)::BIGINT AS outlier_sum_milli
        |FROM r WHERE rk <= n_events // 100
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // MAD flagger: quantile_cont doubled to integers, flag rule as
    // pure integer products (13490*dev2 > 35000*mad4)
    // CUSUM replay: same day buckets, same two-window closed form with
    // the virtual zero prefix folded in via least/greatest
    "ev_cusum" ->
      """WITH d AS (
        |  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS day,
        |    count(*)::BIGINT AS n_events
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT day, n_events,
        |    (1000 * sum(n_events) OVER ()) // (count(*) OVER ()) AS mean_milli
        |  FROM d),
        |c AS (
        |  SELECT day, n_events, mean_milli,
        |    sum(n_events * 1000 - mean_milli) OVER (ORDER BY day ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM m),
        |x AS (
        |  SELECT day, n_events, mean_milli, cum,
        |    cum - least(0, min(cum) OVER (ORDER BY day ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS up,
        |    greatest(0, max(cum) OVER (ORDER BY day ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - cum AS dn
        |  FROM c)
        |SELECT day, n_events, up::BIGINT AS cusum_up_milli,
        |  dn::BIGINT AS cusum_dn_milli,
        |  (up > mean_milli * 3 OR dn > mean_milli * 3) AS alarm
        |FROM x ORDER BY day""".stripMargin,
    // power: HUGEINT variance identity per arm, (n-1)-pooled, squared
    // MDE compared against the squared observed diff
    "ev_ab_power" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |    sum(CASE WHEN event_type = 'purchase'
         |        THEN floor(value * 1000)::BIGINT ELSE 0 END)::BIGINT AS conv
         |  FROM events GROUP BY user_id),
         |pa AS (
         |  SELECT user_id, conv, ${h60("'ab:' || user_id")} % 2 AS arm FROM pu),
         |a AS (
         |  SELECT arm, count(*)::BIGINT AS n, sum(conv::HUGEINT) AS s,
         |    sum(conv::HUGEINT * conv) AS ss
         |  FROM pa GROUP BY arm),
         |v AS (
         |  SELECT arm, n, (n * ss - s * s) // (n::HUGEINT * n) AS v, s // n AS mean
         |  FROM a),
         |w AS (
         |  SELECT
         |    max(CASE WHEN arm = 0 THEN n END) AS n_c,
         |    max(CASE WHEN arm = 1 THEN n END) AS n_t,
         |    max(CASE WHEN arm = 0 THEN v END) AS v_c,
         |    max(CASE WHEN arm = 1 THEN v END) AS v_t,
         |    max(CASE WHEN arm = 0 THEN mean END) AS m_c,
         |    max(CASE WHEN arm = 1 THEN mean END) AS m_t
         |  FROM v),
         |p AS (
         |  SELECT n_c, n_t,
         |    ((n_c - 1) * v_c + (n_t - 1) * v_t) // (n_c + n_t - 2) AS vp,
         |    m_t - m_c AS diff
         |  FROM w)
         |SELECT n_c::BIGINT AS n_control, n_t::BIGINT AS n_treat,
         |  vp::BIGINT AS var_pooled_milli2,
         |  ((784 * vp::HUGEINT * (n_c + n_t)) // (100 * n_c::HUGEINT * n_t))::BIGINT
         |    AS mde2_milli2,
         |  diff::BIGINT AS diff_milli,
         |  (diff * diff >= (784 * vp::HUGEINT * (n_c + n_t))
         |    // (100 * n_c::HUGEINT * n_t)) AS detectable
         |FROM p""".stripMargin,
    // conversion latency: conditional mins in one user pass, exact
    // ceil-rank percentile cuts over the converting users
    "ev_conversion_latency" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS tsec FROM events),
        |fv AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN tsec END) AS first_view
        |  FROM ev GROUP BY user_id),
        |lat AS (
        |  SELECT e.user_id, min(e.tsec) - f.first_view AS lat_sec
        |  FROM ev e JOIN fv f USING (user_id)
        |  WHERE e.event_type = 'purchase' AND f.first_view IS NOT NULL
        |    AND e.tsec >= f.first_view
        |  GROUP BY e.user_id, f.first_view),
        |r AS (
        |  SELECT lat_sec,
        |    row_number() OVER (ORDER BY lat_sec ASC, user_id ASC) AS rk,
        |    count(*) OVER () AS n
        |  FROM lat)
        |SELECT
        |  (SELECT count(*)::BIGINT FROM fv WHERE first_view IS NOT NULL) AS n_viewers,
        |  (SELECT count(*)::BIGINT FROM lat) AS n_converted,
        |  (SELECT max(CASE WHEN (rk-1)*100 < n*50 AND rk*100 >= n*50
        |              THEN lat_sec END) FROM r)::BIGINT AS p50_sec,
        |  (SELECT max(CASE WHEN (rk-1)*100 < n*90 AND rk*100 >= n*90
        |              THEN lat_sec END) FROM r)::BIGINT AS p90_sec,
        |  (SELECT max(CASE WHEN (rk-1)*100 < n*99 AND rk*100 >= n*99
        |              THEN lat_sec END) FROM r)::BIGINT AS p99_sec""".stripMargin,
    // A/B readout: same md5 coin, same one-pass Poisson ladder per
    // user, replicate diffs ranked for the 90% CI
    "ev_ab_lift" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |    sum(CASE WHEN event_type = 'purchase'
         |        THEN floor(value * 1000)::BIGINT ELSE 0 END)::BIGINT AS conv
         |  FROM events GROUP BY user_id),
         |pa AS (
         |  SELECT user_id, conv, ${h60("'ab:' || user_id")} % 2 AS arm FROM pu),
         |x AS (
         |  SELECT conv, arm, t.b,
         |    ${h60("'abboot:' || t.b || ':' || user_id")} % 1000000 AS u
         |  FROM pa, UNNEST(range(1, 33)) AS t(b)),
         |r AS (
         |  SELECT b, arm,
         |    sum(CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
         |             WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
         |             WHEN u < 996340 THEN 4 ELSE 5 END) AS n_eff,
         |    sum(conv * CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
         |             WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
         |             WHEN u < 996340 THEN 4 ELSE 5 END) AS conv_eff
         |  FROM x GROUP BY b, arm
         |  HAVING sum(CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
         |             WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
         |             WHEN u < 996340 THEN 4 ELSE 5 END) > 0),
         |rb AS (
         |  SELECT b,
         |    max(CASE WHEN arm = 0 THEN conv_eff // n_eff END) AS cv_c,
         |    max(CASE WHEN arm = 1 THEN conv_eff // n_eff END) AS cv_t
         |  FROM r GROUP BY b
         |  HAVING max(CASE WHEN arm = 0 THEN n_eff END) IS NOT NULL
         |     AND max(CASE WHEN arm = 1 THEN n_eff END) IS NOT NULL),
         |q AS (
         |  SELECT cv_t - cv_c AS diff_milli,
         |    row_number() OVER (ORDER BY cv_t - cv_c ASC, b ASC) AS rk
         |  FROM rb),
         |pt AS (
         |  SELECT
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_control,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_treat,
         |    sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
         |      // sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS cvc,
         |    sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
         |      // sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cvt
         |  FROM pa)
         |SELECT n_control, n_treat, cvc::BIGINT AS mean_control_milli,
         |  cvt::BIGINT AS mean_treat_milli, (cvt - cvc)::BIGINT AS diff_milli,
         |  (SELECT diff_milli FROM q WHERE rk = 2)::BIGINT AS ci_lo_milli,
         |  (SELECT diff_milli FROM q WHERE rk = 31)::BIGINT AS ci_hi_milli,
         |  32::BIGINT AS n_resamples
         |FROM pt""".stripMargin,
    // seasonal family: train-split hour-of-day means, held-out scoring
    "ev_seasonal" ->
      s"""WITH $seasonalCte
         |SELECT b.event_type, b.hod, b.n_train, b.baseline_milli,
         |  coalesce(r.n_eval, 0)::BIGINT AS n_eval,
         |  coalesce(r.n_alerts, 0)::BIGINT AS n_alerts
         |FROM sb b LEFT JOIN (
         |  SELECT event_type, hod, count(*)::BIGINT AS n_eval,
         |    sum(CASE WHEN alert THEN 1 ELSE 0 END)::BIGINT AS n_alerts
         |  FROM ssc GROUP BY 1, 2) r
         |  ON r.event_type = b.event_type AND r.hod = b.hod
         |ORDER BY b.event_type, b.hod""".stripMargin,
    "stream_seasonal" ->
      s"""WITH $seasonalCte
         |SELECT event_id, event_type, hod, v_milli, baseline_milli, alert
         |FROM ssc ORDER BY event_id""".stripMargin,
    "ev_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type, event_id, floor(value * 1000)::BIGINT AS v_milli
        |  FROM events),
        |md AS (
        |  SELECT event_type, (2 * quantile_cont(v_milli, 0.5))::BIGINT AS med2
        |  FROM e GROUP BY event_type),
        |dv AS (
        |  SELECT e.event_type, abs(e.v_milli * 2 - md.med2) AS dev2
        |  FROM e JOIN md USING (event_type)),
        |mad AS (
        |  SELECT event_type, (2 * quantile_cont(dev2, 0.5))::BIGINT AS mad4
        |  FROM dv GROUP BY event_type)
        |SELECT d.event_type, count(*)::BIGINT AS n_events,
        |  max(md.med2)::BIGINT AS med2, max(mad.mad4)::BIGINT AS mad4,
        |  sum(CASE WHEN mad.mad4 > 0 AND d.dev2 * 13490 > mad.mad4 * 35000
        |    THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
        |  max(CASE WHEN mad.mad4 > 0 THEN (1349 * d.dev2) // mad.mad4 END)::BIGINT
        |    AS max_mz_milli
        |FROM dv d JOIN md USING (event_type) JOIN mad USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // as-of replay: every order joined to the version valid at t - 1us
    // over the SAME dim CTE; first orders fall out of every interval
    "rel_scd2_asof" ->
      s"""WITH $scd2Ctes
         |SELECT f.o_orderkey, f.custkey, f.t,
         |  coalesce(d.status, 'NONE') AS prev_status
         |FROM (SELECT o_orderkey, o_custkey AS custkey,
         |        epoch_us(o_orderdate)::BIGINT AS t FROM orders) f
         |LEFT JOIN dim d ON d.custkey = f.custkey
         |  AND d.valid_from <= f.t - 1 AND f.t - 1 < d.valid_to
         |ORDER BY o_orderkey""".stripMargin,
    // containment replay: same candidate set as the jaccard rung, the
    // min-size denominator in the final score
    "dedup_containment" ->
      s"""WITH $repDocShingles,
         |sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
         |dfreq AS (SELECT shingle, count(*)::BIGINT AS df FROM sh GROUP BY shingle),
         |rare AS (
         |  SELECT s.doc_id, s.shingle
         |  FROM sh s JOIN dfreq d ON s.shingle = d.shingle
         |  WHERE d.df <= 50),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS n_inter
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.doc_a
         |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY c.doc_a, c.doc_b)
         |SELECT i.doc_a, i.doc_b,
         |  floor(i.n_inter * 1000.0 / least(za.sz, zb.sz))::BIGINT AS cont_milli
         |FROM inter i
         |JOIN sizes za ON za.doc_id = i.doc_a
         |JOIN sizes zb ON zb.doc_id = i.doc_b
         |WHERE floor(i.n_inter * 1000.0 / least(za.sz, zb.sz)) >= 500
         |ORDER BY doc_a, doc_b""".stripMargin,
    // norm audit replay: list_dot_product is the same sequential fold
    // the Spark dot uses; everything after the floor is integer
    "emb_norm_audit" ->
      """WITH e AS (
        |  SELECT label::BIGINT AS label,
        |    floor(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      * 1000000)::BIGINT AS norm_micros
        |  FROM embeddings)
        |SELECT label, count(*)::BIGINT AS n_vecs,
        |  sum(CASE WHEN norm_micros = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
        |  min(norm_micros)::BIGINT AS min_norm_micros,
        |  max(norm_micros)::BIGINT AS max_norm_micros,
        |  sum(norm_micros)::BIGINT AS sum_norm_micros
        |FROM e GROUP BY label ORDER BY label""".stripMargin
  )
}
