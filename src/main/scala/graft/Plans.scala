package graft

import java.nio.file.{Files, Paths}

/** Writes PLANS.md: formatted physical plans for representative queries
  * plus the scale rationale for each — the .explain audit SURVEY.md §4
  * promises (run: sbt "runMain graft.Plans /root/testdata/sf0.01").
  */
object Plans {

  private val notes: Seq[(String, String)] = Seq(
    "q01_retail_agg" ->
      """Scan → partial hash agg → single exchange on sku → final agg.
        |3-column ReadSchema (pruning reaches parquet); shuffle carries one
        |row per (partition × sku), so volume is keyspace-, not fact-bound.""".stripMargin,
    "q03_wholesale_agg" ->
      """Retail agg (one exchange) is broadcast as the BUILD side of the
        |mapping join — it is the SKU-bounded aggregate, small at any fact
        |volume, and Spark can only broadcast the non-preserved side of an
        |outer join (a hint on the preserved side is silently ignored).
        |The wholesale re-aggregation reuses hash aggregation with partial
        |combine. Two exchanges total at any fact scale.""".stripMargin,
    "q05_enrich" ->
      """Pure narrow pipeline after one BroadcastHashJoin: no exchange at
        |all. The whole enrichment (trim/cast/date parts/total) sits in a
        |single WholeStageCodegen span over the scan.""".stripMargin,
    "q09_date_window" ->
      """Timestamp range predicate is pushed to the parquet scan
        |(PushedFilters) — at 100 TB with date-partitioned data this
        |becomes partition pruning and reads only the window.""".stripMargin,
    "q15_minhash_pairs" ->
      """Explode→hash→min-agg produces signatures (one exchange); band
        |self-join on (band, key) — a proper shuffle key. Pairs emit once
        |from the first agreeing band via plain codegen comparisons, so no
        |whole-output DISTINCT exchange exists in the plan. The banded
        |frame is explicitly repartitioned on (band, key) BEFORE the
        |self-join: both sides then hang off one AQE shuffle stage and the
        |signature aggregation runs once — without it Spark plans the
        |whole agg subtree once per join side (verified in the final
        |adaptive plan; same fix applied to the cluster and SimHash
        |banding operators).""".stripMargin,
    "q18_cosine_topk" ->
      """Corpus scanned once; queries broadcast (BroadcastNestedLoopJoin);
        |cosine is the fused native expression inside codegen. Only the
        |final per-query top-k sorts, and only k·partitions rows reach it
        |in the aggregator variant (q26).""".stripMargin,
    "q22_dedup_clusters" ->
      """The O(n)-output dedup: band explode → bucket min (partial agg) →
        |join back on (band, key) → per-doc min. Every stage is hash
        |partitioned on an explicit key; output is one row per doc
        |regardless of duplicate density.""".stripMargin,
    "q27_ivf_topk" ->
      """Centroids broadcast twice (assignment + probes — linear scans);
        |candidate generation is an equi-join on centroid id. The only
        |data-sized exchanges are the two rank windows over per-cell
        |candidates, not the corpus.""".stripMargin,
    "q31_walmart_flatten" ->
      """Connector-boundary JSON scan → two Generate (explode) nodes → one
        |narrow project: the reference's quadratic per-row append loop is a
        |pure pipeline with no exchange; each payload file splits across
        |tasks and flattens partition-parallel at any payload volume.""".stripMargin,
    "q38_lsh_adaptive" ->
      """Scale-hardened ANN: plane count derived from COUNT(*) keeps bucket
        |population ≈ target at any corpus size; the per-bucket cap is a
        |WindowGroupLimit that prunes map-side BEFORE the bucket equi-join,
        |so a skewed bucket is bounded, not shuffled whole. Candidates then
        |join on bucket id (proper shuffle key), rerank with the fused
        |cosine expression.""".stripMargin,
    "q39_asof_join" ->
      """As-of join as tag-union-scan: both sides exchange ONCE on the key,
        |sort by (ts, side), and a running last(payload) window resolves
        |every match in a single linear pass — no range-join cross product
        |anywhere in the plan (the spec asserts no Join node exists).
        |
        |Round-2 flagged q08_brand_agg as a possible regression (0.87 →
        |1.66 s with no code change). Resolved as measurement noise: with
        |n=3 warm reps (Bench now reports min-of-reps) q08 is 0.85-1.07 s —
        |round 1's number — and BENCH reports `reps` so single-shot
        |outliers can no longer masquerade as regressions.""".stripMargin,
    "q45_simhash_neardup" ->
      """64-bit SimHash pigeonhole banding: the hash packs two affine
        |31-bit halves (62 random bits), so the 4 bit-bands are 16-bit
        |join keys — 65k distinct values, vs the 256-value keys a 32-bit
        |hash forces (round-2's skew hazard). Candidates equi-join on
        |(band, key); pairs emit once from the first agreeing band (no
        |whole-output DISTINCT); output only contains genuinely
        |near-identical docs (hamming ≤ 3 over 62 bits), so the Θ(n²)
        |all-pairs output of the 32-bit parameterization is gone. The
        |capped variant (q48) bounds any residual pathological bucket;
        |the cluster variant (q49) is the O(n)-output scale path.""".stripMargin,
    "q50_asof_sliced" ->
      """Hot-key-hardened as-of: rows hash to (key, time-slice), so the
        |windows below partition on BOTH — a hot key's rows spread across
        |slices instead of serializing one partition. Cross-slice matches
        |come from boundary state propagated per key over one summary row
        |per occupied slice (O(slices) serial work per key, not O(rows));
        |the boundary join is an equi-join on (key, slice). Same oracle as
        |q39 — DuckDB's native ASOF — and a property spec pins equality
        |with the unsliced operator on generated skew.""".stripMargin,
    "q51_curation_shards" ->
      """The full corpus→train-shards flagship in ONE lazy plan: stats and
        |cluster subtrees are shared (dedup best-copy and the leakage-safe
        |split both read the same minhash-cluster derivation), the split
        |rides a narrow hash of cluster_rep, and packing windows partition
        |by (split, bucket) — bounded partitions, no global running sum.
        |Every shuffle in the plan is one of the composed operators' own
        |key exchanges.""".stripMargin,
    "q52_asof_native" ->
      """The whole-operator custom plan: AsOfJoinExec between two
        |(Exchange → Sort) children — EnsureRequirements co-partitions the
        |sides on user_id and sorts (key, ts) in-partition; the node itself
        |is a streaming merge holding ONE buffered right payload (no
        |null-padded union structs, no per-row window state, no post-
        |filter). Each side shuffles only its own columns. At this SF the
        |composed q39 wall-clock is similar (one union shuffle vs two
        |smaller ones); the native shape wins where it matters at scale:
        |a source bucketed on the key skips its Exchange entirely
        |(requiredChildDistribution is satisfiable), and per-partition
        |memory is O(1) instead of a window frame.""".stripMargin,
    "q53_repetition_signals" ->
      """Zero-exchange: one WholeStageCodegen span from parquet scan to
        |output. All four repetition signals come from the single-pass
        |native graft_repetition expression over the materialized token
        |array — the composed alternative is three explode→groupBy→max
        |rounds, i.e. three shuffles of ~40× the corpus volume.""".stripMargin,
    "q54_decontamination" ->
      """Decontamination as a distinct-gram equi-join: both sides explode
        |to DISTINCT (doc, gram) pairs (window arrays built per row from a
        |bound array column — no per-element re-tokenization), the eval
        |side collapses to a gram set, and the join + per-doc count shuffle
        |only on (gram) and (doc). Nothing is pairwise; a benchmark-sized
        |eval side broadcasts under AQE.""".stripMargin,
    "q61_hll_users" ->
      """One narrow projection (mixHash → bucket/rank, all codegen integer
        |ops) + ONE hash aggregate on (event_type, bucket) with map-side
        |partial combine: the only exchange carries ≤ types × 64 rows per
        |map task regardless of event volume. No pre-distinct of the key —
        |max is idempotent — so the usual count(distinct) key shuffle
        |never exists.""".stripMargin,
    "q62_cm_heavy_hitters" ->
      """Sketch side: tokenize → encode ONCE (explicit Project keeps the
        |8-op encoding from being fanned into the 4 bucket expressions) →
        |posexplode(4) → one hash agg on (row, bucket): shuffle is ≤
        |4×2048 cells per map task. Estimate side: top-50 via
        |TakeOrdered, then a BROADCAST join against the ≤8k-row sketch —
        |the only full-corpus shuffles are the two token aggregations.""".stripMargin,
    "q63_bloom_semijoin" ->
      """Three stacked BroadcastHashJoin LeftSemi probes over the orders
        |scan — the fact side is never exploded, aggregated, or shuffled;
        |the segment filter is pushed to the customer parquet scan
        |(PushedFilters) and the distinct set-bit position table broadcasts
        |in KBs. Surviving rows stay inside one codegen span for the
        |downstream consumer.""".stripMargin,
    "q64_sales_rollup" ->
      """One Expand pass (3 grouping sets) feeding a single hash aggregate
        |+ one exchange — detail, per-flag subtotal, and grand total in one
        |scan of lineitem, never three.""".stripMargin,
    "q65_events_pivot" ->
      """Pivot with a PINNED value list compiles to conditional aggregates:
        |one scan, one hash agg on hr, one exchange. An open-ended pivot
        |would need a distinct-values job first and make the schema
        |data-dependent.""".stripMargin,
    "q66_token_deciles" ->
      """The distributed-exact quantile shape: tokenize + hash agg BY VALUE
        |(exchange carries one row per distinct token count), then the
        |cumulative window + threshold selection run over that tiny
        |aggregated table — the single-partition window is over O(distinct
        |values), never corpus rows, and no global row sort exists.""".stripMargin,
    "q67_salted_join" ->
      """At this SF the replicated dim side still fits the broadcast
        |threshold, so AQE picks BroadcastHashJoin and salting costs
        |nothing (broadcast is itself the first-choice skew fix). When the
        |dim side outgrows broadcast, the same plan becomes a shuffle join
        |on (key, salt): the fact side adds a narrow per-row salt, the dim
        |side expands salt× via explode before its exchange, and a hot
        |orderkey hashes to `salt` distinct reducer partitions instead of
        |one. Output drops the salt either way — the result is the plain
        |join's multiset with the straggler sliced.""".stripMargin,
    "q68_profile" ->
      """Multi-distinct aggregate: Catalyst plans count(distinct c) × 4 as
        |ONE Expand (input × 5 gutters) + two-phase aggregation — exactness
        |costs a 5× shuffle multiplier on a 4-column projection. The
        |per-column output shape is a literal explode of the single result
        |row.""".stripMargin,
    "q69_editdist_verify" ->
      """Candidate generation is the q45 SimHash plan (banded self-join,
        |near-linear pair count); the Levenshtein DP then runs only on the
        |449-pair candidate set after two joins back to 500-char text
        |prefixes — the dominant cost stays the sketch, not the pairwise
        |verification.""".stripMargin,
    "q72_props_json" ->
      """from_json evaluates inside the scan's codegen span with a DECLARED
        |schema — no inference pass over the corpus — and the aggregation
        |is a plain partial/final hash agg on event_type: one exchange
        |whose volume is the type keyspace, not the fact rows.""".stripMargin,
    "q73_events_gapfill" ->
      """The fact table feeds exactly two aggregates: per-(type, hour)
        |counts (one exchange on the composite key) and a 2-row global
        |min/max bound. The dense grid is a BroadcastNestedLoopJoin of two
        |TINY relations (distinct types × exploded hour spine) — never a
        |fact-row expansion — and the final left join BROADCASTS the count
        |aggregate: every relation past the two scans is aggregate-bounded
        |(keys × hours), so no fact row ever reaches a join at any
        |scale.""".stripMargin,
    "q74_parts_intersect" ->
      """INTERSECT plans as per-side partial aggregates and a left-semi
        |hash join — each side dedups BEFORE its exchange, so shuffle
        |volume is distinct keys per year, not shipped line items.""".stripMargin,
    "q75_sales_cube" ->
      """One Expand pass (4 grouping sets) feeding a single partial/final
        |hash agg — the subtotal matrix never re-reads the fact table, and
        |the exchange carries (groups × 4) rows at most.""".stripMargin,
    "q76_quantized_topk" ->
      """Same skeleton as q18 (broadcast queries over one corpus scan) but
        |the per-pair work is an integer dot product over int8-valued
        |arrays — at 100 TB the quantized corpus is 4× smaller in executor
        |memory/network, and the window top-k compiles to
        |WindowGroupLimit so only k rows per partition survive.""".stripMargin,
    "q77_value_ntile" ->
      """One exchange on event_type + in-partition sort for the NTILE
        |window, then a reuse of the same partitioning for the tile
        |aggregation (no second exchange). A pathologically hot type would
        |serialize its partition — the documented trade; global exact
        |quantiles at scale are q66's by-value aggregation.""".stripMargin,
    "q78_source_deciles" ->
      """q66's by-value derivation with a partition key: the fact table
        |collapses to O(sources × distinct counts) rows in one hash agg,
        |and both windows (cumulative + per-group total) are PARTITIONED
        |by source — unlike q66's global window there is no single-
        |partition stage anywhere in the plan.""".stripMargin,
    "q79_salted_agg" ->
      """Two hash aggregations: partial sums on (site, salt) spread a hot
        |site over 16 reducers, the final agg on site merges 16 rows per
        |key. The exchange after phase 1 carries keyspace × salt rows —
        |the price of immunity to a single-key hot spot that would
        |otherwise serialize one reducer at 100 TB.""".stripMargin,
    "q80_forward_fill" ->
      """Same aggregate-bounded shape as q73 (counts → grid broadcast
        |join); the LOCF window then runs per event_type over keys × hours
        |rows — the fill never touches fact rows, so its cost is fixed by
        |the grid, not the corpus.""".stripMargin,
    "q81_top_sku_argmax" ->
      """Per-(site, sku) partial sums (one exchange), then max_by over a
        |(qty, sku) struct. The struct-typed max state is not hash-
        |aggregable, so Spark plans a partial/final SortAggregate pair —
        |still ONE pair of agg state per site crossing the shuffle, where
        |the oracle's row_number-window derivation materializes and sorts
        |every group's rows. The struct order key makes ties
        |deterministic.""".stripMargin,
    "q82_zorder_address" ->
      """Pure narrow projection — 16 shift/mask terms folded into one
        |codegen expression over the scan, no exchange at all. The same
        |expression drives Sinks.zorderParquet's range clustering, where
        |its value is file skipping on EITHER interleaved key.""".stripMargin,
    "q83_inverted_index" ->
      """Posexplode → one hash agg on (token, doc) — the posting shuffle
        |key — then a token-partitioned window for df. Output is
        |O(distinct (token, doc)) rows, the size of any real index;
        |nothing pairwise anywhere.""".stripMargin,
    "q84_phrase_match" ->
      """Each phrase token's occurrences re-key to the phrase start they
        |would imply (pos − i), so the n-token phrase is n−1 EQUI-joins on
        |(doc, start) — work bounded by the phrase tokens' posting sizes.
        |At 100 TB the narrow posting filters push into the token explode;
        |no corpus-wide structure is built.""".stripMargin,
    "q85_bm25_topk" ->
      """tf is one hash agg over matching postings; df and the corpus
        |totals broadcast back onto it. The ranking is orderBy+limit —
        |TakeOrderedAndProject, k rows per partition cross the wire — with
        |the rank window running over just the k survivors, never a global
        |single-partition window over every matching doc.""".stripMargin,
    "q86_star_revenue" ->
      """The dimension tree collapses into the fact scan: region's name
        |filter and orders' date window are PushedFilters at their own
        |scans, nation/region broadcast explicitly, customer/orders
        |broadcast here by size statistics (at cluster scale Spark's
        |stats flip them to shuffle joins on the same keys — nothing in
        |the operator assumes broadcast). One exchange total for the
        |final nation groupBy; money stays DECIMAL until the boundary.""".stripMargin,
    "q87_rolling_revenue" ->
      """Fact → (flag × day) partial-agg exchange, then the RANGE-frame
        |window over the daily aggregate partitioned by flag — the window
        |input is O(days), not O(rows), so the second (tiny) exchange is
        |flat at any corpus size. A ROWS frame would silently bridge
        |calendar gaps; RANGE over epoch_day is the correct trailing-7d
        |semantic.""".stripMargin,
    "q89_snapshot_diff" ->
      """Both snapshot derivations scan once each with their modulo
        |filters, then ONE full-outer SortMergeJoin on o_orderkey — the
        |minimum movement a diff admits. The classify/filter is narrow;
        |output is proportional to the change set, so the operator's cost
        |at 100 TB is the join, never the result.""".stripMargin,
    "q90_incremental_agg" ->
      """Each branch is a partial-agg exchange over a complementary
        |PushedFilters scan (shipdate < / >= the cut), and the merge
        |re-aggregates the union — the point is the STORED side is O(keys)
        |in production (read from the last run's sink), so the recurring
        |cost is only the delta scan + a keyspace-sized merge.""".stripMargin,
    "q93_mad_outliers" ->
      """Three passes over events (value counts → deviation counts →
        |final conditional agg), each a hash aggregate with the tiny
        |median/MAD relations broadcast back. The by-value windows run
        |over per-group DISTINCT VALUES, not rows — bounded by value
        |cardinality; the q66/q78 trade documented there applies.""".stripMargin,
    "q95_pagerank" ->
      """Per round: edge⋈rank equi-join on src, hash agg on dst, left
        |join back to nodes — three exchanges per round on explicit keys,
        |lineage cut by per-round localCheckpoint (task closures stay
        |O(1) over 5 rounds). The edge relation materializes ONCE; the
        |integer damping arithmetic keeps ranks bit-identical across
        |engines, partitionings and reruns.""".stripMargin,
    "q99_kmeans" ->
      """Final trained assignment: pinned quantized corpus ×
        |BroadcastNestedLoopJoin against the k·dim centroid table, the
        |fused graft_l2sq codegen distance, then partial
        |min(struct(dist, cid)) — map-side combine reduces the n·k
        |candidate stream to n rows before the single vec_id exchange.
        |k ≈ √n by the adaptive seed rule, so per-row candidate work
        |grows as √n while the shuffle stays O(n). The two training
        |iterations behind this plan each add one (cluster, dim)
        |partial-agg exchange; centroids cross the driver as k·dim longs
        |only.""".stripMargin,
    "q100_semantic_dedup" ->
      """The q99 training plan feeds a cluster-keyed self-join — the
        |quadratic cosine stage is confined to cells of ≈ √n, so pair
        |volume is n^1.5 total, shuffled on an explicit cluster key.
        |The removal set distinct + left join are keyspace-bound. Exactly
        |the LSH-bucket near-dup shape (q24), but in trained semantic
        |space.""".stripMargin,
    "q101_triangles" ->
      """Co-occurrence edges (group self-join bounded by basket width) →
        |degree join → ORIENTED wedge join: edges directed by (degree, id)
        |before the two-path equi-join, so a hot node's fan-in is bounded
        |by the oriented out-degree (O(√m)) and each triangle matches
        |exactly once — no wedge DISTINCT, no post-dedup. All exchanges on
        |explicit endpoint keys; the final per-node count is one hash
        |aggregate over the exploded triangle corners.""".stripMargin,
    "q102_bpe_merges" ->
      """The plan shown is the LAST round's pair count over the trained
        |dict. The one corpus-sized stage is the initial word-frequency
        |aggregate; every merge round after it runs on the
        |vocabulary-bounded dict (Heaps' law): pair explode + hash agg,
        |TakeOrdered(1) for the top pair, and the run-parity windows for
        |the greedy rebuild — all partition-local over the tiny relation,
        |lineage cut per round by localCheckpoint.""".stripMargin,
    "q103_pit_lookup" ->
      """Point-in-time lookup = SCD2 change derivation (one user shuffle,
        |shared Sort under both lag/lead windows) feeding the as-of
        |tag-union-scan: ONE key shuffle joins facts to the state history,
        |and the running last() inside each partition gives every purchase
        |the state valid AT its timestamp — no range blowup, no future
        |leakage by construction.""".stripMargin,
    "q104_bpe_tokens" ->
      """Encode side: the trained dict collapses to a (word → token count)
        |relation that BROADCASTS into the corpus word stream — one scan,
        |one broadcast hash join, one doc_id aggregate. The corpus is
        |never re-tokenized per merge round; all training cost lives in
        |the dict derivation (q102's shape).""".stripMargin,
    "q107_segment_dedup" ->
      """CCNet line-hash dedup: the chunked segment stream repartitions on
        |the segment text ONCE and both consumers — the distinct+count df
        |aggregate and the join-back — reuse that exchange (AQE
        |stage-share, the q56 pattern). Per-doc rebuild is one hash
        |aggregate sorting only each doc's own kept segments. Nothing
        |pairwise anywhere: boilerplate costs its row count.""".stripMargin,
    "q108_lm_quality" ->
      """Self-trained bigram LM: the model is two hash aggregates with
        |map-side partials — (w1,w2) counts, then the vocabulary-bounded
        |re-aggregate to context counts (never a second corpus pass).
        |Scoring re-joins the doc bigram stream on those same keys; at
        |these sizes AQE takes both probes as broadcasts, so the corpus
        |is scanned once and never reshuffled until the final doc_id
        |aggregate. V arrives as a broadcast scalar.""".stripMargin,
    "q109_entity_resolution" ->
      """Entity resolution runs entirely on DISTINCT names after the exact
        |collapse (vocabulary-bounded, not row-bounded). Token blocking is
        |an equi-join on the token with a document-frequency cap filter
        |upstream (the q17 hot-key guard); candidates dedup before the
        |levenshtein verify so a pair sharing k tokens verifies once. CC
        |label propagation runs on the tiny verified-edge relation; the
        |row stream only ever joins back by name.""".stripMargin,
    "q110_clean_lm_curation" ->
      """Composed cleaning flagship (q107 ∘ q108) in ONE lazy plan: the
        |segment-dedup subtree produces the cleaned text, which feeds both
        |the LM's training aggregates AND the scoring stream — Catalyst
        |sees the shared derivation; shuffles are only the composed
        |operators' own keys (segment text → bigram → w1 → doc id). The
        |LM trains on the cleaned corpus by construction, so boilerplate
        |cannot inflate its own transition probabilities.""".stripMargin,
    "q111_interval_overlap" ->
      """Interval×interval overlap as a chunk equi-join (the q42 shape with
        |BOTH sides exploded): candidate volume is per-chunk local density,
        |never the cross product. A pair sharing many chunks is emitted by
        |exactly one — the chunk holding max(lo_l, lo_r) — via a plain
        |codegen predicate, so dense overlap sets never pay a whole-output
        |DISTINCT (the q15 first-agreeing-band pattern in the value
        |domain). No BroadcastNestedLoopJoin anywhere in the plan.""".stripMargin,
    "q113_setsim_join" ->
      """Exact set-similarity join by prefix filtering: df aggregate →
        |per-doc rarest-first rank window (doc-key shuffle) → prefix
        |equi-join on the token → (id_b, tok) count-common equi-join →
        |integer cross-multiplied verify. Every join keys on a column;
        |no Cartesian/NestedLoop node exists. Candidate volume is
        |Σ prefix-df², which Zipfian corpora keep near-linear; on this
        |deliberately tiny shingle universe it degenerates toward
        |all-pairs (measured — SetSim scaladoc), which is why the
        |registered query samples 1/10 like the q17 verifier.""".stripMargin,
    "q114_event_transitions" ->
      """One user-key exchange feeds the lead() window (per-user sort only
        |— no global ordering anywhere); the (from, to) aggregate has
        |map-side partial combine and a |event types|²-bounded keyspace,
        |so the second exchange carries rows proportional to the type
        |vocabulary, not the event volume. The conditional-probability
        |window runs over that already-tiny relation.""".stripMargin,
    "q115_skyline_parts" ->
      """2D skyline without the quadratic NOT-EXISTS: one exchange on the
        |x-range bucket drives both per-bucket windows (strict-before
        |range frame + equal-x min); the cross-bucket carry is a prefix
        |min over the O(buckets) bucket-min relation — its global window
        |is value-domain-bounded, then broadcast back. At 100 TB the only
        |corpus-sized movement is the single bucket-key shuffle.""".stripMargin,
    "q119_negative_pairs" ->
      """Zero-shuffle negative sampling: the corpus count arrives as a
        |broadcast 1-row frame (BroadcastNestedLoopJoin against a
        |single row — constant work per partition), then explode(k) and
        |the self-collision filter run narrow inside codegen. At 100 TB
        |the pair stream pipelines into the downstream feature join
        |without materializing; determinism costs nothing because the
        |hash is a pure projection of the id.""".stripMargin,
    "q120_hard_negatives" ->
      """Contrastive composition in one lazy plan: the near-dup verdict
        |(bucket equi-join subtree) feeds a LEFT ANTI join keyed on
        |(query_id, neighbor_id) against the broadcast-query scored scan;
        |the rank tail is the same WindowGroupLimit as q18. The corpus is
        |scanned once for scoring and once for the bucket join — at scale
        |the near-dup set is a PRE-MATERIALIZED table (the dedup stage's
        |output), turning this into scan + anti-join + top-k only.""".stripMargin,
    "q121_bpe_packing" ->
      """Pack-by-real-tokenizer composition: the BPE dict derivation
        |(vocabulary-bounded aggregates) broadcasts into the corpus word
        |join exactly as q104, and the per-doc count aggregate feeds the
        |q46 bucketed running-sum windows — partitions bounded by
        |(bucket), no global ordering. Corpus-sized shuffles: the word
        |count and the (doc → bucket) exchange, both keyed.""".stripMargin,
    "q117_brand_trend" ->
      """Closed-form OLS per group: the daily-revenue aggregate shuffles on
        |(brand, day) with map-side combine, the normal-equation sums
        |shuffle once more on brand with O(1) state per group — at 100 TB
        |the regression costs exactly two keyed aggregates, no window, no
        |second pass over the facts. All cross terms are DECIMAL(38,0)
        |(exact to 10³⁸); the lone float division consumes identical
        |integers in both engines.""".stripMargin,
    "q116_bitmap_overlap" ->
      """Fact rows pack straight into per-brand bitmap words by one hash
        |aggregate (bit_or is idempotent → no pre-distinct pass, map-side
        |partial combine merges per-partition bitmaps — the mergeable-
        |sketch contract). The pairwise stage self-joins on the word index,
        |so only aligned 64-key blocks meet: cost is groups² · keyspace/64
        |WORDS, independent of fact-row count; popcount and AND are
        |codegen built-ins.""".stripMargin,
    "q122_rrf_fusion" ->
      """All heavy lifting stays inside the two arms' own scale paths
        |(posting-bounded BM25, corpus-scan-once cosine top-k); the fusion
        |itself unions two ≤ K-row frames, hash-aggregates ≤ 2K rows and
        |ranks ≤ K survivors — the single-partition rank window is over a
        |k-bounded frame, not data-bounded. Integer div contributions keep
        |the fused score associative across any aggregation order.""".stripMargin,
    "q123_assoc_rules" ->
      """One corpus exchange: facts repartition on the order key, the
        |(g, item) dedup rides it (subset rule — no exchange of its own)
        |and the per-basket self-join is CO-LOCATED on the same
        |partitioning. Pair fan-out is quadratic in basket width (≤ 7 for
        |TPC-H), never corpus size; support counts each UNDIRECTED pair
        |once (a<b — halves the aggregate keyspace, the dominant cost) and
        |emits both directions after the minPairs gate. Item frequencies
        |broadcast; n_groups is an in-plan one-row aggregate crossed in
        |broadcast, not a driver-side count job (the 10×-probe fix).""".stripMargin,
    "q124_retention" ->
      """ONE corpus exchange (repartition on user): the (user, day) dedup
        |needs no exchange of its own (subset rule), the cohort day is a
        |min window over the SAME user partitioning (in-partition sort,
        |no exchange — the first cut's groupBy+join re-shuffled the corpus
        |a second time, 18× at the 10× probe), and cohort sizes fall out
        |of the day==cohort_day rows. Everything downstream is
        |keyspace-sized (days² matrix at worst), sizes broadcast back.""".stripMargin,
    "q126_kmv_daily_users" ->
      """Raw events never shuffle: the native BottomKDistinct aggregate's partial buffers carry
        |at most k sorted distinct hashes per (partition × hour × type)
        |into the exchange — the same bounded-buffer shape as the q26
        |top-k aggregator. The daily rollup re-aggregates the O(groups·k)
        |hourly register table; the posexplode back to relational rows is
        |narrow. Two keyspace-bounded exchanges total.""".stripMargin,
    "q127_kmv_overlap" ->
      """The register build consumes the facts with the bounded aggregate
        |(≤ k hashes per partition cross the shuffle); every later stage —
        |pair enumeration, union tagging, merged bottom-k window, the
        |estimator projection — runs on O(groups · k) rows. The rank
        |window partitions on (group_a, group_b), so no single-partition
        |hazard; all estimators are integer expressions inside codegen.""".stripMargin,
    "q128_exact_n_sample" ->
      """Winner selection is the bounded bottom-n aggregate (hashes cross
        |the shuffle, never document rows); the join-back is LEFT SEMI on
        |(group, h) with the winner side groups·n rows — AQE broadcasts it
        |when small, and a million-group corpus still shuffle-joins. The
        |sample is a pure function of ids: re-running on any partitioning
        |or engine reproduces the identical row set.""".stripMargin,
    "q129_cdc_merge" ->
      """The 100 TB MERGE shape: the changelog — the small side — takes the
        |rank window (one changelog-keyed shuffle, WindowGroupLimit prunes
        |to one row image per key map-side); the BASE is never sorted and
        |never aggregated — untouched rows stream through a single
        |LEFT ANTI probe (broadcast when the day's keyset fits, keyed
        |shuffle otherwise) and upserts union in. Compaction cost is
        |O(base scan + changelog shuffle), the minimum possible.""".stripMargin,
    "q130_sampled_quantiles" ->
      """Quantiles without sorting the corpus: one bounded bottom-k
        |aggregate (≤ k hashes per partition cross the shuffle), sample
        |rows join back on (group, h), and the only sort is the rank
        |window over ≤ groups·k sample rows. The nearest-rank index is
        |integer arithmetic, so the estimate is engine-portable — and the
        |sample is coordinated (bottom-k of a fixed hash order), so
        |per-batch sketches merge by re-taking bottom-k of their union.""".stripMargin,
    "q131_incremental_assign" ->
      """The daily-append dedup shape: the corpus collapses ONCE to its
        |(band, key, min-id) bucket table — the persistable index artifact
        |— and the new batch bands, equi-joins that table on (band, key),
        |and min-aggregates back to one row per batch doc. Every exchange
        |after the index agg is batch-sized; the corpus is never
        |re-clustered and its text is read exactly once. Novelty falls out
        |of the LEFT join (null rep ⇒ self-assign).""".stripMargin,
    "q132_dwell_times" ->
      """One user-key exchange for the lead window (per-user state, no
        |global sort), then a hash aggregate whose keyspace is |event
        |types| — constant at any corpus size. All integer-µs arithmetic
        |inside one codegen span.""".stripMargin,
    "q133_attribution" ->
      """Attribution WITHOUT the interval join: touches and conversions
        |ride one frame through one user-key exchange; "most recent
        |in-horizon touch" is a running last(ignoreNulls) window (ROWS
        |UNBOUNDED PRECEDING ⇒ streaming state, not a rescan), then a
        ||touch types|-sized aggregate. The join formulation this
        |replaces shuffles both sides and buffers every in-horizon
        |pair.""".stripMargin,
    "q134_ann_recall" ->
      """Each arm keeps its own plan (q18's broadcast scan, q19's bucket
        |equi-join, q27's centroid probes); the comparison itself joins
        |top-k OUTPUT rows only — |queries|·k per arm, broadcast-sized at
        |any corpus. Recall is integer ppm: no float boundary in the
        |report. The exact arm's cost envelope is |queries|·|corpus| by
        |definition (ground truth needs the full scan): at 10× corpus
        |with the %-derived query panel it is the measured 23× bench
        |entry; a production eval pins a FIXED query panel, making the
        |arm one corpus scan — linear (SCALING.md).""".stripMargin,
    "q135_metric_corr" ->
      """One group-key exchange total: every Σ (x, y, x², y², xy — for
        |BOTH y columns) is a DECIMAL(38,0) partial aggregate with
        |map-side combine and O(1) state per group. The float boundary is
        |the final r = num/(√denx·√deny) on identical exact integers —
        |and the √ makes the quotient irrational, so the 6-decimal round
        |has no half-way hazard (the groupTrend lesson).""".stripMargin,
    "q136_sorted_neighborhood" ->
      """Exactly n−1 candidate pairs at ANY duplicate density — the
        |degenerate-corpus complement to band joins. One bucket-key
        |exchange for the per-bucket lead window (bucket = simhash top
        |bits, so bucket ranges ARE global-sort ranges); the only
        |single-partition window runs over the per-bucket min/max
        |aggregate — ≤ 2^bucketBits rows, bounded by construction.
        |In-bucket successors + consecutive-bucket boundary pairs
        |reconstruct global (simhash, id) adjacency exactly (oracle
        |proves it against a true global window).""".stripMargin,
    "q137_rate_anomaly" ->
      """The z-test window runs over the gap-filled GRID (keys × hours),
        |never fact rows — facts are touched by two scan-aggregates. The
        |flag is a cross-multiplied integer inequality: no sqrt, no
        |division, no rounding boundary; silent hours enter as zeros so a
        |dead stream alerts as dips. The streaming twin
        |(Streams.rateAnomalyState) folds the same test incrementally
        |with ≤ lookback longs of state per key.""".stripMargin,
    "q138_profile_drift" ->
      """Each snapshot is ONE multi-distinct aggregate pass (Expand —
        |the honest cost of exact distincts); the drift join touches
        |per-COLUMN profile rows, i.e. metadata-sized. Null rates and
        |drifts are integer ppm (BIGINT div), engine-portable.""".stripMargin,
    "q139_collocations" ->
      """Bigrams come straight off each document's token array (transform
        |over indices — no position self-join, no second explode); unigram
        |and bigram counts are partial-agg'd hash aggregates on
        |vocabulary-sized keyspaces; totals are a 1-row broadcast; the
        |lift is one DECIMAL(38,0) integral division (no log — libm is
        |not cross-engine reproducible) and the top-k cut is TakeOrdered
        |over the count-pruned bigram relation with a (lift, w1, w2)
        |total order.""".stripMargin,
    "q140_session_paths" ->
      """ONE corpus exchange: the session-boundary lag window partitions
        |on user, and the (user, session) rollup is clustered by that same
        |hash (Spark's subset rule — no second exchange; the plan shows a
        |single Exchange below both the Window and the first
        |HashAggregate). Path counting aggregates a ≤ types^maxLen
        |keyspace and the final cut is TakeOrderedAndProject — k rows to
        |the driver, never a global sort. collect_list order is pinned by
        |sort_array over (t_us, id, type) structs.""".stripMargin,
    "q141_kcore" ->
      """Iterative peel: per round one degree hash-aggregate (union of
        |two endpoint projections) and two LEFT-SEMI gates on the edge
        |list — all key-partitioned equi-joins, nothing quadratic.
        |localCheckpoint(eager) per round holds plan depth at O(1) (the
        |q55/q95 lineage discipline); 8 rounds reach the fixpoint at both
        |oracle scales, asserted by spec. The co-occurrence edge
        |derivation reuses one order-key exchange (co-located self-join
        |via the subset rule, as q123).""".stripMargin,
    "q142_ewma_hourly" ->
      """The EWMA is a FINITE weighted lag sum (truncated + renormalized),
        |so the plan is one window over the gap-filled grid — keys × hours
        |rows, partitioned by key — with depth lags of integer state per
        |row; facts are touched only by the grid's two scan-aggregates.
        |All weights are exact BIGINTs; the single float op is the final
        |division of two identical integers, 6-dp rounded.""".stripMargin,
    "q143_media_frames" ->
      """Pure narrow fan-out: one mapPartitions over the media rows emits
        |per-frame (offset, clock, FNV fingerprint) rows; payload bytes
        |are consumed inside the task and never shuffled. maxFrames bounds
        |per-row expansion. No exchange anywhere in the plan — the frame
        |table lands partition-aligned with its source.""".stripMargin,
    "q144_minmax_normalize" ->
      """Two passes, zero corpus shuffle: posexplode → |dims|-sized
        |min/max partial aggregate (the only exchange, keyspace = 64
        |rows) collapsed to ONE row of index-aligned arrays, broadcast
        |back; vectors rewrite in place via indexed transform. The
        |explode feeds only the stats pass — original rows are never
        |reassembled from exploded pieces.""".stripMargin,
    "q145_session_ngrams" ->
      """No session arrays: the gram at event e is a lead-chain concat
        |(e's type + the next n−1 types) valid iff event e+n−1 shares e's
        |session — every lead rides the ONE user-key sort sessionization
        |already pays, so the plan is a single Exchange + Window, then
        |two gram-keyed hash aggregates (occurrences = Σ per-session
        |counts, support = row count). The collect_list + explode
        |formulation spent its time materializing ~95k one-event session
        |arrays at sf0.1: 6.6 → 1.7 s. Keyspace ≤ types^n; final cut is
        |TakeOrderedAndProject.""".stripMargin,
    "q146_label_propagation" ->
      """Per round: edges⋈labels equi-join, (node, label) count
        |aggregate, per-node arg-max via max(struct(count, −label)) — a
        |plain hash aggregate, no window over fact rows. Undirected edges
        |checkpoint BEFORE the symmetric union (referenced twice — uncut,
        |the co-occurrence derivation would run two times per checkpoint
        |job; measured 11.3 → 3.4 s). Sync + min-label ties keep rounds
        |engine-deterministic.""".stripMargin,
    "q147_weighted_median" ->
      """The fact collapses FIRST to (group, value) weight sums — a
        |by-value partial-agg'd hash aggregate; the running/total weight
        |windows then order only that keyspace-bounded relation. The
        |median test is cross-multiplied integers (2·cum ≥ tot), no
        |halving division, no interpolation — the result is a value from
        |the data.""".stripMargin,
    "q148_random_project" ->
      """One narrow Project inside whole-stage codegen: 8 integer dot
        |products against the derandomized weight lattice per vector, no
        |exchange, no stats pass, no broadcast (spec asserts the
        |no-Exchange plan). The JL-style compression step ahead of exact
        |rescoring — 64 floats → 8 longs on the wire.""".stripMargin,
    "q176_dsir_scores" ->
      """Two walks of the exploded token stream, both narrow fan-outs. The
        |bucket-weight aggregate map-side-combines to ≤ 1024 rows per
        |partition before its exchange; the 1024-row weight table (plus the
        |1-row totals) broadcast back onto the second walk, so scoring's
        |only corpus-sized exchange is the per-doc partial aggregate — one
        |(doc_id, sum, count) row per document. At 100 TB the weight table
        |is still 1024 rows: corpus volume changes nothing structural.""".stripMargin,
    "q177_pattern_match" ->
      """Type IN-filter pushes to the scan (three pattern types), then ONE
        |user-key exchange; both suffix-min windows (first following end,
        |first following blocker) sort once on (t_us, id) and run on the
        |same partitioning. No event self-join anywhere — the
        |MATCH_RECOGNIZE negation comes from comparing two running mins,
        |and per-task state is O(1) per open user suffix.""".stripMargin,
    "q180_winnow_overlap" ->
      """Winnowing is ONE narrow projection (char split → positional
        |3-gram mix hashes → window minima, all codegen array transforms)
        |followed by an explode of only the selected fingerprints. The df
        |cap's doc count is a broadcast 1-row aggregate; the overlap join
        |is a fingerprint-keyed equi-join whose per-key fan-in the
        |corpus-relative cap bounds, then a pair-keyed count aggregate.
        |No all-pairs anything; candidate volume ≤ |fingerprints|·cap².""".stripMargin,
    "q178_kcenter_coreset" ->
      """Exact greedy k-center: k−1 zero-shuffle corpus passes — the ≤k
        |chosen vectors inline as a least(...) chain of fused-codegen
        |integer L2²s (driver-held, the Lloyd's-loop shape), and each
        |round's arg-max is max(struct(d, −id, v)) — a PARTIAL aggregate,
        |one candidate row per partition to the driver. The quantized
        |corpus pins once (localCheckpoint); the plan below is the final
        |round's pass. Printed plan is the k-row result frame (driver
        |loop); the per-round pass is the shape described above.""".stripMargin,
    "q188_variant_extract" ->
      """VARIANT schema-on-read is a pure narrow pipeline: payload build,
        |parse_json, and every variant_get run inside one WholeStageCodegen
        |span over the scan — the only exchange is the final 15-group
        |aggregate's. The binary VARIANT never reaches that shuffle (all
        |extracted fields are plain typed columns by then), and unlike a
        |JSON string column the payload is parsed ONCE for six path
        |extractions. At 100 TB there is no schema-inference pre-pass to
        |pay, and extraction cost scales with extracted fields, not
        |payload width.""".stripMargin,
    "q189_session_window" ->
      """Native session_window plans as ONE user-key Exchange feeding
        |Spark's session-merging aggregate (UpdatingSessionsExec under
        |hash aggregate) — no JVM closure, no Encoder round-trip, events
        |stay in Tungsten rows end to end. Per-session rows only (never
        |events) leave the aggregate. The IDENTICAL expression runs
        |streaming under a watermark with state evicted at session close
        |(StreamsSpec) — the batch plan IS the streaming plan.""".stripMargin,
    "q190_view_abandonment" ->
      """Batch evaluation of the outer stream-stream interval join: both
        |sides are type-filtered scans (predicate pushed), the join is a
        |user-key equi-join with the interval bound as a residual — no
        |BroadcastNestedLoop. On the stream the same expression emits
        |matches eagerly and abandoned views only once the watermark
        |proves no partner can arrive; state evicts at the watermark on
        |both sides (outer adds no retention over the inner join).""".stripMargin,
    "q191_lateral_topk" ->
      """Dataset.lateralJoin with outer() + LIMIT: Catalyst decorrelates
        |the correlated per-brand top-2 into a window/limit over a brand
        |equi-join — the plan below shows NO nested-loop per-brand
        |execution; the lateral spelling costs the same as q11's
        |window-rank spelling. At 100 TB the shuffle is on the brand key
        |only and WindowGroupLimit prunes before the join-back.""".stripMargin,
    "q192_scalar_subquery" ->
      """Correlated scalar MAX decorrelates to a per-customer aggregate
        |joined back on the key: one exchange on o_custkey each side, the
        |aggregate side collapses to one row per customer before the
        |join. MAX picks an element — no floating accumulation — so the
        |double equality is exact cross-engine.""".stripMargin,
    "q195_nested_export" ->
      """Relational → nested export: one exchange on the order key, then
        |collect_list of structs inside the aggregate, sort_array and
        |to_json as narrow post-projections. The JSON text never shuffles
        |(built after the aggregate); payload fields are integers because
        |JSON double rendering is the one non-portable piece.""".stripMargin,
    "q196_local_supplier_volume" ->
      """TPC-H Q5. The supplier side pre-joins nation ⋈ region with the
        |region predicate applied, so the broadcast that reaches the fact
        |stream is already pruned to one region's suppliers; the two-key
        |match (suppkey + customer-nation = supplier-nation) rides that
        |broadcast. Facts shuffle exactly twice — lineitem ⋈ orders on
        |orderkey, ⋈ customer on custkey — and the date window prunes
        |orders at its scan. At 100 TB nothing beyond those two natural
        |exchanges moves fact data.""".stripMargin,
    "q197_recursive_spine" ->
      """Spark 4 WITH RECURSIVE executes as a UnionLoop generating the
        |90-row date spine — driver-cheap, no fact data inside the
        |recursion. The fact side is one date-windowed aggregate (predicate
        |pushed to the orders scan) LEFT-joined to the spine; the spine
        |side broadcasts. Recursion depth is bounded by the anchor
        |predicate, not by data volume — the safe shape for SQL recursion
        |at scale (never recurse over the fact table).""".stripMargin,
    "q201_price_buckets" ->
      """Fit ∘ apply bucketizer: the edge FIT collapses facts by value
        |first (the rank window sees distinct values, one small single-
        |partition sort — the documented exact-quantile trade), and the
        |APPLY side is a broadcast one-row edge array consumed by a
        |codegen'd array filter — the fact side never shuffles for its
        |bucket id. The train/serve contract matters more than the plan:
        |edges derive once and persist; serve-time frames reuse them.""".stripMargin,
    "q205_rfm_segments" ->
      """RFM: one user-key aggregate pass over purchases, then THREE
        |aggregate-sized edge fits (quartiles of the per-user table, not
        |facts) broadcast back as array filters — scoring adds zero fact
        |exchanges beyond the per-user aggregate's own. The code
        |composition is the point: rfmSegments is fitBuckets/applyBuckets
        |reused three times, not a fourth quantile implementation.""".stripMargin,
    "q210_cohort_ltv" ->
      """Cohort LTV: purchases shuffle once on the user key (first-week
        |cohort), once on the (cohort, week) grid; the cumulative window
        |partitions by cohort over the GRID rows (weeks-since ≤ corpus
        |weeks), so window input is keyspace-sized at any fact volume.""".stripMargin,
    "q200_corpus_release" ->
      """The corpus-release flagship: curation (lang sample + quality gate)
        |→ MinHash cluster dedup → leakage-safe split → sequence packing →
        |eval-set decontamination gate → per-(split, bucket) release
        |summary, ONE lazy plan. Shuffles only on the operators' own keys
        |(band/bucket for LSH, cluster_rep for the split, (split, bucket)
        |for packing and the summary); the contaminated id set is
        |aggregate-sized and BROADCASTS into a left-anti join, so the
        |decontamination gate costs no fact exchange. This is the shape a
        |100 TB corpus build actually runs: every stage's output is
        |either per-doc (narrow) or aggregate-sized.""".stripMargin,
    "q226_media_decode" ->
      """Real-container decode: one narrow mapPartitions pass builds the
        |BMP/WAV payloads and parses their headers in-task; nothing but
        |scalar metadata leaves the partition, no exchange until the
        |harness probe. At corpus scale the payload bytes never cross the
        |wire — the property the multimodal family is designed around.""".stripMargin,
    "q227_file_profile" ->
      """Per-file row counts: grouping on input_file_name() is column-less
        |(ReadSchema is struct<>), so each task contributes batch counts
        |without materializing data columns; one exchange on the file-name
        |key, file-count-sized. The audit a compaction policy reads.""".stripMargin,
    "q228_small_order_revenue" ->
      """TPC-H Q17 shape: per-part stats, the fact self-join, and the part
        |dim join all key on l_partkey — one hash partitioning serves all
        |three (AQE converts the small sides to broadcast at bench scale;
        |at SF100 the equi-shuffle plan stands). The avg gate is an
        |integer cross-multiply, so no float average exists in the plan.""".stripMargin,
    "q229_k_anonymity" ->
      """k-anonymity audit: one shuffle on the QI columns builds the
        |equivalence classes; the banding aggregate runs over the CLASS
        |relation (keyspace-sized). The fact table is read once.""".stripMargin,
    "q231_padding_audit" ->
      """Padding-waste audit: the token count is a codegen'd
        |split/filter/size chain (no UDF), so the only exchange is the
        |bin-keyed aggregate — bins ≪ docs at any corpus size.""".stripMargin,
    "q232_psi_drift" ->
      """Snapshot PSI: each half contributes one bin-keyed partial-agg
        |scan; the full-outer join and the totals broadcast run on the BIN
        |keyspace. The two fact scans never join each other.""".stripMargin,
    "q233_hourly_psi" ->
      """Streaming-shaped drift monitor evaluated as a batch plan: ONE
        |windowed aggregate carries the per-bin conditional counts AND the
        |window total (no second stateful operator, no static join), then
        |stack + arithmetic are stateless projections. The reference mix
        |is a literal map — zero exchanges beyond the window aggregate's
        |own.""".stripMargin,
    "q234_cdc_chunks" ->
      """Content-defined chunking: the trigram-hash array comes from the
        |native one-pass graft_trigram_hashes codegen expression (3.7×
        |over the composed split/transform form it replaced); cut
        |selection, span assembly, and XOR chunk fingerprints are array
        |HOFs in the same narrow projection chain — the only Generate is
        |the final chunk-row explode, and NO exchange exists anywhere. At
        |100 TB this runs at scan speed; chunk-level dedup downstream
        |shuffles only fingerprint pairs.""".stripMargin,
    "q235_chunk_dedup" ->
      """Chunk-duplication mass: the q234 chunk relation is pinned once
        |(localCheckpoint) so the (fp, len)-keyed distinct-doc aggregate
        |and the join-back don't re-chunk the corpus; both shuffle on the
        |64-bit fingerprint (no skew magnet), then one doc-keyed rollup.
        |Payload text never shuffles — only (doc, fp, len) tuples.""".stripMargin,
    "q236_loghist_quantiles" ->
      """Log-linear quantile sketch: one narrow integer bucketing
        |projection, one partial-agg groupBy — the ONLY pass over the
        |facts; the rank walk (two windows + explode + min) runs on the
        |bucket rows, ≤ ~1k per group regardless of corpus size. State is
        |O(octaves·2^subBits) mergeable counts — the 100 TB shape for
        |p50/p90/p99 (vs q163's exact ranks, which sort the corpus).
        |Pure-integer base-2 bucketing (bin-length + shifts): bit-stable
        |cross-engine AND layout-invariant, no float log anywhere.""".stripMargin,
    "q241_pipe_syntax" ->
      """Spark 4 SQL pipe syntax pin: the |> chain lowers to the SAME
        |filter → partial/final hash-aggregate → having plan as the
        |classic nested spelling (the oracle IS that spelling) — one
        |scan-side quantity filter, one flag-keyed aggregate, no extra
        |operators from the parser path.""".stripMargin,
    "q240_incremental_refresh" ->
      """Incremental refresh: day-1 text is read once to build the fp
        |index + histogram state; the day-2 delta does ONE fp-keyed
        |equi-join against the index (shuffle on md5 keys — uniform, no
        |skew) and a bucket-row histogram union whose merge aggregate
        |touches ≤ ~2k rows. At 100 TB the state tables persist as
        |parquet and the daily cost is O(delta + index), never O(corpus);
        |the oracle's from-scratch recompute pins merge ≡ batch.""".stripMargin,
    "q239_srm_audit" ->
      """SRM audit: one distinct-user shuffle, a |families|-way narrow
        |explode over the deduped user rows, one family-keyed aggregate
        |(map-side combine, keyspace = the family list). Verdicts are
        |integer cross-multiplied chi-squares — constant-width output at
        |any corpus size, nothing collected.""".stripMargin,
    "q238_hourly_quantiles" ->
      """Hourly quantile readout over the SAME log-linear sketch as q236,
        |keyed by hour: the bucketing projection is shared with the
        |streaming twin (Streams.logHistHourly), so stream-emitted window
        |histograms and this batch plan are positionally identical and
        |merge by adding counts. One narrow projection + one partial-agg
        |groupBy over the facts; hour-partitioned rank walk over ≤ ~1k
        |bucket rows per hour.""".stripMargin,
    "q237_cuped_readout" ->
      """CUPED readout: one user-key shuffle for the per-user (X, Y)
        |cents rollup (map-side partial agg over the raw events), then a
        |1-row global-moments aggregate BROADCAST into the 2-row per-arm
        |frame — θ, adjusted means, and ρ² are driver-free rational
        |arithmetic on constant-width rows. Nothing after the first
        |aggregate scales with the corpus; exact decimal(38,0) moments
        |with floor-div staging mirrored by the oracle term-for-term.""".stripMargin,
    "q242_dedup_stream_twin" ->
      """Streaming exact-dedup batch twin: the doubled feed is a zero-copy
        |union (both branches share the scan), and dropDuplicates lowers
        |to ONE event_id-keyed hash aggregate with map-side partial
        |dedup — the redelivered copy dies in its mapper whenever both
        |copies co-reside. In stream mode the identical operator swaps the
        |aggregate for watermark-bounded state; nothing else changes.""".stripMargin,
    "q243_curate_stream_twin" ->
      """Streaming curation batch twin: quality gate and fingerprint are
        |zero-shuffle codegen (native text-stats + ws-collapse kernels);
        |the pre-dedup keep-set join and the operator's own fingerprint
        |dedup both key on md5 fingerprints — uniform keys, no skew
        |magnet. Two fp-keyed exchanges total at any corpus size; text
        |never shuffles after the gate (only doc_id, fp, scalars).""".stripMargin,
    "q244_png_probe" ->
      """PNG probe: encode → parse → featurize runs entirely inside one
        |narrow mapPartitions per task (payloads are built AND consumed
        |in-task — at 100 TB real payloads would stream from object
        |storage the same way); only scalar metadata leaves the
        |partition, so the plan has NO exchange until the harness probe.
        |Same shape as q226 — the codec seam adds formats without adding
        |operators.""".stripMargin,
    "q245_eval_containment" ->
      """Eval containment: the eval gram set (benchmarks — tiny by
        |definition) BROADCASTS as a map-side filter over the train gram
        |stream, so the train corpus is never gram-deduped corpus-wide
        |(the shuffle that shape would cost at 100 TB); only matching
        |(eval_id, gram) hits reach the one small distinct+count. Train
        |text flows through the native word-ngram projection at scan
        |speed.""".stripMargin,
    "q246_group_by_all" ->
      """GROUP BY ALL pin: the resolver expands ALL to (event_type, day)
        |and the plan is the identical partial/final hash aggregate as
        |the explicit spelling (the oracle IS that spelling) — one
        |exchange on the two keys, integer cents sums.""".stripMargin,
    "q247_param_sql" ->
      """Parameterized SQL pin: named markers bind as typed literals
        |BEFORE optimization, so the quantity predicate lands in
        |PushedFilters exactly as a spliced literal would — parameter
        |binding costs zero plan quality.""".stripMargin,
    "q248_listagg_baskets" ->
      """Ordered listagg: one order-key exchange; the sort runs INSIDE
        |the aggregate per group (no global sort of the fact table). The
        |(linenumber, partkey) key makes the concat total — remaining
        |ties are identical strings.""".stripMargin,
    "q249_water_fill" ->
      """Water-filling allocator: ONE map-side-combined domain aggregate
        |touches the corpus; everything after (sort, prefix test,
        |remainder spread) is windows over the |domains|-row keyspace —
        |a single-partition sort of ~hundreds of rows at any corpus
        |size. The exact-integer prefix test needs no iteration.""".stripMargin,
    "q250_pca_component" ->
      """Distributed PCA: ONE corpus pass builds the exact integer moment
        |matrix — the upper-triangle pair generator (slice before the
        |second posexplode, ~2× vs full dim², SCALING.md) feeds a
        |map-side-combined aggregate whose exchange carries dim(dim+1)/2
        |rows per map task regardless of corpus size; DECIMAL(38,0) sums
        |stay exact past 2^63. The driver power-iterates a 32 KB matrix
        |locally — unlike Lloyd's, NO iterative pass ever touches the
        |corpus.""".stripMargin,
    "q251_pca_project" ->
      """PC projection: the trained 64-long loading vector inlines as a
        |literal into a narrow zip_with/aggregate dot product — zero
        |exchanges until the top-k (TakeOrderedAndProject, never a full
        |sort). Training cost is q250's one pass.""".stripMargin,
    "q252_vocab_growth" ->
      """Vocab growth: prefixes are HASH thresholds, not row_number — no
        |corpus-wide sort at any scale, and they nest by construction so
        |ONE word-keyed aggregate (each word's min prefix) serves every
        |threshold; the readout is a constant-width conditional
        |aggregate. One pass, one word shuffle.""".stripMargin,
    "q253_pca_second" ->
      """Second PC: the deflation projector is BigInt arithmetic on the
        |driver-held 64×64 matrix (intermediates ~10²⁴ — the oracle
        |mirrors in HUGEINT) — the corpus is STILL touched exactly once;
        |the q250 moment pass feeds both components.""".stripMargin,
    "q256_pca_incremental" ->
      """Incremental PCA: each half contributes one triangle-sized moment
        |aggregate; the merge is a second aggregate over 2·dim(dim+1)/2
        |rows — O(dim²) regardless of data volume. At 100 TB the moment
        |frame persists as parquet state and an append retrains in
        |O(delta + dim²); the oracle's from-scratch recompute pins
        |merge ≡ batch.""".stripMargin,
    "q255_perceptron_eval" ->
      """Gate distillation: the feature frame (label + 4 longs/doc)
        |materializes once; each epoch is ONE map-side-combined aggregate
        |with the weights inlined as literals — no corpus shuffle in the
        |whole training loop, state = 4 driver longs. The mean step keeps
        |weights feature-bounded at any corpus size (the raw-sum rule
        |overflows margins at ~10⁹ rows); the pocket pick costs one extra
        |aggregate.""".stripMargin,
    "q257_compaction_plan" ->
      """Compaction plan: the window prefix sum runs on the FILE PROFILE —
        |one row per file (~10⁵ at 100 TB), never on facts; the per-table
        |partition keeps even that window parallel across tables. Binning
        |is order-preserving (prefix-sum div target), so a sorted or
        |z-ordered layout keeps its min/max envelopes through the merge —
        |first-fit-by-size would interleave key ranges and destroy
        |skipping.""".stripMargin,
    "q258_skipping_audit" ->
      """Skipping audit: the two global sorts are exactly the sorts the
        |candidate layout WRITES would run (range exchange + local sort,
        |rank via zipWithIndex — no single-partition window anywhere);
        |envelopes collapse to nFiles rows before any join, and the
        |probe-panel range joins run keyspace × nFiles. In production the
        |audit runs on a cluster-sample; here the full table IS the
        |sample.""".stripMargin,
    "q259_gate_calibration" ->
      """Calibration curve: training as q254/q255 (one aggregate per
        |epoch, weights as literals); the curve adds ONE map-combined
        |aggregate whose key is the native BinLength octave — band
        |keyspace ≈ 128 rows out, no fact shuffle, no float.""".stripMargin,
    "q276_topk_join" ->
      """Rank join: θ and both max aggregates are one-row frames broadcast
        |into the score-scan FILTERS, so the join and final top-k window
        |see only answer-magnitude rows — the full pair relation is never
        |scored. The candidate pool is two key-equality filters. The
        |single-partition window is over the pruned set by design; the
        |oracle's brute-force spelling certifies completeness.""".stripMargin,
    "q277_bloom_fpr" ->
      """Bloom certification: bit table and key sets are summary-sized;
        |the pass arm is the production filter's k broadcast semi-joins,
        |membership one more semi-join on DEDUPED keys. At 100 TB run the
        |audit on a key sample; the production filter stays audit-free.""".stripMargin,
    "q278_corpus_digest" ->
      """Version digest: narrow kernel scan (native rolling fp + mixHash),
        |one per-source sum with map-side combine — the digest of a shard
        |is the sum of its partitions' digests, which is the whole point:
        |append-only updates and cross-version compares never rescan the
        |base. DECIMAL(38,0) carries the sum; mod 2⁶¹ at the boundary.""".stripMargin,
    "q290_hourly_trend" ->
      """Trend: one fact-scan hour aggregate, a sequence() grid, ONE 5-sum
        |moment aggregate — closed-form OLS needs nothing else. Wide
        |products (intercept numerator, R² numerator) ride DECIMAL(38,0);
        |slope/intercept/R² are exact ppm integers.""".stripMargin,
    "q291_markov_attribution" ->
      """Markov attribution: one per-user window pass builds journey
        |transitions (prefix-truncated at first conversion); the value
        |iteration runs ALL variants (base + each removed channel) as one
        |(variant, state) relation — types²×channels keyspace rows per
        |round, checkpoint-freed each sweep. A channel that was start's
        |only outlet reads P = 0 via the variant left join, not a missing
        |row. At 100 TB the fact window dominates; the chain solve is
        |free.""".stripMargin,
    "q286_last_to_ship" ->
      """Q21 de-correlation: the oracle's EXISTS/NOT EXISTS pair becomes
        |one (order, supplier) collapse + per-order aggregate + join-back
        |— every stage shuffles on l_orderkey, so ONE exchange feeds all
        |three (Spark reuses the partitioning); nothing correlated, no
        |per-row subquery at 100 TB. Hash equality against the textbook
        |spelling certifies the rewrite.""".stripMargin,
    "q287_prospects" ->
      """Q22 shape: the positive-balance stats are a 1-row broadcast, the
        |above-average gate an exact integer cross-multiply, and the
        |recency cut prunes the orders scan BEFORE the left-anti join
        |(PushedFilters on o_orderdate). Anti-join on the dim keyspace —
        |no correlated execution anywhere.""".stripMargin,
    "q288_file_bloom_audit" ->
      """File blooms: one fact pass to (file, key); envelopes, bit tables
        |(file-keyspace × k positions, deduped), and probe panels are all
        |summary-sized; probe joins touch bit tables only. Measured at
        |sf0.01: envelopes open 13,620 file-probes, blooms 1,970 vs 1,923
        |exact — 6.9× fewer opens at 2.4% false-positive cost, the
        |evidence line for enabling parquet column blooms on this key.""".stripMargin,
    "q289_count_sketch_drift" ->
      """CountSketch drift: per-user half-counts (one fact aggregate) feed
        |two O(depth·width) signed sketches; the cell-wise difference IS
        |the delta-stream sketch (linearity — certified by hash equality
        |against the oracle's directly-built delta sketch). Median
        |estimates are depth-row windows over the probe panel. Yesterday's
        |sketch is the only state a production drift monitor keeps.""".stripMargin,
    "q283_hits" ->
      """HITS: edge relation partitioned once and reused by all
        |2·iterations half-steps; aggregates map-side combined, one-row
        |maxes. TWO-ARM score join (nodes.count() gate): below the
        |broadcast limit the score relation broadcasts; past it, two
        |checkpointed edge copies (src-/dst-partitioned) make each
        |half-step a co-located shuffle join — no per-round O(n)
        |broadcast on billion-node graphs (SCALING.md round-7 A/B:
        |SortMergeJoin planned, checksums arm-identical). Integer
        |max-normalization, documented maxdeg·scale² < 2⁶³ envelope.
        |Eager checkpoints freed per round — O(1) lineage.""".stripMargin,
    "q284_modularity" ->
      """Modularity: the edge tag join broadcasts the keyspace-sized label
        |relation; degrees come from one map-combined aggregate; the
        |report is community-keyspace arithmetic with a pinned truncation
        |order, the expectation term in DECIMAL(38,0) BY DEFAULT (round-7
        |fix — no m ≤ 1.5·10⁶ envelope, exact to m ~ 10¹⁵). Reuses the
        |already-checkpointed q146 label state — acceptance costs two
        |cheap joins, not a second propagation.""".stripMargin,
    "q285_hourly_acf" ->
      """ACF: one fact-scan hour aggregate, then hour-keyspace work only —
        |gapfill grid from sequence(), a keyspace × maxLag lag equi-join,
        |two map-combined sums. Exact integer mean-centering (dev = n·c −
        |S); the single long-outgrowing product (num·10⁶) rides
        |DECIMAL(38,0)/HUGEINT. No windows anywhere.""".stripMargin,
    "q282_curve_shootout" ->
      """Curve shootout: three distributed sorts (range-partition +
        |zipWithIndex rank — the cost each layout's WRITE pays anyway),
        |file-keyspace envelopes, probe-panel range joins. The hilbert
        |chain is `bits` chained integer CASEs — a narrow map evaluated
        |from the same Layout.hilbertSteps source in both engines.
        |Measured at sf0.01: point probes open 197 files under Hilbert vs
        |306 under Z-order on dim a (36% fewer), 227 vs 246 on dim b —
        |the locality argument, quantified on real keys.""".stripMargin,
    "q279_selectivity_audit" ->
      """ANALYZE certified: the only corpus-sized work is the distinct-
        |value collapse (map-side combined); the cumulative-rank window
        |runs over the value DOMAIN (FK keyspace, d ≪ n), and every value
        |contributes exact rank-interval overlaps to the buckets it
        |straddles — tie-invariant with NO per-row row_number. Estimator
        |and exact arm are both keyspace arithmetic over the same
        |collapsed histogram; a production ANALYZE samples first, which
        |only shrinks every stage.""".stripMargin,
    "q280_join_card_shootout" ->
      """Estimator shootout: per-key counts (one pass per side, map-side
        |partial) feed d_A/d_B, both Count-Min sketches, AND the exact
        |count-join — nothing ever touches the raw pair relation. The
        |sketch cells, their join, and the one-row arms are all
        |summary-sized broadcasts. At 100 TB only the certification arm
        |pays the exact count-join, at audit cadence.""".stripMargin,
    "q281_ivm_join" ->
      """IVM join view: the three delta terms join delta-sized inputs
        |against the base (AQE broadcasts the delta side); the base⋈base
        |term stands in for the stored view — in production it is READ,
        |not recomputed, so view maintenance costs Θ(|Δ|) joins against a
        |key-bucketed base instead of a full recompute. Bag-union of the
        |four terms is exactly the delta algebra; the oracle's from-scratch
        |full join certifies it by hash.""".stripMargin,
    "q273_hyperanf" ->
      """HyperANF: per-round state is nodes × 16 integer registers — the
        |whole point vs Θ(n²) exact balls. Each round is one dst-keyed
        |equi-join + a (node, bucket) max aggregate (mergeable, map-side
        |combined); localCheckpoint per round keeps lineage O(1) and the
        |superseded round's blocks are freed once the next materializes.
        |Histograms are eagerly checkpointed BEFORE the free (a lazy
        |histogram would reference blocks a checkpoint can't recompute).""".stripMargin,
    "q274_cusum_screen" ->
      """CUSUM: windows run over the keys × hours grid (never fact rows),
        |partitioned by key. The prefix identity S = C − min(0, run-min C)
        |replaces the inherently sequential textbook recurrence with two
        |stacked window functions — what makes the detector distributable.
        |Calibration is a keyspace-sized broadcast join.""".stripMargin,
    "q275_matryoshka_agreement" ->
      """Matryoshka acceptance: pure reuse — two brute-force arms (the
        |documented exact panel baseline, queries broadcast) + the AO
        |evaluation. The truncated arm's slice() is a narrow map; at
        |deployment scale the truncated index IS the cheaper artifact,
        |and this table is the evidence for shipping it.""".stripMargin,
    "q270_lsh_curve" ->
      """S-curve probe: ONE signature pass (its shuffle reused across the
        |universe self-join's sides via AQE stage reuse); stricter configs
        |are per-pair column-equality flags on the joined signatures —
        |bands nest, so no extra self-joins. The Jaccard join is bounded
        |by candidates × per-doc shingles, and the whole probe runs on a
        |300-permille coordinated doc sample (the 100 TB posture: tuning
        |curves read samples, production banding reads the corpus).""".stripMargin,
    "q271_cm_join_size" ->
      """Join-size estimator: both sides collapse to per-key counts
        |(map-side partial) before anything else; the sketches are
        |O(depth·width) rows, their cell join and the exact count-join
        |are summary-sized. At 100 TB the sketches are the per-partition
        |mergeable artifact; only the certification arm pays the exact
        |count-join, and only at audit scale.""".stripMargin,
    "q272_coord_join_sample" ->
      """Coordinated sampling: the key-hash predicate filters BOTH scans
        |before the join (pushed to the column read), so every downstream
        |stage is permille-sized; the exact arm is the certification cost.
        |Right join from the exact arm keeps zero-mass groups visible —
        |an estimator that silently drops a group is a trap at scale.""".stripMargin,
    "q268_cross_source_dups" ->
      """Cross-source matrix: chunking stays the zero-shuffle q234 path;
        |the only exchanges are the DISTINCT (fp, source) collapse and
        |the fp-keyed pair join whose per-key width is bounded by the
        |source count. Output is the source-pair keyspace.""".stripMargin,
    "q269_sketch_error_audit" ->
      """Sketch certification: the estimate side is the O(octaves·16)
        |mergeable sketch; the exact side deliberately pays one per-group
        |fact sort (what the sketch avoids) to certify the bound — run on
        |a sample/shard at 100 TB. Both sides share the rank rule, so the
        |join is (group × quantile)-keyspace.""".stripMargin,
    "q266_quantization_agreement" ->
      """Quantization acceptance: pure reuse — the q261 AO evaluation
        |over the q18/q76 arms on the 1%-panel. All new cost is one
        |(query, doc) equi-join on panel×k lists.""".stripMargin,
    "q267_token_spectrum" ->
      """Token spectrum: one map-combined vocab aggregate (the q43
        |exchange), then count-of-counts on the ≤64-octave keyspace; the
        |cumulative window is a single partition of ≤64 rows by
        |construction — not a corpus sort.""".stripMargin,
    "q264_embedding_drift" ->
      """Embedding drift: one posexplode + dim-keyed partial aggregate
        |per snapshot (the q250 moment pass without the triangle); the
        |join, cross-multiply, and top-k all run on the 64-row dim
        |keyspace. DECIMAL(38,0) sums stay exact at any corpus
        |size.""".stripMargin,
    "q265_probe_recall_curve" ->
      """Probe curve: assignment, probe ranking, and candidate scoring
        |run ONCE at max(probes) and checkpoint; each arm is a filter +
        |top-k window over the scored candidates — a 4-point sweep costs
        |one q27 plus three keyspace windows, not four q27s. The exact
        |arm is the documented recall baseline on the 1%-panel.""".stripMargin,
    "q263_filter_attribution" ->
      """Kill matrix: three narrow kernel gates share one scan path; the
        |dup gate is the q12 fingerprint aggregate joined back on fp.
        |The stack quadruples rows but carries 3 columns, and the final
        |aggregate is 4 rows — attribution costs one extra join over
        |running the gates themselves.""".stripMargin,
    "q261_rank_agreement" ->
      """Rank agreement: both arms are bucketed ANN lists (panel × k rows
        |each) — the AO join, suffix-sum lookup, and panel rollup all run
        |on those tiny frames; the corpus is touched only inside the arms'
        |own bucketed plans. The suffix weights are an array literal, so
        |the whole readout is one equi-join + one aggregate.""".stripMargin,
    "q262_t_closeness" ->
      """t-closeness: one fact aggregate to (QI, value) cells; the
        |zero-cell grid is classes × m with both dimension sides
        |broadcast, and the cumulative windows partition BY CLASS — no
        |global window, no second fact scan. Exact DECIMAL(38,0)
        |cross-multiply, BIGINT-safe at any row count.""".stripMargin,
    "q260_shard_balance" ->
      """Shard balance: one fact-sized (shard, cat) aggregate; shard
        |totals, category totals, and the grand total are keyspace
        |re-aggregates of that grid, and the deviation grid is
        |nShards × |cats| rows with broadcast dimension sides. The
        |cross-multiply runs in DECIMAL(38,0), exact at any corpus
        |size.""".stripMargin,
    "q292_optimize_manifest" ->
      """OPTIMIZE: the audit table collects as a ≤ layouts×dims decision
        |(never data); the rewrite costs ONE distributed global sort (the
        |same rank device the audit priced) plus a hash-cluster on the
        |bin id so each of the nFiles part_bin dirs gets exactly one
        |file. The manifest is the binned groupBy of the already-ranked
        |frame — written envelopes equal predicted envelopes by
        |construction (OptimizeSpec pins it; the oracle recomputes
        |audit → winner → bins independently).""".stripMargin,
    "q293_cs_cells_hourly" ->
      """Hourly CountSketch: narrow cell projection (shared csCellArray
        |codegen family) → one (window, row, bucket) map-combined sum —
        |state O(depth·width) per open window in streaming, one exchange
        |in batch. Linearity makes consecutive windows subtract into the
        |q289 drift readout with no further fact work.""".stripMargin,
    "q294_embedding_moments" ->
      """Embedding moments: posexplode + (window, dim) DECIMAL sum —
        |O(dims) state per window; the emitted BIGINT moments are
        |additive, so streamed windows merge with batch snapshots by
        |dim-keyed summation and the q264 readout runs on any pair.""".stripMargin,
    "q295_ndcg" ->
      """nDCG: ranking is panel×k rows, qrels the bounded eval set; one
        |equi-join, one per-query window over qrels, two panel aggregates.
        |Discounts are pinned integer literals (no log in-engine);
        |DCG·10⁶ rides DECIMAL(38,0).""".stripMargin,
    "q296_bootstrap_ci" ->
      """Bootstrap: ONE corpus scan — the weight projection and the
        |2m+2-column sum aggregate both map-side combine, so each
        |partition ships one row of sums; the percentile step sorts m
        |summary rows on one partition (m ≤ 500 by contract). The
        |resample loop this replaces is m full scans.""".stripMargin,
    "q297_salt_plan" ->
      """Salt plan: one map-combined key aggregate, filtered to keys past
        |the rows-per-task target — output heavy-hitter-sized, hence
        |broadcastable at any corpus. Pure integer ceil division.""".stripMargin,
    "q298_planned_salted_join" ->
      """Planned salted join: the hot-key plan broadcasts into both
        |sides; facts salt per-row in [0, salt(key)), dims replicate
        |exactly salt(key)× (Σ hot excess, not salt×|dim|). The main
        |join shuffles on (key, salt) — each hot key split across salt_k
        |reducers; result multiset equals the plain join (the oracle IS
        |the unsalted join).""".stripMargin,
    "q299_personalized_pagerank" ->
      """PPR: identical per-round shape to q95 including the two-arm
        |broadcast/shuffle gate; the seed flag rides the checkpointed
        |node relation (one setup join, nothing per round). Teleport mass
        |gated on the seed indicator keeps all arithmetic integer.""".stripMargin,
    "q300_trend_by_key" ->
      """Keyed OLS: one (key, hour) map-combined aggregate over facts;
        |the gapfilled grid is keys×hours rows and the moment pass one
        |hash aggregate over it. Wide products in DECIMAL(38,0); r² takes
        |a greatest(·,1) floor for constant series (numerator provably 0
        |there).""".stripMargin,
    "q301_exact_quantiles" ->
      """Histogram descent: exact order statistics in ⌈log_B(range)⌉
        |map-combined passes (3 at B=1024 for cent-priced data), never a
        |global shuffle-sort. All ranks share each pass; the coarse
        |[lo, hi) literal bound pushes to the parquet scan so later
        |rounds prune row groups. Driver collects ≤ probes×B histogram
        |rows per round — bounded, never data-sized.""".stripMargin,
    "q310_group_exact_quantiles" ->
      """Grouped descent: per-(group, rank) ranges ride a broadcast
        |side; one fact pass per round answers EVERY group and rank, so
        |group skew costs nothing (a per-group sort window shuffle-sorts
        |the whole fact table for the same answer). Same pushed coarse
        |bound + bounded driver collects as q301.""".stripMargin,
    "q302_conformal_band" ->
      """Split-conformal band: one fact aggregate → keyspace grid; exact
        |integer residuals vs the reported ppm line in DECIMAL(38,0);
        |the rank window sorts grid HOURS, never facts. q̂ at ceil-rank
        |(1−α)(n+1) gives the finite-sample coverage guarantee; coverage
        |reads back in the same pass.""".stripMargin,
    "q303_theilsen" ->
      """Theil–Sen: pairs are grid², not facts² — facts are touched once
        |by the hourly aggregate, then H(H−1)/2 keyspace rows carry the
        |slope population. Low-median at rank (P+1) div 2 over exact
        |floored ppm slopes; both medians via rank windows on keyspace
        |relations.""".stripMargin,
    "q304_decayed_engagement" ->
      """Dyadic decay: weights are exact powers of two carried as
        |shifted integers (weight·2⁴⁰), summed in DECIMAL(38,0) — the
        |order-dependent float-EWMA fold is impossible by construction.
        |One map-combined (key, hour) aggregate + a broadcast 1-row max;
        |readout ppm by integral division.""".stripMargin,
    "q308_seasonal_trend" ->
      """Two-regressor OLS by Cramer: one fact aggregate, one keyspace
        |grid with the absolute-hour weekend dummy, one 8-moment
        |aggregate, scalar determinant arithmetic in DECIMAL(38,0);
        |det = 0 (degenerate day-type mix) yields NULLs, not a wrong
        |line.""".stripMargin,
    "q305_assortativity" ->
      """Assortativity: the symmetrized endpoint list makes both degree
        |marginals identical, so Pearson r is ONE exact rational — no
        |sqrt, no float. One degree aggregate, two keyspace endpoint
        |joins, one 4-moment aggregate; zero-variance graphs degrade to
        |NULL.""".stripMargin,
    "q306_local_clustering" ->
      """Per-node clustering: q101's degree-oriented wedge enumeration
        |(O(√m) fan-in, no wedge DISTINCT) + one degree aggregate + a
        |keyspace left join; ppm normalization by (deg choose 2) in
        |DECIMAL(38,0).""".stripMargin,
    "q307_chi2_drift" ->
      """χ² drift: q162's two token scans + vocabulary full-outer join;
        |the χ² kernel runs on ppm-ROUNDED proportions so every term is
        |a bounded BIGINT at any corpus size (delta²·10⁶ < 2⁶³) — no
        |HUGEINT envelope to outgrow.""".stripMargin,
    "q309_decayed_snapshots" ->
      """Decayed monitor twin: the stream emits (hour, key, c) — counts
        |are the SUFFICIENT STATISTIC of dyadic decay (weights a pure
        |function of snapshot − hour), so the stream holds O(keys) state
        |per open window and zero decay state. Readout joins counts to
        |the broadcast snapshot grid: keyspace² rows, never facts.""".stripMargin,
    "q311_weighted_quantiles" ->
      """Weighted descent: q310's passes with histogram masses summing
        |the weight column — the volume-weighted median costs exactly
        |the unweighted one. Positive-integer weights enforced via the
        |bounds aggregate (min(w) ≥ 1 checked once, driver-side).""".stripMargin,
    "q312_spearman" ->
      """Spearman: facts reduce to the part grain first (one aggregate);
        |two rank windows + a 2-moment aggregate run on the ENTITY
        |keyspace. Ties broken by key (rank-of-record) — deterministic,
        |layout-invariant; ρ is one integer rational in DECIMAL(38,0).""".stripMargin,
    "q313_rank_auc" ->
      """Rank-sum AUC: by-value collapse (map-combined) then ONE running
        |window over DISTINCT values; pair counts via Σ ca·cum_b — the
        |nₐ·n_b pair set is never materialized. Empty group → NULL.""".stripMargin,
    "q314_tukey_outliers" ->
      """Tukey fences: the q310 descent pins EXACT quartiles in bounded
        |passes (no per-group sort), fences broadcast, one counting pass
        |over facts — alert counts reproducible to the row.""".stripMargin,
    "q315_ks_statistic" ->
      """Exact KS: by-value collapse, one running window over DISTINCT
        |values, integer cross-products |cumA·n_b − cumB·n_a| — no
        |division until the final ppm; argmax value via a broadcast max
        |+ min(v) tie-break.""".stripMargin,
    "q316_chi2_independence" ->
      """χ² independence: one (a, b) count aggregate over facts; the
        |full margin-cross grid (zero cells included) is category-
        |keyspace-sized; milli-unit floor keeps every product inside
        |DECIMAL(38,0) at any corpus size.""".stripMargin,
    "q317_gate_auc" ->
      """Gate AUC: perceptron training (one aggregate per epoch), then
        |q313's by-value collapse + distinct-MARGIN window — the scored
        |corpus never materializes pairs. Threshold-free model quality
        |next to q255's confusion and q259's calibration curve.""".stripMargin,
    "q318_interarrival_quantiles" ->
      """Inter-arrival: one keyed window (the sessionization exchange,
        |(user, type)-partitioned with event_id tie-break) derives gaps;
        |the descent answers p50/p99 per type in bounded passes — no
        |per-type sort of the gap relation.""".stripMargin,
    "q319_pr_curve" ->
      """P/R@k curve: ranking ⋈ qrels is panel-sized; the cutoff grid
        |multiplies panel×kMax keyspace rows. Micro precision pooled,
        |macro recall per-query floored ppm — zero-qrel queries still
        |weigh in via the right panel.""".stripMargin,
    "q320_kaplan_meier" ->
      """Kaplan–Meier: facts → one per-customer window (first/second
        |order) → one by-duration aggregate; the sequential product-limit
        |recursion runs driver-side on the DURATION KEYSPACE (kmeans
        |precedent), oracle = recursive CTE with identical floors.""".stripMargin,
    "q321_diff_in_differences" ->
      """DiD: ONE map-combined aggregate (eight conditional sums) after
        |a broadcast 1-row midpoint join; arms by the q171 user hash —
        |no user-keyed shuffle, no join; all cells exact floored ppm.""".stripMargin,
    "q322_conformal_by_key" ->
      """Per-key conformal: q300's keyed moments on the common grid,
        |residual rank windows PARTITIONED BY KEY (keyspace-sized
        |sorts), per-key q̂ + coverage in one grouped aggregate.""".stripMargin,
    "q323_quantile_effects" ->
      """QTE: ONE shared descent answers both arms' nine deciles
        |(ranges ride the broadcast side); the diff runs on the 18-row
        |quantile table. Facts pay ⌈log_B⌉ passes total, not per arm or
        |per decile.""".stripMargin,
    "q324_loghist_ks" ->
      """Certified KS: the readout is two windows + one aggregate over
        |KB-sized histogram sketches — the corpus is never re-read.
        |Boundary KS is EXACT (bucketing loses nothing at boundaries);
        |the upper bound adds the attainable one-sided bucket masses.
        |True KS provably inside [lo, hi] — certified, not asserted.""".stripMargin,
    "q325_yield_curve" ->
      """Yield curve: one text pass → (score_milli, tokens), by-score
        |collapse to ≤1001 rows, threshold grid joins the COLLAPSED
        |relation — facts are never multiplied by the grid.""".stripMargin,
    "q326_ks_drift_series" ->
      """Certified drift series: the streaming histogram's KB-sized
        |cells are the ONLY input — corpus touched once by the emitter.
        |Pairing joins + q324's arithmetic, every window partitioned by
        |hour; all work (hours × buckets) sketch metadata.""".stripMargin,
    "q327_cusum_stream" ->
      """Stream-fed CUSUM: facts touched ONCE by the hourly-count
        |emitter's window aggregate; gap-fill and both stacked windows
        |run over the keyspace-sized (key × hours) grid. Identical rows
        |to q274 — the emitter's closed windows are a sufficient
        |statistic, which is the whole point of the twin.""".stripMargin,
    "q330_f2_moment" ->
      """F2 readout: the exact arm is one map-combined per-user count +
        |one 1-row moment agg; the sketch arm groups depth×width cells.
        |At 100 TB only the exact arm scans facts — the estimate itself
        |reads KB of stored sketch, which is the operational mode.""".stripMargin,
    "q331_rrf_fusion" ->
      """RRF fusion: both arms are panel×k rankings (windows over
        |broadcast-scored pairs); the fusion adds one full-outer
        |(query, doc) equi-join and a per-query window over ≤2k rows —
        |nothing fact-sized enters the combiner.""".stripMargin,
    "q332_pettitt" ->
      """Pettitt: one fact aggregate → hour grid; the s-value collapse
        |groups DISTINCT counts and both running sums window the
        |keyspace-sized grid (single-partition windows over ≤ grid rows,
        |the q302 posture). No grid² pair materialization — the
        |antisymmetry identity does the O(n²) sum in O(n).""".stripMargin,
    "q333_kcore" ->
      """k-core peel: each round is one partial-agg degree count + two
        |semi-joins against the checkpointed (and monotonically
        |shrinking) edge list — O(m) per round, keyspace-sized survivor
        |relation, lineage cut per round. Fixed round count keeps the
        |plan replayable in any engine; idempotence past the fixpoint is
        |spec-pinned.""".stripMargin,
    "q338_rolling_wau_stream" ->
      """Stream-fed WAU: the daily-window distinct-user aggregate (the
        |userDaysDaily emitter run batch) replaces q183's dropDuplicates
        |— same one corpus exchange — then the shared readout fans each
        |(u, day) row out ×windowDays and count-distincts per day.
        |Identical rows to q183; the emitter's closed windows are the
        |sufficient statistic.""".stripMargin,
    "q339_daily_churn_stream" ->
      """Stream-fed churn: same emitter, then the shared lead-window
        |readout over each user's active-day sequence (user-key exchange
        |over the deduped activity relation, never the fact table).
        |Identical rows to q204.""".stripMargin,
    "q340_onenn_kappa" ->
      """Cohen's kappa between the exact and quantized 1-NN label arms:
        |both arms are the q18/q76 panel rankings (queries broadcast,
        |corpus scanned once each); the label joins and the confusion/
        |marginal aggregates all run on panel- or labels²-sized
        |relations. κ = (A·n − P)/(n² − P) is ONE integer rational in
        |DECIMAL(38,0) — nothing pairwise, nothing float.""".stripMargin,
    "q341_onenn_mcnemar" ->
      """McNemar over the same paired panel vs true labels: one
        |map-combined conditional count over the panel relation, 1-row
        |output — the discordant-pair statistic is (b−c)²·10⁶ div (b+c),
        |exact integers end to end.""".stripMargin,
    "q342_mann_kendall" ->
      """Mann–Kendall: one fact aggregate → hour grid (checkpointed, the
        |q303 posture); the pair census joins GRID² (t2 > t1) into a
        |1-row sign sum, the tie census is a by-value aggregate of the
        |grid. Facts are touched exactly once; for multi-year grids thin
        |to daily first, as with Theil–Sen.""".stripMargin,
    "q343_mann_kendall_stream" ->
      """Stream-fed Mann–Kendall: the emitter's closed hourly windows
        |collapse to the global series, then the identical pair census.
        |Identical rows to q342 — the stored counts are the sufficient
        |statistic.""".stripMargin,
    "q344_kruskal_wallis" ->
      """Kruskal–Wallis: facts reduce to the distinct-(group, value)
        |keyspace in one map-combined aggregate; the doubled-midrank
        |window sorts DISTINCT values only; everything after is
        |groups-sized. Per-group ⌊R2²·10⁶/4n_g⌋ floors are the documented
        |exactness contract the oracle mirrors.""".stripMargin,
    "q345_avg_precision" ->
      """Average precision: the q319 ranking (corpus scanned once,
        |queries broadcast) with a per-query running-hit window over ≤ k
        |rows; qrels join once on (query, doc). All post-ranking work is
        |panel-sized.""".stripMargin,
    "q346_onenn_tau" ->
      """Kendall τ-b rank agreement: the exact arm is the q18 panel
        |ranking; quantized dots are recomputed ONLY on the panel×20
        |candidate rows (equi-joins AQE broadcasts). The concordance
        |census expands per-query 20·19/2 pairs map-side and aggregates
        |to one row per query — nothing corpus²-sized exists.""".stripMargin,
    "q347_link_prediction" ->
      """Link prediction: wedge pairs enumerate per CENTER over the
        |checkpointed edge list with hub centers (deg > cap) excluded by
        |contract — the census is bounded at cap·2m rows where the
        |uncapped expansion is quadratic in hub degree. Candidate pairs
        |anti-join the edge list, degrees join keyspace-sized, and the
        |k-boundary is a TakeOrdered under a total order — no global
        |sort, nothing hub²-sized.""".stripMargin,
    "q348_onenn_fleiss" ->
      """Fleiss' kappa: the q340 panel relation melts ×3 (explode — a
        |narrow map), one (subject, category) aggregate, then category-
        |and 1-row aggregates; κ is ONE integer rational in
        |DECIMAL(38,0). All post-panel work is panel-sized.""".stripMargin,
    "q349_radius_join" ->
      """Radius join: points hash to their own r×r cell (build side); the
        |probe side explodes ×9 to its neighborhood, so matching is ONE
        |equi-join on (cx, cy) — a proper shuffle key — plus the exact
        |integer dist² filter on neighborhood candidates only. Candidate
        |volume is Σ cell-occupancy × 9-neighborhood occupancy: local
        |density, never the n² cross product a theta-join would plan.""".stripMargin,
    "q350_cross_correlation" ->
      """CCF: facts collapse to ONE two-column hourly aggregate; the
        |shared grid, both deviation moments, the ×(2L+1) lag fan-out and
        |the per-lag products are all keyspace-sized. The two-step
        |floored division is the documented exactness contract (squaring
        |the numerator first would overflow DECIMAL(38,0) at one year of
        |10⁹-event hours).""".stripMargin,
    "q351_cross_correlation_stream" ->
      """Stream-fed CCF: the emitter's closed hourly windows filter to
        |the two keys and run the identical grid + lag census. Identical
        |rows to q350.""".stripMargin,
    "q352_churn_hazard" ->
      """Churn hazard: one (user → first/last day) aggregate — the only
        |fact-sized work — then censor split and the reverse running
        |at-risk sum on the duration keyspace (days, not users). No
        |user×day expansion anywhere.""".stripMargin,
    "q353_concentration" ->
      """Concentration: facts collapse to the supplier keyspace in one
        |map-combined aggregate; the Lorenz rank window orders groups
        |only; Gini and HHI come from ONE moment aggregate in
        |DECIMAL(38,0).""".stripMargin,
    "q354_benford" ->
      """Benford: one map-combined 9-bucket aggregate over the scan; the
        |digit grid (with the law's exact ppm constants) is constant-
        |sized and broadcast. Scan-bound at any scale.""".stripMargin,
    "q355_churn_hazard_stream" ->
      """Stream-fed churn hazard: the daily active-user emitter's closed
        |(day, user) windows carry exactly the per-user first/last days
        |the life table needs — shared readout core, identical rows to
        |q352.""".stripMargin,
    "q356_runs_test" ->
      """Runs test: one fact aggregate → hour grid; the median collapse
        |is by-value, the run census is one lag window over the grid, the
        |z² is scalar arithmetic. Grid-bounded — the n⁵ envelope term
        |never sees a fact-scale n.""".stripMargin,
    "q357_runs_test_stream" ->
      """Stream-fed runs test: the emitter's closed hourly windows
        |collapse to the global series, identical dichotomize + census.
        |Identical rows to q356.""".stripMargin,
    "q358_weekend_effect" ->
      """2×2 effect report: ONE map-combined 4-way conditional count over
        |the fact scan, scalar rationals, 1-row output — the q341
        |posture for the epidemiological readouts.""".stripMargin,
    "q359_cramers_v" ->
      """Cramér's V²: the q316 contingency plan verbatim (one aggregate,
        |categories² grid) plus one scalar rational — effect size costs
        |nothing over the test statistic.""".stripMargin,
    "q360_burstiness" ->
      """Burstiness: one per-key lag window over the fact scan (the q318
        |interarrival posture — key-partitioned, never global) feeding a
        |map-combined 3-moment aggregate; output is keys-sized. The
        |millisecond gap contract is what keeps n·Σd² − S² inside
        |DECIMAL(38,0) at 10⁹ gaps per key.""".stripMargin,
    "q361_peak_to_mean" ->
      """Peak-to-mean: the q73 gap-filled grid (two tiny broadcast
        |aggregates + one left join) collapsed per key — zero-hours in
        |the mean are the point. Scan-bound.""".stripMargin,
    "q362_substr_dup_spans" ->
      """Exact substring dedup: ⌈log₂ L⌉ representative-doubling rounds,
        |each two equi-shuffles + one map-combined min() on 4-BIGINT
        |position state, localCheckpoint per round (the q55 CC lineage
        |discipline) — never a global suffix sort, never all-pairs, no
        |hash collisions to adjudicate. Islands window is partitioned BY
        |DOCUMENT. Skewed frequent-token classes split combinatorially
        |from depth 2 (pair keys).""".stripMargin,
    "q363_substr_doc_stats" ->
      """Same class relation as q362; the dup-position stream is
        |checkpoint-pinned and consumed twice (spans + distinct-coverage
        |explode) — one derivation, two keyspace-bounded aggregates,
        |left-joined onto the full doc scan.""".stripMargin,
    "q364_substr_top_repeats" ->
      """Class-support aggregate over the q362 relation; window TEXT is
        |materialized only for the ≥2-support survivors by slicing the
        |representative document (text never rides the doubling rounds);
        |TakeOrdered(50) — no global sort materializes.""".stripMargin,
    "q365_png_pixels" ->
      """Real PNG decode: one narrow mapPartitions — synth, two-chunk
        |IDAT concat, JDK Inflater, 5-filter scanline reconstruction —
        |payloads never leave the task; output is 9 scalars/row. The
        |position-weighted sum pins scanline order in the exact-hash
        |oracle.""".stripMargin,
    "q366_concentration_stream" ->
      """Stream-fed concentration: the daily closed-window mass emitter
        |(one mode-adaptive window aggregate) re-aggregated per user —
        |masses add across windows — into the q353 readout core
        |(keyspace-ranked window + one moment aggregate). Users-sized
        |state, 1-row output.""".stripMargin,
    "q367_benford_stream" ->
      """Stream-fed Benford: 9 digit counters per closed day, additive
        |merge, then the q354 grid readout (broadcast 9-row grid +
        |broadcast 1-row total). Constant-sized everything after the fact
        |scan.""".stripMargin,
    "q368_longest_repeat" ->
      """Longest repeat: O(log λ*) doubling levels (each the q362 round
        |shape, checkpointed), then a binary search whose probes bit-fold
        |the PRECOMPUTED levels by exact concatenation — never a fresh
        |doubling chain per probe. Driver actions are one empty/dup
        |boolean per level/probe (q55 fixpoint posture). 1-row output.""".stripMargin,
    "q369_substr_trim" ->
      """Exact-substring trim: q362's dup-position stream exploded
        |×minLen to covered positions, (id,pos)-keyed anti-join against
        |the positional token stream, per-doc ordered rebuild (each doc
        |sorts only its own kept tokens) — the q60 rebuild shape at
        |suffix-index precision.""".stripMargin,
    "q370_friedman" ->
      """Friedman: one map-combined (block,treatment) aggregate, a
        |blocks×k grid fill (broadcast nested-loop on the k-sized side),
        |per-BLOCK rank windows (k rows per partition — never a global
        |sort), one treatments-sized moment aggregate. The main quotient
        |stays DECIMAL end-to-end (q344 overflow lesson).""".stripMargin,
    "q371_cochran_q" ->
      """Cochran's Q: one map-combined (block,treatment) max-aggregate,
        |then one blocks-sized and one treatments-sized moment aggregate
        |cross-joined broadcast — no windows at all. 1-row output.""".stripMargin,
    "q372_setsim_audit" ->
      """Setsim pruning audit: the q113 token/df/prefix derivation (df
        |aggregate + per-doc rank window) capped by THREE scalar moment
        |aggregates — candidate masses from df moments, never a pair
        |generated. The audit that decides whether q113's join is safe
        |to run on a given corpus.""".stripMargin,
    "q373_brown_forsythe" ->
      """Brown–Forsythe: exact per-group lower median (by-value collapse
        |+ group-partitioned running window — distinct values only),
        |deviation join (narrow), one map-combined 3-moment aggregate
        |per group, k-sized reduce. 1-row output; no BIGINT quotient
        |anywhere.""".stripMargin,
    "q374_friedman_stream" ->
      """Stream-fed Friedman: the q357 hourly-count emitter's closed
        |windows re-aggregated into daily blocks (one tiny aggregate over
        |keys×hours state), then the q370 readout. Grid/window costs are
        |days×k-sized.""".stripMargin,
    "q375_jpeg_pixels" ->
      """Real baseline-JPEG decode: one narrow mapPartitions — synth
        |JFIF, marker walk, DHT canonical reconstruction, huffman+DPCM,
        |dequantize, IDCT, fixed-point color convert — payloads never
        |leave the task; output is 10 scalars/row. The position-weighted
        |sum pins raster order in the exact-hash oracle.""".stripMargin,
    "q385_jpeg_progressive" ->
      """Progressive JPEG decode: the q375 shape — one narrow
        |mapPartitions (synth SOF2 stream, multi-scan coefficient
        |accumulation, one IDCT at EOI), payloads never leave the task,
        |10 scalars/row. Decode cost is per-byte-of-payload exactly like
        |the sequential path (each entropy bit is read once across all
        |scans), so the 100 TB argument is unchanged: scale = partitions,
        |no exchange, no skew coupling.""".stripMargin,
    "q391_exif_metadata" ->
      """EXIF profiling: the cheapest media shape on the board — one
        |narrow mapPartitions, header-only walk (stops at APP1, no
        |entropy/pixel work), 7 scalars/row. The 100 TB profiling pass
        |that gates which payloads ever reach a pixel decoder.""".stripMargin,
    "q390_png_full" ->
      """Generalized PNG decode: the q375 media shape — one narrow
        |mapPartitions (synth, chunk walk, inflate, five-filter
        |reconstruction, per-variant deinterlace/palette/16-bit),
        |payloads in-task, 9 scalars/row. Adam7 adds no cross-row
        |coupling: passes are sub-regions of ONE payload.""".stripMargin,
    "q388_mjpeg_video" ->
      """MJPEG video decode: the media shape with an in-task frame
        |loop — one narrow mapPartitions walks the AVI container and
        |runs the full JPEG pipeline per frame; 10 scalars/row. Frame
        |count scales work per row but never crosses rows: a 10k-frame
        |video is one task's loop, and row-level parallelism is
        |unchanged (for giant videos the natural split is frame-range
        |pre-chunking at ingest, the same contract as CDC chunking).""".stripMargin,
    "q389_audio_features" ->
      """Audio featurization: decode + feature pass fused in one
        |mapPartitions — energy/ZCR/peak are a single scan over the
        |in-task PCM buffer; 5 scalars/row, no exchange.""".stripMargin,
    "q386_g711_audio" ->
      """G.711 decode: the q375 media shape — one narrow mapPartitions
        |(synth WAV, RIFF walk, stateless per-byte companding
        |expansion), payloads never leave the task, 7 scalars/row.
        |Scale = partitions; no exchange, no state across rows.""".stripMargin,
    "q387_adpcm_audio" ->
      """IMA ADPCM decode: same narrow media shape; the per-sample
        |state machine lives entirely INSIDE one payload (per-block
        |reset is the format's own seek contract), so parallelism is
        |per-document exactly like every other codec — state never
        |crosses row boundaries, no exchange.""".stripMargin,
    "q383_jpeg_quality" ->
      """Quality estimation: one narrow mapPartitions — payload synth,
        |marker walk to the DQTs, zigzag undo, argmin-L1 over 100
        |candidate scalings (pure in-task integer work) — no pixel
        |decode, no exchange; 7 scalars/row.""".stripMargin,
    "q384_cluster_agreement" ->
      """Clustering agreement: both cluster relations (each its own
        |oracle-green pipeline) equi-joined on id, pinned once, then
        |three map-combined contingency aggregates and a broadcast cross
        |of four 1-row frames. The C(n,2) sums mean the quadratic pair
        |set never exists anywhere.""".stripMargin,
    "q381_cross_dup_spans" ->
      """Cross-corpus spans: one tagged fixed-depth class relation over
        |train∪eval (direct depth-4 gram seed + one doubling round for
        |minLen=8), a class-keyed tag min/max aggregate, a semi join, and
        |a per-doc island window. Everything past the seed is
        |constant-width class ids.""".stripMargin,
    "q382_cross_trim" ->
      """Decontamination trim: q381's position stream exploded ×minLen
        |(dup-start-sized, not corpus-sized), distinct, anti-joined
        |against the eval token stream, per-doc ordered rebuild via
        |collect_list + array_sort — the q369 rebuild with the cross
        |predicate.""".stripMargin,
    "q380_jpeg420_pixels" ->
      """4:2:0 JPEG decode: the q375 shape (one narrow mapPartitions,
        |payloads in-task, 10 scalars/row) over interleaved 6-block MCUs
        |with half-resolution chroma planes and replication upsampling.
        |Per-task work is 4× q375's (32×32 vs 16×16); the plan is
        |identical — scan → mapPartitions → dump, no exchange.""".stripMargin,
    "q376_cross_corpus_repeat" ->
      """Cross-corpus longest span: the q368 climb/search core (shared
        |climbSearch — levels checkpointed, probe prefixes memoized by
        |accumulated depth) with the corpus tag embedded in the position
        |id and the predicate "some class spans both tags" (one min/max
        |aggregate per probe). Driver actions stay one boolean per
        |level/probe; 1-row output.""".stripMargin,
    "q377_phrase_scan" ->
      """Phrase scan: one corpus token-df aggregate, per-phrase rarest-
        |token anchor (dictionary-sized, broadcast), candidates = one
        |equi-join of the positional token stream against the anchors
        |(mass = Σ df(anchor)), verification = one positional equi-join
        |× plen with a count==plen gate, then the (doc, phrase) rollup.
        |No automaton state, nothing quadratic, dictionary always
        |broadcast.""".stripMargin,
    "q378_bpe_fertility" ->
      """BPE fertility: the q104 encode join (broadcast word→len dict)
        |rolled up by language against the table's n_chars — one
        |map-combined aggregate after the q104 core; langs-sized
        |output.""".stripMargin,
    "q379_rendezvous_shards" ->
      """Rendezvous shards: doc×S weight map (S a constant), one
        |max(struct) argmax aggregate keyed by doc, one S-sized count
        |aggregate, 1-row total broadcast back. Nothing data-dependent
        |shuffles twice.""".stripMargin)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val noteMap = notes.toMap
    require(noteMap.size == notes.size, {
      val dup = notes.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }
      s"duplicate plan notes: ${dup.mkString(", ")}"
    })
    val stale = noteMap.keySet -- SparkEntry.queries.keySet
    require(stale.isEmpty, s"notes for unregistered queries: ${stale.mkString(", ")}")
    // EVERY registered query's physical plan is emitted (the committed
    // audit artifact); `notes` is the hand-written scale analysis layer on
    // top — unannotated queries still get their full formatted plan.
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit (generated by graft.Plans)\n\n")
    sb.append(s"Source: `$sfDir`. Regenerate: `sbt \"runMain graft.Plans $sfDir\"`.\n")
    sb.append(s"Every registered query is emitted; ${noteMap.size} carry a ")
    sb.append("hand-written scale note (the rest state the family whose note applies).\n")
    var annotated = 0
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val note = noteMap.get(name) match {
        case Some(n) => annotated += 1; n
        case None => "(plan emitted for audit completeness; no dedicated " +
          "scale note — the operator's family note and Scaladoc carry the analysis)"
      }
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${SparkEntry.queries.size} plans, $annotated annotated)")
    spark.stop()
  }
}
