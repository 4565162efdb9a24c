package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{ArrayOps, Corpus, Dedup, Multimodal, Relational, Similarity, Tables, TextOps}
import graft.streaming.EventStreams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one implemented operator from SURVEY.md §2;
  * entries with an [[oracleSql]] twin are hash-checked against DuckDB on the
  * same parquet tables (column names and value formatting must match
  * exactly), the rest get a rows-only check and are exactness-tested in the
  * ScalaTest suites.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02_join5(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (Relational.q01_agg _),
    "q02_join5" -> (Relational.q02_join5 _),
    "q03_semijoin" -> (Relational.q03_semijoin _),
    "q04_antijoin" -> (Relational.q04_antijoin _),
    "q05_window" -> (Relational.q05_window _),
    "q06_topk" -> (Relational.q06_topk _),
    "q07_setops" -> (Relational.q07_setops _),
    "q08_rollup" -> (Relational.q08_rollup _),
    "q09_cube" -> (Relational.q09_cube _),
    "q10_distinct" -> (Relational.q10_distinct _),
    "q11_scalar" -> (Relational.q11_scalar _),
    "q12_datefns" -> (Relational.q12_datefns _),
    "q13_rangejoin" -> (Relational.q13_rangejoin _),
    "q14_asof" -> (Relational.q14_asof _),
    "q15_sessionize" -> (Relational.q15_sessionize _),
    "q16_grouping_sets" -> (Relational.q16_grouping_sets _),
    "q18_salted_agg" -> (Relational.q18_salted_agg _),
    "q19_having" -> (Relational.q19_having _),
    "q20_corr_subquery" -> (Relational.q20_corr_subquery _),
    "q21_pivot" -> (Relational.q21_pivot _),
    "q22_setops_all" -> (Relational.q22_setops_all _),
    "q23_window_analytic" -> (Relational.q23_window_analytic _),
    "q24_json" -> (Relational.q24_json_arrays _),
    "q25_percentile" -> (Relational.q25_percentile _),
    // value-based (time-RANGE) window frame over exact epoch micros —
    // the linear form of the trailing-window self-join
    "q27_range_frame" -> (Relational.q27_range_frame _),
    // manual skew-join: content-hash salt on the probe side, ×16 build
    // replication — result identical to the plain join (the oracle is one)
    "q28_salted_join" -> (Relational.q28_salted_join _),
    // co-located bucketed SMJ: the on-disk layout is the join partitioning,
    // so neither side exchanges (q02 broadcast / q28 salt / q30 bucket)
    "q30_bucketed_join" -> ((s, d) => Relational.q30_bucketed_join(s, d)),
    // gap-filled dense time grid from aggregate-grain dimensions; the only
    // corpus-grain op is the initial hourly count
    "q31_gapfill" -> (Relational.q31_gapfill _),
    // join-key skew histogram: the measurement that decides plain vs
    // broadcast vs salted (q28); two map-side-combined aggs, one scan
    "q32_skew_report" -> (Relational.q32_skew_report _),
    "q33_incremental_mv" -> (Relational.q33_incremental_mv _),
    "q34_funnel" -> (Relational.q34_funnel _),
    "q35_retention" -> (Relational.q35_retention _),
    "q36_dpp_join" -> (Relational.q36_dpp_join _),
    "q37_scd2" -> (Relational.q37_scd2 _),
    "q38_observe" -> (Relational.q38_observe _),
    "q39_unpivot" -> (Relational.q39_unpivot _),
    "q40_mad_outliers" -> (Relational.q40_mad_outliers _),
    "q41_time_weighted" -> (Relational.q41_time_weighted _),
    "q42_merge_upsert" -> (Relational.q42_merge_upsert _),
    "q43_time_travel" -> (Relational.q43_time_travel _),
    "q44_bom_rollup" -> ((s, d) => Relational.q44_bom_rollup(Tables.t(s, d, "part"))),
    "q45_runtime_filter" -> (Relational.q45_runtime_filter _),
    // retraction-based IVM: corrections leave the view as negated partials
    // before their restated values merge in — O(corrections)+O(|MV|)
    "q46_retraction_mv" -> (Relational.q46_retraction_mv _),
    // discrete lower weighted median: exact decimal cumulation over a
    // total order, first 2·cw ≥ W crossing — no interpolation anywhere
    "q47_weighted_median" -> (Relational.q47_weighted_median _),
    // Spark-4 VARIANT: parse once at the scan edge, typed variant_get
    // extractions feed ordinary folds (vs q24's per-expression re-parse)
    "q48_variant" -> (Relational.q48_variant _),
    // bitemporal as-of: valid-time x transaction-time visibility, epoch-
    // day integer arithmetic, broadcast 4-probe dimension attach
    "q49_bitemporal" -> (Relational.q49_bitemporal _),
    // last-touch attribution: fill-forward window, no interval self-join
    "q50_attribution" -> (Relational.q50_attribution _),
    // equi-depth optimizer stats: value-grain census, integer bucket rule
    "q51_stats_histogram" -> ((s, d) => Relational.q51_stats_histogram(s, d)),
    // current-state extraction: per-key top-1 via WindowGroupLimit
    "q29_latest_per_key" -> (Relational.q29_latest_per_key _),
    "q26_approx_percentile" -> (Relational.q26_approx_percentile _),
    "t5_array_fns" -> ((s, d) => TextOps.arrayOps(Tables.t(s, d, "documents"))),
    "q17_approx_distinct" -> (Relational.q17_approx_distinct _),
    "a1_chunk_plan" -> (ArrayOps.a1_chunk_plan _),
    "a2_bbox" -> (ArrayOps.a2_bbox _),
    "a3_voxel_pipeline" -> (ArrayOps.a3_voxel_pipeline _),
    "a4_downsample" -> (ArrayOps.a4_downsample _),
    "a5_chunk_table" -> (ArrayOps.a5_chunk_table _),
    "a6_zarr_pipeline" -> (ArrayOps.a6_zarr_pipeline _),
    "a7_n5_pipeline" -> (ArrayOps.a7_n5_pipeline _),
    "a8_zorder" -> (ArrayOps.a8_zorder _),
    "a9_zarr3_pipeline" -> (ArrayOps.a9_zarr3_pipeline _),
    "a10_zarr3_sharded" -> (ArrayOps.a10_zarr3_sharded _),
    "a11_tiff_stack" -> (ArrayOps.a11_tiff_stack _),
    // a12 converts ACROSS formats: TIFF stack → precomputed (chunk-grain
    // rechunk copy) → mip pyramid — the domain's raw-data ingestion flow
    "a12_convert_pipeline" -> (ArrayOps.a12_convert_pipeline _),
    // segmentation object stats: count + bbox + centroid per label, all
    // folded in ONE map-side-combined aggregation over the voxel view
    "a13_label_stats" -> (ArrayOps.a13_label_stats _),
    // storage audit from ONE LIST pass (zero GETs): stored vs raw bytes
    // and compression ratio per z layer, partial edge chunks sized exactly
    "a14_storage_report" -> (ArrayOps.a14_storage_report _),
    // per-segment image stats: TWO volumes zipped chunk-aligned (the same
    // task fetches both aligned objects) — no voxel-grain join anywhere
    "a15_label_intensity" -> (ArrayOps.a15_label_intensity _),
    // distributed connected components: chunk-local union-find, O(surface)
    // face graph, pointer-jumping merge — voxels never shuffle
    "a16_connected_components" -> (ArrayOps.a16_connected_components _),
    // halo-exchange morphology: chunk-local dilation + O(surface) spill/
    // shell anti-join — the voxel relation never shuffles
    "a17_dilate" -> (ArrayOps.a17_dilate _),
    "a18_erode" -> (ArrayOps.a18_erode _),
    // pyramid integrity audit: re-derive mip-1 from mip-0 and diff the
    // store (a tampered chunk is planted so detection is proven)
    "a19_mip_audit" -> (ArrayOps.a19_mip_audit _),
    // contact sites: chunk-local label pairs + probe⋈negface seam join —
    // the connectomics adjacency operator; only O(surface) halos move
    "a20_contact_area" -> (ArrayOps.a20_contact_area _),
    // exact quantiles from a 256-bin histogram fold — no voxel sort ever
    "a21_percentiles" -> (ArrayOps.a21_percentiles _),
    // segmentation-correct pyramid: majority-vote pooling through the
    // real store write path (mean would invent nonexistent labels)
    "a22_mode_downsample" -> (ArrayOps.a22_mode_downsample _),
    // batch multi-ROI gather: union-box chunks decode once; voxels assign
    // to covering ROIs row-locally (filter+explode, no voxel-grain join)
    "a23_roi_gather" -> (ArrayOps.a23_roi_gather _),
    // two-pass global normalization: value-grain LUT fit + broadcast
    // apply + real store write-back; gate reads the DESTINATION volume
    "a24_hist_equalize" -> (ArrayOps.a24_hist_equalize _),
    // blosc container on real chunk traffic: uint16 + shuffle filter
    // through the distributed write/read cycle
    "a25_blosc_pipeline" -> (ArrayOps.a25_blosc_pipeline _),
    // mip-aware ROI serving: the budget rule picks the pyramid level by
    // arithmetic alone — no level is read that won't be served
    "a26_mip_select" -> (ArrayOps.a26_mip_select _),
    "a27_mip_project" -> (ArrayOps.a27_mip_project _),
    "a28_seg_contingency" -> (ArrayOps.a28_seg_contingency _),
    "a29_blur" -> (ArrayOps.a29_blur _),
    "a30_zonemap" -> (ArrayOps.a30_zonemap _),
    "a31_upsample" -> (ArrayOps.a31_upsample _),
    "a32_multichannel" -> (ArrayOps.a32_multichannel _),
    "a33_chunk_dedup" -> (ArrayOps.a33_chunk_dedup _),
    "a34_object_catalog" -> (ArrayOps.a34_object_catalog _),
    "a35_mrc_volume" -> (ArrayOps.a35_mrc_volume _),
    "a36_otsu" -> (ArrayOps.a36_otsu_threshold _),
    "a37_opening" -> (ArrayOps.a37_opening _),
    "a38_zprofile" -> (ArrayOps.a38_zprofile _),
    "a39_mesh_stats" -> (ArrayOps.a39_mesh_stats _),
    // supervoxel agglomeration: a20 contact fold (voxels never shuffle) +
    // label-grain thresholded merge via bounded-round pointer jumping
    "a40_agglomerate" -> ((s, d) => ArrayOps.a40_agglomerate(s, d)),
    // cross-acquisition intensity normalization: exact integer CDFs,
    // cross-multiplied quantile LUT (≤256×256 level grain), store write-back
    "a41_hist_match" -> (ArrayOps.a41_hist_match _),
    // precomputed skeleton codec: real bytes through encode→binaryFile→
    // decode; degree/cable morphometry, exact integers end to end
    "a42_skeleton_stats" -> (ArrayOps.a42_skeleton_stats _),
    // version diff at chunk grain: blob-hash compare (nothing decodes for
    // unchanged chunks), voxel join only inside the changed region
    "a43_version_diff" -> (ArrayOps.a43_version_diff _),
    // annotation layer: real cell framing roundtrip + per-cell census
    "a44_annotations" -> (ArrayOps.a44_annotations _),
    // SQL DDL surface: CREATE TABLE USING precomputed + INSERT INTO +
    // SELECT — the create-new-dataset path entirely from SQL
    "a45_sql_ddl" -> (ArrayOps.a45_sql_ddl _),
    // fixity audit: store digests vs the at-rest manifest; planted
    // bit-rot must surface, clean chunks must clear
    "a46_fixity_audit" -> (ArrayOps.a46_fixity_audit _),
    // audit-then-repair for mip pyramids: only FLAGGED chunks recompute
    // from the base level (O(drift)); post-repair re-derivation must be
    // clean everywhere and the drift set exactly the injected one
    "a47_mip_repair" -> (ArrayOps.a47_mip_repair _),
    "d1_dedup_exact" -> ((s, d) => Dedup.exactDuplicates(Tables.t(s, d, "documents"))),
    // d2 IS the at-rest ground-truth artifact: the first toucher in the
    // JVM executes the exact PPJoin and dumps it; every later consumer
    // (d5/d10/d11/d16/d18/d21/c9/c16/c22/c28) reads the dump — the
    // production shape, where the dedup pass maintains this relation and
    // no report re-derives it from text (r10 directive 3)
    "d2_dedup_ngram" -> ((s, d) => Dedup.nearDupPairsAtRest(s, d, 0.8)),
    // pairs served from the at-rest corpus MinHash artifact (r13 opt):
    // warmed runs are bands + candidate join + exact verify over parquet
    "d3_dedup_minhash" -> ((s, d) => Dedup.minhashPairsAtRest(s, d, 0.8)),
    // fingerprint fit over the at-rest shingle sets (r13 opt): warmed
    // runs never re-run the tokenize/explode/distinct pipeline
    "d4_dedup_simhash" -> ((s, d) => Dedup.simhashAtRest(s, d)),
    "d5_dedup_clusters" -> ((s, d) => Dedup.dupClusters(Tables.t(s, d, "documents"), 0.8,
      pairs = Some(Dedup.nearDupPairsAtRest(s, d, 0.8)))),
    "d6_span_dedup" -> ((s, d) => Dedup.spanDedup(Tables.t(s, d, "documents"))),
    // the standing-pipeline dedup shape: new shard vs corpus hash index at
    // rest — the corpus is never re-scanned (see Dedup.incrementalDedup)
    "d7_dedup_incremental" -> (Dedup.incrementalDedup _),
    // d7 lifted to NEAR-dup: delta bands probe the at-rest corpus LSH
    // index, exact-verify against at-rest shingle sets
    "d8_dedup_incr_near" -> ((s, d) => Dedup.incrementalNearDup(s, d, 0.8)),
    // SemDeDup: embedding near-dup pruning WITHIN k-means clusters — the
    // curation form whose quadratic term is bounded by cluster size
    "d9_semdedup" -> ((s, d) => Similarity.semDedupPrune(s, d, 0.4)),
    // inter-source duplication matrix: which sources near-duplicate each
    // other and by how much — the report that drives source weighting
    "d10_dup_sources" -> ((s, d) => Dedup.dupSourceMatrix(Tables.t(s, d, "documents"), 0.8,
      pairs = Some(Dedup.nearDupPairsAtRest(s, d, 0.8)))),
    // duplicate-graph centrality: power iteration at label grain over the
    // LSH pair relation — the canonical-keeper rule beyond min-id
    "d11_pagerank" -> ((s, d) => Dedup.pageRank(Tables.t(s, d, "documents"), 0.8,
      pairRel = Some(Dedup.nearDupPairsAtRest(s, d, 0.8)))),
    // C4-rule line dedup: first occurrence wins corpus-wide, documents
    // reassemble from surviving lines — one line-hash exchange
    "d12_line_dedup" -> ((s, d) => Dedup.lineDedup(Tables.t(s, d, "documents"))),
    // asymmetric containment: rarity-prefix probes the full inverted
    // shingle relation — catches quotes symmetric Jaccard is blind to
    // the ranked-set relation lives at rest (r13): warmed runs pay only
    // the prefix probe + verification, never the ranking pipeline
    "d13_containment" -> ((s, d) => Dedup.containmentPairsAtRest(s, d, 0.9)),
    // Bloom-prefiltered incremental dedup: broadcast sketch prunes the
    // delta locally; exact confirm semi-join moves only candidates
    "d14_bloom_dedup" -> ((s, d) => Dedup.bloomDedup(s, d)),
    "d15_url_canon" -> ((s, d) => Dedup.urlCanonDedup(Tables.t(s, d, "documents"))),
    "d16_soft_dedup" -> ((s, d) => Dedup.softDedupWeights(Tables.t(s, d, "documents"),
      pairs = Some(Dedup.nearDupPairsAtRest(s, d, 0.8)))),
    "d17_bbit_minhash" -> (Dedup.bbitEstimates(_, _)),
    // calibration over the at-rest shingle sets + at-rest truth pairs
    // (r13 opt): a warmed run touches no corpus text
    "d18_simhash_eval" -> ((s, d) => Dedup.simhashEvalAtRest(s, d, 0.8)),
    // records linkage: SymSpell deletion-neighborhood blocking (one
    // equi-join on delete variants), levenshtein verify on collisions only
    "d19_fuzzy_match" -> ((s, d) => Dedup.fuzzyMatch(Tables.t(s, d, "customer"))),
    // incremental cluster maintenance: label-grain merge of only the NEW
    // pairs (d8 index probe + delta×delta); oracle is the FULL d5 recompute
    "d20_incr_clusters" -> (Dedup.incrementalClusters(_, _)),
    // (b,r) S-curve calibration: empirical recall/precision per banding
    // vs the exact PPJoin truth and the theoretical design point
    "d21_lsh_tuning" -> (Dedup.lshTuningSweep(_, _)),
    // ExactSubstr-style duplicated-span profile over the shingle index
    "d22_dup_spans" -> ((s, d) => Dedup.dupSpans(Tables.t(s, d, "documents"))),
    "s1_cosine_topk" -> ((s, d) => Similarity.cosineTopK(s, d)),
    "s2_ann_lsh" -> ((s, d) => Similarity.annLsh(s, d)),
    "s4_ann_ivf" -> ((s, d) => Similarity.annIvf(s, d)),
    "s3_embed_dups" -> ((s, d) => Similarity.embeddingDupPairs(s, d, 0.2)),
    "s5_sq8_topk" -> ((s, d) => Similarity.sq8TopK(s, d)),
    "s7_pq_topk" -> ((s, d) => Similarity.pqTopK(s, d)),
    "s8_ivfadc" -> ((s, d) => Similarity.ivfAdcTopK(s, d)),
    // two-stage serve path: ADC shortlist → exact re-rank over fetched
    // true vectors (FAISS IndexRefineFlat composition)
    "s15_ivf_refine" -> ((s, d) => Similarity.ivfRefineTopK(s, d)),
    // radius search: all corpus vectors within cos >= tau of each query —
    // s2's candidate machinery with a threshold keep instead of a rank
    "s16_range_search" -> ((s, d) => Similarity.rangeSearch(s, d)),
    // truncated-prefix recall eval: can retrieval serve on the first d
    // dims? per-dim scoring is the bounded-broadcast s1 eval shape
    "s17_matryoshka" -> ((s, d) => Similarity.matryoshkaEval(s, d)),
    // metadata-filtered ANN: label predicate applied inside the probed
    // cells BEFORE scoring (pre-filter, not top-k post-filter)
    "s18_filtered_ann" -> ((s, d) => Similarity.filteredAnn(s, d)),
    // embedding QC: zero-vector/truncation/norm screening before any
    // index build; row-local, one scan, zero shuffle
    "s19_embedding_qc" -> (Similarity.embeddingQc _),
    "s20_dim_stats" -> (Similarity.dimStats _),
    // s21 IS the at-rest graph artifact: first toucher runs the real
    // LSH-bucketed build and dumps; s33/s36/s37 read it at rest (r11)
    "s21_knn_graph" -> ((s, d) => Similarity.knnGraphAtRest(s, d)),
    "s22_ivf_balance" -> ((s, d) => Similarity.ivfBalance(s, d)),
    "s23_whiten_qc" -> (Similarity.whitenQc _),
    "s24_covariance" -> (Similarity.covarianceMatrix _),
    "s25_pca_project" -> (Similarity.pcaProject _),
    "s26_sq8_error" -> (Similarity.sq8ErrorReport _),
    "s27_hamming_topk" -> ((s, d) => Similarity.hammingTopK(s, d)),
    "s28_kmeans_parallel" -> ((s, d) => Similarity.kmeansParallelInit(s, d)),
    "s29_rrf_fusion" -> ((s, d) => Similarity.rrfFusion(s, d)),
    "s30_triplet_mining" -> ((s, d) => Similarity.tripletMining(s, d)),
    "s31_coverage_sample" -> ((s, d) => Similarity.coverageSample(s, d)),
    "s32_nprobe_sweep" -> ((s, d) => Similarity.nprobeSweep(s, d)),
    // NN-descent round over the s21 graph: distance-2 candidate expansion
    // (O(n·k²), never all-pairs), exact re-rank, gained-edge accounting
    "s33_nn_descent" -> ((s, d) => Similarity.nnDescent(s, d)),
    // query-adaptive nprobe: top-2 centroid margin (already computed by
    // cell selection) routes each query to 4/8/12 probes — free routing
    "s34_adaptive_nprobe" -> ((s, d) => Similarity.adaptiveNprobe(s, d)),
    // representation-space outlier screen: max-centroid affinity deciles
    // via the histogram device — zero shuffle past the scoring pass
    "s35_ood_screen" -> ((s, d) => Similarity.oodScreen(s, d)),
    // transductive label spread over the s21 kNN graph, clamped seeds
    "s36_label_prop" -> ((s, d) => Similarity.labelProp(s, d)),
    // class-grain eval of the index-backed kNN classifier
    "s37_knn_confusion" -> ((s, d) => Similarity.knnConfusion(s, d)),
    // two-stage residual quantization: coarse cell + residual codebook
    "s38_residual_quant" -> ((s, d) => Similarity.residualQuantizer(s, d)),
    // day-2 index operation: new shard assigned against the IVF centroids
    // AT REST (O(delta), never a refit); cell-grain drift + hot-cell report
    "s39_ivf_delta" -> ((s, d) => Similarity.ivfDelta(s, d)),
    "s9_knn_label" -> ((s, d) => Similarity.knnLabelVote(s, d)),
    // nearest-class-mean prototypes: (label×dim)-grain partial sums — the
    // wide exchange never carries vectors. Gated at cell grain (the
    // driver's value hash is defined over scalar columns, not arrays).
    "s10_class_centroids" -> (Similarity.classCentroidCells _),
    // recall@k of each ANN path vs the exact scan — the acceptance gate
    // that lets an approximate index replace s1 in production
    "s11_ann_recall" -> ((s, d) => Similarity.annRecallEval(s, d)),
    // sparse tf-idf retrieval: postings-list inverted index, broadcast
    // query postings, integer stop-list prune — the IR-shaped sparse
    // counterpart of s1's dense scan
    "s12_sparse_topk" -> ((s, d) => Similarity.sparseTfidfTopK(s, d)),
    // JL random projection: Dim->16 via a seeded Gaussian matrix carried
    // as foldable codegen constants; exact scan runs in the reduced space
    "s13_rp_topk" -> ((s, d) => Similarity.randomProjTopK(s, d)),
    // MMR diversity re-rank over the exact top-10: unrolled greedy
    // selection as ONE Catalyst plan over the bounded candidate relation
    "s14_mmr_rerank" -> ((s, d) => Similarity.mmrRerank(s, d)),
    "t1_tokens" -> ((s, d) => TextOps.tokenStats(Tables.t(s, d, "documents"))),
    "t2_quality" -> ((s, d) => TextOps.qualityScores(Tables.t(s, d, "documents"))),
    "t3_langid" -> ((s, d) => TextOps.langId(Tables.t(s, d, "documents"))),
    "t15_langid_eval" -> ((s, d) => TextOps.langIdEval(Tables.t(s, d, "documents"))),
    "t4_fingerprint" -> ((s, d) => TextOps.fingerprints(Tables.t(s, d, "documents"))),
    "t6_bpe_tokens" -> ((s, d) => TextOps.bpeTokens(Tables.t(s, d, "documents"))),
    "t6b_bpe_encode" -> (TextOps.bpeEncode _),
    "t7_split" -> ((s, d) => Corpus.splitAssign(Tables.t(s, d, "documents"))),
    "t8_packing" -> ((s, d) => Corpus.packAssignments(Tables.t(s, d, "documents"))),
    "t14_chunking" -> ((s, d) => Corpus.chunkWindows(Tables.t(s, d, "documents"))),
    "c1_curation" -> ((s, d) => Corpus.curationReport(Tables.t(s, d, "documents"))),
    "c2_mixture" -> ((s, d) => Corpus.mixtureSample(Tables.t(s, d, "documents"))),
    "t9_bm25" -> ((s, d) => TextOps.bm25TopTerms(Tables.t(s, d, "documents"))),
    "t10_repetition" -> ((s, d) => TextOps.repetitionStats(Tables.t(s, d, "documents"))),
    "c3_decontam" -> ((s, d) => Corpus.decontaminateAtRest(s, d)),
    "c4_report" -> ((s, d) => Corpus.corpusReport(Tables.t(s, d, "documents"))),
    "c5_quota_sample" -> ((s, d) => Corpus.quotaSample(Tables.t(s, d, "documents"))),
    // the synthetic corpus has no PII, so the gate masks deterministically
    // injected emails/phones/IPs (same injection in the oracle)
    "t11_pii" -> ((s, d) =>
      TextOps.piiMask(TextOps.withSyntheticPii(Tables.t(s, d, "documents")))),
    "t12_unigram_lp" -> ((s, d) => TextOps.unigramLogProb(Tables.t(s, d, "documents"))),
    // bigram LM quality score — the CCNet/KenLM filter shape; word salad
    // of common tokens fools the unigram model (t12) but not this one
    "t17_bigram_lp" -> ((s, d) => TextOps.bigramLogProb(Tables.t(s, d, "documents"))),
    // corpus Zipf diagnostic: distributed top-k head (no global window),
    // regression over exact decimal sums
    "t18_zipf" -> ((s, d) => TextOps.zipfFit(Tables.t(s, d, "documents"))),
    // sub-token gibberish detector: two map-side-combined aggregations,
    // per-char decimal ln terms so both engines sum identically
    "t19_entropy" -> ((s, d) => TextOps.charEntropy(Tables.t(s, d, "documents"))),
    // Flesch reading ease from three codegen regex counts — row-local
    "t20_readability" -> ((s, d) => TextOps.readability(Tables.t(s, d, "documents"))),
    // per-doc 8-gram duplication rate: the memorization-risk score a
    // curation policy thresholds on; one gram-keyed corpus exchange
    "t21_novelty" -> ((s, d) => TextOps.ngramNovelty(Tables.t(s, d, "documents"))),
    "t22_heavy_hitters" -> ((s, d) => TextOps.heavyHitters(Tables.t(s, d, "documents"))),
    "t23_code_detect" -> ((s, d) => TextOps.codeDetect(Tables.t(s, d, "documents"))),
    "t24_lang_consistency" -> ((s, d) => TextOps.langConsistency(Tables.t(s, d, "documents"))),
    "t25_blocklist" -> ((s, d) => TextOps.blocklistScreen(Tables.t(s, d, "documents"))),
    "t26_mojibake" -> ((s, d) => TextOps.mojibakeScreen(Tables.t(s, d, "documents"))),
    "t27_boilerplate" -> ((s, d) => TextOps.boilerplate(Tables.t(s, d, "documents"))),
    "t28_homoglyph" -> ((s, d) => TextOps.homoglyphScreen(Tables.t(s, d, "documents"))),
    "t29_collocations" -> ((s, d) => TextOps.collocations(Tables.t(s, d, "documents"))),
    "t30_heaps" -> ((s, d) => TextOps.heapsGrowth(Tables.t(s, d, "documents"))),
    "t31_keywords" -> ((s, d) => TextOps.keywords(Tables.t(s, d, "documents"))),
    "t32_kneser_ney" -> ((s, d) => TextOps.knBigramScore(Tables.t(s, d, "documents"))),
    // CCNet perplexity terciles via the c23 histogram device — the score
    // grid is bounded, so no global sort ever touches the corpus
    "t33_ppl_filter" -> ((s, d) => TextOps.pplFilter(Tables.t(s, d, "documents"))),
    // checksum-verified PAN screening: injected candidates are valid for
    // even ids, spoiled for odd — the screen must separate them exactly
    "t34_luhn_screen" -> ((s, d) => TextOps.luhnScreen(Tables.t(s, d, "documents"))),
    // FineWeb-edu-class academic signal: citation apparatus counted by
    // class, length-scaled injection proof (the t23 lesson)
    "t35_citations" -> ((s, d) => TextOps.citationDensity(Tables.t(s, d, "documents"))),
    // prompt-injection / instruction-leak governance scan, injection-proof
    "t36_instructions" -> ((s, d) => TextOps.instructionScreen(Tables.t(s, d, "documents"))),
    // C4 line-keep + page-drop ruleset; lorem/brace pages proven by injection
    "t37_c4_filters" -> ((s, d) => TextOps.c4Filters(Tables.t(s, d, "documents"))),
    "t13_normalize" -> ((s, d) => TextOps.normalizeText(Tables.t(s, d, "documents"))),
    "t13b_nfkc" -> ((s, d) => TextOps.nfkcNormalize(Tables.t(s, d, "documents"))),
    // the synthetic corpus is single-line, so the gate injects line
    // structure first (the t11 pattern); the rules are the real operator
    "t16_gopher_rules" -> ((s, d) =>
      TextOps.gopherRules(TextOps.withSyntheticLines(Tables.t(s, d, "documents")))),
    "c6_token_budget" -> ((s, d) => Corpus.tokenBudgetSample(Tables.t(s, d, "documents"))),
    // temperature-scaled source rebalancing (alpha = 1/2): kept counts
    // proportional to sqrt(n_src) — rates fitted FROM the data, unlike c2
    "c7_temperature_mix" -> ((s, d) => Corpus.temperatureMix(Tables.t(s, d, "documents"))),
    // URL-provenance curation: parse_url + eTLD+1 fold + blocklist, all
    // row-local; only the per-domain aggregate exchanges
    "c8_domains" -> ((s, d) => Corpus.domainCuration(Tables.t(s, d, "documents"))),
    // the dedup impact report: exact-dup / near-dup / line-cut mass per
    // source, composed from the d1/d3/d12 relations by doc-keyed joins
    "c9_dedup_report" -> ((s, d) => Corpus.dedupReport(Tables.t(s, d, "documents"),
      pairs = Some(Dedup.nearDupPairsAtRest(s, d, 0.8)))),
    // snapshot CDC: digest-only full-outer join, content never compared
    "c10_snapshot_diff" -> ((s, d) => Corpus.snapshotDiff(Tables.t(s, d, "documents"))),
    // DSIR importance weights: two map-side unigram fits + one vocab-sized
    // log-ratio join; the only corpus-grain exchange is the per-doc reduce
    "c11_importance" -> ((s, d) => Corpus.importanceWeights(Tables.t(s, d, "documents"))),
    // sequence-length histogram: bucket-grain agg first, cumulative window
    // only ever sees the tiny bucket relation
    "c12_length_hist" -> ((s, d) => Corpus.lengthHistogram(Tables.t(s, d, "documents"))),
    // hive-partitioned export roundtrip: partition values live in dir
    // names; per-source consumers prune to one directory (plan-pinned)
    "c13_partitioned_export" -> (Corpus.partitionedExport _),
    // JSONL roundtrip with PERMISSIVE corrupt-record quarantine: planted
    // garbage must be isolated, survivors reconcile against the original
    "c14_jsonl_ingest" -> (Corpus.jsonlIngest _),
    // mergeSchema roundtrip: v1 shards lack the later column; reads must
    // null-fill, distinguishing "not yet scored" from "scored zero"
    "c15_schema_evolution" -> (Corpus.schemaEvolution _),
    "c16_split_leakage" -> ((s, d) => Corpus.splitLeakage(Tables.t(s, d, "documents"), 0.8,
      pairs = Some(Dedup.nearDupPairsAtRest(s, d, 0.8)))),
    "c17_epoch_shuffle" -> ((s, d) => Corpus.epochShuffle(Tables.t(s, d, "documents"))),
    "c18_fuzzy_decontam" -> ((s, d) => Corpus.fuzzyDecontam(s, d)),
    "c33_decontam_ledger" -> ((s, d) => Corpus.decontamLedger(s, d)),
    // the release-export capstone: quality → dup (at-rest pairs) →
    // decontam (c33 ledger) → sequence packing, with per-stage attrition
    "c34_release_export" -> ((s, d) => Corpus.releaseExport(s, d)),
    // the day-2 release run: standing export at rest, delta-only screens,
    // append-only packs (immutable shipped packs; fresh pack per shard)
    "c36_incr_export" -> ((s, d) => Corpus.incrementalReleaseExport(s, d)),
    // a46's archival-integrity posture on the shipped release artifact:
    // manifest at export, injected drift, audit from real digests
    "c37_release_fixity" -> ((s, d) => Corpus.releaseFixity(s, d)),
    // c33 + m30: the multimodal ledger — visual eval near-identity is a
    // drop exactly like textual near-identity (media and text gate together)
    "c35_decontam_ledger_mm" -> ((s, d) => Corpus.decontamLedgerMm(s, d)),
    "c19_nutrition_label" -> ((s, d) => Corpus.nutritionLabel(Tables.t(s, d, "documents"))),
    "c20_manifest_skip" -> (Corpus.manifestSkip _),
    "c21_stratified_split" -> ((s, d) => Corpus.stratifiedSplit(Tables.t(s, d, "documents"))),
    "c22_cluster_reps" -> ((s, d) => Corpus.clusterReps(Tables.t(s, d, "documents"),
      pairs = Some(Dedup.nearDupPairsAtRest(s, d, 0.8)))),
    "c23_curriculum" -> ((s, d) => Corpus.curriculumSchedule(Tables.t(s, d, "documents"))),
    "c24_repetition" -> ((s, d) => Corpus.repetitionBudget(Tables.t(s, d, "documents"))),
    "c25_quality_drift" -> ((s, d) => Corpus.qualityDrift(Tables.t(s, d, "documents"))),
    // data-constrained scaling: breadth-first quality-prioritized epoch
    // grants under a served-token budget — one aggregate-grain window
    "c26_epoch_mix" -> ((s, d) => Corpus.epochAllocation(Tables.t(s, d, "documents"))),
    // data-card fertility table: tokens-per-word per (lang, source) under
    // the shared t6 pre-tokenizer — one row-local pass, one small fold
    "c27_fertility" -> ((s, d) => Corpus.tokenizerFertility(Tables.t(s, d, "documents"))),
    // dedup-aware c26: per-doc mass discounted by the d16 weight before
    // the allocator — the epoch delta vs c26 is the repetition tax
    "c28_effective_mix" -> ((s, d) => Corpus.effectiveEpochAllocation(Tables.t(s, d, "documents"),
      pairs = Some(Dedup.nearDupPairsAtRest(s, d, 0.8)))),
    // weak-supervision reliability: three heuristic raters, per-source
    // observed agreement and chance-corrected Fleiss kappa
    "c29_rater_agreement" -> ((s, d) => Corpus.raterAgreement(Tables.t(s, d, "documents"))),
    // k-anonymity audit over (lang, source, length-decile) classes
    "c30_k_anonymity" -> ((s, d) => Corpus.kAnonymity(Tables.t(s, d, "documents"))),
    // temperature-scaled source DRAW distribution (p_i ∝ sqrt(n_i)):
    // shares, expected draws, the repetition factor UniMax caps — the
    // report c7's doc-grain keep decision is configured from
    "c31_sampling_shares" -> ((s, d) => Corpus.samplingShares(Tables.t(s, d, "documents"))),
    // embedding-level eval-leakage screen (paraphrase/translation-robust,
    // next to c3/c18's n-gram decontam): bucketed corpus x broadcast eval
    "c32_semantic_decontam" -> ((s, d) => Similarity.semanticDecontam(s, d)),
    "s6_domains" -> ((s, d) => Similarity.kmeansDomains(s, d)),
    "m1_modal_meta" -> (Multimodal.modalMeta _),
    "m2_modal_features" -> (Multimodal.modalFeatures _),
    "m3_modal_resize" -> (Multimodal.modalResize _),
    "m4_modal_frames" -> (Multimodal.modalFrames _),
    "m5_modal_audio" -> (Multimodal.modalAudio _),
    // energy VAD over the real WAV roundtrip: 10 ms frames, integer
    // energies, maximal active runs — row-local, zero shuffle
    "m9_modal_vad" -> (Multimodal.modalVad _),
    // shot-boundary detection over the real AVI roundtrip: planted scene
    // structure, frame-diff energy threshold — integer-exact
    "m10_scene_detect" -> (Multimodal.modalScenes _),
    // zero-crossing + abs-mass over the decoded WAV roundtrip: a second
    // integer-exact proof of the codec path, row-local, zero shuffle
    "m11_audio_zcr" -> (Multimodal.modalZcr _),
    // ViT patchify: one real decode per image feeds its 48 patches, patch
    // geometry hash-proved against the closed-form raster; zero shuffle
    "m12_patchify" -> (Multimodal.modalPatches _),
    "m13_resample" -> (Multimodal.modalResample _),
    "m14_augment" -> (Multimodal.modalAugment _),
    "m15_silence_trim" -> (Multimodal.modalTrim _),
    "m16_watermark" -> (Multimodal.modalWatermark _),
    "m17_metadata_strip" -> ((s, d) => Multimodal.metadataStrip(Tables.t(s, d, "documents"))),
    "m18_loudness" -> ((s, d) => Multimodal.loudnessNormalize(s, d)),
    "m19_exposure_qc" -> (Multimodal.imageExposureQc _),
    "m20_pitch" -> ((s, d) => Multimodal.pitchDetect(s, d)),
    "m21_frame_dedup" -> (Multimodal.frameDedup _),
    // letterbox bars planted pre-encode, detected post-decode: row-local
    // edge-run scan, zero shuffle (the m19 QC-sweep discipline)
    "m22_border_qc" -> (Multimodal.imageBorderQc _),
    // DC bias planted pre-encode (saturating), detected post-decode via
    // exact integer folds — rail counts prove lossless codec carriage
    "m23_dc_offset" -> (Multimodal.audioDcQc _),
    // cross-video dedup: frame-hash inverted index (no all-pairs), exact
    // frame-set Jaccard verify; donor-payload injection proves detection
    "m24_video_dup" -> (Multimodal.videoDup _),
    // sensor-banding QC: stripes planted pre-encode, exact integer
    // column/row deviation folds, division-free verdict
    "m25_stripe_qc" -> (Multimodal.stripeQc _),
    // focus screen: integer Laplacian energy, injected 3-tap blur proof
    "m27_blur_qc" -> (Multimodal.blurQc _),
    // banded aHash near-dup through the codec path, planted-donor proof
    "m28_image_neardup" -> ((s, d) => Multimodal.imageNearDup(s, d)),
    // m30 IS the at-rest visual-leakage artifact (the d2/c3/c18 posture):
    // first toucher runs the real decode + band join + verification and
    // dumps; re-runs and the c35 ledger fold from parquet
    "m30_visual_decontam" -> ((s, d) => Multimodal.visualDecontamAtRest(s, d)),
    // per-scene sharpest-frame pick: m10 scenes x m27 focus kernel
    "m29_keyframe_select" -> (Multimodal.keyframeSelect _),
    // VAD-split SNR estimate: voiced/unvoiced mean frame energies, one
    // log10; injected noise floor drops injected clips ~7 dB
    "m26_audio_snr" -> (Multimodal.audioSnr _),
    "m6_modal_video" -> (Multimodal.modalVideo _),
    // m7 ingests REAL media FILES (engine-encoded .tif/.wav/.avi on disk)
    // through spark.read.format("binaryFile") + the real decoders — the
    // external-file boundary the m1-m6 in-kernel roundtrips don't cross
    "m7_modal_ingest" -> (Multimodal.modalIngest _),
    // perceptual image dedup: block-mean aHash over the really-decoded
    // pixels — keys on brightness structure, not bytes (the LAION step)
    "m8_image_phash" -> (Multimodal.imagePhash _),
    "e1_stream_hourly" -> (EventStreams.hourlyAggOnce _),
    "e2_stream_dedup" -> (EventStreams.dedupCountsOnce _),
    "e3_stream_enrich" -> (EventStreams.enrichedAggOnce _),
    // e4 exercises transformWithState's TimeMode.None path; its
    // single-batch ordering precondition is ASSERTED by the drive (exactly
    // one Update per user, or it fails loudly — see sessionizeTwsOnce).
    // Cross-batch/out-of-order arrival is e5's watermark-aware contract.
    "e4_stream_sessions" -> (EventStreams.sessionizeTwsOnce _),
    "e5_stream_sessions_wm" -> (EventStreams.sessionizeWmOnce _),
    "e6_stream_ivjoin" -> ((s, d) => EventStreams.intervalJoinOnce(s, d)),
    // e7's BOUNDED-replay harness injects one far-future sentinel event per
    // side to push the global watermark so left-outer null rows flush at
    // end-of-input. That sentinel is test-harness machinery, NOT part of
    // the operator: in an unbounded production pipeline the watermark
    // advances from live data and the sentinel does nothing — do not copy
    // it out of leftIntervalJoinOnce. See EventStreams.leftIntervalJoin.
    "e7_stream_leftjoin" -> ((s, d) => EventStreams.leftIntervalJoinOnce(s, d)),
    // e8 streams the DOCUMENTS table: content-hash dedup with bounded
    // state + quality filter + running corpus stats — the real-time form
    // of the d1/d7 batch dedup (see EventStreams.corpusIngestOnce)
    "e8_stream_corpus" -> ((s, d) => EventStreams.corpusIngestOnce(s, d)),
    // e9 is d8 lifted to a live feed: arriving documents sign themselves
    // row-locally (zero streaming state) and probe the corpus LSH index
    // at rest — near-dup admission control on an unbounded stream
    "e9_stream_neardup" -> ((s, d) => EventStreams.nearDupStreamOnce(s, d, 0.8)),
    // built-in session_window: the declarative sessionizer (vs e4/e5's
    // stateful-processor forms); append-mode flush via the e7 sentinel
    "e10_session_window" -> ((s, d) => EventStreams.sessionWindowOnce(s, d)),
    // curation as an ingest filter: row-local Gopher verdicts on the
    // stream, broadcast provenance enrich, domain-bounded report state
    "e11_quality_gate" -> ((s, d) => EventStreams.qualityGateOnce(s, d)),
    // overlapping 2h/1h sliding windows — every event in exactly two
    // windows; watermark-bounded state like e1
    "e12_stream_sliding" -> (EventStreams.slidingAggOnce _),
    // streaming rate anomaly: at-rest per-type profile broadcast into the
    // stream pre-agg; hourly counts emerge z-scored with e1's state bound
    "e13_stream_anomaly" -> (EventStreams.rateAnomalyOnce _),
    // streaming upkeep of the at-rest dedup index (the write side d7/e9
    // presuppose): foreachBatch anti-join + append, zero streaming state
    "e14_stream_index" -> (EventStreams.indexMaintainOnce _),
    "e15_dual_sink" -> (EventStreams.dualSinkOnce _),
    "e16_idempotent_sink" -> (EventStreams.idempotentSinkOnce _),
    "e17_stream_media" -> (Multimodal.mediaStreamOnce _),
    "e18_stream_asof" -> (EventStreams.asofEnrichOnce _),
    "e19_stream_approx_users" -> (EventStreams.approxUsersOnce _),
    "e20_stream_merge" -> (EventStreams.streamMergeOnce _),
    "e21_stream_quantiles" -> (EventStreams.windowQuantilesOnce _),
    "e22_stream_heartbeat" -> (EventStreams.heartbeatOnce _),
    // streaming top-k: the stream keeps only e1's windowed counters; rank
    // is served over the drained aggregate (not incrementally maintainable)
    "e23_stream_topk" -> ((s, d) => EventStreams.windowTopkOnce(s, d)),
    // PSI distribution drift: profile fitted at rest (e13 principle), the
    // stream keeps only per-(day,bin) counters; +80 shift every 7th day
    "e24_stream_psi" -> (EventStreams.psiDriftOnce _),
    // full-outer stream-stream interval join: both sides' unmatched rows
    // emit when the watermark proves no partner can arrive
    "e25_stream_fulljoin" -> ((s, d) => EventStreams.fullIntervalJoinOnce(s, d)),
    // per-user hourly cap via O(1) keyed state — first-cap-of-the-hour is
    // deterministic under the e22 single-batch ordering guard
    "e26_stream_ratelimit" -> (EventStreams.rateLimitOnce _),
    // watermark drop accounting: staged straggler replay vs batch recount
    "e27_late_audit" -> (EventStreams.lateAuditOnce _),
    // streaming upkeep of the vector index: per-batch delta assignment
    // against at-rest centroids, immutable partial censuses, one serving
    // fold — s39's streaming twin (the e9/e14 posture)
    "e28_stream_ivf" -> (EventStreams.streamIvfOnce _),
    // m30's streaming twin: newly landed image shards are screened against
    // the broadcast eval band index per micro-batch (decode only the
    // shard); oracle is the one-shot batch replay — cadence invisible
    "e29_stream_visual" -> ((s, d) => EventStreams.streamVisualScreenOnce(s, d)),
  )

  /** DuckDB-runnable oracle SQL; aggregates are exact-decimal then rounded,
    * timestamps presented as ms-truncated strings, so value hashes agree
    * cross-engine. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 3) AS sum_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 3) AS sum_base,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE), 3) AS sum_disc_price,
        | count(*) AS n
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join5" ->
      """SELECT n_name,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE), 3) AS revenue,
        | count(*) AS n
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY n_name""".stripMargin,
    "q03_semijoin" ->
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_antijoin" ->
      """SELECT p_brand, count(*) AS n_parts FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        |GROUP BY p_brand""".stripMargin,
    "q05_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, rn, run_qty FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber,
        |  row_number() OVER w AS rn,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 3) AS run_qty
        | FROM lineitem
        | WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |) s WHERE rn <= 3""".stripMargin,
    "q06_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q07_setops" ->
      """SELECT custkey FROM (
        | SELECT custkey FROM (
        |  SELECT custkey FROM (
        |   SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |   UNION
        |   SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O') u
        |  EXCEPT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P') e
        | INTERSECT
        | SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0) f""".stripMargin,
    "q08_rollup" ->
      """SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag, l_linestatus) AS gid,
        | count(*) AS n, round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 3) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q09_cube" ->
      """SELECT o_orderstatus, o_orderpriority, GROUPING(o_orderstatus, o_orderpriority) AS gid, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q10_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
        | count(DISTINCT l_partkey) AS n_parts, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q11_scalar" ->
      """SELECT p_partkey, upper(p_brand) AS ub, length(p_name) AS ln, substr(p_name, 1, 5) AS s5,
        | p_brand || '#' || p_type AS bt, round(p_retailprice * 1.1, 2) AS pr,
        | mod(p_size, 5) AS szmod, abs(p_size - 25) AS szabs
        |FROM part""".stripMargin,
    "q12_datefns" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n,
        | min(day(o_orderdate)) AS dmin, max(day(o_orderdate)) AS dmax
        |FROM orders GROUP BY year(o_orderdate), month(o_orderdate)""".stripMargin,
    "q13_rangejoin" ->
      """SELECT strftime(w.wstart, '%Y-%m-%d') AS wk, count(*) AS n,
        | round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 3) AS sv
        |FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-29', INTERVAL 7 DAY)) AS wstart) w
        |JOIN events e ON e.ts >= w.wstart AND e.ts < w.wstart + INTERVAL 7 DAY
        |GROUP BY strftime(w.wstart, '%Y-%m-%d')""".stripMargin,
    "q14_asof" ->
      """SELECT e.event_id, e.user_id,
        | strftime((SELECT max(s.ts) FROM events s
        |           WHERE s.event_type = 'signup' AND s.user_id = e.user_id AND s.ts <= e.ts),
        |          '%Y-%m-%d %H:%M:%S.%g') AS signup_ts
        |FROM events e WHERE e.event_type = 'error'""".stripMargin,
    "q15_sessionize" ->
      """SELECT user_id, CAST(sum(is_start) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        | SELECT user_id,
        |  CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800.0 THEN 1 ELSE 0 END AS is_start
        | FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |       FROM events) l) s
        |GROUP BY user_id""".stripMargin,
    "q16_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q17_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders, TRUE AS within_bound
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q18_salted_agg" ->
      """SELECT l_returnflag, round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 3) AS sum_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q19_having" ->
      """SELECT l_orderkey, round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 3) AS sum_qty,
        | count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey
        |HAVING round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 3) > 150.0""".stripMargin,
    "q20_corr_subquery" ->
      """SELECT l_partkey, count(*) AS n,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 3) AS sq
        |FROM lineitem o
        |WHERE l_quantity < (SELECT 0.4 * avg(i.l_quantity) FROM lineitem i
        |                    WHERE i.l_partkey = o.l_partkey)
        |GROUP BY l_partkey""".stripMargin,
    "q21_pivot" ->
      """SELECT c_mktsegment,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q22_setops_all" ->
      """SELECT o_custkey, count(*) AS multiplicity FROM (
        | SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') u
        | EXCEPT ALL
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'P') s
        |GROUP BY o_custkey""".stripMargin,
    "q23_window_analytic" ->
      """SELECT o_orderstatus, o_orderkey,
        | ntile(4) OVER w AS quartile,
        | lead(o_orderkey, 1) OVER w AS next_key,
        | first_value(o_orderkey) OVER w AS top_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
        |QUALIFY o_orderkey % 10 = 0""".stripMargin,
    "q24_json" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90""".stripMargin,
    "q25_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        | round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
        | round(quantile_cont(l_discount, 0.9), 4) AS p90_disc
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q26_approx_percentile" ->
      """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        | TRUE AS within_bound
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q27_range_frame" ->
      """SELECT event_id, user_id, count(*) OVER w AS n_1h,
        | round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 3) AS sv_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q29_latest_per_key" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) x
        |WHERE rn = 1""".stripMargin,
    "q31_gapfill" -> Relational.q31OracleSql,
    "q32_skew_report" -> Relational.q32OracleSql,
    "q33_incremental_mv" -> Relational.q33OracleSql,
    "q34_funnel" -> Relational.q34OracleSql,
    "q35_retention" -> Relational.q35OracleSql,
    "q36_dpp_join" -> Relational.q36OracleSql,
    "q37_scd2" -> Relational.q37OracleSql,
    "q38_observe" -> Relational.q38OracleSql,
    "q39_unpivot" -> Relational.q39OracleSql,
    "q40_mad_outliers" -> Relational.q40OracleSql,
    "q41_time_weighted" -> Relational.q41OracleSql,
    "q42_merge_upsert" -> Relational.q42OracleSql,
    "q43_time_travel" -> Relational.q43OracleSql,
    "q44_bom_rollup" -> Relational.q44OracleSql,
    "q45_runtime_filter" -> Relational.q45OracleSql,
    "q46_retraction_mv" -> Relational.q46OracleSql,
    "q47_weighted_median" -> Relational.q47OracleSql,
    "q48_variant" -> Relational.q48OracleSql,
    "q49_bitemporal" -> Relational.q49OracleSql,
    "q50_attribution" -> Relational.q50OracleSql,
    "q51_stats_histogram" -> Relational.q51OracleSql(),
    // q30 shares q28's oracle shape: bucketing, like salting, must be
    // invisible in the result — only the plan changes
    "q30_bucketed_join" ->
      """SELECT o_orderpriority,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE), 3) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q28_salted_join" ->
      """SELECT o_orderpriority,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE), 3) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "t5_array_fns" ->
      """SELECT doc_id,
        | list_sort(toks)[1] AS first_tok,
        | list_reverse_sort(toks)[1] AS last_tok,
        | list_contains(toks, 'the') AS has_the,
        | CAST(len(toks[1:3]) AS BIGINT) AS head3
        |FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents) s""".stripMargin,
    "a1_chunk_plan" -> ArrayOps.a1OracleSql,
    "a3_voxel_pipeline" -> ArrayOps.a3OracleSql,
    "a4_downsample" -> ArrayOps.a4OracleSql,
    "a5_chunk_table" -> ArrayOps.a5OracleSql,
    "a6_zarr_pipeline" -> ArrayOps.a6OracleSql,
    "a7_n5_pipeline" -> ArrayOps.a7OracleSql,
    "a8_zorder" -> ArrayOps.a8OracleSql,
    "a9_zarr3_pipeline" -> ArrayOps.a9OracleSql,
    "a10_zarr3_sharded" -> ArrayOps.a10OracleSql,
    "a11_tiff_stack" -> ArrayOps.a11OracleSql,
    "a12_convert_pipeline" -> ArrayOps.a12OracleSql,
    "a13_label_stats" -> ArrayOps.a13OracleSql,
    "a14_storage_report" -> ArrayOps.a14OracleSql,
    "a15_label_intensity" -> ArrayOps.a15OracleSql,
    "a16_connected_components" -> ArrayOps.a16OracleSql,
    "a17_dilate" -> ArrayOps.a17OracleSql,
    "a18_erode" -> ArrayOps.a18OracleSql,
    "a19_mip_audit" -> ArrayOps.a19OracleSql,
    "a20_contact_area" -> ArrayOps.a20OracleSql,
    "a21_percentiles" -> ArrayOps.a21OracleSql,
    "a22_mode_downsample" -> ArrayOps.a22OracleSql,
    "a23_roi_gather" -> ArrayOps.a23OracleSql,
    "a24_hist_equalize" -> ArrayOps.a24OracleSql,
    "a25_blosc_pipeline" -> ArrayOps.a25OracleSql,
    "a26_mip_select" -> ArrayOps.a26OracleSql,
    "a27_mip_project" -> ArrayOps.a27OracleSql,
    "a28_seg_contingency" -> ArrayOps.a28OracleSql,
    "a29_blur" -> ArrayOps.a29OracleSql,
    "a30_zonemap" -> ArrayOps.a30OracleSql,
    "a31_upsample" -> ArrayOps.a31OracleSql,
    "a32_multichannel" -> ArrayOps.a32OracleSql,
    "a33_chunk_dedup" -> ArrayOps.a33OracleSql,
    "a34_object_catalog" -> ArrayOps.a34OracleSql,
    "a35_mrc_volume" -> ArrayOps.a35OracleSql,
    "a36_otsu" -> ArrayOps.a36OracleSql,
    "a37_opening" -> ArrayOps.a37OracleSql,
    "a38_zprofile" -> ArrayOps.a38OracleSql,
    "a39_mesh_stats" -> ArrayOps.a39OracleSql,
    "a40_agglomerate" -> ArrayOps.a40OracleSql(),
    "a41_hist_match" -> ArrayOps.a41OracleSql,
    "a42_skeleton_stats" -> ArrayOps.a42OracleSql,
    "a43_version_diff" -> ArrayOps.a43OracleSql,
    "a44_annotations" -> ArrayOps.a44OracleSql,
    "a45_sql_ddl" -> ArrayOps.a5OracleSql, // same closed-form 2x2x2 grid of 32x32x4 chunks
    "a46_fixity_audit" -> ArrayOps.a46OracleSql,
    "a47_mip_repair" -> ArrayOps.a47OracleSql,
    "t3_langid" -> TextOps.langIdOracleSql,
    "t15_langid_eval" -> TextOps.langIdEvalOracleSql,
    "t6_bpe_tokens" -> TextOps.bpeTokensOracleSql,
    "t6b_bpe_encode" -> TextOps.bpeEncodeOracleSql,
    "t7_split" -> Corpus.splitAssignOracleSql(),
    "t8_packing" -> Corpus.packAssignmentsOracleSql(),
    "t14_chunking" -> Corpus.chunkWindowsOracleSql(),
    "c1_curation" -> Corpus.curationReportOracleSql(),
    "c2_mixture" -> Corpus.mixtureSampleOracleSql(),
    "t9_bm25" -> TextOps.bm25OracleSql(),
    "t10_repetition" -> TextOps.repetitionOracleSql,
    "t11_pii" -> TextOps.piiMaskOracleSql,
    "t12_unigram_lp" -> TextOps.unigramLogProbOracleSql,
    "t17_bigram_lp" -> TextOps.bigramLogProbOracleSql,
    "t18_zipf" -> TextOps.zipfFitOracleSql,
    "t19_entropy" -> TextOps.charEntropyOracleSql,
    "t20_readability" -> TextOps.readabilityOracleSql,
    "t21_novelty" -> TextOps.ngramNoveltyOracleSql(),
    "t22_heavy_hitters" -> TextOps.heavyHittersOracleSql(),
    "t23_code_detect" -> TextOps.codeDetectOracleSql,
    "t24_lang_consistency" -> TextOps.langConsistencyOracleSql,
    "t25_blocklist" -> TextOps.blocklistOracleSql,
    "t26_mojibake" -> TextOps.mojibakeOracleSql,
    "t27_boilerplate" -> TextOps.boilerplateOracleSql(),
    "t28_homoglyph" -> TextOps.homoglyphOracleSql,
    "t29_collocations" -> TextOps.collocationsOracleSql(),
    "t30_heaps" -> TextOps.heapsGrowthOracleSql,
    "t31_keywords" -> TextOps.keywordsOracleSql(),
    "t32_kneser_ney" -> TextOps.knBigramScoreOracleSql(),
    "t33_ppl_filter" -> TextOps.pplFilterOracleSql,
    "t34_luhn_screen" -> TextOps.luhnScreenOracleSql,
    "t35_citations" -> TextOps.citationDensityOracleSql,
    "t36_instructions" -> TextOps.instructionScreenOracleSql,
    "t37_c4_filters" -> TextOps.c4FiltersOracleSql,
    "t13_normalize" -> TextOps.normalizeTextOracleSql,
    "t13b_nfkc" -> TextOps.nfkcNormalizeOracleSql,
    "t16_gopher_rules" -> TextOps.gopherRulesOracleSql(),
    "c5_quota_sample" -> Corpus.quotaSampleOracleSql(),
    "c6_token_budget" -> Corpus.tokenBudgetSampleOracleSql(),
    "c7_temperature_mix" -> Corpus.temperatureMixOracleSql,
    "c8_domains" -> Corpus.domainCurationOracleSql,
    "c9_dedup_report" -> dedupReportOracle,
    "c10_snapshot_diff" -> Corpus.snapshotDiffOracleSql,
    "c11_importance" -> Corpus.importanceWeightsOracleSql(),
    "c12_length_hist" -> Corpus.lengthHistogramOracleSql(),
    "c13_partitioned_export" -> Corpus.partitionedExportOracleSql,
    "c14_jsonl_ingest" -> Corpus.jsonlIngestOracleSql,
    "c15_schema_evolution" -> Corpus.schemaEvolutionOracleSql,
    "c16_split_leakage" -> splitLeakageOracle,
    "c17_epoch_shuffle" -> Corpus.epochShuffleOracleSql(),
    "c18_fuzzy_decontam" -> Corpus.fuzzyDecontamOracleSql(),
    "c33_decontam_ledger" -> Corpus.decontamLedgerOracleSql(),
    "c34_release_export" -> releaseExportOracle,
    "c36_incr_export" -> incrExportOracle,
    "c37_release_fixity" -> releaseFixityOracle,
    "c35_decontam_ledger_mm" -> Corpus.decontamLedgerMmOracleSql(),
    "c19_nutrition_label" -> Corpus.nutritionLabelOracleSql,
    "c20_manifest_skip" -> Corpus.manifestSkipOracleSql,
    "c21_stratified_split" -> Corpus.stratifiedSplitOracleSql,
    "c22_cluster_reps" -> clusterRepsOracle,
    "c23_curriculum" -> Corpus.curriculumScheduleOracleSql,
    "c24_repetition" -> Corpus.repetitionBudgetOracleSql,
    "c25_quality_drift" -> Corpus.qualityDriftOracleSql(),
    "c26_epoch_mix" -> Corpus.epochAllocationOracleSql(),
    "c27_fertility" -> Corpus.tokenizerFertilityOracleSql,
    "c28_effective_mix" -> effectiveMixOracle,
    "c29_rater_agreement" -> Corpus.raterAgreementOracleSql,
    "c30_k_anonymity" -> Corpus.kAnonymityOracleSql(),
    "c31_sampling_shares" -> Corpus.samplingSharesOracleSql,
    "c32_semantic_decontam" -> Similarity.semanticDecontamOracleSql(),
    "t4_fingerprint" -> TextOps.fingerprintsOracleSql(),
    "c3_decontam" -> Corpus.decontaminateOracleSql(),
    "c4_report" -> Corpus.corpusReportOracleSql,
    "s6_domains" -> Similarity.kmeansDomainsOracleSql,
    "s4_ann_ivf" -> Similarity.annIvfOracleSql(),
    "s3_embed_dups" -> Similarity.embeddingDupOracleSql(0.2),
    "s2_ann_lsh" -> Similarity.annLshOracleSql(),
    "s5_sq8_topk" -> Similarity.sq8OracleSql(),
    "s7_pq_topk" -> Similarity.pqOracleSql(),
    "s8_ivfadc" -> Similarity.ivfAdcOracleSql(),
    "s15_ivf_refine" -> Similarity.ivfRefineOracleSql(),
    "s16_range_search" -> Similarity.rangeSearchOracleSql(),
    "s17_matryoshka" -> Similarity.matryoshkaEvalOracleSql(),
    "s18_filtered_ann" -> Similarity.filteredAnnOracleSql(),
    "s19_embedding_qc" -> Similarity.embeddingQcOracleSql,
    "s20_dim_stats" -> Similarity.dimStatsOracleSql,
    "s21_knn_graph" -> Similarity.knnGraphOracleSql(),
    "s22_ivf_balance" -> Similarity.ivfBalanceOracleSql(),
    "s23_whiten_qc" -> Similarity.whitenQcOracleSql,
    "s24_covariance" -> Similarity.covarianceOracleSql,
    "s25_pca_project" -> Similarity.pcaProjectOracleSql,
    "s26_sq8_error" -> Similarity.sq8ErrorOracleSql,
    "s27_hamming_topk" -> Similarity.hammingTopKOracleSql(),
    "s28_kmeans_parallel" -> Similarity.kmeansParallelInitOracleSql,
    "s29_rrf_fusion" -> Similarity.rrfFusionOracleSql(),
    "s30_triplet_mining" -> Similarity.tripletMiningOracleSql(),
    "s31_coverage_sample" -> Similarity.coverageSampleOracleSql(),
    "s32_nprobe_sweep" -> Similarity.nprobeSweepOracleSql(),
    "s33_nn_descent" -> Similarity.nnDescentOracleSql(),
    "s34_adaptive_nprobe" -> Similarity.adaptiveNprobeOracleSql(),
    "s35_ood_screen" -> Similarity.oodScreenOracleSql,
    "s36_label_prop" -> Similarity.labelPropOracleSql(),
    "s37_knn_confusion" -> Similarity.knnConfusionOracleSql(),
    "s38_residual_quant" -> Similarity.residualQuantizerOracleSql,
    "s39_ivf_delta" -> Similarity.ivfDeltaOracleSql,
    "s9_knn_label" -> Similarity.knnLabelVoteOracleSql(),
    "s10_class_centroids" -> Similarity.classCentroidsOracleSql,
    "s11_ann_recall" -> Similarity.annRecallEvalOracleSql(),
    "s12_sparse_topk" -> Similarity.sparseTfidfOracleSql(),
    "s13_rp_topk" -> Similarity.randomProjOracleSql(),
    "s14_mmr_rerank" -> Similarity.mmrOracleSql(),
    "d1_dedup_exact" ->
      "SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper FROM documents GROUP BY md5(text)",
    "d2_dedup_ngram" -> ngramJaccardOracle,
    "d3_dedup_minhash" -> ngramJaccardOracle, // LSH recall ≈ 1 at j≥0.8 (see Dedup scaladoc)
    "d4_dedup_simhash" -> simhashOracle,
    "d5_dedup_clusters" -> dupClusterOracle,
    "d6_span_dedup" -> Dedup.spanDedupOracleSql(),
    "d7_dedup_incremental" -> Dedup.incrementalDedupOracleSql,
    // exact delta × corpus Jaccard pairs (LSH recall ≈ 1 at j≥0.8, the d3
    // argument; only pairs straddling the split qualify)
    "d8_dedup_incr_near" -> deltaCorpusPairOracle,
    "d9_semdedup" -> Similarity.semDedupOracleSql(0.4),
    "d10_dup_sources" ->
      s"""WITH $ngramPairCtes,
         | src AS (SELECT doc_id, source FROM documents),
         | e AS (SELECT least(sa.source, sb.source) AS source_lo,
         |        greatest(sa.source, sb.source) AS source_hi, p.jac
         |       FROM jpairs p JOIN src sa ON p.a = sa.doc_id JOIN src sb ON p.b = sb.doc_id)
         |SELECT source_lo, source_hi, count(*) AS n_pairs,
         | round(CAST(sum(CAST(jac AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_jac
         |FROM e GROUP BY source_lo, source_hi""".stripMargin,
    "d11_pagerank" -> pageRankOracle,
    "d12_line_dedup" -> Dedup.lineDedupOracleSql,
    "d13_containment" -> containmentOracle,
    "d14_bloom_dedup" -> Dedup.bloomDedupOracleSql,
    "d15_url_canon" -> Dedup.urlCanonOracleSql,
    "d16_soft_dedup" -> softDedupOracle,
    "d17_bbit_minhash" -> bbitOracle,
    "d18_simhash_eval" -> simhashEvalOracle,
    "d19_fuzzy_match" -> Dedup.fuzzyMatchOracleSql,
    // incremental maintenance must be invisible: same oracle as d5
    "d20_incr_clusters" -> dupClusterOracle,
    "d21_lsh_tuning" -> lshTuneOracle,
    "d22_dup_spans" -> Dedup.dupSpansOracleSql(),
    "s1_cosine_topk" -> Similarity.cosineTopKOracleSql(),
    "t1_tokens" ->
      """SELECT doc_id, len(toks) AS n_tok, len(list_distinct(toks)) AS n_uniq,
        | round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks), 4) AS avg_len
        |FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents) s""".stripMargin,
    "t2_quality" -> TextOps.qualityOracleSql,
    "m1_modal_meta" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        | octet_length(encode(text)) AS byte_len
        |FROM documents""".stripMargin,
    "e1_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hr, event_type,
        | count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 3) AS sv
        |FROM events GROUP BY strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M'), event_type""".stripMargin,
    "e2_stream_dedup" ->
      "SELECT event_type, count(DISTINCT event_id) AS n FROM events GROUP BY event_type",
    "e3_stream_enrich" -> EventStreams.enrichedAggOracleSql,
    "e4_stream_sessions" -> EventStreams.sessionizeTwsOracleSql(),
    // the watermark-aware sessionizer must produce the same final states
    "e5_stream_sessions_wm" -> EventStreams.sessionizeTwsOracleSql(),
    "e6_stream_ivjoin" -> EventStreams.intervalJoinOracleSql(),
    "e7_stream_leftjoin" -> EventStreams.leftIntervalJoinOracleSql(),
    "e8_stream_corpus" -> EventStreams.corpusIngestOracleSql,
    "e9_stream_neardup" -> deltaCorpusPairOracle,
    "e10_session_window" -> EventStreams.sessionWindowOracleSql(),
    "e11_quality_gate" -> EventStreams.qualityGateOracleSql,
    "e12_stream_sliding" -> EventStreams.slidingAggOracleSql,
    "e13_stream_anomaly" -> EventStreams.rateAnomalyOracleSql,
    "e14_stream_index" -> EventStreams.indexMaintainOracleSql,
    "e15_dual_sink" -> EventStreams.dualSinkOracleSql,
    "e16_idempotent_sink" -> EventStreams.idempotentSinkOracleSql,
    "e17_stream_media" -> Multimodal.mediaStreamOracleSql,
    "e18_stream_asof" -> EventStreams.asofEnrichOracleSql,
    "e19_stream_approx_users" -> EventStreams.approxUsersOracleSql,
    "e20_stream_merge" -> EventStreams.streamMergeOracleSql,
    "e21_stream_quantiles" -> EventStreams.windowQuantilesOracleSql,
    "e22_stream_heartbeat" -> EventStreams.heartbeatOracleSql(),
    "e23_stream_topk" -> EventStreams.windowTopkOracleSql(),
    "e24_stream_psi" -> EventStreams.psiDriftOracleSql,
    "e25_stream_fulljoin" -> EventStreams.fullIntervalJoinOracleSql(),
    "e26_stream_ratelimit" -> EventStreams.rateLimitOracleSql(),
    "e27_late_audit" -> EventStreams.lateAuditOracleSql,
    "e28_stream_ivf" -> EventStreams.streamIvfOracleSql,
    "e29_stream_visual" -> Multimodal.visualDecontamOracleSql(),
    "m2_modal_features" -> Multimodal.modalFeaturesOracleSql,
    "m3_modal_resize" -> Multimodal.modalResizeOracleSql,
    "m4_modal_frames" -> Multimodal.modalFramesOracleSql,
    "m5_modal_audio" -> Multimodal.modalAudioOracleSql,
    "m9_modal_vad" -> Multimodal.modalVadOracleSql,
    "m10_scene_detect" -> Multimodal.modalScenesOracleSql,
    "m11_audio_zcr" -> Multimodal.modalZcrOracleSql,
    "m12_patchify" -> Multimodal.modalPatchesOracleSql,
    "m13_resample" -> Multimodal.modalResampleOracleSql,
    "m14_augment" -> Multimodal.modalAugmentOracleSql,
    "m15_silence_trim" -> Multimodal.modalTrimOracleSql,
    "m16_watermark" -> Multimodal.modalWatermarkOracleSql,
    "m17_metadata_strip" -> Multimodal.metadataStripOracleSql,
    "m18_loudness" -> Multimodal.loudnessNormalizeOracleSql(),
    "m19_exposure_qc" -> Multimodal.imageExposureQcOracleSql,
    "m20_pitch" -> Multimodal.pitchDetectOracleSql(),
    "m21_frame_dedup" -> Multimodal.frameDedupOracleSql,
    "m22_border_qc" -> Multimodal.imageBorderQcOracleSql,
    "m23_dc_offset" -> Multimodal.audioDcQcOracleSql,
    "m24_video_dup" -> Multimodal.videoDupOracleSql,
    "m25_stripe_qc" -> Multimodal.stripeQcOracleSql,
    "m27_blur_qc" -> Multimodal.blurQcOracleSql,
    "m28_image_neardup" -> Multimodal.imageNearDupOracleSql(),
    "m30_visual_decontam" -> Multimodal.visualDecontamOracleSql(),
    "m29_keyframe_select" -> Multimodal.keyframeSelectOracleSql,
    "m26_audio_snr" -> Multimodal.audioSnrOracleSql,
    "m6_modal_video" -> Multimodal.modalVideoOracleSql,
    "m7_modal_ingest" -> Multimodal.modalIngestOracleSql,
    "m8_image_phash" -> Multimodal.imagePhashOracleSql,
    "a2_bbox" ->
      """SELECT o_orderpriority, min(o_custkey) AS xlo, max(o_custkey) AS xhi,
        | min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS ylo,
        | max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS yhi
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
  )

  /** d11 oracle: PageRank power iteration UNROLLED to 10 steps over the
    * exact near-dup pair graph (jpairs — the d3 recall-1 argument).
    * Per-edge contributions round to DECIMAL(18,8) before the sum; damping
    * constants are interpolated as exact doubles (a bare SQL decimal
    * literal would be DECIMAL-typed and round differently). */
  private def pageRankOracle: String = {
    val damp = 0.85
    val iters = 10
    val steps = (1 to iters).map { i =>
      val prev = if (i == 1) "pr0" else s"pr${i - 1}"
      s"""pr$i AS (SELECT e.b AS node,
         | CAST(${1 - damp} AS DOUBLE) / (SELECT cnt FROM n) +
         | CAST($damp AS DOUBLE) * CAST(sum(CAST(p.pr / e.deg AS DECIMAL(18,8))) AS DOUBLE) AS pr
         |FROM ed e JOIN $prev p ON p.node = e.a GROUP BY e.b)""".stripMargin
    }.mkString(",\n")
    s"""WITH $ngramPairCtes,
       | sympairs AS (SELECT a, b FROM jpairs UNION ALL SELECT b AS a, a AS b FROM jpairs),
       | deg AS (SELECT a, count(*) AS deg FROM sympairs GROUP BY a),
       | ed AS (SELECT s.a, s.b, d.deg FROM sympairs s JOIN deg d USING (a)),
       | n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM deg),
       | pr0 AS (SELECT a AS node, CAST(1.0 AS DOUBLE) / (SELECT cnt FROM n) AS pr FROM deg),
       | $steps
       |SELECT node AS doc_id, round(pr, 6) AS pr FROM pr$iters""".stripMargin
  }

  /** c9 oracle: the d1 (md5 keeper), d3≡jpairs (near-dup docs) and d12
    * (line-cut) replays composed by doc-keyed joins and folded per
    * source — mirrors Corpus.dedupReport exactly. */
  private def dedupReportOracle: String =
    s"""WITH d12r AS (${graft.ops.Dedup.lineDedupOracleSql}),
       | near0 AS (WITH $ngramPairCtes
       |   SELECT a AS doc_id FROM jpairs UNION SELECT b AS doc_id FROM jpairs),
       | base AS (SELECT doc_id, source,
       |           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok,
       |           md5(text) AS h FROM documents),
       | keep AS (SELECT h, min(doc_id) AS keeper FROM base GROUP BY h)
       |SELECT b.source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(b.n_tok) AS BIGINT) AS n_tokens,
       |       CAST(sum(CASE WHEN b.doc_id != k.keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
       |       CAST(sum(CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       |       CAST(sum(d.n_lines - d.n_kept) AS BIGINT) AS n_lines_cut
       |FROM base b JOIN keep k USING (h)
       |LEFT JOIN near0 n ON n.doc_id = b.doc_id
       |JOIN d12r d ON d.doc_id = b.doc_id
       |GROUP BY b.source""".stripMargin

  /** CTE chain producing the exact n-gram Jaccard near-dup pairs
    * (`jpairs(a, b, jac)` at threshold 0.8) — shared by the pair oracles and
    * the clustering oracle below. */
  private val ngramPairCtes: String =
    """t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      | t3 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
      | sh0 AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN range(1, len(toks) - 1)]) AS s FROM t3),
      | sh AS (SELECT DISTINCT doc_id, s FROM sh0),
      | sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      | ipairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      | jpairs AS (SELECT p.a, p.b, round(CAST(p.inter AS DOUBLE) / (za.sz + zb.sz - p.inter), 4) AS jac
      |            FROM ipairs p JOIN sizes za ON p.a = za.doc_id JOIN sizes zb ON p.b = zb.doc_id
      |            WHERE round(CAST(p.inter AS DOUBLE) / (za.sz + zb.sz - p.inter), 4) >= 0.8)""".stripMargin

  /** Shared oracle for exact n-gram Jaccard and MinHash-LSH dedup (the LSH
    * path verifies candidates exactly and has ≈1 recall at the threshold). */
  private val ngramJaccardOracle: String =
    s"WITH $ngramPairCtes\nSELECT a, b, jac FROM jpairs"

  /** Release-export oracle (c34): every stage replayed from base tables —
    * Gopher verdicts (the t16 oracle, nested), the exact pair relation
    * ([[ngramPairCtes]] — DuckDB replays what Spark reads at rest), the
    * c33 ledger (nested), the t8 packing window over the survivors, and
    * the one-row attrition attach. All counts cast to BIGINT (DuckDB sums
    * integers into HUGEINT). */
  /** The shared WITH-body of the release-pipeline oracles: the exact pair
    * relation, the nested gopher + ledger replays, and the staged
    * relation (every training doc with the stage that claims it) — c34
    * packs it whole, c36 splits it standing/delta. */
  private val releaseStagedCtes: String =
    s"""$ngramPairCtes,
       | q AS (SELECT doc_id, keep FROM (${TextOps.gopherRulesOracleSql()}) gq),
       | led AS (SELECT doc_id, verdict FROM (${Corpus.decontamLedgerOracleSql()}) lq),
       | dd AS (SELECT DISTINCT b AS doc_id FROM jpairs WHERE a % 97 <> 0 AND b % 97 <> 0),
       | staged AS (SELECT d.doc_id, d.source,
       |    CAST(len(string_split_regex(d.text, '\\s+')) AS BIGINT) AS n_tok,
       |    CASE WHEN NOT q.keep THEN 'quality'
       |         WHEN dd.doc_id IS NOT NULL THEN 'dup'
       |         WHEN led.verdict <> 'keep' THEN 'decontam'
       |         ELSE 'pack' END AS stage
       |   FROM documents d JOIN q USING (doc_id) JOIN led USING (doc_id)
       |   LEFT JOIN dd ON dd.doc_id = d.doc_id
       |   WHERE d.doc_id % 97 <> 0),
       | att AS (SELECT CAST(count(*) AS BIGINT) AS docs_in,
       |    CAST(sum(CASE WHEN stage = 'quality' THEN 1 ELSE 0 END) AS BIGINT) AS drop_quality,
       |    CAST(sum(CASE WHEN stage = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS drop_dup,
       |    CAST(sum(CASE WHEN stage = 'decontam' THEN 1 ELSE 0 END) AS BIGINT) AS drop_decontam,
       |    CAST(sum(CASE WHEN stage = 'pack' THEN 1 ELSE 0 END) AS BIGINT) AS docs_packed
       |   FROM staged)""".stripMargin

  private val releaseExportOracle: String =
    s"""WITH $releaseStagedCtes,
       | offs AS (SELECT source, doc_id, n_tok,
       |    COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |   FROM staged WHERE stage = 'pack'),
       | packs AS (SELECT source, CAST(off // 512 AS BIGINT) AS pack_id,
       |    CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_sum
       |   FROM offs GROUP BY 1, 2)
       |SELECT p.source, p.pack_id, p.n_docs, p.tok_sum,
       | a.docs_in, a.drop_quality, a.drop_dup, a.drop_decontam, a.docs_packed
       |FROM packs p, att a""".stripMargin

  /** c36 oracle: the same staged relation split standing/delta (the
    * attrition totals aggregate the WHOLE staged relation — staging
    * commutes with the shard split, so combined counters ≡ c34's), the
    * standing packs windowed as usual, the delta packs windowed within
    * the delta and OFFSET by each source's closed-pack count (append-only
    * packing: a shard opens a fresh pack; a source first seen in the
    * delta starts at 0). */
  /** c37 oracle: pack manifest replayed from base tables; the drift
    * verdict is the closed-form injection rule (pack_id % 3 == 1 — the
    * a46 convention: the ENGINE must rediscover exactly this set from
    * real digest comparison over the shipped artifact). */
  private val releaseFixityOracle: String =
    s"""WITH $releaseStagedCtes,
       | offs AS (SELECT source, doc_id, n_tok,
       |    COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |   FROM staged WHERE stage = 'pack'),
       | asg AS (SELECT source, CAST(off // 512 AS BIGINT) AS pack_id, doc_id, n_tok FROM offs),
       | packs AS (SELECT source, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS tok_sum FROM asg GROUP BY 1, 2)
       |SELECT source, pack_id, n_docs, tok_sum, (pack_id % 3 = 1) AS drifted
       |FROM packs""".stripMargin

  private val incrExportOracle: String =
    s"""WITH $releaseStagedCtes,
       | soffs AS (SELECT source, doc_id, n_tok,
       |    COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |   FROM staged WHERE stage = 'pack' AND doc_id % ${Dedup.DeltaMod} <> 0),
       | sp AS (SELECT source, CAST(off // 512 AS BIGINT) AS pack_id,
       |    CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_sum
       |   FROM soffs GROUP BY 1, 2),
       | bs AS (SELECT source, max(pack_id) + 1 AS base_packs FROM sp GROUP BY source),
       | doffs AS (SELECT source, doc_id, n_tok,
       |    COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |   FROM staged WHERE stage = 'pack' AND doc_id % ${Dedup.DeltaMod} = 0),
       | dpo AS (SELECT d.source,
       |    COALESCE(b.base_packs, 0) + (d.off // 512) AS pack_id, d.n_tok
       |   FROM doffs d LEFT JOIN bs b USING (source)),
       | dp AS (SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
       |    CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_sum
       |   FROM dpo GROUP BY 1, 2),
       | allp AS (SELECT source, pack_id, n_docs, tok_sum, false AS from_delta FROM sp
       |   UNION ALL SELECT source, pack_id, n_docs, tok_sum, true FROM dp)
       |SELECT p.source, p.pack_id, p.n_docs, p.tok_sum, p.from_delta,
       | a.docs_in, a.drop_quality, a.drop_dup, a.drop_decontam, a.docs_packed
       |FROM allp p, att a""".stripMargin

  /** The t7 split label over an arbitrary id expression (DuckDB side of
    * `Corpus.splitOf`). */
  private def duckSplitOf(id: String): String =
    s"""CASE WHEN CAST(CAST('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 4) AS INTEGER) % 100 AS BIGINT) < 80 THEN 'train'
       |      WHEN CAST(CAST('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 4) AS INTEGER) % 100 AS BIGINT) < 90 THEN 'val'
       |      ELSE 'test' END""".stripMargin

  /** Cross-split leakage oracle (c16): the d2/d3 exact pair relation with
    * both endpoints' split labels re-derived by the same md5 arithmetic,
    * folded to the ordered (split, split) contamination matrix. */
  private val splitLeakageOracle: String =
    s"""WITH $ngramPairCtes,
       | sp AS (SELECT a, b, ${duckSplitOf("a").replace("\n", "\n   ")} AS sa,
       |         ${duckSplitOf("b").replace("\n", "\n   ")} AS sb
       |        FROM jpairs),
       | o AS (SELECT least(sa, sb) AS split_lo, greatest(sa, sb) AS split_hi,
       |        CASE WHEN sa <= sb THEN a ELSE b END AS doc_lo,
       |        CASE WHEN sa <= sb THEN b ELSE a END AS doc_hi FROM sp)
       |SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs,
       | CAST(count(DISTINCT doc_lo) AS BIGINT) AS n_docs_lo,
       | CAST(count(DISTINCT doc_hi) AS BIGINT) AS n_docs_hi
       |FROM o GROUP BY 1, 2""".stripMargin

  /** Containment oracle (d13): the same quote-augmented corpus (leading
    * ⌈3n/10⌉ tokens of every QuoteMod-th document as a derived doc), the
    * same distinct 3-gram shingles, and the asymmetric overlap
    * |A∩B| / min(|A|,|B|) — all-pairs in SQL, prefix-filtered in the
    * engine. */
  private val containmentOracle: String =
    s"""WITH t0 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${Dedup.QuoteIdOffset} AS doc_id,
       |         array_to_string(toks[1:(3*len(toks)+9)//10], ' ') AS text
       |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents)
       |  WHERE doc_id % ${Dedup.QuoteMod} = 0 AND len(toks) >= 10),
       | t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM t0),
       | t3 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
       | sh0 AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN range(1, len(toks) - 1)]) AS s FROM t3),
       | sh AS (SELECT DISTINCT doc_id, s FROM sh0),
       | sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       | ipairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
       |            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       | cpairs AS (SELECT p.a, p.b,
       |             round(CAST(p.inter AS DOUBLE) / least(za.sz, zb.sz), 4) AS cont
       |            FROM ipairs p JOIN sizes za ON p.a = za.doc_id JOIN sizes zb ON p.b = zb.doc_id)
       |SELECT a, b, cont, b >= ${Dedup.QuoteIdOffset} AS is_quote
       |FROM cpairs WHERE cont >= 0.9""".stripMargin

  /** Exact delta × corpus Jaccard pairs (LSH recall ≈ 1 at j≥0.8, the d3
    * argument; only pairs straddling the split qualify). Shared by d8
    * (batch incremental) and e9 (streaming) — the two are the SAME
    * relation computed through different execution engines, which is
    * exactly the claim the shared oracle enforces. */
  private val deltaCorpusPairOracle: String =
    s"""WITH $ngramPairCtes
       |SELECT CASE WHEN a % ${Dedup.DeltaMod} = 0 THEN a ELSE b END AS delta_id,
       |       CASE WHEN a % ${Dedup.DeltaMod} = 0 THEN b ELSE a END AS corpus_id, jac
       |FROM jpairs
       |WHERE (a % ${Dedup.DeltaMod} = 0) <> (b % ${Dedup.DeltaMod} = 0)""".stripMargin

  /** SimHash oracle: the same distinct 3-gram shingles, the md5-prefix
    * 60-bit hash, and the 64 bit-vote sums replayed in DuckDB (bits 60-63
    * vote all −1 on both sides and emit 0). */
  private val simhashOracle: String = {
    val sums = (0 until 64).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(", ")
    val bits = (63 to 0 by -1).map(j => s"CASE WHEN s$j > 0 THEN '1' ELSE '0' END").mkString(" || ")
    s"""WITH $ngramPairCtes,
       | h AS (SELECT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h FROM sh),
       | sums AS (SELECT doc_id, $sums FROM h GROUP BY doc_id)
       |SELECT doc_id, $bits AS simhash FROM sums""".stripMargin
  }

  /** c28 oracle: the d16 soft-dedup weights (nested as a subquery — its
    * recursive closure stays self-contained), the t2 quality fold, and the
    * c26 allocator over exact-decimal EFFECTIVE masses. */
  private def effectiveMixOracle: String =
    s"""WITH sd AS (SELECT doc_id, weight FROM (
       |${softDedupOracle.replace("\n", "\n   ")}) sdq),
       | q2 AS (SELECT doc_id, quality
       |        FROM (${graft.ops.TextOps.qualityOracleSql.replace("\n", "\n      ")}) qq),
       | s AS (SELECT d.source, len(string_split_regex(d.text, '\\s+')) AS n_tok,
       |        sd.weight, q2.quality
       |       FROM documents d JOIN sd USING (doc_id) JOIN q2 USING (doc_id)),
       | a AS (SELECT source, count(*) AS n_docs, sum(n_tok) AS uniq_tok,
       |        sum(CAST(weight AS DECIMAL(18,4)) * n_tok) AS eff_tok,
       |        round(CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mq
       |       FROM s GROUP BY source),
       | tot AS (SELECT sum(eff_tok) * 2 AS b FROM a),
       | u AS (SELECT a.source, a.eff_tok, a.mq, r.k FROM a, range(1, 5) r(k)),
       | w AS (SELECT source,
       |        sum(eff_tok) OVER (ORDER BY k, mq DESC, source) AS run FROM u),
       | kept AS (SELECT source, count(*) AS epochs
       |          FROM w, tot WHERE run <= tot.b GROUP BY source)
       |SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs,
       | CAST(a.uniq_tok AS BIGINT) AS uniq_tok,
       | round(CAST(a.eff_tok AS DOUBLE), 2) AS eff_tok, a.mq,
       | CAST(coalesce(k.epochs, 0) AS BIGINT) AS epochs,
       | round(CAST(coalesce(k.epochs, 0) * a.eff_tok AS DOUBLE), 2) AS served_eff
       |FROM a LEFT JOIN kept k USING (source)""".stripMargin

  /** d21 oracle: band keys replayed VERBATIM from the dumped long-form
    * signature artifact (raw r-value tuples, `string_agg` in i order ≡
    * Spark's column-order `concat_ws`), exact truth from [[ngramPairCtes]],
    * and the theoretical design-point literals shared through
    * [[Dedup.lshTheoRecall]] so both engines carry the identical constant. */
  private def lshTuneOracle: String = {
    val cfgVals = Dedup.LshTuneConfigs.map { case (b, r) => s"($b, $r)" }.mkString(", ")
    val theoVals = Dedup.LshTuneConfigs
      .map { case (b, r) => s"($b, $r, ${Dedup.lshTheoRecall(b, r)})" }.mkString(", ")
    s"""WITH $ngramPairCtes,
       | tp AS (SELECT a, b FROM jpairs),
       | nt AS (SELECT count(*) AS n_true FROM tp),
       | sigs AS (SELECT doc_id, i, m FROM read_parquet('${Dedup.TuneSigDump}/*.parquet')),
       | cfg AS (SELECT * FROM (VALUES $cfgVals) c(cfg_b, cfg_r)),
       | bk AS (SELECT c.cfg_b, c.cfg_r, s.doc_id, CAST(s.i // c.cfg_r AS INT) AS band,
       |         string_agg(CAST(s.m AS VARCHAR), '_' ORDER BY s.i) AS k
       |        FROM sigs s JOIN cfg c ON s.i < c.cfg_b * c.cfg_r
       |        GROUP BY 1, 2, 3, 4),
       | cand AS (SELECT DISTINCT x.cfg_b, x.cfg_r, x.doc_id AS a, y.doc_id AS b
       |          FROM bk x JOIN bk y ON x.cfg_b = y.cfg_b AND x.cfg_r = y.cfg_r
       |           AND x.band = y.band AND x.k = y.k AND x.doc_id < y.doc_id),
       | nc AS (SELECT cfg_b, cfg_r, count(*) AS n_cand FROM cand GROUP BY 1, 2),
       | nf AS (SELECT c.cfg_b, c.cfg_r, count(*) AS n_found
       |        FROM cand c JOIN tp ON tp.a = c.a AND tp.b = c.b GROUP BY 1, 2),
       | th AS (SELECT * FROM (VALUES $theoVals) t(cfg_b, cfg_r, theo_recall))
       |SELECT CAST(nc.cfg_b AS INT) AS b, CAST(nc.cfg_r AS INT) AS r,
       | CAST(nc.n_cand AS BIGINT) AS n_cand,
       | CAST(coalesce(nf.n_found, 0) AS BIGINT) AS n_found,
       | CAST(nt.n_true AS BIGINT) AS n_true,
       | round(CAST(coalesce(nf.n_found, 0) AS DOUBLE) / nt.n_true, 4) AS recall,
       | round(CAST(coalesce(nf.n_found, 0) AS DOUBLE) / nc.n_cand, 4) AS prec,
       | th.theo_recall
       |FROM nc LEFT JOIN nf ON nf.cfg_b = nc.cfg_b AND nf.cfg_r = nc.cfg_r
       | JOIN th ON th.cfg_b = nc.cfg_b AND th.cfg_r = nc.cfg_r, nt""".stripMargin
  }

  /** Clustering oracle: transitive closure of the near-dup pair graph via a
    * recursive CTE; cluster = min reachable doc_id (symmetric edges make
    * each vertex reach itself at depth 2, so min(v) covers the self case —
    * least(u, …) keeps it explicit). */
  private val dupClusterOracle: String =
    s"""WITH RECURSIVE $ngramPairCtes,
       | edges AS (SELECT a AS u, b AS v FROM jpairs UNION SELECT b, a FROM jpairs),
       | reach(u, v) AS (SELECT u, v FROM edges
       |                 UNION
       |                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
       |SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u""".stripMargin

  /** SimHash calibration oracle (d18): the d4 bit votes folded into four
    * 16-bit band values, band-blocked candidates, XOR+popcount Hamming,
    * scored per threshold against the shared jpairs relation. */
  private val simhashEvalOracle: String = {
    val sums = (0 until 64).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(", ")
    val bandExprs = (0 until 4).map { b =>
      (16 * b until 16 * b + 16).map(j =>
        s"(CASE WHEN s$j > 0 THEN ${1L << (j - 16 * b)} ELSE 0 END)").mkString(" + ") +
        s" AS band$b"
    }.mkString(",\n       |          ")
    s"""WITH $ngramPairCtes,
       | h AS (SELECT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h FROM sh),
       | sums AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
       | bands AS (SELECT doc_id,
       |          $bandExprs
       |         FROM sums),
       | br AS (SELECT doc_id, u.bi AS bi, u.bv AS bv FROM bands,
       |         unnest([{'bi': 0, 'bv': band0}, {'bi': 1, 'bv': band1},
       |                 {'bi': 2, 'bv': band2}, {'bi': 3, 'bv': band3}]) AS t(u)),
       | cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |          FROM br x JOIN br y ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id),
       | ham AS (SELECT c.a, c.b,
       |          bit_count(xor(x.band0, y.band0)) + bit_count(xor(x.band1, y.band1)) +
       |          bit_count(xor(x.band2, y.band2)) + bit_count(xor(x.band3, y.band3)) AS hd
       |         FROM cand c JOIN bands x ON x.doc_id = c.a JOIN bands y ON y.doc_id = c.b),
       | taus AS (SELECT unnest(range(0, 4)) AS tau),
       | ex AS (SELECT a, b FROM jpairs),
       | nex AS (SELECT count(*) AS n FROM ex),
       | pred AS (SELECT t.tau, count(*) AS n_pred,
       |           sum(CASE WHEN ex.a IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
       |          FROM taus t JOIN ham h ON h.hd <= t.tau
       |          LEFT JOIN ex ON ex.a = h.a AND ex.b = h.b
       |          GROUP BY t.tau)
       |SELECT CAST(t.tau AS BIGINT) AS tau,
       | CAST(coalesce(p.n_pred, 0) AS BIGINT) AS n_pred,
       | CAST(nex.n AS BIGINT) AS n_exact,
       | CAST(coalesce(p.n_hit, 0) AS BIGINT) AS n_hit,
       | CASE WHEN coalesce(p.n_pred, 0) > 0
       |      THEN round(CAST(coalesce(p.n_hit, 0) AS DOUBLE) / coalesce(p.n_pred, 0), 4)
       |      ELSE 0.0 END AS precision,
       | round(CAST(coalesce(p.n_hit, 0) AS DOUBLE) / nex.n, 4) AS recall
       |FROM taus t LEFT JOIN pred p ON p.tau = t.tau, nex""".stripMargin
  }

  /** b-bit MinHash oracle (d17): exact-Jaccard pairs from the shared CTE
    * chain, estimates replayed from the dumped signature artifact (read at
    * dump time, same-JVM — the centroid-dump convention). */
  private def bbitOracle: String =
    s"""WITH $ngramPairCtes,
       | sg AS (SELECT doc_id, i, m FROM read_parquet('${Dedup.BbitSigDump}/*.parquet')),
       | est AS (SELECT p.a, p.b, p.jac,
       |          sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) AS n_full,
       |          sum(CASE WHEN x.m % 4 = y.m % 4 THEN 1 ELSE 0 END) AS n_bbit
       |         FROM jpairs p
       |         JOIN sg x ON x.doc_id = p.a
       |         JOIN sg y ON y.doc_id = p.b AND y.i = x.i
       |         GROUP BY p.a, p.b, p.jac)
       |SELECT a, b, jac,
       | round(CAST(n_full AS DOUBLE) / ${Dedup.NumHashes}, 4) AS est_full,
       | round(CAST(4 * n_bbit - ${Dedup.NumHashes} AS DOUBLE) / ${Dedup.NumHashes * 3}, 4) AS est_bbit
       |FROM est""".stripMargin

  /** Soft-dedup oracle (d16): the d1 exact-group fold, the d5 recursive
    * closure with cluster sizes, and the same max-multiplicity weight. */
  private val softDedupOracle: String =
    s"""WITH RECURSIVE $ngramPairCtes,
       | edges AS (SELECT a AS u, b AS v FROM jpairs UNION SELECT b, a FROM jpairs),
       | reach(u, v) AS (SELECT u, v FROM edges
       |                 UNION
       |                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       | cl AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u),
       | cs AS (SELECT cluster, count(*) AS n_cluster FROM cl GROUP BY cluster),
       | b AS (SELECT doc_id, md5(text) AS h FROM documents),
       | ex AS (SELECT h, count(*) AS n_exact FROM b GROUP BY h),
       | j AS (SELECT b.doc_id, ex.n_exact, coalesce(c2.n_cluster, 1) AS n_cluster
       |       FROM b JOIN ex USING (h)
       |       LEFT JOIN (SELECT cl.doc_id, cs.n_cluster FROM cl JOIN cs USING (cluster)) c2
       |         USING (doc_id))
       |SELECT doc_id, CAST(n_exact AS BIGINT) AS n_exact,
       | CAST(n_cluster AS BIGINT) AS n_cluster,
       | CAST(greatest(n_exact, n_cluster) AS BIGINT) AS eff,
       | round(CAST(1.0 AS DOUBLE) / greatest(n_exact, n_cluster), 4) AS weight
       |FROM j""".stripMargin

  /** Cluster-representative oracle (c22): the d5 closure, the t2 quality
    * relation, and one window electing the highest-quality member per
    * cluster (ties → lowest doc_id). */
  private val clusterRepsOracle: String =
    s"""WITH RECURSIVE $ngramPairCtes,
       | edges AS (SELECT a AS u, b AS v FROM jpairs UNION SELECT b, a FROM jpairs),
       | reach(u, v) AS (SELECT u, v FROM edges
       |                 UNION
       |                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       | cl AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u),
       | q AS (SELECT doc_id, quality FROM (${TextOps.qualityOracleSql.replace("\n", "\n      ")}) qq)
       |SELECT cl.doc_id, cl.cluster, q.quality,
       | (row_number() OVER (PARTITION BY cl.cluster ORDER BY q.quality DESC, cl.doc_id) = 1) AS keep
       |FROM cl JOIN q ON cl.doc_id = q.doc_id""".stripMargin
}
