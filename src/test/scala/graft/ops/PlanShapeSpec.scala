package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.testutil.SparkSuite

/** Plan-shape regression guards for the structural properties the engine
  * relies on at scale: filter pushdown reaching the parquet scan, dimension
  * joins broadcast, top-k planned as TakeOrderedAndProject, window top-k
  * using WindowGroupLimit, and no accidental cartesian products anywhere in
  * the driver query set. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: filter and column pruning reach the parquet scan") {
    val p = plan("q01_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    assert(!p.contains("l_comment"), "pruned column leaked into the scan")
  }

  test("q02: dimension joins broadcast; no shuffle of the small sides") {
    val p = plan("q02_join5")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q06: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q06_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("s2: ranked filter pushes through the window as WindowGroupLimit") {
    val p = plan("s2_ann_lsh")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("c5: quota rank-filter pushes through the window as WindowGroupLimit") {
    val p = plan("c5_quota_sample")
    assert(p.contains("WindowGroupLimit"), p)
  }

  // ---- executed-plan scan counts (AQE ON — the driver/Bench default) ----
  //
  // Multi-consumer operators must not re-execute their heavy input pipeline
  // per consumer. Static ReuseExchange does NOT survive AQE (r4 finding: d2's
  // executed adaptive plan ran 8 FileScans where the static plan showed 1),
  // so each op materializes its shared intermediates and these probes pin the
  // scan count Spark ACTUALLY executed, eager checkpoints included.

  private def scansOf(table: String, name: String): Int = {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "scan-count probes must run under AQE, the driver/Bench default")
    graft.testutil.PlanProbe.totalFileScans(spark, table) {
      graft.SparkEntry.queries(name)(spark, dir).collect()
    }
  }

  test("d19: candidate blocking joins on the 8-byte variant hash, not the variant string (r14)") {
    // the SymSpell blocking join runs eagerly under fuzzyMatch's
    // materialize, so the gated query's own plan never shows it — pin the
    // candidate relation directly: the exchange partitions on the LONG
    // xxhash64(variant), and the exact variant equality is re-derived
    // row-locally after the join (no ~18-char variant column rides the
    // shuffle; n_cand semantics are preserved by the string re-check)
    val p = graft.ops.Dedup.fuzzyCandidates(Tables.t(spark, dir, "customer"))
      .queryExecution.executedPlan.toString
    // the 8-byte hash is among the equi-join keys…
    assert("vh#\\d+L\\], Inner".r.findFirstIn(p).isDefined
      || "vh#\\d+L\\],\\s".r.findFirstIn(p).isDefined, p.take(3000))
    // …alongside the exact variant equality, which Catalyst extracts into
    // the keys from the post-join filter (recomputed from (string,
    // position) — bit-identical candidate set, no collision can add one)
    assert(p.contains("CASE WHEN"), p.take(3000))
    // and no materialized variant column rides the exploded relations —
    // each side's rows carry the 4-byte deletion position instead
    assert(!p.contains("AS v#"), p.take(3000))
    assert("Generate explode\\(sequence".r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("d2: builds the at-rest pair registry in ONE documents scan; warmed consumers scan ZERO") {
    // first toucher executes the exact PPJoin (one materialized shingle
    // pipeline = one scan) and dumps the relation; afterwards every
    // consumer of the ground truth reads parquet — the corpus is never
    // re-scanned (r11: nearDupPairsAtRest)
    graft.ops.Dedup.resetPairRegistryForTests()
    assert(scansOf("documents", "d2_dedup_ngram") == 1)
    assert(scansOf("documents", "d2_dedup_ngram") == 0)
  }

  test("d3: cold fits the signature registry in ONE scan; warmed pair serving scans ZERO") {
    // r13 opt: d3 serves pairs from the at-rest corpus MinHash artifact
    // (the d17/d21 registry) — the first toucher fits signatures in one
    // fused-aggregation documents scan and dumps; warmed, bands +
    // candidate join + exact verify all read the signature parquet
    graft.ops.Dedup.sigReg.reset()
    assert(scansOf("documents", "d3_dedup_minhash") == 1)
    assert(scansOf("documents", "d3_dedup_minhash") == 0)
  }

  test("d5: warmed, clustering runs at pair grain — zero documents scans") {
    // the CC rounds iterate over the at-rest pair relation; the corpus
    // text never re-enters (r11 registry — was 1 scan per run before)
    graft.SparkEntry.queries("d2_dedup_ngram")(spark, dir).collect() // warm registry
    assert(scansOf("documents", "d5_dedup_clusters") == 0)
  }

  test("s2: four scans of embeddings under AQE (bucketing materialized)") {
    // 1 full scan in the materialized bucketing pass + 2 vec_id<10
    // pushdown-filtered query-side scans + 1 full scan in the candidate
    // rerank join; a regression of the materialization shows up as 5+
    assert(scansOf("embeddings", "s2_ann_lsh") == 4)
  }

  test("s3: two scans of embeddings under AQE (bucketing materialized)") {
    // 1 full scan in the materialized bucketing pass + 1 for the rerank:
    // both pair-side joins shuffle the same (vec_id, embedding) scan by
    // vec_id, so their exchanges canonicalize identically and AQE's runtime
    // stage-matching reuses the stage (hot-bucket agg and both self-join
    // sides read the checkpoint, not parquet)
    assert(scansOf("embeddings", "s3_embed_dups") == 2)
  }

  test("t14: chunking is one exchange-free whole-stage-codegen pass") {
    // the context-window fan-out must stay a generator inside ONE codegen
    // span — a shuffle or a fallen-out-of-codegen higher-order function
    // here would serialize the token arrays for no reason
    val p = plan("t14_chunking")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate") && p.contains("*(1)"), p)
  }

  test("d7: one scan of documents — the standing corpus enters via the at-rest hash index") {
    // first call may build the index (one extra scan, ingest-path work);
    // warmed, the incremental query hashes ONLY the delta
    graft.SparkEntry.queries("d7_dedup_incremental")(spark, dir).collect()
    assert(scansOf("documents", "d7_dedup_incremental") == 1)
  }

  test("m7: media files enter through a binaryFile FileScan; decode is shuffle-free") {
    // the ingestion-path proof: payloads cross the FILE boundary via the
    // binaryFile source (not synthesized in the kernel), and the per-file
    // decode plans with no Exchange — one row per file, partition-parallel
    val p = plan("m7_modal_ingest")
    assert(p.contains("binaryFile"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("s4: three scans of embeddings under AQE (sample materialized once; index + query passes)") {
    // 1 scan materializing the capped train sample (every Lloyd iteration
    // of the k-means fit then reads the checkpoint, NOT parquet) + the
    // executed query's 2: full corpus assign pass and the vec_id<10
    // pushdown-filtered query side. A regression of cappedTrainSample's
    // materialization shows up as one scan PER KMEANS ITERATION
    assert(scansOf("embeddings", "s4_ann_ivf") == 3)
  }

  test("s8: three scans of embeddings under AQE (shared sample; route+compress is one pass)") {
    // same decomposition as s4 — and the coarse fit plus all m=8 codebook
    // fits share the ONE materialized sample, so the 9 concurrent fits
    // contribute zero parquet scans; route+PQ-encode is a single map pass
    // over the corpus scan
    assert(scansOf("embeddings", "s8_ivfadc") == 3)
  }

  test("d9: three scans of embeddings under AQE (sample; assign pass; shared pair-attach)") {
    // 1 scan materializing the capped k-means train sample + 1 for the
    // assignment pass (the slim (id, cluster) relation is then
    // materialized, so the cluster self-join adds NO scans) + 1 for the
    // pair-attach: both embedding-attach joins canonicalize to the same
    // scan subtree, so the exchange is reused across the a- and b-sides. A
    // regression of either materialization shows up as extra scans here.
    assert(scansOf("embeddings", "d9_semdedup") == 3)
  }

  test("d10: warmed, the matrix costs ONE thin-column source-attach pass") {
    // pairs come from the at-rest registry (zero corpus scans); the two
    // (doc_id, source) attach sides canonicalize to the same column-pruned
    // scan subtree, so the exchange is reused and the whole matrix costs
    // ONE extra thin-column pass — no path re-runs the shingle pipeline
    graft.SparkEntry.queries("d2_dedup_ngram")(spark, dir).collect() // warm registry
    assert(scansOf("documents", "d10_dup_sources") == 1)
  }

  test("s10: one scan of embeddings (posexplode + two-level aggregation, no joins)") {
    assert(scansOf("embeddings", "s10_class_centroids") == 1)
  }

  test("t16: gopher rules are a single exchange-free map pass") {
    val p = plan("t16_gopher_rules")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("d21: cold builds the signature registry in one scan; warmed sweeps scan ZERO") {
    // the r10 lesson completed in r13: the PPJoin truth reads the d2
    // registry, and now the signature fit is ALSO an at-rest artifact
    // (ingest-path work — d3 computes the identical fit on the serving
    // path), so a warmed calibration run touches no corpus text at all:
    // every (b,r) grid derives from one 84-struct banding pass over the
    // signature parquet
    graft.SparkEntry.queries("d2_dedup_ngram")(spark, dir).collect() // warm pair registry
    graft.ops.Dedup.sigReg.reset()
    val cold = scansOf("documents", "d21_lsh_tuning")
    val warm = scansOf("documents", "d21_lsh_tuning")
    assert(cold == 1, s"cold d21 must fit signatures in ONE documents scan: $cold")
    assert(warm == 0, s"warmed d21 must read signatures at rest — zero documents scans: $warm")
  }

  test("m28: banded candidate join is band-keyed — SMJ/SHJ equi-join, never all-pairs") {
    // the pigeonhole banding only pays off if the candidate join really is
    // an equi-join on (band, bv); an accidental all-pairs here is images²
    val p = plan("m28_image_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p) // the band-bucket self-join is present
  }

  test("m28: two documents scans under AQE (image + donor sides; hash relation materialized)") {
    // the self-joined (image, donor) payload attach costs two binary-column
    // scans; bands and BOTH verification attaches then read the
    // materialized 16-char hash relation, never the payloads again
    assert(scansOf("documents", "m28_image_neardup") == 2)
  }

  test("m29: per-scene argmax is in-kernel — one explicit Exchange, no Window, no Join") {
    // scene selection happens inside the decode pass (row-local per
    // video); the only exchange is the explicit slot-balancing
    // repartition, and nothing shuffles at frame grain
    val p = plan("m29_keyframe_select")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("q49: bitemporal as-of is a broadcast probe-dimension predicate — one Exchange total") {
    // the fact relation streams ONCE through the broadcast 4-row probe
    // dimension under the range visibility predicate; the only shuffle is
    // the final probe-grain aggregation — history is never sorted or
    // re-shuffled for the as-of semantics
    val p = plan("q49_bitemporal")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // one SHUFFLE exchange (the final aggregation); the BroadcastExchange
    // of the 4-row probe dimension is the point of the shape, not a cost
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("s38: warmed, the two-stage residual encode is ONE row-local embeddings pass") {
    // both codebooks are fit-grain artifacts (capped sample, once per
    // JVM); the gated assignment chain (coarse argmax -> residual ->
    // codebook argmax) must stay a single scan with no Exchange and no
    // Join — the codebooks ride as literals/broadcast constants
    graft.SparkEntry.queries("s38_residual_quant")(spark, dir).collect() // warm fits
    assert(scansOf("embeddings", "s38_residual_quant") == 1)
    val p = plan("s38_residual_quant")
    assert(!p.contains("Exchange") && !p.contains("Join"), p)
  }

  test("s39: warmed, the delta assignment is ONE filtered embeddings pass") {
    // the standing census comes from the at-rest dump (never recomputed);
    // the per-shard cost is one pushdown-filtered delta scan + a
    // nlist-grain fold — O(delta), the d7 posture on the vector index
    graft.SparkEntry.queries("s39_ivf_delta")(spark, dir).collect() // warm fits
    assert(scansOf("embeddings", "s39_ivf_delta") == 1)
  }

  test("c31: the draw-distribution report joins nothing — one source fold + bounded window") {
    // everything after the map-side-combined source aggregation is
    // |sources|-grain; a join (or a second corpus scan) here would mean
    // the shares were re-derived from rows instead of the fold
    val p = plan("c31_sampling_shares")
    assert(!p.contains("Join"), p)
    assert(scansOf("documents", "c31_sampling_shares") == 1)
  }

  test("c32: semantic decontam is bucket-equi + broadcast — never corpus x eval") {
    val p = plan("c32_semantic_decontam")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the rank-1 cut pushes into the exchange
    assert(p.contains("WindowGroupLimit"), p)
    // 1 bucketing pass (materialized, feeds hot-bucket cap + both split
    // sides) + 1 train-side embedding attach + 1 broadcast eval attach
    assert(scansOf("embeddings", "c32_semantic_decontam") == 3)
  }

  test("a46: warmed, the audit is one blob scan of the store + a key-equi manifest join") {
    graft.SparkEntry.queries("a46_fixity_audit")(spark, dir).collect() // warm fixture
    val p = plan("a46_fixity_audit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("PrecomputedScan"), p)
  }

  test("s35: two scans of embeddings under AQE (train sample; one scoring pass)") {
    // 1 scan materializing the capped k-means sample + 1 row-local scoring
    // pass; the decile histogram folds the MATERIALIZED scored relation,
    // so the boundary statistic adds no parquet scan
    assert(scansOf("embeddings", "s35_ood_screen") == 2)
  }

  test("t17: one scan of documents under AQE (bigram relation materialized for 3 consumers)") {
    // bigram fit, context fit, vocab, and the scoring join all read the
    // materialized row-local bigram build — a regression re-tokenizes the
    // corpus per consumer (the t12/t14 trap)
    assert(scansOf("documents", "t17_bigram_lp") == 1)
  }

  test("c7: two column-pruned scans of documents (count fit + keep pass); rates broadcast") {
    // scan 1 feeds the per-source count aggregate (source column only),
    // scan 2 the row-local keep test (doc_id, source); the fitted rate
    // table must come back as a broadcast, never a shuffle of the corpus
    assert(scansOf("documents", "c7_temperature_mix") == 2)
    val p = plan("c7_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("m8: one scan of documents; only the slim (doc_id, phash) relation shuffles") {
    assert(scansOf("documents", "m8_image_phash") == 1)
    // the slim-exchange claim, asserted: no Exchange in the plan carries
    // the pixel payload — the window partitions the hashed relation only
    val p = plan("m8_image_phash")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, p)
    assert(exchanges.forall(l => !l.contains("payload") && !l.contains("text")), exchanges)
  }

  test("s11: the eval joins broadcast — no sort-merge over the tiny top-k relations") {
    val p = plan("s11_ann_recall")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("s12: corpus postings never shuffle for the match — query side broadcast") {
    val p = plan("s12_sparse_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s12: cold builds the postings index in ONE documents scan; warmed serving scans ZERO") {
    // r13 opt: the weighted postings index is an at-rest registry (the
    // header's "index-at-rest, appended by ingest" made literal) — the
    // first toucher runs the tokenize→tf→df→weight pipeline in one
    // documents scan and dumps; warmed, norms/query-postings/dots all
    // read the postings parquet
    graft.ops.Similarity.postingsReg.reset()
    assert(scansOf("documents", "s12_sparse_topk") == 1)
    assert(scansOf("documents", "s12_sparse_topk") == 0)
  }

  test("c8: the only exchange carries per-domain aggregate keys, never text") {
    val p = plan("c8_domains")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => !l.contains("text")), exchanges)
  }

  test("a17: halo relations exchange, the voxel value column never does") {
    // shell/spill (O(surface)) rows may shuffle; the decoded voxel
    // relation must not — no exchange carries a `value` column
    val p = plan("a17_dilate")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => !l.contains("value")), exchanges)
  }

  test("q29: per-key top-1 pushes through the window as WindowGroupLimit") {
    val p = plan("q29_latest_per_key")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("t18: Zipf head is a distributed top-k, not a global-window funnel") {
    // the vocabulary must reach the rank window already cut to TopK rows:
    // orderBy.limit plans TakeOrderedAndProject (distributed partial top-k),
    // never a global sort of the full term-frequency relation
    val p = plan("t18_zipf")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("a20: halo relations exchange, the voxel relation never does") {
    // probe/negface (O(surface)) rows may shuffle; the decoded voxel
    // relation must not — no exchange carries the raw `value` column
    val p = plan("a20_contact_area")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => !l.contains("value")), exchanges)
  }

  test("q30: the bucketed join runs as SMJ with NO exchange on either side") {
    val p = plan("q30_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    // the on-disk bucket layout is the join partitioning: the only
    // exchange allowed in the whole plan is the final per-priority
    // aggregation — neither join key may ever hash-partition
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
  }

  test("q36: dynamic partition pruning fires on the hive-partitioned fact scan") {
    val probe = Relational.q36PlanProbe(spark, dir)
    val p = probe.queryExecution.executedPlan.toString
    // the fact scan's partition filter must carry the runtime subquery —
    // the dim side decides at execution which year directories are read
    assert(p.toLowerCase.contains("dynamicpruning"), p)
    assert(probe.count() > 0)
  }

  test("q42: the merge reads only affected partitions and rewrites only their files") {
    import org.apache.spark.sql.functions.col
    // the affected-slice scan is statically partition-pruned by the CDC
    // month list: the IN-list sits in PartitionFilters and the partition
    // count is strictly below the table's month count
    val probe = Relational.q42PlanProbe(spark, dir)
    val scan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*o_pm[^\\]]*IN".r.findFirstIn(scan).isDefined, scan)
    val target = Relational.mergeTargetReg.lookup(dir).get
    // file-grain proof: after execution the scan's numFiles metric must be
    // strictly below the table's file population — untouched month
    // directories are never opened
    probe.collect()
    val scanExec = probe.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val filesRead = scanExec.metrics("numFiles").value
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val totalFiles = walk(new java.io.File(target)).count(_.getName.endsWith(".parquet"))
    assert(filesRead > 0 && filesRead < totalFiles, s"read $filesRead of $totalFiles files")

    // copy-on-write at file grain: re-running the merge (idempotent by
    // construction) must leave every UNAFFECTED month directory's files
    // untouched — only affected months are rewritten
    def fileStamps(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(target)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val first = Relational.q42_merge_upsert(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val stamps0 = fileStamps()
    val second = Relational.q42_merge_upsert(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(first.sortBy(_._1).toSeq == second.sortBy(_._1).toSeq, "merge is not idempotent")
    val rewritten = first.filter(_._4).map(_._1).toSet
    assert(rewritten.nonEmpty && rewritten.size < first.length, "fixture degenerate")
    val stamps1 = fileStamps()
    val untouchedDirs = first.filterNot(_._4).map(m => s"o_pm=${m._1}")
    for ((p, t0) <- stamps0 if untouchedDirs.exists(p.contains)) {
      assert(stamps1.get(p).contains(t0), s"unaffected partition file rewritten: $p")
    }
  }

  test("c20: the manifest plans the scan — only stat-overlapping files open") {
    import org.apache.spark.sql.functions.col
    val probe = Corpus.manifestSkipPlanProbe(spark, dir)
    probe.collect()
    val scanExec = probe.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val filesRead = scanExec.metrics("numFiles").value
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val dataDir = Corpus.manifestReg.lookup(dir).get._1
    val totalFiles = walk(new java.io.File(dataDir)).count(_.getName.endsWith(".parquet"))
    assert(filesRead > 0 && filesRead < totalFiles, s"read $filesRead of $totalFiles files")
    // and skipping is invisible: the probe's rows equal the plain filter
    // over the flat table under the same data-derived predicate
    val docs = Tables.t(spark, dir, "documents")
    val mm = docs.agg(org.apache.spark.sql.functions.min(col("n_chars")),
      org.apache.spark.sql.functions.max(col("n_chars"))).head()
    val (lo, hi) = (mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 3,
      mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2)
    val want = docs.filter(col("n_chars").between(lo, hi))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val got = probe.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("q43: snapshots structurally share unaffected months; commit never rewrites base") {
    import org.apache.spark.sql.functions.col
    Relational.q43_time_travel(spark, dir).collect() // build the store
    val root = Relational.ttRootReg.lookup(dir).get
    val man = spark.read.parquet(s"$root/manifest")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    val v0 = man.filter(_._1 == 0).map(m => m._2 -> m._3).toMap
    val v1 = man.filter(_._1 == 1).map(m => m._2 -> m._3).toMap
    assert(v0.keySet == v1.keySet && v0.values.forall(_.startsWith("base/")))
    val rewritten = v1.filter(_._2.startsWith("v1/")).keySet
    val shared = v1.filter(_._2.startsWith("base/")).keySet
    // the CDC is last-year-local: most months share, some rewrite
    assert(rewritten.nonEmpty && shared.size > rewritten.size, s"rewritten=$rewritten")
    // shared months point at the IDENTICAL path objects as v0 — structural
    // sharing, not copies
    shared.foreach(m => assert(v1(m) == v0(m)))
    // v1 holds new files ONLY for rewritten months
    val v1Dirs = new java.io.File(s"$root/v1").listFiles().toSeq
      .filter(_.isDirectory).map(_.getName).toSet
    assert(v1Dirs == rewritten.map(m => s"pm=$m"), s"v1 dirs $v1Dirs")
    // base files survive the commit byte-for-byte: a v0 read AFTER the
    // merge returns the pristine census (time travel, not replay)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val stamps = walk(new java.io.File(s"$root/base"))
      .filter(_.getName.endsWith(".parquet")).map(f => f.getPath -> f.lastModified()).toMap
    val again = Relational.q43_time_travel(spark, dir).collect()
    walk(new java.io.File(s"$root/base")).filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(stamps(f.getPath) == f.lastModified(), s"base rewritten: $f"))
    val pristine = Tables.t(spark, dir, "orders").count()
    assert(again.filter(_.getLong(0) == 0L).map(_.getLong(2)).sum == pristine,
      "as-of-0 no longer returns the pristine row count")
  }

  test("c13: a source predicate prunes partitions at the scan, not post-filter") {
    // force the export (and its per-JVM registry) via the gated query,
    // then read one source back through the partitioned layout
    Corpus.partitionedExport(spark, dir).collect()
    val one = spark.read.parquet(Corpus.exportReg.lookup(dir).get)
      .filter(org.apache.spark.sql.functions.col("source") === "src3")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: ["), scan)
    assert(scan.contains("source"), scan)
    // the predicate lands in PartitionFilters, and the pushed DATA filter
    // list stays empty (the dir name, not file contents, answers it)
    assert("PartitionFilters: \\[[^\\]]*source[^\\]]*= src3".r.findFirstIn(scan).isDefined, scan)
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(scan).getOrElse("")
    assert(pushed == "PushedFilters: []", pushed)
    assert(one.count() > 0)
  }

  test("q45: the runtime Bloom filter lands in the fact side of the join") {
    import org.apache.spark.sql.functions.col
    val probe = Relational.q45PlanProbe(spark, dir)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloomfilter") || plan.contains("might_contain"),
      s"no runtime bloom filter injected:\n${plan.take(2000)}")
    // and the filter is invisible: rows equal the plain join under default confs
    val want = Relational.runtimeFilterQuery(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val got = probe.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty && got.map(_._2).sum > 0)
  }

  test("AQE coalesces shuffle partitions for small aggregates at runtime") {
    // 32 configured shuffle partitions over a 500-row group-by: AQE must
    // fold the near-empty post-shuffle partitions instead of running 32
    // tiny tasks — the runtime re-plan that keeps small stages cheap at
    // ANY configured parallelism
    val agg = Tables.t(spark, dir, "documents")
      .groupBy(org.apache.spark.sql.functions.col("lang"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
    agg.collect() // AQE decisions exist only after execution
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("AQEShuffleRead coalesced"), p)
  }

  test("c18: first toucher builds the at-rest eval-pair registry; warmed runs fold from parquet") {
    // deterministic cold start regardless of suite order (the d2 pattern) —
    // VerifyGateSpec may have warmed the registry in this JVM already
    graft.ops.Corpus.resetAtRestRegistriesForTests()
    val cold = scansOf("documents", "c18_fuzzy_decontam")
    val warm = scansOf("documents", "c18_fuzzy_decontam")
    assert(cold > warm, s"expected the registry build to cost extra scans: cold=$cold warm=$warm")
    assert(warm == 1, s"warmed c18 should scan documents ONCE (the per-doc left join): $warm")
  }

  test("m30: cold build decodes in two documents scans; warmed runs fold from parquet") {
    // cold: image + donor sides of the plant join (m28's measured shape),
    // the materialized hash relation feeding the band join and BOTH
    // verification legs — without it the real codec path would re-decode
    // per leg (5+ scans). Warmed (r13 at-rest registry): ZERO documents
    // scans — the screen's output is a maintained artifact, like c3/c18
    graft.ops.Multimodal.visualDecontamReg.reset()
    val cold = scansOf("documents", "m30_visual_decontam")
    val warm = scansOf("documents", "m30_visual_decontam")
    assert(cold == 2, s"cold m30 build must decode in exactly 2 documents scans: $cold")
    assert(warm == 0, s"warmed m30 must fold from parquet — zero documents scans: $warm")
  }

  test("c34: warmed, the release export re-shingles and re-derives nothing") {
    // warm every at-rest signal the export chains (pair registry, c3
    // verbatim, c18 fuzzy), then pin the scan census: the export itself
    // may touch documents exactly 3 times — the staged base projection,
    // the row-local gopher pass, and c18's per-doc zero-fill join inside
    // the c33 ledger. A shingle rebuild (d2: +1 full pipeline), a c3
    // rebuild, or a lost materialization all surface as a 4th scan
    graft.SparkEntry.queries("d2_dedup_ngram")(spark, dir).collect()
    graft.SparkEntry.queries("c3_decontam")(spark, dir).collect()
    graft.SparkEntry.queries("c18_fuzzy_decontam")(spark, dir).collect()
    val n = scansOf("documents", "c34_release_export")
    assert(n == 3, s"warmed c34 must scan documents exactly 3x: $n")
  }

  test("c36: warmed, the day-2 export screens the DELTA only — history never re-staged") {
    // warm every at-rest input (pair registry, c3, c18) AND the standing
    // export artifact itself, then pin: the delta run's three permitted
    // documents scans (delta staged base, delta gopher pass, c18's
    // per-doc zero-fill in the ledger) — a standing re-stage would show
    // as 6 (the cold build's census: 3 standing + 3 delta)
    graft.SparkEntry.queries("d2_dedup_ngram")(spark, dir).collect()
    graft.SparkEntry.queries("c3_decontam")(spark, dir).collect()
    graft.SparkEntry.queries("c18_fuzzy_decontam")(spark, dir).collect()
    graft.ops.Corpus.exportStateReg.reset()
    val cold = scansOf("documents", "c36_incr_export")
    val warm = scansOf("documents", "c36_incr_export")
    assert(cold == 6, s"cold c36 must stage standing+delta (3+3 scans): $cold")
    assert(warm == 3, s"warmed c36 must screen the delta only (3 scans): $warm")
  }

  test("c35: warmed, the multimodal ledger reads all three signals at rest — one scan, zero decodes") {
    graft.SparkEntry.queries("c3_decontam")(spark, dir).collect()
    graft.SparkEntry.queries("c18_fuzzy_decontam")(spark, dir).collect()
    graft.SparkEntry.queries("m30_visual_decontam")(spark, dir).collect()
    // the single permitted scan is c18's per-doc zero-fill; the visual
    // side joining at rest means NO decode pass re-enters the plan
    val n = scansOf("documents", "c35_decontam_ledger_mm")
    assert(n == 1, s"warmed c35 must scan documents exactly once: $n")
  }

  test("q28: the manual salt carries the skew work; AQE's skew-join stays idle") {
    // q28 exists to demonstrate hot-key salting — the pin proves the demo
    // is honest: the executed join keys on __salt (the decomposition IS in
    // the plan) and AQE's runtime skew handling did not silently re-split
    // the join behind it (no `skew=true` join in the adaptive final plan).
    // If a future Spark starts marking it, the band and the scaladoc must
    // be re-adjudicated, not waved through.
    val df = graft.SparkEntry.queries("q28_salted_join")(spark, dir)
    df.collect() // AQE decisions exist only after execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt key missing from the executed join:\n$p")
    assert(!p.contains("skew=true"), s"AQE skew-join re-split the salted join:\n$p")
  }

  test("no driver query plans a cartesian product") {
    // s4's centroid scoring is a row-local argmax/top-n kernel over the
    // fitted matrix (CentroidExprs), so even the IVF path must be
    // equi-join-only
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(Set("e1_stream_hourly", "e2_stream_dedup", "e3_stream_enrich",
        "e4_stream_sessions", "e5_stream_sessions_wm", "e6_stream_ivjoin",
        "e7_stream_leftjoin", "e8_stream_corpus",
        "e9_stream_neardup", "e10_session_window")) // streaming: no batch plan
      .filter { n =>
        val p = plan(n)
        p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
      }
    assert(offenders == Seq("a21_percentiles", "a38_zprofile",
      "c11_importance", "c12_length_hist",
      "c17_epoch_shuffle", "c19_nutrition_label",
      "c34_release_export", "c36_incr_export", "d18_simhash_eval",
      "d21_lsh_tuning",
      "q31_gapfill", "q32_skew_report", "q34_funnel", "q49_bitemporal",
      "s13_rp_topk", "s17_matryoshka", "s1_cosine_topk", "s22_ivf_balance",
      "s27_hamming_topk", "s29_rrf_fusion", "s30_triplet_mining", "s5_sq8_topk",
      "s7_pq_topk", "s9_knn_label", "t12_unigram_lp", "t17_bigram_lp",
      "t18_zipf", "t30_heaps", "t32_kneser_ney", "t9_bm25"),
      s"unexpected non-equi joins in: $offenders") // a21/c11/c12 join
    // q34 attaches three ONE-ROW stage counts to each other; s22 attaches
    // the one-row total to the nlist-row cell relation — 1 × N map-side
    // attaches, same class as a21/c12; c17 crosses the corpus with the
    // broadcast EPOCH dimension (bounded by the epoch count, the q31
    // dimension-grid argument); c19 attaches its ONE-ROW duplicate total
    // ONE-ROW broadcast constants (a21: total voxel count against the
    // histogram; c11: the two corpus-constant fits, t12's exact shape;
    // c12: the total-docs row against the bucket-grain histogram) —
    // a BNLJ of 1 × N rows is a map-side attach, not an all-pairs;
    // q31's cross product is the dense (hour × type) DIMENSION grid —
    // two aggregate-grain relations, bounded by span × cardinality
    // c7 attaches n_min via a
    // window over the tiny count relation, and s11's exact ground truth is
    // materialized (its flat scan runs once, at build; the gated plan reads
    // the checkpoint) — neither may appear here
    // s9 inherits s1's flat scan (it votes over s1's exact top-k — an EVAL
    // on a bounded query sample, nQueries·corpus not corpus²); s17 runs one
    // such bounded flat scan per dim prefix (same eval rationale); s11 likewise
    // — it IS the eval that justifies replacing that flat scan with an index
    // s1/s5/s7 are flat query×corpus scans (float, int8-quantized, and
    // PQ-compressed): definitionally all-pairs, implemented as a broadcast
    // nested loop of the 10-row query side — the approximate paths
    // (s2/s3/s4) exist precisely to avoid this shape at scale (s7's
    // production composition is IVFADC: s4's cell routing over PQ codes).
    // t9/t12/t17 cross-join a broadcast ONE-ROW global-stats aggregate
    // (n_docs+avglen / total+vocab) onto every term row — a 1-row BNLJ is
    // the standard way to attach corpus constants and is shuffle-free at
    // any scale (c7's 1-row n_min attach folds into its broadcast rate
    // join, so it does not appear here)
    // s27 is the s1 eval shape over 8-byte sign signatures (the bounded
    // broadcast-probes flat scan); its production composition buckets by
    // signature prefix (s2) and uses the XOR+popcount kernel in-bucket
    // d18's candidates come from four band-keyed EQUI-joins (the LSH-bands
    // principle); the flagged BNLJ is only the broadcast FOUR-ROW τ
    // dimension attached with hd <= tau (the q31/t30 dimension class)
    // a38 attaches its one-row drift-fit aggregate to the O(depth)
    // section relation (the a21/c12 constant-attach class)
    // a41's quantile-matching LUT is a ≤256×256 broadcast non-equi join
    // at grey-LEVEL grain (cr·ns ≥ cs·nr) plus two one-row total attaches
    // — level-grain is corpus-size-independent (the q31 dimension class);
    // it runs inside the store BUILD, so the gated (returned) plan — the
    // census over the reopened destination volume — never contains it
    // and a41 does not appear in this list
    // e24's serve-time scoring attaches the ONE-ROW at-rest profile to the
    // drained day-grain relation (the t12 constant-attach class; the
    // stream itself carries only watermark-bounded counters) — since the
    // r11 log-term-artifact fix that attach happens inside a MATERIALIZED
    // relation, so the gated plan reads the checkpoint and e24 no longer
    // appears in this list
    // c34 attaches its ONE-ROW attrition fold to the pack-grain relation
    // (the t12 class — the per-stage counts a release review reads ride
    // every pack row as constants)
    // d21 attaches its ONE-ROW exact-truth total to the 4-row config
    // relation (the t12 class); its candidates are band-keyed EQUI-joins
    // and its truth is the adjudicated run-rarely PPJoin eval (d18 class)
    // q49 streams the fact relation through a broadcast FOUR-ROW probe
    // dimension under a range visibility predicate (the q31/t30
    // dimension-grid class — bitemporal as-of is a predicate, not a
    // shuffle)
    // t30 joins its two corpus-grain folds against the broadcast TEN-ROW
    // checkpoint dimension with a ≤ predicate (the q31 dimension-grid
    // class) and attaches the one-row regression fit (the t12/t18 class)
    // s30 mines hardest negatives/positives over the s1 bounded-eval scan
    // (nQueries anchors broadcast × corpus); at scale the candidates come
    // from the bucketed generators (s2/s4) + per-class top-k — equi-joins —
    // with the two rank-1 windows and the anchor join unchanged
    // s29's fusion itself is a full-outer EQUI-join of two rank relations;
    // the BNLJ it inherits is s1's pool build (s12's is prefix-joined) —
    // swap in the bucketed rankers (s2/s8) and the fusion is unchanged
  }

  test("capBucketsOrFail crashes loudly on an over-cap bucket (never silently drops)") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // ADVICE r12: the loud failure rides an assert_true kept alive inside
    // a coalesce — a future Catalyst folding/pruning change could elide it
    // and silently revert to capBuckets' dropping semantics, the exact
    // oracle divergence the OrFail variant exists to prevent. This feeds a
    // synthetic over-cap bucket end-to-end so such a change surfaces here.
    val df = (1 to 10).map(i => (7L, i.toLong)).toDF("bucket", "id")
    val ex = intercept[Exception] {
      graft.ops.Similarity.capBucketsOrFail(df, cap = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("over the 3-row cap")),
      s"expected the loud over-cap failure, got: ${messages(ex)}")
    // and the healthy path is untouched: under-cap buckets pass through
    val ok = graft.ops.Similarity.capBucketsOrFail(df.limit(2), cap = 3).collect()
    assert(ok.length == 2)
  }
}
