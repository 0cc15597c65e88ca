package graft

/** The query scaladocs make physical-plan claims (single scan, one
  * sort, broadcast choice, generator-based JSON parse, top-k without a
  * global sort). Claims rot; these gates execute them. String checks
  * run against the pre-execution plan (AQE's initial plan), which is
  * where the claimed operators already appear.
  */
class PlanShapeSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf).queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("q_topk plans TakeOrderedAndProject, never a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_union's disjunctive rewrite scans orders exactly once") {
    assert(count(plan("q_union"), "Scan parquet") == 1)
  }

  test("q_join_agg broadcasts the dimension side") {
    assert(plan("q_join_agg").contains("BroadcastHashJoin"))
  }

  test("q_json_path_scan parses JSON once via the generator, not twice") {
    val p = plan("q_json_path_scan")
    assert(p.contains("json_tuple"))
    assert(!p.contains("get_json_object"))
  }

  test("q_rollup computes all grouping sets in one Expand + aggregate pass") {
    val p = plan("q_rollup")
    assert(p.contains("Expand"))
    assert(count(p, "Scan parquet") == 1)
  }

  test("q_dfg_endpoints runs on a single sort (no descending second window)") {
    assert(count(plan("q_dfg_endpoints"), "Sort ") <= 2) // window sort + agg-side only
  }

  test("q_filter_membership pushes the IN filter to the parquet scan") {
    val p = plan("q_filter_membership")
    assert(p.contains("PushedFilters: [In(user_id"))
  }

  test("indexed BM25 search pushes the probed-term In filter to the postings scan") {
    // with the index term-sorted on disk, the pushed In + row-group
    // min/max stats mean a search reads O(matching postings), not the
    // whole index — the claim in bm25TopKIndexed's comment
    import graft.llm.Retrieval
    val dir = java.nio.file.Files.createTempDirectory("lexidx-plan").toString
    Retrieval.saveLexIndex(
      Retrieval.buildLexIndex(Tables.documents(spark, Sf), "doc_id", "text"), dir)
    val loaded = Retrieval.loadLexIndex(spark, "doc_id", dir)
    val p = Retrieval.bm25TopKWith(loaded, "doc_id",
        Seq(0 -> Seq("key", "row")), k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(term"))
  }

  test("scale-arm plans contain no all-pairs join operator") {
    // the whole point of the LSH/IVF arms: candidates come from bucket
    // EQUALITY joins, so a BroadcastNestedLoopJoin or CartesianProduct
    // anywhere in their plans means the scale story regressed to the
    // exact tier's theta join
    for (q <- Seq("q_minhash_lsh", "q_simhash_neardup", "q_curation_lsh",
        "q_embed_neardup_lsh", "q_ann_lsh", "q_ann_ivf", "q_knn_graph_lsh")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q plans an all-pairs join")
    }
  }

  test("fourth-batch plans: keyed joins only, no all-pairs surface") {
    // q_novelty's whole claim is "the dedup metric with NO pairwise
    // surface"; q_triangles' wedge join must stay an equi-join on src;
    // q_soft_dedup / q_weighted_mix ride id-keyed joins around the CC;
    // q_inverted_index / q_snapshot_drift are pure keyed aggs. The
    // 1-row broadcast scalars (stats/totals) are the only nested-loop
    // joins allowed — assert no CartesianProduct anywhere.
    for (q <- Seq("q_novelty", "q_triangles", "q_soft_dedup",
        "q_weighted_mix", "q_inverted_index", "q_snapshot_drift")) {
      assert(!plan(q).contains("CartesianProduct"),
        s"$q plans a cartesian product")
    }
  }

  test("no heavy expression is pushdown-substituted into a scan-side Filter") {
    // The recurring Spark trap this repo keeps paying for: an inferred
    // filter (isnotnull from a join/threshold, size(g) > 0 from a
    // generator) gets its alias RE-SUBSTITUTED below the repartition
    // Exchange, so the expensive expression — interpreted ngram
    // lambdas, quantize+dot kernels, signature kernels — evaluates a
    // second time, single-core, in the lone parquet partition. Every
    // fix is the same shape (coalesce the derived column non-nullable,
    // or explode_outer + isNotNull above the generator); this gate
    // keeps all of them fixed: no Filter or scan line in the heavy
    // tier's plans may contain an interpreted lambda or a graft kernel.
    // (Measured this round: q_hot_postings 4.8 s → 1.2 s,
    // q_ngram_jaccard 10 s → 5.6 s, q_minhash_lsh 3.2 s → 1.5 s,
    // q_curation 7.5 s → 4.2 s from exactly these substitutions.)
    for (q <- Seq("q_ngram_jaccard", "q_ngram_jaccard_capped", "q_hot_postings",
        "q_minhash_lsh", "q_curation", "q_curation_lsh", "q_simhash_neardup",
        "q_embed_neardup", "q_embed_neardup_lsh", "q_embed_topk",
        "q_ann_lsh", "q_ann_ivf", "q_fingerprint_pairs", "q_repetition",
        "q_prep_pipeline", "q_dedup_clusters", "q_decontaminate",
        "q_embed_quantize", "q_embed_topk_int8",
        "q_semdedup", "q_semdedup_clustered", "q_importance",
        "q_ngram_containment", "q_split_by_cluster", "q_semdedup_cells",
        "q_ngram_containment_banded", "q_substring_dup",
        "q_segment_dedup", "q_bm25_topk", "q_ann_pq", "q_ann_ivfpq",
        "q_span_dedup", "q_quality_learned",
        "q_hybrid_rrf", "q_hybrid_rrf_ann", "q_perplexity",
        "q_dedup_ensemble", "q_rag_context", "q_corpus_report",
        "q_editdist_pairs")) {
    // markers are the DERIVED heavy expressions only (a legitimate
    // user predicate — e.g. q_curation's quality gate — may contain a
    // lambda and SHOULD push to the scan; it evaluates once there):
    // compiled kernels, the ngram builder (array_distinct-of-transform)
    // and the quantize chain (transform-of-transform)
      val bad = plan(q).linesIterator.filter(l =>
        (l.contains("Filter") || l.contains("FileScan")) &&
          (l.contains("graft_") || l.contains("minhash_sig") ||
            l.contains("hyperplane_sigs") || l.contains("centroid_dists") ||
            l.contains("array_distinct(transform(") ||
            l.contains("transform(sequence(") ||
            l.contains("transform(transform("))).toList
      assert(bad.isEmpty,
        s"$q re-evaluates a heavy expression in a Filter/scan:\n${bad.map(_.take(200)).mkString("\n")}")
    }
  }

  test("context-shaping plans: broadcast rate table, shuffle-free bloom probe, no generator trap") {
    assert(plan("q_sample_stratified").contains("BroadcastHashJoin"),
      "the rate table must ride a broadcast join, never shuffle the corpus")
    val bloom = plan("q_dedup_incremental_bloom")
    assert(!bloom.contains("Exchange"),
      "the bloom arm's whole point is zero shuffle of either corpus")
    assert(bloom.contains("might_contain"),
      "probe must run through the codegen'd BloomFilterMightContain")
    // chunking: the explode_outer + isNotNull pattern keeps the split/
    // sequence generator input from being pushdown-re-substituted into
    // a scan-side Filter (the r5 trap family)
    val chunk = plan("q_chunk")
    val bad = chunk.linesIterator.filter(l =>
      (l.contains("Filter") || l.contains("FileScan")) && l.contains("split(")).toList
    assert(bad.isEmpty, s"q_chunk re-evaluates split at the scan:\n${bad.mkString("\n")}")
    // packing: exactly the two designed shuffles — the shard
    // repartition below the accumulator and the final stats groupBy
    val pack = plan("q_pack_greedy")
    val exchanges = pack.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(exchanges <= 2, s"q_pack_greedy grew an extra shuffle ($exchanges):\n${pack.take(1200)}")
  }

  test("round-9 plans: PQ kernel + equi-join span removal + map-only quarantine") {
    // PQ ANN: the ADC scan must run the compiled pq_adc kernel, and the
    // only non-equi join allowed is the broadcast probe BNLJ (the
    // topKInt8Rerank shape); a CartesianProduct means the probe side
    // lost its broadcast
    val pq = plan("q_ann_pq")
    assert(pq.contains("pq_adc"), "q_ann_pq must score through the compiled ADC kernel")
    assert(!pq.contains("CartesianProduct"), "q_ann_pq plans a cartesian")
    // span removal: anchors and the cut-set join are EQUALITY joins —
    // never an all-pairs shape (the substringSpans contract carried
    // into the transform twin)
    val span = plan("q_span_dedup")
    assert(!span.contains("CartesianProduct") &&
      !span.contains("BroadcastNestedLoopJoin"),
      "q_span_dedup plans an all-pairs join")
    // quarantine: a row-local CASE — the audit must never shuffle
    val quar = plan("q_embed_quarantine")
    assert(!quar.contains("Exchange"),
      s"q_embed_quarantine must be map-only:\n${quar.take(1200)}")
    // IVFPQ: candidates must arrive by cell EQUALITY (the ivfTopK
    // contract) and score through the compiled ADC kernel — an
    // all-pairs operator means the cell routing regressed
    val ivfpq = plan("q_ann_ivfpq")
    assert(ivfpq.contains("pq_adc"), "q_ann_ivfpq must score through pq_adc")
    assert(!ivfpq.contains("CartesianProduct") &&
      !ivfpq.contains("BroadcastNestedLoopJoin"),
      "q_ann_ivfpq plans an all-pairs join")
  }

  test("round-8 training-layout plans: broadcasts, one shuffle, rank-limit pushdown") {
    // bm25: the query-term table and the df table ride broadcasts (the
    // corpus-side postings stream must never shuffle for them), and
    // the per-query top-k is a rank-limit window, not a global sort
    val bm25 = plan("q_bm25_topk")
    assert(bm25.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"bm25: query-term and df joins must broadcast:\n${bm25.take(1200)}")
    assert(bm25.contains("WindowGroupLimit"),
      "bm25: top-k must ride the rank-limit pushdown")
    // segment dedup: the boilerplate anti-join is an equality join —
    // never a cartesian/all-pairs shape
    val seg = plan("q_segment_dedup")
    assert(!seg.contains("CartesianProduct") &&
      !seg.contains("BroadcastNestedLoopJoin"),
      "segment dedup plans an all-pairs join")
    // shard assign + block packing: exactly ONE data shuffle — the
    // hash partition on the shard id that a sharded write wants anyway
    for (q <- Seq("q_shard_assign", "q_pack_blocks")) {
      val p = plan(q)
      assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
        s"$q must shuffle exactly once, on the shard id:\n${p.take(1200)}")
    }
    // temperature mixing: the allocation table is broadcast back — the
    // corpus itself never shuffles for the sampling decision
    val mix = plan("q_mix_temperature")
    assert(mix.contains("BroadcastHashJoin"),
      s"mix_temperature: alloc table must broadcast:\n${mix.take(1200)}")
    // PCA projection: after the driver-side train, the projection pass
    // is a pure map through the broadcast MatVec kernel — an Exchange
    // here would mean the corpus shuffles for a per-row transform
    val pca = plan("q_pca_project")
    assert(!pca.contains("Exchange"),
      s"pca_project must be map-only:\n${pca.take(1200)}")
    assert(pca.contains("mat_vec"),
      "pca_project must run the compiled MatVec kernel")
    // intra-doc dedup: likewise a pure row-local HOF chain
    val intra = plan("q_intradoc_dedup")
    assert(!intra.contains("Exchange"),
      s"intradoc_dedup must be map-only:\n${intra.take(1200)}")
    // layout capstone: equality joins and ONE 1-row broadcast nested
    // loop (the wsum scalar) — never a cartesian, never a second BNLJ
    val layout = plan("q_training_layout")
    assert(!layout.contains("CartesianProduct"),
      "training_layout plans a cartesian join")
    assert(layout.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"training_layout: only the 1-row wsum scalar may ride a BNLJ:\n${layout.take(1500)}")
  }

  test("q_importance broadcasts both vocabulary-sized count tables") {
    // the DSIR shape: the gram stream is corpus-sized, the count
    // tables are vocabulary-sized — if either count join shuffles the
    // gram stream the operator loses its one-shuffle contract
    val p = plan("q_importance")
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 2,
      s"both count joins must be broadcast (saw $broadcasts):\n${p.take(1200)}")
  }

  test("q_topn_per_key plans partial+final WindowGroupLimit, not a full window sort") {
    // Spark 4's rank-limit pushdown caps per-key state BEFORE the
    // shuffle (partial) and after (final) — the built-in already IS
    // the bounded-heap top-k-per-key operator, which is why this repo
    // ships no custom strategy for it (SURVEY §7.3). This gate keeps
    // the query shaped so the optimization continues to fire.
    val p = plan("q_topn_per_key")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial") && p.contains("Final"),
      s"rank-limit pushdown must fire:\n${p.take(1500)}")
  }

  test("q_sample_k_per_key rides the same rank-limit pushdown as q_topn_per_key") {
    val p = plan("q_sample_k_per_key")
    assert(p.contains("WindowGroupLimit"),
      s"fixed-k sampling must cap per-key state before the shuffle:\n${p.take(1500)}")
  }

  test("q_label_budget_draw: the LITERAL maxAlloc bound keeps the rank-limit pushdown firing") {
    // the scaladoc's central claim: filtering the rank against the
    // literal valve BEFORE the allocation join is what lets Spark cap
    // per-stratum window state pre-shuffle — a join-supplied bound
    // can't be pushed into the window
    val p = plan("q_label_budget_draw")
    assert(p.contains("WindowGroupLimit"),
      s"the literal-bound rank filter must push down:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "allocation rides a broadcast equi-join, never a pairwise surface")
  }

  test("q_sample_gumbel caps per-stratum state pre-shuffle and stays cartesian-free") {
    // the weighted draw's scaladoc claims the same rank-limit pushdown
    // as the uniform sampler: the Gumbel key is row-local, so only the
    // window rank shapes the shuffle — k rows per (task, stratum)
    val p = plan("q_sample_gumbel")
    assert(p.contains("WindowGroupLimit"),
      s"Gumbel top-k must cap per-stratum state before the shuffle:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "the draw is one window over the corpus — no pairwise surface")
  }

  test("q_grouping_sets and q_unpivot each scan lineitem exactly once") {
    // GROUPING SETS = one Expand + aggregate, never a UNION of scans;
    // UNPIVOT = one stack generator over one scan, never per-measure
    // scans
    val gs = plan("q_grouping_sets")
    assert(gs.contains("Expand") && count(gs, "Scan parquet") == 1,
      s"grouping sets must be one Expand over one scan:\n${gs.take(1200)}")
    assert(count(plan("q_unpivot"), "Scan parquet") == 1)
  }

  test("q_ann_ivf's cluster assignment is never re-evaluated below the shuffle") {
    // the IVF join key is wrapped non-nullable so the inner join infers
    // no isnotnull(key) filter — without that, pushdown substitutes the
    // whole k-distance assignment into a Filter BELOW the repartition
    // Exchange and runs it a second time in the lone parquet partition
    // (measured 16 s of a 17 s query). Gate: no Filter mentioning the
    // assignment (array_position) may sit under an Exchange.
    val p = plan("q_ann_ivf")
    val filterLines = p.linesIterator.filter(_.contains("Filter")).toSeq
    assert(!filterLines.exists(_.contains("array_position")),
      s"assignment expression leaked into a Filter:\n${filterLines.mkString("\n")}")
  }

  test("round-9 third-batch plans: equality joins, broadcasts, bounded shuffles") {
    // source overlap: the segment self-join is an EQUALITY join —
    // never a cartesian/all-pairs shape
    val ov = plan("q_source_overlap")
    assert(!ov.contains("CartesianProduct") &&
      !ov.contains("BroadcastNestedLoopJoin"),
      s"source overlap plans an all-pairs join:\n${ov.take(1200)}")
    // source sim: corpus-side work is equality joins + partial-agged
    // groupBys; the only nested-loop is the S-sized centroid pair join
    val sim = plan("q_source_sim")
    assert(!sim.contains("CartesianProduct"),
      s"source sim plans a cartesian:\n${sim.take(1200)}")
    assert(sim.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"only the S-sized pair join may nested-loop:\n${sim.take(1500)}")
    // epoch order: the corpus was already sharded (checkpointed) —
    // the per-epoch map adds ONLY the params broadcast, no new shuffle
    val ep = plan("q_epoch_order")
    assert(ep.contains("BroadcastHashJoin"),
      s"epoch order: params table must broadcast:\n${ep.take(1200)}")
    assert(ep.linesIterator.count(_.contains("Exchange hashpartitioning")) == 0,
      s"epoch order must not re-shuffle the sharded corpus:\n${ep.take(1200)}")
    // shard plan: one aggregate -> exactly one shuffle on the source id
    val sp = plan("q_shard_plan")
    assert(sp.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"shard plan is one partial-agged aggregate:\n${sp.take(1200)}")
  }

  test("q_link_graph: pruned scan, codegen extraction, two keyed Exchanges") {
    val p = plan("q_link_graph")
    // the documents scan must read ONLY doc_id — the synth page/body
    // derive from it, and a scan dragging `text`/`embedding` along
    // would ship the real corpus columns into the extractor at 100 TB
    assert(count(p, "Scan parquet") == 1 &&
      p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"link graph must scan documents pruned to doc_id:\n${p.take(1200)}")
    // extraction + both canonicalizations are pure Catalyst: a UDF or
    // a cartesian anywhere here would be the lazy path the scaladoc
    // forbids
    assert(!p.contains("BatchEvalPython") && !p.contains("UDF") &&
      !p.contains("CartesianProduct"),
      s"link graph must stay codegen/regex, no UDF:\n${p.take(1200)}")
    // the distinct-page count needs exactly two keyed aggregation
    // shuffles: the (src, dst, id) collapse + the final (src, dst) fold
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"link graph is two partial-agged keyed shuffles:\n${p.take(1500)}")
  }

  test("q_crawl_report: two pruned scans, broadcast rules, no cartesian") {
    val p = plan("q_crawl_report")
    // single lineage: the staged chain + the policy branch that joins
    // back on id — a third branch (the union-recompute trap crawlReport's
    // scaladoc documents) would read 3+; and every scan must be pruned
    // to doc_id (the synth derives page/ts from it)
    assert(count(p, "Scan parquet") == 2 &&
      !p.linesIterator.exists(l => l.contains("ReadSchema") &&
        !l.contains("ReadSchema: struct<doc_id:bigint>")),
      s"crawl report is two doc_id-pruned scans:\n${p.take(1500)}")
    // the policy rule table is a broadcast build side (bounded by
    // hosts x rules, never pages) — a shuffled or nested-loop rules
    // join would be wrong at any scale
    assert(p.contains("BroadcastHashJoin"),
      s"the rules join must broadcast:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"),
      s"no stage of the funnel may go cartesian:\n${p.take(1200)}")
  }

  test("q_revisit_schedule: one partial-agged page collapse, lambda on the collapsed table") {
    val p = plan("q_revisit_schedule")
    // the revisit log collapses to |pages| rows in ONE keyed Exchange
    // (map-side combined); the lambda arithmetic must run on the
    // collapsed table, never force a second shuffle or a window
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"revisit estimator is one page-keyed collapse:\n${p.take(1500)}")
    assert(!p.contains("Window") && count(p, "Scan parquet") == 1,
      s"no window pass, one scan:\n${p.take(1200)}")
  }

  test("q_recrawl_schedule: collapse + host rank, budgets broadcast, no cartesian") {
    val p = plan("q_recrawl_schedule")
    // exactly THREE keyed Exchanges: the page-keyed partial-agged
    // collapse of the visit log, the host-keyed rank over the
    // COLLAPSED |pages| table, and (r16) the hosts-sized budget-table
    // min-collapse that dedupes duplicate host rows BEFORE the
    // broadcast — a rank on the raw log (visits-sized sort) or a
    // re-shuffle of the PAGE lineage for the budget join would read 4+
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 3,
      s"recrawl schedule is collapse + host rank + budget dedupe:\n${p.take(1500)}")
    assert(count(p, "Scan parquet") == 1,
      s"one scan of the visit log:\n${p.take(1200)}")
    // the (host, quota) budget table is hosts-sized: broadcast only
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      s"budgets join must broadcast:\n${p.take(1200)}")
  }

  test("q_politeness_hostquota: rank Exchange unchanged, quota table broadcast") {
    val p = plan("q_politeness_hostquota")
    // the per-host quota must not change the rank plan: still ONE
    // keyed Exchange feeding the (host, window) rank on the FRONTIER
    // lineage; the quota arrives by broadcast and enters the verdict
    // expression only. The second Exchange (r16) is the hosts-sized
    // quota-table min-collapse deduping duplicate host rows before
    // the broadcast — it never touches the frontier.
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"per-host quotas must not shuffle the frontier lineage:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      s"quota table must broadcast:\n${p.take(1200)}")
  }

  test("q_crawl_traps: two partial-agged keyed Exchanges, no window") {
    val p = plan("q_crawl_traps")
    // (host, template) collapse then the host fold with a struct max —
    // a window or a third shuffle would be the rank-based dominant
    // pick the scaladoc rejects
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"trap report is two keyed collapses:\n${p.take(1500)}")
    assert(!p.contains("Window") && count(p, "Scan parquet") == 1,
      s"no window, one scan:\n${p.take(1200)}")
  }

  test("q_frontier_priority: TakeOrdered top-K, broadcast authority, no global sort") {
    val p = plan("q_frontier_priority")
    // the global fetch batch must be TakeOrderedAndProject (local
    // top-K + driver heap merge) — a Sort + Exchange rangepartitioning
    // would globally sort the whole frontier for 100 rows
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K must be TakeOrdered, never a global sort:\n${p.take(1500)}")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no range-partition Exchange over the frontier:\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      s"the hosts-sized authority table must broadcast:\n${p.take(1200)}")
    // INDEX-BACKED (r16): the fetch-batch query reads the persisted
    // authority parquet — zero keyed Exchanges in its plan. A PageRank
    // re-iterate (8 keyed shuffles) or a link-graph re-derivation
    // sneaking back in fails here loudly.
    assert(!p.contains("Exchange hashpartitioning"),
      s"fetch batch must not re-iterate PageRank per call:\n${p.take(1500)}")
    assert(count(p, "Scan parquet") == 2,
      s"exactly the frontier scan + the persisted authority scan:\n${p.take(1200)}")
  }

  test("q_url_resolve: row-local resolution — one pruned scan, zero shuffles, no UDF") {
    val p = plan("q_url_resolve")
    // RFC 3986 resolution is pure regex/string arithmetic: a map at
    // any scale — any Exchange or UDF here means the operator stopped
    // being row-local
    assert(!p.contains("Exchange") && !p.contains("UDF") &&
      !p.contains("BatchEvalPython"),
      s"resolution must stay a row-local map:\n${p.take(1200)}")
    assert(count(p, "Scan parquet") == 1 &&
      !p.linesIterator.exists(l => l.contains("ReadSchema") &&
        !l.contains("ReadSchema: struct<doc_id:bigint>")),
      s"one doc_id-pruned scan:\n${p.take(1200)}")
  }

  test("q_warc_records_gz: map-only member walk, pruned input, no shuffle") {
    val p = plan("q_warc_records_gz")
    // the member walk is the documented legitimate-imperative class:
    // files in, records out — map-only, with the scan pruned to
    // doc_id before the object boundary
    assert(!p.contains("Exchange"),
      s"the gz member walk must not shuffle:\n${p.take(1200)}")
    assert(!p.linesIterator.exists(l => l.contains("ReadSchema") &&
      !l.contains("ReadSchema: struct<doc_id:bigint>")),
      s"the fixture scan prunes to doc_id:\n${p.take(1200)}")
  }

  test("q_http_response: map-only HTTP parse, pruned input, no shuffle") {
    val p = plan("q_http_response")
    // the HTTP message walk is the same legitimate-imperative class
    // as the WARC walkers: one row in, one row out — map-only; the
    // fixture scan prunes to doc_id before the object boundary
    assert(!p.contains("Exchange"),
      s"the HTTP parse must not shuffle:\n${p.take(1200)}")
    assert(!p.linesIterator.exists(l => l.contains("ReadSchema") &&
      !l.contains("ReadSchema: struct<doc_id:bigint>")),
      s"the fixture scan prunes to doc_id:\n${p.take(1200)}")
  }

  test("q_warc_http: WARC→HTTP→link-graph capstone — one lineage, only the two agg Exchanges") {
    val p = plan("q_warc_http")
    // container walk → HTTP parse → 200/text-html gate → decode →
    // hostLinkGraph, ONE lineage (the uri passthrough rides inside
    // the HTTP walk — a join-back would re-derive the walk per
    // branch): exactly hostLinkGraph's two keyed aggregation
    // Exchanges, one fixture scan, no UDF anywhere
    assert(
      p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"exactly the (src,dst,id) collapse + the (src,dst) fold:\n${p.take(1500)}")
    assert(count(p, "Scan parquet") == 1,
      s"one lineage — one fixture scan:\n${p.take(1200)}")
    assert(!p.contains("UDF") && !p.contains("BatchEvalPython"),
      s"no UDF in the capstone:\n${p.take(1200)}")
  }

  test("q_warc_text: WARC→HTTP→visible-text capstone — map-only end to end, one scan, no UDF") {
    val p = plan("q_warc_text")
    // container walk → HTTP parse → gate → decode → tag-strip +
    // entity decode + title: the whole lineage is row-local — zero
    // Exchange at any scale, one fixture scan, no UDF (the
    // extraction is codegen'd regexp_replace passes)
    assert(!p.contains("Exchange"),
      s"visible-text extraction must not shuffle:\n${p.take(1500)}")
    assert(count(p, "Scan parquet") == 1,
      s"one lineage — one fixture scan:\n${p.take(1200)}")
    assert(!p.contains("UDF") && !p.contains("BatchEvalPython"),
      s"no UDF in the text capstone:\n${p.take(1200)}")
  }

  test("q_canonical_collapse: materialized links stage, broadcast stability side, two keyed Exchanges") {
    val p = plan("q_canonical_collapse")
    // the self-join runs over the CHECKPOINTED links stage: both
    // branches scan the materialized RDD — zero parquet re-derivation
    // of the extraction lineage (the operator's materialized-input
    // contract)
    assert(count(p, "Scan ExistingRDD") == 2 &&
      !p.contains("Scan parquet"),
      s"both branches must read the materialized links stage:\n${p.take(1500)}")
    // exactly TWO keyed Exchanges: the stability-side (target URL →
    // declared-set) aggregation and the survivor window's
    // representative partition; the probe side joins the broadcast
    // stability table without re-shuffling
    assert(
      p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"stability agg + survivor window only:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"),
      s"the aggregated stability side broadcasts at fixture scale:\n${p.take(1200)}")
  }

  test("q_rel_canonical: row-local declaration extraction — pruned scan, zero shuffles, no UDF") {
    val p = plan("q_rel_canonical")
    // tag extract + filter HOF + resolution + both canonicalizations
    // are all row-local: any Exchange or UDF means the operator
    // stopped being a map
    assert(!p.contains("Exchange") && !p.contains("UDF") &&
      !p.contains("BatchEvalPython"),
      s"canonical-link extraction must stay a row-local map:\n${p.take(1200)}")
    assert(count(p, "Scan parquet") == 1 &&
      !p.linesIterator.exists(l => l.contains("ReadSchema") &&
        !l.contains("ReadSchema: struct<doc_id:bigint>")),
      s"one doc_id-pruned scan:\n${p.take(1200)}")
  }

  test("q_recrawl_hinted: page collapses + host rank, hints never rejoin the log") {
    val p = plan("q_recrawl_hinted")
    // FOUR keyed Exchanges and no more: the page-keyed estimator
    // collapse, the hint fixture's distinct, the host-keyed rank on
    // the COLLAPSED table, and the hosts-sized budget min-collapse;
    // the page-keyed hint join rides the two collapses' co-partition
    // (a fifth Exchange would mean the join re-shuffled the
    // estimator, or the rank ran on the raw log)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 4,
      s"hinted recrawl is two collapses + rank + budget dedupe:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"),
      s"no stage may go cartesian:\n${p.take(1200)}")
  }

  test("q_robots_rules: host-keyed parse, pruned scan, no cartesian") {
    val p = plan("q_robots_rules")
    // the corpus is hosts-sized; everything keys on host (+group) —
    // a cartesian or nested-loop anywhere means the group-selection
    // join lost its equi-keys
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"robots parse joins stay equi-keyed:\n${p.take(1500)}")
    assert(!p.linesIterator.exists(l => l.contains("ReadSchema") &&
      !l.contains("ReadSchema: struct<doc_id:bigint>")),
      s"the synth corpus scan prunes to doc_id:\n${p.take(1200)}")
  }

  test("funnel stage times: k chained windows + user collapse over ONE Exchange") {
    import graft.analytics.Funnel
    val p = Funnel.stageTimes(Tables.events(spark, Sf),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    // the staged windows all partition on user, and the per-user
    // collapse reuses that partitioning — the whole corpus shuffles once
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"funnel must shuffle the corpus exactly once:\n${p.take(1500)}")
    assert(p.linesIterator.count(_.contains("Window ")) == 3)
  }

  test("q_seq_examples: row_number and the context collect share one WindowExec") {
    val p = plan("q_seq_examples")
    // sessionize (user) + examples (session) = exactly two corpus
    // shuffles; pos and context must not add a third window pass
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"seq examples is sessionize + ONE session-keyed window:\n${p.take(1500)}")
    val exampleWindows = p.linesIterator.count(l =>
      l.contains("Window ") && l.contains("collect_list"))
    assert(exampleWindows == 1 &&
      p.linesIterator.filter(_.contains("collect_list"))
        .forall(_.contains("row_number")),
      s"pos + context must share a single WindowExec:\n${p.take(1500)}")
  }

  test("q_cohort_retention: corpus shuffles on natural keys; sizes ride a broadcast") {
    val p = plan("q_cohort_retention")
    assert(p.contains("BroadcastHashJoin"),
      s"cohort sizes must broadcast back:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"cohort retention must stay equi-join:\n${p.take(1500)}")
  }

  test("continuation-batch plans: bounded shuffles, broadcasts where claimed, no cartesians") {
    def shape(name: String) = {
      val p = plan(name)
      (p, p.linesIterator.count(_.contains("Exchange hashpartitioning")),
        p.linesIterator.count(_.contains("BroadcastHashJoin")),
        p.linesIterator.count(_.contains("CartesianProduct")))
    }
    // markov: corpus pays sessionize + the transition window; the
    // count agg and probability window run on the |states|²-bounded
    // collapsed table — 4 hash exchanges total, nothing pairwise
    val (mp, mex, _, mc) = shape("q_markov")
    assert(mex <= 4 && mc == 0, s"markov shuffles grew:\n${mp.take(1200)}")
    // conformance: the model derivation re-scans sessions (two window
    // passes by design — self-conformance composes two ops); the model
    // itself must ride a broadcast, never a shuffle join
    val (cp, cex, cbc, cc) = shape("q_conformance")
    assert(cex <= 5 && cbc >= 1 && cc == 0,
      s"conformance must broadcast the model:\n${cp.take(1200)}")
    // pps sample: ONE corpus shuffle for the source window, one
    // collapsed totals agg, totals broadcast back
    val (pp, pex, pbc, pc) = shape("q_pps_sample")
    assert(pex == 2 && pbc >= 1 && pc == 0,
      s"pps sample is one corpus window + broadcast totals:\n${pp.take(1200)}")
    // manifest diff: two shard-count aggregates, tiny full-outer
    val (dp, dex, _, dc) = shape("q_manifest_diff")
    assert(dex <= 2 && dp.contains("FullOuter") && dc == 0,
      s"manifest diff is two ledgers + a full-outer:\n${dp.take(1200)}")
    // discriminative terms: the only nested loop allowed is the 1-row
    // corpus-total scalar (the established crossJoin(broadcast) shape)
    val ddp = plan("q_discriminative")
    assert(!ddp.contains("CartesianProduct") &&
      ddp.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"only the 1-row scalar may nested-loop:\n${ddp.take(1500)}")
    val (hp, _, _, hc) = shape("q_hard_negatives_lsh")
    assert(hc == 0, s"hard negatives LSH must stay bucket-joined:\n${hp.take(1200)}")
  }

  test("round-9 fourth-batch plans: unimax broadcast-only corpus, backtest broadcast prediction") {
    def shape(name: String) = {
      val p = plan(name)
      (p, p.linesIterator.count(_.contains("Exchange hashpartitioning")),
        p.linesIterator.count(_.contains("BroadcastHashJoin")),
        p.linesIterator.count(_.contains("CartesianProduct")))
    }
    // unimax: ONE corpus-side hash exchange (the per-source totals
    // aggregate); the waterfill runs on the tiny totals table and the
    // alloc row rejoins the corpus by broadcast — never a shuffle join
    val (up, _, ubc, uc) = shape("q_mix_unimax")
    assert(ubc >= 1 && uc == 0,
      s"unimax alloc must rejoin by broadcast:\n${up.take(1500)}")
    assert(!up.contains("SortMergeJoin"),
      s"unimax must not shuffle-join the corpus:\n${up.take(1500)}")
    // markov backtest: prediction table (≤ |types|) broadcasts back
    // onto the test pairs; no cartesian anywhere
    val (bp, _, bbc, bc) = shape("q_markov_backtest")
    assert(bbc >= 1 && bc == 0,
      s"backtest prediction must ride a broadcast:\n${bp.take(1500)}")
  }

  test("round-9 fifth-batch plans: shuffle bounds, equi-joins, no cartesians") {
    def shape(name: String) = {
      val p = plan(name)
      (p, p.linesIterator.count(_.contains("Exchange hashpartitioning")),
        p.linesIterator.count(_.contains("CartesianProduct")))
    }
    // EFG: the position self-join must be an EQUI-join on the case key
    // (the i<j rank predicate rides as post-filter), never pairwise
    val (ep, eex, ec) = shape("q_efg")
    assert(ec == 0 && !ep.contains("BroadcastNestedLoopJoin") &&
      ep.contains("HashJoin"),
      s"EFG must case-equi-join (hash, any build side):\n${ep.take(1200)}")
    assert(eex <= 5, s"EFG shuffles grew:\n${ep.take(1200)}")
    // episodes: boundary flag, running episode id and the final
    // aggregate all share ONE user-key Exchange over corpus data
    val (pp2, pex2, pc2) = shape("q_episodes")
    assert(pex2 <= 2 && pc2 == 0,
      s"episodes is one user window + partial-agg collapse:\n${pp2.take(1200)}")
    // changepoint: corpus collapses to per-day counts first; the only
    // nested loop allowed is the 1-row bounds broadcast
    val cp2 = plan("q_changepoint")
    assert(!cp2.contains("CartesianProduct") &&
      cp2.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"changepoint: only the 1-row bounds may nested-loop:\n${cp2.take(1500)}")
    // seq patterns: the sessionize prefix pays 2 window ops (lag +
    // running sum, one Exchange); the lead chain must add exactly ONE
    // more — a 4th window would betray a per-k re-scan
    val sp = plan("q_seq_patterns")
    assert(sp.linesIterator.count(_.contains("Window")) <= 3 &&
      !sp.contains("CartesianProduct"),
      s"seqPatterns must build all k levels in one lead-chain pass:\n${sp.take(1200)}")
    // lexical diversity: no join anywhere — two nested aggregates only
    val lp = plan("q_lexical_diversity")
    assert(!lp.contains("Join"), s"lexicalDiversity must be join-free:\n${lp.take(1200)}")
    // rework: sessionize prefix (one user Exchange) + two aggregates —
    // no join anywhere, and only the 2 sessionize windows
    val rp = plan("q_rework")
    assert(!rp.contains("Join") &&
      rp.linesIterator.count(_.contains("Window")) <= 2,
      s"rework is sessionize + aggregates only:\n${rp.take(1200)}")
  }

  test("round-9 sixth-batch plans: join-free aggregates, partitioned sorts") {
    // handover: sessionize window + the mixed-distinct pair aggregate —
    // no join of any kind (the network is a lag, never a self-join)
    val hp = plan("q_handover")
    assert(!hp.contains("Join") && !hp.contains("CartesianProduct"),
      s"handover must be window+aggregate only:\n${hp.take(1200)}")
    // wip: corpus → per-case spans → per-day deltas BEFORE the
    // single-partition running sum; no join, bounded keyed Exchanges
    // ... and the boundary explode is row-local: ONE corpus scan, three
    // keyed Exchanges (sessionize window, case spans, day deltas)
    val wp = plan("q_wip")
    assert(!wp.contains("Join") && count(wp, "Scan parquet") == 1 &&
      wp.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 3,
      s"wip is collapse-then-cumsum over one scan:\n${wp.take(1200)}")
    // interarrival: user lag window + type rank window + final agg —
    // no join, and the type groupBy must REUSE the rank window's
    // partitioning (≤ 2 keyed Exchanges total)
    val ip = plan("q_interarrival")
    assert(!ip.contains("Join") &&
      ip.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"interarrival reuses the type partitioning:\n${ip.take(1200)}")
    // length batching: the sort is PARTITIONED by the length bucket —
    // a global-order range Exchange would be the 100 TB killer
    val lp = plan("q_length_batching")
    assert(!lp.contains("Exchange rangepartitioning") && !lp.contains("Join"),
      s"lengthBatches must never global-sort:\n${lp.take(1200)}")
    assert(lp.contains("hashpartitioning(bucket"),
      s"the batching window partitions on the bucket:\n${lp.take(1200)}")
  }

  test("round-9 seventh-batch plans: one-scan attributions, kernel replay") {
    // multitouch: the direct row is emitted by the conversion row
    // itself — ONE corpus scan, no join, windows share the session key
    val mp = plan("q_multitouch")
    assert(!mp.contains("Join") && count(mp, "Scan parquet") == 1 &&
      mp.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 3,
      s"multitouch is one scan + shared windows:\n${mp.take(1200)}")
    // seasonality: corpus collapses to ≤ types·168 cells before any window
    val sp2 = plan("q_seasonality")
    assert(!sp2.contains("Join") && count(sp2, "Scan parquet") == 1 &&
      sp2.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"seasonality is collapse-then-window:\n${sp2.take(1200)}")
    // textrank: the iteration chain must keep the pageRank contract —
    // top-N by TakeOrdered, never a cartesian
    val tp = plan("q_textrank")
    assert(!tp.contains("CartesianProduct") &&
      tp.contains("TakeOrderedAndProject"),
      s"textrank inherits the pageRank top-N shape:\n${tp.take(1200)}")
    // token replay: sessionize window + per-case collect + variant
    // collapse (three keyed Exchanges) and the net rides INSIDE the
    // compiled kernel — no join anywhere
    val rp2 = plan("q_token_replay")
    assert(!rp2.contains("Join") && rp2.contains("token_replay") &&
      rp2.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 3,
      s"token replay is per-variant kernel work:\n${rp2.take(1200)}")
  }

  test("round-9 eighth-batch plans: no global sorts, shared user windows") {
    // rfm: quintiles come from broadcast percentile bounds — a global
    // ntile (single-partition full sort) must never appear
    val fp = plan("q_rfm")
    assert(!fp.contains("Exchange rangepartitioning") &&
      !fp.contains("RunningWindowFunction") &&
      fp.linesIterator.count(_.contains("Window")) == 0,
      s"rfm must score by broadcast boundaries, not a global rank:\n${fp.take(1200)}")
    // seasonal naive: densify join only — never a cartesian
    val np = plan("q_seasonal_naive")
    assert(!np.contains("CartesianProduct"),
      s"seasonal naive is densify + lags:\n${np.take(1200)}")
    // automation screen: all three windows and the aggregate share the
    // user key — one scan, no join, bounded Exchanges
    val ap = plan("q_automation_screen")
    assert(!ap.contains("Join") && count(ap, "Scan parquet") == 1 &&
      ap.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"automation screen shares the user partition:\n${ap.take(1200)}")
  }

  test("round-9 ninth-batch plans: keyed sessionize, equi-join drift") {
    // batch work: the (resource, activity) sessionize — no join, one
    // scan, windows + aggregate share the partition key
    val bp = plan("q_batch_work")
    assert(!bp.contains("Join") && count(bp, "Scan parquet") == 1,
      s"batchWork is a keyed sessionize:\n${bp.take(1200)}")
    // embed drift: the only join is the (label, dim) full-outer
    // equi-join over the collapsed centroid-sum tables
    val dp = plan("q_embed_drift")
    assert(dp.contains("FullOuter") && !dp.contains("CartesianProduct") &&
      !dp.contains("BroadcastNestedLoopJoin"),
      s"embedDrift joins collapsed sums only:\n${dp.take(1200)}")
  }

  test("round-9 tenth-batch plans: collapsed-table windows, equi-join labels") {
    // k-anonymity report: window math over the collapsed variant
    // table — no join, one scan
    val kp = plan("q_log_anonymize")
    assert(!kp.contains("Join") && count(kp, "Scan parquet") == 1,
      s"kAnonymityReport is collapse + window:\n${kp.take(1200)}")
    // SLA report: case collapse then day-keyed rank window + aggregate
    val lp2 = plan("q_sla_report")
    assert(!lp2.contains("Join") && count(lp2, "Scan parquet") == 1 &&
      lp2.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 3,
      s"slaDaily shares the day Exchange:\n${lp2.take(1200)}")
    // modularity: label attaches are equi-joins over the collapsed
    // edge list (the kNN tier itself is quadratic BY CONTRACT)
    val mp2 = plan("q_modularity")
    assert(!mp2.contains("CartesianProduct"),
      s"modularity never plans a cartesian:\n${mp2.take(1200)}")
  }

  test("round-9 eleventh-batch plans: collapsed-table tails only") {
    // DFG slider: one scan, no join — windows on the edge table
    val sp3 = plan("q_dfg_simplify")
    assert(!sp3.contains("Join") && count(sp3, "Scan parquet") == 1,
      s"dfg simplification is rank math on the collapsed edges:\n${sp3.take(1200)}")
    // role similarity: the |resources|² cross runs on the DISTINCT
    // list (broadcast nested loop over tiny sides) — never a
    // CartesianProduct over corpus rows
    val rp3 = plan("q_role_similarity")
    assert(!rp3.contains("CartesianProduct"),
      s"role cross stays on the collapsed resource list:\n${rp3.take(1200)}")
    // outcome lift: case equi-join + the 1-row baseline broadcast only
    val op = plan("q_outcome_lift")
    assert(!op.contains("CartesianProduct") &&
      op.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"outcome lift: only the 1-row baseline may nested-loop:\n${op.take(1200)}")
  }

  test("round-9 twelfth-batch plans: one-scan paths, collapsed report") {
    // conversion paths: one corpus scan, no join — the direct row is
    // emitted by the conversion row itself (the multiTouch shape)
    val cp3 = plan("q_funnel_paths")
    assert(!cp3.contains("Join") && count(cp3, "Scan parquet") == 1,
      s"paths are one scan + shared case windows:\n${cp3.take(1200)}")
    // process report: the only nested loop is the 1-row top-variant
    // broadcast; everything runs on the case-collapse table
    val pr3 = plan("q_process_report")
    assert(!pr3.contains("CartesianProduct") &&
      pr3.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"process report: only the 1-row cross may nested-loop:\n${pr3.take(1200)}")
  }

  test("round-9 thirteenth-batch plans: one-pass lead chain, collapsed joins") {
    // heuristic deps: BOTH leads ride the sessionize window pass (2
    // sessionize windows + 1 lead window), ONE corpus scan, and the
    // direction merge is JOIN-FREE (the self-join draft re-scanned and
    // re-windowed the corpus 4× — this gate is what caught it)
    val hd = plan("q_heuristic_deps")
    assert(hd.linesIterator.count(_.contains("Window")) <= 3 &&
      !hd.contains("Join") && count(hd, "Scan parquet") == 1,
      s"heuristic deps is one join-free corpus pass:\n${hd.take(1200)}")
    // precision: the allowed-edge set joins BROADCAST (it is bounded by
    // |activities|²), the headline row comes from one rollup Expand —
    // never a union re-scan; the only nested loops are the two 1-row
    // bounds broadcasts (model branch + eval branch)
    val dp = plan("q_dfg_precision")
    assert(!dp.contains("CartesianProduct") &&
      dp.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 2 &&
      dp.contains("BroadcastHashJoin") && dp.contains("Expand"),
      s"precision: broadcast model, rollup headline, bounds-only nested-loop:\n${dp.take(1500)}")
    // trend: the corpus collapses to daily counts first; windows and
    // the moment aggregate run on the calendar-bounded dense table
    val tr = plan("q_trend")
    assert(!tr.contains("CartesianProduct") &&
      tr.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      s"trend: only the 1-row bounds may nested-loop:\n${tr.take(1200)}")
  }

  test("round-9 fourteenth-batch plans: shuffle-free winnow, collapsed screens") {
    // winnow is row-local HOF work + one explode: NO shuffle, NO join
    // — the whole point of the struct-accumulator argmin over the
    // relational starts-join the oracle spells out
    val wn = plan("q_winnow")
    assert(!wn.contains("Exchange") && !wn.contains("Join") &&
      count(wn, "Scan parquet") == 1,
      s"winnow must be shuffle-free row-local work:\n${wn.take(1200)}")
    // benford: corpus collapses to ≤9 digit rows in one partial-agg
    // shuffle; the spine join and windows run on the 9-row table
    val bf = plan("q_benford")
    assert(!bf.contains("CartesianProduct") &&
      count(bf, "Scan parquet") == 1,
      s"benford is one scan + digit-collapsed tail:\n${bf.take(1200)}")
    // chi2: ONE conditional-sum aggregate — no join, no window
    val c2 = plan("q_chi2")
    assert(!c2.contains("Join") && !c2.contains("Window") &&
      count(c2, "Scan parquet") == 1,
      s"chi2 is a single aggregate pass:\n${c2.take(1200)}")
    // pairwise trend: the checkpointed daily table means the corpus
    // never appears in the pair join — ZERO parquet scans in the plan
    // (they happened once, at checkpoint time), no cartesian
    val pt = plan("q_pairwise_trend")
    assert(count(pt, "Scan parquet") == 0 && !pt.contains("CartesianProduct"),
      s"pairwise trend joins the checkpointed daily table only:\n${pt.take(1200)}")
    // gini: two nested collapses + histogram windows — join-free
    val gn = plan("q_gini")
    assert(!gn.contains("Join") && count(gn, "Scan parquet") == 1,
      s"gini is collapse + histogram windows, no join:\n${gn.take(1200)}")
    // dp counts: one key collapse + row-local noise — join-free,
    // window-free
    val dpc = plan("q_dp_counts")
    assert(!dpc.contains("Join") && !dpc.contains("Window") &&
      count(dpc, "Scan parquet") == 1,
      s"dpCounts is one collapse + row-local noise:\n${dpc.take(1200)}")
  }

  test("round-9 fifteenth-batch plans: join-free pairing, broadcast LMs") {
    // lifecycle pairing: the conditional-MAX groupBy replaces the
    // start/complete self-join — one scan, zero joins
    val li = plan("q_lifecycle_intervals")
    assert(!li.contains("Join") && count(li, "Scan parquet") == 1,
      s"interval pairing is window + conditional-MAX, join-free:\n${li.take(1200)}")
    // scd2: boundary lag, version sum and collapse ride the key
    // partitioning; join-free, one scan
    val sc = plan("q_scd2")
    assert(!sc.contains("Join") && count(sc, "Scan parquet") == 1 &&
      sc.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 3,
      s"scd2 is one keyed window chain + collapse:\n${sc.take(1200)}")
    // moore-lewis: all EIGHT model-side joins must BROADCAST (model
    // sizes are bounded) — the only shuffle join allowed is the final
    // doc_id rejoin of the scored aggregate to the corpus
    val mw = plan("q_moore_lewis")
    assert(mw.linesIterator.count(_.contains("SortMergeJoin")) <= 1 &&
      mw.linesIterator.count(_.contains("BroadcastHashJoin")) >= 8 &&
      !mw.contains("CartesianProduct"),
      s"mooreLewis model joins must broadcast (only the doc rejoin shuffles):\n${mw.take(1500)}")
  }

  test("round-9 sixteenth-batch plans: anchor-vote phrase, candidate verify") {
    // phrase search: the anchor-vote aggregation replaces the m-way
    // positional self-join — one scan, the term table broadcast, no
    // shuffle join anywhere
    val ph = plan("q_phrase_search")
    assert(count(ph, "Scan parquet") == 1 && ph.contains("BroadcastHashJoin") &&
      !ph.contains("SortMergeJoin") && !ph.contains("CartesianProduct"),
      s"phrase search is one scan + broadcast terms + anchor groupBy:\n${ph.take(1200)}")
    // heavy hitters: the verify pass joins the corpus to the
    // BROADCAST candidate set — the full-vocabulary shuffle the
    // operator exists to avoid must not appear
    val hhp = plan("q_heavy_hitters")
    assert(hhp.contains("BroadcastHashJoin") && !hhp.contains("SortMergeJoin"),
      s"heavy hitters must broadcast the candidate set:\n${hhp.take(1200)}")
  }

  test("round-9 seventeenth-batch plans: checkpointed wedges, partitioned bins") {
    // link prediction: the kNN build ran once at checkpoint time —
    // the wedge/degree/exclusion branches must all read the
    // checkpointed edge list, never re-scan parquet
    val lk = plan("q_link_predict")
    assert(count(lk, "Scan parquet") == 0 && !lk.contains("CartesianProduct") &&
      lk.contains("BroadcastHashJoin"),
      s"linkPredict works off the checkpointed edges:\n${lk.take(1200)}")
    // compaction: per-partition cumsum — join-free, one scan, and the
    // window must be PARTITIONED (a global file sort would serialize
    // the whole manifest)
    val cpl = plan("q_compaction_plan")
    assert(!cpl.contains("Join") && count(cpl, "Scan parquet") == 1,
      s"compaction plan is collapse + partitioned window:\n${cpl.take(1200)}")
    // remaining time: model broadcasts back, headline via one Expand
    val rt = plan("q_remaining_time")
    assert(rt.contains("BroadcastHashJoin") && rt.contains("Expand") &&
      !rt.contains("CartesianProduct"),
      s"remaining-time: broadcast model + rollup headline:\n${rt.take(1200)}")
    // alignments: the net rides inside the compiled kernel — the
    // variant table joins NOTHING; same contract as token replay
    val al = plan("q_alignments")
    assert(!al.contains("Join") &&
      al.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 3,
      s"alignments: kernel over the collapsed variant table, join-free:\n${al.take(1200)}")
  }

  test("round-9 eighteenth-batch plans: two-phase skyline, equi PIT join") {
    // skyline: the local sweep shows as a MapPartitions over ONE scan;
    // the global window runs on the survivors — no join anywhere
    val sk = plan("q_skyline")
    assert(sk.contains("MapPartitions") && !sk.contains("Join") &&
      count(sk, "Scan parquet") == 1,
      s"skyline is local-sweep prefilter + survivor window:\n${sk.take(1200)}")
    // PIT join: the interval predicate must ride a KEY equi-join as a
    // post-filter — never a nested loop over facts × versions
    val pj = plan("q_pit_join")
    assert(!pj.contains("CartesianProduct") &&
      !pj.contains("BroadcastNestedLoopJoin"),
      s"pitJoin must stay a keyed equi-join:\n${pj.take(1200)}")
    // quantile norm: the only nested loop is the BROADCAST span range
    // join (value-bounded histogram) — never a cartesian
    val qn = plan("q_quantile_norm")
    assert(!qn.contains("CartesianProduct") &&
      qn.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1 &&
      count(qn, "Scan parquet") == 2,
      s"quantile norm: broadcast span lookup over two scans:\n${qn.take(1200)}")
  }

  test("q_snapshot_diff: one full-outer equi-join, never a nested loop") {
    val p = plan("q_snapshot_diff")
    assert(p.contains("FullOuter"),
      s"the ledger is a full-outer reconciliation:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"snapshot diff must stay an equi-join:\n${p.take(1200)}")
  }

  test("q_media_neardup's bucket exchange carries fingerprints, never the media payload") {
    // the mediaNearDups claim: one pass computes the 8-byte dHash and
    // only (id, dhash) structs enter the shuffle — a plan that
    // exchanges the binary column would ship the whole corpus
    val p = plan("q_media_neardup")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(exchanges.nonEmpty)
    assert(!exchanges.contains("media"),
      s"the media payload must not enter any Exchange:\n$exchanges")
    assert(!p.contains("CartesianProduct"),
      "candidates come from the chunk equi-buckets, never all-pairs")
  }

  test("dense-index search broadcasts the probe side into a cluster equi-join") {
    import graft.llm.DenseIndex
    val emb = Tables.embeddings(spark, Sf)
    val idx = DenseIndex.build(emb, "vec_id", "embedding", nClusters = 4).get
    val p = DenseIndex.search(idx, emb.filter(
        org.apache.spark.sql.functions.col("vec_id") < 5),
        "vec_id", "embedding", k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"probes must broadcast into the members join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the member probe is a cluster equi-join, never a nested loop")
  }

  test("q_data_contract is one aggregate pass: a single scan feeds every rule") {
    val p = plan("q_data_contract")
    // two scans total: one for the row-rule aggregate, one for the
    // uniqueness aggregate — NOT one per rule
    assert(count(p, "Scan parquet") == 2,
      s"expected exactly 2 scans (row rules + uniqueness):\n${p.take(1500)}")
  }

  test("q_spearman broadcasts both rank maps and scans only the two value columns") {
    val p = plan("q_spearman")
    assert(count(p, "BroadcastHashJoin") == 2,
      "the corpus joins the bounded rank maps without shuffling itself")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double>"),
      "column pruning must reach the scan")
  }

  test("q_corr_matrix never shuffles the corpus: one scan, no hash exchange") {
    val p = plan("q_corr_matrix")
    assert(count(p, "Scan parquet") == 1)
    assert(!p.contains("Exchange hashpartitioning"),
      "a 1-row moment aggregate needs only the SinglePartition exchange")
  }

  test("q_chi2_rc broadcasts the marginals back onto the bounded cell table") {
    val p = plan("q_chi2_rc")
    assert(count(p, "BroadcastHashJoin") >= 2,
      "row + column marginals broadcast, never a shuffle join")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_lift_curve collapses per score once; totals ride a broadcast, not a shuffle join") {
    val p = plan("q_lift_curve")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"),
      "the 1-row totals join must be a broadcast nested-loop at worst")
  }

  test("q_winsorize broadcasts the per-key fences back onto the corpus") {
    val p = plan("q_winsorize")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_fdr's replica table joins the broadcast observed stats, never a shuffle join") {
    val p = plan("q_fdr")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_neyman pays exactly one corpus shuffle (the stratum moment collapse)") {
    val p = plan("q_neyman")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"one stratum collapse expected:\n${p.take(1200)}")
  }

  test("q_cluster_advisor simulates every layout without a sort-merge or raw cartesian join") {
    val p = plan("q_cluster_advisor")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"),
      "the 1-row totals ride broadcast nested-loop at worst")
  }

  test("q_url_canonical scans ONLY doc_id; one key exchange for the first-seen window") {
    val p = plan("q_url_canonical")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"the 500-char text column must be pruned from the scan:\n${p.take(1200)}")
    assert(!p.contains("Join"),
      "canonicalization + first-seen verdict is window math, never a join")
  }

  test("q_compression_ratio scans only (doc_id, text) and plans no shuffle") {
    val p = plan("q_compression_ratio")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"column pruning must reach the scan:\n${p.take(1200)}")
    assert(!p.contains("Exchange"),
      "the deflate pass is map-only — text never leaves its partition")
  }

  test("q_role_similarity_sparse: no quadratic surface, no cartesian, equi-joins only") {
    val p = plan("q_role_similarity_sparse")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the sparse arm must have NO pair-enumeration surface at all — " +
        s"only the activity-key equi-join:\n${p.take(1500)}")
  }

  test("media capstones: clip/audio payload bytes never enter an exchange") {
    // the banding exchanges must carry only (id, 8-byte hash) rows —
    // walk the physical tree and assert no shuffle OUTPUTS the binary
    // media column (the fixture synth runs post-repartition, decode is
    // map-side, so every exchange downstream of the synth is hash-only)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    for (q <- Seq("q_media_pipeline_audio", "q_media_pipeline_video")) {
      val p = SparkEntry.queries(q)(spark, Sf).queryExecution.executedPlan
      val bad = p.collect {
        case e: ShuffleExchangeExec if e.output.exists(_.name == "media") => e
      }
      assert(bad.isEmpty,
        s"$q shuffles media payload bytes:\n${bad.mkString("\n").take(1200)}")
    }
  }
}
