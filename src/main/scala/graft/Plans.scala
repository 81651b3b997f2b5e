package graft

import java.nio.file.{Files, Paths}


/** Dumps `explain("formatted")` for headline queries to PLANS.md —
  * the physical-plan evidence behind SURVEY §6's scale claims
  * (broadcasts, pushdown, pruned scans, single-shuffle aggregations).
  * Regenerate after plan-affecting changes:
  *   sbt "runMain graft.Plans /root/testdata/sf0.01 PLANS.md [bigSfDir]"
  * The optional third arg adds an EXECUTED final-adaptive plan of the
  * largest shuffle join at that SF (AQE evidence for GATE_SF1.md).
  */
object Plans {
  val headline: Seq[(String, String)] = Seq(
    "b1_agg" -> "pushdown + column pruning + partial aggregation",
    "b2_join_broadcast" -> "dim chain fully broadcast, one grouping shuffle",
    "b6_topk_group" -> "bounded-heap top-k: partial/final agg, no window sort",
    "c1_tumbling_window" -> "single-shuffle windowed aggregation",
    "c18_range_join" -> "bucketed range join: hash equi-join, no nested loop",
    "d7_dedup_minhash" -> "LSH band emission: scan + project, no shuffle",
    "d9_cosine_topk" -> "broadcast query set over one corpus scan",
    "d19_ivf_ann" -> "IVF: broadcast centroids/probes, no corpus self-shuffle",
    "d20_stratified_sample" -> "broadcast rates dim, pruned scan",
    "c20_interval_overlap" -> "interval overlap: bucketed hash equi-join, no nested loop",
    "d25_doc_chunk" -> "chunk expansion: scan + generate, zero shuffle",
    "d26_pack_sequences" -> "hierarchical prefix sum: block windows + broadcast offsets, no single-partition window over the corpus",
    "d30_incremental_dedup" -> "incremental dedup: every index probe an equi-join (content anti-join, band-bucket probe, signature verify); no index broadcast or rescan",
    "d31_repetition_filter" -> "repetition signals: per-row gram arithmetic + one combiner-friendly (doc, gram) agg, no corpus-global stage",
    "d32_semantic_dedup" -> "semantic dedup: broadcast-centroid argmax assignment, exact integer Lloyd mean, cluster-blocked pair join",
    "d33_shard_pack" -> "shard pack: hash shard + per-shard window rank, no global sort",
    "b23_grouping_sets" -> "grouping sets: one Expand over a single grouping shuffle",
    "d34_boilerplate_ngrams" -> "boilerplate grams: combiner-friendly df agg, frequent set broadcast into a semi-join (no corpus re-shuffle)",
    "d35_norm_dedup" -> "normalization dedup: one hash-partitioned window on the canonical hash, zero candidate generation",
    "d36_media_thumb" -> "media thumbnails: n_chars metadata predicate pushed to the scan before any payload byte, per-partition batched kernel",
    "d11_ann_lsh" -> "multi-probe LSH: corpus hashed once per table; (tbl,bkt) probe keys and q_vec broadcast separately; dedup shuffle carries scores, not vectors",
    "d37_ivf_index" -> "persisted IVF probe: broadcast centroids/probes, inverted-lists scan dynamic-partition-pruned to the probed cids",
    "d38_bpe_tokens" -> "BPE token accounting: scan + project only — the merge fold is constant-folded column arithmetic, zero shuffle, no UDFs",
    "d39_span_dedup" -> "corpus span dedup: first-owner via partial-agg groupBy (skew-safe, no hot-key window), equi-join mark, per-doc rebuild agg",
    "d41_hash_quality" -> "hashed-linear quality gate: scan + project only — the model rides as one array literal, zero shuffle, no UDFs",
    "d42_topic_cluster" -> "topic clustering: broadcast-centroid argmax assignment, bounded (cid,label) partial-agg roll-up, no corpus self-join",
    "d44_embed_text" -> "hash embedding: scan + project only — tokens hashed once, all components fold over the shared array, zero shuffle",
    "d45_curriculum" -> "curriculum staging: quartile boundaries as plan literals over one corpus scan — zero shuffle, no window, no cache (the histogram walk runs eagerly at build on bounded frames)",
    "d46_span_index" -> "incremental span dedup: BUCKETED index side joins exchange-free (only the batch shuffles); batch-first owner via partial-agg min(struct); per-doc rebuild agg",
    "d47_full_curate" -> "full curation DAG: returned plan reads only the scratch-staged narrow artifact (zero raw-text scans, zero cache); rates and quartile bounds broadcast/literal",
    "d48_index_loop" -> "dedup-index ingest loop: the returned report is a union of the staged batch-1 fates and the batch-2 probe (equi-joins against the post-append index tables; nothing corpus-sized collected)",
    "d49_bloom_decontam" -> "bloom-prefiltered decontamination: the codegen'd might_contain literal filters the train gram stream INSIDE the scan's codegen span, before the first exchange; only the surviving sliver shuffles, and the df-cap + pair joins run on that sliver",
    "d50_pq_ann" -> "product quantization: codebooks ride as m·kc broadcast rows (train is an eager dim-collect); encode is one corpus pass with a single partial-agg argmax; ADC probe joins codes to broadcast codebooks + broadcast queries — the corpus's raw embedding column feeds only the (priced-in) in-query encode, never the probe",
    "d51_ivfadc" -> "IVFADC: coarse centroids + codebooks broadcast; probe set = per-query rank over the broadcast coarse table; candidates = equi-join on cid (~nprobe/kc of the corpus), scored via code reconstruction — no corpus self-join, no corpus-sized window",
    "d57_adc_rerank" -> "IVFADC+R: the d51 shortlist chain, then ONE refinement join — shortlist+queries broadcast onto the corpus vector table (vid+vec columns only), exact-cosine re-rank of kShort rows per query, never a corpus scan",
    "d58_spann_ann" -> "SPANN closure lists: assignment is scan + in-row sort over an array-literal centroid table (no crossJoin, no window, NO exchange — plan-pinned); probe reads ONE list via the broadcast probe equi-join; candidate distinct is a partial-agg over the probe sliver",
    "d59_ppl_tiers" -> "CCNet perplexity tiers: LM costs ride as one array literal over a fully map-side scoring pass; tercile cutoffs from a bounded (<=63k-row) histogram — the only window runs over that dim frame, the corpus is never sorted or re-shuffled",
    "d60_winnow_pairs" -> "winnowing: gram hashing + window-min selection + per-doc distinct ALL in-row (one scan); only the ~2/(w+1)-sparse fingerprint stream explodes into the df-capped bounded-heap posting-list agg",
    "d61_kmv_sketch" -> "KMV sketch: distinct-hash partial agg then a bounded top-k heap per source — <= k·partitions sketch rows shuffle; estimator arithmetic is plan-literal integer div, no window, no sort",
    "d53_cdc_chunks" -> "CDC chunking: ONE compiled kernel (CdcChunkRows) inside the scan's project — tokenize/boundaries/dual folds in a single pass, no interpreted HOF lambdas (r15 part-3 kernel, 16.9x) — then a partial-combine chunk-key agg",
    "d66_hard_negatives" -> "hard negatives: broadcast query set over one corpus scan; ONE bounded window partitioned by (q_id, same-label) ranks positives and negatives independently")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = graft.engine.Session
      .builder(master = "local[4]", shufflePartitions = 4, appName = "graft-plans")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of headline queries\n\n")
    sb.append("Generated by `graft.Plans` (explain format: formatted; ")
    sb.append(s"data: $sfDir). Evidence for SURVEY §6: look for\n")
    sb.append("`BroadcastHashJoin`, `PushedFilters`, pruned `ReadSchema`,\n")
    sb.append("partial (`HashAggregate` twice) aggregation, and the absence\n")
    sb.append("of `SortMergeJoin`/`BroadcastNestedLoopJoin` where claimed.\n")
    for ((name, why) <- headline) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name — $why\n\n```\n$plan```\n")
      spark.catalog.clearCache()
    }

    // Star-CC round structure (d18's loop body): one alternating
    // large-star + small-star pass over the canonical edge set. The
    // loop itself localCheckpoints each round (O(1) plan depth), so
    // the per-round plan below IS the repeated unit — two
    // hash-partitioned groupBy+join passes, no per-node adjacency
    // materialization beyond a per-group MIN.
    {
      import org.apache.spark.sql.functions._
      val edges = spark.range(0, 1000)
        .select(col("id").as("s"), (col("id") + 1).as("g"))
      val round = graft.dedup.Dedup.ccSmallStar(
        graft.dedup.Dedup.ccLargeStar(edges))
      val plan = round.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append("\n## star-CC round (d18 loop body) — two groupBy+join passes, " +
        "hash-partitioned, O(log diameter) rounds\n\n```\n" + plan + "```\n")
    }

    // Executed (final-adaptive) plan at the big SF, if one was
    // passed: proves AQE re-planned at runtime (isFinalPlan=true,
    // AQEShuffleRead) on the largest shuffle join in the catalog.
    // The synthetic tables are deliberately uniform, so the
    // OptimizeSkewedJoin rule has nothing to fire on — the skew
    // defense exercised by tests is b18's explicit salting
    // (SkewStressSpec); what this section evidences is the runtime
    // re-plan machinery being live at sf1.0.
    for (bigDir <- args.drop(2).headOption) {
      val df = SparkEntry.queries("b3_join_shuffle")(spark, bigDir)
      // Execute THIS QueryExecution (count() would wrap the frame in
      // a new one and leave this plan unexecuted / isFinalPlan=false).
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## b3_join_shuffle @ $bigDir — executed final " +
        "adaptive plan (AQE engaged at sf1.0)\n\n```\n" + plan + "```\n")
      spark.catalog.clearCache()
    }

    // Plan-shape inventory over the ENTIRE catalog: one row per
    // SURVEY §2 key with the counts a scale audit starts from (hash
    // shuffles, broadcast vs sort-merge joins, nested loops, windows,
    // whether a parquet pushdown survived). The headline sections
    // above show full plans; this table is the completeness net —
    // every implemented key's physical shape is on record at HEAD.
    // (Streaming keys execute one micro-batch to produce their
    // result frame; their row reflects the returned batch plan.)
    sb.append("\n## Plan-shape inventory — every catalog key\n\n")
    sb.append("Counted on `executedPlan` at " + sfDir + ". `shuffles` = ")
    sb.append("`Exchange hashpartitioning` nodes; `bhj`/`smj`/`bnlj` = ")
    sb.append("broadcast-hash / sort-merge / broadcast-nested-loop joins; ")
    sb.append("`win` = window operators; `push` = scan with non-null-only ")
    sb.append("PushedFilters.\n\n")
    sb.append("| key | shuffles | bhj | smj | bnlj | win | push |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val row = try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString()
        val ls = p.linesIterator.toSeq
        def c(tok: String) = ls.count(_.contains(tok))
        val pf = "PushedFilters: \\[([^\\]]*)\\]".r
        val push = ls.exists(l => pf.findFirstMatchIn(l).exists(
          _.group(1).replaceAll("IsNotNull\\([^)]*\\)", "").contains("(")))
        s"| $name | ${c("Exchange hashpartitioning")} | ${c("BroadcastHashJoin")} " +
          s"| ${c("SortMergeJoin")} | ${c("BroadcastNestedLoopJoin")} " +
          s"| ${c("Window")} | ${if (push) "yes" else "-"} |"
      } catch {
        case e: Exception => s"| $name | (failed: ${e.getClass.getSimpleName}) ||||||"
      }
      sb.append(row + "\n")
      spark.catalog.clearCache()
    }

    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote plans to $out")
    spark.stop()
  }
}
