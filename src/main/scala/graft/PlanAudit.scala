package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: regenerates PLANS.md — the formatted Catalyst plans
  * of the representative queries with the scale-relevant properties called
  * out (pushdown, pruning, partial aggregation, join strategy, absence of
  * cartesian/window anti-patterns). Run after plan-shape changes:
  *
  *   sbt "runMain graft.PlanAudit [sfDir]"
  *
  * The properties asserted here are ALSO test-enforced (AnnSpec plan tests,
  * OperatorSpec pushdown test); this artifact exists so a reviewer can read
  * the actual plans without running anything.
  */
object PlanAudit {

  private case class Audit(name: String, note: String,
      mustContain: Seq[String] = Seq.empty, mustNotContain: Seq[String] = Seq.empty,
      /** (substring, n): must occur EXACTLY n times in the plan TREE
        * (details section excluded) — how single-materialization is
        * asserted: a pipeline double-compute would show the cached chain's
        * nodes a second time outside the one InMemoryRelation. */
      exactInTree: Seq[(String, Int)] = Seq.empty)

  private val audits = Seq(
    Audit("q1_agg",
      "scan-side pushdown and pruning: the shipdate filter reaches the " +
        "parquet scan (PushedFilters) and only the 6 needed columns are " +
        "read (ReadSchema); partial_ HashAggregate runs map-side before " +
        "the single exchange.",
      mustContain = Seq("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate",
        "partial_sum"),
      mustNotContain = Seq("CartesianProduct")),
    Audit("q2_join_agg",
      "dimension joins broadcast (customer, nation) — the fact table " +
        "never shuffles for the join; one exchange for the final group-by.",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    Audit("dedup_exact",
      "duplicate counting is groupBy (map-side partial) + join back — no " +
        "Window over the cluster key, so a mega-cluster cannot pin one " +
        "reducer.",
      mustContain = Seq("partial_count"),
      mustNotContain = Seq("Window")),
    Audit("dedup_minhash",
      "the band-bucket self-join exchanges (band, bucket, doc_id) rows " +
        "only; signatures are re-fetched by doc id for the verify stage; " +
        "signature computation is persisted (InMemoryTableScan) so its " +
        "three consumers share one pass.",
      mustContain = Seq("InMemoryTableScan"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Audit("dedup_embedding",
      "LSH candidate pairs carry ids only; vectors join back by id; no " +
        "inequality-only join anywhere.",
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Audit("ann_lsh",
      "banded multi-table index probe: equi-join on (table, bucket), " +
        "query side broadcast, exact-cosine verify on candidates only.",
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Audit("kg_graph_stats",
      "hot-entity defense: salted two-phase aggregation (partial on the " +
        "salted key, final on the real key) — semantics proven identical " +
        "to the plain group-by by the DuckDB oracle.",
      mustContain = Seq("partial_"),
      mustNotContain = Seq("CartesianProduct")),
    Audit("text_quality",
      "narrow codegen'd built-ins at scan speed: scan + projections are " +
        "one narrow stage — the ONLY exchange in the plan is the final " +
        "orderBy's range partitioning (no hash shuffle anywhere); no UDF.",
      mustContain = Seq("rangepartitioning("),
      mustNotContain = Seq("hashpartitioning(")),
    Audit("kg_acceptance",
      "acceptance P/R interval join: equi-keyed on (url, entity_class) " +
        "with the span-overlap residual — never a cartesian or a " +
        "nested-loop join — and NO forced broadcast hint (the gold side " +
        "is corpus-derived here; Catalyst stays free to sort-merge at " +
        "scale). The join output and both distinct span sets are " +
        "persisted (InMemoryTableScan) so the theta-join executes once, " +
        "and tp/fp/fn come from ONE union + grouped presence flags over " +
        "(side, span) + one aggregation — the round-6 exceptAll + " +
        "left_anti two-pass (two extra full shuffles per score) is gone " +
        "and must stay gone.",
      mustContain = Seq("InMemoryTableScan", "Union", "partial_"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "Except", "LeftAnti")),
    Audit("dedup_substring",
      "substring-anchored dedup: winnowed fingerprint postings are " +
        "persisted once (InMemoryTableScan); mega-postings leave via a " +
        "broadcast ANTI join BEFORE the pair self-join (hot anchors never " +
        "shuffle to a single reducer); pairs carry ids only.",
      mustContain = Seq("InMemoryTableScan", "LeftAnti"),
      mustNotContain = Seq("CartesianProduct", "Window")),
    Audit("dedup_substring_spans",
      "span-level ExactSubstr: the anchor table (md5 key, id, pos) is " +
        "persisted once and feeds both the duplicate-key count and the " +
        "LEFT SEMI mark-back — duplicate marking is count-then-semi-join, " +
        "never a key self-join, so a corpus-wide boilerplate window costs " +
        "its own row count, not a pair explosion; the cleaned-text rejoin " +
        "is a plain equi-join on doc_id (one row per doc per side); no " +
        "Window over the key.",
      mustContain = Seq("InMemoryTableScan", "LeftSemi"),
      mustNotContain = Seq("CartesianProduct", "Window",
        "BroadcastNestedLoopJoin")),
    Audit("pack_sequences",
      "GPT-style concat-and-cut sequence packing: global token offsets " +
        "come from the two-phase distributed prefix-sum over the persisted " +
        "range-partitioned token table (InMemoryTableScan; the driver sees " +
        "ONE row per partition, never per doc) — the naive single-task " +
        "global window (sum OVER (ORDER BY doc_id) with no partition key) " +
        "must stay out of the plan; sequence stats are one " +
        "partial-aggregated groupBy over uniform chunk ids.",
      mustContain = Seq("InMemoryTableScan", "partial_"),
      mustNotContain = Seq("Window", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    Audit("c4_three_sentence_dedup",
      "C4's corpus-level 3-sentence-span dedup: windows shuffle as 16-byte " +
        "md5 keys off the persisted window table (InMemoryTableScan); the " +
        "canonical-occurrence mark-back goes through the shared 16-way " +
        "salted join (the banner span is one corpus-hot key, same shape as " +
        "the CCNet paragraph dedup) — no Window over the span key.",
      mustContain = Seq("InMemoryTableScan", "partial_"),
      mustNotContain = Seq("CartesianProduct", "Window",
        "BroadcastNestedLoopJoin")),
    Audit("dedup_paragraph",
      "corpus-wide paragraph dedup: paragraphs shuffle as 16-byte md5 " +
        "keys with map-side partial counting; the boilerplate hot " +
        "paragraph joins back through the shared 16-way salted join — no " +
        "Window over the paragraph key.",
      mustContain = Seq("partial_count"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    Audit("kg_acceptance_linking",
      "linking-level acceptance: the interval join is persisted and " +
        "feeds both mapping re-keys once (InMemoryTableScan); the " +
        "per-source tp/fp/fn set-compare is ONE union + grouped presence " +
        "flags on the 7-column mapping identity (null-safe, matching the " +
        "reference's set algebra) + one partial-aggregated group-by — " +
        "not a full-outer join (NULL keys would split) and not intersect " +
        "+ two excepts (three shuffles of both sides); no broadcast " +
        "dependence on either corpus-derived side.",
      mustContain = Seq("InMemoryTableScan", "Union", "partial_"),
      mustNotContain = Seq("FullOuter", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    Audit("kg_acceptance_corpus",
      "corpus×corpus acceptance (re-crawl comparison): BOTH span sets are " +
        "corpus-sized, so the overlap predicate rides the bucketed " +
        "(url, class, bucket) equi-join — no broadcast dependence on " +
        "either side, no nested-loop fallback; both sides' distinct span " +
        "sets are persisted once for the tp/fp/fn consumers, which read " +
        "them through the same one-pass union+flags form as kg_acceptance.",
      mustContain = Seq("InMemoryTableScan", "Union"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "Except", "LeftAnti")),
    Audit("kg_mutations",
      "mutation NER (C9) is a pure narrow flatMap over the document scan " +
        "— the single exchange in the plan is the deterministic-output " +
        "orderBy's range partitioning; no hash shuffle, no join, so at " +
        "100 TB it runs at scan speed like the other per-doc planes.",
      mustContain = Seq("rangepartitioning("),
      mustNotContain = Seq("hashpartitioning(", "CartesianProduct")),
    // ---- suffixed-pipeline rows (round-7 directive: the one query family
    // previously without an audit — a regression to a second transformer
    // pass or an unpersisted pipeline double-compute would hide here). The
    // shared shape: the sliced+suffixed pipeline is materialized EXACTLY
    // once (one InMemoryRelation; the pipeline's fused MapPartitions chain
    // appears once inside it and once for the downstream triples pass),
    // and the only other parquet read is the cheap narrow lens projection
    // joined back for suffix-region filtering.
    Audit("kg_abbrev",
      "Schwartz–Hearst e2e row: ONE pipeline materialization (persisted " +
        "docs), the original-length lens is a separate narrow scan joined " +
        "back; no second pipeline chain outside the cache.",
      mustContain = Seq("InMemoryTableScan"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin"),
      exactInTree = Seq("InMemoryRelation" -> 1)),
    Audit("kg_disambig",
      "disambiguation-ladder row: same single-materialization contract as " +
        "kg_abbrev — exactly one cached sliced pipeline.",
      mustContain = Seq("InMemoryTableScan"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin"),
      exactInTree = Seq("InMemoryRelation" -> 1)),
    Audit("kg_gilda_disambig",
      "per-strategy (E10) row: one cached sliced pipeline, no duplicate " +
        "inference pass.",
      mustContain = Seq("InMemoryTableScan"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin"),
      exactInTree = Seq("InMemoryRelation" -> 1)),
    Audit("kg_annotation_prior",
      "per-strategy (E11) row — where the round-6 phantom regression was " +
        "suspected to hide: one cached sliced pipeline; resources ride the " +
        "per-(app, version) broadcast memo, re-shipped never, so repeat " +
        "runs add no fleet re-distribution.",
      mustContain = Seq("InMemoryTableScan"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin"),
      exactInTree = Seq("InMemoryRelation" -> 1)),
    Audit("kg_embed_default_label",
      "per-strategy (E13) row: one cached sliced pipeline.",
      mustContain = Seq("InMemoryTableScan"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin"),
      exactInTree = Seq("InMemoryRelation" -> 1)),
    Audit("kg_xref",
      "E17 xref fan-out row: one cached sliced pipeline; the multi-target " +
        "expansion happens inside the fused per-doc chain, not as a join.",
      mustContain = Seq("InMemoryTableScan"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin"),
      exactInTree = Seq("InMemoryRelation" -> 1)),
    Audit("kg_opsin",
      "OPSIN (C9 chemistry) row: pure narrow per-doc plane — construct " +
        "docs, annotate via one mapPartitions, flatMap mappings; the only " +
        "exchange is the deterministic-output orderBy's range " +
        "partitioning. No persist needed (single consumer), no join.",
      mustContain = Seq("rangepartitioning("),
      mustNotContain = Seq("hashpartitioning(", "CartesianProduct",
        "InMemoryTableScan")),
    Audit("kg_spacy_ner",
      "spaCy-step (C8) row: pure narrow per-doc plane — construct docs, " +
        "ruler-annotate via one mapPartitions, flatMap entity rows; the " +
        "only exchange is the deterministic-output orderBy's range " +
        "partitioning. No persist (single consumer), no join.",
      mustContain = Seq("rangepartitioning("),
      mustNotContain = Seq("hashpartitioning(", "CartesianProduct",
        "InMemoryTableScan")),
    Audit("kg_stanza_sentences",
      "stanza-step (C10) row: same narrow per-doc shape as kg_spacy_ner — " +
        "segment via one mapPartitions, flatMap span/error rows, " +
        "range-partitioned sink sort only.",
      mustContain = Seq("rangepartitioning("),
      mustNotContain = Seq("hashpartitioning(", "CartesianProduct",
        "InMemoryTableScan")),
    Audit("multimodal_neardup",
      "identical-image clustering: per-hash counts group with map-side " +
        "partial aggregation and join back through the shared 16-way " +
        "SALTED join (no Window over the hash key, no broadcast " +
        "dependence) — a same-logo mega-cluster spreads over 16 reducers.",
      mustContain = Seq("partial_count"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // ---- round-8 additions: the three shapes the r7 VERDICT flagged as
    // unfenced (lm_surprisal's plan had already changed once that round
    // with no audit) plus kg_cooccurrence, whose shape changed this round.
    Audit("lm_surprisal",
      "unigram LM surprisal (CCNet shape): ONE corpus word pass — the " +
        "narrow token flatMap is recomputed for the scoring join (scan " +
        "speed) while the VOCABULARY-sized counts table is what persists, " +
        "read twice (model total + scoring join = exactly two " +
        "InMemoryTableScans). The corpus-sized token table must never be " +
        "the cached side (at 100 TB it is more bytes than the corpus); " +
        "the one-row total rides a broadcast cross join, never a driver " +
        "collect; the vocabulary join is a plain equi-join Catalyst is " +
        "free to re-plan by size (no forced broadcast hint on it).",
      mustContain = Seq("partial_", "BroadcastNestedLoopJoin Cross"),
      mustNotContain = Seq("CartesianProduct", "Window"),
      exactInTree = Seq("InMemoryTableScan" -> 2)),
    Audit("corpus_mix",
      "temperature corpus mixing (mT5/PaLM α=0.5): exact integer isqrt " +
        "quotas; the single-row denominator reaches every row via a " +
        "broadcast CROSS join of the one-row aggregate — never a driver " +
        "collect — and per-language counts partial-aggregate map-side; " +
        "works unchanged for 5 languages or millions of hosts.",
      mustContain = Seq("partial_", "BroadcastNestedLoopJoin Cross"),
      mustNotContain = Seq("CartesianProduct", "Window")),
    Audit("c4_quality",
      "C4 line/page rules: a pure narrow per-doc map — the only exchanges " +
        "are the scale-adaptive scan spread (round-robin, no-op at " +
        "production split counts) and the deterministic-output orderBy's " +
        "range partitioning; no hash shuffle, no join, scan-speed at " +
        "100 TB.",
      mustContain = Seq("RoundRobinPartitioning", "rangepartitioning("),
      mustNotContain = Seq("hashpartitioning(", "CartesianProduct",
        "Window")),
    Audit("kg_cooccurrence",
      "entity co-occurrence edges (r8 shape): per-doc top-N cap and pair " +
        "generation happen IN-ROW via higher-order functions off one " +
        "groupBy(url) — the round-7 Window(row_number) + url self-join " +
        "(extra exchange + sort, twice-read capped subtree) must stay " +
        "gone; the cap-truncation observe metric (CollectMetrics) must " +
        "survive; and the quadratic pair fanout runs at cluster width via " +
        "the round-robin repartition (its cost per input byte is ~10^3x " +
        "the scan's, so AQE's byte-based coalescing must not size it).",
      mustContain = Seq("CollectMetrics", "RoundRobinPartitioning",
        "partial_"),
      mustNotContain = Seq("Window", "SortMergeJoin", "BroadcastHashJoin",
        "CartesianProduct"))
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit of representative queries\n\n")
    sb.append(s"Generated by `graft.PlanAudit` against `$sfDir`. Each section: the\n")
    sb.append("scale property the plan must exhibit, then the formatted plan\n")
    sb.append("(initial plan; AQE may re-plan exchanges at runtime). The audit\n")
    sb.append("FAILS LOUDLY if a plan regresses out of its required shape.\n")
    audits.foreach { a =>
      val df = SparkEntry.queries(a.name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      a.mustContain.foreach(s => require(plan.contains(s),
        s"${a.name}: expected plan to contain '$s'"))
      a.mustNotContain.foreach(s => require(!plan.contains(s),
        s"${a.name}: plan regression — contains '$s'"))
      if (a.exactInTree.nonEmpty) {
        // tree section = everything before the first node-detail block
        val tree = plan.split("\n\\(1\\) ", 2)(0)
        a.exactInTree.foreach { case (s, n) =>
          // literal substring count via indexOf — needles like
          // "rangepartitioning(" are not valid regexes, and sliding-window
          // string materialization is O(len·|s|) allocation for nothing
          var c = 0
          var at = tree.indexOf(s)
          while (at >= 0) { c += 1; at = tree.indexOf(s, at + 1) }
          require(c == n,
            s"${a.name}: expected '$s' x$n in plan tree, found x$c")
        }
      }
      // release per-query persists so successive audited queries don't
      // stack cached pipelines
      graft.util.CacheRegistry.releaseAll()
      sb.append(s"\n## ${a.name}\n\n${a.note}\n\n```\n")
      // keep the operator tree + the details of scan/aggregate/join nodes;
      // cap at a readable size
      sb.append(plan.take(6000))
      if (plan.length > 6000) sb.append("\n... (truncated)\n")
      sb.append("```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"PLANS.md written (${audits.size} plans audited)")
    spark.stop()
  }
}
