package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.broadcast.Broadcast
import graft.model._
import graft.index.Resources
import graft.ner.{TokenClassifier, TrieNer}
import graft.link.{ClassFilter, DictionaryLinking, EntityClassDisambiguation, Ladders, MappingStep, StrategyRunner}
import graft.post.{Cleanup, MergeOverlaps}

/** Stage composition + checkpoint/resume + per-partition lineage
  * (ref Pipeline driver, kazu/pipeline/__init__.py:132-326; step order
  * kazu/conf/Pipeline/default.yaml:3-11; resumability per the north rule).
  *
  * Every stage is a narrow `Dataset[KDoc] => Dataset[KDoc]` map — the only
  * shuffle boundaries in the whole flow are input partitioning and the final
  * triple-side aggregations (SURVEY.md §3.1). Failure isolation: per-doc
  * try/catch writes the error into the row (`KDoc.error`), so one bad page
  * never kills a task; failed rows route to the failures table.
  *
  * Checkpointing: each named stage can persist to `<dir>/<stage>` (parquet
  * here; Iceberg snapshots in production — same contract: atomic replace +
  * readable-by-version). On resume, a stage directory that already exists is
  * read instead of recomputed, making any run resumable mid-corpus. Each
  * checkpoint write also appends per-partition lineage rows (stage,
  * partition, counts, resource/model versions, wall time).
  */
object Pipeline {

  final case class Config(
      checkpointDir: Option[String] = None,
      resume: Boolean = false,
      runId: String = "run-0",
      resourceVersion: String = "synthetic-ontology/1",
      // opt-in int8 transformer inference (the reference's quantization
      // plane, kazu/quantization/ — enabled via pipeline config there too)
      int8Transformer: Boolean = false
  ) {
    /** Lineage records the version of the session this config actually
      * selects — never a free-floating string, so float and int8 outputs
      * cannot mix under one model label. */
    def modelVersion: String =
      graft.ner.TokenClassifier.executorSession(int8Transformer).version
  }

  final class Run(
      spark: SparkSession,
      cfg: Config,
      val lineage: scala.collection.mutable.ArrayBuffer[LineageRow]
  ) {
    import spark.implicits._

    /** Checkpoint one stage to a versioned snapshot table ([[Snapshots]]:
      * the Iceberg contract — stage a complete `v=<n>` dir, then publish by
      * atomic pointer swap, old snapshots stay readable by version).
      * Cluster-safe: all decisions go through the Hadoop FileSystem of the
      * checkpoint URI (file:, hdfs:, s3a:, ...), and resume only ever binds
      * to a PUBLISHED complete snapshot. Lineage is gathered in a single
      * pass DURING the snapshot write (accumulator keyed by partition id —
      * task retries overwrite, never double-count) and persisted to a
      * `_LINEAGE` sidecar inside the snapshot, so a resumed run recovers
      * the stage's lineage without re-reading the stage table.
      */
    def stage(name: String, ds: => Dataset[KDoc]): Dataset[KDoc] =
      cfg.checkpointDir match {
        case None => ds
        case Some(dir) =>
          val table = new org.apache.hadoop.fs.Path(s"$dir/$name")
          val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val t0 = System.currentTimeMillis()
          val current = Snapshots.currentVersion(fs, table)
          val resumed = cfg.resume && current.isDefined
          val version =
            if (resumed) current.get else Snapshots.nextVersion(fs, table)
          val vPath = Snapshots.versionPath(table, version)
          val sidecar = new org.apache.hadoop.fs.Path(vPath, "_LINEAGE")
          if (!resumed) {
            val acc = spark.sparkContext
              .collectionAccumulator[(Int, Long, Long)](s"graft-lineage-$name")
            // count inside the write path: the parquet writer drains every
            // partition iterator fully, so the on-exhaustion accumulator
            // update always fires exactly once per task attempt
            ds.mapPartitions(Pipeline.countedPartition(acc))
              .write.mode("overwrite").parquet(vPath.toString)
            val counts = Pipeline.dedupCounts(acc)
            val out = fs.create(sidecar, true)
            counts.foreach { case (pid, n, f) => out.write(s"$pid,$n,$f\n".getBytes("UTF-8")) }
            out.close()
            Snapshots.publish(fs, table, version) // atomic replace
          }
          val wall = System.currentTimeMillis() - t0
          val counts: Seq[(Int, Long, Long)] =
            if (!fs.exists(sidecar)) Seq.empty
            else {
              val in = fs.open(sidecar)
              val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
              txt.linesIterator.filter(_.nonEmpty).map { l =>
                val Array(p, n, f) = l.split(","); (p.toInt, n.toLong, f.toLong)
              }.toSeq
            }
          counts.foreach { case (pid, n, fails) =>
            lineage += LineageRow(name, pid, s"$vPath/part-$pid",
              cfg.resourceVersion, cfg.modelVersion,
              rowsIn = n, rowsOut = n, failures = fails,
              wallMs = if (resumed) 0L else wall, runId = cfg.runId)
          }
          spark.read.parquet(vPath.toString).as[KDoc]
      }
  }

  /** Time-travel read of a checkpointed stage: `version < 0` resolves the
    * published current snapshot. */
  def readStage(
      spark: SparkSession,
      checkpointDir: String,
      stage: String,
      version: Long = -1L
  ): Dataset[KDoc] = {
    import spark.implicits._
    val table = new org.apache.hadoop.fs.Path(s"$checkpointDir/$stage")
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v =
      if (version >= 0) {
        // explicit time travel must honor the same completeness gate as
        // pointer resolution: a crashed staging attempt leaves part files
        // without _SUCCESS, and reading them would silently truncate
        require(fs.exists(new org.apache.hadoop.fs.Path(
            Snapshots.versionPath(table, version), "_SUCCESS")),
          s"snapshot v=$version of $table is incomplete (no _SUCCESS)")
        version
      } else Snapshots.currentVersion(fs, table).getOrElse(
        sys.error(s"no published snapshot for $table"))
    spark.read.parquet(Snapshots.versionPath(table, v).toString).as[KDoc]
  }

  /** Operator fusion: all post-extract stages are per-document pure
    * functions, so without checkpoint boundaries they compose into ONE
    * `mapPartitions` — one encoder deserialize + serialize per document for
    * the whole pipeline instead of one per stage. At 32 cores this roughly
    * halves allocation/memory traffic, which is the scaling bottleneck of
    * the staged plan (each stage boundary re-materializes the full nested
    * KDoc row). Checkpointed runs keep the staged path: resumability is
    * exactly the ability to cut the fused chain.
    */
  def fusedStages(
      resources: Resources,
      runner: StrategyRunner,
      classRules: ClassFilter.Rules,
      withTransformerNer: Boolean,
      splitter: graft.ner.EntitySplitter.Config = graft.ner.EntitySplitter.Config.default,
      useExplosionMatcher: Boolean = false,
      classDisambig: EntityClassDisambiguation.Config =
        EntityClassDisambiguation.Config(Map.empty),
      xrefs: Option[graft.link.Xref.XrefMap] = None,
      int8Transformer: Boolean = false
  )(docs: Iterator[KDoc]): Iterator[KDoc] = {
    val session = TokenClassifier.executorSession(int8Transformer)
    // gazetteer step selection, as the reference configures its pipeline
    // steps: the char automaton (default) or the explosion-style token
    // matcher — semantics-equivalent (cross-validated entity-for-entity)
    val gazetteer: KDoc => KDoc =
      if (useExplosionMatcher) graft.ner.ExplosionMatcher.processDoc(resources)
      else TrieNer.processDoc(resources)
    val transformer = TokenClassifier.processDoc(session) _
    val splitDoc = graft.ner.EntitySplitter.processDoc(splitter) _
    // optional entity-class disambiguation (E16, non-default in the
    // reference too): resolves span-identical multi-class groups by
    // sentence context BEFORE linking, as the reference step does
    val ecd: KDoc => KDoc =
      if (classDisambig.isEmpty) identity
      else EntityClassDisambiguation.processDoc(classDisambig)
    // partition-level stages wrap the per-doc chain; the non-contiguous
    // splitter runs right after NER, as the reference attaches it to the
    // NER step (entity_post_processing.py)
    val nerDocs = docs.map { d =>
      val t = gazetteer(d)
      ecd(splitDoc(if (withTransformerNer) transformer(t) else t))
    }
    linkingStages(resources, runner, classRules, xrefs)(nerDocs)
  }

  /** The `linking_only` step group (ref conf/Pipeline/default.yaml:14-20,
    * pipeline/__init__.py:233-276): every stage AFTER NER, over documents
    * that already carry entities — composable with a prior `ner_only`
    * output (docs JSON). `fusedStages` = NER + this. Deliberate widening vs
    * the reference's configured group (which lists only dictionary linking
    * + mapping): including the post-processing tail here makes
    * `ner_only ∘ linking_only ≡ full pipeline` hold exactly — spec-pinned
    * both through the docs-JSON hand-off and over HTTP. */
  def linkingStages(
      resources: Resources,
      runner: StrategyRunner = Ladders.default,
      classRules: ClassFilter.Rules = ClassFilter.Rules(),
      xrefs: Option[graft.link.Xref.XrefMap] = None
  )(docs: Iterator[KDoc]): Iterator[KDoc] = {
    val cleanupCfg = Cleanup.Config()
    val mergeCfg = MergeOverlaps.Config()
    val classFilter = ClassFilter.processDoc(classRules) _
    // E17 cross-reference expansion rides mapping post-processing, as the
    // reference's CrossReferenceManager does (disabled by default there too)
    val xrefStep: KDoc => KDoc =
      xrefs.map(graft.link.Xref.processDoc _).getOrElse(identity[KDoc] _)
    val perDocAfterLinking: KDoc => KDoc = d =>
      MergeOverlaps.processDoc(mergeCfg)(
        Cleanup.processDoc(cleanupCfg)(Abbreviations.step(d)))
    val linked = DictionaryLinking.processPartition(resources)(docs)
      .map(classFilter)
    MappingStep.processPartition(resources, runner)(linked)
      .map(xrefStep)
      .map(perDocAfterLinking)
  }

  private object Abbreviations {
    val step: KDoc => KDoc = graft.post.Abbreviation.processDoc
  }

  /** The default document pipeline, mirroring the reference default step
    * order (conf/Pipeline/default.yaml:3-11):
    * extract → trie NER → transformer NER → dictionary linking → class
    * filter → mapping → abbreviation → cleanup → overlap merge.
    */
  /** Wrap a partition's doc stream so (rows, failures) reach the lineage
    * accumulator exactly once, on exhaustion — the ONE definition of the
    * count-on-exhaustion contract, shared by the checkpointed stage writer
    * and the fused path (previously two divergent hand-rolled copies). */
  private[pipeline] def countedPartition(
      acc: org.apache.spark.util.CollectionAccumulator[(Int, Long, Long)])(
      it: Iterator[KDoc]): Iterator[KDoc] = {
    val pid = org.apache.spark.TaskContext.getPartitionId()
    var n = 0L; var fails = 0L
    val mapped = it.map { d => n += 1; if (d.error.isDefined) fails += 1; d }
    new Iterator[KDoc] {
      private var emitted = false
      def hasNext: Boolean = {
        val h = mapped.hasNext
        if (!h && !emitted) { emitted = true; acc.add((pid, n, fails)) }
        h
      }
      def next(): KDoc = mapped.next()
    }
  }

  /** Dedup accumulated per-partition counts by partition id: a retried or
    * speculative attempt adds a second entry for the same pid; the stages
    * are deterministic so completed attempts agree — keep the max, because
    * an attempt killed mid-partition reports a PARTIAL count. */
  private[pipeline] def dedupCounts(
      acc: org.apache.spark.util.CollectionAccumulator[(Int, Long, Long)])
      : Seq[(Int, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    acc.value.asScala.toSeq
      .groupBy(_._1)
      .map { case (_, es) => es.maxBy(e => (e._2, e._3)) }
      .toSeq.sortBy(_._1)
  }

  def run(
      spark: SparkSession,
      pages: org.apache.spark.sql.DataFrame,
      resources: Broadcast[Resources],
      runner: StrategyRunner = Ladders.default,
      cfg: Config = Config(),
      classRules: ClassFilter.Rules = ClassFilter.Rules(),
      withTransformerNer: Boolean = true,
      splitter: graft.ner.EntitySplitter.Config = graft.ner.EntitySplitter.Config.default,
      useExplosionMatcher: Boolean = false,
      classDisambig: EntityClassDisambiguation.Config =
        EntityClassDisambiguation.Config(Map.empty),
      xrefs: Option[graft.link.Xref.XrefMap] = None
  ): (Dataset[KDoc], Seq[LineageRow]) = {
    import spark.implicits._
    val runCtx = new Run(spark, cfg, scala.collection.mutable.ArrayBuffer.empty)

    // Input balancing (SURVEY §4): the transformer stage is the compute
    // hot spot, so the input must spread across all cores BEFORE the fused
    // mapPartitions — a small parquet source arrives as one split, which
    // would serialize the whole pipeline onto one task. Hash on url (the
    // well-distributed key). At corpus scale the source arrives in
    // thousands of splits and this is a no-op.
    val parallelism = spark.sparkContext.defaultParallelism
    val pagesBalanced =
      if (pages.rdd.getNumPartitions < parallelism)
        pages.repartition(parallelism, org.apache.spark.sql.functions.col("url"))
      else pages

    if (cfg.checkpointDir.isEmpty) {
      // fused fast path: extract + all doc-local stages in one mapPartitions.
      // Lineage without a materialization barrier: per-partition counts are
      // tracked in a CollectionAccumulator and surface as lineage rows once
      // an action has run (counts reflect tasks executed so far).
      val acc = spark.sparkContext.collectionAccumulator[(Int, Long, Long)]("graft-lineage")
      val resourceVersion = cfg.resourceVersion
      val out = Pages.toDocs(spark, pagesBalanced).mapPartitions { it =>
        countedPartition(acc)(fusedStages(resources.value, runner, classRules,
          withTransformerNer, splitter, useExplosionMatcher, classDisambig,
          xrefs, cfg.int8Transformer)(it))
      }
      // a view: materializes rows whenever accessed, so lineage read AFTER
      // an action reflects the executed partitions
      val lineageView: Seq[LineageRow] = new scala.collection.immutable.AbstractSeq[LineageRow] {
        private def rows: Seq[LineageRow] =
          dedupCounts(acc).map { case (pid, n, fails) =>
            LineageRow("fused_pipeline", pid, s"partition-$pid",
              resourceVersion, cfg.modelVersion, n, n, fails, 0L, cfg.runId)
          }
        def apply(i: Int): LineageRow = rows(i)
        def length: Int = rows.length
        def iterator: Iterator[LineageRow] = rows.iterator
      }
      return (out, lineageView)
    }

    val docs = runCtx.stage("extract", Pages.toDocs(spark, pagesBalanced))
    val trie =
      if (useExplosionMatcher)
        runCtx.stage("explosion_ner",
          docs.mapPartitions(_.map(graft.ner.ExplosionMatcher.processDoc(resources.value))))
      else runCtx.stage("trie_ner",
        docs.mapPartitions(_.map(TrieNer.processDoc(resources.value))))
    val ner =
      if (!withTransformerNer) trie
      else runCtx.stage("transformer_ner",
        trie.mapPartitions { it =>
          val session = TokenClassifier.executorSession(cfg.int8Transformer)
          it.map(TokenClassifier.processDoc(session))
        })
    val split =
      if (splitter.isEmpty) ner
      else runCtx.stage("entity_splitter",
        ner.map(graft.ner.EntitySplitter.processDoc(splitter)))
    val classDis =
      if (classDisambig.isEmpty) split
      else runCtx.stage("entity_class_disambig",
        split.map(EntityClassDisambiguation.processDoc(classDisambig)))
    val linked = runCtx.stage("dict_linking",
      classDis.mapPartitions(DictionaryLinking.processPartition(resources.value)))
    val filtered =
      if (classRules.isEmpty) linked
      else runCtx.stage("class_filter",
        linked.map(ClassFilter.processDoc(classRules)))
    val mapped = runCtx.stage("mapping",
      filtered.mapPartitions(MappingStep.processPartition(resources.value, runner)))
    val xrefd = xrefs match {
      case Some(x) =>
        runCtx.stage("xref", mapped.map(graft.link.Xref.processDoc(x)))
      case None => mapped
    }
    val abbrev = runCtx.stage("abbrev",
      xrefd.mapPartitions(_.map(graft.post.Abbreviation.processDoc)))
    val cleaned = runCtx.stage("cleanup",
      abbrev.map(Cleanup.processDoc(Cleanup.Config())))
    val merged = runCtx.stage("merge",
      cleaned.map(MergeOverlaps.processDoc(MergeOverlaps.Config())))
    (merged, runCtx.lineage.toSeq)
  }

  def failures(spark: SparkSession, docs: Dataset[KDoc], runId: String): Dataset[FailureRow] = {
    import spark.implicits._
    docs.flatMap(d => d.error.map(e => FailureRow(d.url, "pipeline", e, runId)))
  }

  /** Incremental ingest: restrict a page batch to urls NOT already present
    * in the existing triples table (left-anti join on url — at 10^12 docs a
    * new crawl slice must never reprocess the corpus; the anti-join keys on
    * the well-distributed url and AQE handles the size asymmetry). Pages
    * whose processing produced no triples are re-attempted — cheap, and it
    * makes the operation idempotent rather than at-most-once. */
  def newPagesOnly(
      pages: org.apache.spark.sql.DataFrame,
      existingTriples: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame =
    pages.join(existingTriples.select("url").distinct(), Seq("url"), "left_anti")

  /** The incremental step group (see Main): anti-join new pages against the
    * committed triples table, run the pipeline, stage the increment and
    * commit it with ONE atomic directory rename as a new `inc=<id>`
    * partition — the rename is the manifest, so a crash mid-write leaves
    * only invisible staging data and the rerun reprocesses those urls.
    * Returns (docs, lineage, committedPath). Extracted from Main so the
    * commit/migration/bootstrap logic is unit-testable.
    */
  def runIncremental(
      spark: SparkSession,
      pages: org.apache.spark.sql.DataFrame,
      resources: Broadcast[Resources],
      cfg: Config,
      output: String
  ): (Dataset[KDoc], Seq[LineageRow], String) = {
    val triplesPath = new org.apache.hadoop.fs.Path(s"$output/triples")
    val fs = triplesPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // migrate a legacy layout (top-level pred= partitions from the old
    // raw-append mode) under inc=legacy, so partition discovery never sees
    // two conflicting directory depths
    if (fs.exists(triplesPath) &&
        fs.listStatus(triplesPath).exists(_.getPath.getName.startsWith("pred="))) {
      val legacy = new org.apache.hadoop.fs.Path(triplesPath, "inc=legacy")
      fs.mkdirs(legacy)
      fs.listStatus(triplesPath)
        .filter(_.getPath.getName.startsWith("pred="))
        .foreach { st =>
          require(fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(legacy, st.getPath.getName)),
            s"legacy migration failed for ${st.getPath}")
        }
    }
    // "table exists" = an inc= partition with actual parquet data — an
    // empty committed increment (zero triples) must not force a schema-less
    // read on the next run
    def hasParquet(p: org.apache.hadoop.fs.Path): Boolean = {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
    val hasTable = fs.exists(triplesPath) &&
      fs.listStatus(triplesPath).exists(_.getPath.getName.startsWith("inc=")) &&
      hasParquet(triplesPath)
    // single-writer contract (same as the snapshot pointer swap): staging
    // dirs from crashed prior runs are invisible to readers but leak disk
    // forever — each has a different runId, so no later run would ever
    // overwrite them. Reclaim them before staging ours.
    val outPath = new org.apache.hadoop.fs.Path(output)
    if (fs.exists(outPath))
      fs.listStatus(outPath)
        .filter(_.getPath.getName.startsWith("_staging_triples_"))
        .foreach(st => fs.delete(st.getPath, true))
    val newPages =
      if (!hasTable) pages
      else newPagesOnly(pages,
        spark.read.option("basePath", s"$output/triples")
          .parquet(s"$output/triples"))
    val (docs0, lineage) = run(spark, newPages, resources, cfg = cfg)
    // persisted: the staging write below and the caller's failures write are
    // two actions over one inference-heavy lineage; the CALLER unpersists
    val docs = docs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val staging = new org.apache.hadoop.fs.Path(s"$output/_staging_triples_${cfg.runId}")
    graft.triples.Triples.fromDocs(spark, docs).toDF().write.mode("overwrite")
      .partitionBy("pred").parquet(staging.toString)
    fs.mkdirs(triplesPath)
    // unique partition name even if the same run-id is retried after a
    // successful commit (the retry's anti-join usually empties it anyway)
    var target = new org.apache.hadoop.fs.Path(triplesPath, s"inc=${cfg.runId}")
    var attempt = 1
    while (fs.exists(target)) {
      attempt += 1
      target = new org.apache.hadoop.fs.Path(triplesPath, s"inc=${cfg.runId}-$attempt")
    }
    require(fs.rename(staging, target),
      s"incremental commit failed: rename $staging -> $target")
    (docs, lineage, target.toString)
  }
}
