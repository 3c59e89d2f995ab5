package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.broadcast.Broadcast
import graft.model._
import graft.index.Resources
import graft.ner.TrieNer
import graft.link.{Ladders, MappingStep, StrategyRunner}
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
      modelVersion: String = "stub-ner/1"
  )

  final class Run(
      spark: SparkSession,
      cfg: Config,
      val lineage: scala.collection.mutable.ArrayBuffer[LineageRow]
  ) {
    import spark.implicits._

    def stage(name: String, ds: => Dataset[KDoc]): Dataset[KDoc] =
      cfg.checkpointDir match {
        case None => ds
        case Some(dir) =>
          val path = s"$dir/$name"
          val fs = new java.io.File(path)
          val t0 = System.currentTimeMillis()
          if (!(cfg.resume && fs.exists())) {
            ds.write.mode("overwrite").parquet(path)
          }
          val out = spark.read.parquet(path).as[KDoc]
          // per-partition lineage from the materialized stage table
          val counts = out
            .mapPartitions { it =>
              val pid = org.apache.spark.TaskContext.getPartitionId()
              var n = 0L; var fails = 0L
              it.foreach { d => n += 1; if (d.error.isDefined) fails += 1 }
              Iterator((pid, n, fails))
            }
            .collect()
          val wall = System.currentTimeMillis() - t0
          counts.foreach { case (pid, n, fails) =>
            lineage += LineageRow(name, pid, s"$path/part-$pid",
              cfg.resourceVersion, cfg.modelVersion,
              rowsIn = n, rowsOut = n, failures = fails,
              wallMs = wall, runId = cfg.runId)
          }
          out
      }
  }

  /** The default document pipeline: pages → docs → trie NER → mapping →
    * abbreviation/cleanup/merge → docs-with-grounded-entities.
    * (Transformer-NER and fuzzy-candidate stages slot in between NER and
    * mapping; see NerPipeline for the extended graph.)
    */
  def run(
      spark: SparkSession,
      pages: org.apache.spark.sql.DataFrame,
      resources: Broadcast[Resources],
      runner: StrategyRunner = Ladders.default,
      cfg: Config = Config()
  ): (Dataset[KDoc], Seq[LineageRow]) = {
    import spark.implicits._
    val runCtx = new Run(spark, cfg, scala.collection.mutable.ArrayBuffer.empty)

    val docs = runCtx.stage("extract", Pages.toDocs(spark, pages))
    val ner = runCtx.stage("trie_ner",
      docs.mapPartitions(_.map(TrieNer.processDoc(resources.value))))
    val mapped = runCtx.stage("mapping",
      ner.mapPartitions(MappingStep.processPartition(resources.value, runner)))
    val abbrev = runCtx.stage("abbrev",
      mapped.mapPartitions(_.map(graft.post.Abbreviation.processDoc)))
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
}
