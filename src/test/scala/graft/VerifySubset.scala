package graft
import org.apache.spark.sql.SparkSession

/** Scratch: run a comma-separated subset of SparkEntry.queries → parquet.
  * Prints one `{"query":...}` metrics line per query — wall seconds, task
  * spill totals (memory + disk), the max per-task peak execution memory,
  * and JVM heap in use — the engine-side numbers SCALE.md's memory table
  * records for the sf10 replay (round-6 directive #9). */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpilled = new java.util.concurrent.atomic.AtomicLong(0)
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong(0)
    val peakExec = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
          peakExec.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
        }
      }
    })

    // task-end events arrive on the async listener bus; poll until the
    // counters are quiet for a full window (straggler events after a
    // heavy query would otherwise be dropped from its row and credited
    // to the NEXT query's reset counters)
    def drainListener(): Unit = {
      var prev = (memSpilled.get, diskSpilled.get, peakExec.get)
      var waited = 0
      var quiet = false
      while (!quiet && waited < 10000) {
        Thread.sleep(300); waited += 300
        val cur = (memSpilled.get, diskSpilled.get, peakExec.get)
        quiet = cur == prev
        prev = cur
      }
    }

    names.split(",").foreach { n =>
      memSpilled.set(0); diskSpilled.set(0); peakExec.set(0)
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { SparkEntry.queries(n)(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n"); None }
        catch { case e: Throwable =>
          System.err.println(s"[subset] $n failed: $e"); e.printStackTrace()
          Some(e.getClass.getSimpleName)
        }
      val wall = (System.nanoTime() - t0) / 1e9
      // match the real driver's per-query cache regime (Verify releases
      // registered persists after every query) so the published heap/spill
      // numbers aren't cross-contaminated by prior queries' caches; the
      // SHARED memoized docs/triples stay warm, as in Bench
      graft.util.CacheRegistry.releaseAll()
      drainListener()
      val rt = Runtime.getRuntime
      val heapUsed = rt.totalMemory() - rt.freeMemory()
      val errField = err.map(e => s""","err":${graft.util.Json.quote(e)}""").getOrElse("")
      println(s"""{"query":"$n","wall_sec":${graft.util.Json.num(wall, 1)},"mem_spilled_mb":${memSpilled.get / 1048576},"disk_spilled_mb":${diskSpilled.get / 1048576},"peak_task_exec_mem_mb":${peakExec.get / 1048576},"jvm_heap_used_mb":${heapUsed / 1048576}$errField}""")
    }
    import graft.util.Json.{quote => q}
    val json = SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
