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

    names.split(",").foreach { n =>
      memSpilled.set(0); diskSpilled.set(0); peakExec.set(0)
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      catch { case e: Throwable => System.err.println(s"[subset] $n failed: $e"); e.printStackTrace() }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // task-end events are async
      val rt = Runtime.getRuntime
      val heapUsed = rt.totalMemory() - rt.freeMemory()
      println(f"""{"query":"$n","wall_sec":$wall%.1f,"mem_spilled_mb":${memSpilled.get / 1048576},"disk_spilled_mb":${diskSpilled.get / 1048576},"peak_task_exec_mem_mb":${peakExec.get / 1048576},"jvm_heap_used_mb":${heapUsed / 1048576}}""")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val json = SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
