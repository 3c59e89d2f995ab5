package graft
import org.apache.spark.sql.SparkSession

/** Scratch: print formatted plans + node counts for named queries (plan
  * audit design aid). Usage: PlanProbe <sfDir> <q1,q2,...> */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args(1).split(",")) {
      val df = SparkEntry.queries(q)(spark, args(0))
      val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $q =====")
      println(p.take(4000))
      println(s"--- counts: InMemoryTableScan=${"InMemoryTableScan".r.findAllIn(p).size} MapPartitions=${"MapPartitions".r.findAllIn(p).size} FileScan=${"Scan parquet".r.findAllIn(p).size}")
      graft.util.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
