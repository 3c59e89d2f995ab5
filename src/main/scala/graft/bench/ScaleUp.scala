package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing testdata dir by
  * key-shifted replication (round-4 directive #6: the driver ships
  * sf ≤ 0.1; the 10× data-scale bench needs sf1). Deterministic, no
  * external data (north rule): each replica k shifts every entity key by
  * k·(max+1) so referential integrity holds across replicas, while the
  * dimension tables (region, nation) are shared — replicating them would
  * duplicate their natural keys (n_name) and change query semantics.
  * Replicated fact text/embedding payloads are byte-identical per replica:
  * good enough for throughput/scaling measurement (there is no DuckDB
  * oracle at this scale), and the exact-dup clusters it creates are
  * themselves realistic crawl shape.
  *
  *   sbt "runMain graft.bench.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10"
  */
object ScaleUp {

  /** (table → key columns to shift). Foreign keys shift with their
    * referenced table's domain by construction (same column name prefix
    * semantics in the TPC-H-ish schema). */
  private val shiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )

  private val shared = Seq("region", "nation")

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    shared.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    // the key domains each shifted column draws from: the max over ALL
    // tables carrying that logical key (e.g. o_custkey ⊂ c_custkey domain)
    val domainOf = Map(
      "c_custkey" -> "customer.c_custkey", "o_custkey" -> "customer.c_custkey",
      "s_suppkey" -> "supplier.s_suppkey", "l_suppkey" -> "supplier.s_suppkey",
      "p_partkey" -> "part.p_partkey", "l_partkey" -> "part.p_partkey",
      "o_orderkey" -> "orders.o_orderkey", "l_orderkey" -> "orders.o_orderkey",
      "event_id" -> "events.event_id", "user_id" -> "events.user_id",
      "doc_id" -> "documents.doc_id", "vec_id" -> "embeddings.vec_id")
    val domainMax: Map[String, Long] = domainOf.values.toSeq.distinct.map { d =>
      val Array(t, c) = d.split("\\.")
      d -> (spark.read.parquet(s"$src/$t.parquet")
        .agg(max(col(c).cast("long"))).head().getLong(0) + 1L)
    }.toMap

    shiftCols.foreach { case (t, cols) =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val replicas = (0 until factor).map { k =>
        cols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(k * domainMax(domainOf(c))))
        }
      }
      val out = replicas.reduce(_.unionByName(_))
      out.repartition(16).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"$t: ${base.count()} x $factor")
    }
    println(s"scale-up complete: $src x$factor -> $dst")
    spark.stop()
  }
}
