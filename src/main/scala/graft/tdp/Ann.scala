package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate / exact nearest-neighbour search over an embedding column
  * (`embeddings` table: vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
  *
  * - brute-force top-k cosine: the correctness baseline. Query side is tiny
  *   and broadcast; the big side streams once — no shuffle of the corpus,
  *   partial top-k per partition then a final k·|queries| merge.
  * - banded multi-table LSH (random hyperplane signs): the scale path.
  *   `numTables` independent tables of `bitsPerTable` planes each; a
  *   candidate shares a full bucket with the query in ≥1 table. Bucket
  *   count per table is 2^bits ∝ corpus size (see [[LshConfig.forCorpus]]),
  *   so the per-probe candidate set stays ~constant as N grows — the index
  *   gets BIGGER, not the probe. (The r1 single-table/8-bit setting was a
  *   disguised linear scan at 10^12 rows; multi-table banding is the
  *   standard fix — recall comes from independent tables, precision from
  *   bits per table.)
  * - IVF (inverted-file): k-means coarse quantizer, corpus stored
  *   partitioned BY CELL, queries probe their nProbe closest cells. Cells
  *   scale ~√N ([[ivfAutoCells]]) so probe cost is ~√N per query with
  *   cell-partition pruning at the storage layer.
  */
object Ann {

  /** Deterministic pseudo-random hyperplanes (no RNG state — hash mixed). */
  def hyperplane(dim: Int, plane: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      var h = (plane.toLong << 32 | i.toLong) * -7046029254386353131L
      h ^= (h >>> 32); h *= -4417276706812531889L; h ^= (h >>> 29)
      // map to [-1, 1]
      (h.toDouble / Long.MaxValue)
    }

  /** Banded multi-table index geometry.
    *
    * @param bitsPerTable hyperplanes per table (buckets = 2^bits)
    * @param numTables    independent tables (recall ladder)
    */
  final case class LshConfig(bitsPerTable: Int, numTables: Int) {
    require(bitsPerTable >= 1 && bitsPerTable <= 62)
    /** plane id-space is partitioned per table so tables are independent */
    def planes(dim: Int): Array[Array[Array[Double]]] =
      Array.tabulate(numTables)(t =>
        Array.tabulate(bitsPerTable)(b => hyperplane(dim, t * bitsPerTable + b)))
  }

  object LshConfig {
    /** Collision probability of one hyperplane bit at cosine similarity s
      * (Goemans–Williamson): p = 1 − θ/π. */
    def bitAgreeProb(cosSim: Double): Double =
      1.0 - math.acos(math.max(-1.0, math.min(1.0, cosSim))) / math.Pi

    /** Size the index for a corpus: bits so buckets hold ~`bucketTarget`
      * rows (candidate work per probe stays constant as N grows), tables so
      * a true neighbour at `targetSim` is found with `targetRecall`:
      * L = ln(1−r) / ln(1−p^b). At 10^12 rows with near-dup similarity 0.8
      * this gives b≈34, L≈8 — per-probe candidates ≈ L·bucketTarget. */
    def forCorpus(
        n: Long,
        targetSim: Double = 0.45,
        targetRecall: Double = 0.85,
        bucketTarget: Long = 64
    ): LshConfig = {
      val bits = math.max(2,
        math.ceil(math.log(math.max(2.0, n.toDouble / bucketTarget)) / math.log(2)).toInt)
      val p = bitAgreeProb(targetSim)
      val pBand = math.pow(p, bits)
      val tables =
        if (pBand >= 1.0) 1
        else math.max(1, math.ceil(math.log(1 - targetRecall) / math.log(1 - pBand)).toInt)
      LshConfig(bits, math.min(tables, 64))
    }
  }

  def signBits(vec: Array[Float], planes: Array[Array[Double]]): Long = {
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      var s = 0.0
      val pl = planes(p)
      var i = 0
      while (i < vec.length && i < pl.length) { s += vec(i) * pl(i); i += 1 }
      if (s >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Brute-force top-k cosine neighbours for queries (vec_id < numQueries).
    * Ties and float-noise are stabilized by ranking on the 4-dp-rounded
    * similarity with vec_id tiebreak.
    */
  def bruteTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5
  ): DataFrame = {
    import spark.implicits._
    val base = embeddings.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
    val queries = base.filter(_._1 < numQueries)
    val pairs = base
      .joinWith(broadcast(queries), lit(true), "cross")
      .map { case ((id, vec), (qid, qvec)) =>
        (qid, id, round4(cosine(qvec, vec)))
      }
      .toDF("q_vec_id", "neighbor_vec_id", "cos_sim")
      .filter($"q_vec_id" =!= $"neighbor_vec_id")
    topK(pairs, k)
  }

  /** Round to 4 decimals HALF-AWAY-FROM-ZERO — DuckDB's round().
    * math.rint is half-to-even: at an exactly-representable tie
    * (cosine 0.03125 -> 312.5) the two disagree by 1 ulp of the 4th
    * decimal, which can also flip a top-k rank ordered on the rounded
    * value. Ties away from zero on BOTH engines keeps the ann_* oracles
    * exact on any input. */
  def round4(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 10000 + 0.5) / 10000

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"q_vec_id")
      .orderBy($"cos_sim".desc, $"neighbor_vec_id")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"q_vec_id", $"rank".cast("long").as("rank"),
        $"neighbor_vec_id", $"cos_sim")
      .orderBy($"q_vec_id", $"rank")
  }

  /** (vec_id, embedding, table, bucket) — the index rows. The only shuffle
    * key downstream is (table, bucket): a 12-byte pair, never the vectors. */
  def lshSignatures(
      spark: SparkSession,
      embeddings: DataFrame,
      cfg: LshConfig,
      dim: Int = 64
  ): DataFrame = {
    import spark.implicits._
    val planes = cfg.planes(dim)
    val bc = spark.sparkContext.broadcast(planes)
    embeddings.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .flatMap { case (id, v) =>
        val arr = v.toArray
        bc.value.indices.iterator.map(t => (id, v, t, signBits(arr, bc.value(t))))
      }
      .toDF("vec_id", "embedding", "table", "bucket")
  }

  /** Bucket-occupancy statistics per table (max/avg/count), for index-health
    * logging — a production run inspects these before trusting recall. */
  def lshBucketStats(spark: SparkSession, embeddings: DataFrame, cfg: LshConfig): DataFrame = {
    import spark.implicits._
    lshSignatures(spark, embeddings, cfg)
      .groupBy($"table", $"bucket").agg(count(lit(1)).as("n"))
      .groupBy($"table")
      .agg(count(lit(1)).as("n_buckets"), max($"n").as("max_bucket"),
        round(avg($"n"), 2).as("avg_bucket"))
      .orderBy($"table")
  }

  /** Banded multi-table LSH top-k: candidates share a full bucket with the
    * query in at least one table; exact cosine verifies. */
  def lshTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      cfg: LshConfig = null
  ): DataFrame = {
    import spark.implicits._
    val resolved = Option(cfg).getOrElse(LshConfig.forCorpus(embeddings.count()))
    // sign the tiny query set from a filtered SCAN, not from the
    // full-corpus signature stream: the typed signature flatMap blocks
    // filter pushdown, so deriving queries from `sigs` would sign the
    // whole corpus once under the broadcast exchange and AGAIN on the
    // probe side — 2x the dominant hyperplane-dot-product cost
    val sigs = lshSignatures(spark, embeddings, resolved)
    val queries = lshSignatures(spark,
        embeddings.filter(col("vec_id") < numQueries), resolved)
      .select($"vec_id".as("q_vec_id"), $"embedding".as("q_embedding"),
        $"table", $"bucket")
    val cands = sigs.join(broadcast(queries), Seq("table", "bucket"))
      .filter($"vec_id" =!= $"q_vec_id")
      .select($"q_vec_id", $"q_embedding", $"vec_id", $"embedding")
      .distinct()
      .observe("ann_lsh_stats", count(lit(1)).as("n_candidates"))
      .as[(Long, Seq[Float], Long, Seq[Float])]
      .map { case (qid, qv, id, v) =>
        (qid, id, round4(cosine(qv, v)))
      }
      .toDF("q_vec_id", "neighbor_vec_id", "cos_sim")
    topK(cands, k)
  }

  /** All near-dup candidate PAIRS from the banded index (for dedup: the
    * sketch stage before exact verification), as (id_a, id_b) ONLY. Equi-
    * join on (table, bucket) — no inequality/cartesian join anywhere in the
    * plan — and the self-join shuffles 20-byte key+id rows, never the
    * vectors: a bucket self-join that carries the embeddings multiplies
    * shuffle bytes by payload × numTables (the r2 finding). The verify
    * stage re-fetches vectors with two cheap equi-joins on the
    * well-distributed id (see SparkEntry.dedup_embedding). */
  def lshCandidatePairs(
      spark: SparkSession,
      embeddings: DataFrame,
      cfg: LshConfig
  ): DataFrame = {
    import spark.implicits._
    // keys-only signature pass (r8): lshSignatures carries the embedding
    // through the typed flatMap (lshTopK needs it), but the pair sketch
    // only keys on (table, bucket, id) — emitting the 64-float vector
    // numTables times just to project it away multiplied the flatMap's
    // serialization by the payload size (×48 tables in the dedup_embedding
    // config)
    val planes = cfg.planes(64)
    val bc = spark.sparkContext.broadcast(planes)
    val keys = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, v) =>
        val arr = v.toArray
        bc.value.indices.iterator.map(t => (t, signBits(arr, bc.value(t)), id))
      }
      .toDF("table", "bucket", "vec_id")
    val a = keys.as("a"); val b = keys.as("b")
    a.join(b,
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
  }

  // --- IVF (inverted-file) variant -----------------------------------------

  /** Cells ∝ √N: probe cost and cell size balance at √N each — the standard
    * IVF sizing. (8 cells at any N — the r1 default — meant each probe
    * scanned N/8: a disguised linear scan.) */
  def ivfAutoCells(n: Long): Int =
    math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Deterministic k-means coarse quantizer: seeds = evenly-strided input
    * vectors, fixed iteration count — reproducible across runs/executors.
    * `iters = 0` keeps the strided seeds themselves (fully replicable by
    * the DuckDB oracle; Lloyd refinement is the production default and is
    * recall-tested in AnnSpec). */
  def trainCentroids(vectors: Seq[Array[Float]], k: Int, iters: Int = 5): Array[Array[Float]] = {
    require(vectors.nonEmpty)
    val n = vectors.size
    val kk = math.min(k, n)
    var centroids = Array.tabulate(kk)(i => vectors((i.toLong * n / kk).toInt).clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(kk)(new Array[Double](vectors.head.length))
      val counts = new Array[Int](kk)
      vectors.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
    }
    centroids
  }

  def nearestCentroid(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0; var i = 0
      val ct = centroids(c)
      while (i < v.length && i < ct.length) {
        // double-precision difference: float-float rounds to float and
        // would diverge from the (double-exact) DuckDB oracle arithmetic
        val diff = v(i).toDouble - ct(i).toDouble; d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF top-k: corpus assigned to nearest-centroid cells once and
    * REPARTITIONED BY CELL (at 100 TB: stored partitioned by cell, so a
    * probe reads only its nProbe/numCells fraction); each query probes its
    * nProbe closest cells. `numCells = 0` → auto √N sizing. */
  def ivfTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      numCells: Int = 0,
      nProbe: Int = 3,
      kmeansIters: Int = 5
  ): DataFrame = {
    import spark.implicits._
    val base = embeddings.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
    val cellCount = if (numCells > 0) numCells else ivfAutoCells(base.count())
    // driver-side sample for centroid training: bounded BEFORE collecting
    // (orderBy + limit execute distributed — the driver never sees more
    // than 2048 vectors) and deterministic (vec_id order)
    val sample = base.filter($"vec_id" % 7 === 0)
      .orderBy($"vec_id").limit(2048)
      .collect().map(_._2.toArray).toSeq
    // an id space with no multiple of 7 (filtered subsets, offset ids)
    // yields an empty stride sample — fall back to the first vectors
    // rather than failing trainCentroids' nonEmpty requirement
    val sampleOrAll =
      if (sample.nonEmpty) sample
      else base.orderBy($"vec_id").limit(2048).collect().map(_._2.toArray).toSeq
    val centroids = trainCentroids(sampleOrAll, cellCount, kmeansIters)
    val bc = spark.sparkContext.broadcast(centroids)
    val cells = base.map { case (id, v) =>
      (id, v, nearestCentroid(v.toArray, bc.value))
    }.toDF("vec_id", "embedding", "cell")
      .repartition(col("cell")) // cell-partitioned candidate storage
    val queries = base.filter(_._1 < numQueries)
      .flatMap { case (qid, qv) =>
        val dists = bc.value.indices.map(c =>
          (c, -cosine(qv, bc.value(c).toSeq)))
        dists.sortBy(_._2).take(nProbe).map { case (c, _) => (qid, qv, c) }
      }.toDF("q_vec_id", "q_embedding", "cell")
    val cands = cells.join(broadcast(queries), "cell")
      .filter($"vec_id" =!= $"q_vec_id")
      .select($"q_vec_id", $"q_embedding", $"vec_id", $"embedding")
      .distinct()
      .as[(Long, Seq[Float], Long, Seq[Float])]
      .map { case (qid, qv, id, v) =>
        (qid, id, round4(cosine(qv, v)))
      }
      .toDF("q_vec_id", "neighbor_vec_id", "cos_sim")
    topK(cands, k)
  }
}
