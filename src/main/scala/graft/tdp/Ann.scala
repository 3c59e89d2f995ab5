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
  * - LSH-bucketed (random hyperplane signs): the scale path. Corpus hashed
  *   once; candidate set = same-bucket rows; top-k within candidates. At
  *   100 TB the bucket join replaces the full scan per query batch.
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

  def signBits(vec: Array[Float], planes: Array[Array[Double]]): Int = {
    var bits = 0
    var p = 0
    while (p < planes.length) {
      var s = 0.0
      val pl = planes(p)
      var i = 0
      while (i < vec.length && i < pl.length) { s += vec(i) * pl(i); i += 1 }
      if (s >= 0) bits |= (1 << p)
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
        (qid, id, math.rint(cosine(qvec, vec) * 10000) / 10000)
      }
      .toDF("q_vec_id", "neighbor_vec_id", "cos_sim")
      .filter($"q_vec_id" =!= $"neighbor_vec_id")
    val w = Window.partitionBy($"q_vec_id")
      .orderBy($"cos_sim".desc, $"neighbor_vec_id")
    pairs
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"q_vec_id", $"rank".cast("long").as("rank"),
        $"neighbor_vec_id", $"cos_sim")
      .orderBy($"q_vec_id", $"rank")
  }

  // --- IVF (inverted-file) variant -----------------------------------------

  /** Deterministic k-means coarse quantizer: seeds = evenly-strided input
    * vectors, fixed iteration count — reproducible across runs/executors.
    * Production: train on a driver-collected sample, broadcast centroids;
    * the corpus is then partitioned BY CELL so each query probes only
    * nProbe cells — the classic IVF index shape. */
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
        val diff = v(i) - ct(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF top-k: corpus assigned to nearest-centroid cells once; each query
    * probes its nProbe closest cells. */
  def ivfTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      numCells: Int = 8,
      nProbe: Int = 3
  ): DataFrame = {
    import spark.implicits._
    val base = embeddings.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
    // driver-side sample for centroid training (bounded, deterministic)
    val sample = base.filter($"vec_id" % 7 === 0).limit(2048)
      .collect().map(_._2.toArray).toSeq
    val centroids = trainCentroids(sample, numCells)
    val bc = spark.sparkContext.broadcast(centroids)
    val cells = base.map { case (id, v) =>
      (id, v, nearestCentroid(v.toArray, bc.value))
    }.toDF("vec_id", "embedding", "cell")
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
        (qid, id, math.rint(cosine(qv, v) * 10000) / 10000)
      }
      .toDF("q_vec_id", "neighbor_vec_id", "cos_sim")
    val w = Window.partitionBy($"q_vec_id")
      .orderBy($"cos_sim".desc, $"neighbor_vec_id")
    cands.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"q_vec_id", $"rank".cast("long").as("rank"),
        $"neighbor_vec_id", $"cos_sim")
      .orderBy($"q_vec_id", $"rank")
  }

  /** LSH-bucketed ANN: candidates share a sign-bucket with the query (probed
    * over all `planes`-bit buckets at hamming distance ≤ 1 for recall). */
  def lshTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      numPlanes: Int = 8
  ): DataFrame = {
    import spark.implicits._
    val planes = Array.tabulate(numPlanes)(p => hyperplane(64, p))
    val base = embeddings.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, signBits(v.toArray, planes)) }
      .toDF("vec_id", "embedding", "bucket")
    val queries = base.filter($"vec_id" < numQueries)
      .as[(Long, Seq[Float], Int)]
      // multi-probe: own bucket + all 1-bit flips
      .flatMap { case (id, v, b) =>
        (b +: (0 until numPlanes).map(p => b ^ (1 << p))).distinct
          .map(pb => (id, v, pb))
      }
      .toDF("q_vec_id", "q_embedding", "bucket")
    val cands = base.join(broadcast(queries), "bucket")
      .filter($"vec_id" =!= $"q_vec_id")
      .select($"q_vec_id", $"q_embedding", $"vec_id", $"embedding")
      .distinct()
      .as[(Long, Seq[Float], Long, Seq[Float])]
      .map { case (qid, qv, id, v) =>
        (qid, id, math.rint(cosine(qv, v) * 10000) / 10000)
      }
      .toDF("q_vec_id", "neighbor_vec_id", "cos_sim")
    val w = Window.partitionBy($"q_vec_id")
      .orderBy($"cos_sim".desc, $"neighbor_vec_id")
    cands.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"q_vec_id", $"rank".cast("long").as("rank"),
        $"neighbor_vec_id", $"cos_sim")
      .orderBy($"q_vec_id", $"rank")
  }
}
