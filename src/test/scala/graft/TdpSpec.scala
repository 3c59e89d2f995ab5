package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.tdp.{Ann, Dedup, TextStats}

class DedupSpec extends AnyFunSuite with SparkTestBase {

  test("minhash LSH finds planted near-duplicates, not unrelated docs") {
    import spark.implicits._
    val base = (0 until 50).map(i =>
      (i.toLong, s"doc $i " + (0 until 60).map(j => s"d${i}w$j").mkString(" ")))
    // plant: 100/101 near-identical to 0; 102 identical to 1
    val planted = Seq(
      (100L, base(0)._2 + " tail"),
      (101L, base(0)._2.replace("w13", "w99")),
      (102L, base(1)._2))
    val docs = (base ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(spark, docs, threshold = 0.6)
      .as[(Long, Long, Double)].collect()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((0L, 100L)))
    assert(pairSet.contains((0L, 101L)))
    assert(pairSet.contains((1L, 102L)))
    assert(pairSet.contains((100L, 101L)))
    // unrelated docs don't pair
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    // est_jaccard of the identical pair is 1.0
    assert(pairs.find(p => (p._1, p._2) == (1L, 102L)).get._3 == 1.0)
  }

  test("simhash hamming pairs find near-identical docs") {
    import spark.implicits._
    val base = (0 until 30).map(i =>
      (i.toLong, (0 until 80).map(j => s"t${(i * 11 + j * 3) % 211}").mkString(" ")))
    val planted = Seq((200L, base(5)._2 + " extra"))
    val docs = (base ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(spark, docs).as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 5L && p._2 == 200L))
  }

  test("signature similarity approximates jaccard") {
    val a = Dedup.minhashSignature("the quick brown fox jumps over the lazy dog today", 128)
    val b = Dedup.minhashSignature("the quick brown fox jumps over the lazy dog today", 128)
    assert(Dedup.signatureSimilarity(a.toSeq, b.toSeq) == 1.0)
    val c = Dedup.minhashSignature("completely different words here entirely", 128)
    assert(Dedup.signatureSimilarity(a.toSeq, c.toSeq) < 0.2)
  }
}

class AnnSpec extends AnyFunSuite with SparkTestBase {

  private def vectors = {
    // deterministic clustered vectors: 3 clusters in 8 dims
    val rnd = new scala.util.Random(123)
    (0 until 60).map { i =>
      val center = i % 3
      val v = Array.tabulate(8)(d =>
        (if (d == center) 10f else 0f) + rnd.nextFloat() * 0.5f)
      (i.toLong, v.toSeq)
    }
  }

  test("brute top-k returns same-cluster neighbours, ranked") {
    import spark.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    val top = Ann.bruteTopK(spark, df, numQueries = 3, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.length == 15)
    top.foreach { case (q, rank, n, sim) =>
      assert(n % 3 == q % 3, s"query $q neighbour $n not same cluster")
      assert(sim > 0.9)
    }
    // ranks are 1..5 per query
    assert(top.filter(_._1 == 0L).map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("LSH top-k recall vs brute force ≥ 0.8") {
    import spark.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    val brute = Ann.bruteTopK(spark, df, numQueries = 5, k = 5)
      .select("q_vec_id", "neighbor_vec_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(spark, df, numQueries = 5, k = 5)
      .select("q_vec_id", "neighbor_vec_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall $recall")
  }
}

class TextStatsSpec extends AnyFunSuite with SparkTestBase {
  test("quality metrics computed per doc") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val row = TextStats.quality(spark, docs).collect().head
    assert(row.getAs[Long]("n_tokens") == 6)
    assert(row.getAs[Long]("n_distinct_tokens") == 5)
    assert(row.getAs[Long]("n_stopwords") == 2)
    assert(row.getAs[Double]("stopword_ratio") == 2.0 / 6.0)
  }

  test("language id picks profile languages") {
    assert(TextStats.predictLang("the cat and the dog is in that house it was")._1 == "en")
    assert(TextStats.predictLang("der Hund und die Katze ist nicht da und das")._1 == "de")
  }

  test("fingerprints: identical docs share prints, shifted docs overlap") {
    val a = TextStats.fingerprints("abcdefghij" * 10)
    val b = TextStats.fingerprints("abcdefghij" * 10)
    assert(a.toSeq == b.toSeq)
  }
}

class IvfAnnSpec extends AnyFunSuite with SparkTestBase {
  test("IVF top-k recall vs brute force ≥ 0.8 on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(321)
    val df = (0 until 90).map { i =>
      val center = i % 3
      val v = Array.tabulate(8)(d =>
        (if (d == center) 10f else 0f) + rnd.nextFloat() * 0.5f)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val brute = Ann.bruteTopK(spark, df, numQueries = 5, k = 5)
      .select("q_vec_id", "neighbor_vec_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(spark, df, numQueries = 5, k = 5, numCells = 6, nProbe = 2)
      .select("q_vec_id", "neighbor_vec_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall")
  }
}
