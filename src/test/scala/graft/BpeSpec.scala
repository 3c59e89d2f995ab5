package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** Real BPE tokenizer: trainer parity with the committed asset (generated
  * by the independent python trainer) + exact encode semantics. */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  test("Scala trainer reproduces the committed merge table (python-trained) exactly") {
    import spark.implicits._
    val freqs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("w"))
      .groupBy($"w").count()
      .as[(String, Long)].collect().toSeq
      .sortBy(_._1) // trainer is order-insensitive; sort for determinism
    val trained = Bpe.train(freqs, numMerges = 64)
    assert(trained == Bpe.committed,
      s"first divergence: ${trained.zip(Bpe.committed).find(p => p._1 != p._2)}")
  }

  test("encode merges the LEFTMOST occurrence of the lowest-ranked pair per step") {
    val r1 = Map(("a", "a") -> 0)
    assert(Bpe.encode("aaa", r1).toSeq == Seq("aa", "a"))
    assert(Bpe.encode("aaaa", r1).toSeq == Seq("aa", "aa"))
    val r2 = Map(("a", "b") -> 0, ("ab", "c") -> 1)
    assert(Bpe.encode("abc", r2).toSeq == Seq("abc"))
    // lower rank wins even when a higher-rank pair sits further left
    val r3 = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(Bpe.encode("abc", r3).toSeq == Seq("a", "bc"))
  }

  test("token concatenation reconstructs every corpus word; counts are stable") {
    import spark.implicits._
    val words = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("w"))
      .distinct().as[String].collect()
    words.foreach { w =>
      val toks = Bpe.encode(w, Bpe.committedRanks)
      assert(toks.mkString("") == w, s"roundtrip failed for $w")
      assert(toks.nonEmpty && toks.length <= w.length)
    }
    // with 64 merges on a 31-word vocabulary most words collapse far below
    // their character count
    val avg = words.map(w => Bpe.encode(w, Bpe.committedRanks).length).sum.toDouble / words.length
    assert(avg < 3.0, s"avg tokens per word $avg")
  }

  test("untrained characters stay single tokens") {
    assert(Bpe.encode("xyz~!", Map.empty[(String, String), Int]).toSeq ==
      Seq("x", "y", "z", "~", "!"))
    assert(Bpe.encode("", Bpe.committedRanks).isEmpty)
  }
}
