package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.{Int8Quantizer, MiniBern, TokenClassifier}

/** The quantize-then-VALIDATE workflow of the reference's int8 plane
  * (kazu/quantization/int8_x86_quantizer.py + its README: quantization is
  * only shipped after the acceptance suite re-passes on the quantized
  * model). Here: kernel-level error bounds, then ENTITY-level parity of the
  * int8 session against the float session on the golden corpus — the same
  * bar the reference's acceptance re-run enforces.
  */
class Int8QuantizerSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("kernel: dynamic-int8 GEMM tracks the float GEMM within the " +
    "symmetric-quantization error bound") {
    val r = rng(0xc0ffee)
    for ((k, m) <- Seq((64, 64), (64, 256), (256, 64))) {
      val n = 37
      val a = Array.fill(n * k)((r.nextFloat() * 2 - 1) * 3f)
      val b = Array.fill(k * m)((r.nextFloat() * 2 - 1) * 0.2f)
      val qw = Int8Quantizer.quantizeWeights(b, k, m)
      val c = Int8Quantizer.gemmDynamic(a, n, k, qw)
      // reference float result
      val cf = new Array[Float](n * m)
      for (i <- 0 until n; p <- 0 until k; j <- 0 until m)
        cf(i * m + j) += a(i * k + p) * b(p * m + j)
      // relative Frobenius error: int8 symmetric absmax at k<=256 lands
      // well under 1% on smooth inputs; 2% is the acceptance bound
      var num = 0.0; var den = 0.0
      for (i <- 0 until n * m) {
        val d = (c(i) - cf(i)).toDouble; num += d * d; den += cf(i).toDouble * cf(i)
      }
      val rel = math.sqrt(num / math.max(den, 1e-30))
      assert(rel < 0.02, f"k=$k m=$m relative error $rel%.4f")
    }
  }

  test("kernel: zero activation rows and zero weight columns dequantize " +
    "to exact zeros (scale-0 path)") {
    val k = 8; val m = 4; val n = 2
    val a = new Array[Float](n * k) // row 0 all zero
    a(k) = 1f // row 1 has one nonzero
    val b = new Array[Float](k * m)
    for (p <- 0 until k) b(p * m + 1) = 0.5f // only column 1 nonzero
    val qw = Int8Quantizer.quantizeWeights(b, k, m)
    assert(qw.scales(0) == 0f && qw.scales(1) != 0f)
    val c = Int8Quantizer.gemmDynamic(a, n, k, qw)
    for (j <- 0 until m) assert(c(j) == 0f, s"zero row leaked at col $j")
    assert(c(m + 0) == 0f && c(m + 2) == 0f && c(m + 3) == 0f)
    assert(math.abs(c(m + 1) - 0.5f) < 1e-3)
  }

  private lazy val floatSession = new MiniBern(TokenClassifier.CorpusVocab)
  private lazy val int8Session =
    new MiniBern(TokenClassifier.CorpusVocab, MiniBern.Config(int8 = true))

  test("int8 session is deterministic and carries a distinct model version") {
    assert(int8Session.version != floatSession.version)
    val pieces = TokenClassifier.wordpieces("the window shows a vector")
    val a = int8Session.predict(Seq(pieces)).head.flatten.toSeq
    val b = int8Session.predict(Seq(pieces)).head.flatten.toSeq
    assert(a == b)
  }

  test("acceptance parity: golden-TSV entity decisions are IDENTICAL under " +
    "int8 (word-level BIO labels, all sentences)") {
    val sentences = GoldenCorpus.sentences()
    assert(sentences.size >= 30)
    sentences.foreach { sent =>
      val text = sent.map(_._1).mkString(" ")
      def ments(s: TokenClassifier.ModelSession) =
        TokenClassifier.processText(s, text)
          .map(m => (m.start, m.end, m.entityClass))
      assert(ments(int8Session) == ments(floatSession),
        s"entity divergence under int8 on '$text'")
    }
  }

  test("acceptance parity: vocabulary prototypes still hit cosine 1.0 and " +
    "the nearest non-vocab golden token keeps a margin below threshold") {
    val cfg = MiniBern.Config(int8 = true)
    val goldenTokens = GoldenCorpus.tokens()
    var worst = ("", Float.NegativeInfinity)
    goldenTokens.foreach { tok =>
      val pieces = TokenClassifier.wordpieces(tok)
      if (pieces.nonEmpty) {
        val ls = int8Session.predict(Seq(pieces)).head
        val maxLabelLogit =
          if (ls.isEmpty) Float.NegativeInfinity else ls.flatMap(_.drop(1)).max
        if (TokenClassifier.CorpusVocab.contains(tok)) {
          // prototypes are built through the SAME quantized trunk, so vocab
          // words stay exact-cosine-1.0 — self-consistency of the plane
          assert(math.abs(maxLabelLogit - cfg.scale * (1 - cfg.threshold)) < 1e-4,
            s"vocab word $tok logit $maxLabelLogit")
        } else if (maxLabelLogit > worst._2) worst = (tok, maxLabelLogit)
      }
    }
    val worstCos = worst._2 / cfg.scale + cfg.threshold
    info(f"closest non-vocab golden token under int8: '${worst._1}' cosine $worstCos%.4f")
    assert(worstCos < cfg.threshold - 0.02,
      s"int8 margin too small: '${worst._1}' at cosine $worstCos")
  }

  test("pipeline-level parity: Config(int8Transformer) is the product route " +
    "— identical entities end-to-end, lineage records the int8 model version") {
    val spark = SparkTestSession.spark
    val pages = graft.pipeline.Pages.fromDocuments(spark, "/root/testdata/sf0.001")
    val res = spark.sparkContext.broadcast(graft.index.Resources.corpus)
    def ents(int8: Boolean) = {
      val cfg = graft.pipeline.Pipeline.Config(runId = s"int8-$int8",
        int8Transformer = int8)
      assert(cfg.modelVersion == (if (int8) "minibern/3-int8" else "minibern/3"))
      val (docs, _) = graft.pipeline.Pipeline.run(spark, pages, res, cfg = cfg)
      docs.collect().flatMap(d => d.sections.flatMap(_.entities.map(e =>
        (d.url, e.start, e.end, e.entityClass, e.matchStr)))).toSet
    }
    val float = ents(int8 = false)
    val quant = ents(int8 = true)
    assert(float.nonEmpty)
    assert(quant == float, "entity divergence between int8 and float pipelines")
  }

  test("encoder parity: int8 embeddings stay within cosine 0.995 of float " +
    "embeddings (linking-threshold-preserving)") {
    val texts = Seq("sort", "filter", "stream processing window",
      "influenza", "the quick brown fox")
    texts.foreach { t =>
      val a = floatSession.encode(t)
      val b = int8Session.encode(t)
      var cos = 0f
      for (i <- a.indices) cos += a(i) * b(i)
      assert(cos > 0.995f, f"encode('$t') int8-vs-float cosine $cos%.4f")
    }
  }
}
