package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batched inside `mapPartitions` with an executor-pinned codec session —
  * the same execution shape as the ONNX NER stage.
  *
  * The codec is REAL: payloads are multi-frame containers of PNG images
  * (4-byte big-endian length prefix per frame, the classic length-delimited
  * framing), decoded with `javax.imageio` — actual inflate + defilter work
  * per frame, not a byte-slicing stub. The corpus has no media, so
  * [[mediaFromDocuments]] synthesizes the payloads deterministically from
  * doc_id (width/height/frame-count/pixels are closed-form functions of
  * doc_id), which is what lets the DuckDB oracle reproduce the decoded
  * metadata — dimensions, pixel count, pixel-value checksum — without ever
  * parsing a PNG. At scale the same operators read real bytes from the
  * lake; only the synthesizer is corpus-specific.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaMeta(doc_id: Long, n_bytes: Long, n_frames: Long,
      width: Long, height: Long, n_pixels: Long, px_sum: Long)

  /** Deterministic frame geometry: every field a closed-form function of
    * doc_id so the oracle can re-derive it relationally. */
  def frameCount(docId: Long): Int = (1 + docId % 3).toInt
  def frameWidth(docId: Long): Int = (8 + docId % 24).toInt
  def frameHeight(docId: Long): Int = (8 + (docId * 31) % 24).toInt
  /** Gray value of pixel (x, y) in frame f. */
  def pixel(docId: Long, f: Int, x: Int, y: Int): Int =
    ((x + y + docId + f) % 256).toInt

  /** Executor-pinned decoder session (one per JVM — the analogue of an
    * ONNX/ffmpeg context). ImageIO reader instances are not thread-safe;
    * the session goes through ThreadLocal streams internally, so a shared
    * object is fine for the stateless read() entry point. */
  final class PngCodec extends Serializable {
    /** Split a length-delimited container into frame byte ranges. */
    def frames(payload: Array[Byte]): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
      private var off = 0
      def hasNext: Boolean = off + 4 <= payload.length
      def next(): Array[Byte] = {
        val len = ((payload(off) & 0xff) << 24) | ((payload(off + 1) & 0xff) << 16) |
          ((payload(off + 2) & 0xff) << 8) | (payload(off + 3) & 0xff)
        val out = java.util.Arrays.copyOfRange(payload, off + 4, off + 4 + len)
        off += 4 + len
        out
      }
    }

    /** Real PNG decode: returns (width, height, sum of gray samples). */
    def decode(frame: Array[Byte]): (Int, Int, Long) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
      require(img != null, "undecodable frame")
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (img.getWidth, img.getHeight, sum)
    }
  }

  /** ImageIO.read/write on raw streams default to FileCache image streams:
    * one TEMP FILE per codec call, created under a filesystem that
    * serializes at high thread counts — the sf1 two-parallelism refresh
    * measured the decode rows 3-4x SLOWER at local[32] than local[8]
    * (BENCH.md round-7 late addendum). In-memory stream caching removes
    * the contention; codec output is bit-identical. */
  private[tdp] object ImageIoInit {
    javax.imageio.ImageIO.setUseCache(false)
    def ensure(): Unit = ()
  }

  private object CodecHolder {
    lazy val codec: PngCodec = {
      ImageIoInit.ensure()
      new PngCodec // lazy ⇒ one per executor JVM
    }
  }

  /** Encode one synthetic grayscale PNG frame for (docId, f). */
  def encodeFrame(docId: Long, f: Int): Array[Byte] = {
    ImageIoInit.ensure() // write(stream) also defaults to a temp-file cache
    val w = frameWidth(docId); val h = frameHeight(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(docId, f, x, y)); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Synthesize the binary media column deterministically from doc_id (the
    * corpus has no real media; production reads the bytes from the lake).
    * Payload = length-delimited concatenation of `frameCount` PNG frames. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select($"doc_id").as[Long]
      .map { id =>
        val out = new java.io.ByteArrayOutputStream()
        var f = 0
        while (f < frameCount(id)) {
          val png = encodeFrame(id, f)
          out.write((png.length >>> 24) & 0xff); out.write((png.length >>> 16) & 0xff)
          out.write((png.length >>> 8) & 0xff); out.write(png.length & 0xff)
          out.write(png)
          f += 1
        }
        MediaRow(id, out.toByteArray, "video/x-graft-png-frames")
      }
      .toDF()
  }

  /** 8×8 average-hash (aHash) of a decoded grayscale frame — the classic
    * perceptual image fingerprint: nearest-neighbor sample onto an 8×8
    * grid (x = i·w/8, y = j·h/8, integer division), bit k = j·8+i set iff
    * sample·64 > total (exact integer compare — no float mean, so the
    * relational replay is bit-identical). Bit 63 lands in the Long sign
    * bit; the oracle converts two's-complement accordingly. */
  def aHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    val v = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val s = raster.getSample(i * w / 8, j * h / 8, 0).toLong
        v(j * 8 + i) = s; total += s; i += 1
      }
      j += 1
    }
    var hash = 0L
    var k = 0
    while (k < 64) { if (v(k) * 64 > total) hash |= 1L << k; k += 1 }
    hash
  }

  final case class PHashRow(doc_id: Long, phash: Long, n_frame_hashes: Long)

  /** Per-doc perceptual hashes from DECODED frames — the ONE definition
    * both near-dup layers share (a codec or error-handling change cannot
    * fork the hash the oracles replay). */
  private def frameHashRows(spark: SparkSession, media: DataFrame)
      : org.apache.spark.sql.Dataset[PHashRow] = {
    import spark.implicits._
    media.select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = CodecHolder.codec
        it.map { case (id, payload) =>
          var first = 0L
          val distinct = scala.collection.mutable.HashSet.empty[Long]
          var f = 0
          codec.frames(payload).foreach { fr =>
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr))
            require(img != null, "undecodable frame")
            val hsh = aHash(img)
            if (f == 0) first = hsh
            distinct += hsh
            f += 1
          }
          PHashRow(id, first, distinct.size.toLong)
        }
      }
  }

  /** Image-level near-duplicate detection over the multimodal column:
    * decode every frame (real codec work — a misread pixel flips hash
    * bits), aHash each, fingerprint the document by its first frame's hash,
    * then cluster documents with IDENTICAL perceptual hashes.
    *
    * Scale shape: decode is a narrow mapPartitions with the executor-pinned
    * codec; clustering is ONE groupBy on the 8-byte hash plus the shared
    * [[Dedup.saltedJoinBack]] — identical-image mega-clusters (the same
    * logo/placeholder image on millions of pages) are exactly the hot-key
    * shape the salted join-back bounds, independent of broadcast thresholds.
    */
  def perceptualNearDup(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    // persist: the hash rows feed TWO different exchanges (the cluster
    // aggregate and the salted join-back) — without it the full PNG decode
    // of every frame (the dominant cost, by design) executes twice; same
    // two-branch shape ParagraphDedup persists for. Released by the caller
    // via CacheRegistry.
    val hashes = graft.util.CacheRegistry.register(
      frameHashRows(spark, media).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // r8: only multi-document hashes (cluster_size ≥ 2) join back — a
    // unique image's cluster row is derivable (canonical = itself, size 1),
    // so the salted replication carries the duplicate clusters only
    val clusters = hashes.groupBy($"phash")
      .agg(min($"doc_id").as("canonical_doc"), count(lit(1)).as("cluster_size"))
      .filter($"cluster_size" >= 2)
    Dedup.saltedLeftJoinDups(hashes, clusters, "phash", "doc_id")
      .withColumn("canonical_doc", coalesce($"canonical_doc", $"doc_id"))
      .withColumn("cluster_size", coalesce($"cluster_size", lit(1L)))
      .withColumn("is_dup", $"doc_id" =!= $"canonical_doc")
      .select($"doc_id", $"phash", $"n_frame_hashes", $"canonical_doc",
        $"cluster_size", $"is_dup")
      .orderBy($"doc_id")
  }

  /** Near-dup pairs BETWEEN distinct perceptual hashes (hamming ≤ 3 via the
    * 4×16-bit block pigeonhole, as the simhash tier) — the hash-cluster
    * GRAPH layer above [[perceptualNearDup]]'s identical-hash clustering.
    * Deliberately pair-per-distinct-HASH, never per document: two
    * 10^6-copy image clusters near each other yield ONE edge carrying both
    * doc counts, not 10^12 document pairs. */
  def hammingPairs(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val hashes = frameHashRows(spark, media).toDF()
    val distinctHashes = hashes.groupBy($"phash").agg(count(lit(1)).as("n"))
    val blocks = distinctHashes.as[(Long, Long)].flatMap { case (h, n) =>
      (0 until 4).iterator.map(b => (h, n, b, (h >>> (b * 16)) & 0xffffL))
    }.toDF("phash", "n", "blk", "bv")
    val a = blocks.toDF("hash_a", "n_docs_a", "blk", "bv")
    val b = blocks.toDF("hash_b", "n_docs_b", "blk", "bv")
    a.join(b, Seq("blk", "bv"))
      .filter($"hash_a" < $"hash_b")
      .select($"hash_a", $"hash_b", $"n_docs_a", $"n_docs_b")
      .distinct()
      .withColumn("hamming",
        bit_count($"hash_a".bitwiseXOR($"hash_b")).cast("int"))
      .filter($"hamming" <= 3)
      .select($"hash_a", $"hash_b", $"hamming", $"n_docs_a", $"n_docs_b")
      .orderBy($"hash_a", $"hash_b")
  }

  /** The decode/feature stage: batched per partition, codec pinned per
    * executor JVM, emits typed metadata rows. Narrow map — no shuffle; at
    * 100 TB this runs at scan speed and the decode cost dominates, exactly
    * like a production frame-sampling pass. */
  def extractMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = CodecHolder.codec
        it.map { case (id, payload) =>
          var frames = 0L
          var w = 0L; var h = 0L; var pxSum = 0L
          codec.frames(payload).foreach { fr =>
            val (fw, fh, sum) = codec.decode(fr)
            frames += 1; w = fw; h = fh; pxSum += sum
          }
          MediaMeta(id, payload.length.toLong, frames, w, h, w * h, pxSum)
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }
}
