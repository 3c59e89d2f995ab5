package graft.ner

/** Int8 dynamic quantization for the transformer linear layers — the
  * engine-side analog of the reference's opt-in x86 int8 quantization plane
  * (kazu/quantization/int8_x86_quantizer.py:14-43: dynamic
  * `X86InductorQuantizer` config, i.e. per-channel int8 WEIGHTS prepared
  * once + per-batch dynamic int8 ACTIVATIONS, applied to the linear/matmul
  * ops only — norms, softmax and GELU stay float, exactly as
  * `get_default_x86_inductor_quantization_config(is_dynamic=True)` leaves
  * them).
  *
  * Scheme (symmetric, zero-point-free — the x86 default for weights, and
  * for activations under the dynamic config):
  *  - weights: per-OUTPUT-CHANNEL scale `s_j = max_p |B[p,j]| / 127`,
  *    quantized once at session build (`quantizeWeights`);
  *  - activations: per-ROW scale `s_i = max_p |A[i,p]| / 127`, computed on
  *    the fly per forward batch (`gemmDynamic`) — "dynamic" means exactly
  *    this: no calibration pass, the scale rides the live tensor;
  *  - accumulate in int32, dequantize with `s_i * s_j` (+ float bias
  *    downstream, unchanged).
  *
  * Why opt-in OFF by default here (measured, not assumed): the reference's
  * speedup comes from VNNI int8 dot instructions that torch-inductor emits;
  * the JVM's autovectorizer has no byte-dot path, so at MiniBern's shapes
  * (k,m ∈ {64,256}) the int8 kernel measures 0.8–1.1× the float GEMM on
  * this host (see BENCH.md round 7) — parity, not profit. The plane still
  * earns its keep as the quantize-then-VALIDATE workflow (the reference
  * pairs quantization with an acceptance re-run; Int8QuantizerSpec pins
  * entity-level parity) and as the 4× weight-broadcast shrink a
  * 1000-executor fleet would see on a model whose weights are not
  * session-generated like MiniBern's.
  */
object Int8Quantizer {

  /** Per-output-channel symmetric int8 weight matrix [k×m], row-major like
    * the float weights it replaces. `scales(j)` dequantizes column j. */
  final case class QuantizedMatrix(q: Array[Byte], scales: Array[Float], k: Int, m: Int)

  /** Quantize a row-major [k×m] float weight matrix per output channel.
    * Symmetric absmax: an all-zero column gets scale 0 (dequantizes to 0,
    * matching the float matmul exactly). */
  def quantizeWeights(b: Array[Float], k: Int, m: Int): QuantizedMatrix = {
    require(b.length == k * m, s"weight length ${b.length} != $k*$m")
    val scales = new Array[Float](m)
    var j = 0
    while (j < m) {
      var mx = 0f
      var p = 0
      while (p < k) { val a = math.abs(b(p * m + j)); if (a > mx) mx = a; p += 1 }
      scales(j) = mx / 127f
      j += 1
    }
    val q = new Array[Byte](k * m)
    var p = 0
    while (p < k) {
      val off = p * m
      j = 0
      while (j < m) {
        val s = scales(j)
        q(off + j) = if (s == 0f) 0 else math.round(b(off + j) / s).toByte
        j += 1
      }
      p += 1
    }
    QuantizedMatrix(q, scales, k, m)
  }

  /** Worst-case |product| per term is 127·127; the int32 accumulator is
    * exact while k·127² ≤ Int.MaxValue, i.e. k ≤ 133152. Enforced, not just
    * documented: silent wraparound would flip output signs with no error. */
  val MaxK: Int = Int.MaxValue / (127 * 127)

  /** C[n×m] = dequant(quantize_per_row(A[n×k]) · Bq[k×m]): dynamic per-row
    * activation quantization, int32 accumulate, same ikj/4-way-unrolled
    * loop shape as the float kernel so the comparison is loop-structure
    * fair. A zero row (scale 0) yields a zero output row, as in float. */
  def gemmDynamic(a: Array[Float], n: Int, k: Int, w: QuantizedMatrix): Array[Float] = {
    require(w.k == k, s"weight k=${w.k} != activation k=$k")
    require(k <= MaxK, s"k=$k exceeds int32-exact accumulation bound $MaxK")
    val m = w.m
    val bq = w.q
    val c = new Array[Float](n * m)
    val aq = new Array[Byte](k)
    val acc = new Array[Int](m)
    var i = 0
    while (i < n) {
      val ak = i * k
      // dynamic row scale
      var mx = 0f
      var p = 0
      while (p < k) { val v = math.abs(a(ak + p)); if (v > mx) mx = v; p += 1 }
      val sa = mx / 127f
      if (sa != 0f) {
        val inv = 1f / sa
        p = 0
        while (p < k) { aq(p) = math.round(a(ak + p) * inv).toByte; p += 1 }
        java.util.Arrays.fill(acc, 0)
        p = 0
        while (p + 4 <= k) {
          val a0: Int = aq(p); val a1: Int = aq(p + 1)
          val a2: Int = aq(p + 2); val a3: Int = aq(p + 3)
          val b0 = p * m; val b1 = (p + 1) * m
          val b2 = (p + 2) * m; val b3 = (p + 3) * m
          var j = 0
          while (j < m) {
            acc(j) += a0 * bq(b0 + j) + a1 * bq(b1 + j) +
              a2 * bq(b2 + j) + a3 * bq(b3 + j)
            j += 1
          }
          p += 4
        }
        while (p < k) {
          val av: Int = aq(p); val bo = p * m
          var j = 0
          while (j < m) { acc(j) += av * bq(bo + j); j += 1 }
          p += 1
        }
        val co = i * m
        var j = 0
        while (j < m) { c(co + j) = acc(j) * sa * w.scales(j); j += 1 }
      }
      i += 1
    }
    c
  }
}
