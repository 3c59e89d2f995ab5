package graft.index

/** Serializable Aho-Corasick automaton over chars, frozen into CSR-style
  * primitive arrays so a single broadcast ships compactly to every executor
  * (the Spark analogue of the reference's pickled `ahocorasick.Automaton`,
  * kazu/steps/joint_ner_and_linking/memory_efficient_string_matching.py:42-94;
  * same memory-first motivation as CHANGELOG.md:224).
  *
  * Matching emits (inclusiveEndOffset, keyIndex) for EVERY key occurrence,
  * overlapping included — overlap resolution is a later pipeline stage, as in
  * the reference. Output sets are not materialized per node: each node keeps
  * only its own key plus a report link to the nearest suffix node that is
  * also a key, so automaton size is O(total key chars).
  */
final class AhoCorasick private (
    val keys: Array[String],
    nodeEdgeStart: Array[Int], // CSR: node i's edges at [start(i), start(i+1))
    edgeChar: Array[Char],
    edgeDest: Array[Int],
    fail: Array[Int],
    nodeKey: Array[Int],       // key index terminating at node, or -1
    reportLink: Array[Int]     // nearest suffix node with nodeKey != -1, or -1
) extends Serializable {

  def size: Int = keys.length

  @inline private def goto(state: Int, c: Char): Int = {
    var lo = nodeEdgeStart(state)
    var hi = nodeEdgeStart(state + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = edgeChar(mid)
      if (mc == c) return edgeDest(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Scan `text`, invoking `emit(inclusiveEnd, keyIdx)` for every match. */
  def scan(text: CharSequence, emit: (Int, Int) => Unit): Unit = {
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      var next = goto(state, c)
      while (next == -1 && state != 0) {
        state = fail(state)
        next = goto(state, c)
      }
      state = if (next == -1) 0 else next
      // walk report chain
      var s = if (nodeKey(state) >= 0) state else reportLink(state)
      while (s != -1) {
        emit(i, nodeKey(s))
        s = reportLink(s)
      }
      i += 1
    }
  }

  def findAll(text: CharSequence): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    scan(text, (e, k) => out += ((e, k)))
    out.toSeq
  }
}

object AhoCorasick {

  /** Build from distinct keys (caller lower-cases if case-insensitive
    * matching is wanted, mirroring the reference automaton which is built on
    * `syn.text.lower()`). */
  def build(keys: Array[String]): AhoCorasick = {
    require(keys.nonEmpty, "empty gazetteer")
    import scala.collection.mutable
    // --- trie construction with per-node sorted maps
    val children = mutable.ArrayBuffer[mutable.TreeMap[Char, Int]](mutable.TreeMap.empty)
    val nodeKey = mutable.ArrayBuffer[Int](-1)
    var ki = 0
    while (ki < keys.length) {
      var state = 0
      val k = keys(ki)
      var i = 0
      while (i < k.length) {
        val c = k.charAt(i)
        state = children(state).getOrElseUpdate(c, {
          children += mutable.TreeMap.empty
          nodeKey += -1
          children.length - 1
        })
        i += 1
      }
      require(nodeKey(state) == -1 || keys(nodeKey(state)) == k, s"duplicate key $k")
      nodeKey(state) = ki
      ki += 1
    }
    val n = children.length
    // --- BFS fail links + report links
    val fail = new Array[Int](n)
    val report = Array.fill(n)(-1)
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).foreach { case (_, s) => fail(s) = 0; queue.add(s) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      report(u) =
        if (nodeKey(fail(u)) >= 0) fail(u) else report(fail(u))
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        var dest = -1
        while (dest == -1) {
          dest = children(f).getOrElse(c, -1)
          if (dest == -1) {
            if (f == 0) dest = 0 // stay at root (no edge)
            else f = fail(f)
          }
        }
        fail(v) = if (dest == v) 0 else dest
        queue.add(v)
      }
    }
    // --- freeze to CSR
    val edgeCount = children.iterator.map(_.size).sum
    val nodeEdgeStart = new Array[Int](n + 1)
    val edgeChar = new Array[Char](edgeCount)
    val edgeDest = new Array[Int](edgeCount)
    var pos = 0
    var u = 0
    while (u < n) {
      nodeEdgeStart(u) = pos
      children(u).foreach { case (c, v) =>
        edgeChar(pos) = c; edgeDest(pos) = v; pos += 1
      }
      u += 1
    }
    nodeEdgeStart(n) = pos
    new AhoCorasick(keys, nodeEdgeStart, edgeChar, edgeDest, fail,
      nodeKey.toArray, report)
  }
}
