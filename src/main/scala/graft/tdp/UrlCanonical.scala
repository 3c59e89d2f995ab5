package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization + dedup — the crawl-frontier normalization every
  * web-scale ingest runs before content dedup: the same page arrives as
  * `HTTP://Host/path?b=2&a=1&utm_source=feed#frag` and
  * `http://host/path?a=1&b=2`, and canonical-URL grouping collapses them
  * without touching the payload.
  *
  * Rules (deterministic, shared with the DuckDB oracle):
  *  - lowercase the scheme and host[:port] (userinfo and path keep their
  *    case — both are case-sensitive per RFC 3986);
  *  - strip the fragment;
  *  - drop `utm_*` tracking parameters, sort the remaining query
  *    parameters in byte order, re-join (no `?` when none remain).
  *
  * Scale shape: canonicalization is a pure narrow map; grouping is a
  * hash-groupBy on the canonical string plus the shared
  * [[Dedup.saltedJoinBack]] — a corpus-wide hot canonical (a homepage
  * linked everywhere) is the familiar hot-key case.
  */
object UrlCanonical {

  def canonicalize(url: String): String = {
    if (url == null) return "" // null urls group under the empty canonical
    val noFrag = {
      val h = url.indexOf('#')
      if (h < 0) url else url.substring(0, h)
    }
    val schemeEnd = noFrag.indexOf("://")
    if (schemeEnd < 0) normalizeRest(noFrag)
    else {
      val authStart = schemeEnd + 3
      // the authority ends at the first '/' OR '?' (RFC 3986 — an
      // authority-only URL can still carry a query)
      val slash = noFrag.indexOf('/', authStart)
      val qm = noFrag.indexOf('?', authStart)
      val authEnd =
        if (slash < 0 && qm < 0) noFrag.length
        else if (slash < 0) qm
        else if (qm < 0) slash
        else math.min(slash, qm)
      val scheme = noFrag.substring(0, schemeEnd)
        .toLowerCase(java.util.Locale.ROOT)
      val auth = noFrag.substring(authStart, authEnd)
      // only the HOST[:port] is case-insensitive — userinfo keeps its case
      val at = auth.lastIndexOf('@')
      val authNorm =
        if (at < 0) auth.toLowerCase(java.util.Locale.ROOT)
        else auth.substring(0, at + 1) +
          auth.substring(at + 1).toLowerCase(java.util.Locale.ROOT)
      scheme + "://" + authNorm + normalizeRest(noFrag.substring(authEnd))
    }
  }

  private def normalizeRest(rest: String): String = {
    val q = rest.indexOf('?')
    if (q < 0) rest
    else {
      val kept = rest.substring(q + 1).split("&", -1)
        .filter(p => p.nonEmpty && !p.startsWith("utm_"))
        .sorted(graft.util.Utf8Order.ordering)
      rest.substring(0, q) + (if (kept.isEmpty) "" else "?" + kept.mkString("&"))
    }
  }

  /** (doc_id, url) → canonical url + canonical-group stats. */
  def dedupByUrl(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val canon = docs.select($"doc_id", $"url").as[(Long, String)]
      .map { case (id, u) => (id, canonicalize(u)) }
      .toDF("doc_id", "url_canonical")
    // r8: only DUPLICATED canonicals (n ≥ 2) join back — a unique url's
    // aggregate row is derivable (canonical = itself, n = 1), so the
    // ×16-salt replication now carries only the duplicate groups
    val counts = canon.groupBy($"url_canonical")
      .agg(min($"doc_id").as("canonical_doc"), count(lit(1)).as("n_same_url"))
      .filter($"n_same_url" >= 2)
    Dedup.saltedLeftJoinDups(canon, counts, "url_canonical", "doc_id")
      .withColumn("canonical_doc", coalesce($"canonical_doc", $"doc_id"))
      .withColumn("n_same_url", coalesce($"n_same_url", lit(1L)))
      .withColumn("is_dup", $"doc_id" =!= $"canonical_doc")
      .select($"doc_id", $"url_canonical", $"canonical_doc", $"n_same_url",
        $"is_dup")
      .orderBy($"doc_id")
  }
}
