package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-crawl curation operators: URL canonicalization and registrable-
  * domain extraction — the keys by which crawl corpora are deduped,
  * quota'd, and attributed (every large crawl pipeline dedups by
  * canonical URL before content dedup ever runs).
  *
  * All ops here are single-projection, codegen-friendly string/regex
  * expressions — no shuffle, no UDF — so they run at scan speed and
  * compose freely with the dedup/quota/sampling ops (e.g. exact dedup
  * on `canon_url`, `quotaPerStratum` on `domain`). */
object WebOps {

  private val TrackingKeys = Seq("ref", "fbclid", "gclid", "msclkid")

  /** Adds `canon_url`, `host`, and `domain` columns derived from
    * `urlCol`. Canonical form:
    *   - scheme and authority lowercased;
    *   - fragment dropped;
    *   - tracking query parameters removed (`utm_*` prefixes plus
    *     ref/fbclid/gclid/msclkid);
    *   - surviving parameters sorted bytewise (order-insensitive
    *     equality), `?` dropped when none survive;
    *   - trailing slash stripped from non-root paths.
    * `host` is the lowercased authority without port; `domain` its last
    * two labels (registrable-domain approximation — a public-suffix
    * list is data, not code, and slots in as a broadcast join against
    * `host` when one is available). */
  def canonicalize(df: DataFrame, urlCol: String): DataFrame = {
    val u = urlCol
    val schemeHost = s"lower(regexp_extract($u, '^([^:]+://[^/?#]+)', 1))"
    val rawPath = s"regexp_extract($u, '^[^:]+://[^/?#]+([^?#]*)', 1)"
    val path =
      s"""CASE WHEN length($rawPath) > 1 AND endswith($rawPath, '/')
         |     THEN substring($rawPath, 1, length($rawPath) - 1)
         |     ELSE $rawPath END""".stripMargin
    val keptParams =
      s"""array_sort(filter(split(regexp_extract($u, '\\\\?([^#]*)', 1), '&'),
         |  p -> length(p) > 0
         |    AND NOT startswith(p, 'utm_')
         |    AND NOT split(p, '=')[0] IN (${TrackingKeys.map("'" + _ + "'").mkString(", ")})))"""
        .stripMargin
    val host = s"lower(regexp_extract($u, '^[^:]+://([^/?#:]+)', 1))"
    val labels = s"split($host, '\\\\.')"
    df.withColumn("canon_url", expr(
        s"""concat($schemeHost, $path,
           |  CASE WHEN size($keptParams) > 0
           |       THEN concat('?', array_join($keptParams, '&'))
           |       ELSE '' END)""".stripMargin))
      .withColumn("host", expr(host))
      .withColumn("domain", expr(
        s"array_join(slice($labels, greatest(size($labels) - 1, 1), 2), '.')"))
  }

  /** Canonical-URL dedup: one row per distinct `canon_url`, keeping the
    * smallest id (the standard pre-content-dedup pass). Hash aggregation
    * on the canonical string — at crawl scale, substitute
    * `xxhash64(canon_url)` as the grouping key the same way the span
    * ops do to keep long URLs off the exchange. */
  def dedupByCanonical(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    canonicalize(df, urlCol)
      .groupBy("canon_url")
      .agg(min(col(idCol)).as(idCol))
}
