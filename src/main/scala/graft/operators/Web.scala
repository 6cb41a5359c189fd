package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + host-level web-curation operators — the first
  * stage of any web-scale corpus run, BEFORE exact dedup: the same page
  * arrives as `HTTP://Site.com/a//b/?utm_source=x` and
  * `http://site.com/a/b`, and only a canonical form lets exact/near dedup,
  * per-host quotas, and crawl politeness see them as one.
  *
  * Everything is a composition of codegen'd string builtins (regexp_*,
  * split/filter/array_sort) — no UDF, no driver round-trip — and each step
  * is expressible 1:1 in DuckDB SQL, so the oracle replays every byte.
  * The normalization applied (the conservative, semantics-preserving set):
  *   - fragment dropped (`#...` is client-side only);
  *   - scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization);
  *   - default ports stripped (`:80` for http, `:443` for https);
  *   - path: duplicate `/` runs collapsed, trailing `/` dropped (non-root),
  *     empty path becomes `/`;
  *   - tracking parameters removed (utm_*, fbclid, gclid, msclkid, mc_eid,
  *     igshid — the cross-site-identical click-id set; anything that
  *     changes server routing is kept);
  *   - surviving query params sorted bytewise (param order is almost never
  *     semantic; sorting makes the canon stable under serializer whims).
  *
  * Scale shape: per-row narrow map over the scan — embarrassingly
  * parallel, no shuffle; the host rollup is one combiner-collapsed keyed
  * aggregate.
  */
object Web {

  /** Query-param names dropped by canonicalization (regex alternation). */
  val TrackingParamPattern = "^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid)(=|$)"

  /** Lowercased host with default port stripped, from a raw URL. */
  def urlHost(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
  }

  /** Canonical form of a raw URL (see object doc for the exact steps). */
  def urlNormalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val host = urlHost(url)
    val pathq = regexp_extract(rest, "^[^/?#]*(.*)$", 1)
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val collapsed = regexp_replace(rawPath, "/{2,}", "/")
    val trimmed = regexp_replace(collapsed, "^(.+?)/+$", "$1")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"),
      p => !p.rlike(TrackingParamPattern) && p =!= ""))
    val qstr = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(qstr === "", lit("")).otherwise(concat(lit("?"), qstr)))
  }

  /** Per-host curation rollup: document count, distinct canonical URLs,
    * total content chars, EXACT-dup rate among the host's documents
    * (1e6 · (n − distinct sha256(content)) / n, integer ppm), and the
    * language mix (distinct langs + bytewise-min majority lang by count).
    *
    * One keyed aggregate over (host) after a narrow per-row projection —
    * the rollup frame is host-count-sized, orders of magnitude under the
    * corpus, so downstream per-host caps/joins broadcast it.
    */
  def hostRollup(
      docs: DataFrame, urlCol: String, contentCol: String,
      langCol: String): DataFrame = {
    val base = docs.select(
      urlHost(col(urlCol)).as("host"),
      urlNormalize(col(urlCol)).as("url"),
      col(contentCol).as("content"),
      col(langCol).as("lang"))
    val stats = base.groupBy("host").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("url")).as("n_urls"),
      sum(length(col("content"))).as("total_chars"),
      countDistinct(sha2(col("content"), 256)).as("n_uniq"),
      countDistinct(col("lang")).as("n_langs"))
    val langTop = base.groupBy("host", "lang").agg(count(lit(1)).as("ln"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("host")
          .orderBy(col("ln").desc, col("lang").asc)))
      .filter(col("rn") === 1)
      .select(col("host"), col("lang").as("majority_lang"))
    stats.join(langTop, "host")
      .select(col("host"), col("n_docs"), col("n_urls"), col("total_chars"),
        expr("(n_docs - n_uniq) * 1000000 div n_docs").as("dup_ppm"),
        col("n_langs"), col("majority_lang"))
  }
}
