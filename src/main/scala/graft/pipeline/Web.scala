package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Web-corpus preparation: the two normalization passes every
 * CommonCrawl-derived training corpus runs BEFORE any dedup or quality
 * scoring (CCNet, Wenzek et al. LREC'20; RefinedWeb, Penedo et al.
 * NeurIPS'23 §3.1 — engine extension, no reference counterpart):
 * markup-to-text extraction and URL canonicalization. Both are pure
 * per-row codegen projections — no shuffle, no state, trivially safe at
 * any corpus size — and every regex is written to the RE2-compatible
 * subset (no lookaround, no backreferences) so a SQL oracle replays
 * them byte-for-byte.
 */
object Web {

  /** Markup boilerplate strip — HTML/XML to visible text: `<script>` and
   * `<style>` element BODIES removed (their text is code, not content),
   * comments removed, every remaining tag replaced by a space (so
   * `a<br>b` keeps its word boundary), the common named/numeric entities
   * decoded (exact `replace`, no regex), whitespace runs collapsed and
   * ends trimmed. Returns (idCol, text, n_tags) with `n_tags` the count
   * of stripped tags — a cheap page-complexity diagnostic and a guard
   * signal (n_tags = 0 on already-plain text, so the pass is idempotent).
   *
   * Deliberately NOT a full HTML5 parser: an UNTERMINATED script/style
   * element leaks its body as text (the span regex requires the closing
   * tag), and only the seven dominant entities are decoded —
   * stated bounds, same portability rationale as [[Text.normalize]]'s
   * ASCII-only folding. Scale shape: one codegen Project. */
  def stripMarkup(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    // spans first (their bodies must not survive tag-stripping), then
    // comments, then tags; (?is) = case-insensitive + dot-matches-newline
    val noScript = regexp_replace(h, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    // &amp; decodes LAST or "&amp;lt;" would double-decode
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    val collapsed = trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
    df.select(col(idCol), collapsed.as("text"),
      size(regexp_extract_all(h, lit("(?s)<[^>]*>"), lit(0)))
        .cast("long").as("n_tags"))
  }

  /** Tracking query parameters dropped by [[urlCanonical]]: the
   * click/campaign identifiers that make one page look like many
   * distinct URLs (the first-pass dedup noise in any crawl). */
  val trackingParams = "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid)(=.*)?$"

  /** URL canonicalization + dedup keys — the first-pass exact dedup
   * BEFORE content hashing (a crawl sees the same page under http/https,
   * with/without `www.`, trailing slash, and campaign parameters).
   * Rules: scheme and host lowercased, userinfo dropped, default ports
   * (`:80` http, `:443` https) dropped, fragment dropped, trailing
   * slashes on a non-root path dropped, tracking parameters
   * ([[trackingParams]]) dropped and the surviving query parameters
   * SORTED (param order is not content). Returns
   * (idCol, url_canon, host, url_key):
   *  - `url_canon` — the cleaned URL (scheme preserved);
   *  - `host` — lowercased host without a leading `www.`;
   *  - `url_key` — scheme-less `host + path + ?query`, the exact-dup
   *    grouping key (http/https/www variants of one page collide).
   * Rows whose value has no `scheme://` prefix get null outputs (loud in
   * any downstream groupBy, instead of a silently-wrong key).
   * Scale shape: one codegen Project — split/filter/sort run on the
   * handful of params per URL, never across rows. */
  def urlCanonical(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val noUser = regexp_replace(auth0, "^[^@]*@", "")
    val host = when(scheme === "http", regexp_replace(noUser, ":80$", ""))
      .when(scheme === "https", regexp_replace(noUser, ":443$", ""))
      .otherwise(noUser)
    val path0 = regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(regexp_replace(path0, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val q0 = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
    val params = array_sort(filter(split(q0, "&"),
      p => length(p) > 0 && !p.rlike(trackingParams)))
    val query = array_join(params, "&")
    val tail = concat(path, when(length(query) > 0, concat(lit("?"), query))
      .otherwise(lit("")))
    val ok = length(scheme) > 0 && length(host) > 0
    val hostKey = regexp_replace(host, "^www\\.", "")
    df.select(col(idCol),
      when(ok, concat(scheme, lit("://"), host, tail)).as("url_canon"),
      when(ok, hostKey).as("host"),
      when(ok, concat(hostKey, tail)).as("url_key"))
  }

  /** Outgoing-link extraction — every `href` attribute value (double- or
   * single-quoted, any tag, case-insensitive), one output row per link
   * occurrence: (idCol, link). The raw values are crawl-shaped: absolute
   * URLs, site-relative paths (`/a/b`), fragments — feed them through
   * [[urlCanonical]] / [[linkGraph]] for keys. Unquoted href values
   * (legal pre-HTML5, rare in crawls) are not matched — stated bound,
   * same RE2-safe-subset rationale as [[stripMarkup]]. Scale shape: one
   * projection + explode (fan-out = links per page, bounded by page
   * size), no shuffle.
   *
   * `maxLinksPerPage` (0 = uncapped) keeps only each page's FIRST n
   * non-empty links in document order — the crawler-trap guard: a single
   * generated page with 10⁵ hrefs is exactly the row that skews the one
   * shuffle [[linkGraph]] has (THRESHOLDS.md row 23). Truncation is
   * COUNTED, not silent: the capped output adds `n_links_dropped`
   * (per surviving row, the page's links beyond the cap — the
   * ngramJaccard stop-shingle rule of visible caps). */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String,
      maxLinksPerPage: Int = 0): DataFrame = {
    require(maxLinksPerPage >= 0,
      s"maxLinksPerPage must be >= 0 (0 = uncapped), got $maxLinksPerPage")
    val h = col(htmlCol)
    val dq = regexp_extract_all(h, lit("(?is)href\\s*=\\s*\"([^\"]*)\""), lit(1))
    val sq = regexp_extract_all(h, lit("(?is)href\\s*=\\s*'([^']*)'"), lit(1))
    if (maxLinksPerPage == 0)
      df.select(col(idCol), explode(concat(dq, sq)).as("link"))
        .filter(length(col("link")) > 0)
    else
      df.select(col(idCol),
          filter(concat(dq, sq), x => length(x) > 0).as("_l"))
        .select(col(idCol),
          explode(slice(col("_l"), 1, maxLinksPerPage)).as("link"),
          greatest(size(col("_l")) - maxLinksPerPage, lit(0))
            .cast("long").as("n_links_dropped"))
  }

  /** Host-level web graph from a crawl — the edge list PageRank/HITS/
   * community detection run on at web scale (host granularity is what
   * makes a 100 TB crawl's graph tractable): extract every page's links
   * ([[extractLinks]]), resolve each to a destination host — absolute
   * links through [[urlCanonical]]'s host rules, site-relative links
   * (`/…`) to the SOURCE host, anything else (fragments, mailto,
   * protocol-relative under a null source) dropped — and aggregate to
   * (src_host, dst_host, n_links). Self-edges (intra-host links) are
   * kept; filter them for a cross-host graph. Feed straight into
   * `GraphFrame.fromEdges` after renaming to src/dst.
   *
   * Scale shape: link extraction is a projection; host resolution is
   * per-row; the only shuffle is the final (src_host, dst_host) count
   * aggregation — partial-aggregated map-side, so hub hosts combine
   * before the exchange. `maxLinksPerPage` (0 = uncapped) bounds the
   * explode fan-out per page (first n non-empty links in document
   * order, THRESHOLDS.md row 23) — the crawler-trap page with 10⁵
   * hrefs otherwise skews exactly this aggregation's hot keys; measure
   * what a cap drops with [[extractLinks]]' `n_links_dropped` column
   * before committing to one. */
  def linkGraph(df: DataFrame, idCol: String, urlCol: String,
      htmlCol: String, maxLinksPerPage: Int = 0): DataFrame = {
    require(maxLinksPerPage >= 0,
      s"maxLinksPerPage must be >= 0 (0 = uncapped), got $maxLinksPerPage")
    val h = col(htmlCol)
    val dq = regexp_extract_all(h, lit("(?is)href\\s*=\\s*\"([^\"]*)\""), lit(1))
    val sq = regexp_extract_all(h, lit("(?is)href\\s*=\\s*'([^']*)'"), lit(1))
    val links =
      if (maxLinksPerPage == 0) concat(dq, sq)
      else slice(filter(concat(dq, sq), x => length(x) > 0),
        1, maxLinksPerPage)
    // the source host rides the explode — zero joins, one agg
    df.select(urlHostKey(col(urlCol)).as("src_host"),
        explode(links).as("link"))
      .filter(length(col("link")) > 0)
      .withColumn("dst_host",
        when(col("link").startsWith("/") && !col("link").startsWith("//"),
          col("src_host"))
          .otherwise(urlHostKey(col("link"))))
      .filter(col("src_host").isNotNull && col("dst_host").isNotNull)
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))
  }

  /** Crawl → rank in one call: [[linkGraph]]'s (src_host, dst_host,
   * n_links) edges fed through `GraphFrame.fromEdges` into PageRank
   * weighted by the link count — the composition the host graph exists
   * for (rank hosts by where the web's links actually point, then gate
   * crawling/sampling budgets on the rank). Returns (host, pagerank).
   *
   * Self-edges (intra-host links) are kept, matching [[linkGraph]]:
   * a host that mostly links to itself holds its own mass, which is the
   * honest random-surfer semantics for session-heavy sites.
   *
   * Scale shape: [[linkGraph]]'s one aggregation, then PageRank over a
   * HOST-granularity graph — millions of vertices for a full crawl, not
   * billions of pages; the iteration state is (host, rank) and each
   * round is one hash-aggregated join, exactly the weighted-PageRank
   * plan the engine already ships. */
  def hostRank(df: DataFrame, idCol: String, urlCol: String,
      htmlCol: String, maxIter: Int = 10, resetProbability: Double = 0.15,
      maxLinksPerPage: Int = 0): DataFrame = {
    // persist the host edge list BEFORE handing it to PageRank (r14
    // optimization): the rank loop runs several actions over the graph
    // (weight validation, the small-graph probe, edge/vertex collects on
    // the local tail, the final readout joins — and fromEdges re-derives
    // vertices from edges, doubling each), and each one otherwise re-runs
    // the WHOLE crawl extraction — the regex-heavy projection over every
    // page (measured 6× recompute = 3.5 s for a 5-host gate graph; 0.9 s
    // persisted). The cached frame is host-pair-granularity — millions of
    // rows for a full crawl, never pages — exactly the table the scaladoc
    // above promises is small.
    val edges = linkGraph(df, idCol, urlCol, htmlCol, maxLinksPerPage)
      .select(col("src_host").as(graft.GraphFrame.SRC),
        col("dst_host").as(graft.GraphFrame.DST),
        col("n_links").cast("double").as("_w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranks = graft.GraphFrame.fromEdges(edges).pageRank
      .resetProbability(resetProbability).maxIter(maxIter).weightCol("_w")
      .run().vertices
      .select(col(graft.GraphFrame.ID).as("host"), col("pagerank"))
    // r15 (cache hygiene, ADVICE item): the edge pin is operator-INTERNAL
    // and must not outlive the call. On the distributed path the result is
    // lineage-cut and self-contained, but on the small-graph tail it is a
    // lazy join-back whose vertex side re-derives from `edges` — so cut
    // the host-count-sized result eagerly here, then unpersist the edges.
    // The returned frame reads only its own blocks (released by the
    // ContextCleaner on GC, or eagerly via
    // [[graft.lib.IterationManager.release]] / GraphFrame.release).
    val out = ranks.localCheckpoint(true)
    edges.unpersist(false)
    out
  }

  /** The [[urlCanonical]] host key (lowercased, userinfo and default
   * port dropped, `www.` stripped) of a single URL Column — null when
   * the value has no `scheme://host`. */
  private[pipeline] def urlHostKey(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val noUser = regexp_replace(auth0, "^[^@]*@", "")
    val host = when(scheme === "http", regexp_replace(noUser, ":80$", ""))
      .when(scheme === "https", regexp_replace(noUser, ":443$", ""))
      .otherwise(noUser)
    when(length(scheme) > 0 && length(host) > 0,
      regexp_replace(host, "^www\\.", ""))
  }

  /** Domain-level crawl statistics — the table behind host blocklists and
   * per-domain sampling caps (RefinedWeb §3.1 removes whole domains
   * before any content pass): per [[urlCanonical]] host, the crawl row
   * count, the distinct canonical pages, and the within-host exact-dup
   * ratio (1 − pages/rows — high values mean session-id/tracking churn
   * or crawler traps). Rows with no parseable host are dropped (they
   * carry no domain signal; [[urlCanonical]] itself reports them as
   * nulls). Returns (host, n_docs, n_pages, dup_ratio 4dp).
   *
   * Scale shape: one exact distinct-count aggregation — Spark plans it
   * as a (host, url_key) pre-aggregation then a per-host count, so a
   * mega-host's pages still spread over the cluster in phase one and
   * only its per-page singletons meet at one reducer. */
  def hostStats(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val c = urlCanonical(df, idCol, urlCol)
    c.filter(col("host").isNotNull)
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url_key")).as("n_pages"),
        round(lit(1.0) -
          countDistinct(col("url_key")) / count(lit(1)).cast("double"), 4)
          .as("dup_ratio"))
  }
}
