package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-side extraction kernels — the operations UPSTREAM of every
  * dedup/quality family in this engine, where a real training-data
  * pipeline starts: raw crawled HTML → main text, and raw URLs →
  * canonical form + host grouping.
  *
  *  - [[extractMainText]] — boilerplate strip in the trafilatura /
  *    jusText class (Barbaresi 2021; Pomikálek 2011): drop
  *    head/script/style/comments, segment into block-level units,
  *    discard high-link-density blocks (nav bars, footers, ad lists),
  *    strip tags, decode entities, normalize whitespace.
  *  - [[canonicalUrl]] — URL normalization (RFC 3986 §6 syntax-based
  *    normalization + the usual crawler extensions): lowercase
  *    scheme/host, strip `www.`, drop default ports, drop fragments,
  *    drop `utm_*` tracking params, sort the remaining query params,
  *    strip non-root trailing slashes.
  *
  * Both are pure column pipelines over codegen'd built-ins
  * (`regexp_replace` / `split` / higher-order array ops) — stateless
  * scans with no shuffle, so at 100 TB they run at scan parallelism
  * and fuse into whatever keyed aggregation follows (the q163 host
  * grouping is the only exchange in its whole query).
  */
object CrawlOps {

  /** Fraction of a block's visible characters that sit inside
    * `<a>` anchors above which the block is boilerplate. jusText's
    * default stop-list-free heuristic band is 0.2–0.5; 1/3 keeps
    * short in-prose citation links while rejecting nav/footer/ad
    * link lists.
    */
  val MaxLinkDensity = 1.0 / 3.0

  /** Closing tags that end a block-level unit — the segmentation
    * boundary for per-block link-density scoring. Self-closing
    * `<br>`/`<hr>` also break blocks.
    */
  private val blockBoundary =
    "(?i)</(?:p|div|li|ul|ol|h[1-6]|table|tr|td|nav|footer|header|section|article|blockquote)>|<(?:br|hr)\\s*/?>"

  /** Non-content regions removed wholesale before block segmentation:
    * comments first (they may contain tag-lookalikes), then the whole
    * `<head>` (title/meta are metadata, not body text), then any
    * body-level script/style islands.
    */
  private def stripNonContent(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noHead = regexp_replace(noComments, "(?is)<head\\b[^>]*>.*?</head>", " ")
    val noScript = regexp_replace(noHead, "(?is)<script\\b[^>]*>.*?</script>", " ")
    regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
  }

  /** Visible text of one raw block: tags → spaces, THEN entity decode
    * (decoding first would let `&lt;script&gt;` smuggle tags past the
    * strip — the classic sanitizer ordering bug, asserted in
    * CrawlSpec), then whitespace collapse. `&amp;` decodes last so it
    * cannot re-trigger the other entities.
    */
  private def blockText(block: Column): Column = {
    val untagged = regexp_replace(block, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(untagged) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** VISIBLE characters inside `<a>…</a>` anchors of one raw block —
    * each captured anchor body runs through the same tag-strip +
    * decode + collapse pipeline as the denominator ([[blockText]]),
    * so a markup-wrapped anchor (`<a><img src=…></a>`, nested spans)
    * contributes its visible text only. Counting the RAW inner HTML
    * would inflate link density with attribute/tag characters the
    * text measure never sees and wrongly drop content blocks.
    */
  private def linkChars(block: Column): Column =
    aggregate(
      transform(regexp_extract_all(block, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
        t => length(blockText(t))),
      lit(0), (acc, n) => acc + n)

  /** Main-text extraction: returns
    * `struct(clean_text, n_blocks_kept, n_blocks_dropped)`. A block
    * counts (kept or dropped) only if it has any visible text; kept
    * iff its link density ≤ [[MaxLinkDensity]]. `clean_text` is the
    * kept blocks' visible text joined in document order.
    */
  def extractMainText(html: Column): Column = {
    val scored = transform(
      split(stripNonContent(html), blockBoundary),
      b => struct(
        blockText(b).as("txt"),
        linkChars(b).as("links")))
    val withText = filter(scored, s => length(s("txt")) > lit(0))
    val kept = filter(withText,
      s => s("links").cast("double") <= length(s("txt")) * lit(MaxLinkDensity))
    struct(
      array_join(transform(kept, s => s("txt")), " ").as("clean_text"),
      size(kept).cast("long").as("n_blocks_kept"),
      (size(withText) - size(kept)).cast("long").as("n_blocks_dropped"))
  }

  /** Canonical form of a URL column (see object doc for the rule
    * set). Built on `try_parse_url` (codegen ParseUrl over
    * java.net.URI, non-throwing) — malformed URLs yield NULL instead
    * of killing the scan, the only acceptable error contract when one
    * bad row in 100 TB of crawl would otherwise fail the stage.
    */
  /** Authority minus userinfo (`user@` prefixes the host in the raw
    * AUTHORITY and must not poison the grouping key), lowercased.
    * Userinfo ends at the LAST `@` — a password may itself contain
    * `@`, so the strip is greedy.
    */
  private def bareAuthority(url: Column): Column =
    regexp_replace(lower(try_parse_url(url, lit("AUTHORITY"))), "^.*@", "")

  /** Host of a bare authority: strip the TRAILING `:digits` port only
    * — an IPv6 literal's colons live inside `[...]` and a first-colon
    * split would cut `[2001:db8::1]:8080` at `[2001`.
    */
  private def authorityHost(bare: Column): Column =
    regexp_replace(regexp_replace(bare, ":[0-9]+$", ""), "^www\\.", "")

  def canonicalUrl(url: Column): Column = {
    val proto = lower(try_parse_url(url, lit("PROTOCOL")))
    val bare = bareAuthority(url)
    val host = authorityHost(bare)
    val port = regexp_extract(bare, ":([0-9]+)$", 1)
    val portPart = when(
      (proto === "http" && port === "80") ||
        (proto === "https" && port === "443") || port === "",
      lit("")).otherwise(concat(lit(":"), port))
    val pathRaw = coalesce(try_parse_url(url, lit("PATH")), lit(""))
    val path = when(pathRaw === "" || pathRaw === "/", lit("/"))
      .otherwise(regexp_replace(pathRaw, "/$", ""))
    val params = filter(
      split(coalesce(try_parse_url(url, lit("QUERY")), lit("")), "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val query = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    concat(proto, lit("://"), host, portPart, path, query)
  }

  /** Canonical registrable host of a URL (lowercased, userinfo and
    * port stripped, `www.` stripped) — the grouping key for
    * host-level crawl stats.
    */
  def canonicalHost(url: Column): Column =
    authorityHost(bareAuthority(url))
}
