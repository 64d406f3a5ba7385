package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Host-level link graph + PageRank — the crawl-frontier prioritization
  * layer (which hosts to fetch first / keep at all). CommonCrawl publishes
  * exactly this artifact (host- and domain-level ranks over the webgraph);
  * quality-filtering recipes use host rank as a prior, and frontier
  * schedulers use it as the fetch-priority key. The reference has no graph
  * surface at all; this is beyond-reference, same as the dedup/packing
  * layers.
  *
  * Two halves, composable but independent:
  *   1. edge EXTRACTION ([[hrefs]], [[linkHost]], [[hostEdges]]) — from raw
  *      HTML + the page URL to a distinct `(src, dst)` host-pair table,
  *      map-only until the final distinct;
  *   2. iterative RANKING ([[pageRank]]) — the Page et al. 1999 power
  *      iteration with damping and dangling-mass redistribution, expressed
  *      as per-iteration DataFrame joins so Catalyst/AQE own the physical
  *      plan.
  *
  * Scale shape (the 100 TB contract):
  *   - The edge table (page-count sized before `distinct`, host-pair sized
  *     after) is aggregated ONCE, persisted with its out-degree attached,
  *     and reused by every iteration — the expensive corpus scan never
  *     re-runs inside the loop.
  *   - Per iteration: one shuffle of the VERTEX-sized rank table to the
  *     edge partitioning (hosts are ~10⁷ at web scale, orders below the
  *     edge count), one `groupBy(dst)` whose `sum` partial-aggregates
  *     map-side — the everyone-links-to-google hot dst key is combiner-safe
  *     by construction — and one 1-row broadcast for the dangling mass.
  *     The hot SRC key (a host with 10⁸ out-edges makes one giant src
  *     partition in the contribution join) is the AQE skew-join case;
  *     leave AQE on.
  *   - The dangling term is computed IN-PLAN (vertex-sized left-anti join
  *     aggregated to one row, cross-joined back as a broadcast scalar) —
  *     no per-iteration driver collect. The only driver value is the
  *     one-time vertex count.
  *   - Each iteration's rank frame is CHECKPOINTED, not merely persisted:
  *     the new plan references the old rank frame three times (dangling,
  *     contributions, and transitively the vertex set), so the ANALYZED
  *     logical plan grows ~3× per iteration — caching bounds the physical
  *     work but not the plan tree, and ten iterations of uncut lineage OOM
  *     the DRIVER on plan strings alone (AQE stringifies the plan per
  *     update). `localCheckpoint` by default (vertex-sized, executor
  *     memory); when the session has a reliable checkpoint dir configured
  *     (`sc.setCheckpointDir`), that is used instead — the right choice on
  *     a 1000-executor cluster, where an executor loss must not invalidate
  *     the iteration state.
  */
object LinkGraph {

  /** `href` attribute values from raw HTML — double- OR single-quoted,
    * case-insensitive attribute name, whitespace around `=` tolerated.
    * Pure extraction: no resolution, no filtering (that is [[linkHost]]'s
    * job). Unquoted hrefs (`href=/a>`) are legacy-tolerated up to the next
    * whitespace or `>`.
    */
  def hrefs(html: Column): Column = {
    // (?<![\w-]): the real `href` attribute only — `\b` matches between
    // `-` and `h`, so it would extract data-href=/ng-href= template
    // attributes as links and inflate cross-host edges
    val dq = regexp_extract_all(html,
      lit("(?i)(?<![\\w-])href\\s*=\\s*\"([^\"]*)\""), lit(1))
    val sq = regexp_extract_all(html,
      lit("(?i)(?<![\\w-])href\\s*=\\s*'([^']*)'"), lit(1))
    val uq = regexp_extract_all(html,
      lit("(?i)(?<![\\w-])href\\s*=\\s*([^\\s\"'>][^\\s>]*)"), lit(1))
    concat(dq, sq, uq)
  }

  /** The first `<base href>` value of a document (the HTML spec: the FIRST
    * `base` element with an `href` attribute wins; later ones are
    * ignored), null when absent or empty. Same three quoting forms as
    * [[hrefs]]; a `<base target="…">` without href never matches (the
    * lazy `[^>]*?` cannot cross its `>`, so the scan moves to the next
    * base tag).
    */
  def baseHref(html: Column): Column = {
    val pat = "(?is)<base\\b[^>]*?(?<![\\w-])href\\s*=\\s*" +
      "(?:\"([^\"]*)\"|'([^']*)'|([^\\s\"'>][^\\s>]*))"
    val dq = regexp_extract(html, pat, 1)
    val sq = regexp_extract(html, pat, 2)
    val uq = regexp_extract(html, pat, 3)
    val v = when(dq =!= "", dq).when(sq =!= "", sq).otherwise(uq)
    when(v === "", lit(null).cast("string")).otherwise(trim(v))
  }

  /** The HOST that relative/rooted links of a page actually resolve
    * against, when a `<base href>` changes it from the page's own host —
    * null otherwise (caller coalesces with the page host). Boilerplate
    * CMS pages use base tags routinely; ignoring them mis-attributes
    * every relative link of such pages. Rules: absolute `http(s)` base →
    * that host; protocol-relative `//host/…` base → that host; relative /
    * rooted base (host unchanged by RFC 3986 resolution) and non-web
    * schemes (invalid as a base for crawlable links) → null.
    */
  def baseHost(html: Column): Column = {
    val b = baseHref(html)
    val scheme = lower(regexp_extract(b, "^([a-zA-Z][a-zA-Z0-9+.\\-]*):", 1))
    when(b.isNull, lit(null).cast("string"))
      .when(scheme === "http" || scheme === "https", WebText.urlHost(lower(b)))
      .when(scheme =!= "", lit(null).cast("string"))
      .when(b.startsWith("//"),
        WebText.urlHost(concat(lit("http:"), lower(b))))
      .otherwise(lit(null).cast("string"))
  }

  /** Resolve one href against its page URL into a destination HOST (the
    * granularity of the host graph; full URL resolution is deliberately
    * out of scope — RFC 3986 dot-segment math never changes the host).
    * Deterministic rules, each replayable in plain SQL:
    *   - empty / fragment-only (`#…`) → null (same-document);
    *   - explicit scheme: `http`/`https` → [[WebText.urlHost]]; any other
    *     scheme (`mailto:`, `javascript:`, `ftp:`, `tel:`, `data:`) → null
    *     (not a crawlable web edge);
    *   - protocol-relative `//host/…` → that host;
    *   - everything else (rooted `/path`, relative `a/b`, `?query`) → the
    *     BASE host: the page's own host, unless the document carries a
    *     host-changing `<base href>` (pass [[baseHost]] as `base` — the
    *     three-arg overload; RFC 3986 dot-segment math never changes the
    *     host, so host granularity needs only this one base rule).
    */
  def linkHost(href: Column, pageUrl: Column): Column =
    linkHost(href, pageUrl, lit(null).cast("string"))

  /** [[linkHost]] with an explicit base host for relative/rooted links
    * (null base = the page's own host).
    */
  def linkHost(href: Column, pageUrl: Column, base: Column): Column = {
    val h = trim(href)
    val scheme = lower(regexp_extract(h, "^([a-zA-Z][a-zA-Z0-9+.\\-]*):", 1))
    when(h === "" || h.startsWith("#"), lit(null).cast("string"))
      .when(scheme === "http" || scheme === "https", WebText.urlHost(h))
      .when(scheme =!= "", lit(null).cast("string"))
      .when(h.startsWith("//"), WebText.urlHost(concat(lit("http:"), h)))
      .otherwise(coalesce(base, WebText.urlHost(pageUrl)))
  }

  /** `(href, anchor)` pairs from `<a …href=…>TEXT</a>` elements — the
    * anchor-text corpus (anchor text describes the TARGET page; search and
    * quality pipelines aggregate it per destination as an independent
    * relevance signal). One alternation pattern matched twice with
    * different group indices and zipped positionally (Spark's
    * `regexp_extract_all` extracts one group per pass; identical pattern ⇒
    * identical match positions ⇒ aligned arrays). Inner markup is
    * stripped, whitespace collapsed, text trimmed.
    */
  def anchors(html: Column): Column = {
    // the same three quoting forms [[hrefs]] accepts (double/single/
    // unquoted) — the two halves of the module must agree on which links
    // exist, or a host can carry rank evidence with zero anchor rows from
    // identical markup
    val pat = "(?is)<a\\b[^>]*?(?<![\\w-])href\\s*=\\s*" +
      "(?:\"([^\"]*)\"|'([^']*)'|([^\\s\"'>][^\\s>]*))[^>]*>(.*?)</a>"
    val dq = regexp_extract_all(html, lit(pat), lit(1))
    val sq = regexp_extract_all(html, lit(pat), lit(2))
    val uq = regexp_extract_all(html, lit(pat), lit(3))
    val tx = regexp_extract_all(html, lit(pat), lit(4))
    val href0 = zip_with(dq, sq, (a, b) => when(a =!= "", a).otherwise(b))
    zip_with(zip_with(href0, uq, (a, b) => when(a =!= "", a).otherwise(b)), tx,
      (href, raw) => struct(
        href.as("href"),
        trim(regexp_replace(regexp_replace(raw, "<[^>]*>", " "), "\\s+", " "))
          .as("anchor")))
  }

  /** Cross-host anchor-text table `(src, dst, anchor)`: one row per anchor
    * occurrence whose link resolves to a DIFFERENT host (same-host
    * navigation anchors — "Home", "About" — are chrome, not description),
    * empty anchors dropped. NOT deduplicated: aggregation strategy (count
    * weighting vs distinct) belongs to the consumer.
    */
  def anchorTexts(df: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val src = WebText.urlHost(col(urlCol))
    Dedup.ensureParallelism(df)
      .select(src.as("src"), explode(anchors(col(htmlCol))).as("__a"),
        col(urlCol).as("__url"), baseHost(col(htmlCol)).as("__base"))
      .select(col("src"),
        linkHost(col("__a.href"), col("__url"), col("__base")).as("dst"),
        col("__a.anchor").as("anchor"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst") && col("anchor") =!= "")
  }

  /** Distinct cross-host edge table `(src, dst)` from a page frame: src is
    * the page URL's host, dst each resolved link host; nulls (unparseable
    * page URL, non-web hrefs) and self-loops (intra-host links) drop.
    * Map-only explode → ONE `distinct` (hash-partial map-side, so a nav
    * link repeated on every page of a host costs one hash-table slot per
    * task, not a shuffle row per occurrence — then one exchange of the
    * already-collapsed pairs).
    */
  def hostEdges(df: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val src = WebText.urlHost(col(urlCol))
    Dedup.ensureParallelism(df)
      .select(src.as("src"), explode(hrefs(col(htmlCol))).as("__href"),
        col(urlCol).as("__url"), baseHost(col(htmlCol)).as("__base"))
      .select(col("src"),
        linkHost(col("__href"), col("__url"), col("__base")).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
  }

  /** Damped PageRank over a directed edge table (columns `src`, `dst`;
    * duplicates tolerated — deduplicated here) — the exact recurrence, so
    * an oracle can replay it term by term:
    * {{{
    *   r₀(v)    = 1/N
    *   rₜ₊₁(v)  = (1−d)/N + d·( Σ_{u→v} rₜ(u)/deg(u) + Dₜ/N )
    *   Dₜ       = Σ_{deg(u)=0} rₜ(u)           (dangling mass)
    * }}}
    * Total rank mass is conserved at 1 every iteration (the dangling term
    * redistributes sink mass uniformly — dropping it, a common shortcut,
    * deflates all ranks and breaks cross-snapshot comparability).
    * Returns `(host, rank)` for every vertex that appears in the edge
    * table on either side. Fixed iteration count (the published webgraph
    * ranks use 10–50; host graphs converge fast because diameter is low) —
    * a convergence test would add a per-iteration driver round-trip for no
    * decision a fixed budget doesn't already make.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 10,
      damping: Double = 0.85
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    val e = edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vertices = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = vertices.count().toDouble
    // Loop-stage width sized to the GRAPH, not the session: a 300-vertex
    // gate graph gains nothing from 32-way iteration stages — their fixed
    // per-task/per-block cost (scheduling + checkpoint blocks × 3 stages ×
    // K iterations) is pure overhead at toy scale. Width follows the
    // LARGER of edge and vertex count (the contribution join's work is
    // edge-sized — sizing by vertices alone would starve a 40-edges-per-
    // host webgraph of parallelism), 50k rows per partition, capped at
    // the session width, so at real scale this IS the session's shuffle
    // parallelism and the plan is unchanged.
    val loopParts = math.max(1L, math.min(
      edges.sparkSession.sessionState.conf.numShufflePartitions.toLong,
      math.max(e.count(), n.toLong) / 50000L + 1L)).toInt
    // out-degree rides WITH the edge row so the in-loop contribution join
    // needs no second join against a degree table; the cached relation is
    // explicitly hash-partitioned on src so the per-iteration sort-merge
    // join reuses that partitioning and only the VERTEX-sized rank side
    // exchanges. When the build join is itself sort-merge the output is
    // already src-partitioned and this exchange is a no-op-sized shuffle;
    // the explicit repartition makes the invariant STRATEGY-INDEPENDENT —
    // if Catalyst broadcast the degree table at build (vertex-sized, can
    // read under the threshold while the in-loop rank estimate reads
    // over), the cache would otherwise inherit the (src, dst) distinct
    // partitioning and the edge table — the big side by orders of
    // magnitude — would re-shuffle every iteration.
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val ewd = e.join(deg, "src").repartition(loopParts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ewd.count()
    e.unpersist()
    // the dangling-vertex SET is loop-invariant: materialize it once (a
    // lazy anti-join here would re-scan the edge cache and re-run its
    // distinct every iteration just to rediscover the same set)
    val danglingVerts = vertices
      .join(ewd.select(col("src").as("host")).distinct(),
        Seq("host"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    danglingVerts.count()
    val reliable =
      edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    var ranks = vertices.select(col("host"), lit(1.0 / n).as("rank"))
    var prev: DataFrame = null
    for (_ <- 1 to iterations) {
      val dangling = ranks
        .join(danglingVerts, Seq("host"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val contribs = ewd
        .join(ranks.withColumnRenamed("host", "src"), "src")
        .groupBy(col("dst").as("host"))
        .agg(sum(col("rank") / col("__deg")).as("__c"))
      val next = cut(vertices.join(contribs, Seq("host"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("host"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("__c"), lit(0.0)) + col("__dm") / lit(n)))
            .as("rank"))
        .repartition(loopParts, col("host")))
      // cut() is EAGER, so the superseded snapshot can be dropped now —
      // otherwise every iteration's vertex-sized rank copy stays resident
      // for the whole run and evicts the edge cache the loop depends on.
      // Dropped via the CHECKPOINTED RDD, not Dataset.unpersist: the
      // snapshot's blocks belong to the localCheckpoint'ed RDD behind the
      // LogicalRDD leaf, which is not a CacheManager entry — unpersisting
      // the Dataset would free nothing and leave reclamation to GC.
      // (Safe because `next` is fully materialized before the drop; a
      // localCheckpoint'ed RDD cannot be recomputed once unpersisted.)
      if (prev != null) dropSnapshot(prev)
      prev = ranks
      ranks = next
    }
    if (prev != null) dropSnapshot(prev)
    danglingVerts.unpersist()
    vertices.unpersist()
    ewd.unpersist()
    ranks
  }

  /** Free a superseded checkpoint snapshot's storage NOW: the blocks live
    * on the (local)checkpointed RDD behind the frame's LogicalRDD leaf —
    * not in the CacheManager, so `Dataset.unpersist` cannot reach them and
    * GC-driven ContextCleaner reclamation is the only (slow, async)
    * alternative. No-op for non-checkpointed frames (no LogicalRDD leaf).
    */
  private def dropSnapshot(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** [[hostEdges]] + [[pageRank]] in one call — the "rank my crawl" verb.
    * Returns `(host, rank)`; hosts with no surviving cross-host edge on
    * either side do not appear (they have no graph evidence either way).
    */
  def rankHosts(
      df: DataFrame,
      urlCol: String,
      htmlCol: String,
      iterations: Int = 10,
      damping: Double = 0.85
  ): DataFrame =
    pageRank(hostEdges(df, urlCol, htmlCol), iterations, damping)

  /** Aggregate host-level ranks to REGISTRABLE DOMAINS (PSL eTLD+1) — the
    * second artifact CommonCrawl publishes next to host ranks (site-level
    * quotas, blocklists and quality priors key by domain, not host). The
    * domain's rank is the SUM of its hosts' stationary mass — the
    * probability the random surfer is anywhere on the domain — which keeps
    * Σ rank = 1 and needs no second iteration run. This is deliberately
    * NOT PageRank re-run on a domain-contracted graph: contraction turns
    * intra-domain cross-host links into self-loops and changes the
    * transition matrix, so the two notions genuinely differ; mass
    * aggregation is the standard rank-rollup. One map-side-combined
    * aggregation over the vertex-sized rank table (the PSL probe runs
    * per row inside codegen — no join, no broadcast). `rules` defaults to
    * the compact built-in subset; pass a parsed copy of the full published
    * list ([[graft.ops.expr.PslRules.parse]]) for real-web keying.
    */
  def domainRank(
      hostRanks: DataFrame,
      rules: graft.ops.expr.PslRules = graft.ops.expr.PslRules.default
  ): DataFrame =
    hostRanks
      .groupBy(WebText.registrableDomainPsl(col("host"), rules).as("domain"))
      .agg(sum(col("rank")).as("rank"))

  /** [[hostEdges]] + [[pageRank]] + [[domainRank]] — the domain-level
    * "rank my crawl" verb.
    */
  def rankDomains(
      df: DataFrame,
      urlCol: String,
      htmlCol: String,
      iterations: Int = 10,
      damping: Double = 0.85,
      rules: graft.ops.expr.PslRules = graft.ops.expr.PslRules.default
  ): DataFrame =
    domainRank(rankHosts(df, urlCol, htmlCol, iterations, damping), rules)

  /** Degree summary of an edge table: per host, distinct out- and
    * in-degree — the cheap frontier signal (hub-ness / authority-ness)
    * when a full rank run is not warranted. One aggregation per side over
    * the deduplicated edges, full-outer-joined vertex-sized.
    */
  def degreeStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val out = e.groupBy(col("src").as("host"))
      .agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("dst").as("host"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("host"), "full_outer")
      .select(col("host"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
