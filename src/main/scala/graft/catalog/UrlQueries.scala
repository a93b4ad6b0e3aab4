package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions
import Tables._

/** URL/domain-level curation queries — the CCNet/RefinedWeb stage
  * upstream of text quality: canonicalize URLs, extract registrable
  * domains, aggregate and filter at domain level. The documents table
  * has no URL column, so both engines synthesize the same deterministic
  * URL per doc (the MultimodalQueries deterministic-fake pattern):
  * eight variants covering mixed-case scheme/host, default and
  * non-default ports, tracking params, fragments, empty paths, and the
  * Public Suffix List edge space — a ccTLD second-level (co.uk), a
  * private-section suffix (github.io), a wildcard TLD (*.bd), and an
  * exception rule (!city.kawasaki.jp). The oracle replays the full PSL
  * algorithm in SQL, joining the rule table interpolated from the
  * AUTHORITATIVE vendored list
  * ([[graft.functions.PublicSuffixList.authoritative]], ~9.5k rules)
  * in the same join shape as the runtime
  * [[graft.ops.UrlOps.registrableDomainByTable]] path.
  *
  * Scale shape: normalization/domain extraction are fused zero-shuffle
  * row kernels; q_domain_filter is one domain-keyed partial-agg shuffle
  * over tiny (domain, count) pairs plus a broadcast-back of the
  * (blocklist ∪ over-cap) domain set — the corpus is scanned once and
  * never re-shuffled, which is the shape that survives 100 TB.
  */
object UrlQueries {

  /** Domains curated out regardless of volume (the editorial blocklist). */
  private[catalog] val Blocklist = Seq("src0.com")

  /** Deterministic per-doc URL, identical in Spark and the DuckDB
    * oracle. Variants by doc_id % 8 (see object doc); v5–v7 exercise
    * the Public Suffix List beyond plain two-label domains: a
    * private-section suffix (github.io), a wildcard TLD (*.bd), and an
    * exception rule (!city.kawasaki.jp).
    */
  private[catalog] def urlExpr: Column = {
    val id = col("doc_id")
    val v = pmod(id, lit(8L))
    when(v === 0, concat(lit("HTTP://WWW."), upper(col("source")),
        lit(".COM:80/articles/"), id.cast("string"),
        lit("?utm_source=feed&id="), pmod(id, lit(97L)).cast("string"),
        lit("#top")))
      .when(v === 1, concat(lit("https://News."), col("source"),
        lit(".co.uk:443/world/politics?b=2&a=1&utm_campaign=x")))
      .when(v === 2, concat(lit("http://"), col("source"),
        lit(".org:8080/Path/Sub/?fbclid=abc"), id.cast("string")))
      .when(v === 3, concat(lit("https://cdn."), upper(col("source")),
        lit(".IO?ref=home&z=9&gclid=g"), id.cast("string")))
      .when(v === 4, concat(
        lit("http://ads.tracker.net/click?utm_medium=cpc&cid="),
        id.cast("string")))
      .when(v === 5, concat(lit("https://"), col("source"),
        lit(".github.io/post/"), id.cast("string")))
      .when(v === 6, concat(lit("http://news."), col("source"),
        lit(".com.bd/story/"), id.cast("string")))
      .otherwise(concat(lit("https://City.Kawasaki.JP/ward/"),
        id.cast("string"), lit("?x=1")))
  }

  private val urlSql =
    """CASE doc_id % 8
      |  WHEN 0 THEN 'HTTP://WWW.' || upper(source) || '.COM:80/articles/' || doc_id::VARCHAR || '?utm_source=feed&id=' || (doc_id % 97)::VARCHAR || '#top'
      |  WHEN 1 THEN 'https://News.' || source || '.co.uk:443/world/politics?b=2&a=1&utm_campaign=x'
      |  WHEN 2 THEN 'http://' || source || '.org:8080/Path/Sub/?fbclid=abc' || doc_id::VARCHAR
      |  WHEN 3 THEN 'https://cdn.' || upper(source) || '.IO?ref=home&z=9&gclid=g' || doc_id::VARCHAR
      |  WHEN 4 THEN 'http://ads.tracker.net/click?utm_medium=cpc&cid=' || doc_id::VARCHAR
      |  WHEN 5 THEN 'https://' || source || '.github.io/post/' || doc_id::VARCHAR
      |  WHEN 6 THEN 'http://news.' || source || '.com.bd/story/' || doc_id::VARCHAR
      |  ELSE 'https://City.Kawasaki.JP/ward/' || doc_id::VARCHAR || '?x=1'
      |END""".stripMargin

  // interpolated from the SAME rule table the kernel uses — the
  // AUTHORITATIVE vendored public_suffix_list.dat (~9.5k rules,
  // PublicSuffixList.authoritative) — so the oracle and the engine
  // can't drift on the suffix/tracker sets. At this rule count a
  // lambda list_contains scan is the wrong shape; the oracle instead
  // JOINS a (section, rtype, rule) VALUES table, mirroring the
  // runtime UrlOps.registrableDomainByTable plan (distinct hosts →
  // suffix explode → rule join → precedence agg → join back).
  private val rulesValues = graft.functions.PublicSuffixList
    .authoritative.allWithSection
    .map { case (t, r, s) => s"('$s', '$t', '$r')" }
    .mkString(",\n")
  private val trackerList =
    "['fbclid', 'gclid', 'msclkid', 'ref', 'ref_src', 'igshid', 'mc_eid']"
  private[catalog] val blockList = Blocklist.map(s => s"'$s'").mkString(", ")

  /** The registrable-domain expression over the dom0 CTE (which
    * carries hostd, ls, nl, psl_len): public suffix + one label, or
    * the whole host when it is itself a public suffix or shorter.
    */
  private[catalog] val domainSql =
    """CASE WHEN nl <= psl_len + 1 THEN hostd
      |  ELSE array_to_string(list_slice(ls, nl - psl_len, nl), '.') END""".stripMargin

  /** [[domainSql]] under the ICANN-only suffix length (dom0 also
    * carries psl_len_icann) — the registrant-level domain.
    */
  private[catalog] val domainIcannSql =
    """CASE WHEN nl <= psl_len_icann + 1 THEN hostd
      |  ELSE array_to_string(list_slice(ls, nl - psl_len_icann, nl), '.') END""".stripMargin

  /** Shared oracle prelude: synthesized url -> host (lowercased,
    * port-stripped) + label array + PSL public-suffix length, per doc.
    * The PSL replay mirrors publicsuffix.org in the JOIN shape of
    * `UrlOps.registrableDomainByTable`: distinct hosts explode into
    * k-label suffixes, suffixes hash-join the rule table (exact and
    * exception rules on the full suffix, `*.base` wildcards on the
    * k−1-label base), and a host-keyed agg applies precedence —
    * exception wins (psl = rule labels − 1), else the longest match,
    * else the default rule `*` (psl = 1). Both the full-list and the
    * ICANN-section-only lengths come out of the same agg.
    */
  private[catalog] val hostCtes =
    s"""psl_rules(section, rtype, rule) AS (VALUES
       |$rulesValues),
       |d AS (SELECT doc_id, n_chars, source FROM documents),
       |u AS (SELECT doc_id, n_chars, $urlSql AS url FROM d),
       |p1 AS (SELECT doc_id, n_chars, regexp_replace(url, '#.*', '') AS nofrag FROM u),
       |p2 AS (SELECT doc_id, n_chars, nofrag,
       |    lower(split_part(nofrag, '://', 1)) AS scheme,
       |    split_part(nofrag, '://', 2) AS rest FROM p1),
       |p3 AS (SELECT *, split_part(split_part(rest, '/', 1), '?', 1) AS hostport FROM p2),
       |p4 AS (SELECT *, substr(rest, length(hostport) + 1) AS pathq,
       |    lower(split_part(hostport, ':', 1)) AS host,
       |    CASE WHEN contains(hostport, ':') THEN split_part(hostport, ':', 2) ELSE '' END AS port
       |  FROM p3),
       |lab AS (SELECT *, string_split(hostd, '.') AS ls,
       |    len(string_split(hostd, '.')) AS nl
       |  FROM (SELECT *, regexp_replace(host, '\\.$$', '') AS hostd FROM p4)),
       |hosts AS (SELECT DISTINCT hostd, ls AS hls, nl AS hnl FROM lab),
       |sfx AS (SELECT hostd, hnl, hls, unnest(range(1, hnl + 1)) AS k FROM hosts),
       |sfx2 AS (SELECT hostd, k,
       |    array_to_string(list_slice(hls, hnl - k + 1, hnl), '.') AS sfx,
       |    CASE WHEN k >= 2
       |      THEN array_to_string(list_slice(hls, hnl - k + 2, hnl), '.')
       |      ELSE '' END AS base
       |  FROM sfx),
       |psl_hits AS (
       |  SELECT s.hostd, s.k, r.rtype, r.section FROM sfx2 s
       |    JOIN psl_rules r ON r.rule = s.sfx AND r.rtype <> 'wildcard'
       |  UNION ALL
       |  SELECT s.hostd, s.k, r.rtype, r.section FROM sfx2 s
       |    JOIN psl_rules r ON r.rule = s.base AND r.rtype = 'wildcard' AND s.k >= 2),
       |psl_m AS (SELECT hostd,
       |    max(CASE WHEN rtype = 'exception' THEN k END) AS exck,
       |    max(CASE WHEN rtype <> 'exception' THEN k END) AS bestk,
       |    max(CASE WHEN rtype = 'exception' AND section = 'icann' THEN k END) AS exck_i,
       |    max(CASE WHEN rtype <> 'exception' AND section = 'icann' THEN k END) AS bestk_i
       |  FROM psl_hits GROUP BY hostd),
       |hostpsl AS (SELECT h.hostd,
       |    CASE WHEN m.exck IS NOT NULL THEN m.exck - 1
       |         ELSE greatest(coalesce(m.bestk, 1), 1) END AS psl_len,
       |    CASE WHEN m.exck_i IS NOT NULL THEN m.exck_i - 1
       |         ELSE greatest(coalesce(m.bestk_i, 1), 1) END AS psl_len_icann
       |  FROM hosts h LEFT JOIN psl_m m USING (hostd)),
       |dom0 AS (SELECT l.*, hp.psl_len, hp.psl_len_icann
       |  FROM lab l JOIN hostpsl hp USING (hostd))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_url_normalize" -> { (s, dir) =>
      // canonical URL + registrable domain per doc: three fused
      // zero-shuffle row kernels (normalize / host / domain), one scan
      val docs = load(s, dir, "documents")
      val host = UrlFunctions.urlHost(urlExpr)
      docs.select(col("doc_id"),
          UrlFunctions.urlNormalize(urlExpr).as("url_norm"),
          UrlFunctions.registrableDomain(host).as("domain"))
        .orderBy(col("doc_id"))
    },
    "q_domain_quality" -> { (s, dir) =>
      // the RefinedWeb domain-prior stage: per-domain Gopher pass rate
      // (the q_text_quality_rules battery aggregated at registrable-
      // domain level) + the integer-exact keep rule (pass on ≥ half the
      // domain's docs — n_pass·2 ≥ n_docs, no float compare). One
      // corpus scan (quality kernels are zero-shuffle row passes), one
      // tiny domain-keyed agg; at 100 TB the output is domains, not
      // docs.
      import graft.functions.TextFunctions
      val docs = load(s, dir, "documents")
      val t = col("text")
      val passes = TextFunctions.gopherWordCountOk(t, lo = 20) &&
        TextFunctions.gopherMeanLenOk(t) &&
        TextFunctions.gopherSymbolRatio(t) < 0.1 &&
        TextFunctions.gopherStopHits(t) >= 2
      docs.select(
          UrlFunctions.registrableDomain(UrlFunctions.urlHost(urlExpr))
            .as("domain"),
          passes.cast("long").as("pass"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), sum(col("pass")).as("n_pass"))
        .select(col("domain"), col("n_docs"), col("n_pass"),
          round(col("n_pass").cast("double") / col("n_docs"), 6)
            .as("pass_rate"),
          (col("n_pass") * 2 >= col("n_docs")).as("kept"))
        .orderBy(col("domain"))
    },
    "q_domain_icann" -> { (s, dir) =>
      // the icann_only knob: full-list domain (site grouping — PRIVATE
      // hoster suffixes like github.io split sites apart) next to the
      // ICANN-section-only domain (registrant grouping); private_suffix
      // marks docs where a PRIVATE rule changed the answer. Both are
      // fused zero-shuffle row kernels over one scan.
      val docs = load(s, dir, "documents")
      val host = UrlFunctions.urlHost(urlExpr)
      docs.select(col("doc_id"),
          UrlFunctions.registrableDomain(host).as("domain"),
          UrlFunctions.registrableDomainIcann(host).as("domain_icann"))
        .withColumn("private_suffix", col("domain") =!= col("domain_icann"))
        .orderBy(col("doc_id"))
    },
    "q_domain_filter" -> { (s, dir) =>
      // domain-level curation: per-domain doc counts (tiny agg), then
      // drop docs whose domain is blocklisted OR holds > 5% of the
      // corpus (the spam/mega-domain cap); the bad-domain set is
      // broadcast back — one corpus scan + one tiny shuffle
      val docs = load(s, dir, "documents")
      val withDom = docs.select(col("doc_id"),
        UrlFunctions.registrableDomain(UrlFunctions.urlHost(urlExpr))
          .as("domain"))
      val stats = withDom.groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"))
      val total = withDom.agg(count(lit(1)).as("total"))
      val bad = stats.crossJoin(broadcast(total))
        .filter(col("n_docs") * 20 > col("total") ||
          col("domain").isin(Blocklist: _*))
        .select(col("domain"))
      withDom.join(broadcast(bad), Seq("domain"), "left_anti")
        .select(col("doc_id"), col("domain"))
        .orderBy(col("doc_id"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_domain_quality" -> {
      // the Gopher-battery CTE mirrors q_text_quality_rules' oracle
      // (same rules, same constants), aggregated per domain; the keep
      // rule is integer arithmetic so both engines decide identically
      val toks = Tables.sqlTokens("text")
      val stopIn = graft.functions.TextFunctions.EnglishStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH $hostCtes,
         |dom AS (SELECT doc_id, $domainSql AS domain FROM dom0),
         |t AS (SELECT doc_id, text, $toks AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  len(toks)::BIGINT AS n_words,
         |  CASE WHEN len(toks) = 0 THEN 0.0
         |    ELSE list_aggregate(list_transform(toks, x -> length(x)::DOUBLE), 'sum') / len(toks) END AS mean_len,
         |  CASE WHEN len(toks) = 0 THEN 0.0
         |    ELSE (length(text) - length(translate(text, '#@~', '')))::DOUBLE / len(toks) END AS symbol_ratio,
         |  len(list_filter(list_distinct(toks), x -> x IN ($stopIn)))::BIGINT AS stop_hits
         |  FROM t),
         |p AS (SELECT doc_id,
         |  CASE WHEN (n_words >= 20 AND n_words <= 100000)
         |    AND (mean_len >= 3.0 AND mean_len <= 10.0)
         |    AND symbol_ratio < 0.1 AND stop_hits >= 2
         |    THEN 1 ELSE 0 END AS pass FROM m)
         |SELECT d.domain, count(*)::BIGINT AS n_docs,
         |  sum(p.pass)::BIGINT AS n_pass,
         |  round(sum(p.pass)::DOUBLE / count(*), 6) AS pass_rate,
         |  (sum(p.pass) * 2 >= count(*)) AS kept
         |FROM dom d JOIN p ON d.doc_id = p.doc_id
         |GROUP BY d.domain ORDER BY d.domain""".stripMargin
    },
    "q_url_normalize" ->
      s"""WITH $hostCtes,
         |p5 AS (SELECT *,
         |    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
         |           OR (scheme = 'https' AND port = '443')
         |      THEN '' ELSE ':' || port END AS portnorm,
         |    CASE WHEN split_part(pathq, '?', 1) = '' THEN '/'
         |      ELSE split_part(pathq, '?', 1) END AS path,
         |    CASE WHEN contains(pathq, '?')
         |      THEN substr(pathq, strpos(pathq, '?') + 1) ELSE '' END AS query
         |  FROM dom0),
         |p6 AS (SELECT *, list_sort(list_filter(string_split(query, '&'),
         |    p -> p <> '' AND NOT starts_with(split_part(p, '=', 1), 'utm_')
         |      AND NOT list_contains($trackerList, split_part(p, '=', 1)))) AS kept
         |  FROM p5)
         |SELECT doc_id,
         |  scheme || '://' || host || portnorm || path ||
         |    CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
         |      ELSE '' END AS url_norm,
         |  $domainSql AS domain
         |FROM p6 ORDER BY doc_id""".stripMargin,
    "q_domain_icann" ->
      s"""WITH $hostCtes
         |SELECT doc_id,
         |  $domainSql AS domain,
         |  $domainIcannSql AS domain_icann,
         |  ($domainSql) <> ($domainIcannSql) AS private_suffix
         |FROM dom0 ORDER BY doc_id""".stripMargin,
    "q_domain_filter" ->
      s"""WITH $hostCtes,
         |dom AS (SELECT doc_id, $domainSql AS domain FROM dom0),
         |stats AS (SELECT domain, count(*) AS n_docs FROM dom GROUP BY 1),
         |tot AS (SELECT count(*) AS total FROM dom),
         |bad AS (SELECT domain FROM stats CROSS JOIN tot
         |  WHERE n_docs * 20 > total OR domain IN ($blockList))
         |SELECT doc_id, domain FROM dom
         |WHERE domain NOT IN (SELECT domain FROM bad)
         |ORDER BY doc_id""".stripMargin
  )
}
