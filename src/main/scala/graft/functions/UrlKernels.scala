package graft.functions

import java.util.Locale

import org.apache.spark.unsafe.types.UTF8String

/** Static single-pass URL-curation kernels, called from the generated
  * code of the [[NativeExprs]] URL expressions (same static-forwarder
  * pattern as [[GraftHash]]). These implement the CCNet/RefinedWeb-style
  * URL stage upstream of text quality: canonicalize the URL, extract the
  * registrable domain, aggregate/filter at domain level.
  *
  * Every rule is deliberately SQL-replayable (the q_url_normalize oracle
  * rebuilds the whole pipeline from DuckDB string builtins), so the
  * kernel stays oracle-gated rather than spec-only:
  *  - fragment dropped;
  *  - scheme and host lowercased (path/query case preserved);
  *  - default ports stripped (http:80, https:443), others kept;
  *  - empty path becomes "/";
  *  - tracking params removed (utm_* prefix + the fixed name set),
  *    remaining params sorted bytewise and rejoined; empty query drops
  *    its "?".
  * Inputs without "://" are returned unchanged (not URLs — the caller
  * decides what to do with them). Param sorting uses Java char order,
  * which equals bytewise order on ASCII — URLs per RFC 3986 are ASCII.
  */
object UrlKernels {

  /** Fixed tracking-param names (beyond the utm_ prefix family):
    * click identifiers and social referral tags.
    */
  private val TrackingParams: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("fbclid", "gclid", "msclkid", "ref", "ref_src", "igshid", "mc_eid")
      .foreach(s.add)
    s
  }

  /** Rule sets backing [[registrableDomain]]: the AUTHORITATIVE
    * publicsuffix.org list (vendored, ~9.5k rules, ICANN + PRIVATE
    * sections — see [[PublicSuffixList.authoritative]]). Still
    * SQL-replayable: the oracle joins the same (rtype, rule, section)
    * table ([[graft.catalog.UrlQueries]] interpolates it as a VALUES
    * CTE) instead of lambda-scanning interpolated lists, mirroring the
    * runtime [[graft.ops.UrlOps.registrableDomainByTable]] path. A
    * deployment refreshing the list without a rebuild uses that
    * join-based path with `PublicSuffixList.parse`-d rules.
    */
  val Psl: PublicSuffixList.Rules = PublicSuffixList.authoritative.all

  /** ICANN-section-only rules: registrant-level domains — private
    * hoster suffixes (github.io, …) do NOT split sites apart.
    */
  val PslIcann: PublicSuffixList.Rules = PublicSuffixList.authoritative.icann

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val name = if (eq >= 0) param.substring(0, eq) else param
    name.startsWith("utm_") || TrackingParams.contains(name)
  }

  def normalize(u: UTF8String): UTF8String = {
    val s0 = u.toString
    val hashIdx = s0.indexOf('#')
    val s = if (hashIdx >= 0) s0.substring(0, hashIdx) else s0
    val schemeEnd = s.indexOf("://")
    if (schemeEnd < 0) return UTF8String.fromString(s)
    val scheme = s.substring(0, schemeEnd).toLowerCase(Locale.ROOT)
    val rest = s.substring(schemeEnd + 3)
    var i = 0
    while (i < rest.length && rest.charAt(i) != '/' && rest.charAt(i) != '?') i += 1
    val hostport = rest.substring(0, i)
    val pathq = rest.substring(i)
    val colon = hostport.indexOf(':')
    val host =
      (if (colon >= 0) hostport.substring(0, colon) else hostport)
        .toLowerCase(Locale.ROOT)
    val port = if (colon >= 0) hostport.substring(colon + 1) else ""
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443"))
    val qIdx = pathq.indexOf('?')
    val rawPath = if (qIdx >= 0) pathq.substring(0, qIdx) else pathq
    val path = if (rawPath.isEmpty) "/" else rawPath
    val query = if (qIdx >= 0) pathq.substring(qIdx + 1) else ""
    val kept =
      if (query.isEmpty) Array.empty[String]
      else {
        val parts = query.split("&", -1)
          .filter(p => p.nonEmpty && !isTracking(p))
        java.util.Arrays.sort(parts.asInstanceOf[Array[AnyRef]])
        parts
      }
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (kept.nonEmpty) {
      sb.append('?')
      var k = 0
      while (k < kept.length) {
        if (k > 0) sb.append('&')
        sb.append(kept(k))
        k += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Lowercase host of a URL (port and userinfo-free in our grammar);
    * input without "://" is treated as already being a bare host.
    */
  def host(u: UTF8String): UTF8String = {
    val s0 = u.toString
    val hashIdx = s0.indexOf('#')
    val s = if (hashIdx >= 0) s0.substring(0, hashIdx) else s0
    val schemeEnd = s.indexOf("://")
    val rest = if (schemeEnd < 0) s else s.substring(schemeEnd + 3)
    var i = 0
    while (i < rest.length && rest.charAt(i) != '/' && rest.charAt(i) != '?') i += 1
    val hostport = rest.substring(0, i)
    val colon = hostport.indexOf(':')
    val h = if (colon >= 0) hostport.substring(0, colon) else hostport
    UTF8String.fromString(h.toLowerCase(Locale.ROOT))
  }

  /** Registrable domain of a host under the authoritative Public
    * Suffix List ([[PublicSuffixList]] semantics: longest rule wins,
    * `*.x` wildcards, `!y.x` exceptions, default rule `*`). A host
    * that is itself a public suffix (or shorter) is returned whole,
    * lowercased; a single trailing root dot is stripped.
    */
  def registrableDomain(h: UTF8String): UTF8String =
    UTF8String.fromString(
      PublicSuffixList.registrableDomain(h.toString, Psl))

  /** Registrable domain under the ICANN section only — the
    * registrant-level grouping (`a.github.io` → `github.io`, because
    * `github.io` is a PRIVATE-section rule, not a registry suffix).
    */
  def registrableDomainIcann(h: UTF8String): UTF8String =
    UTF8String.fromString(
      PublicSuffixList.registrableDomain(h.toString, PslIcann))
}
