package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim

/** Column surface for the URL-curation kernels ([[UrlKernels]] via the
  * [[NativeExprs]] codegen expressions) — the domain-level curation
  * stage (URL canonicalization, registrable-domain extraction) a
  * pre-training pipeline runs before text quality. All three are fused
  * zero-shuffle row kernels that stay inside whole-stage codegen.
  */
object UrlFunctions {

  /** Canonical URL: lowercase scheme/host, fragment + default-port
    * strip, tracking params removed, surviving params sorted bytewise.
    */
  def urlNormalize(url: Column): Column =
    GraftSqlShim.column(NativeExprs.UrlNormalize(GraftSqlShim.expression(url)))

  /** Lowercase host of a URL (bare hosts pass through). */
  def urlHost(url: Column): Column =
    GraftSqlShim.column(NativeExprs.UrlHost(GraftSqlShim.expression(url)))

  /** Registrable domain of a host under the authoritative Public
    * Suffix List ([[PublicSuffixList]]: longest rule wins, `*.x`
    * wildcards, `!y.x` exceptions, default rule `*`; a single trailing
    * root dot is stripped). Matches BOTH sections (ICANN + PRIVATE) —
    * the site-grouping key (`a.github.io` and `b.github.io` are
    * different sites).
    */
  def registrableDomain(host: Column): Column =
    GraftSqlShim.column(NativeExprs.RegistrableDomain(GraftSqlShim.expression(host)))

  /** Registrable domain under the ICANN section only — the
    * registrant-level key (`a.github.io` → `github.io`). Use when the
    * consumer needs who REGISTERED the domain, not which site it is.
    */
  def registrableDomainIcann(host: Column): Column =
    GraftSqlShim.column(NativeExprs.RegistrableDomainIcann(GraftSqlShim.expression(host)))
}
