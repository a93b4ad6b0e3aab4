package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PublicSuffixList

/** Runtime-pluggable registrable-domain extraction: the same Public
  * Suffix List semantics as the codegen kernel
  * ([[graft.functions.UrlKernels.registrableDomain]]), but over a rule
  * table supplied at runtime — the deploy path for the authoritative
  * `public_suffix_list.dat`, refreshed without a rebuild.
  *
  * Scale shape: hosts are deduplicated first (distinct hosts ≪ rows in
  * a web corpus — the host key is what URL curation groups by anyway),
  * each distinct host explodes into ≤ maxLabels suffix candidates, the
  * candidates broadcast-hash-join the (small) rule table twice — once
  * on the full suffix for exact/exception rules, once on the k−1-label
  * base for `*.base` wildcards — and one host-keyed agg applies PSL
  * precedence (exception ⟶ longest ⟶ default `*`). The resulting
  * (host → domain) map joins back to the corpus on the host string, so
  * the whole path is deterministic under retry (no uid tagging). The
  * kernel path stays the hot default; this is the pluggable one.
  */
object UrlOps {

  /** Rule table as a DataFrame: (rtype ∈ exact|wildcard|exception,
    * rule) — `wildcard` rows carry the base (the `*.`-stripped rule),
    * `exception` rows the `!`-stripped rule, matching
    * [[PublicSuffixList.Rules.all]].
    */
  def rulesDf(spark: SparkSession, rules: PublicSuffixList.Rules): DataFrame = {
    import spark.implicits._
    rules.all.toDF("rtype", "rule")
  }

  /** Append `out` = registrable domain of `hostCol` under the rule
    * table `rules` ((rtype, rule) as produced by [[rulesDf]] or loaded
    * from a parsed PSL file).
    */
  def registrableDomainByTable(
      df: DataFrame,
      hostCol: Column,
      rules: DataFrame,
      out: String = "domain"): DataFrame = {
    require(!df.columns.contains(out),
      s"output column '$out' already exists in the input — pick another " +
        "`out` name (the final join would produce ambiguous duplicates)")
    val prep = df.select(hostCol.as("_host_raw")).distinct()
      .withColumn("_h", regexp_replace(lower(col("_host_raw")), "\\.$", ""))
      .withColumn("_ls", split(col("_h"), "\\."))
      .withColumn("_nl", size(col("_ls")))
    val cand = prep.select(col("_host_raw"), col("_ls"), col("_nl"),
        explode(sequence(lit(1), col("_nl"))).as("_k"))
      .withColumn("_suffix",
        concat_ws(".", slice(col("_ls"), -col("_k"), col("_k"))))
      // guarded: slice with start 0 / length 0 (the k=1 row) throws in
      // Spark — don't rely on the downstream _k >= 2 filter being
      // pushed below this projection
      .withColumn("_base",
        when(col("_k") >= 2, concat_ws(".",
          slice(col("_ls"), lit(1) - col("_k"), col("_k") - 1)))
          .otherwise(lit("")))
    val r = broadcast(rules.select(col("rtype"), col("rule")))
    // exact + exception match on the full k-label suffix
    val direct = cand.join(r,
        cand("_suffix") === r("rule") && r("rtype") =!= "wildcard")
      .select(col("_host_raw"), col("_k"), col("rtype"))
    // "*.base" matches a k-label suffix whose last k-1 labels == base
    val wild = cand.filter(col("_k") >= 2).join(r,
        cand("_base") === r("rule") && r("rtype") === "wildcard")
      .select(col("_host_raw"), col("_k"), col("rtype"))
    val matched = direct.unionByName(wild)
      .groupBy(col("_host_raw"))
      .agg(
        max(when(col("rtype") === "exception", col("_k"))).as("_exck"),
        max(when(col("rtype") =!= "exception", col("_k"))).as("_bestk"))
    val dom = prep.join(matched, Seq("_host_raw"), "left")
      .withColumn("_psl",
        when(col("_exck").isNotNull, col("_exck") - 1)
          .otherwise(greatest(coalesce(col("_bestk"), lit(1)), lit(1))))
      .withColumn(out,
        when(col("_nl") <= col("_psl") + 1, col("_h"))
          .otherwise(concat_ws(".",
            slice(col("_ls"), -(col("_psl") + 1), col("_psl") + 1))))
      .select(col("_host_raw"), col(out))
    df.join(dom, hostCol <=> dom("_host_raw"), "left")
      .drop("_host_raw")
  }
}
