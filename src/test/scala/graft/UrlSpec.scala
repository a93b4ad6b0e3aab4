package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{UrlFunctions, UrlKernels}

/** Boundary behavior of the URL-curation kernels: canonicalization
  * rules (ports, fragments, tracking params, param sort, empty path),
  * host extraction, and registrable-domain suffix handling. Exercises
  * BOTH paths: the DataFrame route runs the generated code, the direct
  * kernel calls run the interpreted eval — their agreement is asserted
  * per case.
  */
class UrlSpec extends SparkSuite {

  import spark.implicits._

  private def normDf(urls: Seq[String]): Seq[String] =
    urls.toDF("u").select(UrlFunctions.urlNormalize(col("u"))).collect()
      .map(_.getString(0)).toSeq

  private def normK(u: String): String =
    UrlKernels.normalize(UTF8String.fromString(u)).toString

  private def checkNorm(cases: (String, String)*): Unit = {
    val got = normDf(cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), gotOne) =>
      assert(gotOne == want, s"codegen: $in")
      assert(normK(in) == want, s"eval: $in")
    }
  }

  test("urlNormalize: scheme/host case, default ports, fragments") {
    checkNorm(
      "HTTP://WWW.Example.COM:80/Path/X?a=1#frag" -> "http://www.example.com/Path/X?a=1",
      "https://Example.com:443/" -> "https://example.com/",
      "http://example.com:8080/x" -> "http://example.com:8080/x", // non-default kept
      "https://example.com:80/x" -> "https://example.com:80/x", // 80 is not https default
      "http://example.com" -> "http://example.com/", // empty path -> "/"
      "http://example.com#only-frag" -> "http://example.com/",
      "http://example.com?q=1" -> "http://example.com/?q=1"
    )
  }

  test("urlNormalize: tracking params, sorting, empty query") {
    checkNorm(
      // utm_* prefix family + fixed names dropped; survivors sorted bytewise
      "http://e.com/p?utm_source=x&b=2&fbclid=abc&a=1" -> "http://e.com/p?a=1&b=2",
      "http://e.com/p?utm_campaign=z" -> "http://e.com/p", // all tracked -> no '?'
      "http://e.com/p?ref=home&gclid=g&msclkid=m&igshid=i&mc_eid=e&ref_src=t&z=9"
        -> "http://e.com/p?z=9",
      // a bare name (no '=') filters by its own text; empty params drop
      "http://e.com/p?utm_x&&keep=1" -> "http://e.com/p?keep=1",
      // value case and path case preserved; only scheme/host lowercase
      "HTTPS://A.B/PaTh?Key=VaL" -> "https://a.b/PaTh?Key=VaL"
    )
  }

  test("urlNormalize: non-URL passthrough and null") {
    checkNorm("not a url" -> "not a url")
    val r = Seq[Option[String]](None).toDF("u")
      .select(UrlFunctions.urlNormalize(col("u"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("urlHost: case, ports, bare hosts") {
    val got = Seq("HTTP://WWW.Ex.COM:80/a?b#c", "https://A.B.C", "Bare.Host:99",
        "plain")
      .toDF("u").select(UrlFunctions.urlHost(col("u"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("www.ex.com", "a.b.c", "bare.host", "plain"))
    assert(UrlKernels.host(UTF8String.fromString("HTTP://WWW.Ex.COM:80/a?b#c"))
      .toString == "www.ex.com")
  }

  private val domainCases = Seq(
    "news.bbc.co.uk" -> "bbc.co.uk", // multi-part suffix -> 3 labels
    "a.news.bbc.co.uk" -> "bbc.co.uk",
    "www.example.com" -> "example.com",
    "deep.sub.example.org" -> "example.org",
    "example.com" -> "example.com", // already registrable
    "localhost" -> "localhost", // single label
    "bbc.co.uk" -> "bbc.co.uk", // exactly suffix + 1
    "co.uk" -> "co.uk", // the bare suffix: returned whole
    "UPPER.Example.COM" -> "example.com", // lowercased
    // --- Public Suffix List semantics beyond the fixed-set era ---
    "user.github.io" -> "user.github.io", // private-section suffix
    "www.user.github.io" -> "user.github.io",
    "github.io" -> "github.io", // bare private suffix: whole
    "a.blogspot.co.uk" -> "a.blogspot.co.uk", // 3-label private suffix
    "www.foo.com.bd" -> "foo.com.bd", // *.bd wildcard: com.bd is a PS
    "foo.com.bd" -> "foo.com.bd",
    "com.bd" -> "com.bd", // wildcard-matched suffix itself: whole
    "www.ck" -> "www.ck", // !www.ck exception beats *.ck
    "sub.www.ck" -> "www.ck",
    "shop.foo.ck" -> "shop.foo.ck", // *.ck: foo.ck is a public suffix
    "city.kawasaki.jp" -> "city.kawasaki.jp", // !city.kawasaki.jp
    "ward.city.kawasaki.jp" -> "city.kawasaki.jp",
    "x.mycity.kawasaki.jp" -> "x.mycity.kawasaki.jp", // *.kawasaki.jp
    "store.example.com.hk" -> "example.com.hk", // suffix beyond old set
    "a.b.co.id" -> "b.co.id",
    "example.com." -> "example.com", // trailing root dot stripped
    "www.example.com." -> "example.com",
    "deep.example.nosuchtld" -> "example.nosuchtld" // default rule "*"
  )

  test("registrableDomain: PSL boundaries (exact/wildcard/exception)") {
    val got = domainCases.map(_._1).toDF("h")
      .select(UrlFunctions.registrableDomain(col("h"))).collect()
      .map(_.getString(0)).toSeq
    domainCases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"codegen: $in")
      assert(UrlKernels.registrableDomain(UTF8String.fromString(in)).toString
        == want, s"eval: $in")
    }
  }

  test("PublicSuffixList.parse handles comments, sections, rule classes") {
    val rules = graft.functions.PublicSuffixList.parse(
      """// a comment
        |com
        |
        |*.ck
        |!www.ck
        |// ===BEGIN PRIVATE DOMAINS===
        |GitHub.IO
        |""".stripMargin.linesIterator)
    assert(rules.exact == Set("com", "github.io"))
    assert(rules.wildcard == Set("ck"))
    assert(rules.exception == Set("www.ck"))
    assert(graft.functions.PublicSuffixList.builtin.exact.size >= 500)
  }

  test("authoritative vendored list: parse shape and section split") {
    import graft.functions.PublicSuffixList
    val a = PublicSuffixList.authoritative
    val all = a.all
    // the real list is ~9.5k rules; require the order of magnitude so a
    // truncated vendor copy fails loudly
    assert(all.exact.size + all.wildcard.size + all.exception.size >= 9000)
    assert(all.wildcard.size >= 50)
    assert(all.exception.size >= 5)
    assert(a.icann.exact.size >= 5000)
    assert(a.priv.exact.size >= 1000)
    // section boundary: registry suffixes are ICANN, hosters PRIVATE
    assert(a.icann.exact.contains("com"))
    assert(a.icann.exact.contains("co.uk"))
    assert(a.icann.wildcard.contains("kawasaki.jp"))
    assert(a.icann.exception.contains("city.kawasaki.jp"))
    assert(a.priv.exact.contains("github.io"))
    assert(a.priv.exact.contains("blogspot.co.uk"))
    assert(a.priv.wildcard.contains("compute.amazonaws.com"))
    assert(!a.icann.exact.contains("github.io"))
    // IDN/UTF-8 rules survive parsing
    assert(all.exact.exists(_.startsWith("xn--")) ||
      all.exact.exists(_.exists(_ > 127)))
  }

  test("registrableDomainIcann: private suffixes stop splitting sites") {
    val cases = Seq(
      // (host, full-list domain, icann-only domain)
      ("a.user.github.io", "user.github.io", "github.io"),
      ("user.github.io", "user.github.io", "github.io"),
      ("github.io", "github.io", "github.io"),
      ("x.a.blogspot.co.uk", "a.blogspot.co.uk", "blogspot.co.uk"),
      ("foo.duckdns.org", "foo.duckdns.org", "duckdns.org"),
      // private WILDCARD: *.compute.amazonaws.com
      ("x.y.eu-west-1.compute.amazonaws.com",
        "y.eu-west-1.compute.amazonaws.com", "amazonaws.com"),
      // no private rule involved: both sections agree
      ("news.bbc.co.uk", "bbc.co.uk", "bbc.co.uk"),
      ("ward.city.kawasaki.jp", "city.kawasaki.jp", "city.kawasaki.jp"))
    val got = cases.map(_._1).toDF("h").select(
        UrlFunctions.registrableDomain(col("h")),
        UrlFunctions.registrableDomainIcann(col("h"))).collect()
    cases.zip(got).foreach { case ((in, full, icann), r) =>
      assert(r.getString(0) == full, s"codegen full: $in")
      assert(r.getString(1) == icann, s"codegen icann: $in")
      assert(UrlKernels.registrableDomain(UTF8String.fromString(in)).toString
        == full, s"eval full: $in")
      assert(UrlKernels.registrableDomainIcann(UTF8String.fromString(in))
        .toString == icann, s"eval icann: $in")
    }
  }

  test("registrableDomainByTable == kernel on the authoritative rules") {
    import graft.ops.UrlOps
    import graft.functions.PublicSuffixList
    val hosts = domainCases.map(_._1) ++ Seq("a.user.github.io",
      "x.y.eu-west-1.compute.amazonaws.com", "foo.duckdns.org")
    val rules = UrlOps.rulesDf(spark, PublicSuffixList.authoritative.all)
    val got = UrlOps.registrableDomainByTable(
        hosts.toDF("h"), col("h"), rules)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    hosts.foreach { in =>
      assert(got(in) ==
        UrlKernels.registrableDomain(UTF8String.fromString(in)).toString,
        s"join path vs kernel: $in")
    }
  }

  test("registrableDomainByTable refuses a pre-existing output column") {
    import graft.ops.UrlOps
    val rules = UrlOps.rulesDf(spark, graft.functions.PublicSuffixList.builtin)
    val df = Seq(("a.com", "x")).toDF("h", "domain")
    val e = intercept[IllegalArgumentException] {
      UrlOps.registrableDomainByTable(df, col("h"), rules)
    }
    assert(e.getMessage.contains("domain"))
    // a different out name on the same input works
    val ok = UrlOps.registrableDomainByTable(df, col("h"), rules, out = "rd")
      .collect()
    assert(ok.head.getString(2) == "a.com")
  }

  test("registrableDomainByTable == kernel on the builtin rules") {
    import graft.ops.UrlOps
    val hosts = domainCases.map(_._1)
    val rules = UrlOps.rulesDf(spark, graft.functions.PublicSuffixList.builtin)
    val got = UrlOps.registrableDomainByTable(
        hosts.toDF("h"), col("h"), rules)
      .orderBy(col("h")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    domainCases.foreach { case (in, want) =>
      assert(got(in) == want, s"join path: $in")
    }
  }

  test("registrableDomainByTable: custom runtime rules change the cut") {
    import graft.ops.UrlOps
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("rtype", StringType),
      StructField("rule", StringType)))
    val custom = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("exact", "internal.corp"),
        Row("wildcard", "tenants.corp"),
        Row("exception", "admin.tenants.corp"))), schema)
    val got = UrlOps.registrableDomainByTable(
        Seq("a.b.internal.corp", "x.t1.tenants.corp", "y.admin.tenants.corp",
          "plain.corp").toDF("h"),
        col("h"), custom)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a.b.internal.corp") == "b.internal.corp")
    assert(got("x.t1.tenants.corp") == "x.t1.tenants.corp") // *.tenants.corp
    assert(got("y.admin.tenants.corp") == "admin.tenants.corp") // exception
    assert(got("plain.corp") == "plain.corp") // default rule "*"
  }

  test("nested exception rules: the longest match prevails, kernel == join path") {
    // the real PSL never nests exceptions, but custom tables can; the
    // spec says longest-match — kernel, join path, and oracle replay
    // all take max(k) over matching exceptions
    import graft.ops.UrlOps
    import graft.functions.PublicSuffixList
    val rules = PublicSuffixList.parse(
      """*.c
        |*.b.c
        |!b.c
        |!a.b.c
        |""".stripMargin.linesIterator)
    // host x.a.b.c: exceptions b.c (k=2) and a.b.c (k=3) both match;
    // longest (a.b.c) wins -> ps = b.c -> registrable = a.b.c
    assert(PublicSuffixList.registrableDomain("x.a.b.c", rules) == "a.b.c")
    assert(PublicSuffixList.registrableDomain("a.b.c", rules) == "a.b.c")
    // host x.b.c: only !b.c matches -> ps = c -> registrable = b.c
    assert(PublicSuffixList.registrableDomain("x.b.c", rules) == "b.c")
    val got = UrlOps.registrableDomainByTable(
        Seq("x.a.b.c", "a.b.c", "x.b.c").toDF("h"), col("h"),
        UrlOps.rulesDf(spark, rules))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("x.a.b.c") == "a.b.c")
    assert(got("a.b.c") == "a.b.c")
    assert(got("x.b.c") == "b.c")
  }

  test("randomized rule tables: driver algorithm == distributed join path") {
    // the join path is the DEPLOY path for a runtime
    // public_suffix_list.dat — sweep random rule tables (exact/
    // wildcard/exception over a small label alphabet, so collisions,
    // nesting, and bare-suffix hosts actually occur) against random
    // hosts and require the distributed result to equal the driver
    // algorithm row for row
    import graft.ops.UrlOps
    import graft.functions.PublicSuffixList
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
    val label = Gen.oneOf("a", "b", "c", "dd", "e3")
    val suffixG = for {
      n <- Gen.choose(1, 3)
      ls <- Gen.listOfN(n, label)
    } yield ls.mkString(".")
    val ruleG: Gen[String] = Gen.frequency(
      5 -> suffixG,
      2 -> suffixG.map("*." + _),
      1 -> suffixG.map("!" + _))
    val hostG = for {
      n <- Gen.choose(1, 5)
      ls <- Gen.listOfN(n, label)
      dot <- Gen.frequency(9 -> Gen.const(""), 1 -> Gen.const("."))
    } yield ls.mkString(".") + dot
    (0 until 5).foreach { round =>
      val ruleLines = sample(ruleG, 12, seed = 100L * round + 1).distinct
      val rules = PublicSuffixList.parse(ruleLines.iterator)
      val hosts = sample(hostG, 60, seed = 100L * round + 7).distinct
      val want = hosts.map(h =>
        h -> PublicSuffixList.registrableDomain(h, rules)).toMap
      val got = UrlOps.registrableDomainByTable(
          hosts.toDF("h"), col("h"), UrlOps.rulesDf(spark, rules))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      hosts.foreach { h =>
        assert(got(h) == want(h),
          s"round $round host $h rules=${ruleLines.mkString(",")}: " +
            s"join=${got(h)} driver=${want(h)}")
      }
    }
  }
}
