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

  test("registrableDomain: suffix set boundaries") {
    val cases = Seq(
      "news.bbc.co.uk" -> "bbc.co.uk", // multi-part suffix -> 3 labels
      "a.news.bbc.co.uk" -> "bbc.co.uk",
      "www.example.com" -> "example.com",
      "deep.sub.example.org" -> "example.org",
      "example.com" -> "example.com", // already registrable
      "localhost" -> "localhost", // single label
      "bbc.co.uk" -> "bbc.co.uk", // exactly suffix + 1
      "co.uk" -> "co.uk", // the bare suffix: returned whole
      "UPPER.Example.COM" -> "example.com" // lowercased
    )
    val got = cases.map(_._1).toDF("h")
      .select(UrlFunctions.registrableDomain(col("h"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
    cases.foreach { case (in, want) =>
      assert(UrlKernels.registrableDomain(UTF8String.fromString(in)).toString
        == want, s"eval: $in")
    }
  }
}
