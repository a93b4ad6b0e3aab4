package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{HtmlKernels, TextFunctions}

/** HTML→text extraction kernel: per-stage boundary cases (script/style/
  * comment stripping, block-vs-inline tags, entity decode incl. numeric
  * refs and the amp-last rule, whitespace/line discipline) plus a
  * generator sweep against an independent Spark-builtin formulation of
  * the same staged chain. Both execution paths are exercised: the
  * DataFrame route runs the generated code, direct kernel calls run the
  * interpreted eval.
  */
class HtmlSpec extends SparkSuite {

  import spark.implicits._

  private def k(h: String): String =
    HtmlKernels.extractText(UTF8String.fromString(h)).toString

  private def checkBoth(cases: (String, String)*): Unit = {
    val got = cases.map(_._1).toDF("h")
      .select(TextFunctions.htmlToText(col("h"))).collect()
      .map(_.getString(0)).toSeq
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"codegen: $in")
      assert(k(in) == want, s"eval: $in")
    }
  }

  test("script/style/comment blocks vanish wholesale") {
    checkBoth(
      "<p>a</p><script>var x = 1 < 2; s = \"</p>\";</script><p>b</p>" -> "a\nb",
      "<SCRIPT type=\"x\">code</SCRIPT>after" -> "after",
      "<style>.c { a < b }</style>text" -> "text",
      // unterminated script: non-greedy never matches, tags strip instead
      "<script>orphan code x" -> "orphan code x",
      "<!-- a comment with <p>tags</p> inside -->visible" -> "visible",
      "a<!-- c1 -->b<!-- c2 -->c" -> "a b c"
    )
  }

  test("block tags break lines, inline tags vanish, attrs ignored") {
    checkBoth(
      "<div class=\"x\" id='y'>one</div><p>two</p>" -> "one\ntwo",
      "line1<br>line2<br/>line3" -> "line1\nline2\nline3",
      "<b>bo</b>ld and <span>in</span>line" -> "bold and inline",
      "<UL><LI>A b c</LI><LI>D e f</LI></UL>" -> "A b c\nD e f",
      "<h2>Head Two</h2>body" -> "Head Two\nbody",
      "<table><tr><td>k</td><td>v</td></tr></table>" -> "k\nv",
      // tag-ish text that is not a known block tag just strips
      "x <notatag attr=1> y" -> "x y"
    )
  }

  test("entity decode: named set, numeric dec/hex, amp strictly last") {
    checkBoth(
      "A &amp; B" -> "A & B",
      "&lt;p&gt; is not a tag here" -> "<p> is not a tag here",
      "&quot;q&quot; &apos;a&apos; &#39;n&#39; &#x27;h&#x27; &#X41;" ->
        "\"q\" 'a' 'n' 'h' A",
      "&#8364; and &#x20AC;" -> "€ and €",
      // double-encoded stays single-decoded: &amp;lt; -> literal &lt;
      "&amp;lt;not-a-tag&amp;gt;" -> "&lt;not-a-tag&gt;",
      // invalid numeric refs are left untouched
      "&#9999999; &#55296; &#xDEAD; x" -> "&#9999999; &#55296; &#xDEAD; x",
      // nbsp becomes a collapsible space
      "a&nbsp;&nbsp;b" -> "a b"
    )
  }

  test("whitespace and line discipline") {
    checkBoth(
      "  a   b\t c  " -> "a b c",
      "<p></p><p>  </p><p>x</p>" -> "x", // empty lines drop
      "<div>a</div><div></div><div>b</div>" -> "a\nb",
      "a \r\n b" -> "a\nb", // \r collapses away, \n splits
      "" -> ""
    )
  }

  test("generator sweep: kernel == Spark-builtin staged chain") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
    val frag = Gen.oneOf(
      "word", "Two words", "<p>", "</P>", "<div class=\"x\">", "</div>",
      "<span>", "</span>", "<br/>", "<b>", "</b>", "<li>", "<h3>", "</h3>",
      "<script>var a = 1 < 2;</script>", "<script>orphan",
      "<style>.x{}</style>", "<!-- note <p> -->", "<!--->", // odd comment
      "&amp;", "&lt;", "&gt;", "&#39;", "&#x27;", "&nbsp;", "&amp;lt;",
      "&#9999999;", "&#xDEAD;", // invalid refs pass through both paths
      " ", "\t", "\n", "\r", "  ", "<td>", "x=1")
    val docG = for {
      n <- Gen.choose(0, 15)
      fs <- Gen.listOfN(n, frag)
    } yield fs.mkString
    val docs = sample(docG, 400, seed = 14L).distinct
    // independent mirror: the same staged chain from Spark builtins
    // (regexp_replace/replace/HOFs) — the Column-level sibling of the
    // DuckDB oracle's replay in HtmlQueries
    def mirror(c: Column): Column = {
      val s5 = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(c,
          HtmlKernels.ScriptRe, " "),
        HtmlKernels.StyleRe, " "),
        HtmlKernels.CommentRe, " "),
        HtmlKernels.BlockRe, "\n"),
        HtmlKernels.TagRe, "")
      // the generator's numeric refs are the two valid literals (plus
      // invalid ones both paths must leave alone), so literal replaces
      // mirror the kernel's general decode — same order, amp last
      val s6 = Seq("&#39;" -> "'", "&#x27;" -> "'", "&lt;" -> "<",
        "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'", "&nbsp;" -> " ",
        "&amp;" -> "&")
        .foldLeft(s5) { case (acc, (from, to)) =>
          replace(acc, lit(from), lit(to))
        }
      array_join(filter(transform(split(s6, "\n"),
          l => trim(regexp_replace(l, HtmlKernels.WsRe, " "))),
        l => l =!= ""), "\n")
    }
    val rows = docs.toDF("h")
      .select(col("h"), TextFunctions.htmlToText(col("h")).as("got"),
        mirror(col("h")).as("want"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"input ${r.getString(0).replace("\n", "\\n")}: " +
          s"kernel=${r.getString(1)} mirror=${r.getString(2)}")
    }
    assert(rows.length >= 300)
  }
}
