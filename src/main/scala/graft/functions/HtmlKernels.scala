package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.unsafe.types.UTF8String

/** HTML→text extraction — the WET-style stage a RefinedWeb/FineWeb run
  * executes BEFORE language-ID (reference: grafeo-memory ingests clean
  * text; a web corpus starts from HTML). One row kernel, called from
  * the generated code of [[NativeExprs.HtmlToText]] (same
  * static-forwarder pattern as [[UrlKernels]]).
  *
  * Deterministic, DOM-free, and deliberately SQL-replayable: the stages
  * are a fixed ordered chain of regex/string passes whose patterns are
  * valid and equivalent in BOTH java.util.regex and RE2 (DuckDB), so
  * the oracle replays the exact chain with regexp_replace + replace:
  *
  *  1. `<script …>…</script>` blocks → one space (case-insensitive,
  *     non-greedy, so an unterminated block is left alone);
  *  2. `<style …>…</style>` blocks → one space;
  *  3. `<!-- … -->` comments → one space (tags inside never open);
  *  4. block-level tags (p, div, br, li, ul, ol, h1–h6, tr, td, th,
  *     table, footer, header, nav, section, article, html, head, body,
  *     title, blockquote, pre — open or close, any attributes) →
  *     newline, so block boundaries become line boundaries;
  *  5. all remaining tags → empty (inline tags vanish);
  *  6. entity decode: numeric `&#NN;` / `&#xHH;` first (kernel decodes
  *     any valid codepoint; invalid/surrogate refs are left as-is),
  *     then the named set `&lt; &gt; &quot; &apos;` and `&nbsp;` (→
  *     space), and `&amp;` strictly LAST so `&amp;lt;` yields the
  *     literal text `&lt;` (single-decode, the standard order);
  *  7. line pass: split on `\n`, collapse `[ \t\r]+` runs to one
  *     space, trim spaces, drop empty lines, re-join with `\n`.
  *
  * Entity decode runs AFTER tag stripping (step 5), so text like
  * `&lt;tag&gt;` decodes to a literal `<tag>` that is NOT treated as
  * markup — the standard extractor order.
  */
object HtmlKernels {

  private val Script =
    Pattern.compile("(?is)<script\\b[^>]*>.*?</script>")
  private val Style =
    Pattern.compile("(?is)<style\\b[^>]*>.*?</style>")
  private val Comment =
    Pattern.compile("(?s)<!--.*?-->")
  private val Block = Pattern.compile(
    "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|footer|header|nav" +
      "|section|article|html|head|body|title|blockquote|pre)\\b[^>]*>")
  private val Tag = Pattern.compile("<[^>]*>")
  private val NumEntity =
    Pattern.compile("&#(?:[xX]([0-9a-fA-F]{1,6})|([0-9]{1,7}));")
  private val Ws = Pattern.compile("[ \\t\\r]+")

  /** The regex stage patterns as SQL-literal strings (for the DuckDB
    * oracle and the Spark-builtin property mirror) — single source of
    * truth so the kernel and its replays can't drift.
    */
  val ScriptRe = "(?is)<script\\b[^>]*>.*?</script>"
  val StyleRe = "(?is)<style\\b[^>]*>.*?</style>"
  val CommentRe = "(?s)<!--.*?-->"
  val BlockRe =
    "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|footer|header" +
      "|nav|section|article|html|head|body|title|blockquote|pre)\\b[^>]*>"
  val TagRe = "<[^>]*>"
  val WsRe = "[ \\t\\r]+"

  /** Decode numeric character references; invalid codepoints
    * (> U+10FFFF or surrogates) are left untouched.
    */
  private def decodeNumeric(s: String): String = {
    if (s.indexOf("&#") < 0) return s
    val m = NumEntity.matcher(s)
    val sb = new java.lang.StringBuffer(s.length)
    while (m.find()) {
      val hex = m.group(1)
      val cp =
        try {
          if (hex != null) Integer.parseInt(hex, 16)
          else Integer.parseInt(m.group(2))
        } catch { case _: NumberFormatException => -1 }
      val rep =
        if (cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
          new String(Character.toChars(cp))
        else m.group(0)
      m.appendReplacement(sb, Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** Trim leading/trailing SPACES only — matching SQL `trim()` (Java's
    * `String.trim` also eats control chars, which would diverge from
    * the oracle on stray `\r`s; those are handled by the `[ \t\r]+`
    * collapse instead).
    */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  def extractText(h: UTF8String): UTF8String = {
    var s = h.toString
    s = Script.matcher(s).replaceAll(" ")
    s = Style.matcher(s).replaceAll(" ")
    s = Comment.matcher(s).replaceAll(" ")
    s = Block.matcher(s).replaceAll("\n")
    s = Tag.matcher(s).replaceAll("")
    s = decodeNumeric(s)
    s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
    val out = new java.lang.StringBuilder(s.length)
    var first = true
    s.split("\n", -1).foreach { line =>
      val c = trimSpaces(Ws.matcher(line).replaceAll(" "))
      if (c.nonEmpty) {
        if (!first) out.append('\n')
        out.append(c)
        first = false
      }
    }
    UTF8String.fromString(out.toString)
  }
}
