package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HtmlKernels, TextFunctions}
import Tables._

/** HTML→text extraction queries — the WET-style stage −1 of the web
  * curation chain (ahead of the URL/domain gate and language-ID). The
  * documents table holds clean text, so both engines synthesize the
  * same deterministic HTML page per doc (the UrlQueries deterministic-
  * fake pattern): four variants by doc_id % 4 covering script blocks
  * (with a `<` inside the code), style blocks, comments containing
  * tags, upper/lower-case tags, attribute-bearing tags, named + numeric
  * entities, `&nbsp;`, inline-tag removal, table cells, and varying
  * boilerplate density so the line-ratio gate actually fires (variant
  * 1 is nav/footer-heavy and gets dropped).
  *
  * The boilerplate rule is integer-exact: a line is boilerplate when it
  * has ≤ 3 words or carries a marker phrase; a doc is kept when
  * boilerplate lines are at most half its lines (n_boiler·2 ≤ n_lines,
  * no float compare). Content = the non-boilerplate lines joined by a
  * single space — what flows into langid/quality/dedup downstream.
  *
  * Scale shape: extraction is one fused zero-shuffle row kernel
  * ([[HtmlKernels.extractText]]) + builtin HOFs over the line array —
  * the corpus is scanned once and nothing shuffles until the domain
  * agg. The oracle replays the exact kernel stage chain with DuckDB
  * regexp_replace/replace (patterns shared from [[HtmlKernels]]).
  */
object HtmlQueries {

  /** Deterministic per-doc HTML page, identical in Spark and DuckDB.
    * No single-quote characters appear in the literals (SQL-escaping
    * hazard); apostrophes are exercised via `&#39;` instead.
    */
  private[catalog] def htmlExpr: Column = {
    val v = pmod(col("doc_id"), lit(4L))
    val text = col("text")
    val src = col("source")
    when(v === 0, concat(
        lit("<html><head><title>Overview page from source "), src,
        lit("</title><script type=\"text/javascript\">var a=1; if (a<2) { track(\"x\"); }</script>" +
          "</head><body><h1>Latest update from the "), src,
        lit(" desk</h1><p>"), text,
        lit("</p><div class=\"footer\">All rights reserved</div></body></html>")))
      .when(v === 1, concat(
        lit("<HTML><BODY><!-- nav menu below <ul> --><ul><li>Home</li><li>About</li>" +
          "<li>Contact</li><li>Menu</li><li>Share</li><li>Subscribe now</li></ul><P>"),
        text,
        lit("</P><br><footer>cookie policy</footer></BODY></HTML>")))
      .when(v === 2, concat(
        lit("<body><style>.x { color: red; }</style>" +
          "<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;"),
        text,
        lit("</p><span>in</span> line tail</body>")))
      .otherwise(concat(
        lit("<div><p>"), text,
        lit("</p><a href=\"/x?a=1&amp;b=2\">go to the full article here</a>" +
          "<table><tr><td>k1</td><td>v1</td></tr></table></div>")))
  }

  private[catalog] val htmlSql =
    """CASE doc_id % 4
      |  WHEN 0 THEN '<html><head><title>Overview page from source ' || source || '</title><script type="text/javascript">var a=1; if (a<2) { track("x"); }</script></head><body><h1>Latest update from the ' || source || ' desk</h1><p>' || text || '</p><div class="footer">All rights reserved</div></body></html>'
      |  WHEN 1 THEN '<HTML><BODY><!-- nav menu below <ul> --><ul><li>Home</li><li>About</li><li>Contact</li><li>Menu</li><li>Share</li><li>Subscribe now</li></ul><P>' || text || '</P><br><footer>cookie policy</footer></BODY></HTML>'
      |  WHEN 2 THEN '<body><style>.x { color: red; }</style><p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;' || text || '</p><span>in</span> line tail</body>'
      |  ELSE '<div><p>' || text || '</p><a href="/x?a=1&amp;b=2">go to the full article here</a><table><tr><td>k1</td><td>v1</td></tr></table></div>'
      |END""".stripMargin

  /** DuckDB replay of [[HtmlKernels.extractText]] as a LIST of cleaned
    * non-empty lines — the exact kernel stage chain (patterns shared
    * from [[HtmlKernels]]); the fixture's only numeric entity is
    * `&#39;`, replayed literally (the kernel's general numeric decode
    * is spec-gated in HtmlSpec).
    */
  private[catalog] def extractLinesSql(in: String): String =
    s"""list_filter(list_transform(string_split(
       |  replace(replace(replace(replace(replace(replace(replace(
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      $in,
       |      '${HtmlKernels.ScriptRe}', ' ', 'g'),
       |      '${HtmlKernels.StyleRe}', ' ', 'g'),
       |      '${HtmlKernels.CommentRe}', ' ', 'g'),
       |      '${HtmlKernels.BlockRe}', chr(10), 'g'),
       |      '${HtmlKernels.TagRe}', '', 'g'),
       |    '&#39;', chr(39)), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |    '&apos;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
       |  chr(10)),
       |  x -> trim(regexp_replace(x, '${HtmlKernels.WsRe}', ' ', 'g'))),
       |  x -> x <> '')""".stripMargin

  /** Boilerplate-line predicate over a cleaned line expression. */
  private[catalog] def boilerSql(x: String): String =
    s"""(len(string_split($x, ' ')) <= 3
       | OR contains(lower($x), 'rights reserved')
       | OR contains(lower($x), 'subscribe')
       | OR contains(lower($x), 'cookie')
       | OR contains(lower($x), 'menu')
       | OR contains(lower($x), 'share'))""".stripMargin

  /** Shared CTE pair: per-doc extracted line array → line stats +
    * content. Composable after any CTE list (q_prep_pipeline splices
    * it in as stage −1).
    */
  private[catalog] val hxCtes =
    s"""hx0 AS (SELECT doc_id, ${extractLinesSql(htmlSql)} AS lines FROM documents),
       |hx AS (SELECT doc_id,
       |    len(lines)::BIGINT AS n_lines,
       |    len(list_filter(lines, x -> ${boilerSql("x")}))::BIGINT AS n_boiler,
       |    array_to_string(list_filter(lines, x -> NOT ${boilerSql("x")}), ' ') AS content
       |  FROM hx0)""".stripMargin

  /** Spark-side boilerplate predicate (mirror of [[boilerSql]]). */
  private[catalog] def isBoiler(l: Column): Column =
    size(split(l, " ")) <= 3 ||
      lower(l).contains("rights reserved") ||
      lower(l).contains("subscribe") ||
      lower(l).contains("cookie") ||
      lower(l).contains("menu") ||
      lower(l).contains("share")

  /** Extracted non-empty line array from the synthetic HTML. */
  private[catalog] def linesExpr: Column =
    filter(split(TextFunctions.htmlToText(htmlExpr), "\n"),
      l => l =!= lit(""))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> { (s, dir) =>
      // WET-style extraction + boilerplate line-ratio gate, per doc:
      // one kernel pass + HOFs over the line array, zero shuffles
      val docs = load(s, dir, "documents")
      docs.select(col("doc_id"), linesExpr.as("lines"))
        .select(col("doc_id"),
          size(col("lines")).cast("long").as("n_lines"),
          size(filter(col("lines"), isBoiler _)).cast("long").as("n_boiler"),
          array_join(filter(col("lines"), l => !isBoiler(l)), " ").as("content"))
        .withColumn("kept", col("n_boiler") * 2 <= col("n_lines"))
        .orderBy(col("doc_id"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_html_extract" ->
      s"""WITH $hxCtes
         |SELECT doc_id, n_lines, n_boiler, content,
         |  (n_boiler * 2 <= n_lines) AS kept
         |FROM hx ORDER BY doc_id""".stripMargin
  )
}
