package graft.functions

import org.apache.spark.sql.SparkSession
import graft.css.Css
import graft.engine.Robots
import graft.extract.{Extractor, JsProperty}
import graft.html.{HElem, Serializer, Text}
import graft.pipeline.{Dedup, MainContent, VecDot}
import graft.urls.Urls
import graft.xpath.XPathAttr

/** SQL-callable surface of the engine: `registerAll(spark)` exposes the
  * extraction primitives (the pieces `CrawlExtractExpression` composes),
  * URL/robots helpers, and the pipeline sketches as session functions, so
  * the engine's operators compose from `spark.sql(...)` as well as the
  * DataFrame API.
  *
  * All html parameters are STRING (SQL callers `cast(html as string)` for
  * binary corpus columns — UTF-8, matching the engine's own decode).
  * Scalar functions only — whole-operator semantics (pagination loop,
  * URL-seen, politeness) remain engine operators, not expressions.
  *
  * `vec_dot` registers the native [[VecDot]] Catalyst expression rather
  * than a UDF: SQL calls stay inside whole-stage codegen.
  */
object GraftFunctions {

  private def parse(html: String): HElem = Extractor.parseDocument(html)

  def registerAll(spark: SparkSession): Unit = {
    val u = spark.udf

    // --- DOM extraction primitives (P2-P5, P9-P10 of SURVEY.md §2.2) ---
    u.register("graft_inner_text", (html: String) => Text.innerText(parse(html)))
    u.register("graft_css_first_text", (html: String, css: String) =>
      Css.selectFirst(parse(html), css).map(Text.innerText).getOrElse(""))
    u.register("graft_css_all_text", (html: String, css: String) =>
      Css.selectAll(parse(html), css).map(Text.innerText))
    u.register("graft_css_attr", (html: String, css: String, attr: String, baseUrl: String) =>
      Css.selectFirst(parse(html), css)
        .map(e => Extractor.readAttr(e, attr, baseUrl, JsProperty)).getOrElse(""))
    u.register("graft_outer_html", (html: String, css: String) =>
      Css.selectFirst(parse(html), css).map(Serializer.outerHtml).getOrElse(""))
    u.register("graft_xpath_text", (html: String, xpath: String) =>
      XPathAttr.findOne(parse(html), xpath))
    u.register("graft_main_text", (html: String) =>
      MainContent.extractMainText(html.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

    // --- URL canonicalization (the URL-seen key functions) ---
    u.register("graft_url_host", (url: String) => Urls.host(url))
    u.register("graft_url_canonical", (url: String) => Urls.canonicalize(url))
    u.register("graft_url_hash", (url: String) => Urls.urlHash(Urls.canonicalize(url)))
    u.register("graft_url_resolve", (base: String, href: String) => Urls.resolve(base, href))

    // --- robots (RFC 9309) ---
    u.register("graft_robots_allowed", (robotsTxt: String, productToken: String, path: String) =>
      Robots.parseFor(robotsTxt, productToken).isAllowed(path))
    u.register("graft_robots_crawl_delay_ms", (robotsTxt: String, productToken: String) =>
      Robots.parseFor(robotsTxt, productToken).crawlDelayMs.getOrElse(-1L))

    // --- pipeline sketches ---
    u.register("graft_simhash64", (text: String) => Dedup.simhash64Value(text))

    // --- native codegen expressions ---
    org.apache.spark.sql.GraftSqlBridge.registerExpression(spark, "vec_dot",
      exprs => VecDot(exprs(0), exprs(1)))
  }
}
