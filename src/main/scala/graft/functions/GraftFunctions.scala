package graft.functions

import org.apache.spark.sql.SparkSession
import graft.css.Css
import graft.engine.Robots
import graft.extract.{Extractor, JsProperty}
import graft.html.{HElem, Serializer, Text}
import graft.pipeline.{Dedup, MainContent, TextStats, VecDot}
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

  /** Null-propagating guard: Spark calls reference-typed Scala UDFs with
    * null for null input columns (no implicit null-skip as for primitive
    * params), and null html/url/text is a normal corpus condition — the
    * SQL surface must return null, not NPE, exactly as the DataFrame path
    * guards (e.g. the iframe UDF's html == null check).
    */
  @inline private def nn[A](args: String*)(body: => A): A =
    if (args.exists(_ == null)) null.asInstanceOf[A] else body

  def registerAll(spark: SparkSession): Unit = {
    registerUdfs(spark)
    registerNative(spark)
  }

  /** The Scala-UDF half of the surface (everything except the native
    * codegen expressions). Split out so [[GraftSparkExtensions]] can
    * invoke it per-session from the analyzer's rule-builder callback
    * while injecting the native expressions through `injectFunction`.
    * Idempotent — re-registration overwrites with identical bindings.
    */
  def registerUdfs(spark: SparkSession): Unit = {
    val u = spark.udf

    // --- DOM extraction primitives (P2-P5, P9-P10 of SURVEY.md §2.2) ---
    u.register("graft_inner_text", (html: String) =>
      nn(html)(Text.innerText(parse(html))))
    u.register("graft_css_first_text", (html: String, css: String) =>
      nn(html, css)(Css.selectFirst(parse(html), css).map(Text.innerText).getOrElse("")))
    u.register("graft_css_all_text", (html: String, css: String) =>
      nn(html, css)(Css.selectAll(parse(html), css).map(Text.innerText)))
    u.register("graft_css_attr", (html: String, css: String, attr: String, baseUrl: String) =>
      nn(html, css, attr, baseUrl)(Css.selectFirst(parse(html), css)
        .map(e => Extractor.readAttr(e, attr, baseUrl, JsProperty)).getOrElse("")))
    u.register("graft_outer_html", (html: String, css: String) =>
      nn(html, css)(Css.selectFirst(parse(html), css).map(Serializer.outerHtml).getOrElse("")))
    u.register("graft_xpath_text", (html: String, xpath: String) =>
      nn(html, xpath)(XPathAttr.findOne(parse(html), xpath)))
    u.register("graft_main_text", (html: String) =>
      nn(html)(MainContent.extractMainText(
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8))))

    // --- URL canonicalization (the URL-seen key functions) ---
    u.register("graft_url_host", (url: String) => nn(url)(Urls.host(url)))
    u.register("graft_url_canonical", (url: String) => nn(url)(Urls.canonicalize(url)))
    u.register("graft_url_hash", (url: String) =>
      nn(url)(java.lang.Long.valueOf(Urls.urlHash(Urls.canonicalize(url)))))
    u.register("graft_url_resolve", (base: String, href: String) =>
      nn(base, href)(Urls.resolve(base, href)))

    // --- robots (RFC 9309) ---
    u.register("graft_robots_allowed", (robotsTxt: String, productToken: String, path: String) =>
      nn(robotsTxt, productToken, path)(
        java.lang.Boolean.valueOf(Robots.parseFor(robotsTxt, productToken).isAllowed(path))))
    u.register("graft_robots_crawl_delay_ms", (robotsTxt: String, productToken: String) =>
      nn(robotsTxt, productToken)(java.lang.Long.valueOf(
        Robots.parseFor(robotsTxt, productToken).crawlDelayMs.getOrElse(-1L))))
    u.register("graft_robots_sitemaps", (robotsTxt: String) =>
      nn(robotsTxt)(Robots.sitemaps(robotsTxt)))

    // --- pipeline sketches ---
    u.register("graft_simhash64", (text: String) =>
      nn(text)(java.lang.Long.valueOf(Dedup.simhash64Value(text))))
    // NOT nn-wrapped: both scalars define null semantics of their own
    // that the DataFrame twins share (null text = zero tokens → reasons
    // bit 1 / rep counts 0). A null-propagating wrapper here would make
    // the SQL surface return NULL where the DataFrame path returns 1/0,
    // breaking the bit-parity contract the oracles pin.
    u.register("graft_quality_reasons", (text: String) =>
      java.lang.Long.valueOf(TextStats.qualityReasonsValue(text)))
    u.register("graft_rep_top", (text: String, n: Int) =>
      java.lang.Long.valueOf(TextStats.repTopValue(text, n)))
  }

  /** Native codegen expressions, registered through the FunctionRegistry
    * so SQL calls stay inside whole-stage codegen.
    */
  def registerNative(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftSqlBridge.registerExpression(spark, "vec_dot",
      exprs => VecDot(exprs(0), exprs(1)))
}
