package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The SQL-callable function surface (GraftFunctions.registerAll): each
  * registered function must agree with the engine primitive it wraps, and
  * vec_dot must plan as the native codegen expression, not a UDF.
  */
class SqlFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("sql-functions-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.registerAll(s)
    s
  }

  private def one(sql: String): Any = spark.sql(sql).head().get(0)

  test("extraction primitives from SQL match the engine primitives") {
    val html = "<html><body><div class='a'>Hello <b>world</b></div>" +
      "<a href='/x/y.html' id='l'>link</a><div class='a'>second</div></body></html>"
    val lit = html.replace("'", "''")
    assert(one(s"SELECT graft_inner_text('$lit')") ===
      graft.html.Text.innerText(graft.extract.Extractor.parseDocument(html)))
    assert(one(s"SELECT graft_css_first_text('$lit', 'div.a')") === "Hello world")
    assert(one(s"SELECT graft_css_all_text('$lit', 'div.a')") ===
      Seq("Hello world", "second"))
    assert(one(s"SELECT graft_css_attr('$lit', 'a#l', 'href', 'http://h0.test/d/p.html')") ===
      "http://h0.test/x/y.html")
    assert(one(s"SELECT graft_outer_html('$lit', 'b')") === "<b>world</b>")
    assert(one(s"SELECT graft_xpath_text('$lit', '//a/@href')") === "/x/y.html")
  }

  test("null inputs propagate as null, never NPE (nullable corpus columns)") {
    // every registered scalar function over a null html/url/text/robots
    // column must yield null — a row with missing html is a normal corpus
    // condition (fetch miss), and the SQL surface must match the
    // DataFrame path's null guards
    val calls = Seq(
      "graft_inner_text(cast(NULL as string))",
      "graft_css_first_text(cast(NULL as string), 'div')",
      "graft_css_first_text('<p>x</p>', cast(NULL as string))",
      "graft_css_all_text(cast(NULL as string), 'div')",
      "graft_css_attr(cast(NULL as string), 'a', 'href', 'http://h0.test/')",
      "graft_outer_html(cast(NULL as string), 'b')",
      "graft_xpath_text(cast(NULL as string), '//a')",
      "graft_main_text(cast(NULL as string))",
      "graft_url_host(cast(NULL as string))",
      "graft_url_canonical(cast(NULL as string))",
      "graft_url_hash(cast(NULL as string))",
      "graft_url_resolve(cast(NULL as string), 'x.html')",
      "graft_url_resolve('http://h0.test/', cast(NULL as string))",
      "graft_robots_allowed(cast(NULL as string), '*', '/a')",
      "graft_robots_crawl_delay_ms(cast(NULL as string), '*')",
      "graft_robots_sitemaps(cast(NULL as string))",
      "graft_simhash64(cast(NULL as string))")
    calls.foreach { c =>
      assert(one(s"SELECT $c") == null, s"$c must be null on null input")
    }
    // EXCEPTIONS: the quality scalars define their own null semantics
    // (null text = zero tokens), shared with the DataFrame twins — a
    // null-propagating wrapper would break the bit-parity contract
    assert(one("SELECT graft_quality_reasons(cast(NULL as string))") ===
      graft.pipeline.TextStats.qualityReasonsValue(null),
      "graft_quality_reasons(NULL) must equal the DataFrame twin (reasons bit 1), not NULL")
    assert(one("SELECT graft_rep_top(cast(NULL as string), 3)") ===
      graft.pipeline.TextStats.repTopValue(null, 3),
      "graft_rep_top(NULL) must equal the DataFrame twin (0), not NULL")
  }

  test("url + robots helpers from SQL") {
    assert(one("SELECT graft_url_host('http://h7.test/a/b.html')") === "h7.test")
    assert(one("SELECT graft_url_resolve('http://h0.test/d/p.html', '../x.html')") ===
      "http://h0.test/x.html")
    val robots = "User-agent: *\\nDisallow: /private/\\nCrawl-delay: 2"
    assert(one(s"SELECT graft_robots_allowed('$robots', '*', '/public/a')") === true)
    assert(one(s"SELECT graft_robots_allowed('$robots', '*', '/private/a')") === false)
    assert(one(s"SELECT graft_robots_crawl_delay_ms('$robots', '*')") === 2000L)
    assert(one("SELECT graft_robots_sitemaps('Sitemap: http://h0.test/s.xml\\nUser-agent: *')")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("http://h0.test/s.xml"))
  }

  test("graft_simhash64 agrees with the dedup sketch") {
    val t = "the quick brown fox jumps over the lazy dog"
    assert(one(s"SELECT graft_simhash64('$t')") === graft.pipeline.Dedup.simhash64Value(t))
  }

  test("graft_quality_reasons / graft_rep_top agree with the DataFrame operators") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.createOrReplaceTempView("docs_sqlfn")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_quality_reasons(text) AS reasons,
        |  graft_rep_top(text, 1) AS top1, graft_rep_top(text, 3) AS top3
        |FROM docs_sqlfn ORDER BY doc_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val viaDf = graft.pipeline.TextStats.qualityFilter(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaRep = graft.pipeline.TextStats.repetitionStats(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getLong(5)))).toMap
    viaSql.foreach { case (id, reasons, top1, top3) =>
      assert(reasons == viaDf(id), s"reasons mismatch for doc $id")
      assert((top1, top3) == viaRep(id), s"rep_top mismatch for doc $id")
    }
  }

  test("vec_dot from SQL is the native codegen expression") {
    // literal inputs constant-fold (already proof of a native expression —
    // Scala UDFs never fold); non-literal inputs show VecDot in the plan
    assert(one("SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))") === 32.0)
    // (VALUES folds too, via ConvertToLocalRelation — range() does not)
    val df = spark.range(1).selectExpr(
      "vec_dot(array(cast(id AS double), 2.0D), array(3.0D, 4.0D)) AS d")
    assert(df.head().getDouble(0) === 8.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("vecdot"), s"expected native VecDot:\n$plan")
    assert(!plan.contains("UDF"), s"vec_dot must not plan as a Scala UDF:\n$plan")
  }

  test("SQL-composed extraction over the fixture corpus matches the DataFrame path") {
    val sf = "/root/testdata/sf0.001"
    graft.corpus.Fixtures.corpus(spark, sf)
      .filter(org.apache.spark.sql.functions.col("url").contains("/list/p1.html"))
      .limit(20).createOrReplaceTempView("pages_v")
    val rows = spark.sql(
      """SELECT url, graft_css_first_text(cast(html AS string), 'ul#doclist a.tit') AS title
        |FROM pages_v ORDER BY url""".stripMargin).collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getString(1).startsWith("Doc ")))
    spark.catalog.dropTempView("pages_v")
  }

  test("spark.sql.extensions conf alone installs the whole surface (no code)") {
    // spark.sql.extensions is a STATIC conf — it can only apply to a
    // freshly-created SparkContext, so the spark-submit path is exercised
    // in a forked JVM whose only graft hookup is the conf
    // (ExtensionsConfSmoke). Tests fork (build.sbt), so java.class.path
    // here is the real test classpath.
    val javaHome = sys.props("java.home")
    val cp = sys.props("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(s"$javaHome/bin/java", "-Xmx2g",
      "-Dspark.sql.session.timeZone=UTC") ++ addOpens ++
      Seq("-cp", cp, "graft.ExtensionsConfSmoke")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
    val rc = proc.waitFor()
    assert(rc == 0 && out.contains("EXTENSIONS_CONF_SMOKE_OK"),
      s"conf-only extensions smoke failed (rc=$rc):\n${out.takeRight(30).mkString("\n")}")
  }
}
