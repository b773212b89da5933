package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry; each
  * entry with SQL-expressible semantics has a DuckDB oracle in `oracleSql`
  * reconstructing the expected rows from the same parquet tables
  * (`documents` drives the fixture corpus — Fixtures.scala documents the
  * generation rules both sides rely on).
  */
object SparkEntry {

  /** Flagship: the paginated list crawl (SURVEY.md §7 minimum slice) on
    * sf=0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    CrawlQueries.crawlList(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- crawl engine (SURVEY.md §2.1-2.4) ---
    "crawl_list" -> (CrawlQueries.crawlList(_, _)),
    "crawl_xpath" -> (CrawlQueries.crawlXpath(_, _)),
    "crawl_condition" -> (CrawlQueries.crawlCondition(_, _)),
    "crawl_iframe" -> (CrawlQueries.crawlIframe(_, _)),
    "crawl_scroll" -> (CrawlQueries.crawlScroll(_, _)),
    "crawl_scroll_smooth" -> (CrawlQueries.crawlScrollSmooth(_, _)),
    "crawl_dynamic" -> (CrawlQueries.crawlDynamic(_, _)),
    "crawl_robots" -> (CrawlQueries.crawlRobots(_, _)),
    "crawl_edge" -> (CrawlQueries.crawlEdge(_, _)),
    "crawl_entities" -> (CrawlQueries.crawlEntities(_, _)),
    "url_seen" -> (CrawlQueries.urlSeen(_, _)),
    "politeness_schedule" -> (CrawlQueries.politenessSchedule(_, _)),
    "crawl_metrics" -> (CrawlQueries.crawlMetrics(_, _))
  )

  def oracleSql: Map[String, String] = Map(
    "crawl_list" ->
      """SELECT d.doc_id, k AS page_no, i-1 AS pos,
        |  'Doc '||d.doc_id||' item '||k||'-'||i AS title,
        |  'http://h'||(d.doc_id%50)||'.test/d'||d.doc_id||'/list/art_'||d.doc_id||'_'||k||'_'||i||'.html' AS link,
        |  '2024-0'||k||'-0'||i AS date_s,
        |  substr(d.text,1,40) AS snip
        |FROM documents d, generate_series(1,3) s(k), generate_series(1,4) s2(i)
        |ORDER BY 1,2,3""".stripMargin,
    "crawl_xpath" ->
      """SELECT d.doc_id, k AS page_no, i-1 AS pos,
        |  'cmt '||d.doc_id||' '||k||'-'||i||' '||substr(d.text,1,40) AS content,
        |  '2024-0'||k||'-1'||i AS ctime
        |FROM documents d, generate_series(1,3) s(k), generate_series(1,3) s2(i)
        |ORDER BY 1,2,3""".stripMargin,
    "crawl_condition" ->
      """SELECT d.doc_id, k AS page_no, i-1 AS pos,
        |  'Cond '||d.doc_id||' item '||k||'-'||i AS title
        |FROM documents d, generate_series(1,5) s(k), generate_series(1,2) s2(i)
        |ORDER BY 1,2,3""".stripMargin,
    "crawl_iframe" ->
      """SELECT d.doc_id, k AS page_no, i-1 AS pos,
        |  'IT '||d.doc_id||' '||k||'-'||i AS title,
        |  'http://h'||(d.doc_id%50)||'.test/d'||d.doc_id||'/ifr/arti_'||d.doc_id||'_'||k||'_'||i||'.html' AS link,
        |  '2024-1'||k||'-0'||i AS date_s
        |FROM documents d, generate_series(1,3) s(k), generate_series(1,3) s2(i)
        |ORDER BY 1,2,3""".stripMargin,
    "crawl_scroll" ->
      """SELECT d.doc_id, k AS page_no, i-1 AS pos,
        |  'More '||d.doc_id||' item '||i AS title,
        |  't'||i AS time_s,
        |  'http://h'||(d.doc_id%50)||'.test/d'||d.doc_id||'/more/m_'||d.doc_id||'_'||i||'.html' AS link
        |FROM documents d, generate_series(1,3) s(k), generate_series(1,12) s2(i)
        |WHERE i > (k-1)*4 AND i <= k*4
        |ORDER BY 1,2,3""".stripMargin,
    "crawl_scroll_smooth" ->
      """SELECT d.doc_id, k AS page_no, i-1 AS pos,
        |  'Tweet '||d.doc_id||' no '||i AS txt,
        |  '2024-03-0'||i||'T00:00:00Z' AS dt,
        |  '/u/status/'||d.doc_id||'00'||i AS link,
        |  (i*3)||' replies, '||(i*5)||' likes' AS labels
        |FROM documents d, generate_series(1,3) s(k), generate_series(1,5) s2(i)
        |WHERE i <= k+2
        |ORDER BY 1,2,3""".stripMargin,
    "crawl_dynamic" ->
      """SELECT d.doc_id, k AS page_no, i-1 AS pos,
        |  'Dyn '||d.doc_id||' '||k||'-'||i AS t
        |FROM documents d, generate_series(1,3) s(k), generate_series(1,2) s2(i)
        |ORDER BY 1,2,3""".stripMargin,
    "crawl_robots" ->
      """SELECT doc_id, 'Robot '||doc_id||' ok' AS title
        |FROM documents WHERE doc_id % 5 <> 0
        |ORDER BY 1""".stripMargin,
    "crawl_edge" ->
      """SELECT doc_id, CAST(0 AS BIGINT) AS pos,
        |  'A'||doc_id||'B'||doc_id AS ab,
        |  CAST(NULL AS VARCHAR) AS date_s, CAST(NULL AS VARCHAR) AS noval
        |FROM documents
        |UNION ALL
        |SELECT doc_id, CAST(1 AS BIGINT), NULL, '2024-01-01', NULL FROM documents
        |ORDER BY 1,2""".stripMargin,
    "crawl_entities" ->
      """SELECT doc_id, '<x> & "q" '||chr(169)||doc_id AS val
        |FROM documents ORDER BY 1""".stripMargin,
    "url_seen" ->
      """SELECT d.doc_id,
        |  'http://h'||(d.doc_id%50)||'.test/d'||d.doc_id||'/list/p'||k||'.html' AS url
        |FROM documents d, generate_series(1,3) s(k)
        |ORDER BY 1,2""".stripMargin,
    "politeness_schedule" ->
      """WITH pages AS (
        |  SELECT doc_id, k AS page_no,
        |    'http://h'||(doc_id%50)||'.test/d'||doc_id||'/list/p'||k||'.html' AS url,
        |    doc_id%50 AS h
        |  FROM documents, generate_series(1,3) s(k))
        |SELECT doc_id, page_no, url,
        |  (row_number() OVER (PARTITION BY h, page_no ORDER BY url) - 1) * 100 AS scheduled_ms,
        |  row_number() OVER (PARTITION BY h, page_no ORDER BY url) - 1 AS fetch_seq
        |FROM pages ORDER BY 1,2""".stripMargin,
    "crawl_metrics" ->
      """SELECT 'h'||(doc_id%50)||'.test' AS host, count(*)*3 AS pages
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
