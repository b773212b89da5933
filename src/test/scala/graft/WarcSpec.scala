package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.sources.Warc
import java.nio.charset.StandardCharsets.US_ASCII

/** WARC (ISO 28500) source: framing round-trips, concatenated-gzip
  * members (the Common Crawl layout), CDX offset arithmetic, truncation
  * tolerance, and the Spark binaryFile ingestion path.
  */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("warc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rec(url: String, id: String, body: String): Array[Byte] =
    Warc.buildResponseRecord(url, id, body.getBytes(US_ASCII))

  test("single response record round-trips through the reader") {
    val r = Warc.records(rec("http://a.test/x", "r1", "<html>hi</html>")).toList
    assert(r.size == 1)
    assert(r.head.warcType == "response")
    assert(r.head.targetUri == "http://a.test/x")
    assert(r.head.offset == 0L)
    val http = Warc.parseHttp(r.head.payload).get
    assert(http.status == 200)
    assert(http.contentType == "text/html; charset=utf-8")
    assert(new String(http.body, US_ASCII) == "<html>hi</html>")
  }

  test("multi-record stream: offsets are cumulative framed lengths") {
    val recs = Seq(
      rec("http://a.test/1", "r1", "alpha"),
      rec("http://a.test/2", "r2", "beta beta"),
      rec("http://a.test/3", "r3", "gamma gamma gamma"))
    val blob = recs.reduce(_ ++ _)
    val parsed = Warc.records(blob).toList
    assert(parsed.size == 3)
    assert(parsed.map(_.length) == recs.map(_.length.toLong))
    assert(parsed.map(_.offset) == recs.map(_.length.toLong).scanLeft(0L)(_ + _).init)
    // a seek straight to the second record's offset reads exactly it —
    // the CDX contract
    val seeked = Warc.records(
      java.util.Arrays.copyOfRange(blob, parsed(1).offset.toInt, blob.length)).next()
    assert(seeked.targetUri == "http://a.test/2")
  }

  test("concatenated per-record gzip members (Common Crawl layout) round-trip") {
    val gz = Seq(
      Warc.gzipMember(rec("http://g.test/1", "g1", "one")),
      Warc.gzipMember(rec("http://g.test/2", "g2", "two two"))).reduce(_ ++ _)
    val parsed = Warc.records(gz).toList
    assert(parsed.map(_.targetUri) == Seq("http://g.test/1", "http://g.test/2"))
    assert(new String(Warc.parseHttp(parsed(1).payload).get.body, US_ASCII) == "two two")
  }

  test("gzipped-member CDX: offsets summed over COMPRESSED member lengths seek correctly") {
    // the .warc.gz variant of the warc_cdx windowed sum (warcCdx's plain
    // offsets are oracle-pinned; this is the compressed-layout contract
    // its scaladoc defers here): offset_i = sum of gzipMember lengths
    // before i, and a byte-slice seek at that offset parses record i
    val members = Seq(
      Warc.gzipMember(rec("http://z.test/1", "z1", "alpha")),
      Warc.gzipMember(rec("http://z.test/2", "z2", "beta beta")),
      Warc.gzipMember(rec("http://z.test/3", "z3", "gamma gamma gamma")))
    val blob = members.reduce(_ ++ _)
    val offsets = members.map(_.length.toLong).scanLeft(0L)(_ + _).init
    for ((off, i) <- offsets.zipWithIndex) {
      val seeked = Warc.records(
        java.util.Arrays.copyOfRange(blob, off.toInt, blob.length)).next()
      assert(seeked.targetUri == s"http://z.test/${i + 1}",
        s"seek at compressed offset $off must land on member ${i + 1}")
    }
  }

  test("truncated stream yields its complete prefix records, no throw") {
    val blob = rec("http://t.test/1", "t1", "whole") ++ rec("http://t.test/2", "t2", "cut")
    val truncated = java.util.Arrays.copyOfRange(blob, 0, blob.length - 20)
    val parsed = Warc.records(truncated).toList
    assert(parsed.map(_.targetUri) == Seq("http://t.test/1"))
    assert(Warc.parseHttp("no http here".getBytes(US_ASCII)).isEmpty)
  }

  test("warc_cdx offsets match a physical concatenation of the file's records") {
    val sfDir = "/root/testdata/sf0.001"
    val cdx = PipelineQueries.warcCdx(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val file0 = cdx.filter(_._2 == "warc-00000").sortBy(_._1)
    assert(file0.nonEmpty)
    // rebuild file 0 exactly as the index assumes: records in doc_id order
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val blob = file0.map { case (id, _, _, _) =>
      rec(graft.corpus.Fixtures.base(id) + "/page.html", s"doc-$id",
        s"<html><body><p>${docs(id)}</p></body></html>")
    }.reduce(_ ++ _)
    val parsed = Warc.records(blob).toList
    assert(parsed.map(_.offset) == file0.map(_._3))
    assert(parsed.map(_.length) == file0.map(_._4))
  }

  test("Spark binaryFile ingestion: a .warc.gz on disk becomes (url, body) rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    val gz = Seq(
      Warc.gzipMember(rec("http://f.test/1", "f1", "file one")),
      Warc.gzipMember(rec("http://f.test/2", "f2", "file two"))).reduce(_ ++ _)
    java.nio.file.Files.write(dir.resolve("part-00000.warc.gz"), gz)
    val out = spark.read.format("binaryFile").load(dir.toString)
      .select("content").collect()
      .flatMap(r => Warc.records(r.getAs[Array[Byte]](0)))
      .map(r => (r.targetUri, new String(Warc.parseHttp(r.payload).get.body, US_ASCII)))
      .sortBy(_._1).toSeq
    assert(out == Seq(("http://f.test/1", "file one"), ("http://f.test/2", "file two")))
  }
}
