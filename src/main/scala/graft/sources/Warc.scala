package graft.sources

import java.nio.charset.StandardCharsets

/** WARC/1.0 (ISO 28500) reader + writer — the container format web-scale
  * text actually ships in (Common Crawl publishes its corpus as WARC).
  * Pure-JVM byte parsing, same discipline as `pipeline.MediaHeaders`: no
  * library, just the spec's framing.
  *
  * Record framing (ISO 28500 §4): `WARC/1.0\r\n`, header lines
  * `Name: value\r\n`, a blank line, exactly `Content-Length` payload
  * bytes, then `\r\n\r\n`. A `response` record's payload is a full HTTP
  * response (status line, headers, blank line, body).
  *
  * Compression: Common Crawl gzips each record as its OWN gzip member and
  * concatenates the members, so a reader can start at any member
  * boundary. `records` transparently handles both plain and
  * concatenated-gzip input (GZIPInputStream consumes concatenated
  * members). At 100 TB the parallel-read story is the CDX index:
  * (url, file, offset, length) lets each task seek straight to its
  * records — `cdx` builds exactly that index, and the synthetic-fixture
  * queries pin offset arithmetic against a DuckDB reconstruction.
  */
object Warc {

  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: String,
      contentType: String,
      offset: Long,       // byte offset of `WARC/1.0` in the (uncompressed) stream
      length: Long,       // framed record length incl. trailing CRLFCRLF
      payload: Array[Byte]
  )

  /** An HTTP response parsed out of a `response` record's payload. */
  final case class HttpResponse(status: Int, contentType: String, body: Array[Byte])

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream(b.length * 4)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Iterate the records of a WARC stream (plain or concatenated-gzip).
    * Malformed trailing bytes end the iteration rather than throwing —
    * a truncated fetch yields its complete prefix records.
    */
  def records(bytes: Array[Byte]): Iterator[WarcRecord] = {
    val b = if (isGzip(bytes)) gunzipAll(bytes) else bytes
    new Iterator[WarcRecord] {
      private var pos = 0
      private var nextRec: WarcRecord = _
      private def advance(): Unit = {
        nextRec = null
        // seek the version line
        while (pos + 9 <= b.length && nextRec == null) {
          if (b(pos) == 'W' && new String(b, pos, 5, StandardCharsets.US_ASCII) == "WARC/") {
            val recStart = pos
            var lineEnd = indexOfCrlf(b, pos)
            if (lineEnd < 0) { pos = b.length; return }
            var cursor = lineEnd + 2
            var warcType = ""; var uri = ""; var date = ""; var ctype = ""
            var clen = -1L
            var done = false
            while (!done) {
              lineEnd = indexOfCrlf(b, cursor)
              if (lineEnd < 0) { pos = b.length; return }
              if (lineEnd == cursor) { cursor += 2; done = true } // blank line
              else {
                val line = new String(b, cursor, lineEnd - cursor, StandardCharsets.US_ASCII)
                val sep = line.indexOf(':')
                if (sep > 0) {
                  val k = line.substring(0, sep).trim.toLowerCase
                  val v = line.substring(sep + 1).trim
                  k match {
                    case "warc-type"       => warcType = v
                    case "warc-target-uri" => uri = v
                    case "warc-date"       => date = v
                    case "content-type"    => ctype = v
                    case "content-length"  => clen = try v.toLong catch { case _: Exception => -1L }
                    case _                 => ()
                  }
                }
                cursor = lineEnd + 2
              }
            }
            if (clen < 0 || cursor + clen > b.length) { pos = b.length; return }
            val payload = java.util.Arrays.copyOfRange(b, cursor, cursor + clen.toInt)
            var end = cursor + clen.toInt
            // trailing CRLFCRLF (tolerate truncation at stream end)
            if (end + 4 <= b.length && b(end) == '\r') end += 4
            nextRec = WarcRecord(warcType, uri, date, ctype, recStart.toLong,
              (end - recStart).toLong, payload)
            pos = end
          } else pos += 1
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec
        advance()
        r
      }
    }
  }

  /** Parse a `response` record's HTTP payload. */
  def parseHttp(payload: Array[Byte]): Option[HttpResponse] = {
    val headEnd = {
      var i = 0
      var found = -1
      while (found < 0 && i + 3 < payload.length) {
        if (payload(i) == '\r' && payload(i + 1) == '\n' &&
            payload(i + 2) == '\r' && payload(i + 3) == '\n') found = i
        i += 1
      }
      found
    }
    if (headEnd < 0) return None
    val head = new String(payload, 0, headEnd, StandardCharsets.US_ASCII)
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return None
    val status = lines(0).split(" ") match {
      case parts if parts.length >= 2 => try parts(1).toInt catch { case _: Exception => return None }
      case _                          => return None
    }
    val ctype = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") => l.substring(13).trim
    }.getOrElse("")
    val body = java.util.Arrays.copyOfRange(payload, headEnd + 4, payload.length)
    Some(HttpResponse(status, ctype, body))
  }

  // -------------------------------------------------------------- writer

  /** One response record, framed per ISO 28500. ASCII throughout (the
    * fixture corpus is ASCII), so DuckDB can reconstruct the exact byte
    * lengths with string concatenation + octet_length — the same
    * bit-parity discipline as the media_meta_real oracle.
    */
  def buildResponseRecord(url: String, recordId: String, body: Array[Byte],
                          date: String = "2024-01-01T00:00:00Z"): Array[Byte] = {
    val http = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes(StandardCharsets.US_ASCII) ++ body
    val header = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recordId>\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n" +
      "\r\n").getBytes(StandardCharsets.US_ASCII)
    header ++ http ++ Crlf ++ Crlf
  }

  /** Gzip a record as its own member (the Common Crawl layout: members
    * concatenate into a seekable-by-offset .warc.gz).
    */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(record)
    gz.close()
    out.toByteArray
  }
}
