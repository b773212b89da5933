package graft.pipeline

/** Pure-JVM media header parsing — the de-stubbed decode step of the
  * multimodal pipeline. No media libraries exist in this container, but
  * the four container formats below publish their dimensions/shape in
  * fixed, spec-defined header fields that plain byte arithmetic reads:
  *
  *  - PNG  (ISO/IEC 15948 §5.2, §11.2.2): 8-byte signature, then the IHDR
  *    chunk — width/height are big-endian u32 at bytes 16..23.
  *  - JPEG (ITU-T T.81 §B.2.2): segment scan from SOI for an SOFn marker
  *    (0xC0–0xCF minus DHT/JPG/DAC); its payload is precision(1),
  *    height(2 BE), width(2 BE).
  *  - GIF  (GIF89a spec §18): 6-byte signature, then the Logical Screen
  *    Descriptor — width/height little-endian u16 at bytes 6..9.
  *  - WAV  (RIFF/WAVE): 'fmt ' chunk carries channels + sample rate,
  *    'data' chunk length / block-align = sample frames.
  *
  * `parse` returns None for payloads that match no magic — the caller
  * falls back to [[Multimodal.StubDecoder]], preserving the deterministic
  * behavior for non-media payloads (e.g. the text-bytes stand-ins in the
  * `media_meta` oracle query).
  */
object MediaHeaders {

  /** (fmt, width, height, frames). For images frames = 1; for WAV
    * width = sample rate, height = channels, frames = sample count —
    * the natural "shape" fields of an audio payload.
    */
  final case class Meta(fmt: String, width: Long, height: Long, frames: Long)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  def parse(b: Array[Byte]): Option[Meta] =
    parsePng(b).orElse(parseJpeg(b)).orElse(parseGif(b)).orElse(parseWav(b))

  def parsePng(b: Array[Byte]): Option[Meta] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length < 24 || !b.take(8).sameElements(sig)) return None
    // first chunk must be IHDR (len at 8..11, type at 12..15)
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    Some(Meta("png", u32be(b, 16), u32be(b, 20), 1L))
  }

  def parseJpeg(b: Array[Byte]): Option[Meta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced — not a JPEG stream
      val marker = b(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { i += 2 } // standalone
      else if (marker == 0xd9) return None                                 // EOI before SOF
      else {
        val len = u16be(b, i + 2)
        // SOFn: C0–CF except C4 (DHT), C8 (JPG), CC (DAC)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 9 >= b.length) return None
          val h = u16be(b, i + 5)
          val w = u16be(b, i + 7)
          return Some(Meta("jpeg", w, h, 1L))
        }
        i += 2 + len
      }
    }
    None
  }

  def parseGif(b: Array[Byte]): Option[Meta] = {
    if (b.length < 10) return None
    val hdr = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    Some(Meta("gif", u16le(b, 6), u16le(b, 8), 1L))
  }

  def parseWav(b: Array[Byte]): Option[Meta] = {
    if (b.length < 44) return None
    def tag(i: Int) = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var rate = -1L; var channels = -1L; var blockAlign = -1L; var dataLen = -1L
    while (i + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val id = tag(i)
      val len = u32le(b, i + 4)
      if (id == "fmt " && i + 24 <= b.length) {
        channels = u16le(b, i + 10).toLong
        rate = u32le(b, i + 12)
        blockAlign = u16le(b, i + 20).toLong
      } else if (id == "data") dataLen = len
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (rate < 0 || channels <= 0 || blockAlign <= 0) None
    else Some(Meta("wav", rate, channels, if (dataLen < 0) 0L else dataLen / blockAlign))
  }

  // ------------------------------------------------------------------
  // Deterministic synthetic payload builders: REAL container bytes (valid
  // signatures, spec-correct header fields, CRCs where the format defines
  // them) with shape derived from a seed — lets tests and oracle queries
  // drive the real parser end-to-end without shipping binary fixtures.
  // ------------------------------------------------------------------

  def shapeFor(seed: Long): (Long, Long) =
    (16 + java.lang.Math.floorMod(seed * 7, 1024), 16 + java.lang.Math.floorMod(seed * 13, 768))

  private def crc32(b: Array[Byte], from: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, from, len)
    c.getValue
  }

  def buildPng(seed: Long): Array[Byte] = {
    val (w, h) = shapeFor(seed)
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12)
    out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes) // IHDR: 13-byte payload
    out.putInt(w.toInt).putInt(h.toInt)
    out.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val a = out.array()
    out.putInt(crc32(a, 12, 17).toInt) // CRC over type+payload
    out.putInt(0).put("IEND".getBytes).putInt(crc32(a, 8 + 25 + 4, 4).toInt)
    a
  }

  def buildJpeg(seed: Long): Array[Byte] = {
    val (w, h) = shapeFor(seed)
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 13 + 2)
    out.putShort(0xffd8.toShort)                     // SOI
    out.putShort(0xffe0.toShort).putShort(16)        // APP0, len 16
    out.put("JFIF".getBytes).put(0.toByte)
    out.put(1.toByte).put(1.toByte).put(0.toByte)    // version 1.1, aspect units
    out.putShort(1).putShort(1).put(0.toByte).put(0.toByte)
    out.putShort(0xffc0.toShort).putShort(11)        // SOF0, len 11: 1 component
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    out.put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte)
    out.putShort(0xffd9.toShort)                     // EOI
    out.array()
  }

  def buildGif(seed: Long): Array[Byte] = {
    val (w0, h0) = shapeFor(seed)
    val (w, h) = (w0 & 0xffff, h0 & 0xffff)
    val out = java.nio.ByteBuffer.allocate(6 + 7 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes)
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte)    // no GCT, bg, aspect
    out.put(0x3b.toByte)                             // trailer
    out.array()
  }

  def buildWav(seed: Long): Array[Byte] = {
    val rate = 8000 + java.lang.Math.floorMod(seed * 11, 40000)
    val channels = 1 + (java.lang.Math.floorMod(seed, 2)).toInt
    val samples = 8 + java.lang.Math.floorMod(seed * 3, 64)
    val blockAlign = channels * 2 // 16-bit PCM
    val dataLen = (samples * blockAlign).toInt
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16)
    out.putShort(1).putShort(channels.toShort).putInt(rate.toInt)
    out.putInt((rate * blockAlign).toInt).putShort(blockAlign.toShort).putShort(16)
    out.put("data".getBytes).putInt(dataLen)
    // deterministic PCM: a byte ramp seeded by the doc id
    var i = 0
    while (i < dataLen) { out.put(((seed + i) & 0xff).toByte); i += 1 }
    out.array()
  }

  /** One payload per seed, cycling through the four formats. */
  def buildPayload(seed: Long): Array[Byte] =
    java.lang.Math.floorMod(seed, 4) match {
      case 0 => buildPng(seed)
      case 1 => buildJpeg(seed)
      case 2 => buildGif(seed)
      case _ => buildWav(seed)
    }
}
