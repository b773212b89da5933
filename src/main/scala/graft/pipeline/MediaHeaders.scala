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
  *  - MP4  (ISO/IEC 14496-12 ISO-BMFF): length-prefixed box tree —
  *    `moov/mvhd` carries timescale + duration, `moov/trak/tkhd` the
  *    track dims as 16.16 fixed-point, `trak/mdia/minf/stbl/stsz` the
  *    sample (frame) count. A plain recursive box walk reads all three.
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
      .orElse(parseMp4(b))

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

  /** Video metadata an MP4 header publishes beyond the common Meta shape:
    * presentation duration from `mvhd` (duration_ticks / timescale).
    */
  final case class Mp4Meta(width: Long, height: Long, frames: Long, durationMs: Long)

  /** Locate the first box named `name` among the siblings in b[from,to).
    * Returns (payloadStart, payloadEnd). ISO-BMFF: u32 BE size (incl. the
    * 8-byte header; size==1 → u64 largesize follows; size==0 → to end of
    * enclosing box) + 4-byte type.
    */
  private def findBox(b: Array[Byte], from: Int, to: Int, name: String): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val size32 = u32be(b, i)
      val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      var payload = i + 8
      val boxEnd =
        if (size32 == 1L) {
          if (i + 16 > to) return None
          val size64 = (u32be(b, i + 8) << 32) | u32be(b, i + 12)
          payload = i + 16
          if (size64 < 16 || i + size64 > to.toLong) return None
          i + size64.toInt
        } else if (size32 == 0L) to
        else {
          if (size32 < 8 || i + size32 > to.toLong) return None
          i + size32.toInt
        }
      if (typ == name) return Some((payload, boxEnd))
      i = boxEnd
    }
    None
  }

  /** Descend a container path, e.g. Seq("moov","trak","tkhd"). */
  private def findPath(b: Array[Byte], path: Seq[String]): Option[(Int, Int)] =
    path.foldLeft(Option((0, b.length))) {
      case (Some((from, to)), name) => findBox(b, from, to, name)
      case (None, _)                => None
    }

  /** MP4 header walk. Requires a leading `ftyp` (the brand box every
    * ISO-BMFF file starts with — cheap magic check), then reads
    * `moov/mvhd` (v0 or v1) for timescale+duration, the first
    * `moov/trak/tkhd` with nonzero dims (the video track; audio tracks
    * encode 0×0) and that trak's `mdia/minf/stbl/stsz` sample count.
    */
  def parseMp4Detail(b: Array[Byte]): Option[Mp4Meta] = {
    if (b.length < 16) return None
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    val (moovS, moovE) = findPath(b, Seq("moov")).getOrElse(return None)
    val durationMs = findBox(b, moovS, moovE, "mvhd").flatMap { case (s, e) =>
      val version = b(s) & 0xff
      if (version == 1) {
        // v1: ctime u64, mtime u64, timescale u32, duration u64
        if (s + 32 > e) None
        else {
          val ts = u32be(b, s + 20)
          val dur = (u32be(b, s + 24) << 32) | u32be(b, s + 28)
          if (ts > 0) Some(dur * 1000L / ts) else None
        }
      } else {
        // v0: ctime u32, mtime u32, timescale u32, duration u32
        if (s + 20 > e) None
        else {
          val ts = u32be(b, s + 12)
          if (ts > 0) Some(u32be(b, s + 16) * 1000L / ts) else None
        }
      }
    }.getOrElse(0L)
    // first trak whose tkhd carries nonzero dims = the video track
    var cursor = moovS
    while (cursor < moovE) {
      findBox(b, cursor, moovE, "trak") match {
        case None => return None
        case Some((ts, te)) =>
          val dims = findBox(b, ts, te, "tkhd").flatMap { case (s, e) =>
            val version = b(s) & 0xff
            // v0 payload: ver/flags 4, ctime 4, mtime 4, track_id 4,
            // rsvd 4, duration 4, rsvd 8, layer 2, alt 2, vol 2, rsvd 2,
            // matrix 36 → width 16.16 at +76, height at +80 (v1: the three
            // leading times are u64 → +12 more)
            val off = if (version == 1) s + 88 else s + 76
            if (off + 8 > e) None
            else Some((u32be(b, off) >> 16, u32be(b, off + 4) >> 16))
          }
          dims match {
            case Some((w, h)) if w > 0 && h > 0 =>
              // stsz lives under THIS trak, not the file root
              val fr = findBox(b, ts, te, "mdia")
                .flatMap { case (s1, e1) => findBox(b, s1, e1, "minf") }
                .flatMap { case (s2, e2) => findBox(b, s2, e2, "stbl") }
                .flatMap { case (s3, e3) => findBox(b, s3, e3, "stsz") }
                .flatMap { case (s4, e4) =>
                  // stsz payload: ver/flags 4, sample_size u32, sample_count u32
                  if (s4 + 12 > e4) None else Some(u32be(b, s4 + 8))
                }.getOrElse(0L)
              return Some(Mp4Meta(w, h, fr, durationMs))
            case _ => cursor = te
          }
      }
    }
    None
  }

  def parseMp4(b: Array[Byte]): Option[Meta] =
    parseMp4Detail(b).map(m => Meta("mp4", m.width, m.height, m.frames))

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

  /** Video shape for a seed: frame count (25 fps, timescale 1000 →
    * duration = frames × 40 ms). Mirrored by the `media_meta_video`
    * DuckDB oracle.
    */
  def framesFor(seed: Long): Long = 1 + java.lang.Math.floorMod(seed * 5, 240)

  /** Header-only ISO-BMFF skeleton (like the PNG builder omits IDAT, this
    * omits sample data): ftyp + moov{mvhd + trak{tkhd + mdia{mdhd +
    * minf{stbl{stsz}}}}} + empty mdat — every offset, fixed-point dim and
    * tick count spec-correct, 324 bytes total.
    */
  def buildMp4(seed: Long): Array[Byte] = {
    val (w, h) = shapeFor(seed)
    val frames = framesFor(seed)
    val durTicks = (frames * 40).toInt // timescale 1000, 25 fps
    val out = java.nio.ByteBuffer.allocate(324)
    def box(size: Int, typ: String): Unit = { out.putInt(size); out.put(typ.getBytes) }
    def matrixIdentity(): Unit = {
      out.putInt(0x10000).putInt(0).putInt(0)
      out.putInt(0).putInt(0x10000).putInt(0)
      out.putInt(0).putInt(0).putInt(0x40000000)
    }
    box(24, "ftyp")
    out.put("isom".getBytes).putInt(0x200).put("isom".getBytes).put("mp41".getBytes)
    box(292, "moov")
    box(108, "mvhd")
    out.putInt(0)                  // version 0 + flags
      .putInt(0).putInt(0)         // ctime, mtime
      .putInt(1000).putInt(durTicks) // timescale, duration
      .putInt(0x10000)             // rate 1.0
      .putShort(0x100).putShort(0) // volume 1.0, reserved
      .putInt(0).putInt(0)         // reserved
    matrixIdentity()
    (1 to 6).foreach(_ => out.putInt(0)) // pre_defined
    out.putInt(2)                  // next_track_ID
    box(176, "trak")
    box(92, "tkhd")
    out.putInt(7)                  // version 0, flags: enabled|in movie|in preview
      .putInt(0).putInt(0)         // ctime, mtime
      .putInt(1).putInt(0)         // track_ID, reserved
      .putInt(durTicks)
      .putInt(0).putInt(0)         // reserved u64
      .putShort(0).putShort(0)     // layer, alternate_group
      .putShort(0).putShort(0)     // volume (video: 0), reserved
    matrixIdentity()
    out.putInt((w << 16).toInt).putInt((h << 16).toInt) // 16.16 fixed
    box(76, "mdia")
    box(32, "mdhd")
    out.putInt(0).putInt(0).putInt(0)
      .putInt(1000).putInt(durTicks)
      .putShort(0x55c4.toShort).putShort(0) // language 'und', pre_defined
    box(36, "minf")
    box(28, "stbl")
    box(20, "stsz")
    out.putInt(0)                  // version + flags
      .putInt(1024)                // constant sample_size (no per-sample table)
      .putInt(frames.toInt)        // sample_count = frame count
    box(8, "mdat")                 // empty: header-only skeleton
    out.array()
  }

  /** One payload per seed, cycling through the five formats. */
  def buildPayload(seed: Long): Array[Byte] =
    java.lang.Math.floorMod(seed, 5) match {
      case 0 => buildPng(seed)
      case 1 => buildJpeg(seed)
      case 2 => buildGif(seed)
      case 3 => buildWav(seed)
      case _ => buildMp4(seed)
    }
}
