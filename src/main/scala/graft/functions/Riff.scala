package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Pure-JVM AVI/MJPEG codec: a spec-conformant RIFF-AVI writer (JPEG
  * frames via `javax.imageio`, explicit quality) and the matching
  * container walker. This replaces the former `DecodeStub` — the video
  * path is now a REAL inter-frame container format (the one MJPEG
  * cameras and legacy capture cards emit), not a pretend payload:
  * `aviMjpeg` emits RIFF('AVI ') → LIST hdrl (avih + LIST strl
  * (strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) → LIST movi
  * ('00dc' chunks, even-padded) → idx1, all little-endian per the
  * public AVI RIFF spec, and `walk` re-derives the frame table from
  * the container structure alone (never trusting idx1 blindly — the
  * index is cross-checked against the walked chunks).
  *
  * Reference scope: the reference library has no media path at all
  * (go-data-exporter/exporter formats tabular text); this is part of
  * the [EXT] multimodal surface (SURVEY §2.5) where only the decode of
  * truly external codecs (H.264 …) stays out of scope — MJPEG-in-AVI
  * is fully decodable with the JDK's ImageIO.
  *
  * Determinism contract (what makes the DuckDB oracle possible): a
  * CONSTANT-gray frame survives the JPEG round-trip bit-exactly at
  * quality 1.0 — gray means Cb=Cr=128 exactly (4:2:0 subsampling of a
  * constant is the constant) and the DC-only luma block quantizes
  * losslessly — verified exhaustively for all 256 gray levels × odd
  * and even dimensions before this oracle was written. Queries paint
  * constant frames; pattern-filled frames are for container tests
  * only, never pixel oracles.
  */
object Riff {

  // ---------------------------------------------------------------- write

  /** JPEG-encode at an explicit quality (ImageIO's bare `write` picks
    * a default ~0.75 that is NOT bit-stable for the constant-frame
    * contract above; 1.0f is). */
  def jpegEncode(img: java.awt.image.BufferedImage,
                 quality: Float = 1.0f): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.flush()
    } finally wr.dispose()
    bos.toByteArray
  }

  private final class LeOut {
    val bos = new ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def fcc(s: String): Unit = { require(s.length == 4); bos.write(s.getBytes("US-ASCII")) }
    def raw(b: Array[Byte]): Unit = bos.write(b)
    def bytes: Array[Byte] = bos.toByteArray
  }

  /** A complete MJPEG AVI from pre-encoded JPEG frames. `w`/`h` go in
    * the headers (avih + BITMAPINFOHEADER); `fps` sets dwScale/dwRate
    * and dwMicroSecPerFrame. Every chunk is even-padded and every LIST
    * size is exact, so strict RIFF parsers (and [[walk]]) accept it. */
  def aviMjpeg(frames: Seq[Array[Byte]], w: Int, h: Int,
               fps: Int = 25): Array[Byte] = {
    val maxF = if (frames.isEmpty) 0 else frames.map(_.length).max
    def chunk(id: String, body: LeOut => Unit): Array[Byte] = {
      val o = new LeOut; body(o); val b = o.bytes
      val out = new LeOut
      out.fcc(id); out.u32(b.length.toLong); out.raw(b)
      if ((b.length & 1) == 1) out.bos.write(0) // RIFF even padding
      out.bytes
    }
    def list(typ: String, parts: Seq[Array[Byte]]): Array[Byte] = {
      val inner = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
      val out = new LeOut
      out.fcc("LIST"); out.u32(4L + inner.length); out.fcc(typ); out.raw(inner)
      out.bytes
    }
    val avih = chunk("avih", o => {
      o.u32(1000000L / fps)        // dwMicroSecPerFrame
      o.u32(maxF.toLong * fps)     // dwMaxBytesPerSec
      o.u32(0); o.u32(0x10)        // dwPaddingGranularity, dwFlags=HASINDEX
      o.u32(frames.length.toLong)  // dwTotalFrames
      o.u32(0); o.u32(1)           // dwInitialFrames, dwStreams
      o.u32(maxF.toLong)           // dwSuggestedBufferSize
      o.u32(w.toLong); o.u32(h.toLong)
      (0 until 4).foreach(_ => o.u32(0)) // dwReserved
    })
    val strh = chunk("strh", o => {
      o.fcc("vids"); o.fcc("MJPG")
      o.u32(0); o.u16(0); o.u16(0) // dwFlags, wPriority, wLanguage
      o.u32(0)                     // dwInitialFrames
      o.u32(1); o.u32(fps.toLong)  // dwScale, dwRate
      o.u32(0)                     // dwStart
      o.u32(frames.length.toLong)  // dwLength
      o.u32(maxF.toLong)           // dwSuggestedBufferSize
      o.u32(0xFFFFFFFFL)           // dwQuality (default)
      o.u32(0)                     // dwSampleSize
      o.u16(0); o.u16(0); o.u16(w); o.u16(h) // rcFrame
    })
    val strf = chunk("strf", o => {
      o.u32(40)                    // biSize (BITMAPINFOHEADER)
      o.u32(w.toLong); o.u32(h.toLong)
      o.u16(1); o.u16(24)          // biPlanes, biBitCount
      o.fcc("MJPG")                // biCompression
      o.u32(w.toLong * h * 3)      // biSizeImage
      o.u32(0); o.u32(0); o.u32(0); o.u32(0)
    })
    val hdrl = list("hdrl", Seq(avih, list("strl", Seq(strh, strf))))
    val dcChunks = frames.map(f => chunk("00dc", _.raw(f)))
    val movi = list("movi", dcChunks)
    // idx1 offsets are relative to the 'movi' fourcc (the common
    // convention); each walked chunk lands 8 bytes past its header
    val offsets = dcChunks.scanLeft(4L)((acc, c) => acc + c.length).init
    val idx1 = chunk("idx1", o => frames.indices.foreach { i =>
      o.fcc("00dc"); o.u32(0x10) // AVIIF_KEYFRAME
      o.u32(offsets(i)); o.u32(frames(i).length.toLong)
    })
    val inner = hdrl ++ movi ++ idx1
    val out = new LeOut
    out.fcc("RIFF"); out.u32(4L + inner.length); out.fcc("AVI "); out.raw(inner)
    out.bytes
  }

  // ----------------------------------------------------------------- read

  /** Parsed container: header claims + the frame table derived from
    * walking LIST movi + the idx1 entry count (for cross-checking). */
  final case class AviInfo(totalFrames: Long, width: Long, height: Long,
                           frames: Seq[(Int, Int)], // (offset, len) of JPEG bytes
                           idx1Entries: Long)

  private def le32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** Defensive RIFF walk (m10's posture: a corrupt size field stops
    * the parse at the last valid chunk instead of throwing): returns
    * None unless the RIFF/AVI signature and an hdrl/avih are present. */
  def walk(payload: Array[Byte]): Option[AviInfo] = {
    if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
        fourcc(payload, 8) != "AVI ") return None
    var totalFrames = -1L; var w = -1L; var h = -1L
    var idx1N = 0L
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val end = math.min(payload.length.toLong, 8L + le32(payload, 4)).toInt
    var p = 12
    var ok = true
    while (ok && p + 8 <= end) {
      val id = fourcc(payload, p)
      val sz = le32(payload, p + 4)
      if (sz < 0 || p + 8 + sz > end) ok = false
      else {
        val body = p + 8
        id match {
          case "LIST" if sz >= 4 =>
            fourcc(payload, body) match {
              case "hdrl" =>
                // avih is the first chunk inside hdrl per spec
                var q = body + 4
                val hEnd = body + sz.toInt
                var found = false
                while (!found && q + 8 <= hEnd) {
                  val cid = fourcc(payload, q); val csz = le32(payload, q + 4)
                  if (cid == "avih" && csz >= 56 && q + 8 + csz <= hEnd) {
                    totalFrames = le32(payload, q + 8 + 16)
                    w = le32(payload, q + 8 + 32)
                    h = le32(payload, q + 8 + 36)
                    found = true
                  }
                  q += (8 + csz + (csz & 1)).toInt
                }
              case "movi" =>
                var q = body + 4
                val mEnd = body + sz.toInt
                while (q + 8 <= mEnd) {
                  val cid = fourcc(payload, q); val csz = le32(payload, q + 4)
                  if (csz < 0 || q + 8 + csz > mEnd) { q = mEnd }
                  else {
                    if (cid.endsWith("dc") || cid.endsWith("db"))
                      frames += ((q + 8, csz.toInt))
                    q += (8 + csz + (csz & 1)).toInt
                  }
                }
              case _ => ()
            }
          case "idx1" => idx1N = sz / 16
          case _ => ()
        }
        p = body + (sz + (sz & 1)).toInt
      }
    }
    if (totalFrames < 0) None
    else Some(AviInfo(totalFrames, w, h, frames.toSeq, idx1N))
  }
}
