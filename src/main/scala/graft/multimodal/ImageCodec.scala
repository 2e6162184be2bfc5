package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Pure-JVM image container codec: REAL header parsing for the three
  * ubiquitous containers (PNG, GIF, JPEG) — no native libs, no new
  * dependencies — plus fixture encoders that emit structurally valid
  * files the decoder (or any standards-conforming reader) parses.
  *
  * This replaces the round-4 `decodeStub` seam for dimension decoding:
  * `decodeDimensions` reads the actual bytes the formats specify —
  * PNG's IHDR chunk (big-endian, after an 8-byte signature and a chunk
  * walk), GIF's logical screen descriptor (little-endian), and JPEG's
  * SOFn frame header (big-endian, found by walking variable-length
  * marker segments past APPn/COM). Pixel decode (inflate/DCT) remains
  * out of scope — the engine's contract is metadata extraction, and
  * that part is now real.
  *
  * The encoders exist so tests and oracle-checked queries have
  * deterministic fixtures: the payload body rides inside the container
  * (a private PNG chunk / GIF body bytes / JPEG COM segments), so the
  * byte-size overhead of each container is a closed-form constant the
  * DuckDB oracle can compute independently.
  */
object ImageCodec {

  final case class ImageDims(container: String, width: Int, height: Int)

  /** PNG (sig + IHDR + body chunk + IEND): 8 + 25 + (12 + len) + 12. */
  val PngOverhead: Int = 57
  /** GIF (header 6 + logical screen descriptor 7 + trailer 1). */
  val GifOverhead: Int = 14
  /** JPEG fixed part (SOI 2 + APP0 18 + SOF0 19 + EOI 2); each COM
    * segment wrapping ≤[[JpegComChunk]] body bytes adds 4 more. */
  val JpegFixedOverhead: Int = 41
  /** Max body bytes per JPEG COM segment (u16 length includes itself). */
  val JpegComChunk: Int = 65533

  // ---------------------------------------------------------------- decode

  /** Sniff the container by magic bytes and parse its dimensions.
    * Truncated or malformed headers → None, never a throw (decoders run
    * inside executors on untrusted payloads). */
  def decodeDimensions(bytes: Array[Byte]): Option[ImageDims] =
    if (bytes == null) None
    else if (hasPngSignature(bytes)) decodePng(bytes)
    else if (hasGifSignature(bytes)) decodeGif(bytes)
    else if (hasJpegSignature(bytes)) decodeJpeg(bytes)
    else if (hasBmpSignature(bytes)) decodeBmpDims(bytes)
    else None

  private def hasPngSignature(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a

  private def hasGifSignature(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def hasJpegSignature(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  private def u32be(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** Chunk walk per the PNG spec (length, type, data, CRC) until IHDR —
    * the spec puts IHDR first, but walking tolerates nonstandard writers
    * and proves the offsets aren't hardcoded. */
  private def decodePng(b: Array[Byte]): Option[ImageDims] = {
    var pos = 8
    var guard = 0
    while (pos + 8 <= b.length && guard < 64) {
      val len = u32be(b, pos)
      val tpe = new String(b, pos + 4, 4, "US-ASCII")
      if (tpe == "IHDR") {
        if (len < 8 || pos + 16 > b.length) return None
        val w = u32be(b, pos + 8)
        val h = u32be(b, pos + 12)
        return if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some(ImageDims("png", w.toInt, h.toInt))
        else None
      }
      if (len > Int.MaxValue - 12) return None
      pos += 12 + len.toInt
      guard += 1
    }
    None
  }

  /** GIF87a/89a logical screen descriptor: u16 little-endian at 6/8. */
  private def decodeGif(b: Array[Byte]): Option[ImageDims] =
    if (b.length < 10) None
    else {
      val w = u16le(b, 6)
      val h = u16le(b, 8)
      if (w > 0 && h > 0) Some(ImageDims("gif", w, h)) else None
    }

  /** Marker-segment walk: skip APPn/COM/DQT/… by their u16 lengths until
    * a start-of-frame marker (SOF0-15 minus DHT/JPG/DAC), whose payload
    * is precision(1), height(2), width(2) big-endian. */
  private def decodeJpeg(b: Array[Byte]): Option[ImageDims] = {
    var pos = 2
    while (pos + 4 <= b.length) {
      // resync: fill bytes 0xFF may pad between segments
      if (b(pos) != 0xff.toByte) return None
      var m = pos + 1
      while (m < b.length && b(m) == 0xff.toByte) m += 1
      if (m >= b.length) return None
      val marker = u8(b, m)
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no SOF seen
      if (marker >= 0xd0 && marker <= 0xd8) { pos = m + 1 } // RSTn/SOI: bare
      else {
        if (m + 3 > b.length) return None
        val len = u16be(b, m + 1)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (m + 8 > b.length || len < 7) return None
          val h = u16be(b, m + 4)
          val w = u16be(b, m + 6)
          return if (w > 0 && h > 0) Some(ImageDims("jpeg", w, h)) else None
        }
        pos = m + 1 + len
      }
    }
    None
  }

  // ------------------------------------------------------------------ bmp

  /** A decoded 24-bit bitmap: `pixels` is top-down row-major BGR,
    * length = width × height × 3. */
  final case class Bitmap(width: Int, height: Int, pixels: Array[Byte])

  private def hasBmpSignature(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  private def u32le(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private def s32le(b: Array[Byte], i: Int): Int = u32le(b, i).toInt

  private def bmpStride(width: Int): Int = (width * 3 + 3) & ~3

  private def decodeBmpDims(b: Array[Byte]): Option[ImageDims] =
    if (b.length < 26) None
    else {
      val w = s32le(b, 18)
      val h = math.abs(s32le(b, 22)) // negative height = top-down layout
      if (w > 0 && h > 0) Some(ImageDims("bmp", w, h)) else None
    }

  /** FULL pixel decode — BMP (BITMAPINFOHEADER, 24-bit, uncompressed) is
    * the one ubiquitous raster format whose pixels need no inflate/DCT, so
    * this is a complete in-JVM decoder, not a header parse: validates
    * magic/bpp/compression, honors the header's data offset, de-pads the
    * 4-byte-aligned rows, and flips bottom-up storage to top-down order.
    * Malformed input → None, never a throw (executors, untrusted bytes). */
  def decodeBmp(b: Array[Byte]): Option[Bitmap] = {
    if (!hasBmpSignature(b) || b.length < 54) return None
    val dataOffset = u32le(b, 10)
    val width = s32le(b, 18)
    val rawHeight = s32le(b, 22)
    val planes = u16le(b, 26)
    val bpp = u16le(b, 28)
    val compression = u32le(b, 30)
    val height = math.abs(rawHeight)
    if (width <= 0 || height <= 0 || planes != 1 || bpp != 24 ||
      compression != 0L) return None
    if (width.toLong * height * 3 > Int.MaxValue - 64) return None
    val stride = bmpStride(width)
    if (dataOffset < 54 || dataOffset + stride.toLong * height > b.length)
      return None
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      // positive height = rows stored bottom-up per the spec
      val srcRow = if (rawHeight > 0) height - 1 - y else y
      System.arraycopy(b, dataOffset.toInt + srcRow * stride,
        out, y * width * 3, width * 3)
      y += 1
    }
    Some(Bitmap(width, height, out))
  }

  /** 24-bit uncompressed BMP from top-down BGR pixels: 14-byte file
    * header + 40-byte BITMAPINFOHEADER + bottom-up rows padded to 4-byte
    * stride — readable by any image viewer, not just [[decodeBmp]]. */
  def encodeBmp(bm: Bitmap): Array[Byte] = {
    val Bitmap(width, height, pixels) = bm
    require(width >= 1 && height >= 1, s"bad dims ${width}x$height")
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != ${width}x${height}x3")
    val stride = bmpStride(width)
    val dataSize = stride * height
    val out = new ByteArrayOutputStream(54 + dataSize)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    out.write('B'); out.write('M')
    u32(54L + dataSize); u32(0L); u32(54L)
    u32(40L); u32(width.toLong); u32(height.toLong) // positive: bottom-up
    u16(1); u16(24); u32(0L); u32(dataSize.toLong)
    u32(2835L); u32(2835L); u32(0L); u32(0L) // 72 dpi, default palette
    val pad = new Array[Byte](stride - width * 3)
    var y = height - 1
    while (y >= 0) {
      out.write(pixels, y * width * 3, width * 3)
      out.write(pad, 0, pad.length)
      y -= 1
    }
    out.toByteArray
  }

  /** Nearest-neighbor resample (the standard srcX = ⌊dstX·srcW/dstW⌋
    * mapping) — O(dstW·dstH), allocation-exact, identity when dimensions
    * are unchanged. */
  def resizeNearest(bm: Bitmap, dstW: Int, dstH: Int): Bitmap = {
    require(dstW >= 1 && dstH >= 1, s"bad target ${dstW}x$dstH")
    if (dstW == bm.width && dstH == bm.height) bm
    else {
      val out = new Array[Byte](dstW * dstH * 3)
      var y = 0
      while (y < dstH) {
        val sy = (y.toLong * bm.height / dstH).toInt
        var x = 0
        while (x < dstW) {
          val sx = (x.toLong * bm.width / dstW).toInt
          System.arraycopy(bm.pixels, (sy * bm.width + sx) * 3,
            out, (y * dstW + x) * 3, 3)
          x += 1
        }
        y += 1
      }
      Bitmap(dstW, dstH, out)
    }
  }

  // ---------------------------------------------------------------- encode

  private def requireU16(v: Int, what: String): Unit =
    require(v >= 1 && v <= 0xffff, s"$what must be in [1, 65535], got $v")

  /** Structurally valid PNG: signature, IHDR (8-bit RGBA, correct CRC32),
    * the body in a private ancillary `grFt` chunk, IEND. Any chunk-walking
    * reader parses it; pixel data is deliberately absent (the body is an
    * opaque payload carrier, not scanlines). */
  def encodePng(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims ${width}x$height")
    val out = new ByteArrayOutputStream(PngOverhead + body.length)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new ByteArrayOutputStream(13)
    writeU32be(ihdr, width.toLong)
    writeU32be(ihdr, height.toLong)
    ihdr.write(8); ihdr.write(6); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    writeChunk(out, "IHDR", ihdr.toByteArray)
    writeChunk(out, "grFt", body)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeU32be(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  private def writeChunk(out: ByteArrayOutputStream, tpe: String,
      data: Array[Byte]): Unit = {
    writeU32be(out, data.length.toLong)
    val tb = tpe.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    writeU32be(out, crc.getValue)
  }

  /** GIF89a header + logical screen descriptor (no global color table),
    * body bytes, trailer. */
  def encodeGif(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    requireU16(width, "gif width"); requireU16(height, "gif height")
    val out = new ByteArrayOutputStream(GifOverhead + body.length)
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0); out.write(0); out.write(0) // no GCT, bg 0, 1:1 aspect
    out.write(body, 0, body.length)
    out.write(0x3b)
    out.toByteArray
  }

  /** JPEG: SOI, JFIF APP0, the body in COM segment(s) (so the decoder's
    * marker walk has real variable-length segments to skip), a 3-component
    * baseline SOF0 carrying the dimensions, EOI. */
  def encodeJpeg(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    requireU16(width, "jpeg width"); requireU16(height, "jpeg height")
    val nCom = if (body.isEmpty) 0 else (body.length + JpegComChunk - 1) / JpegComChunk
    val out = new ByteArrayOutputStream(JpegFixedOverhead + 4 * nCom + body.length)
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    out.write(0); out.write(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0) // density units: none
    out.write(0); out.write(1); out.write(0); out.write(1) // 1x1 density
    out.write(0); out.write(0) // no thumbnail
    var off = 0
    while (off < body.length) {
      val n = math.min(JpegComChunk, body.length - off)
      out.write(0xff); out.write(0xfe) // COM
      out.write(((n + 2) >> 8) & 0xff); out.write((n + 2) & 0xff)
      out.write(body, off, n)
      off += n
    }
    out.write(0xff); out.write(0xc0) // SOF0, 3 components → length 17
    out.write(0); out.write(17)
    out.write(8) // precision
    out.write((height >> 8) & 0xff); out.write(height & 0xff)
    out.write((width >> 8) & 0xff); out.write(width & 0xff)
    out.write(3)
    var c = 1
    while (c <= 3) { out.write(c); out.write(0x11); out.write(0); c += 1 }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
