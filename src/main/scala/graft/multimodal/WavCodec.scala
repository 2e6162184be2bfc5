package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM WAV (RIFF) codec for 16-bit PCM mono — the audio sibling of
  * the BMP path in [[ImageCodec]]: PCM needs no codec library, so decode,
  * transform, and re-encode are fully real. The decoder does a proper
  * RIFF chunk walk (fmt then data, skipping unknown chunks like LIST or
  * fact), validates the PCM/mono/16-bit contract, and returns None on
  * anything malformed — executors see untrusted bytes.
  *
  * Cited shape: the reference pipeline has no audio surface
  * (ziaArzoo/Big-Data-Pipeline is tabular); this exists for the
  * multimodal-column extension where audio payloads ride as opaque
  * binaries with typed, verifiable transforms. */
object WavCodec {

  /** Decoded mono PCM: 16-bit signed samples at `sampleRate` Hz. */
  final case class Wav(sampleRate: Int, samples: Array[Short])

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xff).toLong | ((b(i + 1) & 0xff).toLong << 8) |
      ((b(i + 2) & 0xff).toLong << 16) | ((b(i + 3) & 0xff).toLong << 24)

  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""

  /** RIFF chunk walk: validate RIFF/WAVE, find `fmt ` (PCM=1, mono,
    * 16-bit) and `data`, tolerate and skip any other chunks, honor the
    * spec's odd-size pad byte. */
  def decode(b: Array[Byte]): Option[Wav] = {
    if (b == null || b.length < 44) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var pos = 12
    var rate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= b.length && (rate < 0 || samples == null)) {
      val id = tag(b, pos)
      val len = u32le(b, pos + 4)
      if (len > Int.MaxValue - 8 || pos + 8 + len > b.length) return None
      val body = pos + 8
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = u16le(b, body)
          val channels = u16le(b, body + 2)
          val bits = u16le(b, body + 14)
          if (audioFormat != 1 || channels != 1 || bits != 16) return None
          rate = u32le(b, body + 4).toInt
          if (rate <= 0) return None
        case "data" =>
          if (len % 2 != 0) return None
          val n = (len / 2).toInt
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = u16le(b, body + 2 * i).toShort
            i += 1
          }
          samples = out
        case _ => () // LIST, fact, cue …: skip
      }
      pos = body + len.toInt + (len.toInt & 1) // chunks pad to even sizes
    }
    if (rate > 0 && samples != null) Some(Wav(rate, samples)) else None
  }

  /** Canonical 44-byte-header WAV: RIFF size, WAVE, PCM fmt, data. */
  def encode(w: Wav): Array[Byte] = {
    require(w.sampleRate > 0, s"bad sample rate ${w.sampleRate}")
    val dataLen = w.samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(1) // PCM, mono
    w32(w.sampleRate.toLong)
    w32(w.sampleRate.toLong * 2) // byte rate = rate * block align
    w16(2); w16(16) // block align, bits
    out.write("data".getBytes("US-ASCII")); w32(dataLen.toLong)
    var i = 0
    while (i < w.samples.length) { w16(w.samples(i) & 0xffff); i += 1 }
    out.toByteArray
  }

  /** Keep every `k`-th sample (the trivial correct downsampler when the
    * signal is already band-limited; a production path would low-pass
    * first — that filter slots here without changing any plumbing). */
  def decimate(w: Wav, k: Int): Wav = {
    require(k >= 1, s"bad decimation factor $k")
    if (k == 1) w
    else {
      val n = (w.samples.length + k - 1) / k
      val out = new Array[Short](n)
      var i = 0
      while (i < n) { out(i) = w.samples(i * k); i += 1 }
      Wav(math.max(1, w.sampleRate / k), out)
    }
  }
}
