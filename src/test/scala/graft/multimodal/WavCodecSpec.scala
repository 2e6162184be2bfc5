package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import WavCodec._

/** PCM WAV codec: exact sample round-trips, a hand-written file with
  * extra RIFF chunks the walk must skip, rejection of non-PCM variants,
  * and decimation semantics. */
class WavCodecSpec extends AnyFunSuite {

  test("samples round-trip exactly, including negative and extreme values") {
    val s = Array[Short](0, 1, -1, 32767, -32768, 1001, -1001)
    val w = decode(encode(Wav(8000, s))).get
    assert(w.sampleRate == 8000)
    assert(w.samples.toSeq == s.toSeq)
  }

  test("chunk walk skips LIST chunks (with odd-length padding) before data") {
    val base = encode(Wav(44100, Array[Short](7, -7, 21)))
    // splice a 3-byte LIST chunk (padded to 4) between fmt and data
    val insertAt = 12 + 8 + 16 // RIFF header + fmt chunk
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'x', 'y', 'z', 0)
    val spliced = base.take(insertAt) ++ list ++ base.drop(insertAt)
    val w = decode(spliced).get
    assert(w.sampleRate == 44100 && w.samples.toSeq == Seq[Short](7, -7, 21))
  }

  test("non-PCM, stereo, 8-bit, and truncated inputs return None") {
    val ok = encode(Wav(8000, Array[Short](1, 2, 3)))
    assert(decode(ok.take(30)).isEmpty)
    assert(decode(ok.updated(20, 3.toByte)).isEmpty) // IEEE-float format
    assert(decode(ok.updated(22, 2.toByte)).isEmpty) // stereo
    assert(decode(ok.updated(34, 8.toByte)).isEmpty) // 8-bit
    assert(decode("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(decode(null).isEmpty)
  }

  test("decimate keeps every k-th sample and scales the rate") {
    val w = Wav(8000, Array.tabulate[Short](10)(i => i.toShort))
    val d = decimate(w, 3)
    assert(d.sampleRate == 2666)
    assert(d.samples.toSeq == Seq[Short](0, 3, 6, 9))
    assert(decimate(w, 1) eq w)
  }
}
