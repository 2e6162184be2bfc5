package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * payloads with typed metadata, and run decode / feature-extract /
  * frame-sample as distributed per-partition operators.
  *
  * Image container decode is REAL: [[decode]] parses PNG/GIF/JPEG/BMP
  * headers from the payload bytes via [[ImageCodec.decodeDimensions]]
  * (pure JVM, no native libs). Pixel-level work is REAL for 24-bit BMP —
  * [[resizeBmp]] decodes, nearest-neighbor resamples, and re-encodes
  * actual bitmaps (oracle-checked end-to-end by q89) — and stays a
  * stubbed seam only for compressed formats ([[resizeStub]]: inflate/DCT
  * need codec libs this container lacks; swapping a real pixel decoder
  * in changes no plumbing).
  *
  * 100 TB posture: payloads never leave their partition (mapPartitions, no
  * shuffle); metadata-only queries prune the payload column out of the scan.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, format: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
      mean_byte: Double, head_hash: Long, n_frames: Int,
      container: Option[String], width: Option[Int], height: Option[Int])

  /** Build a media table from `documents` (the container ships no binary
    * fixtures): payload = utf-8 bytes of the text, format assigned
    * deterministically. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "img")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("format"),
      encode(col("text"), "utf-8").as("payload"))

  /** Decoder: container dimensions are parsed FOR REAL from the payload
    * header ([[ImageCodec.decodeDimensions]] — PNG IHDR chunk walk, GIF
    * logical screen descriptor, JPEG SOF marker walk); non-image payloads
    * get None. The byte stats (mean/head-hash/frame count) are format-
    * agnostic and remain the deterministic plumbing contract. Runs
    * per-partition with no shuffle; a real pixel decoder would init once
    * per partition here. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup cost happens once (pixel-decoder init in a
      // full implementation)
      rows.map { r =>
        val bytes = r.payload
        val mean =
          if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length
        val head = bytes.take(8).foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
        val dims = ImageCodec.decodeDimensions(bytes)
        MediaFeatures(r.doc_id, r.format, bytes.length.toLong, mean, head,
          frameCount(bytes.length, 16),
          dims.map(_.container), dims.map(_.width), dims.map(_.height))
      }
    }
  }

  case class ResizedMedia(doc_id: Long, format: String, width: Int,
      height: Int, payload: Array[Byte])

  /** Stubbed resize: a real implementation would decode, scale to
    * (width × height), and re-encode per partition. The stub keeps the
    * metadata contract exact and deterministically subsamples the payload
    * bytes to the target "pixel" budget, so downstream size accounting and
    * partition shapes are real. */
  def resizeStub(media: Dataset[MediaRow], width: Int, height: Int)
      : Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    val budget = width * height
    media.mapPartitions { rows =>
      rows.map { r =>
        val in = r.payload
        val out =
          if (in.length <= budget) in
          else Array.tabulate(budget)(i =>
            in((i.toLong * in.length / budget).toInt))
        ResizedMedia(r.doc_id, r.format, width, height, out)
      }
    }
  }

  /** REAL image resize — decode, nearest-neighbor resample, re-encode —
    * for the one ubiquitous format whose pixels need no native codec
    * (24-bit uncompressed BMP; see [[ImageCodec.decodeBmp]]). This is the
    * operator [[resizeStub]] stubbed for compressed formats: same
    * signature family, same mapPartitions shape (payloads never shuffle,
    * decoder state initializes once per partition), but the bytes out are
    * an actual resampled image any viewer opens. Rows whose payload is
    * not a decodable BMP come back with width = height = 0 and their
    * payload untouched — decode failures on untrusted data are data, not
    * exceptions. */
  def resizeBmp(media: Dataset[MediaRow], width: Int, height: Int)
      : Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        ImageCodec.decodeBmp(r.payload) match {
          case Some(bm) =>
            val resized = ImageCodec.resizeNearest(bm, width, height)
            ResizedMedia(r.doc_id, r.format, width, height,
              ImageCodec.encodeBmp(resized))
          case None =>
            ResizedMedia(r.doc_id, r.format, 0, 0, r.payload)
        }
      }
    }
  }

  /** Deterministic BMP fixture pixel: channel `c` of (x, y) in doc `id`.
    * Closed-form, so resize results are independently checkable. */
  def bmpPixel(id: Long, width: Int, x: Int, y: Int, c: Int): Byte =
    ((id * 31 + (y.toLong * width + x) * 3 + c) % 251).toByte

  /** Deterministic 24-bit BMP table from `documents`: dims derive from
    * doc_id (`% 62 + 2` × `% 46 + 2`), pixels from [[bmpPixel]] — real
    * decodable bitmaps, generated per-row with no shuffle. */
  def bmpTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    // adaptive fan-out (r20, guide §2.5): the id column is the ONLY
    // thing exchanged — payload synthesis + every downstream decode
    // then runs at full parallelism even off a one-row-group fixture
    // file; at production split counts the branch is a no-op.
    graft.operators.ReadParallelism
      .fanOut(docs.select(col("doc_id")), col("doc_id"))
      .as[Long].map { id =>
      val w = (Math.floorMod(id, 62L) + 2).toInt
      val h = (Math.floorMod(id, 46L) + 2).toInt
      val px = new Array[Byte](w * h * 3)
      var i = 0
      while (i < px.length) {
        px(i) = ((id * 31 + i) % 251).toByte
        i += 1
      }
      MediaRow(id, "bmp", ImageCodec.encodeBmp(ImageCodec.Bitmap(w, h, px)))
    }
  }

  /** Deterministic WAV fixture sample `i` of doc `id`: closed-form, range
    * ±1001 (fits s16), so audio transforms are independently checkable. */
  def wavSample(id: Long, i: Int): Short =
    (((id * 7 + 13L * i) % 2003) - 1001).toShort

  /** Deterministic 16-bit PCM mono WAV table from `documents`:
    * `doc_id % 500 + 50` samples at 8 kHz, waveform from [[wavSample]]. */
  def wavTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    // adaptive fan-out (r20): see bmpTable — ids only, decode parallel.
    graft.operators.ReadParallelism
      .fanOut(docs.select(col("doc_id")), col("doc_id"))
      .as[Long].map { id =>
      val n = (Math.floorMod(id, 500L) + 50).toInt
      val s = Array.tabulate(n)(i => wavSample(id, i))
      MediaRow(id, "wav", WavCodec.encode(WavCodec.Wav(8000, s)))
    }
  }

  case class AudioStats(doc_id: Long, n_samples: Long, peak: Long,
      sum_abs: Long, ds_rate: Long, ds_sum_abs: Long)

  /** REAL audio pipeline — decode PCM, integer signal stats, 2× decimate,
    * re-encode, decode AGAIN and re-measure — the audio twin of
    * [[resizeBmp]] (mapPartitions, payloads never shuffle). All outputs
    * are integers (counts, peak, sums of |sample|), so the q90 oracle can
    * replay the fixture formula exactly. Undecodable payloads yield the
    * -1 sentinel row rather than a throw. */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        WavCodec.decode(r.payload) match {
          case Some(w) =>
            var peak = 0L; var sumAbs = 0L
            for (s <- w.samples) {
              val a = math.abs(s.toLong)
              if (a > peak) peak = a
              sumAbs += a
            }
            // decimate → bytes → decode: the re-encoded container must
            // itself be a valid WAV, not just an in-memory array
            val ds = WavCodec.decode(
              WavCodec.encode(WavCodec.decimate(w, 2))).get
            val dsSum = ds.samples.foldLeft(0L)((a, s) => a + math.abs(s.toLong))
            AudioStats(r.doc_id, w.samples.length.toLong, peak, sumAbs,
              ds.sampleRate.toLong, dsSum)
          case None => AudioStats(r.doc_id, -1L, -1L, -1L, -1L, -1L)
        }
      }
    }
  }

  case class AutocorrStats(doc_id: Long, n_samples: Long, energy: Long,
      r_lag: Long)

  /** Lag-L raw autocorrelation over REAL decoded PCM — the periodicity
    * primitive under every pitch detector and voiced/unvoiced splitter:
    * energy R(0) = Σ s_i² and R(L) = Σ_{i+L<n} s_i·s_{i+L}, both EXACT
    * int64 (s16 products ≤ 2³⁰, fixture docs are ≤ 549 samples; even
    * hour-long 48 kHz audio stays < 2⁵⁸). Same mapPartitions discipline
    * as [[audioStats]] — payloads never shuffle, per-row state is two
    * accumulators. Undecodable payloads yield the -1 sentinel row. */
  def autocorrStats(media: Dataset[MediaRow], lag: Int)
      : Dataset[AutocorrStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        WavCodec.decode(r.payload) match {
          case Some(w) =>
            val s = w.samples
            var en = 0L; var rl = 0L; var i = 0
            while (i < s.length) {
              val v = s(i).toLong
              en += v * v
              if (i + lag < s.length) rl += v * s(i + lag).toLong
              i += 1
            }
            AutocorrStats(r.doc_id, s.length.toLong, en, rl)
          case None => AutocorrStats(r.doc_id, -1L, -1L, -1L)
        }
      }
    }
  }

  case class FrameBands(doc_id: Long, frame: Long, e0: Long, e1: Long,
      e2: Long, e3: Long)

  /** Per-frame band-energy profile over REAL decoded PCM — the landmark
    * primitive under acoustic fingerprinting (Haitsma–Kalker / Shazam
    * class): the signal frames into complete `frameLen`-sample windows
    * and each frame reports four exact-integer sub-band energies
    * (Σ|sample| over the four frameLen/4-sample blocks — abs-sum, not
    * squares, so values stay small and the oracle's replay is pure
    * int64). Incomplete tail frames are dropped (a fingerprint hashes
    * only full windows). Same mapPartitions discipline as
    * [[audioStats]] — payloads never shuffle; per-row output is
    * n/frameLen small rows. Undecodable payloads yield no rows (a
    * fingerprint pass skips what it cannot decode; the fixture is
    * always decodable and q90's sentinel row covers the decode-failure
    * surface). */
  def frameBandEnergies(media: Dataset[MediaRow], frameLen: Int)
      : Dataset[FrameBands] = {
    import media.sparkSession.implicits._
    val sub = frameLen / 4
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        WavCodec.decode(r.payload) match {
          case Some(w) =>
            val s = w.samples
            val nf = s.length / frameLen
            (0 until nf).iterator.map { f =>
              val e = new Array[Long](4)
              var j = 0
              while (j < frameLen) {
                e((j / sub).min(3)) += math.abs(s(f * frameLen + j).toLong)
                j += 1
              }
              FrameBands(r.doc_id, f.toLong, e(0), e(1), e(2), e(3))
            }
          case None => Iterator.empty
        }
      }
    }
  }

  case class PixelBlockFeature(doc_id: Long, f: Array[Long], byte_sum: Long)

  /** Block-intensity feature over REAL decoded BMP pixels — the
    * image-side embedding primitive under the q384 cross-modal audit
    * (the image analogue of [[frameBandEnergies]]'s landmark profile):
    * the decoded byte stream (length L = w·h·3, top-down BGR) partitions
    * into `dims` contiguous blocks (byte i → block ⌊i·dims/L⌋ — the same
    * integer lattice an oracle replays without touching bytes), and
    * block k reports the EXACT int64 sum of CENTERED intensities
    * Σ (byte − 125). Centering matters: the fixture's bytes are
    * near-uniform in 0..250, so uncentered block sums are dominated by
    * the shared mean and every image's feature is nearly parallel to the
    * all-ones vector — embedding nothing; the centered profile captures
    * each image's deviation phase. Blocks past a short payload (L <
    * dims) stay exactly zero. `byte_sum` is the raw total Σ byte — the
    * scalar intensity mass q384 derives its perturbation strength from.
    * Same mapPartitions discipline as [[resizeBmp]]: payloads never
    * shuffle, per-row state is the dims-length accumulator, undecodable
    * payloads yield no rows. */
  def blockFeatures(media: Dataset[MediaRow], dims: Int)
      : Dataset[PixelBlockFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        ImageCodec.decodeBmp(r.payload) match {
          case Some(bm) =>
            val px = bm.pixels
            val n = px.length
            val f = new Array[Long](dims)
            var s = 0L
            var i = 0
            while (i < n) {
              val b = px(i) & 0xff
              f((i.toLong * dims / n).toInt) += b - 125L
              s += b
              i += 1
            }
            Iterator.single(PixelBlockFeature(r.doc_id, f, s))
          case None => Iterator.empty
        }
      }
    }
  }

  /** Deterministic video fixture sample `i` of doc `id`: closed-form,
    * range 0..1998 (fits u16), so frame transforms are independently
    * checkable — the video twin of [[wavSample]]. The modulus (1999,
    * prime) sets the residue-lattice density of true frame alignments;
    * see q386's adjudication. */
  def vidSample(id: Long, i: Int): Int =
    ((id * 5 + 7L * i) % 1999).toInt

  /** Deterministic "video" table from `documents`: each video-format
    * doc carries `doc_id % 40 + 5` frames of 8 little-endian u16
    * samples ([[vidSample]] — 16 bytes per frame), packed as the DATA
    * section of a REAL GIF container ([[ImageCodec.encodeGif]]: magic +
    * logical screen descriptor + body + trailer), dims from the bmp
    * fixture's formulas. The container is decodable by [[decode]]'s
    * header walk like every other imageTable payload; the frame walk
    * ([[videoFrameProfiles]]) strips it for real. Per-row encode, no
    * shuffle. */
  def videoTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    // adaptive fan-out (r20): see bmpTable — ids only, decode parallel.
    graft.operators.ReadParallelism
      .fanOut(docs.select(col("doc_id")), col("doc_id"))
      .as[Long].map { id =>
      val w = (Math.floorMod(id, 62L) + 2).toInt
      val h = (Math.floorMod(id, 46L) + 2).toInt
      val n = (Math.floorMod(id, 40L) + 5).toInt * 8
      val body = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = vidSample(id, i)
        body(2 * i) = (v & 0xff).toByte
        body(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      MediaRow(id, "gif", ImageCodec.encodeGif(w, h, body))
    }
  }

  /** Per-frame block-sum profile over a REAL GIF container walk — the
    * video landmark primitive under q386's multi-frame fingerprint (the
    * video twin of [[frameBandEnergies]], on the q60 frame-sampling
    * path): validate the GIF89a magic and trailer, strip the 13-byte
    * header (magic + logical screen descriptor — the bytes
    * [[ImageCodec.decodeDimensions]] parses) and the 0x3b trailer,
    * decode the data section as little-endian u16 samples, frame into
    * complete 8-sample windows, and report four exact-integer 2-sample
    * block sums per frame. Incomplete tail frames are dropped (a
    * fingerprint hashes only full windows). Same mapPartitions
    * discipline as [[frameBandEnergies]]: payloads never shuffle;
    * payloads that are not well-formed GIFs yield no rows. */
  def videoFrameProfiles(media: Dataset[MediaRow]): Dataset[FrameBands] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.payload
        val okGif = b.length >= 14 &&
          b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && b(4) == '9' && b(5) == 'a' &&
          b(b.length - 1) == 0x3b
        if (!okGif) Iterator.empty
        else {
          val nSamples = (b.length - 14) / 2
          val nf = nSamples / 8
          (0 until nf).iterator.map { f =>
            val e = new Array[Long](4)
            var j = 0
            while (j < 8) {
              val off = 13 + 2 * (f * 8 + j)
              val v = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
              e(j / 2) += v
              j += 1
            }
            FrameBands(r.doc_id, f.toLong, e(0), e(1), e(2), e(3))
          }
        }
      }
    }
  }

  case class SilenceStats(doc_id: Long, n_samples: Long, n_silent: Long,
      n_runs: Long, longest_run: Long)

  /** Silence-segment detection over REAL decoded PCM — the
    * voice-activity-style segmentation a speech-data pipeline runs before
    * chunking audio for training (drop silence, split on pauses). A
    * sample is silent iff |amplitude| < threshold; consecutive silent
    * samples form one run. The run-length scan is a single O(n) pass over
    * each doc's decoded samples inside mapPartitions — payloads never
    * shuffle, state is three counters — the imperative twin of the SQL
    * gaps-and-islands formulation the oracle replays. Undecodable
    * payloads yield the -1 sentinel row. */
  def silenceStats(media: Dataset[MediaRow], threshold: Int)
      : Dataset[SilenceStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        WavCodec.decode(r.payload) match {
          case Some(w) =>
            var nSil = 0L; var runs = 0L; var longest = 0L; var cur = 0L
            for (s <- w.samples) {
              if (math.abs(s.toInt) < threshold) {
                cur += 1; nSil += 1
                if (cur == 1L) runs += 1
                if (cur > longest) longest = cur
              } else cur = 0L
            }
            SilenceStats(r.doc_id, w.samples.length.toLong, nSil, runs,
              longest)
          case None => SilenceStats(r.doc_id, -1L, -1L, -1L, -1L)
        }
      }
    }
  }

  /** Frame sampling: how many fixed-stride frames a payload yields. */
  def frameCount(nBytes: Long, stride: Long): Int =
    if (nBytes <= 0) 0 else (((nBytes - 1) / stride) + 1).toInt

  /** Frame-sample operator: split the payload into `stride`-byte frames and
    * keep every `every`-th one — array column, no shuffle. Empty payloads
    * yield an empty frame array (consistent with frameCount). */
  def frameSample(media: DataFrame, stride: Int, every: Int): DataFrame =
    media.withColumn("frames",
      expr(s"CASE WHEN length(payload) = 0 THEN CAST(array() AS ARRAY<BINARY>) ELSE " +
        s"filter(transform(sequence(0, int((length(payload) - 1) / $stride)), " +
        s"i -> substring(payload, i * $stride + 1, $stride)), " +
        s"(f, i) -> i % $every = 0) END"))

  def mediaDataset(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    mediaTable(docs).as[MediaRow]
  }

  /** Deterministic image-fixture table from `documents` (the container
    * ships no binary fixtures): each doc's text rides inside a REAL
    * PNG/GIF/JPEG container (round-robin by doc_id) whose declared
    * dimensions derive from doc_id — `(doc_id % 640 + 1) x
    * (doc_id % 480 + 1)` — so [[decode]]'s header parse is independently
    * checkable by an oracle that computes the same formulas without ever
    * touching the bytes. Per-row encode, no shuffle. */
  def imageTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val w = (Math.floorMod(id, 640L) + 1).toInt
        val h = (Math.floorMod(id, 480L) + 1).toInt
        val body = Option(text).getOrElse("").getBytes("UTF-8")
        Math.floorMod(id, 3L) match {
          case 0L => MediaRow(id, "png", ImageCodec.encodePng(w, h, body))
          case 1L => MediaRow(id, "gif", ImageCodec.encodeGif(w, h, body))
          case _  => MediaRow(id, "jpeg", ImageCodec.encodeJpeg(w, h, body))
        }
    }
  }
}
