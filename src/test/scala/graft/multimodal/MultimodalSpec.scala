package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def docsDf = Seq(
    (0L, "hello world"), (1L, "abc"), (2L, "x" * 40)
  ).toDF("doc_id", "text")

  test("mediaTable: binary payload + deterministic format assignment") {
    val m = MultimodalOps.mediaTable(docsDf).orderBy("doc_id").collect()
    assert(m.map(_.getString(1)).toSeq == Seq("img", "audio", "video"))
    assert(new String(m(0).getAs[Array[Byte]](2), "UTF-8") == "hello world")
  }

  test("decode: byte stats deterministic; non-image payloads → no dims") {
    val ds = MultimodalOps.mediaDataset(spark, docsDf)
    val feats = MultimodalOps.decode(ds).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 3)
    assert(math.abs(feats(1L).mean_byte - ('a' + 'b' + 'c') / 3.0) < 1e-12)
    assert(feats(2L).n_frames == MultimodalOps.frameCount(40, 16))
    // utf-8 text payloads are not image containers
    assert(feats.values.forall(f =>
      f.container.isEmpty && f.width.isEmpty && f.height.isEmpty))
    // re-run must produce identical features (decode is pure)
    val again = MultimodalOps.decode(ds).collect()
      .map(f => f.doc_id -> f).toMap
    assert(again == feats)
  }

  test("decode parses REAL container headers from imageTable fixtures") {
    val feats = MultimodalOps
      .decode(MultimodalOps.imageTable(spark, docsDf))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(0L).container.contains("png"))
    assert(feats(1L).container.contains("gif"))
    assert(feats(2L).container.contains("jpeg"))
    for (id <- 0L to 2L) {
      assert(feats(id).width.contains((id % 640 + 1).toInt))
      assert(feats(id).height.contains((id % 480 + 1).toInt))
    }
    // byte accounting matches the closed-form container overheads
    assert(feats(0L).n_bytes == "hello world".length + ImageCodec.PngOverhead)
    assert(feats(1L).n_bytes == 3 + ImageCodec.GifOverhead)
    assert(feats(2L).n_bytes ==
      40 + ImageCodec.JpegFixedOverhead + 4) // one COM segment
  }

  test("frameSample splits payload into stride frames, keeps every k-th") {
    val sampled = MultimodalOps
      .frameSample(MultimodalOps.mediaTable(docsDf), stride = 16, every = 2)
      .filter(col("doc_id") === 2L)
      .select(size(col("frames"))).head().getInt(0)
    // 40 bytes / 16-byte stride = 3 frames, every 2nd → frames 0 and 2
    assert(sampled == 2)
  }

  test("resizeStub: payload bounded by pixel budget, metadata exact") {
    val ds = MultimodalOps.mediaDataset(spark, docsDf)
    val resized = MultimodalOps.resizeStub(ds, width = 4, height = 4)
      .collect().map(r => r.doc_id -> r).toMap
    // 40-byte payload subsampled to the 16-"pixel" budget
    assert(resized(2L).payload.length == 16)
    assert(resized(2L).width == 4 && resized(2L).height == 4)
    // payload already under budget passes through unchanged
    assert(new String(resized(1L).payload, "UTF-8") == "abc")
    // deterministic
    val again = MultimodalOps.resizeStub(ds, 4, 4).collect()
      .map(r => r.doc_id -> r.payload.toSeq).toMap
    assert(again == resized.map { case (k, v) => k -> v.payload.toSeq })
  }

  test("resizeBmp: REAL decode → resample → re-encode, checked by formula") {
    val docs = (0L until 20L).toDF("doc_id")
    val table = MultimodalOps.bmpTable(spark, docs)
    val out = MultimodalOps.resizeBmp(table, 8, 6).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out.size == 20)
    for ((id, r) <- out) {
      assert(r.width == 8 && r.height == 6)
      // output is itself a valid BMP of the target size
      val bm = ImageCodec.decodeBmp(r.payload).get
      assert(bm.width == 8 && bm.height == 6)
      // nearest-neighbor contract, independently computed: dst (x,y,c) =
      // fixture pixel at (⌊x·srcW/8⌋, ⌊y·srcH/6⌋, c)
      val srcW = (Math.floorMod(id, 62L) + 2).toInt
      val srcH = (Math.floorMod(id, 46L) + 2).toInt
      for (y <- Seq(0, 3, 5); x <- Seq(0, 4, 7); c <- 0 until 3) {
        val sx = (x.toLong * srcW / 8).toInt
        val sy = (y.toLong * srcH / 6).toInt
        assert(bm.pixels((y * 8 + x) * 3 + c) ==
          MultimodalOps.bmpPixel(id, srcW, sx, sy, c),
          s"doc $id pixel ($x,$y,$c)")
      }
    }
  }

  test("resizeBmp: undecodable payloads come back flagged, not thrown") {
    val junk = Seq(MultimodalOps.MediaRow(7L, "bmp", "not a bmp".getBytes))
      .toDS()
    val r = MultimodalOps.resizeBmp(junk, 4, 4).collect().head
    assert(r.width == 0 && r.height == 0)
    assert(new String(r.payload) == "not a bmp")
  }

  test("frameCount edge cases") {
    assert(MultimodalOps.frameCount(0, 16) == 0)
    assert(MultimodalOps.frameCount(16, 16) == 1)
    assert(MultimodalOps.frameCount(17, 16) == 2)
  }

  test("silenceStats: run boundaries, all/none silent, threshold exclusive") {
    def wav(s: Short*) =
      MultimodalOps.MediaRow(1L, "wav",
        WavCodec.encode(WavCodec.Wav(8000, s.toArray)))
    def stats(t: Int, s: Short*) =
      MultimodalOps.silenceStats(Seq(wav(s: _*)).toDS(), t).collect().head
    // runs split on a loud sample; |x| < t is strict (boundary is loud)
    val r = stats(100, 0, 50, -99, 500, 10, 100, -100, 5)
    assert(r.n_samples == 8 && r.n_silent == 5 &&
      r.n_runs == 3 && r.longest_run == 3)
    // all silent: one run spanning the doc
    val all = stats(2000, 1, -1, 0)
    assert(all.n_silent == 3 && all.n_runs == 1 && all.longest_run == 3)
    // none silent (threshold 0 can never match |x| < 0)
    val none = stats(0, 0, 1, -1)
    assert(none.n_silent == 0 && none.n_runs == 0 && none.longest_run == 0)
  }

  test("silenceStats: undecodable payloads yield sentinel rows, not throws") {
    val junk = Seq(MultimodalOps.MediaRow(9L, "wav", "not a wav".getBytes))
      .toDS()
    val r = MultimodalOps.silenceStats(junk, 100).collect().head
    assert(r.doc_id == 9L && r.n_samples == -1L && r.n_silent == -1L &&
      r.n_runs == -1L && r.longest_run == -1L)
  }

  test("frameBandEnergies: exact abs-sum band energies over complete " +
    "frames, tail samples dropped; undecodable payloads yield no rows") {
    val s = (0 until 37).map(i => ((i * 3) - 20).toShort) // 2 frames + 5
    val row = MultimodalOps.MediaRow(5L, "wav",
      WavCodec.encode(WavCodec.Wav(8000, s.toArray)))
    val got = MultimodalOps.frameBandEnergies(Seq(row).toDS(), 16)
      .collect().sortBy(_.frame)
    assert(got.length == 2, s"37 samples must yield 2 complete frames, " +
      s"got ${got.length}")
    def want(f: Int, b: Int): Long =
      (0 until 4).map(j => math.abs(s(f * 16 + b * 4 + j).toLong)).sum
    got.foreach { fb =>
      val f = fb.frame.toInt
      assert(Seq(fb.e0, fb.e1, fb.e2, fb.e3) ==
        Seq(want(f, 0), want(f, 1), want(f, 2), want(f, 3)),
        s"frame $f band energies diverge from the hand computation")
    }
    val junk = Seq(MultimodalOps.MediaRow(9L, "wav", "nope".getBytes))
      .toDS()
    assert(MultimodalOps.frameBandEnergies(junk, 16).count() == 0L,
      "a fingerprint pass must skip undecodable payloads, not row them")
  }

  test("q383: every reported alignment is real — recomputing the " +
    "closed-form landmarks at the reported offset reproduces n_aligned") {
    // the end-to-end fingerprint property: a (pair, t_offset, n_aligned)
    // row claims exactly n_aligned complete frames of doc_a match doc_b
    // landmark-for-landmark at that shift; recompute the band profiles
    // straight from wavSample's closed form (no codec, no hash — the
    // df upper gate cannot bite at this corpus and matched landmarks
    // satisfy df >= 2 by construction) and count equal profiles
    val rows = graft.SparkEntry
      .queries("q383_audio_fingerprint")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length > 100, s"fingerprint pair set collapsed: " +
      s"${rows.length} rows")
    def nf(id: Long): Int = ((id % 500 + 50) / 16).toInt
    def prof(id: Long, f: Long): Seq[Long] =
      (0 until 4).map(b => (0 until 4).map(j =>
        math.abs(((id * 7 + 13L * (f * 16 + b * 4 + j)) % 2003) - 1001))
        .sum)
    rows.take(25).foreach { r =>
      val (a, b, off, n) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      val matches = (0L until nf(a).toLong).count { f =>
        val fb = f + off
        fb >= 0 && fb < nf(b) && prof(a, f) == prof(b, fb)
      }
      assert(matches.toLong == n,
        s"pair ($a,$b) offset $off: recomputed $matches != reported $n")
      assert(n >= 3L, s"pair ($a,$b) under the 3-landmark floor")
    }
  }

  test("q385: every query's source recording surfaces with the full " +
    "excerpt aligned at its true position; ranks are contiguous and " +
    "alignment counts bounded by the excerpt length") {
    val rows = graft.SparkEntry
      .queries("q385_audio_snippet_lookup")(spark,
        "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 5, s"expected 5 query docs, got ${byQ.size}")
    byQ.foreach { case (q, hits) =>
      // the excerpt is frames 2..6 of the query doc itself, so the
      // source must surface with ALL 5 landmarks at offset exactly 2
      // (an acoustic true-duplicate may tie it — ties break to the
      // smaller doc id, which is honest retrieval, not a defect)
      assert(hits.exists { case (_, _, c, off, n) =>
        c == q && off == 2L && n == 5L },
        s"query $q: source recording missing from its own lookup: " +
          s"${hits.toSeq}")
      assert(hits.map(_._2).sorted.toSeq ==
        (1L to hits.length.toLong).toSeq,
        s"query $q: ranks not contiguous: ${hits.map(_._2).toSeq}")
      hits.foreach { case (_, _, _, _, n) =>
        assert(n >= 2L && n <= 5L,
          s"query $q: aligned count $n outside [2, excerpt length 5]")
      }
    }
  }

  test("q386: every reported video alignment is real — recomputing the " +
    "closed-form frame profiles at the reported offset reproduces " +
    "n_aligned, and every pair sits on the 5Δd ≡ 56Δf residue lattice") {
    val rows = graft.SparkEntry
      .queries("q386_video_fingerprint")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length > 100, s"video pair set collapsed: ${rows.length}")
    def nf(id: Long): Int = (id % 40 + 5).toInt
    def prof(id: Long, f: Long): Seq[Long] =
      (0 until 4).map(k => (0 until 2).map(j =>
        (id * 5 + 7L * (f * 8 + 2 * k + j)) % 1999).sum)
    rows.take(25).foreach { r =>
      val (a, b, off, n) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      // the lattice theory: block-sum equality at shift Δf forces
      // 5(a−b) ≡ 56·Δf (mod 1999) on this fixture (exact u16 sums, no
      // accidental collisions — an off-lattice pair means the walk or
      // the encode corrupted a byte)
      assert(Math.floorMod(5 * (a - b) - 56 * off, 1999L) == 0L,
        s"pair ($a,$b) offset $off is off the residue lattice")
      val matches = (0L until nf(a).toLong).count { f =>
        val fb = f + off
        fb >= 0 && fb < nf(b) && prof(a, f) == prof(b, fb)
      }
      assert(matches.toLong == n,
        s"pair ($a,$b) offset $off: recomputed $matches != reported $n")
      assert(n >= 3L, s"pair ($a,$b) under the 3-landmark floor")
    }
    // the temporal face must be exercised: a fingerprint family whose
    // every alignment is offset 0 is a whole-payload hash in disguise
    assert(rows.count(_.getLong(2) != 0L) > rows.length / 2,
      "video alignments collapsed to offset 0 — the temporal-shift " +
        "face is no longer exercised")
  }

  test("q388: every query's source video surfaces with the full clip " +
    "aligned at its true position; ranks are contiguous and alignment " +
    "counts bounded by the clip length") {
    val rows = graft.SparkEntry
      .queries("q388_video_snippet_lookup")(spark,
        "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 5, s"expected 5 query videos, got ${byQ.size}")
    byQ.foreach { case (q, hits) =>
      // the probe clip is frames 2..6 of the query video itself, so
      // the source must surface with ALL 5 landmarks at offset exactly
      // 2 (a temporal true-duplicate may tie it — ties break to the
      // smaller doc id, which is honest retrieval, not a defect); the
      // query set is drawn from the DECODED landmark table, so every
      // q here also proves eligibility (max frame >= 6) held
      assert(q % 3 == 2, s"query $q is not a video-format doc")
      assert(hits.exists { case (_, _, c, off, n) =>
        c == q && off == 2L && n == 5L },
        s"query $q: source video missing from its own lookup: " +
          s"${hits.toSeq}")
      assert(hits.map(_._2).sorted.toSeq ==
        (1L to hits.length.toLong).toSeq,
        s"query $q: ranks not contiguous: ${hits.map(_._2).toSeq}")
      hits.foreach { case (_, _, c, _, n) =>
        assert(c % 3 == 2, s"query $q: candidate $c not video-format")
        assert(n >= 2L && n <= 5L,
          s"query $q: aligned count $n outside [2, clip length 5]")
      }
    }
  }

  test("q389: the index-health census exactly re-aggregates both " +
    "landmark tables' closed forms cell for cell, and postings are " +
    "conserved per family") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    // closed-form posting tables: (family, doc, profile) — md5 equality
    // on the engine side is profile equality here
    def aProf(id: Long, f: Long): Seq[Long] =
      (0 until 4).map(b => (0 until 4).map(j =>
        math.abs(((id * 7 + 13L * (f * 16 + b * 4 + j)) % 2003) - 1001))
        .sum)
    def vProf(id: Long, f: Long): Seq[Long] =
      (0 until 4).map(k => (0 until 2).map(j =>
        (id * 5 + 7L * (f * 8 + 2 * k + j)) % 1999).sum)
    val post =
      docs.flatMap(d => (0L until (d % 500 + 50) / 16)
        .map(f => ("audio", d, aProf(d, f)))) ++
      docs.filter(_ % 3 == 2).flatMap(d => (0L until d % 40 + 5)
        .map(f => ("video", d, vProf(d, f))))
    val df = post.groupBy(p => (p._1, p._3)).map { case (k, ps) =>
      (k, ps.length.toLong) }
    val want = post.groupBy { case (fam, _, prof) =>
      val n = df((fam, prof))
      val status = if (n == 1) "singleton"
        else if (n <= 1000) "usable" else "hot_cut"
      // floor(log2(n)) via bit length — exact, no libm (the engines'
      // log2 is correctly rounded at powers of two; ln-ratio isn't)
      (fam, 63L - java.lang.Long.numberOfLeadingZeros(n), status)
    }.map { case ((fam, bucket, status), ps) =>
      val dfs = ps.map(p => df((p._1, p._3)))
      ((fam, bucket, status), (ps.map(_._3).distinct.length.toLong,
        ps.length.toLong, ps.map(_._2).distinct.length.toLong,
        dfs.min, dfs.max))
    }
    val got = graft.SparkEntry
      .queries("q389_fingerprint_index_health")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))).toMap
    assert(got == want, s"census diverges: got $got want $want")
    // postings conservation: every decoded frame is counted exactly once
    for (fam <- Seq("audio", "video"))
      assert(got.collect { case ((f, _, _), c) if f == fam => c._2 }.sum
        == post.count(_._1 == fam).toLong,
        s"$fam postings not conserved")
    // the census only reads if the gate classes actually separate: this
    // corpus is small enough to carry singletons AND dense enough on
    // the residue lattice to carry matchable mass
    for (st <- Seq("singleton", "usable"))
      assert(got.keys.exists(_._3 == st),
        s"no '$st' cell on this fixture — the status face collapsed")
  }

  test("q390: the tri-modal census exactly re-aggregates the three " +
    "pair tables' doc endpoints and partitions the corpus; the audio " +
    "modality catches docs the other two miss") {
    val sf = "/root/testdata/sf0.001"
    def endpoints(q: String): Set[Long] =
      graft.SparkEntry.queries(q)(spark, sf).collect()
        .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val t = endpoints("q41_dedup_jaccard")
    val i = endpoints("q162_image_ahash_pairs")
    val a = endpoints("q383_audio_fingerprint")
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.groupBy { d =>
      val tags = Seq(if (t(d)) Some("text") else None,
        if (i(d)) Some("image") else None,
        if (a(d)) Some("audio") else None).flatten
      if (tags.isEmpty) "neither" else tags.mkString("+")
    }.map { case (k, ds) => (k, (ds.size.toLong, ds.min, ds.max)) }
    val got = graft.SparkEntry
      .queries("q390_trimodal_dedup_census")(spark, sf)
      .collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want, s"census diverges: got $got want $want")
    assert(got.values.map(_._1).sum == docs.size.toLong,
      "census classes must partition the corpus")
    // the tri-modal readout earns its keep only if the third modality
    // separates: some docs are audio-only catches
    assert(got.contains("audio") && got("audio")._1 > 0,
      s"no audio-only class on this fixture: ${got.keys}")
    assert(got.size >= 4,
      s"census collapsed to ${got.size} classes: ${got.keys}")
  }

  test("q387: the cross-modal census exactly re-aggregates the two " +
    "pair tables' doc endpoints, covers every doc once, and both " +
    "modalities contribute") {
    val sf = "/root/testdata/sf0.001"
    def endpoints(q: String): Set[Long] =
      graft.SparkEntry.queries(q)(spark, sf).collect()
        .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val t = endpoints("q41_dedup_jaccard")
    val i = endpoints("q162_image_ahash_pairs")
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.groupBy { d =>
      (t(d), i(d)) match {
        case (true, true) => "both"
        case (true, false) => "text_only"
        case (false, true) => "image_only"
        case _ => "neither"
      }
    }.map { case (k, ds) => (k, (ds.size.toLong, ds.min, ds.max)) }
    val got = graft.SparkEntry
      .queries("q387_crossmodal_dedup_census")(spark, sf)
      .collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want, s"census diverges: got $got want $want")
    assert(got.values.map(_._1).sum == docs.size.toLong,
      "census classes must partition the corpus")
    // the census is only an audit if both modalities actually catch
    // docs the other misses AND some docs are cross-confirmed
    for (k <- Seq("both", "text_only", "image_only", "neither"))
      assert(got.contains(k) && got(k)._1 > 0,
        s"census class '$k' is empty on this fixture — the agreement " +
          "readout no longer separates")
  }
}
