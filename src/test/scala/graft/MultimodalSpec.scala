package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {

  // Real visual corpus for the feature family: ids 2/4 genuine JDK
  // PNGs, ids 1/3 MJPEG AVIs, plus one audio WAV and one garbage row
  // that real feature extraction must DROP (visual features only).
  lazy val media = {
    import spark.implicits._
    Multimodal.synthesizeMedia(Seq(2L, 4L).toDF("id"), "id")
      .union(Multimodal.synthesizeVideo(Seq(1L, 3L).toDF("id"), "id"))
      .union(Multimodal.synthesizeMedia(Seq(7L).toDF("id"), "id")) // wav (odd)
      .union(Seq(MediaRow(99L, "not a container".getBytes("UTF-8"), "mystery")).toDS())
  }

  test("synthesis rejects non-integral id columns at call time") {
    import spark.implicits._
    val bad = Seq("m-1", "m-2").toDF("id")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Multimodal.synthesizeMedia(bad, "id")
    }
    assert(ex.getMessage.contains("integral id column"), ex.getMessage)
  }

  test("extractFeatures reads REAL container bytes, deterministic across partitionings") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(3)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    // wav + garbage dropped; visual rows survive
    assert(f1.map(_.media_id).toSeq == Seq(1L, 2L, 3L, 4L))
    // dims/frames match the generators' id arithmetic, read back from
    // the actual IHDR / avih bytes
    f1.foreach { f =>
      assert(f.width == 16 + f.media_id % 48 && f.height == 16 + (f.media_id * 7) % 32)
      assert(f.byte_len > 0)
      if (f.media_id % 2 == 0) assert(f.format == "png" && f.n_frames == 1L)
      else assert(f.format == "avi" && f.n_frames == 3 + f.media_id % 6)
    }
  }

  test("frame sampling includes frame 0 and respects stride") {
    val feats = Multimodal.extractFeatures(media).toDF()
    val sampled = Multimodal.sampleFrames(feats, everyN = 7)
      .groupBy(col("media_id")).agg(
        min(col("frame_idx")).as("first"),
        count(lit(1)).as("n"),
        max(col("n_frames")).as("nf"))
      .collect()
    sampled.foreach { r =>
      assert(r.getAs[Long]("first") == 0L)
      val expected = (r.getAs[Long]("nf") + 6) / 7
      assert(r.getAs[Long]("n") == expected)
    }
  }

  test("resize plan preserves aspect and never upscales") {
    val feats = Multimodal.extractFeatures(media).toDF()
    // 24 sits inside the generator's 16..63 range: both the downscale
    // and the already-fits branch are exercised
    val rows = Multimodal.resizePlan(feats, maxDim = 24).collect()
    assert(rows.exists(_.getAs[Double]("scale") < 1.0))
    rows.foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (rw, rh) = (r.getAs[Long]("resized_w"), r.getAs[Long]("resized_h"))
      assert(r.getAs[Double]("scale") <= 1.0)
      assert(rw <= 24 && rh <= 24)
      assert(rw <= w && rh <= h)
    }
  }

  test("real formats: parseHeaders reads JDK-encoded PNG and spec WAV bytes exactly") {
    import spark.implicits._
    val ids = Seq(4L, 7L).toDF("id") // one png (even), one wav (odd)
    val parsed = Multimodal.parseHeaders(Multimodal.synthesizeMedia(ids, "id"))
      .collect().map(hh => hh.media_id -> hh).toMap
    val png = parsed(4L)
    assert(png.format == "png")
    assert(png.width.contains(16 + 4 % 48) && png.height.contains(16L + (4 * 7) % 32))
    assert(png.bit_depth.contains(8L) && png.color_type.contains(2L))
    assert(png.channels.isEmpty && png.sample_rate.isEmpty)
    val wav = parsed(7L)
    assert(wav.format == "wav")
    assert(wav.channels.contains(1L + (7 / 2) % 2))
    assert(wav.sample_rate.contains(8000L + 1000 * (7 % 8)))
    assert(wav.n_samples.contains(500L + 7 % 1000))
    assert(wav.duration_ms.contains((500L + 7 % 1000) * 1000 / (8000 + 1000 * (7 % 8))))
    assert(wav.width.isEmpty && wav.height.isEmpty)
  }

  test("garbage and truncated payloads degrade to unknown, never throw") {
    import spark.implicits._
    val junk = Seq(
      Multimodal.MediaRow(1L, Array[Byte](1, 2, 3), "png"),
      Multimodal.MediaRow(2L, "RIFFxxxxWAVE".getBytes("US-ASCII"), "wav"),
      Multimodal.MediaRow(3L, Array.emptyByteArray, "png")).toDS()
    val out = Multimodal.parseHeaders(junk).collect()
    assert(out.length == 3)
    assert(out.forall(h => h.format == "unknown" && h.width.isEmpty && h.channels.isEmpty))
  }

  test("adversarial RIFF payloads degrade: truncated fmt, overflow size, sub-byte depth") {
    import spark.implicits._
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def wav(chunks: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le32(4 + chunks.length) ++
        "WAVE".getBytes("US-ASCII") ++ chunks
    def fmt(channels: Int, rate: Int, bits: Int): Array[Byte] =
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
        Array[Byte](1, 0) ++ le32(channels).take(2) ++ le32(rate) ++
        le32(rate * channels * bits / 8) ++ le32(channels * bits / 8).take(2) ++
        le32(bits).take(2)
    val cases = Seq(
      // fmt chunk header present but payload cut off: the 16-byte wrap
      // would read past the end without the bounds check
      Multimodal.MediaRow(1L, wav("fmt ".getBytes("US-ASCII") ++ le32(16)), "wav"),
      // declared chunk size near Int.MaxValue: 8 + sz overflows negative
      Multimodal.MediaRow(2L, wav("junk".getBytes("US-ASCII") ++ le32(0x7ffffff8)), "wav"),
      // sub-byte declared depth: channels*bits/8 = 0 would divide by zero
      Multimodal.MediaRow(3L, wav(fmt(1, 8000, 4) ++
        "data".getBytes("US-ASCII") ++ le32(0)), "wav")).toDS()
    val out = Multimodal.parseHeaders(cases).collect()
    assert(out.length == 3, "every adversarial payload must emit a row")
    assert(out.forall(_.format == "unknown"),
      s"all must degrade, got ${out.map(h => (h.media_id, h.format)).toSeq}")
  }

  test("sampleFrames: zero-frame rows emit nothing; everyN must be positive") {
    import spark.implicits._
    val f = Seq((1L, 0L), (2L, 5L)).toDF("media_id", "n_frames")
    val out = Multimodal.sampleFrames(f, 2).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L), "zero-frame media emits no rows")
    assert(out.map(_.getLong(2)).sorted.toSeq == Seq(0L, 2L, 4L))
    intercept[IllegalArgumentException] { Multimodal.sampleFrames(f, 0) }
  }

  test("real resize: 16x16 identity equals full decode; downscale picks NN indices") {
    import spark.implicits._
    // id 0 encodes a 16x16 image: identity resize must equal decodePixels
    val ids0 = Seq(0L).toDF("id")
    val full = Multimodal.decodePixels(Multimodal.synthesizeMedia(ids0, "id")).head()
    val same = Multimodal.resizePixels(Multimodal.synthesizeMedia(ids0, "id"), 16, 16).head()
    assert((same.sum_r, same.sum_g, same.sum_b) == (full.sum_r, full.sum_g, full.sum_b))
    // a larger image: resized sums must equal the generator at mapped indices
    val id = 6L
    val w = (16 + id % 48).toInt; val h = (16 + id * 7 % 32).toInt
    var sr = 0L
    for (y <- 0 until 16; x <- 0 until 16)
      sr += ((id % 256).toInt + 3 * (x * w / 16) + 5 * (y * h / 16)) % 256
    val rz = Multimodal.resizePixels(
      Multimodal.synthesizeMedia(Seq(id).toDF("id"), "id"), 16, 16).head()
    assert(rz.sum_r == sr, s"NN index math diverged: ${rz.sum_r} vs $sr")
  }

  test("real PCM16 decode: sample sum and peak equal the generator") {
    import spark.implicits._
    val id = 13L // wav: 2 channels, rate 13000, 513 frames
    val out = Multimodal.decodeAudio(
      Multimodal.synthesizeMedia(Seq(id).toDF("id"), "id")).head()
    val c = 1 + (id / 2) % 2; val n = 500 + id % 1000
    var sum = 0L; var peak = 0L
    for (i <- 0L until n * c) {
      val s = (id + 11 * i) % 2001 - 1000
      sum += s; peak = math.max(peak, math.abs(s))
    }
    assert(out.channels == c && out.sample_rate == 8000 + 1000 * (id % 8))
    assert(out.n_samples == n && out.sum_samples == sum && out.peak_abs == peak)
  }

  test("real PNG decode: pixel sums equal the generator, computed independently") {
    import spark.implicits._
    val ids = Seq(0L, 2L, 90L).toDF("id")
    val decoded = Multimodal.decodePixels(Multimodal.synthesizeMedia(ids, "id"))
      .collect().map(p => p.media_id -> p).toMap
    for (id <- Seq(0L, 2L, 90L)) {
      val w = (16 + id % 48).toInt; val h = (16 + id * 7 % 32).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += ((id % 256).toInt + 3 * x + 5 * y) % 256
        sg += (((2 * id) % 256).toInt + 2 * x + y) % 256
        sb += (((3 * id) % 256).toInt + x + 7 * y) % 256
      }
      val p = decoded(id)
      assert((p.width, p.height) == (w.toLong, h.toLong))
      assert((p.sum_r, p.sum_g, p.sum_b) == (sr, sg, sb),
        s"decode diverged from generator for id=$id")
    }
  }

  test("real JPEG: header parse reads SOF dims, decode stays inside the fidelity band") {
    import spark.implicits._
    val idSeq = Seq(0L, 1L, 7L, 90L, 255L)
    val ids = idSeq.toDF("id")
    val jpegs = Multimodal.synthesizeJpeg(ids, "id")
    // marker walk: exact dims/precision/components off the real bytes
    val heads = Multimodal.parseHeaders(jpegs).collect().map(h => h.media_id -> h).toMap
    for (id <- idSeq) {
      val h = heads(id)
      assert(h.format == "jpeg", s"id=$id parsed as ${h.format}")
      assert(h.width.contains(16 + id % 48) && h.height.contains(16 + id * 7 % 32))
      assert(h.bit_depth.contains(8L) && h.channels.contains(3L))
    }
    // lossy decode: exact dims, error band well under the gate (MAE ≤ 4
    // per channel-sample on smooth ramps), and gate = true everywhere
    val fids = Multimodal.decodeJpegFidelity(jpegs, maxMeanErr = 4.0)
      .collect().map(f => f.media_id -> f).toMap
    for (id <- idSeq) {
      val f = fids(id)
      val n = 3L * f.width * f.height
      assert(f.fidelity_ok, s"id=$id MAE=${f.total_abs_err.toDouble / n}")
      assert(f.total_abs_err > 0, "JPEG decode bit-exact to source is implausible — check the codec actually ran")
    }
    // determinism across partitionings (the oracle-gate precondition)
    val again = Multimodal.decodeJpegFidelity(
      Multimodal.synthesizeJpeg(ids.repartition(4), "id"), maxMeanErr = 4.0)
      .collect().map(f => f.media_id -> f.total_abs_err).toMap
    assert(idSeq.forall(id => again(id) == fids(id).total_abs_err))
  }

  test("audio DSP: zero crossings, exact energy, and correctly-rounded RMS match the generator") {
    import spark.implicits._
    val idSeq = Seq(1L, 3L, 91L)
    val out = Multimodal.audioDsp(Multimodal.synthesizeMedia(idSeq.toDF("id"), "id"))
      .collect().map(a => a.media_id -> a).toMap
    for (id <- idSeq) {
      val ch = (1 + (id / 2) % 2).toInt
      val n = (500 + id % 1000).toInt * ch
      val samples = (0 until n).map(i => ((id + 11 * i) % 2001 - 1000).toInt)
      val zc = (1 until n).count(i => (samples(i) < 0) != (samples(i - 1) < 0))
      val sumSq = samples.map(s => s.toLong * s).sum
      val a = out(id)
      assert(a.n_samples == n && a.zero_crossings == zc && a.sum_sq == sumSq)
      assert(a.rms == math.sqrt(sumSq.toDouble / n)) // bit-exact: sqrt is correctly rounded
    }
  }

  test("real video: hand-emitted MJPEG AVI round-trips through header parse and sampled decode") {
    import spark.implicits._
    val idSeq = Seq(0L, 1L, 5L, 92L)
    val ids = idSeq.toDF("id")
    val avis = Multimodal.synthesizeVideo(ids, "id")
    val heads = Multimodal.parseVideoHeaders(avis).collect().map(h => h.media_id -> h).toMap
    for (id <- idSeq) {
      val h = heads(id)
      assert(h.n_frames == 3 + id % 6 && h.fps == 10L)
      assert(h.width == 16 + id % 48 && h.height == 16 + id * 7 % 32)
    }
    // stride 2 decodes ceil(n/2) frames; stride 1 decodes all; both pass the gate
    val s2 = Multimodal.decodeVideoFrames(avis, everyN = 2, maxMeanErr = 4.0)
      .collect().map(v => v.media_id -> v).toMap
    val s1 = Multimodal.decodeVideoFrames(avis, everyN = 1, maxMeanErr = 4.0)
      .collect().map(v => v.media_id -> v).toMap
    for (id <- idSeq) {
      val n = 3 + id % 6
      assert(s2(id).n_frames == n && s2(id).n_decoded == (n + 1) / 2)
      assert(s1(id).n_decoded == n)
      assert(s2(id).fidelity_ok && s1(id).fidelity_ok,
        s"id=$id MAE=${s1(id).total_abs_err.toDouble / (3.0 * s1(id).width * s1(id).height * n)}")
      assert(s1(id).total_abs_err >= s2(id).total_abs_err,
        "full decode must accumulate at least the sampled error")
      assert(s1(id).total_abs_err > 0, "lossless JPEG decode is implausible — codec not exercised?")
    }
    // non-AVI payloads are routed out, and decode is partition-deterministic
    val mixed = Multimodal.parseVideoHeaders(
      Multimodal.synthesizeMedia(ids, "id")).collect()
    assert(mixed.isEmpty, "png/wav payloads must not pass the AVI route")
    val again = Multimodal.decodeVideoFrames(
      Multimodal.synthesizeVideo(ids.repartition(3), "id"), everyN = 2, maxMeanErr = 4.0)
      .collect().map(v => v.media_id -> v.total_abs_err).toMap
    assert(idSeq.forall(id => again(id) == s2(id).total_abs_err))
  }

  test("perceptual dHash: bits equal the generator replayed through the grid, independently") {
    import spark.implicits._
    val idSeq = Seq(0L, 2L, 46L, 90L)
    val out = Multimodal.perceptualHash(
        Multimodal.synthesizeMedia(idSeq.toDF("id"), "id"))
      .collect().map(p => p.media_id -> p).toMap
    for (id <- idSeq) {
      val w = (16 + id % 48).toInt; val h = (16 + id * 7 % 32).toInt
      def gray(gx: Int, gy: Int): Int = {
        val x = gx * w / 9; val y = gy * h / 8
        (((id % 256).toInt + 3 * x + 5 * y) % 256) +
          ((((2 * id) % 256).toInt + 2 * x + y) % 256) +
          ((((3 * id) % 256).toInt + x + 7 * y) % 256)
      }
      var lo = 0L; var hi = 0L
      for (k <- 0 until 64) {
        if (gray(k % 8 + 1, k / 8) > gray(k % 8, k / 8)) {
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
      }
      assert((out(id).dhash_lo, out(id).dhash_hi) == (lo, hi), s"id=$id")
    }
    // only PNG rows route in (odd ids are WAVs)
    assert(!out.contains(46L + 1))
  }

  test("transcode PNG->JPEG: real decode/re-encode round trip, bounded error, smaller bytes") {
    import spark.implicits._
    val idSeq = Seq(0L, 2L, 46L, 90L, 254L)
    val out = Multimodal.transcodePngToJpeg(
        Multimodal.synthesizeMedia(idSeq.toDF("id"), "id"), maxMeanErr = 16.0)
      .collect().map(t => t.media_id -> t).toMap
    for (id <- idSeq) {
      val t = out(id)
      assert(t.width == 16 + id % 48 && t.height == 16 + id * 7 % 32)
      val mae = t.total_abs_err.toDouble / (3.0 * t.width * t.height)
      assert(t.fidelity_ok, s"id=$id MAE=$mae")
      assert(mae > 0.0 && mae < 16.0, s"id=$id MAE=$mae (sawtooth ramps ring, but must stay bounded)")
      assert(t.jpeg_bytes > 0 && t.src_bytes > 0)
    }
    // determinism across partitionings (oracle-gate precondition)
    val again = Multimodal.transcodePngToJpeg(
        Multimodal.synthesizeMedia(idSeq.toDF("id").repartition(3), "id"), maxMeanErr = 16.0)
      .collect().map(t => t.media_id -> (t.total_abs_err, t.jpeg_bytes)).toMap
    assert(idSeq.forall(id => again(id) == ((out(id).total_abs_err, out(id).jpeg_bytes))))
  }
}
