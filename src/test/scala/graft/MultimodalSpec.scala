package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** The multimodal plumbing is stub-decoded (no codecs in this
  * container), so the tests pin what IS real: the binary header
  * round-trip, the agreement between the Catalyst decode path and the
  * partition-wise decoder slot, and the frame-sampling arithmetic.
  */
class MultimodalSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"
  private lazy val media =
    Multimodal.withFakeMedia(Tables.documents(spark, Sf).limit(50), "doc_id", "text")

  test("binary media column: header + payload, byte length checks out") {
    val r = media.select(col("doc_id"), length(col("media")).as("blen"), col("n_chars"))
      .collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getInt(1) == row.getLong(2) + Multimodal.HeaderBytes))
  }

  test("Catalyst stub decode inverts the header exactly") {
    val decoded = Multimodal.decodeStub(media, "media")
      .select("doc_id", "n_chars", "meta.width", "meta.height", "meta.n_bytes").collect()
    decoded.foreach { r =>
      val (id, n) = (r.getLong(0), r.getLong(1))
      assert(r.getInt(2) == 16 + (n % 64).toInt)
      assert(r.getInt(3) == 16 + (id % 48).toInt)
      assert(r.getLong(4) == n)
    }
  }

  test("partition-wise decoder slot agrees with the Catalyst decode path") {
    val viaSql = Multimodal.decodeStub(media, "media")
      .select("doc_id", "meta.width", "meta.height").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    val viaPartitions = Multimodal.mapMediaPartitions(media, "doc_id", "media")()
      .collect().map(r => (r.id, (r.width, r.height))).toMap
    assert(viaSql == viaPartitions)
  }

  test("frame sampling keeps every Nth fixed-size slice, count arithmetic holds") {
    val framed = Multimodal.sampleFrames(media, "media", frameBytes = 32, every = 2)
      .select("n_chars", "n_frames_total", "n_frames_kept", "frames").collect()
    framed.foreach { r =>
      val n = r.getLong(0)
      val total = r.getInt(1)
      val kept = r.getInt(2)
      assert(total == math.ceil(n / 32.0).toInt)
      assert(kept == (total + 1) / 2)
      val frames = r.getSeq[Array[Byte]](3)
      assert(frames.length == kept)
      // all but possibly the last kept frame are full-size
      frames.dropRight(1).foreach(f => assert(f.length == 32))
    }
  }

  // ---- perceptual fingerprint (dHash) tier ---------------------------

  /** Reference reimplementation of the kernel's contract — independent
    * of the Catalyst expression, so the two can disagree loudly.
    */
  private def refDhash(payload: Array[Byte]): Long = {
    val n = payload.length
    val s = new Array[Long](72); val l = new Array[Long](72)
    for (i <- 0 until n) {
      val k = ((i.toLong * 72) / n).toInt
      s(k) += (payload(i) & 0xff); l(k) += 1
    }
    (0 until 64).foldLeft(0L) { (acc, b) =>
      val k1 = (b >> 3) * 9 + (b & 7)
      if (s(k1) * l(k1 + 1) > s(k1 + 1) * l(k1)) acc | (1L << b) else acc
    }
  }

  private def mediaOf(pairs: Seq[(Long, String)]) = {
    import spark.implicits._
    Multimodal.withFakeMedia(pairs.toDF("doc_id", "text"), "doc_id", "text")
  }

  test("dHash64 kernel matches the independent reimplementation") {
    val got = media.select(col("doc_id"), Multimodal.dHash64("media"), col("text"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == refDhash(r.getString(2).getBytes("UTF-8")),
        s"doc ${r.getLong(0)}")
    }
  }

  test("dHash64: identical payloads hash equal; empty payload is NULL") {
    val m = mediaOf(Seq(1L -> "the same content", 2L -> "the same content", 3L -> ""))
    val h = m.select(col("doc_id"), Multimodal.dHash64("media")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(h(1L).isDefined && h(1L) == h(2L))
    assert(h(3L).isEmpty, "empty payload must fingerprint to NULL, not 0")
  }

  test("dHash64: a localized single-byte edit flips at most 2 bits") {
    val base = "the quick brown fox jumps over the lazy dog and keeps on running far" * 2
    val mid = base.length / 2
    val edited = base.substring(0, mid) + "X" + base.substring(mid + 1)
    val h = mediaOf(Seq(1L -> base, 2L -> edited))
      .select(Multimodal.dHash64("media")).collect().map(_.getLong(0))
    assert(java.lang.Long.bitCount(h(0) ^ h(1)) <= 2)
  }

  test("dHash64 separates a 2x re-encode from unrelated content") {
    // the "same image at 2x resolution" analogue: byte-doubling moves
    // cell means only at floor-boundary slivers, so its hamming
    // (~8 bits: grid-boundary drift) sits well below the unrelated
    // band (~32 expected, 40 on this fixture) though above the
    // tight localized-edit threshold — which is exactly the gap a
    // production pHash (DCT over decoded pixels) closes; only the
    // kernel swaps, the banding/verify plumbing is unchanged
    val base = "a perceptual hash should survive a uniform re-encode of its payload " * 8
    val doubled = base.flatMap(c => s"$c$c")
    val unrelated = "entirely different content with no shared structure to speak of at all " * 8
    val h = mediaOf(Seq(1L -> base, 2L -> doubled, 3L -> unrelated))
      .select(col("doc_id"), Multimodal.dHash64("media")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reencode = java.lang.Long.bitCount(h(1L) ^ h(2L))
    val unrel = java.lang.Long.bitCount(h(1L) ^ h(3L))
    assert(reencode <= 16, s"re-encode drift too large: $reencode bits")
    assert(reencode < unrel / 2,
      s"re-encode ($reencode) must sit well below unrelated ($unrel)")
  }

  test("mediaNearDups finds every planted perturbed copy (banding complete at hamming<=3)") {
    val docs = Tables.documents(spark, Sf).limit(40)
      .select(col("doc_id"), col("text"))
    import spark.implicits._
    val planted = docs.as[(Long, String)].collect().map { case (id, t) =>
      val mid = t.length / 2
      (id + 100000L, t.substring(0, mid) + "X" + t.substring(mid + 1))
    }.toSeq.toDF("doc_id", "text")
    val m = Multimodal.withFakeMedia(docs.unionByName(planted), "doc_id", "text")
    val pairs = Multimodal.mediaNearDups(m, "doc_id", "media", maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = docs.select("doc_id").as[Long].collect()
      .map(id => (id, id + 100000L)).toSet
    assert(expected.subsetOf(pairs),
      s"missed planted pairs: ${expected -- pairs}")
    // and the banded plan equals the exact all-pairs join (completeness)
    val h = m.select(col("doc_id"), Multimodal.dHash64("media").as("dh"))
    val brute = h.as("a").join(h.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        expr("bit_count(a.dh ^ b.dh)").as("ham"))
      .filter(col("ham") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == brute, "banded pairs must equal the exact hamming join")
  }

  test("pixel dHash: a JPEG re-encode collides with its original, distinct images separate") {
    import spark.implicits._
    // the case the byte kernel is blind to: a quality-shifted
    // re-encode rewrites every byte but preserves perceptual content
    val ids = (1L to 10L)
    val rows = ids.map(id => (id, Multimodal.synthImage(id))) ++
      ids.map(id => (id + 1000L, Multimodal.reencodeJpeg(Multimodal.synthImage(id))))
    val out = Multimodal.dHashPixel(
        rows.toDF("doc_id", "media"), "doc_id", "media")
      .collect().map(p => p.id -> p).toMap
    assert(out.values.forall(_.decoded), "every payload is a real image")
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (id <- ids) {
      val d = ham(out(id).dhash64.get, out(id + 1000L).dhash64.get)
      assert(d <= 3,
        s"JPEG re-encode of image $id must land within hamming 3, got $d")
    }
    for (a <- ids; b <- ids if a < b) {
      val d = ham(out(a).dhash64.get, out(b).dhash64.get)
      assert(d > 3, s"distinct images $a/$b must separate, got hamming $d")
    }
    // and the byte-domain kernel really is blind to the re-encode:
    // the SAME pair sits ~half the hash apart on raw bytes
    val byteHam = java.lang.Long.bitCount(
      graft.functions.MediaFunctions.dhash64Bytes(Multimodal.synthImage(1L), 0) ^
        graft.functions.MediaFunctions.dhash64Bytes(
          Multimodal.reencodeJpeg(Multimodal.synthImage(1L)), 0))
    assert(byteHam > 3, s"byte kernel should NOT see the re-encode pair ($byteHam)")
    // the grid is RELATIVE-position, so a 2x upscale (the thumbnail /
    // responsive-resize dup) also lands inside the hamming ball
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.synthImage(1L)))
    val big = new java.awt.image.BufferedImage(144, 144,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = big.createGraphics()
    g.drawImage(src, 0, 0, 144, 144, null)
    g.dispose()
    val resizedHam = java.lang.Long.bitCount(
      graft.functions.MediaFunctions.dhash64Pixels(src) ^
        graft.functions.MediaFunctions.dhash64Pixels(big))
    assert(resizedHam <= 3, s"2x resize must stay in the ball, got $resizedHam")
  }

  test("pixel pHash: survives the LOW-quality re-encode and resize, separates distinct images") {
    import spark.implicits._
    import graft.functions.MediaFunctions
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    def decode(b: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    val ids = (1L to 10L)
    // aggressive quantization (JPEG q=0.3) — the distortion tier the
    // DCT kernel is FOR: low-frequency energy survives it
    for (id <- ids) {
      val orig = MediaFunctions.phash64Pixels(decode(Multimodal.synthImage(id)))
      val low = MediaFunctions.phash64Pixels(
        decode(Multimodal.reencodeJpeg(Multimodal.synthImage(id), 0.3f)))
      assert(ham(orig, low) <= 3,
        s"pHash must survive q=0.3 re-encode of image $id, got ${ham(orig, low)}")
    }
    // distinct images separate
    val hashes = ids.map(id =>
      id -> MediaFunctions.phash64Pixels(decode(Multimodal.synthImage(id)))).toMap
    for (a <- ids; b <- ids if a < b)
      assert(ham(hashes(a), hashes(b)) > 3,
        s"distinct images $a/$b must separate, got ${ham(hashes(a), hashes(b))}")
    // 2x resize stays in the ball (relative-position grid)
    val src = decode(Multimodal.synthImage(3L))
    val big = new java.awt.image.BufferedImage(144, 144,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = big.createGraphics()
    g.drawImage(src, 0, 0, 144, 144, null)
    g.dispose()
    assert(ham(MediaFunctions.phash64Pixels(src),
      MediaFunctions.phash64Pixels(big)) <= 3, "2x resize in the ball")
    // the Dataset operator shares the dHashPixel plumbing: decoded
    // flags + byte fallback behave identically
    val rows = Seq((1L, Multimodal.synthImage(1L)),
      (2L, "not an image".getBytes("UTF-8")))
    val out = Multimodal.pHashPixel(rows.toDF("doc_id", "media"),
      "doc_id", "media").collect().map(p => p.id -> p).toMap
    assert(out(1L).decoded &&
      out(1L).dhash64.contains(MediaFunctions.phash64Pixels(
        decode(Multimodal.synthImage(1L)))))
    assert(!out(2L).decoded && out(2L).dhash64.contains(Long.unbox(
      MediaFunctions.dhash64Bytes("not an image".getBytes("UTF-8"), 0))))
  }

  test("pixel dHash: undecodable payload falls back to the byte kernel, marked loud") {
    import spark.implicits._
    val text = "definitely not an image payload, just prose".getBytes("UTF-8")
    val rows = Seq((1L, text), (2L, Multimodal.synthImage(7L)),
      (3L, Array.empty[Byte]), (4L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.dHashPixel(
        rows.toDF("doc_id", "media"), "doc_id", "media")
      .collect().map(p => p.id -> p).toMap
    assert(!out(1L).decoded && out(1L).dhash64.contains(
      Long.unbox(graft.functions.MediaFunctions.dhash64Bytes(text, 0))),
      "fallback must be bit-identical to the byte kernel")
    assert(out(2L).decoded, "a real image decodes")
    assert(out(3L).dhash64.isEmpty && !out(3L).decoded, "empty payload -> None")
    assert(out(4L).dhash64.isEmpty && !out(4L).decoded, "null payload -> None")
    // quarantine-by-decode: a TRUNCATED real container (cut upload)
    // must refuse to decode, never yield a fingerprint that could pair
    // — the gate the pixel pipeline uses instead of the stub format's
    // header arithmetic
    val cut = java.util.Arrays.copyOf(Multimodal.synthImage(5L), 60)
    val out2 = Multimodal.dHashPixel(
        Seq((7L, cut)).toDF("doc_id", "media"), "doc_id", "media")
      .collect().head
    assert(!out2.decoded, "a truncated PNG must not count as decoded")
  }

  test("hashNearDups over pixel hashes surfaces exactly the planted re-encoded twins") {
    import spark.implicits._
    val ids = (1L to 8L)
    val rows = ids.map(id => (id, Multimodal.synthImage(id))) ++
      ids.filter(_ % 2 == 0)
        .map(id => (id + 1000L, Multimodal.reencodeJpeg(Multimodal.synthImage(id))))
    val hashed = Multimodal.dHashPixel(
        rows.toDF("doc_id", "media"), "doc_id", "media")
      .select(col("id").as("doc_id"), col("dhash64").as("dh"))
    val pairs = Multimodal.hashNearDups(hashed, "doc_id", "dh", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = ids.filter(_ % 2 == 0).map(id => (id, id + 1000L)).toSet
    assert(pairs == expected,
      s"pixel near-dups must be exactly the planted twins: got $pairs")
  }

  test("audio hash: gain twin bit-identical, resample in the ball, click local, fallback loud") {
    import spark.implicits._
    import graft.functions.MediaFunctions
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // kernel laws first: exact volume invariance is the headline —
    // a common gain factors out of every cross-multiplied comparison
    val base = Array.tabulate(5000)(i =>
      (4000.0 * math.sin(i / 40.0) + 2000.0 * math.sin(i / 7.0)).toInt)
    val loud = base.map(_ * 3)
    assert(MediaFunctions.ahash64Samples(base) ==
      MediaFunctions.ahash64Samples(loud), "integer gain is EXACTLY invariant")
    // a localized click touches one cell -> <= 2 bits
    val clicked = base.clone(); clicked(2500) = 32000
    assert(ham(MediaFunctions.ahash64Samples(base),
      MediaFunctions.ahash64Samples(clicked)) <= 2, "click stays local")
    assert(MediaFunctions.ahash64Samples(Array.empty[Int]) == null,
      "empty clip has no fingerprint")
    // the Dataset operator over real WAV payloads: decode flags, the
    // gain-2 twin collides bit-for-bat, distinct clips separate,
    // text payloads fall back to the byte kernel bit-identically
    val ids = (1L to 8L)
    val rows = ids.map(id => (id, Multimodal.synthWav(id))) ++
      ids.map(id => (id + 1000L, Multimodal.synthWav(id, gain = 2))) :+
      (9999L, "not audio at all".getBytes("UTF-8"))
    val out = Multimodal.audioHash(rows.toDF("doc_id", "media"),
      "doc_id", "media").collect().map(p => p.id -> p).toMap
    for (id <- ids) {
      assert(out(id).decoded && out(id + 1000L).decoded, "WAVs decode")
      assert(out(id).dhash64 == out(id + 1000L).dhash64,
        s"gain-2 re-master of clip $id must hash IDENTICALLY")
    }
    for (a <- ids; b <- ids if a < b)
      assert(ham(out(a).dhash64.get, out(b).dhash64.get) > 3,
        s"distinct clips $a/$b separate")
    assert(!out(9999L).decoded && out(9999L).dhash64.contains(Long.unbox(
      MediaFunctions.dhash64Bytes("not audio at all".getBytes("UTF-8"), 0))),
      "undecodable falls back to the byte kernel bit-identically")
    // 2x resample (every sample doubled) rides the relative grid
    for (id <- 1L to 3L) {
      val doubled = Multimodal.synthPcm(id).flatMap(s => Array(s, s))
      assert(ham(Long.unbox(MediaFunctions.ahash64Samples(doubled)),
        out(id).dhash64.get) <= 3, s"2x resample of clip $id stays in the ball")
    }
    // end-to-end: banding surfaces exactly the planted gain twins
    val hashed = Multimodal.audioHash(
        ids.flatMap(id => Seq((id, Multimodal.synthWav(id)),
          (id + 1000L, Multimodal.synthWav(id, gain = 2))))
          .toDF("doc_id", "media"), "doc_id", "media")
      .select(col("id").as("doc_id"), col("dhash64").as("ah"))
    val pairs = Multimodal.hashNearDups(hashed, "doc_id", "ah", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == ids.map(id => (id, id + 1000L)).toSet,
      s"audio near-dups must be exactly the planted re-masters: $pairs")
  }

  test("media quarantine: every corruption type gets its reason, rows conserved") {
    val m = mediaOf(Seq(1L -> "healthy content here", 2L -> "x", 3L -> "soon cut"))
    val corrupted = m.withColumn("media",
      when(col("doc_id") === 1L, col("media"))
        .when(col("doc_id") === 2L, expr("substring(media, 1, 3)"))        // short_header
        .when(col("doc_id") === 3L, expr("substring(media, 1, 8)")))       // empty_payload
      .unionByName(mediaOf(Seq(4L -> "will be truncated a lot"))
        .withColumn("media", expr("substring(media, 1, 12)")))             // truncated
      .unionByName(mediaOf(Seq(5L -> "padded with trailing junk"))
        .withColumn("media", expr("concat(media, to_binary('00ff', 'hex'))")))
      .unionByName(mediaOf(Seq(6L -> "gone entirely"))
        .withColumn("media", lit(null).cast("binary")))
    val (clean, bad) = Multimodal.quarantineMedia(corrupted, "doc_id", "media")
    assert(clean.count() + bad.count() == corrupted.count(), "split must conserve rows")
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
    val reasons = bad.select("doc_id", "quarantine_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reasons == Map(2L -> "short_header", 3L -> "empty_payload",
      4L -> "truncated_payload", 5L -> "padded_payload", 6L -> "null_media"))
    assert(clean.columns.sameElements(corrupted.columns),
      "clean side must keep the input schema")
  }

  test("audio hash: STEREO gain twin bit-identical (sum-mix commutes with gain)") {
    import spark.implicits._
    // the fixture's per-frame channel sums are frequently odd, so the
    // old truncating mean-mix provably broke commutation here; the
    // channel-SUM mix commutes with an integer gain exactly, and the
    // kernel is scale-free by 128-bit cross-multiplication
    val ids = (1L to 4L)
    val rows = ids.map(id => (id, Multimodal.synthWavStereo(id))) ++
      ids.map(id => (id + 1000L, Multimodal.synthWavStereo(id, gain = 2)))
    val out = Multimodal.audioHash(rows.toDF("doc_id", "media"),
      "doc_id", "media").collect().map(p => p.id -> p).toMap
    for (id <- ids) {
      assert(out(id).decoded && out(id + 1000L).decoded, "stereo WAVs decode")
      assert(out(id).dhash64 == out(id + 1000L).dhash64,
        s"gain-2 re-master of STEREO clip $id must hash IDENTICALLY")
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (a <- ids; b <- ids if a < b)
      assert(ham(out(a).dhash64.get, out(b).dhash64.get) > 3,
        s"distinct stereo clips $a/$b separate")
  }

  test("MJPEG: split is exact, keyframe cadence holds, truncation drops loud") {
    import spark.implicits._
    val frameIds = (0 until 6).map(k => 100L + k)
    val clip = Multimodal.synthMjpeg(frameIds)
    // split recovers exactly the concatenated frames, byte-for-byte
    val frames = Multimodal.splitMjpeg(clip)
    assert(frames.length == 6, s"6 frames in, ${frames.length} out")
    assert(frames.map(_.length).sum == clip.length,
      "frame slices must tile the clip exactly")
    frameIds.zip(frames).foreach { case (id, f) =>
      assert(java.util.Arrays.equals(f,
        Multimodal.reencodeJpeg(Multimodal.synthImage(id))),
        s"frame $id must round-trip byte-identically")
    }
    // a clip cut MID-FRAME drops the partial tail, keeps whole frames
    val cut = java.util.Arrays.copyOf(clip,
      frames.take(3).map(_.length).sum + 40)
    assert(Multimodal.splitMjpeg(cut).length == 3,
      "truncated frame 4 must be dropped, frames 1-3 kept whole")
    // keyframe cadence: every=2 keeps frames 0, 2, 4 with real hashes
    val fh = Multimodal.videoKeyframeHashes(
        Seq((7L, clip)).toDF("doc_id", "media"), "doc_id", "media",
        every = 2).collect()
    assert(fh.map(_.frameIdx).sorted.sameElements(Array(0, 2, 4)),
      s"every=2 keeps frames 0/2/4, got ${fh.map(_.frameIdx).toSeq}")
    assert(fh.forall(f => f.nFrames == 6 && f.decoded && f.dhash64.nonEmpty),
      "kept keyframes decode with real pixel hashes")
    // a frameless payload quarantines as ONE loud byte-fallback row
    val bad = Multimodal.videoKeyframeHashes(
      Seq((8L, "no jpeg here".getBytes("UTF-8")))
        .toDF("doc_id", "media"), "doc_id", "media", every = 2).collect()
    assert(bad.length == 1 && bad.head.frameIdx == -1 && !bad.head.decoded,
      "frameless clip must surface exactly one loud fallback row")
  }

  test("MJPEG: re-encoded clip's keyframes collide with the original's") {
    import spark.implicits._
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val clips = (1L to 4L).map(c =>
      c -> Multimodal.synthMjpeg((0 until 6).map(k => c * 100L + k))).toMap
    // per-keyframe law: frame-k of the re-encode lands within the
    // pixel kernel's re-encode ball of frame-k of the original
    val orig = Multimodal.videoKeyframeHashes(
        Seq((1L, clips(1L))).toDF("doc_id", "media"), "doc_id", "media", 2)
      .collect().map(f => f.frameIdx -> f.dhash64.get).toMap
    val re = Multimodal.videoKeyframeHashes(
        Seq((1L, Multimodal.reencodeMjpeg(clips(1L), 0.5f)))
          .toDF("doc_id", "media"), "doc_id", "media", 2)
      .collect().map(f => f.frameIdx -> f.dhash64.get).toMap
    assert(orig.keySet == re.keySet, "re-encode preserves frame count")
    orig.foreach { case (k, h) =>
      assert(ham(h, re(k)) <= 3, s"keyframe $k must stay in the ball")
    }
    // clip-level operator: exactly the planted re-encoded twins pair,
    // with full keyframe support and distinct clips staying apart
    val rows = clips.toSeq.map { case (c, bytes) => (c, bytes) } ++
      Seq(1L, 3L).map(c =>
        (c + 1000L, Multimodal.reencodeMjpeg(clips(c), 0.5f)))
    val pairs = Multimodal.mjpegNearDups(rows.toDF("doc_id", "media"),
        "doc_id", "media", every = 2, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 1001L), (3L, 1003L)),
      s"clip pairs must be exactly the planted twins: ${pairs.keySet}")
    assert(pairs.values.forall(_ == 3L),
      s"all 3 keyframes must support each twin pair: $pairs")
    // the corroboration knob: demanding more support than the 3
    // keyframes a twin can have empties the output, never errors
    assert(Multimodal.mjpegNearDups(rows.toDF("doc_id", "media"),
      "doc_id", "media", every = 2, maxHamming = 3,
      minFramePairs = 4L).count() == 0L,
      "minFramePairs above the keyframe count must yield no pairs")
  }

  test("MJPEG: an EXIF-embedded thumbnail's EOI cannot fake a frame boundary") {
    val f1 = Multimodal.reencodeJpeg(Multimodal.synthImage(1L))
    val f2 = Multimodal.reencodeJpeg(Multimodal.synthImage(2L))
    val thumb = Multimodal.reencodeJpeg(Multimodal.synthImage(99L))
    val host = Multimodal.withExifThumbnail(f1, thumb)
    // ImageIO skips the unknown APP1 by length: same decoded raster
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(host))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f1))
    assert(img != null &&
      graft.functions.MediaFunctions.dhash64Pixels(img) ==
        graft.functions.MediaFunctions.dhash64Pixels(ref),
      "the thumbnail-bearing host must decode to the same raster")
    // the trap: a raw FFD9 scan would end the frame at the THUMBNAIL's
    // EOI (inside APP1); the segment walk must find the true boundary
    val clip = host ++ f2
    val frames = Multimodal.splitMjpeg(clip)
    assert(frames.length == 2, s"2 frames in, ${frames.length} out")
    assert(frames(0).length == host.length &&
      java.util.Arrays.equals(frames(0), host),
      "frame 1 must end at its OWN EOI, not the embedded thumbnail's " +
        s"(got ${frames(0).length} of ${host.length} bytes)")
    assert(java.util.Arrays.equals(frames(1), f2))
    // malformed mid-stream: a frame whose declared segment length runs
    // past the buffer drops itself AND the rest (no fake resync)
    val cut = java.util.Arrays.copyOf(host, 30) ++ f2
    assert(Multimodal.splitMjpeg(cut).isEmpty,
      "a malformed frame must not resync into the following garbage")
  }

  test("MJPEG scene keyframes: content-selected, cadence-shift invariant") {
    import spark.implicits._
    // selectivity: a clip of repeated-frame scenes keeps EXACTLY the
    // scene-opening frames — identical rasters have luma distance 0
    val sceneClip = Multimodal.synthMjpeg(
      Seq(11L, 11L, 11L, 22L, 22L, 33L))
    val kept = Multimodal.videoSceneKeyframeHashes(
        Seq((1L, sceneClip)).toDF("doc_id", "media"), "doc_id", "media",
        minSceneDiff = 100L).collect()
    assert(kept.map(_.frameIdx).sorted.sameElements(Array(0, 3, 5)),
      s"scene starts are frames 0/3/5, got ${kept.map(_.frameIdx).toSeq}")
    assert(kept.forall(f => f.decoded && f.nFrames == 6))
    // alignment invariance: a re-encoded twin MISSING THE LEAD-IN
    // frame. Cadence every=2 samples disjoint content (0/2/4 vs the
    // shifted 1/3/5) and misses the twin outright; scene selection
    // picks the same cuts at shifted positions and pairs at FULL
    // support (all 5 shared frames are distinct scenes).
    val distinct6 = (0 until 6).map(k => 500L + k)
    val orig = Multimodal.synthMjpeg(distinct6)
    val twinDroppedLead = Multimodal.reencodeMjpeg(
      Multimodal.synthMjpeg(distinct6.drop(1)), 0.5f)
    val rows = Seq((1L, orig), (2L, twinDroppedLead)).toDF("doc_id", "media")
    val cadencePairs = Multimodal.mjpegNearDupsFromHashes(
      Multimodal.videoKeyframeHashes(rows, "doc_id", "media", every = 2),
      maxHamming = 3).count()
    assert(cadencePairs == 0L,
      s"cadence sampling must MISS the shifted twin (got $cadencePairs pairs)")
    val scenePairs = Multimodal.mjpegNearDupsFromHashes(
      Multimodal.videoSceneKeyframeHashes(rows, "doc_id", "media",
        minSceneDiff = 100L), maxHamming = 3).collect()
    assert(scenePairs.length == 1 &&
      scenePairs.head.getLong(0) == 1L && scenePairs.head.getLong(1) == 2L,
      s"scene keyframes must pair the shifted twin: ${scenePairs.toSeq}")
    assert(scenePairs.head.getLong(2) == 5L,
      s"the twin must pair at FULL support (5 shared scenes): " +
        s"${scenePairs.head.getLong(2)}")
    // the quarantine contract mirrors the cadence arm
    val bad = Multimodal.videoSceneKeyframeHashes(
      Seq((9L, "not a clip".getBytes("UTF-8"))).toDF("doc_id", "media"),
      "doc_id", "media", minSceneDiff = 100L).collect()
    assert(bad.length == 1 && bad.head.frameIdx == -1 && !bad.head.decoded,
      "frameless clip must surface exactly one loud fallback row")
  }

  test("MJPEG: packed banding key is exact at the Long boundary, loud past it") {
    import spark.implicits._
    // the largest packable clip id: id * 1e6 + frameIdx brushes
    // Long.MaxValue. Integer `div` must recover BOTH huge ids exactly —
    // the old double-division unpack loses the last bits past 2^53 and
    // can return the NEIGHBOURING clip id.
    val big = Multimodal.MaxVideoClipId
    val fh = Seq(
      Multimodal.FrameHash(big, 0, 1, Some(0x1234L), decoded = true),
      Multimodal.FrameHash(big - 1L, 0, 1, Some(0x1234L), decoded = true))
      .toDS()
    val rows = Multimodal.mjpegNearDupsFromHashes(fh, maxHamming = 0).collect()
    assert(rows.length == 1, s"exactly one twin pair, got ${rows.toSeq}")
    assert(rows.head.getLong(0) == big - 1L && rows.head.getLong(1) == big,
      s"unpacked clip ids must be exact at the boundary: ${rows.head}")
    // one past the bound: the pack would overflow Long — guard raises
    // instead of wrapping silently
    val over = Seq(
      Multimodal.FrameHash(big + 1L, 0, 1, Some(0L), decoded = true),
      Multimodal.FrameHash(0L, 0, 1, Some(0L), decoded = true)).toDS()
    val e = intercept[Exception] {
      Multimodal.mjpegNearDupsFromHashes(over, maxHamming = 0).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("mjpegNearDups"),
      s"overflowing clip id must raise the packing guard, got: $e")
  }
}
