package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, plus decode / fingerprint / frame-sample operators.
  *
  * Two codec tiers coexist:
  *   - `decodeStub` parses a deterministic 8-byte header (two
  *     big-endian int32s) — pure Catalyst (substring/hex/conv,
  *     codegen, no UDF), kept because its determinism is what lets
  *     the metadata/quarantine family carry full DuckDB oracles.
  *   - `dHashPixel` is a REAL decoder in the `mapMediaPartitions`
  *     slot: the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP, no external
  *     dependency) decodes the payload and the luma-grid dHash runs
  *     on actual pixels, with the byte-domain kernel as the loud
  *     fallback for undecodable payloads (audio/video/garbage).
  * `mapMediaPartitions` remains the slot for any heavier native codec
  * (per-partition init, streaming iterator, one record in flight —
  * the Scala analogue of a `mapInPandas` batch UDF).
  *
  * Scale notes: binary payloads never enter a shuffle here — metadata
  * extraction and decode are map-only; anything that must group media
  * rows should group the (id, meta/fingerprint) projection and
  * re-join the payload column.
  */
object Multimodal {

  val HeaderBytes = 8

  /** Test/fixture helper: wrap a text corpus as fake media rows —
    * header = int32(n_chars) ++ int32(id mod 2^31), payload = the
    * UTF-8 bytes. Deterministic, so oracle SQL can predict every
    * decoded field from the source columns without touching binary.
    */
  def withFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("media",
      expr(s"""to_binary(concat(
              |  lpad(conv(cast(length($textCol) AS string), 10, 16), 8, '0'),
              |  lpad(conv(cast(pmod($idCol, 2147483648) AS string), 10, 16), 8, '0'),
              |  hex(encode($textCol, 'UTF-8'))), 'hex')""".stripMargin))

  /** Stub decode: parse the 8-byte header into typed metadata columns.
    * A real build swaps the two `conv(hex(substring(...)))` lines for
    * a codec call; everything downstream (schema, grouping, sampling)
    * is codec-agnostic.
    */
  def decodeStub(df: DataFrame, mediaCol: String): DataFrame =
    df.withColumn("payload_len", length(col(mediaCol)) - HeaderBytes)
      .withColumn("h0",
        expr(s"cast(conv(hex(substring($mediaCol, 1, 4)), 16, 10) AS bigint)"))
      .withColumn("h1",
        expr(s"cast(conv(hex(substring($mediaCol, 5, 4)), 16, 10) AS bigint)"))
      .withColumn("meta", struct(
        lit("stub/v1").as("codec"),
        (lit(16) + pmod(col("h0"), lit(64))).cast("int").as("width"),
        (lit(16) + pmod(col("h1"), lit(48))).cast("int").as("height"),
        col("payload_len").cast("long").as("n_bytes")))
      .drop("h0", "h1", "payload_len")

  /** Frame sampling: split the payload (after the header) into
    * fixed-size frames and keep every `every`-th one — the
    * keyframe-extraction shape. Pure Catalyst; frames are binary
    * slices, count is ⌈payload/frameBytes⌉ before sampling.
    */
  def sampleFrames(df: DataFrame, mediaCol: String,
                   frameBytes: Int, every: Int): DataFrame =
    df.withColumn("__n",
        ceil((length(col(mediaCol)) - HeaderBytes).cast("double") / frameBytes).cast("int"))
      .withColumn("frames", expr(
        s"""transform(filter(sequence(0, __n - 1), i -> i % $every = 0),
           |  i -> substring($mediaCol, ${HeaderBytes + 1} + i * $frameBytes, $frameBytes))"""
          .stripMargin))
      .withColumn("n_frames_total", col("__n"))
      .withColumn("n_frames_kept", size(col("frames")))
      .drop("__n")

  /** One decoded media record (payload kept opaque). */
  final case class MediaRecord(id: Long, width: Int, height: Int, nBytes: Long)

  /** Partition-wise decode: the slot where a real native decoder lives.
    * Per-partition initialization happens once (the `decoder` value),
    * records stream through one at a time (bounded memory regardless
    * of partition size), and the output is a typed Dataset — the
    * Scala analogue of a batched `mapInPandas` UDF.
    */
  def mapMediaPartitions(df: DataFrame, idCol: String, mediaCol: String)
                        (decoder: Array[Byte] => (Int, Int) = stubHeaderDecoder)
  : Dataset[MediaRecord] = {
    // project BEFORE the object boundary: mapPartitions deserializes
    // whole Rows, so on a wide table the scan would read every column
    // just to decode one (the compressionRatio pruning lesson)
    val pruned = df.select(col(idCol), col(mediaCol))
    pruned.mapPartitions { rows =>
      // per-partition decoder init would go here (native lib handle)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h) = decoder(bytes)
        MediaRecord(r.getLong(0), w, h, (bytes.length - HeaderBytes).toLong)
      }
    }(Encoders.product[MediaRecord])
  }

  /** 64-bit perceptual fingerprint (dHash) of the media payload —
    * the compiled `graft_dhash64` kernel over the bytes after the
    * header. NULL on an empty payload (quarantine owns that case).
    * See functions/MediaFunctions.scala for the grid-resample design
    * and the exact-integer oracle story.
    */
  def dHash64(mediaCol: String, headerBytes: Int = HeaderBytes): Column =
    graft.functions.MediaFunctions.dhash64(col(mediaCol), headerBytes)

  /** Perceptual near-duplicate pairs over a binary media column: the
    * SimHash machinery (Dedup.simhashNearDups) re-keyed on dHash —
    * candidates from 16-bit chunk equality (pigeonhole over 4 chunks:
    * any pair within hamming ≤ 3 shares a chunk, so for
    * maxHamming ≤ 3 the banded output EQUALS the exact all-pairs
    * hamming join and carries a full DuckDB oracle), verified with
    * exact bit_count(xor). This is the "same image, lightly edited"
    * detector: the grid-resampled dHash maps a localized edit to ≤ 2
    * flipped bits (inside the default verify threshold); a uniform
    * re-encode drifts ~8 bits on byte payloads — separable from
    * unrelated content (~32) but needing a wider threshold or the
    * pHash kernel swap (see MediaFunctions) to land at ≤ 3.
    *
    * Scale shape (the simhashNearDups contract): one pass computes
    * each row's 8-byte fingerprint — the binary payload itself NEVER
    * shuffles; only (id, dhash) structs enter the bucket exchange.
    * Buckets explode pairwise bucket-locally; a degenerate corpus
    * (every image the same boilerplate logo) concentrates one bucket,
    * which the posting-cap + audit valve of the n-gram tier would
    * bound the same way if it surfaced in practice.
    *
    * Rows with NULL fingerprints (empty payloads) never pair — run
    * `quarantineMedia` first; the filter here is belt-and-braces.
    */
  def mediaNearDups(df: DataFrame, idCol: String, mediaCol: String,
                    maxHamming: Int = 2): DataFrame =
    hashNearDups(df.select(col(idCol), dHash64(mediaCol).as("dhash")),
      idCol, "dhash", maxHamming)

  /** Corrupt-media audit — the `Similarity.auditEmbeddings` pattern
    * applied to the bytes column. Adds `quarantine_reason` (NULL =
    * clean), checked in order:
    *   - null_media:        the binary column is NULL
    *   - short_header:      fewer bytes than the declared header
    *   - empty_payload:     header only, zero payload bytes
    *   - truncated_payload: payload shorter than the header's declared
    *                        length (a partial write / cut upload)
    *   - padded_payload:    payload longer than declared (trailing
    *                        garbage appended)
    * The declared length is the header's first int32 — a real codec
    * swap changes only `declaredLen` (every container format carries
    * a declared size to validate against). Pure Catalyst CASE over
    * length + the header parse; map-only, no shuffle, payloads never
    * leave their partition.
    */
  def auditMedia(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    require(!df.columns.contains("quarantine_reason"),
      "auditMedia: 'quarantine_reason' is reserved for output — rename it")
    val declared = expr(
      s"cast(conv(hex(substring($mediaCol, 1, 4)), 16, 10) AS bigint)")
    val payloadLen = (length(col(mediaCol)) - HeaderBytes).cast("long")
    df.withColumn("quarantine_reason",
      when(col(mediaCol).isNull, lit("null_media"))
        .when(length(col(mediaCol)) < HeaderBytes, lit("short_header"))
        .when(payloadLen === 0L, lit("empty_payload"))
        .when(payloadLen < declared, lit("truncated_payload"))
        .when(payloadLen > declared, lit("padded_payload"))
        .otherwise(lit(null).cast("string")))
  }

  /** The (clean, quarantined) split over `auditMedia`: clean keeps the
    * input schema and is safe for every downstream media tier;
    * quarantined rows carry their reason — loud-never-silent, nothing
    * vanishes (row conservation gated in MultimodalSpec).
    */
  def quarantineMedia(df: DataFrame, idCol: String, mediaCol: String)
  : (DataFrame, DataFrame) = {
    val a = auditMedia(df, idCol, mediaCol)
    (a.filter(col("quarantine_reason").isNull).drop("quarantine_reason"),
      a.filter(col("quarantine_reason").isNotNull))
  }

  /** The stub codec: big-endian int32 pair from the header, mapped to
    * the same (width, height) as `decodeStub` — the two paths must
    * agree, and MultimodalSpec pins that.
    */
  def stubHeaderDecoder(bytes: Array[Byte]): (Int, Int) = {
    def be32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    (16 + (be32(0) % 64).toInt, 16 + (be32(4) % 48).toInt)
  }

  /** One pixel-domain fingerprint row: `decoded` says which kernel
    * produced the hash — true ⇒ the JDK codec decoded the payload and
    * the hash is the luma-grid dHash; false ⇒ undecodable bytes fell
    * back to the byte-domain kernel (bit-identical to `dHash64`).
    * `dhash64` is None when there is NOTHING to fingerprint: a NULL
    * payload, an empty one, or one too short to strip `headerBytes`
    * from (0 < length ≤ headerBytes — the `auditMedia` short_header
    * class; a partial header is not payload, so it gets no byte-
    * kernel fallback either). Run `quarantineMedia` first if those
    * rows need their own loud disposition.
    */
  final case class PixelHash(id: Long, dhash64: Option[Long], decoded: Boolean)

  /** Pixel-domain perceptual fingerprint over a binary media column —
    * the REAL codec in the `mapMediaPartitions` slot: decode the
    * payload with the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP ship in
    * every JVM — no new dependency), compute the luma-grid dHash
    * (`MediaFunctions.dhash64Pixels`), and fall back to the
    * byte-domain kernel for payloads ImageIO can't decode (the stub
    * corpus, audio, video) — marked `decoded = false`, LOUD, so a
    * caller never mistakes a byte fingerprint for a perceptual one.
    *
    * This closes the byte-kernel's documented blind spot: a
    * quality-shifted re-encode (PNG → JPEG) rewrites every payload
    * byte — the byte dHash lands ~32 bits away, invisible — but
    * leaves 8×9-cell luma means nearly untouched, so the pixel dHash
    * lands within a small hamming ball (≤ 3, gated in MultimodalSpec)
    * and the banding machinery (`mediaNearDups`' 16-bit chunks)
    * surfaces the pair.
    *
    * Scale shape: map-only — decode happens where the payload already
    * sits, one record in flight per task (ImageIO streams from a
    * ByteArrayInputStream; the decoded raster is freed per record),
    * and only the 8-byte fingerprint ever enters a downstream
    * shuffle. `headerBytes` skips a container prefix (0 for real
    * image files; `HeaderBytes` for the stub corpus).
    */
  def dHashPixel(df: DataFrame, idCol: String, mediaCol: String,
                 headerBytes: Int = 0): Dataset[PixelHash] =
    fingerprintPartitions(df, idCol, mediaCol, headerBytes, "dHashPixel")(
      imageDecode(graft.functions.MediaFunctions.dhash64Pixels))

  /** DCT pHash over decoded pixels — the documented "production
    * kernel swap" for DISTORTION-HEAVY corpora: low-frequency DCT
    * energy survives aggressive JPEG quantization and resampling that
    * starts to smear the gradient dHash's 8×9 cell means. SAME
    * plumbing as `dHashPixel` (ONLY the kernel differs — the swap the
    * family scaladocs promise), same byte-kernel fallback contract,
    * same `hashNearDups` banding downstream.
    */
  def pHashPixel(df: DataFrame, idCol: String, mediaCol: String,
                 headerBytes: Int = 0): Dataset[PixelHash] =
    fingerprintPartitions(df, idCol, mediaCol, headerBytes, "pHashPixel")(
      imageDecode(graft.functions.MediaFunctions.phash64Pixels))

  /** Decode-to-hash closure for the image kernels: ImageIO parse +
    * the given pixel kernel, None when the codec can't decode. The
    * catch is NonFatal, not just IOException — JDK ImageIO plugin
    * readers are known to throw unchecked exceptions
    * (ArrayIndexOutOfBounds / NegativeArraySize / IllegalArgument) on
    * structurally corrupt GIF/JPEG/BMP payloads, and ONE such record
    * in a real corpus must quarantine, never kill the job.
    */
  private def imageDecode(kernel: java.awt.image.BufferedImage => Long)
  : Array[Byte] => Option[Long] = payload =>
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img != null && img.getWidth > 0 && img.getHeight > 0)
        Some(kernel(img))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Shared two-tier fingerprint skeleton: `decode` returns the
    * modality kernel's hash when the payload decodes (⇒ decoded =
    * true), None otherwise — and the byte-domain kernel fingerprints
    * the raw payload as the LOUD fallback tier. Every modality
    * operator (pixel dHash, DCT pHash, audio) is this skeleton with a
    * different closure, so the null/header/fallback contract lives in
    * exactly one place.
    */
  private def fingerprintPartitions(df: DataFrame, idCol: String,
      mediaCol: String, headerBytes: Int, op: String)
      (decode: Array[Byte] => Option[Long]): Dataset[PixelHash] = {
    require(headerBytes >= 0, s"$op: headerBytes >= 0, got $headerBytes")
    // project BEFORE the object boundary: mapPartitions deserializes
    // whole Rows, so on a wide table the scan would read every column
    // just to fingerprint one (the compressionRatio pruning lesson)
    val pruned = df.select(col(idCol), col(mediaCol))
    val idIdx = 0
    val mIdx = 1
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.length <= headerBytes)
          PixelHash(id, None, decoded = false)
        else {
          val payload =
            if (headerBytes == 0) bytes
            else java.util.Arrays.copyOfRange(bytes, headerBytes, bytes.length)
          decode(payload) match {
            case Some(h) => PixelHash(id, Some(h), decoded = true)
            case None => PixelHash(id,
              Option(graft.functions.MediaFunctions.dhash64Bytes(payload, 0))
                .map(Long.unbox),
              decoded = false)
          }
        }
      }
    }(Encoders.product[PixelHash])
  }

  /** Column-APPENDING pixel fingerprint: adds `outCol` (nullable
    * long) and `outCol_decoded` (boolean) while keeping every input
    * column — the shape a STREAMING consumer needs (the Dataset-typed
    * `dHashPixel` projects the row down to PixelHash, losing the
    * event-time column a watermark rides on). A Scala UDF is the
    * right tool here, not a Catalyst expression: the work is
    * codec-bound (ImageIO decode), so codegen has nothing to win.
    * Same two-tier contract as `dHashPixel`: decoded pixel hash, or
    * the byte-kernel fallback with decoded = false, NULL on empty.
    */
  def withPixelHash(df: DataFrame, mediaCol: String, outCol: String): DataFrame = {
    for (c <- Seq(outCol, s"${outCol}_decoded", "__ph")
        if df.columns.contains(c))
      require(false, s"withPixelHash: '$c' already exists — rename it")
    val dec = imageDecode(graft.functions.MediaFunctions.dhash64Pixels)
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null || bytes.isEmpty) (None: Option[Long], false)
      else dec(bytes) match {
        case Some(h) => (Some(h), true)
        case None =>
          (Option(graft.functions.MediaFunctions.dhash64Bytes(bytes, 0))
            .map(Long.unbox), false)
      })
    df.withColumn("__ph", f(col(mediaCol)))
      .withColumn(outCol, col("__ph._1"))
      .withColumn(s"${outCol}_decoded", col("__ph._2"))
      .drop("__ph")
  }

  /** Hamming near-dup pairs over a PRECOMPUTED 64-bit fingerprint
    * column — `mediaNearDups`' banding machinery factored out so the
    * pixel-domain hash (`dHashPixel`) rides the same chunks:
    * candidates ONLY from 16-bit chunk equality (pigeonhole over 4
    * chunks makes the banding COMPLETE for maxHamming ≤ 3), verified
    * with exact bit_count(xor). NULL fingerprints never pair.
    */
  def hashNearDups(hashed0: DataFrame, idCol: String, hashCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"hashNearDups: the 4-chunk banding is complete only for " +
        s"maxHamming <= 3, got $maxHamming")
    // r18: pair generation is a compiled (chunk, chunk_val) self-join
    // of the posting frame, not collect_list + the interpreted
    // bucketPairs HOF explode — same pairs (l.id < r.id rides the join
    // condition; collect-verified equal), but whole-stage-codegen'd
    // and without materializing hot buckets as single giant arrays
    // (the synthetic-image fixture has 875-item buckets; the sort +
    // per-pair struct allocation was the dominant cost, 1.39 s ->
    // 0.85 s on the sf0.1 pixel tier). The posting frame is
    // checkpointed so the fingerprint kernel above it runs once, not
    // once per join side.
    val hashed = hashed0
      .select(col(idCol), col(hashCol).as("__dh"))
      .filter(col("__dh").isNotNull)
    val posts = hashed.select(col(idCol).as("id"), col("__dh").as("dh"),
        posexplode(expr("transform(sequence(0, 3), c -> shiftright(__dh, c * 16) & 65535)")))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
      .localCheckpoint()
    posts.as("a").join(posts.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        expr("bit_count(a.dh ^ b.dh)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** AUDIO fingerprint over a binary media column — the third modality
    * of the family, same two-tier codec story as the pixel path: the
    * JDK's `javax.sound.sampled` (WAV/AIFF/AU PCM ship in every JVM —
    * no new dependency) decodes the payload, channels are mixed to
    * their per-frame channel SUM (sum, not mean — see `decodePcm16`:
    * the sum commutes exactly with an integer gain where a truncating
    * mean does not, and the kernel is scale-free so the constant
    * factor is invisible), and the energy-gradient kernel
    * (`MediaFunctions.ahash64Samples`) fingerprints the |amplitude|
    * envelope on the shared 8×9 grid. The kernel's headline law:
    * an exact integer GAIN change — the loudness-normalized re-master,
    * audio's most common near-duplicate — preserves the fingerprint
    * BIT-FOR-BIT for mono AND multichannel PCM (volume is a common
    * factor of every cross-multiplied comparison), and the
    * relative-position grid absorbs resampling the way the pixel
    * grid absorbs a resize. Non-PCM16 encodings and
    * undecodable payloads fall back to the byte kernel LOUD
    * (`decoded = false`), the dHashPixel contract; downstream banding
    * is the same `hashNearDups`.
    *
    * Scale shape: map-only decode where the payload sits (the frame
    * buffer is the record's own bytes, one record in flight); only
    * the 8-byte fingerprint enters any shuffle.
    */
  def audioHash(df: DataFrame, idCol: String, mediaCol: String,
                headerBytes: Int = 0): Dataset[PixelHash] =
    fingerprintPartitions(df, idCol, mediaCol, headerBytes, "audioHash")(
      payload => Option(decodePcm16(payload))
        .flatMap(s => Option(graft.functions.MediaFunctions.ahash64Samples(s))
          .map(Long.unbox)))

  /** JDK-codec PCM decode: 16-bit signed PCM only (the WAV/AIFF
    * reality `javax.sound.sampled` parses without extra providers);
    * channels mix to their per-frame channel SUM — not the mean:
    * a truncating mean division does NOT commute with an integer
    * gain (acc = -3, nch = 2: gain-2 pre-mix gives -3, post-mix -2),
    * which would break the kernel's bit-for-bit gain law exactly on
    * the multichannel inputs it is advertised for. The sum commutes
    * with gain EXACTLY, and the energy kernel is scale-free by
    * 128-bit cross-multiplication, so sum vs mean changes nothing
    * else (for mono they are identical). Returns null for anything
    * the codec can't decode — the caller's fallback owns that case.
    */
  private def decodePcm16(payload: Array[Byte]): Array[Int] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val f = ais.getFormat
      val frames = ais.getFrameLength
      if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        f.getSampleSizeInBits != 16 || frames <= 0 || frames > Int.MaxValue / 4)
        null
      else {
        val nch = f.getChannels
        val big = f.isBigEndian
        val data = ais.readAllBytes()
        val n = math.min(frames.toInt, data.length / (2 * nch))
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          var acc = 0
          var c = 0
          while (c < nch) {
            val off = (i * nch + c) * 2
            val v =
              if (big) (data(off) << 8) | (data(off + 1) & 0xff)
              else (data(off + 1) << 8) | (data(off) & 0xff)
            acc += v
            c += 1
          }
          samples(i) = acc
          i += 1
        }
        samples
      }
    } catch {
      // NonFatal, not just the two checked exceptions: audio plugin
      // readers can throw unchecked on structurally corrupt payloads
      // (the imageDecode rationale) — corrupt records quarantine,
      // never kill the job
      case scala.util.control.NonFatal(_) => null
    }

  /** Deterministic synthetic PCM for the audio fixtures: one second
    * of 8 kHz mono — three carriers at id-derived frequencies, each
    * AMPLITUDE-MODULATED by a slow id-derived envelope (1-7 Hz). The
    * modulation is the point: the energy kernel fingerprints the
    * |amplitude| ENVELOPE, so content must vary its loudness over
    * time the way real audio does — a steady tone has a flat envelope
    * whose cell means are all near-ties, fingerprint-degenerate by
    * nature (the same reason a solid-gray image has no usable dHash).
    */
  def synthPcm(id: Long): Array[Int] = {
    val n = 8000
    val h = id * 0x9E3779B97F4A7C15L
    val freqs = Array.tabulate(3)(k =>
      200 + Math.floorMod(h >>> (16 * k), 1800L).toInt)
    // shifts stay strictly under 64: the JVM masks long shifts mod 64,
    // so a shift of 64 would alias onto the LOW bits freqs(0) samples.
    // Envelope space: mod frequency in 0.125 Hz steps (56 values per
    // carrier) PLUS an id-derived phase (16 values) — the kernel
    // fingerprints ONLY the envelope, so a coarse mod space (the
    // original 7 integer frequencies, 343 combos) birthday-collides
    // on corpora of a few hundred clips and distinct ids merge in the
    // capstone's near-dup pass; 56³·16³ combos push the expected
    // collision count on a 10³-clip corpus below one.
    val mods = Array.tabulate(3)(k =>
      (1 + Math.floorMod(h >>> (8 * k + 40), 56L).toInt) / 8.0)
    val phases = Array.tabulate(3)(k =>
      Math.floorMod(h >>> (4 * k + 20), 16L).toInt * math.Pi / 8.0)
    Array.tabulate(n) { i =>
      var s = 0
      var k = 0
      while (k < 3) {
        val env = 1500.0 * (1.0 +
          math.sin(2.0 * math.Pi * mods(k) * i / 8000.0 + phases(k)))
        s += (env * math.sin(2.0 * math.Pi * freqs(k) * i / 8000.0)).toInt
        k += 1
      }
      s
    }
  }

  /** `synthPcm` encoded as WAV (lossless PCM roundtrip), with the
    * base samples scaled by an exact integer `gain` so a gain-2
    * twin's samples are EXACTLY 2× the original's — the kernel's
    * volume-invariance law executable bit-for-bit end to end.
    */
  def synthWav(id: Long, gain: Int = 1): Array[Byte] = {
    require(gain >= 1 && gain <= 3, s"synthWav: gain in [1, 3], got $gain")
    val base = synthPcm(id)
    val n = base.length
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = base(i) * gain
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic synthetic PHOTO-LIKE image for the pixel-kernel
    * fixtures and the harness query: a 72×72 grayscale frame built
    * from exact integer arithmetic on the id — a diagonal luminance
    * ramp plus three soft radial blobs at id-derived positions (the
    * Weyl-mix constants the samplers use). Smooth content is the
    * point: JPEG re-encoding perturbs pixels but not 8×9-cell means,
    * while different ids move the blobs and flip many gradient signs
    * — the separation `MultimodalSpec` gates. Encoded as PNG
    * (lossless), so the decoded raster — and therefore the pixel
    * dHash — is a pure function of the id.
    */
  def synthImage(id: Long): Array[Byte] = {
    val side = 72
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // 64-bit Weyl multiply, positions from disjoint shifted fields:
    // a small-modulus linear mix (the 16-bit sampler bucket) would
    // alias ids mod a short period into IDENTICAL images
    val h = id * 0x9E3779B97F4A7C15L
    val cxs = Array.tabulate(3)(k => Math.floorMod(h >>> (20 * k), side.toLong).toInt)
    val cys = Array.tabulate(3)(k => Math.floorMod(h >>> (20 * k + 10), side.toLong).toInt)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        var luma = (x + y) / 2
        var k = 0
        while (k < 3) {
          val dx = x - cxs(k)
          val dy = y - cys(k)
          val d2 = dx * dx + dy * dy
          if (d2 < 576) luma += 200 - d2 / 3
          k += 1
        }
        if (luma > 255) luma = 255
        img.setRGB(x, y, (luma << 16) | (luma << 8) | luma)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Quality-shifted re-encode: decode any image payload and re-write
    * it as JPEG with the JDK encoder's default quality — the most
    * common real-world media near-duplicate (same picture, different
    * compression), which rewrites every byte while preserving
    * perceptual content. Fixture arm of the pixel-kernel gates.
    */
  def reencodeJpeg(imageBytes: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(imageBytes))
    require(img != null, "reencodeJpeg: input is not a decodable image")
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Quality-explicit variant: the LOW-quality arm of the re-encode
    * fixtures (quality ∈ (0, 1]) — aggressive quantization is where
    * the DCT pHash earns its keep over the gradient dHash.
    */
  def reencodeJpeg(imageBytes: Array[Byte], quality: Float): Array[Byte] = {
    require(quality > 0f && quality <= 1f,
      s"reencodeJpeg: quality in (0, 1], got $quality")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(imageBytes))
    require(img != null, "reencodeJpeg: input is not a decodable image")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  /** Stereo twin of `synthWav`: channel 0 carries `synthPcm(id)`,
    * channel 1 carries `synthPcm(id + 1)` halved — DIFFERENT content
    * per channel, chosen so per-frame channel sums are frequently ODD
    * (a truncating mean mix would NOT commute with gain on them; the
    * sum mix does, exactly — the law `MultimodalSpec` gates on this
    * fixture). Interleaved little-endian PCM16 WAV, integer `gain`
    * applied to both channels pre-encode.
    */
  def synthWavStereo(id: Long, gain: Int = 1): Array[Byte] = {
    require(gain >= 1 && gain <= 3, s"synthWavStereo: gain in [1, 3], got $gain")
    val ch0 = synthPcm(id)
    val ch1 = synthPcm(id + 1).map(_ / 2)
    val n = ch0.length
    val pcm = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val s0 = ch0(i) * gain
      val s1 = ch1(i) * gain
      pcm(4 * i) = (s0 & 0xff).toByte
      pcm(4 * i + 1) = ((s0 >> 8) & 0xff).toByte
      pcm(4 * i + 2) = (s1 & 0xff).toByte
      pcm(4 * i + 3) = ((s1 >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // ----------------------------------------------------------------
  // VIDEO modality: MJPEG (concatenated JFIF frames) — the container
  // the already-shipped JDK image codec can actually decode, so the
  // keyframe-extract → pixel-hash → near-dup path is JDK-only.
  // ----------------------------------------------------------------

  /** Split an MJPEG payload — back-to-back complete JPEG images, the
    * classic motion-JPEG stream — into its frames with a SEGMENT-AWARE
    * walk, not a raw FFD9 scan: each frame's marker segments are
    * stepped by their declared 2-byte lengths (APPn/COM/DQT/DHT/SOF/
    * DRI/...), the entropy-coded data after an SOS is crossed on the
    * byte-stuffing argument (FF is always FF00 inside a scan and only
    * RSTn markers are legal there), and only the EOI reached at the
    * frame's own structural level ends it. The length-honoring walk
    * is what makes this exact even when an APPn segment carries
    * arbitrary binary — the classic trap is an EXIF-embedded
    * THUMBNAIL, itself a complete JPEG whose EOI a raw marker scan
    * mistakes for the frame's end (executed law: a thumbnail-bearing
    * frame splits at its true boundary). Fill bytes (FF padding
    * before a marker) are stepped over.
    *
    * A frame the walk cannot complete — SOI with no EOI (the cut
    * upload), a declared length running past the buffer, a nested
    * SOI, a desync — DROPS that frame and everything after it (the
    * truncated-tail rule generalized: past a malformed frame the
    * stream has no trustworthy resync point; scanning ahead for the
    * next FFD8 would happily "find" one inside the garbage). The
    * caller sees the deficit in the frame counts, and
    * `videoKeyframeHashes` surfaces wholly frameless payloads as the
    * loud byte-fallback row.
    */
  def splitMjpeg(payload: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val frames = scala.collection.immutable.IndexedSeq.newBuilder[Array[Byte]]
    val n = payload.length
    def u8(k: Int): Int = payload(k) & 0xff
    var i = 0
    var halted = false
    while (!halted && i + 1 < n) {
      if (u8(i) == 0xff && u8(i + 1) == 0xd8) {
        var j = i + 2
        var end = -1
        var bad = false
        while (!bad && end < 0) {
          if (j + 1 >= n) bad = true // ran off the buffer: truncated
          else if (u8(j) != 0xff) bad = true // desync: a marker must start here
          else u8(j + 1) match {
            case 0xd9 => end = j + 2 // EOI at the frame's own level
            case 0xd8 => bad = true // nested SOI: malformed
            case 0xff => j += 1 // fill byte before a marker
            case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
              j += 2 // standalone markers (TEM, RSTn)
            case m =>
              if (j + 3 >= n) bad = true
              else {
                val len = (u8(j + 2) << 8) | u8(j + 3)
                if (len < 2 || j + 2 + len > n) bad = true
                else if (m == 0xda) {
                  // SOS: cross the entropy-coded data to the next
                  // structural marker (FF followed by neither the 00
                  // stuffing nor an RSTn)
                  var k = j + 2 + len
                  var found = -1
                  while (found < 0 && k + 1 < n) {
                    if (u8(k) == 0xff && u8(k + 1) != 0x00 &&
                      !(u8(k + 1) >= 0xd0 && u8(k + 1) <= 0xd7)) found = k
                    else k += 1
                  }
                  if (found < 0) bad = true else j = found
                } else j = j + 2 + len
              }
          }
        }
        if (end > 0) {
          frames += java.util.Arrays.copyOfRange(payload, i, end)
          i = end
        } else halted = true // malformed/truncated: drop it and the rest
      } else i += 1
    }
    frames.result()
  }

  /** Fixture arm of the thumbnail trap: insert an APP1 segment whose
    * payload embeds a COMPLETE second JPEG (the EXIF-thumbnail shape)
    * right after the host frame's SOI. ImageIO skips the unknown APP1
    * by its declared length, so the host still decodes to the same
    * raster — but the embedded EOI sits mid-frame, which is exactly
    * what a raw FFD9 scan trips over and the segment walk must not.
    */
  def withExifThumbnail(jpeg: Array[Byte], thumb: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "withExifThumbnail: host must start with SOI")
    val header =
      "Exif".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
        Array[Byte](0, 0)
    val len = header.length + thumb.length + 2
    require(len <= 0xffff, s"withExifThumbnail: APP1 payload too large ($len)")
    val out = new java.io.ByteArrayOutputStream()
    out.write(jpeg, 0, 2)
    out.write(0xff); out.write(0xe1)
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(header, 0, header.length)
    out.write(thumb, 0, thumb.length)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** One keyframe fingerprint row. `frameIdx` is the frame's position
    * in the CONTAINER (so `every`-sampling is reconstructible),
    * `nFrames` the clip's total; the hash/decoded contract is the
    * `PixelHash` one per frame. A payload with NO extractable frames
    * emits a single row (frameIdx = -1, byte-kernel hash, decoded =
    * false) — frameless clips quarantine loudly instead of vanishing.
    */
  final case class FrameHash(id: Long, frameIdx: Int, nFrames: Int,
                             dhash64: Option[Long], decoded: Boolean)

  /** Keyframe extraction over an MJPEG binary column: split each clip
    * into frames, keep every `every`-th one (the `sampleFrames`
    * cadence, now on a REAL container), decode each kept frame with
    * the JDK codec and pixel-hash it (`MediaFunctions.dhash64Pixels`).
    * A kept frame the codec refuses falls back to the byte kernel
    * LOUD (`decoded = false`) — the `dHashPixel` two-tier contract,
    * per frame.
    *
    * Scale shape: map-only — the clip bytes are split and decoded
    * where they sit, one clip in flight per task, and ONLY the
    * (id, frameIdx, 8-byte hash) rows leave the map side; the clip
    * payload never enters a shuffle. Frame explosion is bounded by
    * the sampling cadence, not the container size.
    */
  def videoKeyframeHashes(df: DataFrame, idCol: String, mediaCol: String,
                          every: Int, headerBytes: Int = 0): Dataset[FrameHash] = {
    require(every >= 1, s"videoKeyframeHashes: every >= 1, got $every")
    require(headerBytes >= 0,
      s"videoKeyframeHashes: headerBytes >= 0, got $headerBytes")
    // project BEFORE the object boundary (the compressionRatio
    // pruning lesson): only (id, clip) reaches the deserializer
    val pruned = df.select(col(idCol), col(mediaCol))
    val idIdx = 0
    val mIdx = 1
    val dec = imageDecode(graft.functions.MediaFunctions.dhash64Pixels)
    pruned.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.length <= headerBytes)
          Iterator(FrameHash(id, -1, 0, None, decoded = false))
        else {
          val payload =
            if (headerBytes == 0) bytes
            else java.util.Arrays.copyOfRange(bytes, headerBytes, bytes.length)
          val frames = splitMjpeg(payload)
          if (frames.isEmpty)
            Iterator(FrameHash(id, -1, 0,
              Option(graft.functions.MediaFunctions.dhash64Bytes(payload, 0))
                .map(Long.unbox), decoded = false))
          else frames.iterator.zipWithIndex.collect {
            case (f, idx) if idx % every == 0 =>
              dec(f) match {
                case Some(h) =>
                  FrameHash(id, idx, frames.length, Some(h), decoded = true)
                case None => FrameHash(id, idx, frames.length,
                  Option(graft.functions.MediaFunctions.dhash64Bytes(f, 0))
                    .map(Long.unbox), decoded = false)
              }
          }
        }
      }
    }(Encoders.product[FrameHash])
  }

  /** SCENE-CHANGE keyframe selection over an MJPEG binary column —
    * the content-driven alternative to `videoKeyframeHashes`'s fixed
    * cadence: every frame is decoded, its exact 8×8 integer mean-luma
    * grid (`MediaFunctions.lumaGrid64`) is compared to the
    * IMMEDIATELY PREVIOUS frame's, and a frame is kept iff it opens
    * the clip or its L1 grid distance ≥ `minSceneDiff` (a scene cut).
    * Repeated/static frames inside a scene are skipped — distance 0
    * by the exact-integer grid contract.
    *
    * The property this buys over cadence sampling is ALIGNMENT
    * INVARIANCE: cadence keyframes are positional (frames 0, k, 2k…),
    * so a twin clip missing ONE lead-in frame samples entirely
    * different content and `mjpegNearDups` can miss it outright; scene
    * keyframes are chosen by CONTENT, so the same cuts are selected at
    * shifted positions and the twin still pairs at full support —
    * executed law in MultimodalSpec (the cadence arm demonstrably
    * misses the same planted twin).
    *
    * Contract mirrors `videoKeyframeHashes`: null/short payload and
    * frameless clips quarantine as ONE loud fallback row; a mid-clip
    * frame the codec refuses is emitted LOUD (byte-kernel hash,
    * decoded = false) and treated as an unknown cut — the scene state
    * resets, so the next decodable frame starts a new scene rather
    * than silently extending the last one.
    *
    * Scale shape: map-only like the cadence arm — decode happens where
    * the clip sits, one clip in flight per task, and only (id,
    * frameIdx, 8-byte hash) rows leave the map side. The arm decodes
    * EVERY frame (that is what content selection costs) but emits only
    * scene starts, so the banding exchange is bounded by the clip's
    * CUT count, not its length — on real footage (long static scenes)
    * strictly fewer rows than any cadence that could catch the cuts.
    */
  def videoSceneKeyframeHashes(df: DataFrame, idCol: String,
      mediaCol: String, minSceneDiff: Long,
      headerBytes: Int = 0): Dataset[FrameHash] = {
    require(minSceneDiff >= 1L,
      s"videoSceneKeyframeHashes: minSceneDiff >= 1, got $minSceneDiff")
    require(headerBytes >= 0,
      s"videoSceneKeyframeHashes: headerBytes >= 0, got $headerBytes")
    val pruned = df.select(col(idCol), col(mediaCol))
    pruned.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.length <= headerBytes)
          Iterator(FrameHash(id, -1, 0, None, decoded = false))
        else {
          val payload =
            if (headerBytes == 0) bytes
            else java.util.Arrays.copyOfRange(bytes, headerBytes, bytes.length)
          val frames = splitMjpeg(payload)
          if (frames.isEmpty)
            Iterator(FrameHash(id, -1, 0,
              Option(graft.functions.MediaFunctions.dhash64Bytes(payload, 0))
                .map(Long.unbox), decoded = false))
          else {
            var prev: Array[Long] = null
            frames.iterator.zipWithIndex.flatMap { case (f, idx) =>
              val img =
                try {
                  val i = javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(f))
                  if (i != null && i.getWidth > 0 && i.getHeight > 0) i
                  else null
                } catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) {
                prev = null // unknown cut: next decodable frame is kept
                Iterator(FrameHash(id, idx, frames.length,
                  Option(graft.functions.MediaFunctions.dhash64Bytes(f, 0))
                    .map(Long.unbox), decoded = false))
              } else {
                val grid = graft.functions.MediaFunctions.lumaGrid64(img)
                val cut = prev == null ||
                  graft.functions.MediaFunctions.lumaGridDist(prev, grid) >=
                    minSceneDiff
                prev = grid
                if (cut)
                  Iterator(FrameHash(id, idx, frames.length,
                    Some(graft.functions.MediaFunctions.dhash64Pixels(img)),
                    decoded = true))
                else Iterator.empty
              }
            }
          }
        }
      }
    }(Encoders.product[FrameHash])
  }

  /** Frame positions fit under this bound so (clip, frame) packs into
    * one long for the banding join — an MJPEG container holding a
    * million frames is a caller error, not a workload.
    */
  val MaxVideoFrames = 1000000L

  /** Largest clip id that packs into a long without overflow:
    * `id * MaxVideoFrames + (MaxVideoFrames - 1) <= Long.MaxValue`.
    * The packing guard in `mjpegNearDupsFromHashes` raises on anything
    * above this — `id * 1e6` silently wraps for ids past ~9.2e12, and
    * the double-division unpack would already mangle ids past ~9.0e9
    * (2^53 / 1e6) — both failure modes are loud, not silent.
    */
  val MaxVideoClipId: Long = (Long.MaxValue - (MaxVideoFrames - 1L)) / MaxVideoFrames

  /** Clip-level perceptual near-duplicates over an MJPEG column: two
    * clips pair when at least `minFramePairs` of their decoded
    * keyframes land within `maxHamming` (the same-footage-re-encoded
    * detector), with the matching-keyframe-pair count and the best
    * (minimum) hamming as evidence. `minFramePairs` defaults to 1
    * (any keyframe match); a corpus of visually-similar footage
    * should require 2+ — a SINGLE hamming-3 frame match between
    * otherwise-unrelated clips is a poster-frame coincidence, and
    * the measured fixture produced exactly that (two 1-frame chance
    * pairs across ~150 synthetic frames) while every true re-encoded
    * twin matched on ALL its keyframes. Candidates ride the same
    * complete-for-≤3 16-bit chunk banding as every other fingerprint
    * family (`hashNearDups`) over (clip, frame)-packed keys; only
    * decoded frames pair (a byte-fallback frame hash is not
    * perceptual evidence). Self-pairs within one clip are dropped
    * AFTER the banding join — near-identical frames inside a single
    * clip are normal footage, not duplication.
    *
    * Scale shape: the clip payload never shuffles (the
    * `videoKeyframeHashes` contract); the banding exchange carries
    * (packed id, 8-byte hash) rows bounded by keyframe cadence; the
    * final clip-pair collapse is a partial-aggregated groupBy.
    */
  def mjpegNearDups(df: DataFrame, idCol: String, mediaCol: String,
                    every: Int, maxHamming: Int = 3,
                    headerBytes: Int = 0, minFramePairs: Long = 1L): DataFrame =
    mjpegNearDupsFromHashes(
      videoKeyframeHashes(df, idCol, mediaCol, every, headerBytes),
      maxHamming, minFramePairs)

  /** The hash-level arm of `mjpegNearDups`, for callers that have the
    * keyframe fingerprints materialized (the capstone decodes ONCE
    * and feeds both this and the clip-status scan — the composition
    * the `mjpegNearDups` scaladoc tells a production pipeline to
    * run). Same contract from the hashes on.
    */
  def mjpegNearDupsFromHashes(fh0: Dataset[FrameHash], maxHamming: Int,
                              minFramePairs: Long = 1L): DataFrame = {
    require(minFramePairs >= 1L,
      s"mjpegNearDups: minFramePairs >= 1, got $minFramePairs")
    val fh = fh0.filter(col("decoded"))
    // loud contract, enforced IN-PLAN (no extra decode pass): ids must
    // be nonnegative and frame index under the packing bound, else two
    // distinct (clip, frame) keys would collide silently
    val packed = fh.select(
      when(col("id").between(0L, MaxVideoClipId) &&
          col("frameIdx") < lit(MaxVideoFrames),
        col("id") * lit(MaxVideoFrames) + col("frameIdx"))
        .otherwise(expr(
          s"raise_error('mjpegNearDups: clip ids must be in [0, " +
            s"$MaxVideoClipId] and frame index < $MaxVideoFrames to " +
            "pack into the banding key')").cast("long")).as("fk"),
      col("dhash64").as("dh"))
    // integer `div`, not `/`: double division loses exactness past 2^53
    hashNearDups(packed, "fk", "dh", maxHamming)
      .select(expr(s"id_a div ${MaxVideoFrames}L").as("clip_a"),
        expr(s"id_b div ${MaxVideoFrames}L").as("clip_b"),
        col("hamming"))
      .filter(col("clip_a") =!= col("clip_b"))
      .select(least(col("clip_a"), col("clip_b")).as("id_a"),
        greatest(col("clip_a"), col("clip_b")).as("id_b"),
        col("hamming"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_frame_pairs"),
        min(col("hamming")).as("min_hamming"))
      .filter(col("n_frame_pairs") >= minFramePairs)
  }

  /** MJPEG fixture: the ids' `synthImage` frames, each JPEG-encoded,
    * concatenated — a deterministic motion-JPEG clip whose k-th frame
    * is a pure function of `frameIds(k)`.
    */
  def synthMjpeg(frameIds: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frameIds.foreach(id => out.write(reencodeJpeg(synthImage(id))))
    out.toByteArray
  }

  /** Re-encode fixture arm for clips: every frame decoded and re-
    * written at the given JPEG quality — same footage, different
    * compression, the clip-level near-duplicate `mjpegNearDups` is
    * built to catch.
    */
  def reencodeMjpeg(clip: Array[Byte], quality: Float): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    splitMjpeg(clip).foreach(f => out.write(reencodeJpeg(f, quality)))
    out.toByteArray
  }
}
