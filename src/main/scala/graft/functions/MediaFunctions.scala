package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Compiled perceptual-fingerprint kernels for opaque media columns.
  *
  * The reference pipeline stops at text; the multimodal family treats
  * image/audio/video as `binary` payloads (llm/Multimodal.scala), and
  * near-duplicate detection over those payloads needs a fingerprint
  * that is (a) robust to small local edits and uniform re-encodes,
  * (b) a fixed-width integer so the SimHash hamming-banding machinery
  * (llm/Dedup.scala simhashNearDups) applies unchanged, and (c) pure
  * deterministic integer arithmetic so a DuckDB oracle can replay it
  * bit-for-bit. dHash (difference hash — the gradient variant of the
  * classic aHash/pHash family) fits all three; a production build
  * would swap the byte grid for decoded luma pixels (pHash's DCT is
  * the other standard choice), and ONLY this kernel changes — the
  * banding, verification, and quarantine plumbing downstream are
  * fingerprint-agnostic.
  */
object MediaFunctions {

  /** 64-bit dHash of the payload bytes after `offset` header bytes.
    * NULL on an empty payload (no content has no fingerprint — the
    * quarantine tier owns that case, CASE-not-filter discipline).
    */
  def dhash64(bytes: Column, offset: Int): Column =
    GraftBridge.column(DHash64Expr(GraftBridge.expression(bytes), offset))

  /** The byte-domain dHash kernel as a plain function — the SAME loop
    * `DHash64Expr` compiles, exposed so the pixel-domain path
    * (`Multimodal.dHashPixel`) can fall back to it for undecodable
    * payloads with bit-identical results. Returns null (boxed) on an
    * empty payload, mirroring the expression's NULL contract.
    */
  def dhash64Bytes(bytes: Array[Byte], offset: Int): java.lang.Long = {
    val n = bytes.length - offset
    if (n <= 0) return null
    val s = new Array[Long](72)
    val l = new Array[Long](72)
    var i = 0
    while (i < n) {
      val k = ((i.toLong * 72L) / n).toInt
      s(k) += (bytes(offset + i) & 0xff).toLong
      l(k) += 1L
      i += 1
    }
    foldGrid(s, l)
  }

  /** 64-bit PIXEL-DOMAIN dHash of a decoded image: integer BT.601
    * luma (⌊(299R + 587G + 114B) / 1000⌋ ∈ [0,255]) resampled onto
    * the same 8×9 grid by relative position (pixel (x,y) of a w×h
    * image lands in cell (⌊y·8/h⌋, ⌊x·9/w⌋) — length-invariant like
    * the byte kernel, so a resize moves cell membership only at ⌊⌋
    * boundary slivers), then bit (r,c) = 1 iff mean(cell[r][c]) >
    * mean(cell[r][c+1]) via the same cross-multiplied exact-integer
    * comparison. This is the TRUE perceptual dHash: a quality-shifted
    * re-encode (JPEG) perturbs individual pixels but barely moves
    * 8×9-cell luma MEANS, so the re-encoded twin lands within a small
    * hamming ball of the original — the case the byte-domain kernel
    * is blind to (a re-encode rewrites every byte).
    *
    * Overflow-safe: luma ≤ 255 and each cell holds ≤ (h/8+1)(w/9+1)
    * pixels, so s·l ≤ 255·(n/72 + n/9 + 1)² stays inside Int64 for
    * any JVM image (n = w·h < 2³¹).
    */
  def dhash64Pixels(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val s = new Array[Long](72)
    val l = new Array[Long](72)
    var y = 0
    while (y < h) {
      val row = (y.toLong * 8L / h).toInt * 9
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)) / 1000L
        val k = row + (x.toLong * 9L / w).toInt
        s(k) += luma
        l(k) += 1L
        x += 1
      }
      y += 1
    }
    foldGrid(s, l)
  }

  /** Exact 8×8 integer mean-luma grid: BT.601 integer luma summed per
    * relative-position cell, floor-divided by the cell's pixel count.
    * The scene-cut detector's frame descriptor — exact integers so
    * identical rasters (repeated frames, or the same raster
    * re-encoded losslessly) produce IDENTICAL grids and a zero
    * distance, deterministically.
    */
  def lumaGrid64(img: java.awt.image.BufferedImage): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val s = new Array[Long](64)
    val l = new Array[Long](64)
    var y = 0
    while (y < h) {
      val row = (y.toLong * 8L / h).toInt * 8
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)) / 1000L
        val k = row + (x.toLong * 8L / w).toInt
        s(k) += luma
        l(k) += 1L
        x += 1
      }
      y += 1
    }
    val out = new Array[Long](64)
    var i = 0
    while (i < 64) {
      out(i) = if (l(i) == 0L) 0L else s(i) / l(i)
      i += 1
    }
    out
  }

  /** L1 distance between two `lumaGrid64` grids: Σ|aᵢ − bᵢ| over the
    * 64 cells — range [0, 16320] (64 × 255). The scene-cut statistic.
    */
  def lumaGridDist(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L
    var i = 0
    while (i < 64) {
      d += math.abs(a(i) - b(i))
      i += 1
    }
    d
  }

  /** 64-bit PIXEL-DOMAIN pHash (the DCT member of the perceptual
    * family — pHash.org's classic recipe): BT.601 integer luma
    * resampled onto a 32×32 grid by relative position, 2D DCT-II,
    * keep the 8×8 low-frequency block, bit (u,v) = 1 iff the
    * coefficient exceeds the MEDIAN of the 63 non-DC coefficients
    * (the DC position carries total brightness, not structure — its
    * bit is pinned 0). Compared to the gradient dHash this trades the
    * exact-integer story (the DCT is double arithmetic — fine here:
    * both fingerprint kernels are mapPartitions-side with NO DuckDB
    * oracle, the q_media_dhash_pixel contract) for robustness to
    * HEAVIER distortion: low-frequency energy survives aggressive
    * JPEG quantization and resampling that starts to smear 8×9 cell
    * gradients. Deterministic for a given JVM; gated in
    * MultimodalSpec against low-quality re-encodes and resizes.
    */
  def phash64Pixels(img: java.awt.image.BufferedImage): Long = {
    val G = 32
    val w = img.getWidth
    val h = img.getHeight
    val s = new Array[Long](G * G)
    val l = new Array[Long](G * G)
    var y = 0
    while (y < h) {
      val row = (y.toLong * G / h).toInt * G
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)) / 1000L
        val k = row + (x.toLong * G / w).toInt
        s(k) += luma
        l(k) += 1L
        x += 1
      }
      y += 1
    }
    val m = new Array[Double](G * G)
    var k = 0
    while (k < G * G) {
      // an empty cell (image smaller than the grid) inherits 0 — the
      // relative-position map keeps cells contiguous, so this only
      // happens below 32px where the fingerprint is degenerate anyway
      m(k) = if (l(k) > 0) s(k).toDouble / l(k) else 0.0
      k += 1
    }
    // cos((2i+1)uπ/64) table for the 8 low frequencies we keep
    val cos = Array.tabulate(8, G)((u, i) =>
      math.cos((2 * i + 1) * u * math.Pi / (2.0 * G)))
    val coef = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < G) {
          var xx = 0
          var rowAcc = 0.0
          while (xx < G) {
            rowAcc += m(yy * G + xx) * cos(u)(xx)
            xx += 1
          }
          acc += rowAcc * cos(v)(yy)
          yy += 1
        }
        coef(v * 8 + u) = acc
        v += 1
      }
      u += 1
    }
    val nonDc = coef.drop(1).sorted
    val median = nonDc(31) // 63 non-DC values, middle element (0-based)
    var out = 0L
    var b = 1
    while (b < 64) {
      if (coef(b) > median) out |= (1L << b)
      b += 1
    }
    out
  }

  /** 64-bit AUDIO fingerprint over decoded PCM samples: |amplitude|
    * resampled onto the same 8×9 grid by relative frame position
    * (length-invariant — a 2× resample of the same clip lands in the
    * same cells), bit = energy-gradient sign via the shared
    * cross-multiplied integer fold. The deliberate property: VOLUME
    * is a common factor of both sides of every s₁·l₂ > s₂·l₁
    * comparison, so an exact integer gain change (the loudness-
    * normalized re-master, audio's re-encode analogue) preserves the
    * fingerprint BIT-FOR-BIT — executed law; a localized click
    * touches one cell → ≤ 2 flipped bits, the dHash argument. NULL
    * on an empty clip. No input-magnitude cap: the per-cell
    * accumulators are Int64 and cannot overflow for ANY Array[Int]
    * (n < 2³¹ samples × |sample| < 2³¹ ⇒ Σ < 2⁶² per cell) — the
    * audio path deliberately feeds channel-SUM mixes up to ~2³¹ per
    * sample — and comparison exactness is delegated to `foldGrid`'s
    * exact 128-bit cross-multiply, which no cell magnitude can
    * overflow.
    */
  def ahash64Samples(samples: Array[Int]): java.lang.Long = {
    val n = samples.length
    if (n <= 0) return null
    // no headroom cap needed: the fold's cross-multiply is exact
    // 128-bit (multiplyHigh), and the cell accumulators themselves
    // stay in Int64 for any JVM array of Int samples (n < 2³¹,
    // |sample| < 2³¹ ⇒ Σ < 2⁶² per cell)
    val s = new Array[Long](72)
    val l = new Array[Long](72)
    var i = 0
    while (i < n) {
      val k = ((i.toLong * 72L) / n).toInt
      s(k) += math.abs(samples(i).toLong)
      l(k) += 1L
      i += 1
    }
    foldGrid(s, l)
  }

  /** Shared grid→bits fold: bit b = 1 iff cell (b/8, b%8)'s mean
    * exceeds its right neighbour's, cross-multiplied (s₁·l₂ > s₂·l₁)
    * so the whole comparison is exact integer arithmetic. The
    * cross-multiply is widened to exact 128-bit (multiplyHigh on
    * nonnegative operands) so no input magnitude can overflow the
    * comparison — the audio kernel feeds channel-SUM mixes whose
    * cell sums × counts can exceed Int64 on long multichannel clips.
    * In the no-overflow range (every byte/pixel payload, and the SQL
    * oracle's BIGINT replay) the result is bit-identical to the
    * 64-bit product compare.
    */
  private def foldGrid(s: Array[Long], l: Array[Long]): Long = {
    var out = 0L
    var b = 0
    while (b < 64) {
      val k1 = (b >> 3) * 9 + (b & 7)
      if (gt128(s(k1), l(k1 + 1), s(k1 + 1), l(k1))) out |= (1L << b)
      b += 1
    }
    out
  }

  /** a·b > c·d, exact, for NONNEGATIVE longs: compare the 128-bit
    * products by (high word, unsigned low word).
    */
  private def gt128(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }
}

/** 64-bit dHash over a binary payload: resample the payload bytes onto
  * an 8×9 grid by RELATIVE position (byte i of an n-byte payload lands
  * in cell ⌊i·72/n⌋ — so the grid, like an image thumbnail, is
  * length-invariant), then bit (r,c) = 1 iff mean(cell[r][c]) >
  * mean(cell[r][c+1]) — the horizontal-gradient sign, 8 rows × 8
  * comparisons = 64 bits. The mean comparison is cross-multiplied
  * (s1·l2 > s2·l1) so the whole kernel is exact integer arithmetic —
  * no division, no doubles — and a SQL oracle replays it bit-for-bit.
  *
  * Robustness shape (gated in MultimodalSpec): a localized byte edit
  * touches one cell, flipping at most its two adjacent comparisons →
  * hamming ≤ 2; uniformly duplicating every byte (the 2× "resize")
  * moves cell means only at ⌊⌋ boundary slivers → hamming lands in an
  * intermediate band (~8 bits on text payloads), well below unrelated
  * content (~32 expected) though above the tight localized-edit
  * threshold — the gap a production pHash (DCT over decoded pixels)
  * closes with ONLY this kernel swapped. Overflow-safe by
  * bounds: s ≤ 255·l and l ≤ n, so s·l < 255·n²/72·2 stays inside
  * Int64 for any JVM array (n < 2³¹).
  *
  * One compiled loop per row over the raw byte[] (the Sketches.scala
  * rationale: HOF lambdas are interpreted per element; CodegenFallback
  * costs one virtual call per ROW).
  */
case class DHash64Expr(child: Expression, offset: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType && offset >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary input and offset >= 0, got ${child.dataType} / $offset")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dhash64"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MediaFunctions.dhash64Bytes(input.asInstanceOf[Array[Byte]], offset)

  override protected def withNewChildInternal(newChild: Expression): DHash64Expr =
    copy(child = newChild)
}
