package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio payloads ride as opaque `binary`
  * columns; decode / feature-extract runs per partition over iterator batches
  * (the Scala analog of `mapInPandas` — streaming through rows without
  * materializing a partition, with a per-partition init seam for codec
  * state).
  *
  * The decode step is REAL byte parsing (no external libraries needed):
  * PNG IHDR + full pixel decode (chunk walk → java.util.zip.Inflater →
  * scanline unfilter, all 5 spec filter types), baseline grayscale JPEG
  * with a real Huffman entropy decode (DQT/DHT/SOF0/SOS parse, canonical
  * code rebuild, DC category + magnitude, full AC run/size loop) followed
  * by dequantization and a fixed-point integer 8×8 IDCT to pixels, and WAV
  * RIFF/fmt headers. The synthetic generator emits genuine containers
  * (valid PNGs with real CRCs and zlib IDAT; entropy-coded baseline JPEGs
  * with nonzero AC coefficients; RIFF WAVs), so the parsers are exercised
  * against real byte layouts; corrupt payloads cover the error path.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, kind: String, valid: Boolean,
      width: Int, height: Int, sample_rate: Int, channels: Int,
      n_bytes: Long, checksum: Long, pixel_sum: Long)

  // ------------------------------------------------------------- encoders
  // Deterministic synthetic payloads with REAL container layouts. Byte
  // lengths are closed-form per kind so totals are oracle-predictable:
  //   png 57 + zlen(w,h) bytes (real zlib IDAT, see pngBytes),
  //   jpeg 175 + ceil((nblocks·(4+acbits) + t)/8) (entropy-coded, see
  //     jpegBytes),
  //   wav 108 (corrupt rows are 3).

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)

  private def body(id: Long, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var s = id * 0x9E3779B97F4A7C15L
    var i = 0
    while (i < n) { s = s * 6364136223846793005L + 1442695040888963407L; b(i) = (s >>> 56).toByte; i += 1 }
    b
  }

  /** Deterministic truecolor pixel value: every channel of pixel (x, y) of
    * image `id` is (id + x + y) mod 256 — closed-form enough that the oracle
    * reconstructs per-image pixel sums without decoding anything.
    */
  def pixelValue(id: Long, x: Int, y: Int): Int = ((id + x + y) % 256).toInt

  /** zlib stream holding `raw` as STORED (uncompressed) deflate blocks —
    * hand-rolled so the byte length is closed-form (raw + 6 + 5·nblocks with
    * 65535-byte blocks), which keeps payload sizes oracle-predictable where
    * a real compressor's output length would not be. The DECODER side uses
    * the real java.util.zip.Inflater, which consumes this stream like any
    * other zlib data.
    */
  def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val nblocks = math.max(1, (raw.length + 65534) / 65535)
    val out = new Array[Byte](raw.length + 6 + 5 * nblocks)
    out(0) = 0x78; out(1) = 0x01 // zlib header: deflate, 32k window, no dict
    var off = 0; var o = 2
    var b = 0
    while (b < nblocks) {
      val len = math.min(65535, raw.length - off)
      val last = b == nblocks - 1
      out(o) = if (last) 1 else 0
      out(o + 1) = (len & 0xff).toByte; out(o + 2) = ((len >> 8) & 0xff).toByte
      out(o + 3) = (~len & 0xff).toByte; out(o + 4) = ((~len >> 8) & 0xff).toByte
      System.arraycopy(raw, off, out, o + 5, len)
      off += len; o += 5 + len; b += 1
    }
    val ad = new java.util.zip.Adler32
    ad.update(raw, 0, raw.length)
    val a = ad.getValue
    out(o) = (a >>> 24).toByte; out(o + 1) = ((a >> 16) & 0xff).toByte
    out(o + 2) = ((a >> 8) & 0xff).toByte; out(o + 3) = (a & 0xff).toByte
    out
  }

  /** One PNG chunk: length + tag + data + real CRC32 over tag++data. */
  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** A VALID truecolor PNG: signature + IHDR (bit-depth 8, color-type 2) +
    * one IDAT (zlib over filtered scanlines) + IEND, real CRCs. Scanline
    * filters rotate None/Sub/Up by row so the decoder's unfilter paths are
    * exercised by every image. Total bytes = 57 + zlen where
    * zlen = raw + 6 + 5·ceil(raw/65535), raw = h·(3w+1).
    */
  def pngBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride)
      val filter = y % 3 // 0 None, 1 Sub, 2 Up (y%3==2 implies y>=1, Up defined)
      raw(rowOff) = filter.toByte
      var i = 0
      while (i < stride) {
        val x = i / 3
        val v = pixelValue(id, x, y)
        val stored = filter match {
          case 0 => v
          case 1 => v - (if (i >= 3) pixelValue(id, x - 1, y) else 0)
          case _ => v - pixelValue(id, x, y - 1)
        }
        raw(rowOff + 1 + i) = (stored & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      pngChunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      pngChunk("IDAT", zlibStored(raw)) ++
      pngChunk("IEND", Array.empty[Byte])
  }

  /** Per-image JPEG gray value (the DC level): 128 + 8·(id%16) — keeps the
    * DC coefficient non-negative and the entropy-stream length closed-form
    * (see jpegBytes) so the oracle predicts byte totals AND pixel sums
    * without decoding.
    */
  def jpegGray(id: Long): Int = 128 + ((id % 16).toInt * 8)

  /** Per-image AC coefficients (same in every block): a horizontal ripple at
    * zigzag 1 (v=0,u=1) and a vertical ripple at zigzag 2 (v=1,u=0).
    * Amplitudes ±{0,3,6} / ±{0,2,4,6} are big enough that the fixed-point
    * IDCT (~0.17 px per coefficient unit at the strongest basis position)
    * moves decoded pixel values — a decoder that IGNORED AC would return
    * wrong sums, so the q27 oracle genuinely checks the AC/IDCT path.
    */
  def jpegAc1(id: Long): Int = 3 * ((id % 5).toInt - 2)
  def jpegAc2(id: Long): Int = 2 * ((id % 7).toInt - 3)

  /** Per-image restart interval (MCUs between RSTn markers; 0 = no DRI).
    * Roughly half the grayscale corpus carries restart markers — the
    * web-JPEG norm (libjpeg writes DRI by default in many pipelines) — so
    * the decoder's segment-alignment + DC-reset + cyclic-RSTn path is
    * oracle-exercised, not just unit-tested.
    */
  def jpegRestartInterval(id: Long): Int =
    if (id % 13 < 6) 2 + (id % 4).toInt else 0

  /** Flat chroma planes of a color JPEG (`jpegColorBytes`): Cb/Cr constant
    * per image, offset from neutral 128 in steps of 4 — the flat blocks
    * decode back to these exact values through the fixed-point IDCT.
    */
  def jpegCb(id: Long): Int = 128 + 4 * ((id % 9).toInt - 4)
  def jpegCr(id: Long): Int = 128 + 4 * ((id % 11).toInt - 5)

  /** Fixed-point JFIF YCbCr→RGB constants (×2¹⁶, rounded): 1.402 (R←Cr),
    * 0.344136 / 0.714136 (G←Cb/Cr), 1.772 (B←Cb). Channel math:
    * R = clamp(Y + rnd16(c1402·(Cr−128))), G = clamp(Y − rnd16(c344·(Cb−128)
    * + c714·(Cr−128))), B = clamp(Y + rnd16(c1772·(Cb−128))) with
    * rnd16(v) = floorDiv(v + 2¹⁵, 2¹⁶) — deterministic integers the q27
    * oracle inlines (generated from here, one source of truth).
    */
  val yccToRgb: (Long, Long, Long, Long) = (
    Math.round(1.402 * 65536.0), Math.round(0.344136 * 65536.0),
    Math.round(0.714136 * 65536.0), Math.round(1.772 * 65536.0))

  /** Entropy bit writer shared by the JPEG generators: MSB-first bit
    * accumulation with FF00 stuffing (tracked — the closed-form byte
    * formulas require it never to fire) and 1-padding byte alignment.
    */
  private final class JpegBitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    var stuffed = false
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1 << len) - 1)); nbits += len
      while (nbits >= 8) {
        val b = (acc >>> (nbits - 8)) & 0xff
        out.write(b)
        if (b == 0xff) { out.write(0x00); stuffed = true }
        nbits -= 8
      }
    }
    def putMag(v: Int, s: Int): Unit = put(if (v >= 0) v else v + (1 << s) - 1, s)
    def alignOnes(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
    def writeMarker(second: Int): Unit = { out.write(0xff); out.write(second) } // bypasses stuffing
  }

  // ------------------------------------------------- fixed-point IDCT spec

  /** IDCT basis constant K(u,x) = round(Cu·cos((2x+1)·u·π/16)·4096) with
    * Cu = 1/√2 for u=0 else 1. The decode IDCT is EXACT integer arithmetic
    * over these constants (separability without intermediate rounding keeps
    * it equal to the direct double-sum definition), which is what makes
    * decoded pixels engine-portable: the q27 oracle inlines THESE constants
    * (generated from this function — one source of truth) and replays
    * pixels in integer SQL. Real codecs use fixed-point integer IDCTs
    * (libjpeg jidctint) for exactly this determinism.
    */
  def idctK(u: Int, x: Int): Long = {
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    Math.round(cu * math.cos((2 * x + 1) * u * math.Pi / 16.0) * 4096.0)
  }
  private val idctKTab: Array[Array[Long]] = Array.tabulate(8, 8)((u, x) => idctK(u, x))

  /** JPEG zigzag scan order: zigzag index k → natural index v·8+u. */
  val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** 8×8 inverse DCT of a DEQUANTIZED coefficient block (natural order
    * S[v·8+u]) to pixel values: pixel(y,x) = clamp(floorDiv(Σ_{u,v}
    * S·K(u,x)·K(v,y) + 2²⁵, 2²⁶) + 128, 0, 255) — the direct IDCT
    * definition f(y,x) = ¼·ΣΣ·Cu·Cv·S·cos·cos at scale 4·4096² = 2²⁶,
    * rounded once. Computed separably (row pass then column pass) with NO
    * intermediate rounding, so the result is bit-identical to the direct
    * sum; all intermediates fit comfortably in Long.
    */
  def idctPixels(coef: Array[Long]): Array[Int] = {
    val tmp = Array.ofDim[Long](8, 8) // tmp(v)(x) = Σ_u S(v,u)·K(u,x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0L; var u = 0
        while (u < 8) { s += coef(v * 8 + u) * idctKTab(u)(x); u += 1 }
        tmp(v)(x) = s; x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0L; var vv = 0
        while (vv < 8) { s += tmp(vv)(x) * idctKTab(vv)(y); vv += 1 }
        val p = Math.floorDiv(s + (1L << 25), 1L << 26).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Canonical Huffman assignment from a DHT-style (bits, huffval) pair:
    * symbol → (codeLen, code). Shared by the encoder and the decoder, which
    * rebuilds it from the parsed DHT segment.
    */
  private[ops] def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[Int, (Int, Int)]
    var code = 0; var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) { out(vals(k)) = (len, code); code += 1; k += 1; i += 1 }
      code <<= 1
      len += 1
    }
    out.toMap
  }

  // Minimal custom tables (NOT the bulky Annex-K defaults — any canonical
  // table is legal; the decoder builds codes generically from the DHT):
  //   DC: all 12 categories at code length 4 (0000..1011)
  //   AC: EOB + run∈{0,1}×size∈{1..3} at code length 3 ('000'..'110' —
  //       the all-ones 3-bit code stays unassigned, so 1-padding can never
  //       alias a symbol)
  private val jpegDcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val jpegDcVals = (0 to 11).toArray
  private val jpegAcBits = Array(0, 0, 7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val jpegAcVals = Array(0x00, 0x01, 0x02, 0x03, 0x11, 0x12, 0x13)

  /** A REAL baseline JPEG (grayscale): SOI + APP0/JFIF + DQT (all 1s) +
    * SOF0 + two DHT segments + SOS + Huffman-entropy-coded MCU data + EOI.
    * Every 8×8 block carries the same dequantized coefficients: DC =
    * 8·(gray−128) plus AC ripples `jpegAc1` at zigzag 1 and `jpegAc2` at
    * zigzag 2 (run/size-coded, runs of 0 or 1), so the decoder's Huffman +
    * zigzag + dequant + IDCT path is exercised by real entropy bytes while
    * byte totals stay closed-form: (175 + 6·hasDRI) header +
    * ceil((nblocks·(4+acbits) + t)/8) entropy, where t = bitlen(8·(gray−128))
    * (the first block's DC magnitude bits; later blocks emit category-0 in
    * 4 bits) and acbits = 3 (EOB) + (a1≠0: 3+size(a1)) + (a2≠0: 3+size(a2))
    * — the q27 oracle reconstructs this exactly. With a restart interval r
    * (`jpegRestartInterval` > 0 → a DRI segment in the header) the stream
    * splits into nseg = ceil(nblocks/r) independently byte-aligned segments
    * separated by cyclic RST0..RST7 markers, each restarting the DC
    * predictor, so entropy bytes become Σ_seg ceil((r_seg·(4+acbits) +
    * t)/8) + 2·(nseg−1). No byte ever needs FF00 stuffing (the assembled
    * bit patterns cap runs of ones below 8, asserted below), and the APP0
    * before SOF still forces dimension parsers to walk the chain.
    */
  def jpegBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
      ("JFIF".getBytes("US-ASCII") :+ 0.toByte) ++ Array[Byte](1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val dqt = Array[Byte](0xff.toByte, 0xdb.toByte) ++ be16(67) ++
      Array[Byte](0) ++ Array.fill[Byte](64)(1)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(h) ++ be16(w) ++ Array[Byte](1, 1, 0x11, 0)
    def dht(clazz: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
      Array[Byte](0xff.toByte, 0xc4.toByte) ++ be16(2 + 1 + 16 + vals.length) ++
        Array[Byte]((clazz << 4).toByte) ++ bits.map(_.toByte) ++ vals.map(_.toByte)
    val sos = Array[Byte](0xff.toByte, 0xda.toByte) ++ be16(8) ++
      Array[Byte](1, 1, 0x00, 0, 63, 0)
    val restartInterval = jpegRestartInterval(id)
    val dri =
      if (restartInterval == 0) Array.empty[Byte]
      else Array[Byte](0xff.toByte, 0xdd.toByte) ++ be16(4) ++ be16(restartInterval)

    val dcCodes = canonicalCodes(jpegDcBits, jpegDcVals)
    val acCodes = canonicalCodes(jpegAcBits, jpegAcVals)
    val bw = new JpegBitWriter
    val gray = jpegGray(id)
    val dc = 8 * (gray - 128) // FDCT of a constant (level-shifted) block
    val a1 = jpegAc1(id); val a2 = jpegAc2(id)
    def putAc(run: Int, v: Int): Unit = {
      val s = 32 - Integer.numberOfLeadingZeros(math.abs(v))
      val (cl, cc) = acCodes((run << 4) | s)
      bw.put(cc, cl); bw.putMag(v, s)
    }
    val nbx = (w + 7) / 8; val nby = (h + 7) / 8
    var prev = 0
    var bi = 0
    var sinceRestart = 0
    var rstIdx = 0
    while (bi < nbx * nby) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        bw.alignOnes()
        bw.writeMarker(0xd0 + (rstIdx % 8))
        rstIdx += 1; sinceRestart = 0
        prev = 0 // DC predictor resets per spec
      }
      val diff = dc - prev; prev = dc
      val t = 32 - Integer.numberOfLeadingZeros(math.abs(diff)) // category
      val (cl, cc) = dcCodes(t)
      bw.put(cc, cl)
      if (t > 0) bw.putMag(diff, t)
      if (a1 != 0 && a2 != 0) { putAc(0, a1); putAc(0, a2) }
      else if (a1 != 0) putAc(0, a1)
      else if (a2 != 0) putAc(1, a2) // one zero (the absent a1) to skip
      val (el, ec) = acCodes(0x00)
      bw.put(ec, el) // EOB
      bi += 1
      sinceRestart += 1
    }
    bw.alignOnes() // pad with 1s
    // closed-form byte totals (and the q27 oracle) depend on an unstuffed
    // stream; the generated bit patterns guarantee it — fail loudly if a
    // generator change ever breaks that
    require(!bw.stuffed, s"jpegBytes: FF byte in entropy stream for id=$id — byte totals no longer closed-form")
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ dqt ++ sof0 ++
      dht(0, jpegDcBits, jpegDcVals) ++ dht(1, jpegAcBits, jpegAcVals) ++ dri ++ sos ++
      bw.out.toByteArray ++ Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** A REAL baseline COLOR JPEG — YCbCr 4:2:0, the dominant web layout:
    * 3 components (Y 2×2 sampling / Tq 0, Cb and Cr 1×1 / Tq 1), two DQT
    * tables in one segment, four DHT tables (DC/AC × table-id 0/1, same
    * canonical layouts), interleaved MCUs of 4 Y blocks + Cb + Cr. The luma
    * plane carries the SAME dc + AC ripples as the grayscale generator
    * (`jpegGray`/`jpegAc1`/`jpegAc2`), chroma planes are flat at
    * `jpegCb`/`jpegCr` — so decoded RGB is periodic-8 in both axes and the
    * q27 oracle replays pixel sums on an 8×8 grid. Byte totals stay closed
    * form: 311 overhead + ceil((nmcu·(4·(4+acbits) + 14) + tY + tCb +
    * tCr)/8) entropy, where 14 = 2 chroma blocks × (4-bit DC cat-0 + 3-bit
    * EOB) and each component's first block pays its DC magnitude bits once.
    * No DRI on the color corpus (the grayscale half covers restarts).
    */
  def jpegColorBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
      ("JFIF".getBytes("US-ASCII") :+ 0.toByte) ++ Array[Byte](1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val dqt = Array[Byte](0xff.toByte, 0xdb.toByte) ++ be16(2 + 2 * 65) ++
      (Array[Byte](0) ++ Array.fill[Byte](64)(1)) ++
      (Array[Byte](1) ++ Array.fill[Byte](64)(1))
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(8 + 3 * 3) ++ Array[Byte](8) ++
      be16(h) ++ be16(w) ++ Array[Byte](3,
        1, 0x22, 0, // Y: 2×2 sampling, quant table 0
        2, 0x11, 1, // Cb
        3, 0x11, 1) // Cr
    def dht(clazz: Int, tid: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
      Array[Byte](0xff.toByte, 0xc4.toByte) ++ be16(2 + 1 + 16 + vals.length) ++
        Array[Byte](((clazz << 4) | tid).toByte) ++ bits.map(_.toByte) ++ vals.map(_.toByte)
    val sos = Array[Byte](0xff.toByte, 0xda.toByte) ++ be16(6 + 2 * 3) ++
      Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)

    val dcCodes = canonicalCodes(jpegDcBits, jpegDcVals)
    val acCodes = canonicalCodes(jpegAcBits, jpegAcVals)
    val bw = new JpegBitWriter
    def putAc(run: Int, v: Int): Unit = {
      val s = 32 - Integer.numberOfLeadingZeros(math.abs(v))
      val (cl, cc) = acCodes((run << 4) | s)
      bw.put(cc, cl); bw.putMag(v, s)
    }
    def putDc(diff: Int): Unit = {
      val t = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (cl, cc) = dcCodes(t)
      bw.put(cc, cl)
      if (t > 0) bw.putMag(diff, t)
    }
    val eob = acCodes(0x00)
    val dcY = 8 * (jpegGray(id) - 128)
    val a1 = jpegAc1(id); val a2 = jpegAc2(id)
    val dcCb = 8 * (jpegCb(id) - 128)
    val dcCr = 8 * (jpegCr(id) - 128)
    var prevY = 0; var prevCb = 0; var prevCr = 0
    def yBlock(): Unit = {
      putDc(dcY - prevY); prevY = dcY
      if (a1 != 0 && a2 != 0) { putAc(0, a1); putAc(0, a2) }
      else if (a1 != 0) putAc(0, a1)
      else if (a2 != 0) putAc(1, a2)
      bw.put(eob._2, eob._1)
    }
    def chromaBlock(dc: Int, prev: Int): Int = {
      putDc(dc - prev)
      bw.put(eob._2, eob._1)
      dc
    }
    val nmcu = ((w + 15) / 16) * ((h + 15) / 16)
    var m = 0
    while (m < nmcu) {
      yBlock(); yBlock(); yBlock(); yBlock()
      prevCb = chromaBlock(dcCb, prevCb)
      prevCr = chromaBlock(dcCr, prevCr)
      m += 1
    }
    bw.alignOnes()
    require(!bw.stuffed, s"jpegColorBytes: FF byte in entropy stream for id=$id — byte totals no longer closed-form")
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ dqt ++ sof0 ++
      dht(0, 0, jpegDcBits, jpegDcVals) ++ dht(1, 0, jpegAcBits, jpegAcVals) ++
      dht(0, 1, jpegDcBits, jpegDcVals) ++ dht(1, 1, jpegAcBits, jpegAcVals) ++ sos ++
      bw.out.toByteArray ++ Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** Closed-form 16-bit PCM sample i of wav `id`: ((7·id + 37·i) mod 4096)
    * − 2048 — oracle-predictable without replaying a PRNG, still real
    * little-endian int16 bytes on the wire.
    */
  def wavSample(id: Long, i: Int): Int = (((id * 7 + i * 37) % 4096).toInt) - 2048

  /** WAV: RIFF/WAVE + fmt chunk (PCM, channels, sample rate) + data chunk of
    * 32 closed-form int16 samples (64 bytes — byte totals unchanged).
    */
  def wavBytes(id: Long, sampleRate: Int, channels: Int): Array[Byte] = {
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate * channels * 2) ++ le16(channels * 2) ++ le16(16)
    val pcm = (0 until 32).flatMap(i => le16(wavSample(id, i) & 0xffff)).toArray
    val data = "data".getBytes("US-ASCII") ++ le32(64) ++ pcm
    "RIFF".getBytes("US-ASCII") ++ le32(36 + 64) ++ "WAVE".getBytes("US-ASCII") ++ fmt ++ data
  }

  // -------------------------------------------------------------- decoders

  private def rdBe16(p: Array[Byte], o: Int): Int = ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
  private def rdBe32(p: Array[Byte], o: Int): Int =
    ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) | ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
  private def rdLe16(p: Array[Byte], o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
  private def rdLe32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) | ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
  private def tag(p: Array[Byte], o: Int, s: String): Boolean =
    p.length >= o + s.length && s.indices.forall(i => p(o + i) == s.charAt(i).toByte)

  /** PNG IHDR: signature + first chunk must be IHDR; dims are BE32 at 16/20. */
  def decodePng(p: Array[Byte]): Option[(Int, Int)] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    if (p == null || p.length < 24 || !sig.indices.forall(i => (p(i) & 0xff) == sig(i))) None
    else if (!tag(p, 12, "IHDR")) None
    else {
      val w = rdBe32(p, 16); val h = rdBe32(p, 20)
      if (w > 0 && h > 0) Some((w, h)) else None
    }
  }

  /** Reverse PNG scanline filtering in place-order (types 0 None, 1 Sub,
    * 2 Up, 3 Average, 4 Paeth — the full spec set) for `bpp` bytes/pixel;
    * input is h rows of (1 filter byte + stride), output the raw bytes.
    * Returns None on an unknown filter type.
    */
  def unfilterScanlines(data: Array[Byte], w: Int, h: Int, bpp: Int): Option[Array[Byte]] = {
    val stride = w * bpp
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = data(y * (1 + stride)) & 0xff
      val in = y * (1 + stride) + 1
      val o = y * stride
      var i = 0
      while (i < stride) {
        val x = data(in + i) & 0xff
        val left = if (i >= bpp) out(o + i - bpp) & 0xff else 0
        val up = if (y > 0) out(o - stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) out(o - stride + i - bpp) & 0xff else 0
        val raw = f match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 =>
            // Paeth predictor
            val pp = left + up - ul
            val pa = math.abs(pp - left); val pb = math.abs(pp - up); val pc = math.abs(pp - ul)
            x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(o + i) = (raw & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some(out)
  }

  /** Full PNG pixel decode: walk chunks, concatenate IDAT data, inflate with
    * the real java.util.zip.Inflater, unfilter, and return the sum of all
    * channel bytes (the oracle-checkable pixel statistic). Supports the
    * 8-bit truecolor layout the generator emits; anything malformed → None.
    */
  def decodePngPixels(p: Array[Byte]): Option[Long] =
    decodePngRaw(p).map { case (_, _, px) =>
      var s = 0L; var i = 0
      while (i < px.length) { s += px(i) & 0xff; i += 1 }
      s
    }

  /** JPEG SOF scan: walk FF-marker segments from SOI until a start-of-frame
    * (0xC0-0xCF excluding C4/C8/CC), then height/width are BE16 in its body.
    */
  def decodeJpeg(p: Array[Byte]): Option[(Int, Int)] = {
    if (p == null || p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    var pos = 2
    while (pos + 4 <= p.length && (p(pos) & 0xff) == 0xff) {
      val marker = p(pos + 1) & 0xff
      val len = rdBe16(p, pos + 2)
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (pos + 9 > p.length) return None
        val h = rdBe16(p, pos + 5); val w = rdBe16(p, pos + 7)
        return if (w > 0 && h > 0) Some((w, h)) else None
      }
      if (len < 2) return None
      pos += 2 + len
    }
    None
  }

  /** Baseline JPEG pixel decode: parses DQT (up to 4 tables), DHT (canonical
    * code rebuild per (class, table-id) — works for ANY table, incl. Annex
    * K), SOF0, DRI, SOS (per-component DC/AC table selectors), then a real
    * Huffman entropy decode of every MCU — DC category + magnitude bits
    * (with the spec's negative extension) and the full AC run/size loop
    * (ZRL, arbitrary runs, EOB) into a zigzag-ordered coefficient block —
    * followed by dequantization against the component's OWN quant table and
    * the fixed-point integer IDCT (`idctPixels`).
    *
    * Supported frame layouts: grayscale (1 component, 1×1) and YCbCr 4:2:0
    * (Y 2×2 + two 1×1 chroma — the dominant web layout); anything else →
    * None. For color, chroma is 2× nearest-replicated and converted with
    * the fixed-point `yccToRgb` math; the returned statistic is the sum of
    * R+G+B over the w×h crop (grayscale: sum of Y). Restart markers are
    * honored: at each DRI boundary the reader byte-aligns, consumes the
    * expected CYCLIC RST0..RST7 marker (anything else → None, catching
    * desync), and resets every DC predictor. Partial edge blocks/MCUs are
    * summed over their visible region only. Per-component consecutive
    * identical coefficient blocks reuse the previous IDCT output
    * (pure-function memoization — flat regions dominate real images and
    * the synthetic corpus).
    */
  def decodeJpegPixels(p: Array[Byte]): Option[Long] = {
    try {
      if (p == null || p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
      var pos = 2
      val qt = new Array[Array[Int]](4)
      val dcT = new Array[Map[(Int, Int), Int]](4) // (len, code) -> symbol
      val acT = new Array[Map[(Int, Int), Int]](4)
      var w = 0; var h = 0
      var ncomp = 0
      var compIds: Array[Int] = null
      var compSamp: Array[Int] = null
      var compTq: Array[Int] = null
      var dcSel: Array[Int] = null
      var acSel: Array[Int] = null
      var sosAt = -1
      var restartInterval = 0
      while (sosAt < 0 && pos + 4 <= p.length && (p(pos) & 0xff) == 0xff) {
        val marker = p(pos + 1) & 0xff
        val len = rdBe16(p, pos + 2)
        if (len < 2 || pos + 2 + len > p.length) return None
        marker match {
          case 0xdb => // DQT (8-bit precision tables only)
            var o = pos + 4
            while (o < pos + 2 + len) {
              if ((p(o) >> 4 & 0xf) != 0) return None
              qt(p(o) & 0x3) = Array.tabulate(64)(i => p(o + 1 + i) & 0xff)
              o += 65
            }
          case 0xc4 => // DHT: rebuild canonical codes per (class, id)
            var o = pos + 4
            while (o < pos + 2 + len) {
              val clazz = (p(o) >> 4) & 0xf
              val tid = p(o) & 0x3
              val bits = Array.tabulate(16)(i => p(o + 1 + i) & 0xff)
              val nv = bits.sum
              val vals = Array.tabulate(nv)(i => p(o + 17 + i) & 0xff)
              val codes = canonicalCodes(bits, vals).map { case (sym, lc) => (lc, sym) }
              if (clazz == 0) dcT(tid) = codes else acT(tid) = codes
              o += 17 + nv
            }
          case 0xc0 => // SOF0 baseline
            if ((p(pos + 4) & 0xff) != 8) return None
            h = rdBe16(p, pos + 5); w = rdBe16(p, pos + 7)
            ncomp = p(pos + 9) & 0xff
            if (pos + 10 + 3 * ncomp > p.length) return None
            compIds = new Array[Int](ncomp); compSamp = new Array[Int](ncomp); compTq = new Array[Int](ncomp)
            var i = 0
            while (i < ncomp) {
              compIds(i) = p(pos + 10 + 3 * i) & 0xff
              compSamp(i) = p(pos + 11 + 3 * i) & 0xff
              compTq(i) = p(pos + 12 + 3 * i) & 0x3
              i += 1
            }
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // non-baseline frame types unsupported
          case 0xdd => // DRI: restart interval in MCUs
            if (len != 4) return None
            restartInterval = rdBe16(p, pos + 4)
          case 0xda => // SOS: per-component entropy table selectors
            val ns = p(pos + 4) & 0xff
            if (ncomp == 0 || ns != ncomp) return None
            dcSel = new Array[Int](ncomp); acSel = new Array[Int](ncomp)
            var i = 0
            while (i < ns) {
              val ci = compIds.indexOf(p(pos + 5 + 2 * i) & 0xff)
              if (ci < 0) return None
              dcSel(ci) = (p(pos + 6 + 2 * i) >> 4) & 0x3
              acSel(ci) = p(pos + 6 + 2 * i) & 0x3
              i += 1
            }
            sosAt = pos + 2 + len
          case _ => ()
        }
        pos += 2 + len
      }
      if (sosAt < 0 || w <= 0 || h <= 0) return None
      val color =
        if (ncomp == 1 && compSamp(0) == 0x11) false
        else if (ncomp == 3 && compSamp(0) == 0x22 && compSamp(1) == 0x11 && compSamp(2) == 0x11) true
        else return None
      var c = 0
      while (c < ncomp) {
        if (qt(compTq(c)) == null || dcT(dcSel(c)) == null || acT(acSel(c)) == null) return None
        c += 1
      }

      // entropy bit reader with FF00 unstuffing; any other FFxx = stream end
      var bp = sosAt
      var acc = 0; var nbits = 0
      def readBit(): Int = {
        if (nbits == 0) {
          if (bp >= p.length) throw new IllegalStateException("eof")
          var b = p(bp) & 0xff; bp += 1
          if (b == 0xff) {
            if (bp >= p.length) throw new IllegalStateException("eof")
            val nxt = p(bp) & 0xff
            if (nxt == 0x00) bp += 1
            else throw new IllegalStateException("marker") // EOI mid-stream
            b = 0xff
          }
          acc = b; nbits = 8
        }
        nbits -= 1
        (acc >>> nbits) & 1
      }
      def decodeSym(tab: Map[(Int, Int), Int]): Int = {
        var code = 0; var len = 0
        while (len < 16) {
          code = (code << 1) | readBit(); len += 1
          tab.get((len, code)) match {
            case Some(s) => return s
            case None => ()
          }
        }
        throw new IllegalStateException("bad huffman code")
      }
      def extend(v: Int, t: Int): Int = if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v
      def readBits(t: Int): Int = { var v = 0; var i = 0; while (i < t) { v = (v << 1) | readBit(); i += 1 }; v }

      val dcPred = new Array[Int](ncomp)
      val prevCoef = new Array[Array[Long]](ncomp)
      val prevGrid = new Array[Array[Int]](ncomp)
      def decodeBlock(ci: Int): Array[Int] = {
        val q = qt(compTq(ci))
        val t = decodeSym(dcT(dcSel(ci)))
        dcPred(ci) += extend(readBits(t), t)
        val coef = new Array[Long](64)
        coef(0) = dcPred(ci).toLong * q(0)
        var k = 1
        var eob = false
        while (k <= 63 && !eob) {
          val sym = decodeSym(acT(acSel(ci)))
          if (sym == 0) eob = true
          else {
            val run = (sym >> 4) & 0xf; val size = sym & 0xf
            if (size == 0) {
              if (run == 15) k += 16 else throw new IllegalStateException("bad AC") // only ZRL
            } else {
              k += run
              if (k > 63) throw new IllegalStateException("bad AC run")
              coef(zigzag(k)) = extend(readBits(size), size).toLong * q(k)
              k += 1
            }
          }
        }
        if (prevCoef(ci) != null && java.util.Arrays.equals(coef, prevCoef(ci))) prevGrid(ci)
        else { val g = idctPixels(coef); prevCoef(ci) = coef; prevGrid(ci) = g; g }
      }
      var sinceRestart = 0
      var rstIdx = 0
      def restartBoundary(): Boolean = {
        // segment boundary: drop padding bits, consume the expected CYCLIC
        // RSTn, reset every DC predictor
        nbits = 0
        if (bp + 1 >= p.length || (p(bp) & 0xff) != 0xff ||
            (p(bp + 1) & 0xff) != 0xd0 + (rstIdx % 8)) return false
        bp += 2; rstIdx += 1; sinceRestart = 0
        java.util.Arrays.fill(dcPred, 0)
        true
      }

      var sum = 0L
      if (!color) {
        val nbx = (w + 7) / 8; val nby = (h + 7) / 8
        var by = 0
        while (by < nby) {
          var bx = 0
          while (bx < nbx) {
            if (restartInterval > 0 && sinceRestart == restartInterval && !restartBoundary()) return None
            val grid = decodeBlock(0)
            val visW = math.min(8, w - bx * 8); val visH = math.min(8, h - by * 8)
            var yy = 0
            while (yy < visH) {
              var xx = 0
              while (xx < visW) { sum += grid(yy * 8 + xx); xx += 1 }
              yy += 1
            }
            bx += 1
            sinceRestart += 1
          }
          by += 1
        }
      } else {
        val (c1402, c344, c714, c1772) = yccToRgb
        val nmx = (w + 15) / 16; val nmy = (h + 15) / 16
        var my = 0
        while (my < nmy) {
          var mx = 0
          while (mx < nmx) {
            if (restartInterval > 0 && sinceRestart == restartInterval && !restartBoundary()) return None
            val y00 = decodeBlock(0); val y01 = decodeBlock(0)
            val y10 = decodeBlock(0); val y11 = decodeBlock(0)
            val cbg = decodeBlock(1); val crg = decodeBlock(2)
            val visW = math.min(16, w - mx * 16); val visH = math.min(16, h - my * 16)
            var ly = 0
            while (ly < visH) {
              var lx = 0
              while (lx < visW) {
                val yb = if (ly < 8) { if (lx < 8) y00 else y01 } else { if (lx < 8) y10 else y11 }
                val yv = yb((ly % 8) * 8 + (lx % 8))
                val co = (ly / 2) * 8 + lx / 2 // 2× nearest chroma upsample
                val cb = cbg(co) - 128
                val cr = crg(co) - 128
                def rnd16(v: Long): Int = Math.floorDiv(v + 32768L, 65536L).toInt
                def clamp(v: Int): Int = math.max(0, math.min(255, v))
                sum += clamp(yv + rnd16(c1402 * cr))
                sum += clamp(yv - rnd16(c344 * cb + c714 * cr))
                sum += clamp(yv + rnd16(c1772 * cb))
                lx += 1
              }
              ly += 1
            }
            mx += 1
            sinceRestart += 1
          }
          my += 1
        }
      }
      Some(sum)
    } catch { case _: Exception => None }
  }

  /** WAV fmt: RIFF/WAVE tags then channels (LE16 @22) + rate (LE32 @24). */
  def decodeWav(p: Array[Byte]): Option[(Int, Int)] = {
    if (p == null || p.length < 28 || !tag(p, 0, "RIFF") || !tag(p, 8, "WAVE") || !tag(p, 12, "fmt ")) None
    else {
      val ch = rdLe16(p, 22); val sr = rdLe32(p, 24)
      if (sr > 0 && ch > 0) Some((sr, ch)) else None
    }
  }

  /** WAV PCM content decode: walk RIFF chunks to the `data` chunk (not a
    * fixed offset — extra chunks before it are handled), read 16-bit LE
    * signed samples, return (n_samples, sum of |sample|, peak |sample|) —
    * the rms/peak-style statistics an audio quality filter needs. Requires
    * 16-bit PCM (fmt bits @34); anything else → None.
    */
  def decodeWavPcm(p: Array[Byte]): Option[(Int, Long, Int)] = {
    try {
      if (decodeWav(p).isEmpty) return None
      if (rdLe16(p, 34) != 16) return None // bits per sample
      var pos = 12
      while (pos + 8 <= p.length) {
        val size = rdLe32(p, pos + 4)
        if (tag(p, pos, "data")) {
          if (size < 0 || pos + 8 + size > p.length || size % 2 != 0) return None
          var i = pos + 8
          var n = 0; var sum = 0L; var peak = 0
          while (i + 1 < pos + 8 + size) {
            val v = (rdLe16(p, i) << 16) >> 16 // sign-extend int16
            val a = math.abs(v)
            sum += a; if (a > peak) peak = a; n += 1
            i += 2
          }
          return Some((n, sum, peak))
        }
        if (size < 0) return None
        pos += 8 + size + (size % 2) // RIFF chunks are word-aligned
      }
      None
    } catch { case _: Exception => None }
  }

  /** Container sniffing + parse → (valid, width, height, sample_rate,
    * channels, pixel_sum). pixel_sum is the inflate+unfilter statistic for
    * PNGs and the Huffman+IDCT statistic for baseline JPEGs — both
    * grayscale AND YCbCr 4:2:0 color (R+G+B sum) are fully decoded
    * (0 when the pixel stream is absent/corrupt or outside the decoded
    * subset — e.g. progressive frames or 4:2:2/4:4:4 chroma layouts).
    */
  def decode(payload: Array[Byte]): (Boolean, Int, Int, Int, Int, Long) = {
    decodePng(payload).map { case (w, h) =>
      (true, w, h, 0, 0, decodePngPixels(payload).getOrElse(0L)) }
      .orElse(decodeJpeg(payload).map { case (w, h) =>
        (true, w, h, 0, 0, decodeJpegPixels(payload).getOrElse(0L)) })
      .orElse(decodeWav(payload).map { case (sr, ch) => (true, 0, 0, sr, ch, 0L) })
      .getOrElse((false, 0, 0, 0, 0, 0L))
  }

  /** Full PNG pixel decode to the raw byte array (w, h, channel bytes) —
    * shared by the pixel-sum statistic and the resize path.
    */
  def decodePngRaw(p: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodePng(p).flatMap { case (w, h) =>
      try {
        if ((p(24) & 0xff) != 8 || (p(25) & 0xff) != 2) return None
        val idat = new java.io.ByteArrayOutputStream()
        var pos = 8
        var done = false
        while (!done && pos + 8 <= p.length) {
          val len = rdBe32(p, pos)
          if (len < 0 || pos + 12 + len > p.length) return None
          if (tag(p, pos + 4, "IDAT")) idat.write(p, pos + 8, len)
          if (tag(p, pos + 4, "IEND")) done = true
          pos += 12 + len
        }
        val stride = 3 * w
        val raw = new Array[Byte](h * (1 + stride))
        val inf = new java.util.zip.Inflater()
        inf.setInput(idat.toByteArray)
        val n = inf.inflate(raw)
        val ok = n == raw.length && inf.finished()
        inf.end()
        if (!ok) None else unfilterScanlines(raw, w, h, 3).map(px => (w, h, px))
      } catch { case _: Exception => None }
    }

  /** Nearest-neighbor downsample of a decoded truecolor PNG by an integer
    * `factor`: output pixel (x, y) = source pixel (x·factor, y·factor).
    * Returns (newW, newH, pixel_sum over the resized image). Real pixel
    * math on really-decoded bytes — the Spark-side op a thumbnailing
    * pipeline stage needs; a full resampler (area/bilinear) would reuse the
    * same decoded buffer.
    */
  def resizePng(p: Array[Byte], factor: Int): Option[(Int, Int, Long)] =
    decodePngRaw(p).flatMap { case (w, h, px) =>
      if (factor < 1 || w < factor || h < factor) None
      else {
        val nw = w / factor; val nh = h / factor
        var s = 0L
        var y = 0
        while (y < nh) {
          val srcRow = (y * factor) * w * 3
          var x = 0
          while (x < nw) {
            val o = srcRow + (x * factor) * 3
            s += (px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)
            x += 1
          }
          y += 1
        }
        Some((nw, nh, s))
      }
    }

  // ------------------------------------------------------------- video

  /** Synthetic video container ("GVID"): magic + BE32 frame count + BE32
    * per-frame lengths + concatenated REAL PNG frames (frame f of video id
    * carries pixel formula id·1000+f). Deterministic byte layout so frame
    * indexing, sampling, and per-frame decode are all oracle-checkable.
    */
  def videoBytes(id: Long, frames: Int, w: Int, h: Int): Array[Byte] = {
    val fs = (0 until frames).map(f => pngBytes(id * 1000 + f, w, h))
    val out = new java.io.ByteArrayOutputStream()
    out.write("GVID".getBytes("US-ASCII"))
    out.write(be32(frames))
    fs.foreach(f => out.write(be32(f.length)))
    fs.foreach(out.write)
    out.toByteArray
  }

  /** Frame sampling: parse the GVID index and decode every `every`-th frame
    * (0, every, 2·every, …) — the remaining frames' bytes are never
    * inflated, which is the point of an indexed container at 100 TB: a
    * 1-in-30 sample reads 1/30 of the pixel work. Returns
    * (frame_idx, w, h, pixel_sum) per sampled frame.
    */
  def sampleFrames(p: Array[Byte], every: Int): Seq[(Int, Int, Int, Long)] = {
    try {
      if (p == null || p.length < 8 || !tag(p, 0, "GVID") || every < 1) return Nil
      val n = rdBe32(p, 4)
      if (n < 0 || 8 + 4 * n > p.length) return Nil
      val lens = Array.tabulate(n)(i => rdBe32(p, 8 + 4 * i))
      if (lens.exists(_ < 0)) return Nil
      val offsets = lens.scanLeft(8 + 4 * n)(_ + _)
      if (offsets.last > p.length) return Nil
      (0 until n by every).flatMap { f =>
        val frame = java.util.Arrays.copyOfRange(p, offsets(f), offsets(f) + lens(f))
        for {
          (w, h) <- decodePng(frame)
          s <- decodePngPixels(frame)
        } yield (f, w, h, s)
      }
    } catch { case _: Exception => Nil }
  }

  /** Feature extraction over binary payloads — mapPartitions so a full codec
    * can amortize per-batch init (model load, JNI context) exactly like a
    * Pandas UDF would; rows stream through without full materialization.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { m =>
        val (valid, w, h, sr, ch, pxSum) = decode(m.payload)
        val checksum = if (m.payload == null) 0L
          else m.payload.foldLeft(1469598103934665603L)((a, b) => (a ^ (b & 0xff)) * 1099511628211L)
        MediaFeatures(m.media_id, m.kind, valid, w, h, sr, ch,
          if (m.payload == null) 0L else m.payload.length.toLong, checksum, pxSum)
      }
    }
  }

  /** Synthetic media table derived from an id range (deterministic; real
    * container headers — see encoders above). Every 17th payload is corrupt
    * (too short) to exercise the error path.
    */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = if (i % 3 == 0) "png" else if (i % 3 == 1) "jpg" else "wav"
      val w = 64 + (i % 512).toInt; val h = 48 + (i % 256).toInt
      val sr = 8000 + (i % 8).toInt * 4000; val ch = 1 + (i % 2).toInt
      val payload =
        if (i % 17 == 0) Array[Byte](1, 2, 3)
        else kind match {
          case "png" => pngBytes(i, w, h)
          // jpg rows split evenly between grayscale (i%6==1, half with DRI
          // restart markers) and YCbCr 4:2:0 color (i%6==4)
          case "jpg" => if (i % 6 == 4) jpegColorBytes(i, w, h) else jpegBytes(i, w, h)
          case _ => wavBytes(i, sr, ch)
        }
      MediaRow(i, kind, payload)
    }
  }

  final case class ResizedRow(media_id: Long, rw: Int, rh: Int, resized_pixel_sum: Long)

  /** Thumbnail/resize stage over PNG payloads: nearest-neighbor downsample
    * by `factor` per partition (decode buffer reused per row, codec seam as
    * in extractFeatures). Non-PNG / corrupt rows are dropped — a real
    * pipeline forks them to a quarantine sink.
    */
  def resizeFeatures(spark: SparkSession, media: Dataset[MediaRow],
                     factor: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      resizePng(m.payload, factor).map { case (w, h, s) => ResizedRow(m.media_id, w, h, s) }
    })
  }

  final case class FrameRow(media_id: Long, frame_idx: Int, width: Int, height: Int, pixel_sum: Long)

  /** Frame-sampling stage over video payloads: one input row explodes into
    * its sampled, decoded frames (typed flatMap — narrow, no shuffle; only
    * every `every`-th frame's bytes are inflated).
    */
  def frameSampleFeatures(spark: SparkSession, videos: Dataset[MediaRow],
                          every: Int): Dataset[FrameRow] = {
    import spark.implicits._
    videos.flatMap(m => sampleFrames(m.payload, every).map { case (f, w, h, s) =>
      FrameRow(m.media_id, f, w, h, s)
    })
  }

  /** Synthetic video table: GVID containers of real PNG frames; every 13th
    * payload corrupt. Small frames (dims from the id) keep per-row decode
    * bounded while still exercising the full index-parse + per-frame path.
    */
  def syntheticVideos(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val payload =
        if (i % 13 == 0) Array[Byte](9, 9, 9)
        else videoBytes(i, frames = 4 + (i % 5).toInt, w = 24 + (i % 16).toInt, h = 16 + (i % 8).toInt)
      MediaRow(i, "video", payload)
    }
  }

  /** Summary over extracted features (valid rate, byte volume, dims/rate per
    * kind) — column types pinned to long for engine portability.
    */
  def featureSummary(features: DataFrame): DataFrame =
    features.groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
      sum("n_bytes").as("total_bytes"),
      max("width").cast("long").as("max_width"),
      max("height").cast("long").as("max_height"),
      max("sample_rate").cast("long").as("max_sample_rate"),
      sum("pixel_sum").as("total_pixel_sum"))
}
