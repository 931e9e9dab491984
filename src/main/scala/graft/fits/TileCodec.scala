package graft.fits

import java.io.ByteArrayOutputStream

/** Per-tile cell codecs for the FITS tiled-table compression convention
  * (the fpack table format: a BINTABLE with ZTABLE=T whose stored cells
  * hold each logical column's values for one tile of rows, compressed
  * per ZCTYPn). SURVEY §1.1/§3 (compressed-inputs gap, r3 verdict item).
  *
  * Algorithms (all public knowledge):
  *  - GRAFT_RICE_1 — Rice/Golomb adaptive integer coding in the style
  *    of the FITS tiled-compression convention: first sample raw, then
  *    zigzag-mapped first differences in 32-sample blocks, each block
  *    prefixed by a split-level selector (0 = all-zero block, escape =
  *    verbatim block) and coded quotient-unary + fs low bits. The bit
  *    layout is self-designed, self-consistent, and round-trip tested
  *    at every bytepix — but byte-exact interop with cfitsio's rcomp
  *    cannot be validated in this sandbox (no fpack binary, zero
  *    egress) and is NOT claimed. The codec therefore carries a
  *    PRIVATE ZCTYP identifier: the writer emits 'GRAFT_RICE_1' and
  *    this decoder REJECTS the standard 'RICE_1' label outright (Rice
  *    streams have no checksum, so a genuine fpack file would silently
  *    mis-decode rather than fail). Files that legitimately carry
  *    RICE_1 need a verified cfitsio-compatible decoder, which this
  *    deliberately is not.
  *  - GZIP_1 — the cell bytes through standard gzip.
  *  - GZIP_2 — byte-shuffle (all MSBs first, then next byte, …) by the
  *    element size, then gzip: floats/doubles share exponent bytes, so
  *    shuffling groups the compressible bytes (the fpack default for
  *    floating-point table columns).
  *  - NOCOMPRESS — stored verbatim.
  *
  * All integer work is on sign-extended Long values; zigzag uses the
  * wrap-safe form ((d << 1) ^ (d >> 63)), a bijection on 64 bits, so
  * first differences that overflow Long still round-trip exactly.
  */
object TileCodec {

  val BlockSize = 32

  // ------------------------------------------------------------------
  // bit-level IO
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    /** Low `n` bits of `v`, MSB first. */
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write(cur << (8 - nBits)); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    private var cur = 0
    private var nBits = 0
    def readBit(): Int = {
      if (nBits == 0) {
        if (pos >= bytes.length)
          throw new java.io.EOFException("RICE stream truncated")
        cur = bytes(pos) & 0xff; pos += 1; nBits = 8
      }
      nBits -= 1
      (cur >>> nBits) & 1
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  // ------------------------------------------------------------------
  // GRAFT_RICE_1 (Rice coder)
  // ------------------------------------------------------------------

  private def selectorBits(bytepix: Int): Int = if (bytepix == 8) 7 else 5

  private def zigzag(d: Long): Long = (d << 1) ^ (d >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  /** Encode `vals` (sign-extended logical integer values). */
  def riceEncode(vals: Array[Long], bytepix: Int): Array[Byte] = {
    require(Set(1, 2, 4, 8)(bytepix), s"bad bytepix $bytepix")
    val w = new BitWriter
    if (vals.isEmpty) return w.toBytes
    val elemBits = bytepix * 8
    val selBits = selectorBits(bytepix)
    val escape = (1 << selBits) - 1
    w.writeBits(vals(0), elemBits) // first sample raw
    var i = 1
    while (i < vals.length) {
      val n = math.min(BlockSize, vals.length - i)
      val u = new Array[Long](n)
      var j = 0
      while (j < n) { u(j) = zigzag(vals(i + j) - vals(i + j - 1)); j += 1 }
      // choose fs minimizing the coded size; fall back to verbatim when
      // even the best split loses to raw elemBits-per-sample dumping.
      // u is UNSIGNED: a quotient with bit 63 set (only possible at
      // fs = 0 on 64-bit data) must cost "astronomical", not negative —
      // the r4 full-range bug. bestBits starts at the verbatim cost so
      // the saturated additions below can never overflow past it.
      val verbatimBits = n.toLong * elemBits
      var bestFs = -1
      var bestBits = verbatimBits
      var fs = 0
      while (fs < elemBits && fs < escape - 1) {
        var bits = 0L
        var k = 0
        while (k < n && bits < bestBits) {
          val q = u(k) >>> fs
          // unary quotient + stop bit + fs low bits. The quotient cost is
          // CLAMPED: treated as signed it can be negative (bit 63 set) or
          // so large that q + 1 + fs itself wraps negative, and a wrapped
          // sum once made a catastrophic fs win the comparison. Any
          // quotient beyond Int.MaxValue already dwarfs every possible
          // verbatim block, so the clamp changes no legitimate choice.
          val qc = if (q < 0 || q > Int.MaxValue) Int.MaxValue.toLong else q
          bits += qc + 1 + fs
          k += 1
        }
        if (bits < bestBits) { bestBits = bits; bestFs = fs }
        fs += 1
      }
      val allZero = u.forall(_ == 0L)
      if (allZero) w.writeBits(0L, selBits) // zero block
      else if (bestFs < 0) {
        // verbatim block: the RAW VALUES, not the diffs — a zigzag diff
        // between two in-width values needs elemBits + 1 bits (u can reach
        // 2·(2^(bits-1) − 1) + 1), so writing u in elemBits bits would
        // truncate. Values are in-width by the sign-extension contract.
        w.writeBits(escape.toLong, selBits)
        var k = 0
        while (k < n) { w.writeBits(vals(i + k), elemBits); k += 1 }
      } else {
        w.writeBits((bestFs + 1).toLong, selBits)
        var k = 0
        while (k < n) {
          val q = u(k) >>> bestFs
          var b = 0L
          while (b < q) { w.writeBit(1); b += 1 }
          w.writeBit(0)
          w.writeBits(u(k), bestFs)
          k += 1
        }
      }
      i += n
    }
    w.toBytes
  }

  /** Decode `n` logical values. */
  def riceDecode(bytes: Array[Byte], n: Int, bytepix: Int): Array[Long] = {
    require(Set(1, 2, 4, 8)(bytepix), s"bad bytepix $bytepix")
    val out = new Array[Long](n)
    if (n == 0) return out
    val elemBits = bytepix * 8
    val selBits = selectorBits(bytepix)
    val escape = (1 << selBits) - 1
    val r = new BitReader(bytes)
    // sign-extend the raw first sample back to Long
    out(0) = (r.readBits(elemBits) << (64 - elemBits)) >> (64 - elemBits)
    var i = 1
    while (i < n) {
      val blockN = math.min(BlockSize, n - i)
      val sel = r.readBits(selBits).toInt
      var k = 0
      if (sel == 0) {
        while (k < blockN) { out(i + k) = out(i + k - 1); k += 1 }
      } else if (sel == escape) {
        while (k < blockN) { // verbatim: raw sign-extended values
          out(i + k) = (r.readBits(elemBits) << (64 - elemBits)) >> (64 - elemBits)
          k += 1
        }
      } else {
        val fs = sel - 1
        while (k < blockN) {
          var q = 0L
          while (r.readBit() == 1) q += 1
          val u = (q << fs) | r.readBits(fs)
          out(i + k) = out(i + k - 1) + unzigzag(u)
          k += 1
        }
      }
      i += blockN
    }
    out
  }

  // ------------------------------------------------------------------
  // GRAFT_PLIO_1 (run-length mask coder)
  // ------------------------------------------------------------------

  /** Run-length coding for MASK images — the workload fpack's PLIO_1
    * (IRAF pixel-list compression) exists for: images whose pixels are
    * small labels (0/1 bad-pixel masks, object-id segmentation maps)
    * with long constant runs. Layout: a sequence of (value, runLength)
    * pairs, value as zigzag LEB128 varint, runLength as plain LEB128
    * varint. Self-designed and self-consistent like GRAFT_RICE_1 —
    * byte-level interop with IRAF's line-list format is NOT claimed, so
    * the writer emits the private 'GRAFT_PLIO_1' label and the decoder
    * rejects the standard 'PLIO_1' outright (same honesty rule as
    * RICE_1: no checksum means a genuine IRAF file would silently
    * mis-decode rather than fail).
    */
  def rleEncode(vals: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def putVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    var i = 0
    while (i < vals.length) {
      val v = vals(i)
      var j = i + 1
      while (j < vals.length && vals(j) == v) j += 1
      putVarint(zigzag(v))
      putVarint((j - i).toLong)
      i = j
    }
    out.toByteArray
  }

  def rleDecode(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    def getVarint(): Long = {
      var v = 0L
      var shift = 0
      var b = 0x80
      while ((b & 0x80) != 0) {
        if (pos >= bytes.length)
          throw new java.io.EOFException("PLIO stream truncated")
        // a Long holds at most ten 7-bit groups; past shift 63 the JVM
        // shift wraps mod 64 and a hostile varint would decode silently
        require(shift < 64, "PLIO varint exceeds 64 bits")
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      }
      v
    }
    var i = 0
    while (i < n) {
      val v = unzigzag(getVarint())
      val run = getVarint()
      // run <= n - i, NOT i + run <= n: a hostile near-Long.MaxValue
      // run would wrap i + run negative and slip past the sum form
      require(run > 0 && run <= (n - i).toLong,
        s"PLIO run of $run at $i overflows tile of $n")
      var k = 0
      while (k < run) { out(i + k) = v; k += 1 }
      i += run.toInt
    }
    require(pos == bytes.length, "PLIO stream has trailing bytes")
    out
  }

  // ------------------------------------------------------------------
  // GRAFT_HCOMP_1 (2-D integer H-transform + Rice)
  // ------------------------------------------------------------------

  /** Exact separable 2-D integer Haar/H-transform, Mallat ordering —
    * the transform class behind fpack's HCOMPRESS_1 (White 1992:
    * hierarchical 2-D differencing decorrelates smooth rasters in BOTH
    * axes, where Rice's row-wise diffs see only one). Per level: an
    * x-pass turns each row of the current LL region into [sums |
    * diffs] (s = a+b, d = a−b; an odd trailing element passes
    * through), then a y-pass does the same on its columns; the new LL
    * is the top-left ceil-half quadrant and the level recurses on it.
    * Pure +/− — no division, so the transform is EXACT on Longs and
    * the inverse ((s+d)/2 and (s−d)/2 are exact: s+d = 2a by
    * construction) loses nothing at any size, odd dims included.
    * Coefficients grow ≤ ×4 per level (bounded by region sum).
    *
    * The coded blob is self-describing: varint w, varint h, then the
    * coefficient array Rice-coded at bytepix 8 (coefficients exceed
    * the input width after summation levels). Like GRAFT_RICE_1 /
    * GRAFT_PLIO_1, the layout is private and self-consistent — bit
    * interop with cfitsio's hcompress is NOT claimed, the writer emits
    * 'GRAFT_HCOMP_1', and the standard 'HCOMPRESS_1' label is rejected
    * outright (no checksum ⇒ a genuine fpack file would silently
    * mis-decode rather than fail).
    */
  def htrans(a: Array[Long], w: Int, h: Int): Unit = {
    require(a.length == w * h, s"htrans: ${a.length} values for ${w}x$h")
    val tmp = new Array[Long](math.max(w, h))
    var cw = w; var ch = h
    while (cw > 1 || ch > 1) {
      if (cw > 1) {
        val nw = (cw + 1) / 2
        var y = 0
        while (y < ch) {
          val base = y * w
          var x = 0
          while (x < cw / 2) {
            tmp(x) = a(base + 2 * x) + a(base + 2 * x + 1)
            tmp(nw + x) = a(base + 2 * x) - a(base + 2 * x + 1)
            x += 1
          }
          if (cw % 2 == 1) tmp(nw - 1) = a(base + cw - 1)
          System.arraycopy(tmp, 0, a, base, cw)
          y += 1
        }
      }
      if (ch > 1) {
        val nh = (ch + 1) / 2
        var x = 0
        while (x < cw) {
          var y = 0
          while (y < ch / 2) {
            tmp(y) = a(2 * y * w + x) + a((2 * y + 1) * w + x)
            tmp(nh + y) = a(2 * y * w + x) - a((2 * y + 1) * w + x)
            y += 1
          }
          if (ch % 2 == 1) tmp(nh - 1) = a((ch - 1) * w + x)
          y = 0
          while (y < ch) { a(y * w + x) = tmp(y); y += 1 }
          x += 1
        }
      }
      cw = (cw + 1) / 2
      ch = (ch + 1) / 2
    }
  }

  def hinv(a: Array[Long], w: Int, h: Int): Unit = {
    require(a.length == w * h, s"hinv: ${a.length} values for ${w}x$h")
    // replay the forward level sizes, then invert them in reverse
    var sizes = List.empty[(Int, Int)]
    var cw = w; var ch = h
    while (cw > 1 || ch > 1) {
      sizes = (cw, ch) :: sizes
      cw = (cw + 1) / 2; ch = (ch + 1) / 2
    }
    val tmp = new Array[Long](math.max(w, h))
    sizes.foreach { case (lw, lh) =>
      if (lh > 1) {
        val nh = (lh + 1) / 2
        var x = 0
        while (x < lw) {
          var y = 0
          while (y < lh / 2) {
            val s = a(y * w + x); val d = a((nh + y) * w + x)
            tmp(2 * y) = (s + d) / 2
            tmp(2 * y + 1) = (s - d) / 2
            y += 1
          }
          if (lh % 2 == 1) tmp(lh - 1) = a((nh - 1) * w + x)
          y = 0
          while (y < lh) { a(y * w + x) = tmp(y); y += 1 }
          x += 1
        }
      }
      if (lw > 1) {
        val nw = (lw + 1) / 2
        var y = 0
        while (y < lh) {
          val base = y * w
          var x = 0
          while (x < lw / 2) {
            val s = a(base + x); val d = a(base + nw + x)
            tmp(2 * x) = (s + d) / 2
            tmp(2 * x + 1) = (s - d) / 2
            x += 1
          }
          if (lw % 2 == 1) tmp(lw - 1) = a(base + nw - 1)
          System.arraycopy(tmp, 0, a, base, lw)
          y += 1
        }
      }
    }
  }

  /** GRAFT_HCOMP_1 cell: varint w, varint h, rice(htrans(vals), 8). */
  def hcompEncode(vals: Array[Long], w: Int, h: Int): Array[Byte] = {
    val coef = vals.clone()
    htrans(coef, w, h)
    val out = new ByteArrayOutputStream()
    def putVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    putVarint(w.toLong); putVarint(h.toLong)
    out.write(riceEncode(coef, 8))
    out.toByteArray
  }

  def hcompDecode(blob: Array[Byte], nElems: Int,
      expectDims: Option[(Int, Int)] = None): Array[Long] = {
    var pos = 0
    def getVarint(): Long = {
      var v = 0L; var shift = 0; var b = 0x80
      while ((b & 0x80) != 0) {
        if (pos >= blob.length)
          throw new java.io.EOFException("HCOMP stream truncated")
        // same wrap guard as rleDecode: JVM shifts are mod 64, so an
        // unbounded varint would decode garbage instead of erroring
        require(shift < 64, "HCOMP varint exceeds 64 bits")
        b = blob(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      }
      v
    }
    val w = getVarint().toInt
    val h = getVarint().toInt
    require(w > 0 && h > 0 && w.toLong * h == nElems,
      s"HCOMP geometry ${w}x$h does not match tile of $nElems values")
    // a product check alone admits transposed/re-factored dims (32x128
    // for a 64x64 tile) and hinv would run with the wrong geometry —
    // callers that know the tile spec pin the exact shape
    expectDims.foreach { case (ew, eh) =>
      require(w == ew && h == eh,
        s"HCOMP geometry ${w}x$h does not match tile spec ${ew}x$eh")
    }
    val coef = riceDecode(java.util.Arrays.copyOfRange(blob, pos, blob.length),
      nElems, 8)
    hinv(coef, w, h)
    coef
  }

  // ------------------------------------------------------------------
  // GZIP_1 / GZIP_2
  // ------------------------------------------------------------------

  def gzipEncode(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  def gzipDecode(bytes: Array[Byte]): Array[Byte] = {
    val g = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try g.readAllBytes() finally g.close()
  }

  /** GZIP_2 byte shuffle: output = all bytes 0 of each element, then all
    * bytes 1, … (elements stay big-endian within the input).
    */
  def shuffle(bytes: Array[Byte], elemBytes: Int): Array[Byte] = {
    require(bytes.length % elemBytes == 0,
      s"shuffle: ${bytes.length} bytes not a multiple of $elemBytes")
    val n = bytes.length / elemBytes
    val out = new Array[Byte](bytes.length)
    var i = 0
    while (i < n) {
      var b = 0
      while (b < elemBytes) {
        out(b * n + i) = bytes(i * elemBytes + b)
        b += 1
      }
      i += 1
    }
    out
  }

  def unshuffle(bytes: Array[Byte], elemBytes: Int): Array[Byte] = {
    require(bytes.length % elemBytes == 0,
      s"unshuffle: ${bytes.length} bytes not a multiple of $elemBytes")
    val n = bytes.length / elemBytes
    val out = new Array[Byte](bytes.length)
    var i = 0
    while (i < n) {
      var b = 0
      while (b < elemBytes) {
        out(i * elemBytes + b) = bytes(b * n + i)
        b += 1
      }
      i += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // per-column tile encode/decode (raw big-endian cell bytes <-> blob)
  // ------------------------------------------------------------------

  /** Compress one column-tile. `raw` = the tile's values as contiguous
    * big-endian element bytes (exactly what an uncompressed BINTABLE
    * column-major cell would hold). For GRAFT_RICE_1 the elements are
    * read as sign-extended integers of `elemBytes`.
    */
  def encodeCell(algo: String, raw: Array[Byte], elemBytes: Int): Array[Byte] =
    algo match {
      case "GRAFT_RICE_1" =>
        riceEncode(bytesToLongs(raw, elemBytes), elemBytes)
      case "GRAFT_PLIO_1" =>
        rleEncode(bytesToLongs(raw, elemBytes))
      case "GZIP_1" => gzipEncode(raw)
      case "GZIP_2" => gzipEncode(shuffle(raw, elemBytes))
      case "NOCOMPRESS" => raw
      // GRAFT_HCOMP_1 encoding needs tile GEOMETRY, not just a byte run
      // — writers call hcompEncode(vals, w, h) directly; decode is
      // generic because the blob self-describes its dims
      case "RICE_1" => throw new IllegalArgumentException(riceInteropMsg)
      case "PLIO_1" => throw new IllegalArgumentException(plioInteropMsg)
      case "HCOMPRESS_1" => throw new IllegalArgumentException(hcompInteropMsg)
      case a => throw new IllegalArgumentException(s"unsupported ZCTYP '$a'")
    }

  /** Why the standard HCOMPRESS_1 label is rejected (the RICE_1 rule). */
  private val hcompInteropMsg: String =
    "ZCTYP 'HCOMPRESS_1' is not supported: this engine's H-transform " +
      "coder is not verified bit-compatible with cfitsio's hcompress, " +
      "and the stream carries no checksum, so a genuine fpack file " +
      "would silently mis-decode. Files written by this engine use the " +
      "private label 'GRAFT_HCOMP_1'; for external HCOMPRESS_1 files " +
      "use funpack/astropy, or re-export with GZIP_1/GZIP_2."

  /** Why the standard PLIO_1 label is rejected (the RICE_1 rule). */
  private val plioInteropMsg: String =
    "ZCTYP 'PLIO_1' is not supported: this engine's run-length mask " +
      "coder is not verified byte-compatible with IRAF's line-list " +
      "format, and the stream carries no checksum, so a genuine fpack " +
      "PLIO file would silently mis-decode. Files written by this " +
      "engine use the private label 'GRAFT_PLIO_1'; for external " +
      "PLIO_1 files use funpack/astropy, or re-export with GZIP_1."

  /** Why the standard RICE_1 label is rejected (see object Scaladoc). */
  private val riceInteropMsg: String =
    "ZCTYP 'RICE_1' is not supported: this engine's Rice codec is not " +
      "verified byte-compatible with cfitsio's rcomp, and Rice streams " +
      "carry no checksum, so a genuine fpack file would silently " +
      "mis-decode. Files written by this engine use the private label " +
      "'GRAFT_RICE_1'; for external RICE_1 files use funpack/astropy, " +
      "or re-export with GZIP_1/GZIP_2."

  /** Decompress one column-tile back to raw big-endian element bytes.
    * `nElems` = elements in this tile (rows × repeat). `expectDims` =
    * the tile spec's (width, rows) when the caller knows the 2-D shape
    * — pins HCOMP's self-described geometry to the spec, not just the
    * element product (table-column tiles are 1-D and pass None).
    */
  def decodeCell(algo: String, blob: Array[Byte], nElems: Int,
      elemBytes: Int, expectDims: Option[(Int, Int)] = None): Array[Byte] =
    algo match {
    case "GRAFT_RICE_1" =>
      longsToBytes(riceDecode(blob, nElems, elemBytes), elemBytes)
    case "GRAFT_PLIO_1" =>
      longsToBytes(rleDecode(blob, nElems), elemBytes)
    case "GRAFT_HCOMP_1" =>
      longsToBytes(hcompDecode(blob, nElems, expectDims), elemBytes)
    case "GZIP_1" => gzipDecode(blob)
    case "GZIP_2" => unshuffle(gzipDecode(blob), elemBytes)
    case "NOCOMPRESS" => blob
    case "RICE_1" => throw new IllegalArgumentException(riceInteropMsg)
    case "PLIO_1" => throw new IllegalArgumentException(plioInteropMsg)
    case "HCOMPRESS_1" => throw new IllegalArgumentException(hcompInteropMsg)
    case a => throw new IllegalArgumentException(s"unsupported ZCTYP '$a'")
  }

  def bytesToLongs(raw: Array[Byte], elemBytes: Int): Array[Long] = {
    require(raw.length % elemBytes == 0, "cell bytes not element-aligned")
    val n = raw.length / elemBytes
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var v = 0L
      var b = 0
      while (b < elemBytes) { v = (v << 8) | (raw(i * elemBytes + b) & 0xffL); b += 1 }
      // sign-extend from elemBytes*8 bits
      out(i) = (v << (64 - elemBytes * 8)) >> (64 - elemBytes * 8)
      i += 1
    }
    out
  }

  def longsToBytes(vals: Array[Long], elemBytes: Int): Array[Byte] = {
    val out = new Array[Byte](vals.length * elemBytes)
    var i = 0
    while (i < vals.length) {
      var b = 0
      while (b < elemBytes) {
        out(i * elemBytes + b) =
          ((vals(i) >>> ((elemBytes - 1 - b) * 8)) & 0xff).toByte
        b += 1
      }
      i += 1
    }
    out
  }
}
