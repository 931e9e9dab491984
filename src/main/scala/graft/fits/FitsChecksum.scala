package graft.fits

import java.nio.charset.StandardCharsets

/** The FITS checksum convention (FITS 4.0 §4.4.2.7 and the Seaman
  * checksum proposal, public documents): DATASUM records the 32-bit
  * ones-complement sum of the data unit as a decimal string, and CHECKSUM
  * holds a 16-character ASCII-encoded value chosen so the ones-complement
  * sum of the ENTIRE HDU (header including the CHECKSUM card + data)
  * equals 0xFFFFFFFF — "minus zero" — making whole-file integrity a
  * single streaming sum with no side table.
  *
  * The ASCII encoding follows the published algorithm: the complement is
  * split into 4 bytes, each byte spread over 4 characters offset from
  * ASCII '0' with pairwise ±1 adjustments stepping out of the 13
  * excluded punctuation characters (pair sums invariant), the 16 chars
  * byte-column interleaved and rotated right one place (the rotation
  * matches the value's fixed column in the card image, which is what
  * makes the card's own bytes close the sum to -0).
  *
  * Interop caveat (the TileCodec/RICE precedent): self-consistency and
  * the -0 invariant are verified in-spec, but byte-level agreement with
  * cfitsio cannot be validated in this zero-egress sandbox — verify
  * against an external tool before relying on foreign files' checksums.
  */
object FitsChecksum {

  /** 32-bit ones-complement sum (end-around carry) of big-endian words.
    * `len` must be a multiple of 4 — always true for FITS units (2880-
    * block padded).
    */
  def ones32(bytes: Array[Byte], from: Int, len: Int, init: Long): Long = {
    require(len % 4 == 0, s"ones32 needs 4-aligned length, got $len")
    var sum = init
    var i = from
    val end = from + len
    while (i < end) {
      sum += ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
      i += 4
    }
    while ((sum >>> 32) != 0) sum = (sum & 0xffffffffL) + (sum >>> 32)
    sum
  }

  private val Excluded: Array[Char] =
    ":;<=>?@[\\]^_`".toCharArray

  /** ASCII-encode the 32-bit value per the convention (see object doc). */
  def encode(value: Long): String = {
    val out = new Array[Char](16)
    var i = 0
    while (i < 4) {
      val b = ((value >>> (8 * (3 - i))) & 0xff).toInt
      val ch = Array.fill(4)(b / 4 + '0')
      ch(0) += b % 4
      var adjusting = true
      while (adjusting) {
        adjusting = false
        var k = 0
        while (k < Excluded.length) {
          var j = 0
          while (j < 4) {
            if (ch(j) == Excluded(k) || ch(j + 1) == Excluded(k)) {
              ch(j) += 1; ch(j + 1) -= 1; adjusting = true
            }
            j += 2
          }
          k += 1
        }
      }
      var j = 0
      while (j < 4) { out(4 * j + i) = ch(j).toChar; j += 1 }
      i += 1
    }
    // rotate right one place (fixed card-column alignment)
    (out(15) +: out.take(15)).mkString
  }

  // ONE walk implementation (FitsFormat.walkHdus — byte-accounted, no
  // EOF swallow) and ONE card formatter (FitsWriter.card — pads quoted
  // strings to the FITS 8-char minimum) serve reader, writer, inventory
  // and this module; a damaged file therefore throws here instead of
  // being silently truncated by the rewrite below.
  private def walk(bytes: Array[Byte]): Seq[FitsFormat.HduLoc] =
    FitsFormat.walkHdus(
      new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)),
      bytes.length.toLong)

  /** Rewrites `path` in place with DATASUM + CHECKSUM cards in every HDU
    * header (inserted before END; header re-padded). A post-pass by
    * design here — at scale the sums fold into the write path (they are
    * one streaming add per word); fixture files are MBs.
    */
  def addChecksums(path: String): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bos = new java.io.ByteArrayOutputStream(bytes.length + 4 * 2880)
    walk(bytes).foreach { h =>
      val hdrEnd = (h.headerStart + h.headerBytes).toInt
      // locate the END card inside the original header bytes
      var endPos = h.headerStart.toInt
      while (!(bytes(endPos) == 'E' && bytes(endPos + 1) == 'N' &&
        bytes(endPos + 2) == 'D' && bytes(endPos + 3) == ' ')) {
        endPos += 80
        require(endPos < hdrEnd, s"END card not found in HDU at ${h.headerStart}")
      }
      val dataFrom = hdrEnd
      val datasum = ones32(bytes, dataFrom, h.dataBytes.toInt, 0L)
      // new header: cards before END + DATASUM + CHECKSUM(placeholder) +
      // END, padded to a block multiple. Prior DATASUM/CHECKSUM cards are
      // DROPPED first — re-stamping must replace, not accumulate
      // (duplicate keywords are malformed FITS and the stale pair would
      // shadow the fresh one under first-occurrence readers).
      val pre0 = java.util.Arrays.copyOfRange(bytes, h.headerStart.toInt, endPos)
      val pre = pre0.grouped(80).filterNot { c =>
        val key = new String(c.take(8), StandardCharsets.US_ASCII).trim
        key == "DATASUM" || key == "CHECKSUM"
      }.flatten.toArray
      val dsCard = FitsWriter.card("DATASUM", datasum.toString, quote = true)
      val ckPlaceholder = FitsWriter.card("CHECKSUM", "0" * 16, quote = true)
      val endCard = "END".padTo(80, ' ').getBytes(StandardCharsets.US_ASCII)
      val rawLen = pre.length + dsCard.length + ckPlaceholder.length + endCard.length
      val paddedLen = ((rawLen + FitsFormat.BlockSize - 1) /
        FitsFormat.BlockSize) * FitsFormat.BlockSize
      val header = new Array[Byte](paddedLen)
      java.util.Arrays.fill(header, ' '.toByte)
      System.arraycopy(pre, 0, header, 0, pre.length)
      System.arraycopy(dsCard, 0, header, pre.length, 80)
      val ckPos = pre.length + 80
      System.arraycopy(ckPlaceholder, 0, header, ckPos, 80)
      System.arraycopy(endCard, 0, header, ckPos + 80, 80)
      // the complement of (header-with-placeholder + data) closes the
      // HDU sum to 0xFFFFFFFF once encoded into the CHECKSUM value
      val hduSum = ones32(bytes, dataFrom, h.dataBytes.toInt,
        ones32(header, 0, paddedLen, 0L))
      val complement = 0xffffffffL - hduSum
      val enc = encode(complement).getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(enc, 0, header, ckPos + 11, 16) // inside the quotes
      bos.write(header)
      bos.write(bytes, dataFrom, h.dataBytes.toInt)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bos.toByteArray)
  }

  /** Per-HDU verification: (hduIndex, hasChecksum, datasumOk, hduOk).
    * hduOk is the streaming invariant — ones-complement sum of the whole
    * HDU image equals 0xFFFFFFFF; datasumOk recomputes the data sum
    * against the recorded decimal.
    *
    * STREAMS: the header walk skips data units and the sums fold over a
    * bounded window read through a positioned FileChannel, so memory is
    * O(window) and extents stay Long — this is the archive-scale path
    * (a FITS file routinely exceeds 2 GB; `addChecksums` above remains
    * the fixture-scale whole-array rewrite and documents that caveat).
    */
  def verify(path: String): Seq[(Int, Boolean, Boolean, Boolean)] = {
    val p = java.nio.file.Paths.get(path)
    val total = java.nio.file.Files.size(p)
    val hdus = {
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(p), 1 << 16))
      try FitsFormat.walkHdus(in, total) finally in.close()
    }
    val ch = java.nio.channels.FileChannel.open(
      p, java.nio.file.StandardOpenOption.READ)
    try {
      // 64 blocks (180 KB): multiple of 4 so every chunk is word-aligned
      val buf = new Array[Byte](FitsFormat.BlockSize * 64)
      def sumRange(from: Long, len: Long, init: Long = 0L): Long = {
        require(len % 4 == 0, s"ones-complement sum needs 4-aligned length, got $len")
        var sum = init
        var off = from
        var remaining = len
        while (remaining > 0) {
          val want = math.min(remaining, buf.length.toLong).toInt
          val bb = java.nio.ByteBuffer.wrap(buf, 0, want)
          while (bb.hasRemaining) {
            val r = ch.read(bb, off + bb.position())
            require(r > 0, s"unexpected EOF at ${off + bb.position()} in $path")
          }
          sum = ones32(buf, 0, want, sum)
          off += want
          remaining -= want
        }
        sum
      }
      hdus.zipWithIndex.map { case (h, i) =>
        val has = h.cards.contains("CHECKSUM") && h.cards.contains("DATASUM")
        val dataFrom = h.headerStart + h.headerBytes
        if (!has) (i, has, false, false)
        else {
          // ones-complement (end-around-carry) addition is associative
          // and commutative, so the HDU sum folds the already-computed
          // data sum with a header-only pass instead of re-reading the
          // whole data unit — halving I/O on archive-scale files (the
          // old form read every data byte twice). The two-zeros edge of
          // ones' complement cannot bite: a sum reaches literal 0 only
          // if every input word is 0, impossible for an ASCII header.
          val dataSum = sumRange(dataFrom, h.dataBytes)
          val dsOk = h.cards("DATASUM").trim == dataSum.toString
          val hduOk =
            sumRange(h.headerStart, h.headerBytes, init = dataSum) == 0xffffffffL
          (i, has, dsOk, hduOk)
        }
      }
    } finally ch.close()
  }
}
