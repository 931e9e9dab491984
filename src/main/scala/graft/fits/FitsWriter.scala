package graft.fits

import java.io.{ByteArrayOutputStream, DataOutputStream, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal BINTABLE writer — produces standard-conforming FITS files for
  * round-trip tests and the a7 fixture (no FITS library exists in this
  * container, SURVEY §0/§5). Driver-side only (collects rows — fixtures are
  * small; bulk FITS *reading* is the distributed path, a7).
  *
  * Writer/reader parity (FITS 4.0):
  *  - scalar codes L I J K E D, fixed char columns rA;
  *  - fixed numeric array cells rE/rD/rJ/... (`arrayLens`);
  *  - variable-length array cells via P (int32) or Q (int64) descriptors
  *    with heap construction and PCOUNT accounting (`varCols`) — §7.3.5;
  *  - TDIMn multi-dimensional shape cards (`tdims`) — data stays the
  *    standard column-major flat layout; the reader re-nests it.
  */
object FitsWriter {

  private def card(key: String, value: String, quote: Boolean): Array[Byte] = {
    val v = if (quote) s"'${value.padTo(8, ' ')}'" else value
    val text = if (quote) f"${key.padTo(8, ' ')}= $v%-69s" else f"${key.padTo(8, ' ')}= $v%20s"
    text.padTo(FitsFormat.CardSize, ' ').take(FitsFormat.CardSize)
      .getBytes(StandardCharsets.US_ASCII)
  }

  private def endCard: Array[Byte] =
    "END".padTo(FitsFormat.CardSize, ' ').getBytes(StandardCharsets.US_ASCII)

  private def pad(out: DataOutputStream, fill: Byte = 0): Unit = {
    val rem = (FitsFormat.BlockSize - out.size() % FitsFormat.BlockSize) % FitsFormat.BlockSize
    out.write(Array.fill(rem)(fill))
  }

  /** Numeric element: (TFORM code, byte width, big-endian putter). */
  private def elem(dt: DataType): (Char, Int, (ByteBuffer, Any) => Unit) = dt match {
    case ShortType => ('I', 2, (b, v) => b.putShort(v.asInstanceOf[Short]))
    case IntegerType => ('J', 4, (b, v) => b.putInt(v.asInstanceOf[Int]))
    case LongType => ('K', 8, (b, v) => b.putLong(v.asInstanceOf[Long]))
    case FloatType => ('E', 4, (b, v) => b.putFloat(v.asInstanceOf[Float]))
    case DoubleType => ('D', 8, (b, v) => b.putDouble(v.asInstanceOf[Double]))
    case other => throw new IllegalArgumentException(
      s"FitsWriter: unsupported array element $other")
  }

  /** Writes rows as a single-BINTABLE FITS file.
    *  - `strLens`: char width per fixed string column (default 16).
    *  - `arrayLens`: fixed repeat count per array column.
    *  - `varCols`: array columns stored variable-length instead — name →
    *    'P' (32-bit descriptors) or 'Q' (64-bit).
    *  - `tdims`: multi-dim shape card per fixed array column, e.g.
    *    Seq(3, 2) ⇒ TDIMn = '(3,2)' (first axis varies fastest). The
    *    product must equal the column's `arrayLens` entry.
    */
  def write(path: String, schema: StructType, rows: Seq[Row],
      strLens: Map[String, Int] = Map.empty,
      arrayLens: Map[String, Int] = Map.empty,
      varCols: Map[String, Char] = Map.empty,
      tdims: Map[String, Seq[Int]] = Map.empty): Unit = {
    varCols.foreach { case (n, d) =>
      require(d == 'P' || d == 'Q', s"varCols descriptor must be P or Q, got $d")
      // a varCols key that is not an array column would reserve descriptor
      // bytes in widthOf but write through the scalar branch — record
      // corruption. Validate up front.
      require(schema.fields.exists(f => f.name == n &&
          f.dataType.isInstanceOf[ArrayType]),
        s"varCols('$n') must name an ArrayType column of the schema")
    }
    tdims.foreach { case (n, dims) =>
      // must name a FIXED array column whose declared repeat equals the
      // shape product — a vacuous pass here would write TFORM '1E' with
      // TDIM '(3,2)' and every read would then fail in tableSpec
      require(schema.fields.exists(f => f.name == n &&
          f.dataType.isInstanceOf[ArrayType]) && !varCols.contains(n),
        s"tdims('$n') must name a fixed ArrayType column of the schema")
      require(arrayLens.getOrElse(n, 1) == dims.product,
        s"TDIM ${dims.mkString("(", ",", ")")} product != arrayLens($n) = ${arrayLens.getOrElse(n, 1)}") }
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      // Primary HDU: no data.
      out.write(card("SIMPLE", "T", quote = false))
      out.write(card("BITPIX", "8", quote = false))
      out.write(card("NAXIS", "0", quote = false))
      out.write(endCard); pad(out, ' '.toByte)

      def widthOf(f: StructField): Int = f.dataType match {
        case _ if varCols.contains(f.name) => if (varCols(f.name) == 'P') 8 else 16
        case StringType => strLens.getOrElse(f.name, 16)
        case ArrayType(e, _) => elem(e)._2 * arrayLens.getOrElse(f.name, 1)
        case BooleanType => 1
        case dt => elem(dt)._2
      }
      val widths = schema.fields.map(widthOf)
      val rowBytes = widths.sum

      // ---- data unit: records first (buffered), heap second -------------
      // Heap offsets are relative to THEAP, which we leave at its default
      // (= NAXIS1 × NAXIS2), so records and heap are written back-to-back.
      val records = new ByteArrayOutputStream()
      val heap = new ByteArrayOutputStream()
      val buf = ByteBuffer.allocate(rowBytes) // big-endian by default
      // max element count actually written per var column (for TFORM rPE(max))
      val varMax = scala.collection.mutable.Map.empty[String, Long]

      rows.foreach { r =>
        buf.clear()
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          // BINTABLE NULLs need TNULL sentinels, which this writer does
          // not emit — fail loudly up front for EVERY branch rather than
          // NPE mid-write and leave a truncated file on disk (var-length
          // cells additionally have no NULL distinct from count-0).
          require(!r.isNullAt(i),
            s"NULL cell in ${f.name}: this writer emits no TNULL sentinels" +
              " — filter or fill nulls before writing")
          f.dataType match {
            case ArrayType(et, _) if varCols.contains(f.name) =>
              val (_, w, put) = elem(et)
              val xs = r.getSeq[Any](i)
              val off = heap.size().toLong
              val eb = ByteBuffer.allocate(xs.length * w)
              xs.foreach(put(eb, _))
              heap.write(eb.array())
              varMax(f.name) = math.max(varMax.getOrElse(f.name, 0L), xs.length.toLong)
              if (varCols(f.name) == 'P') {
                require(off <= Int.MaxValue && xs.length <= Int.MaxValue,
                  s"heap too large for P descriptors in ${f.name}; use Q")
                buf.putInt(xs.length); buf.putInt(off.toInt)
              } else { buf.putLong(xs.length.toLong); buf.putLong(off) }
            case BooleanType => buf.put((if (r.getBoolean(i)) 'T' else 'F').toByte)
            case StringType =>
              val w = strLens.getOrElse(f.name, 16)
              val b = r.getString(i).getBytes(StandardCharsets.US_ASCII)
              buf.put(b.take(w).padTo(w, ' '.toByte))
            case ArrayType(et, _) =>
              // Enforce the declared repeat: truncate long cells, zero-pad
              // short ones (otherwise offsets shift / stale bytes leak).
              val (_, w, put) = elem(et)
              val n = arrayLens.getOrElse(f.name, 1)
              val xs = r.getSeq[Any](i)
              var k = 0
              while (k < n) {
                if (k < xs.length) put(buf, xs(k))
                else buf.put(new Array[Byte](w))
                k += 1
              }
            case dt => elem(dt)._3(buf, r.get(i))
          }
        }
        records.write(buf.array(), 0, rowBytes)
      }

      out.write(card("XTENSION", "BINTABLE", quote = true))
      out.write(card("BITPIX", "8", quote = false))
      out.write(card("NAXIS", "2", quote = false))
      out.write(card("NAXIS1", rowBytes.toString, quote = false))
      out.write(card("NAXIS2", rows.size.toString, quote = false))
      out.write(card("PCOUNT", heap.size().toString, quote = false)) // heap bytes
      out.write(card("GCOUNT", "1", quote = false))
      out.write(card("TFIELDS", schema.fields.length.toString, quote = false))
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        out.write(card(s"TTYPE${i + 1}", f.name, quote = true))
        val tf = f.dataType match {
          case ArrayType(et, _) if varCols.contains(f.name) =>
            s"1${varCols(f.name)}${elem(et)._1}(${varMax.getOrElse(f.name, 0L)})"
          case StringType => s"${strLens.getOrElse(f.name, 16)}A"
          case ArrayType(et, _) => s"${arrayLens.getOrElse(f.name, 1)}${elem(et)._1}"
          case BooleanType => "L"
          case dt => elem(dt)._1.toString
        }
        out.write(card(s"TFORM${i + 1}", tf, quote = true))
        tdims.get(f.name).foreach(dims =>
          out.write(card(s"TDIM${i + 1}", dims.mkString("(", ",", ")"), quote = true)))
      }
      out.write(endCard); pad(out, ' '.toByte)

      records.writeTo(out)
      heap.writeTo(out)
      pad(out)
    } finally out.close()
  }

  /** ASCII TABLE (XTENSION='TABLE') writer — fixed character fields per
    * FITS 4.0 §7.2. Strings → Aw (left-justified), integers → Iw
    * (right-justified), doubles → Fw.d fixed-point. `dblFmt` = (w, d);
    * values must fit w chars or the write fails loudly (a silently
    * truncated number would corrupt the table).
    */
  def writeAscii(path: String, schema: StructType, rows: Seq[Row],
      strLens: Map[String, Int] = Map.empty,
      dblFmt: (Int, Int) = (14, 4)): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      out.write(card("SIMPLE", "T", quote = false))
      out.write(card("BITPIX", "8", quote = false))
      out.write(card("NAXIS", "0", quote = false))
      out.write(endCard); pad(out, ' '.toByte)

      val (dw, dd) = dblFmt
      def widthOf(f: StructField): Int = f.dataType match {
        case StringType => strLens.getOrElse(f.name, 16)
        case ShortType | IntegerType | LongType => 20
        case DoubleType | FloatType => dw
        case other => throw new IllegalArgumentException(
          s"writeAscii: unsupported $other (ASCII tables hold scalars only)")
      }
      def tformOf(f: StructField): String = f.dataType match {
        case StringType => s"A${widthOf(f)}"
        case ShortType | IntegerType | LongType => s"I${widthOf(f)}"
        case _ => s"F$dw.$dd"
      }
      val widths = schema.fields.map(widthOf)
      val starts = widths.scanLeft(0)(_ + _).init // 0-based field starts
      val rowBytes = widths.sum

      out.write(card("XTENSION", "TABLE", quote = true))
      out.write(card("BITPIX", "8", quote = false))
      out.write(card("NAXIS", "2", quote = false))
      out.write(card("NAXIS1", rowBytes.toString, quote = false))
      out.write(card("NAXIS2", rows.size.toString, quote = false))
      out.write(card("PCOUNT", "0", quote = false))
      out.write(card("GCOUNT", "1", quote = false))
      out.write(card("TFIELDS", schema.fields.length.toString, quote = false))
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        out.write(card(s"TTYPE${i + 1}", f.name, quote = true))
        out.write(card(s"TFORM${i + 1}", tformOf(f), quote = true))
        out.write(card(s"TBCOL${i + 1}", (starts(i) + 1).toString, quote = false))
      }
      out.write(endCard); pad(out, ' '.toByte)

      rows.foreach { r =>
        val sb = new StringBuilder
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          val w = widths(i)
          // SQL NULL → all-blank field, which the reader (and the FITS
          // convention) decodes back to NULL — the pair round-trips nulls.
          val cell = if (r.isNullAt(i)) " " * w else f.dataType match {
            case StringType =>
              val s = r.getString(i)
              require(s.length <= w, s"'$s' exceeds A$w in ${f.name}")
              // blank-padded fields cannot represent "" / all-blank /
              // trailing-space values distinctly (reader: blank→NULL,
              // trailing blanks insignificant) — reject what can't
              // round-trip rather than silently corrupt
              require(s.trim.nonEmpty && s == s.replaceAll("\\s+$", ""),
                s"'$s' in ${f.name} would not round-trip through a blank-padded A field " +
                  "(empty/all-blank/trailing-whitespace); use NULL or trim first")
              s.padTo(w, ' ')
            case ShortType | IntegerType | LongType =>
              val s = String.valueOf(r.getAs[Number](i).longValue)
              require(s.length <= w, s"$s exceeds I$w in ${f.name}")
              (" " * (w - s.length)) + s
            case _ =>
              // Locale.ROOT: a comma-decimal default locale (de_DE…) would
              // write '2,5' — invalid FITS and unparseable on read-back
              val s = String.format(java.util.Locale.ROOT,
                s"%$dw.${dd}f", r.getAs[Number](i).doubleValue).trim
              require(s.length <= w, s"$s exceeds F$dw.$dd in ${f.name}")
              (" " * (w - s.length)) + s
          }
          sb.append(cell)
        }
        out.write(sb.toString.getBytes(StandardCharsets.US_ASCII))
      }
      pad(out, ' '.toByte)
    } finally out.close()
  }
}
