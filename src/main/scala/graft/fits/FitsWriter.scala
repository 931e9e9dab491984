package graft.fits

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal BINTABLE writer — produces standard-conforming FITS files for
  * round-trip tests and the a7 fixture (no FITS library exists in this
  * container, SURVEY §0/§5). Supports the scalar codes the reader maps from
  * Spark types; driver-side only (collects rows — fixtures are small).
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

  private def tform(dt: DataType, strLen: Int): (String, Int) = dt match {
    case BooleanType => ("L", 1)
    case ShortType => ("I", 2)
    case IntegerType => ("J", 4)
    case LongType => ("K", 8)
    case FloatType => ("E", 4)
    case DoubleType => ("D", 8)
    case StringType => (s"${strLen}A", strLen)
    case ArrayType(FloatType, _) => ("E", 4) // repeat applied by caller
    case other => throw new IllegalArgumentException(s"FitsWriter: unsupported $other")
  }

  /** Writes rows as a single-BINTABLE FITS file. `arrayLens` gives the fixed
    * repeat count for array columns; `strLens` the char width per string col.
    */
  def write(path: String, schema: StructType, rows: Seq[Row],
      strLens: Map[String, Int] = Map.empty,
      arrayLens: Map[String, Int] = Map.empty): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      // Primary HDU: no data.
      out.write(card("SIMPLE", "T", quote = false))
      out.write(card("BITPIX", "8", quote = false))
      out.write(card("NAXIS", "0", quote = false))
      out.write(endCard); pad(out, ' '.toByte)

      val widths = schema.fields.map { f =>
        f.dataType match {
          case StringType => strLens.getOrElse(f.name, 16)
          case ArrayType(FloatType, _) => 4 * arrayLens.getOrElse(f.name, 1)
          case dt => tform(dt, 0)._2
        }
      }
      val rowBytes = widths.sum

      out.write(card("XTENSION", "BINTABLE", quote = true))
      out.write(card("BITPIX", "8", quote = false))
      out.write(card("NAXIS", "2", quote = false))
      out.write(card("NAXIS1", rowBytes.toString, quote = false))
      out.write(card("NAXIS2", rows.size.toString, quote = false))
      out.write(card("PCOUNT", "0", quote = false))
      out.write(card("GCOUNT", "1", quote = false))
      out.write(card("TFIELDS", schema.fields.length.toString, quote = false))
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        out.write(card(s"TTYPE${i + 1}", f.name, quote = true))
        val tf = f.dataType match {
          case StringType => s"${strLens.getOrElse(f.name, 16)}A"
          case ArrayType(FloatType, _) => s"${arrayLens.getOrElse(f.name, 1)}E"
          case dt => tform(dt, 0)._1
        }
        out.write(card(s"TFORM${i + 1}", tf, quote = true))
      }
      out.write(endCard); pad(out, ' '.toByte)

      val buf = ByteBuffer.allocate(rowBytes) // big-endian by default
      rows.foreach { r =>
        buf.clear()
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          f.dataType match {
            case BooleanType => buf.put((if (r.getBoolean(i)) 'T' else 'F').toByte)
            case ShortType => buf.putShort(r.getShort(i))
            case IntegerType => buf.putInt(r.getInt(i))
            case LongType => buf.putLong(r.getLong(i))
            case FloatType => buf.putFloat(r.getFloat(i))
            case DoubleType => buf.putDouble(r.getDouble(i))
            case StringType =>
              val w = strLens.getOrElse(f.name, 16)
              val b = r.getString(i).getBytes(StandardCharsets.US_ASCII)
              buf.put(b.take(w).padTo(w, ' '.toByte))
            case ArrayType(FloatType, _) =>
              // Enforce the declared repeat: truncate long cells, zero-pad
              // short ones (otherwise offsets shift / stale bytes leak).
              val n = arrayLens.getOrElse(f.name, 1)
              val xs = r.getSeq[Float](i)
              var k = 0
              while (k < n) { buf.putFloat(if (k < xs.length) xs(k) else 0f); k += 1 }
            case other => throw new IllegalArgumentException(s"unsupported $other")
          }
        }
        out.write(buf.array(), 0, rowBytes)
      }
      pad(out)
    } finally out.close()
  }
}
