package graft.codec

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) interleaving over order-preserving 64-bit images
  * of column values — the bit substrate of `CALL graft.sys.cluster`
  * (multi-dimensional region clustering, the capability Delta Lake
  * ships as `OPTIMIZE ... ZORDER BY`).
  *
  * Each value maps to an UNSIGNED-comparable 64-bit image via the same
  * published bit tricks [[KeyCodec]] uses for its ordered encodings
  * (sign-flip for integrals, IEEE sign-magnitude fold for floats,
  * first 8 UTF-8 bytes for strings); images of n columns are then
  * interleaved MSB-first round-robin, so the top bits of the z-value
  * cycle through the top bits of every column. Rows close in z are
  * close in EVERY clustered dimension, which is what makes per-region
  * min/max stats tight on all of them at once.
  *
  * The final z is flipped back into the signed domain so plain
  * `ORDER BY` / `repartitionByRange` on a Spark LongType sorts it
  * correctly. NULL maps to image 0 (sorts first, like NULLS FIRST).
  */
object ZOrder {

  /** Types a clustering column may have (scalar, ordered). */
  val supportedTypes: Seq[DataType] = KeyCodec.supportedTypes

  // ------------------------------------------------- 64-bit images
  // (unsigned-comparable: u1 < u2 as unsigned  <=>  v1 < v2)

  def u64Long(v: Long): Long = v ^ Long.MinValue

  def u64Double(v: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(v)
    bits ^ (if (bits < 0) -1L else Long.MinValue)
  }

  def u64Float(v: Float): Long = {
    val bits = java.lang.Float.floatToIntBits(v)
    val folded = bits ^ (if (bits < 0) 0xFFFFFFFF else 0x80000000)
    // widen into the TOP 32 bits: z-interleaving consumes MSBs
    (folded.toLong & 0xFFFFFFFFL) << 32
  }

  def u64Bytes(b: Array[Byte]): Long = {
    var u = 0L
    var i = 0
    val n = math.min(8, b.length)
    while (i < n) { u |= (b(i) & 0xFFL) << (56 - 8 * i); i += 1 }
    u
  }

  def u64String(s: UTF8String): Long = u64Bytes(s.getBytes)

  /** Image of a catalyst-internal value of type `dt`; null → 0. */
  def u64(dt: DataType, v: Any): Long =
    if (v == null) 0L
    else dt match {
      case BooleanType => if (v.asInstanceOf[Boolean]) 1L << 63 else 0L
      case ByteType =>
        (((v.asInstanceOf[Byte].toInt ^ 0x80) & 0xFF).toLong) << 56
      case ShortType =>
        (((v.asInstanceOf[Short].toInt ^ 0x8000) & 0xFFFF).toLong) << 48
      case IntegerType | DateType =>
        ((v.asInstanceOf[Int].toLong ^ 0x80000000L) & 0xFFFFFFFFL) << 32
      case LongType | TimestampType => u64Long(v.asInstanceOf[Long])
      case FloatType => u64Float(v.asInstanceOf[Float])
      case DoubleType => u64Double(v.asInstanceOf[Double])
      case StringType => v match {
        case u: UTF8String => u64String(u)
        case s: String => u64Bytes(s.getBytes(StandardCharsets.UTF_8))
      }
      case other =>
        throw new IllegalArgumentException(s"zorder: unsupported $other")
    }

  /** Signed-comparable image: natural Long order == value order. */
  def s64(dt: DataType, v: Any): Long = u64(dt, v) ^ Long.MinValue

  /** RANKED image for clustering: raw images put small-domain values'
    * information in LOW bits, which the top-bits interleave truncates
    * away (z collapses to a constant — the classic z-order pitfall).
    * `CALL graft.sys.cluster` therefore samples each column and maps
    * values to their RANGE-PARTITION RANK among `boundaries` (sorted
    * signed images), placing the rank in the TOP `rankBits` bits —
    * the same move Delta Lake makes with `range_partition_id` before
    * interleaving. Monotone in the value; ~equal row mass per rank. */
  def rankImage(boundaries: Array[Long], s64Img: Long,
      rankBits: Int): Long = {
    val bs = java.util.Arrays.binarySearch(boundaries, s64Img)
    val r = if (bs >= 0) bs + 1 else -(bs + 1)
    // scale the rank to FILL the rank field: deduped boundaries can
    // leave far fewer ranks than 2^rankBits, and an unscaled rank
    // would sit in the field's low bits — exactly the truncation this
    // mapping exists to avoid
    val numRanks = boundaries.length + 1
    ((r.toLong << rankBits) / numRanks) << (64 - rankBits)
  }

  /** Interleave the unsigned images MSB-first round-robin into one
    * 64-bit z, returned in the SIGNED domain (top bit flipped) so
    * Spark's natural Long ordering sorts it. */
  def interleave(us: Array[Long]): Long = {
    val n = us.length
    var z = 0L
    var j = 0
    while (j < 64) {
      val bit = (us(j % n) >>> (63 - j / n)) & 1L
      z |= bit << (63 - j)
      j += 1
    }
    z ^ Long.MinValue
  }
}
