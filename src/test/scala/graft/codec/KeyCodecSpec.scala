package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import scala.util.Random

/** Property tests replacing the reference's BytesUtilsSuite: encoding is
  * order-preserving, round-trips, and successor is the least upper bound
  * in byte space. Seeded-random property loops (scalatestplus bridge is
  * not in the offline cache). */
class KeyCodecSpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private def sign(i: Int): Int = Integer.signum(i)
  private def forAll[A](gen: => A)(body: (A, A) => Unit): Unit =
    (1 to 300).foreach { _ => body(gen, gen) }

  test("int encoding preserves order and round-trips") {
    forAll(rnd.nextInt()) { (a, b) =>
      val (ea, eb) = (KeyCodec.encode(IntegerType, a), KeyCodec.encode(IntegerType, b))
      assert(sign(KeyCodec.compare(ea, eb)) == sign(a.compareTo(b)))
      assert(KeyCodec.decode(IntegerType, ea, 0, 4) == a)
    }
  }

  test("long encoding preserves order and round-trips") {
    forAll(rnd.nextLong()) { (a, b) =>
      val (ea, eb) = (KeyCodec.encode(LongType, a), KeyCodec.encode(LongType, b))
      assert(sign(KeyCodec.compare(ea, eb)) == sign(a.compareTo(b)))
      assert(KeyCodec.decode(LongType, ea, 0, 8) == a)
    }
  }

  test("short and byte encodings preserve order and round-trip") {
    forAll(rnd.nextInt().toShort) { (a, b) =>
      val (ea, eb) = (KeyCodec.encode(ShortType, a), KeyCodec.encode(ShortType, b))
      assert(sign(KeyCodec.compare(ea, eb)) == sign(a.compareTo(b)))
      assert(KeyCodec.decode(ShortType, ea, 0, 2) == a)
    }
    forAll(rnd.nextInt().toByte) { (a, b) =>
      val (ea, eb) = (KeyCodec.encode(ByteType, a), KeyCodec.encode(ByteType, b))
      assert(sign(KeyCodec.compare(ea, eb)) == sign(a.compareTo(b)))
      assert(KeyCodec.decode(ByteType, ea, 0, 1) == a)
    }
  }

  test("double encoding preserves order incl. negatives and round-trips") {
    forAll((rnd.nextDouble() - 0.5) * 2e12) { (a, b) =>
      val (ea, eb) = (KeyCodec.encode(DoubleType, a), KeyCodec.encode(DoubleType, b))
      assert(sign(KeyCodec.compare(ea, eb)) == sign(a.compareTo(b)))
      assert(KeyCodec.decode(DoubleType, ea, 0, 8) == a)
    }
  }

  test("float encoding preserves order and round-trips") {
    forAll((rnd.nextFloat() - 0.5f) * 2e6f) { (a, b) =>
      val (ea, eb) = (KeyCodec.encode(FloatType, a), KeyCodec.encode(FloatType, b))
      assert(sign(KeyCodec.compare(ea, eb)) == sign(a.compareTo(b)))
      assert(KeyCodec.decode(FloatType, ea, 0, 4) == a)
    }
  }

  test("string encoding preserves order (no NUL) and round-trips") {
    forAll(rnd.alphanumeric.take(rnd.nextInt(12)).mkString) { (a, b) =>
      val (ea, eb) = (KeyCodec.encode(StringType, a), KeyCodec.encode(StringType, b))
      // byte-wise UTF-8 order == codepoint order for these alphabets
      assert(sign(KeyCodec.compare(ea, eb)) == sign(a.compareTo(b)))
      assert(KeyCodec.decode(StringType, ea, 0, ea.length) == a)
    }
  }

  test("string key with NUL is rejected") {
    intercept[IllegalArgumentException] {
      KeyCodec.encode(StringType, "a\u0000b")
    }
  }

  test("composite key round-trips with interior string dimension") {
    val types = Seq(IntegerType, StringType, LongType)
    (1 to 300).foreach { _ =>
      val (i, s, l) = (rnd.nextInt(2001) - 1000,
        rnd.alphanumeric.take(rnd.nextInt(12)).mkString,
        rnd.nextLong() % 5000L)
      val enc = KeyCodec.encodeComposite(types, Seq(i, s, l))
      assert(KeyCodec.decodeComposite(types, enc) == Seq(i, s, l))
    }
  }

  test("composite key ordering on leading dimension") {
    val types = Seq(IntegerType, StringType)
    val e1 = KeyCodec.encodeComposite(types, Seq(1, "zzz"))
    val e2 = KeyCodec.encodeComposite(types, Seq(2, "aaa"))
    assert(KeyCodec.compare(e1, e2) < 0)
  }

  test("successor is strictly greater; all-0xFF has none") {
    (1 to 300).foreach { _ =>
      val b = Array.fill(1 + rnd.nextInt(10))(rnd.nextInt(255).toByte)
      val s = KeyCodec.successor(b)
      assert(s != null && KeyCodec.compare(s, b) > 0)
    }
    assert(KeyCodec.successor(Array(0xFF.toByte, 0xFF.toByte)) == null)
  }

  test("timestamp/date/boolean encode-decode") {
    val micros = 1234567890123456L
    assert(KeyCodec.decode(TimestampType,
      KeyCodec.encode(TimestampType, micros), 0, 8) == micros)
    val days = 19000
    assert(KeyCodec.decode(DateType, KeyCodec.encode(DateType, days), 0, 4) == days)
    assert(KeyCodec.decode(BooleanType,
      KeyCodec.encode(BooleanType, true), 0, 1) == true)
  }
}
