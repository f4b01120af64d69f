package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame

/** Canonical result hashing for Verify dumps (VERDICT r11 #2).
  *
  * Produces, per query, a `_canon.json` sidecar beside the result
  * parquet: column names (sorted), result types, row count, and a
  * SHA-256 of a canonical form that `tools/check.py` can recompute
  * independently from the same parquet via DuckDB. When a driver-side
  * hash-red appears, the builder can diff this committed-at-dump-time
  * hash against any later re-read and prove value-stability (or find
  * the first differing row) without access to the driver's hasher.
  *
  * Encoding rules are deliberately representation-portable between
  * JVM (Spark collect types) and Python (DuckDB fetch types):
  *   - null                "n:"
  *   - boolean             "b:true" / "b:false"
  *   - integral            "i:<decimal>"
  *   - float/double        "d:NaN" | "d:<%016x of IEEE bits>", with
  *                         float widened to double and -0.0 → 0.0
  *   - decimal             "D:<plain string, fixed scale>"
  *   - string              "s:<escaped>"
  *   - date                "dt:yyyy-MM-dd"
  *   - timestamp (UTC)     "ts:yyyy-MM-dd HH:mm:ss.SSSSSS"
  *   - binary              "x:<lowercase hex>"
  *   - array               "[" elem ("," elem)* "]"
  *   - struct              "{" field ("," field)* "}"   (declared order)
  *   - map                 "m{" k=v ("," k=v)* "}"      (sorted by k)
  * Escaping (strings only): '\\' and the structural chars , [ ] { } =
  * and control chars < 0x20 become "\x<2-digit-hex>" ('\\' → "\\\\").
  * A row is its column values in column-NAME-sorted order joined by
  * 0x01; rows sort as UTF-8 byte sequences; the digest is SHA-256 over
  * rows joined by '\n'.
  */
object CanonHash {

  private val TsFmt =
    DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")
      .withZone(ZoneOffset.UTC)

  def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case c if c < ' ' || c == ',' || c == '[' || c == ']' ||
                c == '{' || c == '}' || c == '=' =>
        b.append(f"\\x${c.toInt}%02x")
      case c => b.append(c)
    }
    b.toString
  }

  private def doubleCanon(d: Double): String =
    if (d.isNaN) "d:NaN"
    else {
      val norm = if (d == 0.0d) 0.0d else d // -0.0 → 0.0
      f"d:${java.lang.Double.doubleToLongBits(norm)}%016x"
    }

  def canonValue(v: Any): String = v match {
    case null                     => "n:"
    case b: java.lang.Boolean     => if (b) "b:true" else "b:false"
    case n: java.lang.Byte        => s"i:$n"
    case n: java.lang.Short       => s"i:$n"
    case n: java.lang.Integer     => s"i:$n"
    case n: java.lang.Long        => s"i:$n"
    case f: java.lang.Float       => doubleCanon(f.toDouble)
    case d: java.lang.Double      => doubleCanon(d)
    case d: java.math.BigDecimal  => s"D:${d.toPlainString}"
    case d: scala.math.BigDecimal => s"D:${d.bigDecimal.toPlainString}"
    case s: String                => s"s:${esc(s)}"
    case d: java.sql.Date         => s"dt:$d"
    case d: LocalDate             => s"dt:$d"
    case t: java.sql.Timestamp =>
      val micros = Math.floorDiv(t.getTime, 1000L) * 1000000L +
        (t.getNanos / 1000L)
      val inst = Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L)
      s"ts:${TsFmt.format(inst)}"
    case t: Instant               => s"ts:${TsFmt.format(t)}"
    case t: LocalDateTime         => s"ts:${TsFmt.format(t.atOffset(ZoneOffset.UTC))}"
    case b: Array[Byte]           => "x:" + b.map(x => f"$x%02x").mkString
    case a: scala.collection.Seq[_] =>
      a.map(canonValue).mkString("[", ",", "]")
    case a: Array[_] =>
      a.map(canonValue).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => s"${canonValue(k)}=${canonValue(mv)}" }
        .toSeq.sorted.mkString("m{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i => canonValue(r.get(i)))
        .mkString("{", ",", "}")
    case other => s"s:${esc(other.toString)}"
  }

  private val ByteSeqOrdering: Ordering[Array[Byte]] =
    new Ordering[Array[Byte]] {
      def compare(a: Array[Byte], b: Array[Byte]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val c = (a(i) & 0xff) - (b(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        a.length - b.length
      }
    }

  /** (sorted column names, SHA-256 hex of the canonical form). */
  def hashRows(cols: Seq[String],
               rows: Seq[org.apache.spark.sql.Row]): (Seq[String], String) = {
    val order = cols.zipWithIndex.sortBy(_._1)
    val rowBytes = rows.map { r =>
      order.map { case (_, i) => canonValue(r.get(i)) }
        .mkString("").getBytes(UTF_8)
    }.sorted(ByteSeqOrdering)
    val md = MessageDigest.getInstance("SHA-256")
    var first = true
    rowBytes.foreach { rb =>
      if (!first) md.update('\n'.toByte)
      first = false
      md.update(rb)
    }
    (order.map(_._1), md.digest().map(b => f"$b%02x").mkString)
  }

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Sidecar JSON for one dumped result (reads the df fully — results
    * at verify SFs are small; capped to keep a pathological face from
    * OOMing the dump pass). */
  def sidecarJson(df: DataFrame, cap: Int = 2000000): String = {
    val rows = df.limit(cap + 1).collect().toSeq
    val truncated = rows.length > cap
    val used = if (truncated) rows.take(cap) else rows
    val (sortedCols, sha) = hashRows(df.columns.toSeq, used)
    val types = df.schema.fields.map(f =>
      s"${jq(f.name)}: ${jq(f.dataType.sql)}").mkString("{", ", ", "}")
    val colsJson = sortedCols.map(jq).mkString("[", ", ", "]")
    val shaJson = if (truncated) "null" else jq(sha)
    s"""{"rows": ${rows.length min cap}, "truncated": $truncated, """ +
      s""""columns": $colsJson, "types": $types, "sha256": $shaJson}"""
  }
}
