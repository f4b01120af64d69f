package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

/** `option("graft.filterHint", "<sql predicate>")` — a user-asserted
  * skipping predicate for streaming reads.
  *
  * Spark's filter-pushdown rule is batch-only, so a `.where(...)` above
  * `readStream.table(...)` never reaches the streaming scan: a tail of
  * a 100 TB table decodes every appended region even when the query
  * keeps one key range. The hint closes that gap: the source prunes
  * regions (manifest key intervals + non-key [[ColStats]]) and pushes
  * parquet row-group/page predicates from the hint, exactly like a
  * batch scan with the same predicate pushed.
  *
  * CONTRACT: the hint must be implied by the query's own filters — the
  * source genuinely skips data contradicting it (that is its job), so
  * a hint wider than the query's filter is safe, a narrower one drops
  * rows the query wanted. Unparseable or untranslatable conjuncts are
  * dropped (less skipping, never wrong rows *beyond the asserted
  * hint*).
  */
object FilterHint {

  /** Option key, matched case-insensitively by the options map. */
  val OptionKey = "graft.filterHint"

  /** Parse the hint into V1 filters; unconvertible conjuncts drop.
    * With a schema, provably-safe integral-widening casts are first
    * narrowed away (see [[narrowWideningCasts]]) so hints like
    * `CAST(day AS BIGINT) = 20240101` still skip. */
  def parse(hint: String, schema: Option[StructType] = None)
      : Array[sources.Filter] = {
    val expr = SparkSession.active.sessionState.sqlParser
      .parseExpression(hint)
    splitConjuncts(expr)
      .map(c => schema.fold(c)(narrowWideningCasts(c, _)))
      .flatMap(toSource).toArray
  }

  private val intRank: Map[DataType, Int] = Map(
    ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)

  private def fits(v: Long, dt: DataType): Boolean = dt match {
    case ByteType => v == v.toByte
    case ShortType => v == v.toShort
    case IntegerType => v == v.toInt
    case LongType => true
    case _ => false
  }

  private def narrowLit(v: Long, dt: DataType): Literal = dt match {
    case ByteType => Literal(v.toByte, ByteType)
    case ShortType => Literal(v.toShort, ShortType)
    case IntegerType => Literal(v.toInt, IntegerType)
    case _ => Literal(v, LongType)
  }

  /** Rewrite `CAST(c AS wider-integral) cmp lit` to `c cmp lit'` when
    * the cast is a pure integral widening (order- AND
    * equality-preserving, unlike the narrowing casts [[Col]] refuses)
    * and the literal converts to the column's type exactly. A literal
    * outside the narrow type's range leaves the conjunct untranslated
    * (dropped — sound, merely less skipping). */
  private def narrowWideningCasts(e: Expression, schema: StructType)
      : Expression = {
    def colType(a: Attribute): Option[DataType] =
      schema.fields.collectFirst {
        case f if f.name.equalsIgnoreCase(a.name) => f.dataType
      }
    def widens(from: DataType, to: DataType): Boolean =
      (intRank.get(from), intRank.get(to)) match {
        case (Some(a), Some(b)) => a <= b
        case _ => false
      }
    def litLong(l: Expression): Option[Long] =
      if (!l.foldable) None
      else l.eval(null) match {
        case b: Byte => Some(b.toLong)
        case s: Short => Some(s.toLong)
        case i: Int => Some(i.toLong)
        case v: Long => Some(v)
        case _ => None
      }
    e transform {
      case cmp @ BinaryComparison(Cast(a: Attribute, wide, _, _), rhs) =>
        (colType(a), litLong(rhs)) match {
          case (Some(narrow), Some(v))
              if widens(narrow, wide) && fits(v, narrow) =>
            cmp.withNewChildren(Seq(a, narrowLit(v, narrow)))
          case _ => cmp
        }
      case cmp @ BinaryComparison(lhs, Cast(a: Attribute, wide, _, _)) =>
        (colType(a), litLong(lhs)) match {
          case (Some(narrow), Some(v))
              if widens(narrow, wide) && fits(v, narrow) =>
            cmp.withNewChildren(Seq(narrowLit(v, narrow), a))
          case _ => cmp
        }
      case in @ In(Cast(a: Attribute, wide, _, _), list) =>
        colType(a) match {
          case Some(narrow) if widens(narrow, wide) =>
            val vs = list.map(litLong)
            if (vs.forall(_.exists(fits(_, narrow))))
              In(a, vs.map(v => narrowLit(v.get, narrow)))
            else in
          case _ => in
        }
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private object Col {
    def unapply(e: Expression): Option[String] = e match {
      case a: Attribute => Some(a.name)
      // No Cast-stripping: `CAST(c AS INT) = 5` on a BIGINT c admits
      // values the bare-column filter would skip (4294967301 wraps to
      // 5), so translating it would skip rows the hint admits. The
      // conjunct is dropped instead — less skipping, never wrong rows.
      case _ => None
    }
  }

  /** Foldable expression → external Scala value (the representation
    * `sources.Filter` carries: String not UTF8String, java.sql.Date
    * not epoch-day int). */
  private object Lit {
    def unapply(e: Expression): Option[Any] = e match {
      case _: Attribute => None
      case _ if e.foldable =>
        try Some(CatalystTypeConverters.convertToScala(
          e.eval(null), e.dataType))
        catch { case _: Exception => None }
      case _ => None
    }
  }

  private def toSource(e: Expression): Option[sources.Filter] = e match {
    case EqualTo(Col(c), Lit(v)) => Some(sources.EqualTo(c, v))
    case EqualTo(Lit(v), Col(c)) => Some(sources.EqualTo(c, v))
    case GreaterThan(Col(c), Lit(v)) => Some(sources.GreaterThan(c, v))
    case GreaterThan(Lit(v), Col(c)) => Some(sources.LessThan(c, v))
    case GreaterThanOrEqual(Col(c), Lit(v)) =>
      Some(sources.GreaterThanOrEqual(c, v))
    case GreaterThanOrEqual(Lit(v), Col(c)) =>
      Some(sources.LessThanOrEqual(c, v))
    case LessThan(Col(c), Lit(v)) => Some(sources.LessThan(c, v))
    case LessThan(Lit(v), Col(c)) => Some(sources.GreaterThan(c, v))
    case LessThanOrEqual(Col(c), Lit(v)) =>
      Some(sources.LessThanOrEqual(c, v))
    case LessThanOrEqual(Lit(v), Col(c)) =>
      Some(sources.GreaterThanOrEqual(c, v))
    case EqualNullSafe(Col(c), Lit(v)) => Some(sources.EqualNullSafe(c, v))
    case EqualNullSafe(Lit(v), Col(c)) => Some(sources.EqualNullSafe(c, v))
    case In(Col(c), list) =>
      val vs = list.map { case Lit(v) => Some(v); case _ => None }
      if (vs.forall(_.isDefined)) Some(sources.In(c, vs.map(_.get).toArray))
      else None
    case IsNull(Col(c)) => Some(sources.IsNull(c))
    case IsNotNull(Col(c)) => Some(sources.IsNotNull(c))
    case StartsWith(Col(c), Lit(p: String)) =>
      Some(sources.StringStartsWith(c, p))
    // the parser yields Like (LikeSimplification runs later); translate
    // the pure-prefix form
    // the escape char is rejected along with %/_ — an escaped
    // wildcard (`a\%b%`) or escaped backslash (`a\\b%`) would need
    // unescaping before it could become a literal prefix
    case Like(Col(c), Lit(p: String), '\\')
        if p.endsWith("%") && !p.dropRight(1).exists("%_\\".contains(_)) =>
      Some(sources.StringStartsWith(c, p.dropRight(1)))
    case Not(g) => toSource(g).map(sources.Not)
    case Or(l, r) =>
      for (a <- toSource(l); b <- toSource(r)) yield sources.Or(a, b)
    case And(l, r) => // nested under Or/Not; top level already split
      for (a <- toSource(l); b <- toSource(r)) yield sources.And(a, b)
    case _ => None // dropped: less skipping, never extra skipping
  }
}
