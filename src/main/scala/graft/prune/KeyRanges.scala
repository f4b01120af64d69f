package graft.prune

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import graft.codec.KeyCodec

/** Per-dimension interval analysis of a Catalyst predicate, for region
  * pruning over key-sorted storage.
  *
  * Capability port of the reference's "critical point" partition pruning
  * (Heracles `HBaseCriticalPoint.scala` + `PartialPredicateOperations
  * .scala` in /root/reference — per key dimension, collect comparison/IN
  * literals, build qualifying ranges, intersect with region boundaries).
  * Rebuilt as abstract interpretation over an interval domain: each key
  * dimension gets a disjoint interval set; AND intersects, OR unions,
  * anything unanalyzable widens to ⊤ (sound — never prunes a region that
  * could match). Bounds are compared in the order-preserving encoded
  * byte space, so one comparator covers all ten key types.
  */
object KeyRanges {

  /** Interval over encoded bytes; None = unbounded. */
  final case class Iv(lo: Option[Array[Byte]], loInc: Boolean,
      hi: Option[Array[Byte]], hiInc: Boolean) {
    def isEmpty: Boolean = (lo, hi) match {
      case (Some(a), Some(b)) =>
        val c = KeyCodec.compare(a, b)
        c > 0 || (c == 0 && !(loInc && hiInc))
      case _ => false
    }
    /** Does [min,max] (both inclusive) overlap this interval? */
    def overlaps(min: Array[Byte], max: Array[Byte]): Boolean = {
      val belowHi = hi.forall { h =>
        val c = KeyCodec.compare(min, h)
        c < 0 || (c == 0 && hiInc)
      }
      val aboveLo = lo.forall { l =>
        val c = KeyCodec.compare(max, l)
        c > 0 || (c == 0 && loInc)
      }
      belowHi && aboveLo
    }
    def intersect(o: Iv): Iv = {
      val (nlo, nloInc) = (lo, o.lo) match {
        case (None, _) => (o.lo, o.loInc)
        case (_, None) => (lo, loInc)
        case (Some(a), Some(b)) =>
          val c = KeyCodec.compare(a, b)
          if (c > 0) (lo, loInc)
          else if (c < 0) (o.lo, o.loInc)
          else (lo, loInc && o.loInc)
      }
      val (nhi, nhiInc) = (hi, o.hi) match {
        case (None, _) => (o.hi, o.hiInc)
        case (_, None) => (hi, hiInc)
        case (Some(a), Some(b)) =>
          val c = KeyCodec.compare(a, b)
          if (c < 0) (hi, hiInc)
          else if (c > 0) (o.hi, o.hiInc)
          else (hi, hiInc && o.hiInc)
      }
      Iv(nlo, nloInc, nhi, nhiInc)
    }
  }

  val full: Iv = Iv(None, loInc = false, None, hiInc = false)

  /** Disjoint-ish interval set; ⊤ = List(full), ⊥ = Nil. Soundness only
    * requires covering, not disjointness, so union is concatenation. */
  type IvSet = List[Iv]

  private def intersectSets(a: IvSet, b: IvSet): IvSet =
    (for (x <- a; y <- b) yield x.intersect(y)).filterNot(_.isEmpty)

  /** dims: key column name (lowercase) → (dimension index, type). */
  def analyze(pred: Expression, dims: Map[String, (Int, DataType)])
      : Map[Int, IvSet] = pred match {
    case And(l, r) =>
      val (a, b) = (analyze(l, dims), analyze(r, dims))
      (a.keySet ++ b.keySet).map { d =>
        d -> intersectSets(a.getOrElse(d, List(full)), b.getOrElse(d, List(full)))
      }.toMap
    case Or(l, r) =>
      val (a, b) = (analyze(l, dims), analyze(r, dims))
      // only dims constrained on BOTH branches stay constrained
      (a.keySet intersect b.keySet).map { d => d -> (a(d) ++ b(d)) }.toMap
    case e => analyzeLeaf(e, dims)
  }

  /** Convert a literal (in its own Catalyst type) to the key column's
    * native type, exactly; None if lossy or incompatible (→ no pruning,
    * sound). Handles the implicit numeric widening Catalyst applies to
    * mixed-type comparisons. */
  private def convert(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (LongType | TimestampType, x: Long) => Some(x)
    case (LongType | TimestampType, x: Int) => Some(x.toLong)
    case (LongType | TimestampType, x: Short) => Some(x.toLong)
    case (LongType | TimestampType, x: Byte) => Some(x.toLong)
    case (IntegerType | DateType, x: Int) => Some(x)
    case (IntegerType | DateType, x: Long) if x.isValidInt => Some(x.toInt)
    case (IntegerType | DateType, x: Short) => Some(x.toInt)
    case (IntegerType | DateType, x: Byte) => Some(x.toInt)
    case (ShortType, x: Short) => Some(x)
    case (ShortType, x: Int) if x >= Short.MinValue && x <= Short.MaxValue =>
      Some(x.toShort)
    case (ByteType, x: Byte) => Some(x)
    case (DoubleType, x: Double) => Some(x)
    case (DoubleType, x: Float) => Some(x.toDouble)
    case (DoubleType, x: Int) => Some(x.toDouble)
    case (DoubleType, x: Long) => Some(x.toDouble)
    case (DoubleType, x: java.math.BigDecimal) => Some(x.doubleValue)
    case (DoubleType, x: org.apache.spark.sql.types.Decimal) =>
      Some(x.toDouble)
    case (FloatType, x: Float) => Some(x)
    case (FloatType, x: Double) => Some(x.toFloat)
    case (FloatType, x: Int) => Some(x.toFloat)
    case (StringType, x) => Some(x.toString)
    case (BooleanType, x: Boolean) => Some(x)
    case _ => None
  }

  private def enc(dt: DataType, v: Any): Option[Array[Byte]] =
    convert(dt, v).flatMap(cv =>
      try Some(KeyCodec.encode(dt, cv)) catch { case _: Exception => None })

  /** Attribute possibly wrapped in a widening Cast (Catalyst inserts
    * these for mixed-type comparisons). */
  private object KeyAttr {
    def unapply(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case Cast(a: Attribute, _, _, _) => Some(a)
      case _ => None
    }
  }

  /** Any foldable (constant) expression, evaluated — covers plain
    * literals and the analyzer's Cast(Literal) wrappers. */
  private object FoldableLit {
    def unapply(e: Expression): Option[Any] = e match {
      case _: Attribute => None
      case _ if e.foldable =>
        try Option(e.eval(null)) catch { case _: Exception => None }
      case _ => None
    }
  }

  private object KeyLit {
    /** Matches cmp(attr, constant) in either orientation for a key dim;
      * yields (dim, type, constant value, flipped). */
    def unapply(e: Expression)(implicit dims: Map[String, (Int, DataType)])
        : Option[(Int, DataType, Any, Boolean)] = e match {
      case BinaryComparison(KeyAttr(a), FoldableLit(v)) =>
        dims.get(a.name.toLowerCase).map { case (d, dt) => (d, dt, v, false) }
      case BinaryComparison(FoldableLit(v), KeyAttr(a)) =>
        dims.get(a.name.toLowerCase).map { case (d, dt) => (d, dt, v, true) }
      case _ => None
    }
  }

  private def analyzeLeaf(e: Expression,
      dims0: Map[String, (Int, DataType)]): Map[Int, IvSet] = {
    implicit val dims: Map[String, (Int, DataType)] = dims0
    e match {
      case eq @ EqualTo(_, _) => eq match {
        case KeyLit(d, dt, v, _) =>
          enc(dt, v).map(b =>
            Map(d -> List(Iv(Some(b), true, Some(b), true)))).getOrElse(Map.empty)
        case _ => Map.empty
      }
      case gt @ GreaterThan(_, _) => gt match {
        case KeyLit(d, dt, v, flipped) => enc(dt, v).map { b =>
          val iv = if (!flipped) Iv(Some(b), false, None, false)
                   else Iv(None, false, Some(b), false)
          Map(d -> List(iv))
        }.getOrElse(Map.empty)
        case _ => Map.empty
      }
      case ge @ GreaterThanOrEqual(_, _) => ge match {
        case KeyLit(d, dt, v, flipped) => enc(dt, v).map { b =>
          val iv = if (!flipped) Iv(Some(b), true, None, false)
                   else Iv(None, false, Some(b), true)
          Map(d -> List(iv))
        }.getOrElse(Map.empty)
        case _ => Map.empty
      }
      case lt @ LessThan(_, _) => lt match {
        case KeyLit(d, dt, v, flipped) => enc(dt, v).map { b =>
          val iv = if (!flipped) Iv(None, false, Some(b), false)
                   else Iv(Some(b), false, None, false)
          Map(d -> List(iv))
        }.getOrElse(Map.empty)
        case _ => Map.empty
      }
      case le @ LessThanOrEqual(_, _) => le match {
        case KeyLit(d, dt, v, flipped) => enc(dt, v).map { b =>
          val iv = if (!flipped) Iv(None, false, Some(b), true)
                   else Iv(Some(b), true, None, false)
          Map(d -> List(iv))
        }.getOrElse(Map.empty)
        case _ => Map.empty
      }
      case In(KeyAttr(a), list) if list.forall {
            case FoldableLit(_) => true; case _ => false } =>
        dims0.get(a.name.toLowerCase).map { case (d, dt) =>
          val ivs = list.flatMap { case FoldableLit(v) =>
            enc(dt, v).map(b => Iv(Some(b), true, Some(b), true))
          case _ => None }.toList
          if (ivs.length == list.length) Map(d -> ivs) else Map.empty[Int, IvSet]
        }.getOrElse(Map.empty)
      case InSet(KeyAttr(a), vs) if !vs.contains(null) =>
        dims0.get(a.name.toLowerCase).map { case (d, dt) =>
          val ivs = vs.toList.flatMap(v =>
            enc(dt, v).map(b => Iv(Some(b), true, Some(b), true)))
          if (ivs.length == vs.size) Map(d -> ivs) else Map.empty[Int, IvSet]
        }.getOrElse(Map.empty)
      // key columns are declared non-null → IS NULL proves empty
      case IsNull(a: Attribute) if dims0.contains(a.name.toLowerCase) =>
        Map(dims0(a.name.toLowerCase)._1 -> Nil)
      case _ => Map.empty // unanalyzable → no constraint (sound)
    }
  }

  /** Prune: keep file iff every constrained dim's [min,max] overlaps
    * some interval (an empty set for any dim proves the file empty). */
  def survives(constraints: Map[Int, IvSet],
      mins: Seq[Array[Byte]], maxs: Seq[Array[Byte]]): Boolean =
    constraints.forall { case (d, ivs) =>
      d >= mins.length || ivs.exists(_.overlaps(mins(d), maxs(d)))
    }
}
