package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.ColumnExpr
import org.apache.spark.sql.types._

import graft.codec.ZOrder

/** `zorder(c1, c2, …)` → BIGINT Morton code of the columns' order-
  * preserving 64-bit images ([[ZOrder]]) — the sort key behind
  * `CALL graft.sys.cluster`. Codegen'd (the clustering rewrite streams
  * every row of the table through it); NULL contributes image 0, so
  * the output is never null.
  *
  * With `boundaries` set (one sorted signed-image array per child, as
  * the clustering rewrite computes by sampling), each column maps to
  * its RANGE-PARTITION RANK in the top `rankBits` bits before
  * interleaving — raw images are only meaningful for values spread
  * across the full type domain (hashes, wide doubles); clustered
  * columns need ranks ([[ZOrder.rankImage]]). */
case class ZOrderValue(children: Seq[Expression],
    boundaries: Seq[Array[Long]] = Nil, rankBits: Int = 0)
    extends Expression {
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("zorder needs at least one column")
    else children.find(c => !ZOrder.supportedTypes.contains(c.dataType)) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"zorder: unsupported type ${c.dataType.sql} (takes the ten " +
          "ordered scalar types)")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val us = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val raw = ZOrder.u64(children(i).dataType, children(i).eval(input))
      us(i) =
        if (boundaries.isEmpty) raw
        else ZOrder.rankImage(boundaries(i), raw ^ Long.MinValue, rankBits)
      i += 1
    }
    ZOrder.interleave(us)
  }

  /** Java for the unsigned 64-bit image of a non-null value `v`. */
  private def imageJava(dt: DataType, v: String): String = dt match {
    case BooleanType => s"($v ? (1L << 63) : 0L)"
    case ByteType => s"(((long) (($v ^ 0x80) & 0xFF)) << 56)"
    case ShortType => s"(((long) (($v ^ 0x8000) & 0xFFFF)) << 48)"
    case IntegerType | DateType =>
      s"(((((long) $v) ^ 0x80000000L) & 0xFFFFFFFFL) << 32)"
    case LongType | TimestampType => s"($v ^ 0x8000000000000000L)"
    case FloatType => s"graft.codec.ZOrder.u64Float($v)"
    case DoubleType => s"graft.codec.ZOrder.u64Double($v)"
    case StringType => s"graft.codec.ZOrder.u64String($v)"
    case other => throw new IllegalStateException(other.toString)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.freshName("zorderImgs")
    val parts = children.zipWithIndex.map { case (c, i) =>
      val e = c.genCode(ctx)
      val img = imageJava(c.dataType, e.value.toString)
      val ranked =
        if (boundaries.isEmpty) img
        else {
          val bnd = ctx.addReferenceObj(s"zorderBnd$i", boundaries(i),
            "long[]")
          s"graft.codec.ZOrder.rankImage($bnd, " +
            s"($img) ^ 0x8000000000000000L, $rankBits)"
        }
      s"""${e.code}
         |$arr[$i] = ${e.isNull} ? 0L : $ranked;""".stripMargin
    }
    ev.copy(
      code = code"""
        |long[] $arr = new long[${children.length}];
        |${parts.mkString("\n")}
        |long ${ev.value} = graft.codec.ZOrder.interleave($arr);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderValue =
    copy(children = newChildren)
}

object ZOrderOps {
  /** Raw-image Morton code — meaningful when values spread across the
    * full type domain (hashes, uniformly wide keys). The clustering
    * rewrite uses [[zorderRanked]] instead. */
  def zorder(cols: Column*): Column =
    ColumnExpr.column(ZOrderValue(cols.map(ColumnExpr.expr)))

  /** Rank-image Morton code over sampled range boundaries (one sorted
    * signed-image array per column) — robust to any value
    * distribution. */
  def zorderRanked(cols: Seq[Column], boundaries: Seq[Array[Long]],
      rankBits: Int): Column =
    ColumnExpr.column(
      ZOrderValue(cols.map(ColumnExpr.expr), boundaries, rankBits))
}
