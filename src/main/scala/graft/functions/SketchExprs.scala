package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query into a serialized count-min sketch: the scalar
  * complement of Spark's `count_min_sketch` AGGREGATE, which produces
  * the sketch as a binary column but ships no SQL-level reader — so a
  * consumer would otherwise have to `collect()` the bytes and call
  * `CountMinSketch.readFrom` on the driver. Keeping the lookup as an
  * expression lets the whole heavy-hitter check stay one declarative
  * plan: the fixed ~110 KB sketch rides a broadcast 1-row frame and
  * every estimate happens executor-side.
  *
  * Eval-only (CodegenFallback): the expression sits in a final 10-row
  * projection, never in a scan-side hot path, so breaking whole-stage
  * codegen there costs nothing. The deserialized sketch is cached per
  * byte-array identity — under a broadcast cross join every row sees
  * the SAME array instance, so the ~110 KB parse happens once per
  * task, not once per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "cms_estimate"

  @transient private[this] var cachedBytes: Array[Byte] = _
  @transient private[this] var cachedSketch: CountMinSketch = _

  override protected def nullSafeEval(s: Any, v: Any): Any = {
    val bytes = s.asInstanceOf[Array[Byte]]
    if (cachedSketch == null || (cachedBytes ne bytes)) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedSketch.estimateCount(java.lang.Long.valueOf(v.asInstanceOf[Long]))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object SketchExprs {

  /** Column-level API: estimated count of `item` under `sketch`. */
  def cmsEstimate(sketch: Column, item: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(sketch), Bridge.expression(item)))
}
