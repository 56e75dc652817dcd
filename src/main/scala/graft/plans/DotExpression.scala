package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** `rip_dot(a, b)`: double dot product of two numeric arrays,
  * accumulated LEFT-TO-RIGHT in double — bit-identical to the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation it replaces
  * (and to the DuckDB `list_transform` oracles), but whole-stage
  * CODEGEN'd: Spark's higher-order array functions interpret their
  * lambda per element, which dominates pair-verify joins (1M+ pairs ×
  * 64 dims); this compiles to a primitive loop.
  *
  * Null semantics match zip_with: mismatched lengths or any null
  * element → null (zip_with pads/propagates nulls into the sum).
  */
case class RipDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null can arise from non-null inputs (length mismatch, null element),
  // so nullable must NOT follow the children — a false nullable makes
  // codegen emit a constant for isNull and the assignment fails to
  // compile (whole stage silently falls back to interpreted eval)
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = la.numElements()
    if (ra.numElements() != n) return null
    val lt = elemType(left)
    val rt = elemType(right)
    def get(a: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType   => a.getFloat(i).toDouble
      case DoubleType  => a.getDouble(i)
      case IntegerType => a.getInt(i).toDouble
      case LongType    => a.getLong(i).toDouble
      case other => throw new IllegalArgumentException(s"rip_dot: $other")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      acc += get(la, lt, i) * get(ra, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val lv = CodeGenerator.getValue(l, elemType(left), i)
      val rv = CodeGenerator.getValue(r, elemType(right), i)
      s"""
         |int $n = $l.numElements();
         |boolean $bad = ($r.numElements() != $n);
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { $bad = true; break; }
         |    $acc += (double)($lv) * (double)($rv);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RipDot =
    copy(left = newLeft, right = newRight)
}
