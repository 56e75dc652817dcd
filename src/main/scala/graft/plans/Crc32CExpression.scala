package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `rip_crc32c(bytes)`: CRC-32C (Castagnoli, reflected poly 0x82F63B78)
  * of a binary column, as an unsigned value in a long.
  *
  * Riptable's checksum surface is crc32c — `crc64` is deprecated and
  * delegates to it (`riptable/rt_numpy.py:2489,2514` → `rc.CalculateCRC`).
  * Spark's built-in `crc32` is the ISO/zlib polynomial, a DIFFERENT
  * checksum — this expression provides the Castagnoli twin with full
  * codegen (table-free bitwise fold, 8 unrolled steps per byte; the
  * DuckDB oracle rebuilds the identical fold as a recursive CTE).
  */
case class RipCrc32C(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var crc = 0xFFFFFFFF
    var i = 0
    while (i < bytes.length) {
      crc = crc ^ (bytes(i) & 0xFF)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 1) != 0) (crc >>> 1) ^ 0x82F63B78 else crc >>> 1
        k += 1
      }
      i += 1
    }
    (crc ^ 0xFFFFFFFF).toLong & 0xFFFFFFFFL
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val crc = ctx.freshName("crc")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |int $crc = 0xFFFFFFFF;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $crc = $crc ^ ($b[$i] & 0xFF);
         |  for (int $k = 0; $k < 8; $k++) {
         |    $crc = (($crc & 1) != 0) ? (($crc >>> 1) ^ 0x82F63B78) : ($crc >>> 1);
         |  }
         |}
         |${ev.value} = ((long)($crc ^ 0xFFFFFFFF)) & 0xFFFFFFFFL;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RipCrc32C =
    copy(child = newChild)
}
