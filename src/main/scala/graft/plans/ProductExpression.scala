package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native product aggregate — Spark has no built-in product; riptable
  * ships it both as a reduction and as `timewindow_prod`
  * (`riptable/rt_fastarray.py:2648`, rc.TimeWindow) and in the GB
  * function table (`riptable/rt_enum.py:486`).
  *
  * Declarative (pure-expression) aggregate → usable in groupBy, window
  * frames (including RANGE trailing time windows), and partial
  * aggregation with map-side combine. Null-skipping like sum: buffer
  * stays null until the first non-null input; all-null group → null.
  */
case class RipProduct(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "rip_product"

  private val prod = AttributeReference("prod", DoubleType, nullable = true)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(prod)

  override val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = {
    val v = Cast(child, DoubleType)
    Seq(If(IsNull(v), prod, If(IsNull(prod), v, Multiply(prod, v))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(prod.left), prod.right,
      If(IsNull(prod.right), prod.left, Multiply(prod.left, prod.right))))

  override lazy val evaluateExpression: Expression = prod

  override protected def withNewChildInternal(newChild: Expression): RipProduct =
    copy(child = newChild)
}
