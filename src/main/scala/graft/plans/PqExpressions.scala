package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared codebook materialization for the PQ expressions: the codebook
  * arrives as a FOLDABLE literal child (`typedlit` of
  * array<struct<_1: int, _2: array<double>>>), evaluated ONCE lazily
  * per task into a primitive double[][] indexed by codeword — after
  * which every row pays a compiled loop, not an interpreted
  * higher-order-function lambda per element. */
private[plans] object PqExprUtil {
  /** Decode + validate the codebook literal. The static type check
    * only sees array<struct<int, array<double>>>; the VALUES still
    * come from arbitrary SQL, so shape violations (null entries,
    * non-dense codeword ids, ragged vectors) must fail with a named
    * error here — not as CCE/AIOOBE/NPE inside the per-row loop. */
  def materialize(cbEval: Any): Array[Array[Double]] = {
    def bad(msg: String): Nothing = throw new IllegalArgumentException(
      s"pq codebook: $msg (expected array<struct<codeword int, " +
        "vec array<double>>> with dense codewords 0..n-1 and " +
        "uniform non-null vectors)")
    val arr = cbEval.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.ofDim[Array[Double]](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) bad(s"null struct at position $i")
      val row = arr.getStruct(i, 2)
      if (row.isNullAt(0) || row.isNullAt(1)) bad(s"null field at position $i")
      val w = row.getInt(0)
      if (w < 0 || w >= n) bad(s"codeword id $w out of [0, $n)")
      if (out(w) != null) bad(s"duplicate codeword id $w")
      val v = row.getArray(1)
      val d = v.numElements()
      val vec = new Array[Double](d)
      var j = 0
      while (j < d) {
        if (v.isNullAt(j)) bad(s"null element in codeword $w")
        vec(j) = v.getDouble(j); j += 1
      }
      out(w) = vec
      i += 1
    }
    // the id-range + duplicate checks above make the ids a permutation
    // of 0..n-1, so every slot is filled; ragged vectors remain
    var k = 1
    while (k < n) {
      if (out(k).length != out(0).length)
        bad(s"ragged vectors (${out(k).length} vs ${out(0).length})")
      k += 1
    }
    out
  }

  /** Validated subspace count: m must be a positive divisor of the
    * codebook dim or the subspace offsets silently truncate. */
  def checkedM(m: Int, cb: Array[Array[Double]], fn: String): Int = {
    val dim = if (cb.isEmpty) 0 else cb(0).length
    if (m <= 0 || (dim > 0 && dim % m != 0))
      throw new IllegalArgumentException(
        s"$fn: m=$m must be a positive divisor of codebook dim $dim")
    m
  }

  def numericElem(t: DataType): Boolean = t match {
    case FloatType | DoubleType | IntegerType | LongType => true
    case _ => false
  }

  def getD(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"pq expr: $other")
  }

  val codebookType: DataType => Boolean = {
    case ArrayType(StructType(fs), _) if fs.length == 2 &&
      fs(0).dataType == IntegerType &&
      (fs(1).dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }) => true
    case _ => false
  }
}

/** `rip_pq_codes(vec, codebook, m)`: the m PQ codeword indices of a
  * vector in ONE compiled pass — per subspace s, the argmin-by-L2 of
  * the vector's subrange against every codeword's subrange, ties to
  * the lowest codeword. Bit-identical to the
  * `transform(sequence, s -> array_max(transform(cb, ...l2sq...)))`
  * formulation it replaces (kept in Similarity as the cross-check
  * twin): the HOF form interprets its lambdas per element — m × ksub
  * l2sq lambda chains per ROW — which is the PQ encode bottleneck at
  * corpus scale; this is m·ksub·subdim primitive flops.
  *
  * Null semantics (conservative, matching what the pipeline keeps): a
  * null vector, any null element, or a vector shorter than the
  * codebook dim yields null (the HOF form produced null/garbage codes
  * the downstream null-filter dropped).
  */
case class RipPqCodes(vec: Expression, codebook: Expression, m: Expression)
  extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = codebook
  override def third: Expression = m

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, codebook.dataType, m.dataType) match {
      case (ArrayType(et, _), cbT, IntegerType)
          if PqExprUtil.numericElem(et) && PqExprUtil.codebookType(cbT)
            && codebook.foldable && m.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "rip_pq_codes requires (array<numeric> vec, foldable " +
          "array<struct<int, array<double>>> codebook, foldable int m)")
    }

  @transient private lazy val cb: Array[Array[Double]] =
    PqExprUtil.materialize(codebook.eval(null))
  @transient private lazy val mVal: Int =
    PqExprUtil.checkedM(m.eval(null).asInstanceOf[Int], cb, "rip_pq_codes")
  @transient private lazy val elemT: DataType =
    vec.dataType.asInstanceOf[ArrayType].elementType

  def compute(v: ArrayData): Any = {
    if (cb.isEmpty) return null
    val dim = cb(0).length
    if (v.numElements() < dim) return null
    val subdim = dim / mVal
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = PqExprUtil.getD(v, elemT, i)
      i += 1
    }
    val codes = new Array[Int](mVal)
    var s = 0
    while (s < mVal) {
      val off = s * subdim
      var best = -1
      var bestD = Double.PositiveInfinity
      var w = 0
      while (w < cb.length) {
        val c = cb(w)
        var d = 0.0
        var j = 0
        while (j < subdim) {
          val diff = x(off + j) - c(off + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = w }
        w += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any, cbv: Any, mv: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into the primitive loops above — stays
    // inside whole-stage codegen (same pattern as RipSimhash); the
    // codebook/m children are foldable and materialize once lazily
    val ref = ctx.addReferenceObj("ripPqCodes", this, classOf[RipPqCodes].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val tmp = ctx.freshName("codes")
      s"""
         |Object $tmp = $ref.compute($v);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RipPqCodes =
    copy(vec = f, codebook = s, m = t)
}

/** `rip_pq_adc(qv, codes, codebook, m)`: the PQ asymmetric distance —
  * Σ over subspaces s of the exact L2² between the query's subrange
  * and codeword codes[s]'s subrange, accumulated in subspace order
  * with each subspace's partial accumulated left-to-right —
  * bit-identical to the `aggregate(sequence, acc + l2sq(...))` HOF
  * chain it replaces (the cross-check twin in Similarity, and the
  * s-ordered list_sum the DuckDB oracle replays). ADC runs once per
  * CANDIDATE row — the search-side hot loop at corpus scale.
  *
  * Null semantics: null query/codes, null elements, a query shorter
  * than the codebook dim, or an out-of-range code → null (the
  * pipeline's null-distance filter drops such rows).
  */
case class RipPqAdc(qv: Expression, codes: Expression,
                    codebook: Expression, m: Expression)
  extends QuaternaryExpression {

  override def first: Expression = qv
  override def second: Expression = codes
  override def third: Expression = codebook
  override def fourth: Expression = m

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (qv.dataType, codes.dataType, codebook.dataType, m.dataType) match {
      case (ArrayType(qt, _), ArrayType(ct, _), cbT, IntegerType)
          if PqExprUtil.numericElem(qt) &&
            (ct == IntegerType || ct == LongType) &&
            PqExprUtil.codebookType(cbT) &&
            codebook.foldable && m.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "rip_pq_adc requires (array<numeric> query, array<int> codes, " +
          "foldable array<struct<int, array<double>>> codebook, foldable int m)")
    }

  @transient private lazy val cb: Array[Array[Double]] =
    PqExprUtil.materialize(codebook.eval(null))
  @transient private lazy val mVal: Int =
    PqExprUtil.checkedM(m.eval(null).asInstanceOf[Int], cb, "rip_pq_adc")
  @transient private lazy val qT: DataType =
    qv.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val cT: DataType =
    codes.dataType.asInstanceOf[ArrayType].elementType

  def compute(q: ArrayData, cs: ArrayData): Any = {
    if (cb.isEmpty) return null
    val dim = cb(0).length
    if (q.numElements() < dim || cs.numElements() < mVal) return null
    val subdim = dim / mVal
    var acc = 0.0
    var s = 0
    while (s < mVal) {
      if (cs.isNullAt(s)) return null
      val w = cT match {
        case IntegerType => cs.getInt(s)
        case _ => cs.getLong(s).toInt
      }
      if (w < 0 || w >= cb.length) return null
      val c = cb(w)
      val off = s * subdim
      var partial = 0.0
      var j = 0
      while (j < subdim) {
        if (q.isNullAt(off + j)) return null
        val diff = PqExprUtil.getD(q, qT, off + j) - c(off + j)
        partial += diff * diff
        j += 1
      }
      acc += partial
      s += 1
    }
    acc
  }

  override def nullSafeEval(q: Any, cs: Any, cbv: Any, mv: Any): Any =
    compute(q.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ripPqAdc", this, classOf[RipPqAdc].getName)
    nullSafeCodeGen(ctx, ev, (q, cs, _, _) => {
      val tmp = ctx.freshName("adc")
      s"""
         |Object $tmp = $ref.compute($q, $cs);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $tmp).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, fo: Expression): RipPqAdc =
    copy(qv = f, codes = s, codebook = t, m = fo)
}
