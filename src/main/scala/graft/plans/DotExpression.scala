package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

  // analysis-time rejection of non-numeric-array inputs — without this,
  // the SQL-registered function dies in codegen with an opaque
  // ClassCastException instead of an AnalysisException
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if DotExprTypes.numericElem(lt) && DotExprTypes.numericElem(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"rip_dot requires two array<float|double|int|bigint> arguments, got ${l.sql} and ${r.sql}")
  }
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

/** `rip_lsh_sig(vec, bits)`: the `bits`-plane random-hyperplane LSH
  * signature of `Similarity.lshSignature` as ONE codegen'd pass over the
  * vector. Plane p's weight for dimension d is the quadratic-mix integer
  *   s = 131·p + d
  *   w(p, d) = floorMod(floorMod(s·s, 1000003)·2654435761
  *                      + s·40503 + 12345, 2001) − 1000,
  * each plane's projection accumulates left-to-right in double, and bit
  * p is set iff its projection is > 0 — bit-identical to the
  * `aggregate(zip_with(...))` per-plane formulation it replaces (kept as
  * `Similarity.lshSignatureHof`, spec-asserted equal), which interprets
  * its lambdas per element AND allocates a `sequence` index array per
  * plane per row: 2·bits interpreted array traversals per row on both
  * sides of the band self-join dominated the embedding near-dup pipeline.
  *
  * Null semantics mirror the HOF chain exactly: a null vector or any
  * null element yields signature 0 (every plane's `when(null > 0)`
  * falls to `otherwise(0)`), so the expression itself is never null.
  */
case class RipLshSig(child: Expression, bits: Int)
  extends UnaryExpression {

  // 64 planes fill the long exactly (plane 63 = the sign bit — band
  // extraction masks after the shift, so arithmetic shiftright is safe)
  require(bits >= 1 && bits <= 64, s"rip_lsh_sig: bits must be in [1,64], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if DotExprTypes.numericElem(et) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rip_lsh_sig requires an array<float|double|int|bigint> argument, got ${other.sql}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val t = elemType
    val accs = new Array[Double](bits)
    var d = 0
    while (d < n) {
      if (a.isNullAt(d)) return 0L
      val x = t match {
        case FloatType   => a.getFloat(d).toDouble
        case DoubleType  => a.getDouble(d)
        case IntegerType => a.getInt(d).toDouble
        case LongType    => a.getLong(d).toDouble
        case other => throw new IllegalArgumentException(s"rip_lsh_sig: $other")
      }
      var p = 0
      while (p < bits) {
        // quadratic mix, NOT an affine LCG: an affine w(p,d) over
        // s = 131p+d has lattice structure — consecutive planes
        // anti-correlate at −0.5 (measured), concentrating signatures
        // on alternating-bit values (0x5555…/0xAAAA…) and turning two
        // buckets per band corpus-hot (the r13 10×-lane q264 blowup:
        // 92M candidates where ~23k are expected). The s² term breaks
        // the lattice; cross-plane |corr| sits at the 64-dim sampling
        // noise floor. All ops stay in non-negative i64 (s ≤ 131·63 +
        // dim; s² mod 1000003 < 1e6; ×2654435761 < 2.7e15), so plain
        // `%` replays it on any engine.
        val s = 131L * p + d
        accs(p) += x * (Math.floorMod(
          Math.floorMod(s * s, 1000003L) * 2654435761L + s * 40503L + 12345L,
          2001L) - 1000L).toDouble
        p += 1
      }
      d += 1
    }
    var sig = 0L
    var p = 0
    while (p < bits) {
      if (accs(p) > 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val a = c.value
    val d = ctx.freshName("d")
    val p = ctx.freshName("p")
    val n = ctx.freshName("n")
    val x = ctx.freshName("x")
    val accs = ctx.freshName("accs")
    val sig = ctx.freshName("sig")
    val bad = ctx.freshName("bad")
    val elemVal = CodeGenerator.getValue(a, elemType, d)
    val resultCode =
      code"""
         |${c.code}
         |long $sig = 0L;
         |if (!${c.isNull}) {
         |  int $n = $a.numElements();
         |  boolean $bad = false;
         |  double[] $accs = new double[$bits];
         |  for (int $d = 0; $d < $n; $d++) {
         |    if ($a.isNullAt($d)) { $bad = true; break; }
         |    double $x = (double)($elemVal);
         |    for (int $p = 0; $p < $bits; $p++) {
         |      long ${p}s = 131L * $p + $d;
         |      $accs[$p] += $x * (double)(Math.floorMod(Math.floorMod(${p}s * ${p}s, 1000003L) * 2654435761L + ${p}s * 40503L + 12345L, 2001L) - 1000L);
         |    }
         |  }
         |  if (!$bad) {
         |    for (int $p = 0; $p < $bits; $p++) {
         |      if ($accs[$p] > 0.0) $sig |= (1L << $p);
         |    }
         |  }
         |}
         |final long ${ev.value} = $sig;
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RipLshSig =
    copy(child = newChild)
}

/** `rip_simhash(tokens)`: 64-bit SimHash of a token array in ONE pass —
  * per token h = xxhash64(token) (Spark's seed-42 XXH64, bit-identical
  * to the `xxhash64` expression), per-bit signed vote, bit j set iff
  * its vote is positive. Replaces the nested
  * `aggregate(tokens, zip_with(votes, sequence(0,63), ...))` chain
  * (tokens × 64 interpreted lambda adds per ROW — the streaming
  * near-dedup signature cost), kept as `Dedup.simhashHof` and asserted
  * equal in OpsSpec. Null token elements contribute the seed unchanged
  * (exactly what `xxhash64(null)` yields); a null array is null.
  */
case class RipSimhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rip_simhash requires an array<string> argument, got ${other.sql}")
  }

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (a.isNullAt(i)) 42L
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(a.getUTF8String(i), org.apache.spark.sql.types.StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into the primitive loop above — stays
    // inside whole-stage codegen (no interpreted-Expression fallback)
    val ref = ctx.addReferenceObj("ripSimhash", this, classOf[RipSimhash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RipSimhash =
    copy(child = newChild)
}

/** `rip_bloom_probe(h1, h2, bitmap, k)`: bloom membership test against a
  * driver-built bitmap — true ⟺ all k double-hashed bit positions
  * (Kirsch–Mitzenmacher: p_j = floorMod(h1 + j·h2, m)) are set. The
  * children are the TWO xxhash64 columns (`Bloom.h1/h2` — null/type
  * semantics stay exactly Spark's); the bitmap itself is NOT a child:
  * it binds once per task as a codegen reference object (`long[]`),
  * replacing the previous k `element_at(typedlit(bitmap), …)` chain
  * whose k separate literal references made plan strings and codegen
  * constant pools scale with m (ADVICE r12: a 2^30-bit filter = 16M
  * longs embedded k times per probe column). Plan output now prints a
  * constant-size node regardless of m.
  *
  * Bit-for-bit equal to the element_at formulation (BloomSpec pins the
  * no-false-negative contract; the q256/q260 oracles pin the gate).
  */
case class RipBloomProbe(left: Expression, right: Expression,
                         bitmap: Array[Long], kHashes: Int)
  extends BinaryExpression {

  require(kHashes > 0, s"rip_bloom_probe: kHashes must be positive, got $kHashes")
  require(bitmap.nonEmpty, "rip_bloom_probe: bitmap must be non-empty")

  private val mBits: Long = bitmap.length.toLong * 64L

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rip_bloom_probe requires two bigint hash arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Long]
    val b = r.asInstanceOf[Long]
    var j = 0
    while (j < kHashes) {
      val p = java.lang.Math.floorMod(a + j.toLong * b, mBits)
      if ((bitmap((p >>> 6).toInt) & (1L << (p & 63L).toInt)) == 0L)
        return false
      j += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bm = ctx.addReferenceObj("bloomBitmap", bitmap, "long[]")
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = true;
         |for (int $j = 0; $j < $kHashes; $j++) {
         |  long $p = java.lang.Math.floorMod($l + (long)$j * $r, ${mBits}L);
         |  if (($bm[(int)($p >>> 6)] & (1L << (int)($p & 63L))) == 0L) {
         |    $ok = false; break;
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })
  }

  // Case-class equality on the Array[Long] field is REFERENCE equality,
  // and the function builder extracts a fresh `toLongArray()` per plan
  // build — so two structurally identical probes (same bitmap content)
  // would never compare equal, which breaks semanticEquals/canonicalized
  // matching and with it every plan-keyed cache above this expression
  // (the dedup frame registry's q256/q260/q262/q264 entries missed on
  // every bench run until this override). Compare the bitmap by CONTENT.
  override def equals(other: Any): Boolean = other match {
    case o: RipBloomProbe =>
      kHashes == o.kHashes && left == o.left && right == o.right &&
        java.util.Arrays.equals(bitmap, o.bitmap)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(getClass, left, right,
      Integer.valueOf(kHashes),
      Integer.valueOf(java.util.Arrays.hashCode(bitmap)))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RipBloomProbe =
    copy(left = newLeft, right = newRight)
}

private[plans] object DotExprTypes {
  def numericElem(t: DataType): Boolean = t match {
    case FloatType | DoubleType | IntegerType | LongType => true
    case _ => false
  }
}
