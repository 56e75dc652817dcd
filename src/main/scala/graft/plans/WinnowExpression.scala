package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rip_winnow(normText, k, w)`: winnowing fingerprints (Schleimer,
  * Wilkerson, Aiken 2003) of an ALREADY-NORMALIZED string in ONE
  * codegen'd pass — the distinct window-`w` minima over the md5-prefix
  * hashes of every char `k`-gram, exactly the selection of
  * `TextFns.winnowFingerprints` / `Dedup.winnowFingerprintsDf`
  * (PipelineR7Spec asserts three-way equality).
  *
  * Input must already be `regexp_replace(lower(trim(text)), '\s+', ' ')`
  * — keeping the normalization a plain Catalyst projection avoids
  * re-implementing Spark's Unicode lower/trim semantics here, and it
  * evaluates once per row (it only misbehaved inside the Column form's
  * transform lambdas).
  *
  * Engine-observable values are the 16-lowercase-hex-char md5 prefixes
  * (compared as strings elsewhere); internally each gram folds to the
  * digest's first 8 bytes as an UNSIGNED long — identical order to the
  * hex string's lexicographic order — so window minima run on
  * primitives, and only the ≈ 2/(w+1) survivors materialize strings.
  * Replaces the explode → rows-between-window → dropDuplicates plan of
  * winnowFingerprintsDf: same output, ZERO shuffle (the doc-id window
  * needed one), no per-gram row blowup.
  *
  * Grams are CODE-POINT substrings (UTF8String.substringSQL), matching
  * `substr(s, i, k)` exactly on any input; a text shorter than k chars
  * degrades to one whole-text gram, fewer than w windows to one
  * clamped window (same as the reference forms).
  */
case class RipWinnow(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k > 0 && w > 0, "rip_winnow needs k > 0 and w > 0")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rip_winnow requires a string argument, got ${other.sql}")
  }

  def compute(s: UTF8String): ArrayData = {
    val len = s.numChars()
    val nGrams = math.max(len - (k - 1), 1)
    val md = RipWinnow.digest.get()
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      // substringSQL is 1-based and code-point aware — substr() exactly
      val gram = s.substringSQL(i + 1, k)
      md.reset()
      val d = md.digest(gram.getBytes)
      hs(i) = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      i += 1
    }
    val nWins = math.max(nGrams - (w - 1), 1)
    // first-occurrence distinct of per-window unsigned minima (w is
    // small — the O(n·w) scan beats deque bookkeeping at these sizes)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nWins) {
      var m = hs(j)
      var t = j + 1
      val end = math.min(j + w, nGrams)
      while (t < end) {
        if (java.lang.Long.compareUnsigned(hs(t), m) < 0) m = hs(t)
        t += 1
      }
      seen.add(m)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(f"${it.next().longValue()}%016x")
      o += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into the primitive loop — stays inside
    // whole-stage codegen (same pattern as RipSimhash)
    val ref = ctx.addReferenceObj("ripWinnow", this, classOf[RipWinnow].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RipWinnow =
    copy(child = newChild)
}

object RipWinnow {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
