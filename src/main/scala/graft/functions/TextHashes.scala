package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash / SimHash kernels over an `ARRAY<STRING>` shingle
  * column — custom-Catalyst tier (c) of the builder brief, used because
  * the HOF formulations interpret a lambda per element and allocate an
  * accumulator array per step (`zip_with` builds a fresh 12-slot array
  * for every shingle), which dominates the signature-table
  * materialization cost. These compute the IDENTICAL values (same md5,
  * same lexicographic minima / bit-majority rule — the DuckDB oracle
  * twins in queries/Dedup.scala are unchanged and still gate them) in
  * one tight loop with a reused digest and no per-element allocation.
  *
  * Codegen: both expressions implement `doGenCode` as a call into their
  * own kernel method (via `ctx.addReferenceObj`), so a projection
  * containing them stays INSIDE whole-stage codegen — the r3
  * CodegenFallback broke the enclosing stage out of codegen for every
  * dedup-pipeline scan (PlanSpec asserts the fix).
  *
  * Null elements are SKIPPED (ADVICE r3: `getUTF8String` NPE'd on
  * containsNull inputs). For MinHash this matches the SQL fold exactly —
  * `least(m, md5(NULL || ':' || s))` keeps `m` under Spark's null
  * semantics; for SimHash the fold's CASE sends a NULL digest to the
  * ELSE (-1) branch, but a null shingle carries no content signal and
  * the shingle producers (`array_distinct ∘ transform`) never emit one —
  * skipping is the defensible semantics for out-of-pipeline callers.
  */
private object Md5Hex {
  private val HEX = "0123456789abcdef".toCharArray

  /** Per-thread reused digest: expression instances can be shared across
    * tasks (broadcast plan reuse) and MessageDigest is stateful.
    */
  val md: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Lowercase hex md5 of `prefix` ++ `s`, via a reused digest. */
  def hex(md: java.security.MessageDigest, prefix: Array[Byte], s: Array[Byte]): Array[Char] = {
    md.reset()
    md.update(prefix)
    md.update(s)
    val d = md.digest()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    out
  }
}

/** `minhash_sig(shingles)` → ARRAY<STRING>(12): per hash j ∈ 0..11 the
  * lexicographic MIN of md5(j ++ ":" ++ shingle) hex, seeded with "g"
  * (above every hex digit) so an empty array yields the same sentinel
  * signature as the SQL fold it replaces.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  private val NumHashes = 12

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(NumHashes)(j => s"$j:".getBytes("UTF-8"))

  /** Public: called from generated code via addReferenceObj. */
  def kernel(arr: ArrayData): ArrayData = {
    val md = Md5Hex.md.get()
    // Seed "g" sorts above every hex string.
    val mins = Array.fill[Array[Char]](NumHashes)(Array('g'))
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < NumHashes) {
          val h = Md5Hex.hex(md, prefixes(j), s)
          if (compare(h, mins(j)) < 0) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(c => UTF8String.fromString(new String(c))))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigKernel", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($c);")
  }

  private def compare(a: Array[Char], b: Array[Char]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      if (a(i) != b(i)) return a(i) - b(i)
      i += 1
    }
    a.length - b.length
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash32(shingles)` → BIGINT: 32-bit bit-majority fingerprint over
  * the shingles' md5 hex digits — bit i−1 (i ∈ 1..32) is set iff the
  * count of shingles whose i-th hex digit is ≥ '8' exceeds the count
  * below (the `instr(hex, c) >= 9` rule of the SQL fold it replaces).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  /** Public: called from generated code via addReferenceObj. */
  def kernel(arr: ArrayData): Long = {
    val md = Md5Hex.md.get()
    val empty = Array.emptyByteArray
    val counts = new Array[Int](32)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Md5Hex.hex(md, empty, arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 32) {
          if (h(b) >= '8') counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash32Kernel", this, classOf[SimHash32].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
