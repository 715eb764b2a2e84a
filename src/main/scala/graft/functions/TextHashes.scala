package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * CodegenFallback is deliberate: the cost is md5 itself, and both
  * expressions live in pinned materialization stages (Det.memo), not in
  * per-query hot paths.
  */
private object Md5Hex {
  private val HEX = "0123456789abcdef".toCharArray

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
case class MinHashSig(child: Expression) extends UnaryExpression with CodegenFallback {
  private val NumHashes = 12

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(NumHashes)(j => s"$j:".getBytes("UTF-8"))
    // Seed "g" sorts above every hex string.
    val mins = Array.fill[Array[Char]](NumHashes)(Array('g'))
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i).getBytes
      var j = 0
      while (j < NumHashes) {
        val h = Md5Hex.hex(md, prefixes(j), s)
        if (compare(h, mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(c => UTF8String.fromString(new String(c))))
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
case class SimHash32(child: Expression) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val empty = Array.emptyByteArray
    val counts = new Array[Int](32)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = Md5Hex.hex(md, empty, arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 32) {
        if (h(b) >= '8') counts(b) += 1 else counts(b) -= 1
        b += 1
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
