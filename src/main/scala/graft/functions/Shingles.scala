package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct character 3-gram shingles of a
  * string in ONE linear pass (SURVEY.md §2j scale path; preference order
  * (b) — a codegen'd `Expression` over the declarative
  * `array_distinct(transform(sequence(1, greatest(len-2, 1)),
  * i -> substr(text, i, 3)))` spelling).
  *
  * The declarative form is QUADRATIC in document length: each
  * `substr(text, i, 3)` must find the byte offset of codepoint i by
  * scanning from the start of the UTF8String (UTF-8 is variable-width),
  * so a d-char doc costs Σi = O(d²) byte scans. Invisible at 300-char
  * test docs; at a 100 TB corpus of 100 KB documents it is 10¹⁰ byte
  * operations per document. The round-14 hostile corpus (5-6 KB repeat
  * docs) surfaced it as a 4× key-level slowdown. This expression walks
  * the codepoint starts once, slices grams from a single byte-array
  * copy, and dedups through a first-occurrence hash set: O(d) total.
  *
  * Semantics contract (proven value-equal to the declarative spelling in
  * DedupSpec, including the DuckDB-twin edge cases): null → null; docs
  * of ≤ 2 chars yield the whole text as the single shingle (that is what
  * substr clipping does there — '' included); otherwise the distinct
  * full 3-grams in first-occurrence order. Codepoint-aware: an emoji is
  * one character, exactly as substr counts — a split('')-based
  * reformulation would break surrogate pairs.
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles3 expects a string argument, got ${t.sql}")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def nullSafeEval(input: Any): Any =
    Shingles.shingles3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles.shingles3($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Shingles {

  /** One-pass distinct 3-gram extraction (see [[Shingles3]]). Called
    * from both the interpreted eval and the generated code. */
  def shingles3(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // one defensive copy; all grams slice it
    val nb = bytes.length
    // byte offset of each codepoint start
    val starts = new Array[Int](nb)
    var n = 0
    var p = 0
    while (p < nb) {
      starts(n) = p
      n += 1
      p += UTF8String.numBytesForFirstByte(bytes(p))
    }
    if (n <= 2)
      return new GenericArrayData(
        Array[AnyRef](UTF8String.fromBytes(bytes)))
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i <= n - 3) {
      val start = starts(i)
      val end = if (i + 3 < n) starts(i + 3) else nb
      seen.add(UTF8String.fromBytes(bytes, start, end - start))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }
}

object TextShingleFunctions {
  import org.apache.spark.sql.GraftBridge

  /** Column-level fused distinct-3-gram shingles of a string column. */
  def shingles3(text: Column): Column =
    GraftBridge.column(Shingles3(GraftBridge.expression(text)))
}
