package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd content-defined-chunking cut points — bit-identical to the
  * builtin formulation in [[graft.operators.Text.cdcChunkEndsBuiltin]]
  * (filter `sequence` positions where `h60(substr(text,i,n)) % mask == 0`,
  * map to gram ends, append the document end), but computed in ONE pass
  * over the string's bytes. The builtin pays per gram: an O(position)
  * `substr` re-scan (quadratic per document), a gram UTF8String, a 32-char
  * md5 hex string, and a `conv` parse — ~20M grams at sf0.1. This walks
  * char offsets once and md5-hashes each byte window in place
  * ([[H60.hashSlice]]). Promoted on bench evidence like [[H60]] /
  * [[DotProductD]] (SURVEY.md §7.4): tx_cdc_chunks 4.4s → measured after
  * promotion in BASELINE.md.
  *
  * `n` (gram width) and `mask` (expected chunk length modulus) are
  * plan-time constants, matching the Column-API signature.
  */
case class CdcEnds(child: Expression, n: Int, mask: Int) extends UnaryExpression {

  override def prettyName: String = "graft_cdc_ends"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_ends expects a string, got ${child.dataType}")
    else if (n < 1 || mask < 1)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_ends needs n >= 1 and mask >= 1, got n=$n mask=$mask")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  protected override def nullSafeEval(input: Any): Any =
    CdcEnds.ends(input.asInstanceOf[UTF8String], n, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcEnds.ends($c, $n, $mask)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcEnds {

  /** 1-based chunk end positions (character positions, as `substr`/`length`
    * count them): every gram end whose h60 is ≡ 0 mod `mask`, ascending,
    * with the document end appended unless it coincides with the last cut.
    * Documents shorter than `n` (including empty) yield `[numChars]`.
    */
  def ends(s: UTF8String, n: Int, mask: Int): ArrayData = {
    val chars = s.numChars()
    if (chars < n) return new GenericArrayData(Array[Any](chars))
    val bytes = s.getBytes
    // char index -> byte offset, one linear walk (UTF-8 aware; for pure
    // ASCII this is the identity map)
    val offs = new Array[Int](chars + 1)
    var b = 0
    var c = 0
    while (c < chars) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(chars) = bytes.length
    val out = new java.util.ArrayList[Any](chars / mask + 2)
    var p = 0 // 0-based char index of the gram start
    val last = chars - n
    while (p <= last) {
      val h = H60.hashSlice(bytes, offs(p), offs(p + n) - offs(p))
      if (h % mask == 0) out.add(p + n) // 1-based inclusive end of this gram
      p += 1
    }
    // mirror the builtin's array_distinct(concat(gramEnds, [len])): a cut
    // on the final gram already IS the document end
    if (out.isEmpty || out.get(out.size - 1).asInstanceOf[Int] != chars) out.add(chars)
    new GenericArrayData(out.toArray)
  }
}
