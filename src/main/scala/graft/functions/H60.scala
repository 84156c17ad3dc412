package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd h60: the first 15 hex characters of md5 as a 60-bit long —
  * bit-identical to `conv(substring(md5(x), 1, 15), 16, 10)` (and to the
  * oracle's `('0x' || substr(md5(x), 1, 15))::BIGINT`), but computed
  * straight from the digest bytes. The built-in formulation materializes a
  * 32-char hex UTF8String, substrings it, and parses it back — three
  * transient allocations per row that dominate the hashing stage of the
  * dedup pipelines (~900k shingle rows per query at sf0.1); this skips all
  * of them. Promoted on bench evidence like [[DotProductD]] (SURVEY.md
  * §7.4).
  */
case class H60(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_h60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h60 expects a string, got ${child.dataType}")

  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any =
    H60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object H60 {

  // MessageDigest is stateful; one per thread, reset per call.
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 = the first 7 digest bytes plus the high
    * nibble of the 8th, assembled directly as a long.
    */
  def hash(s: UTF8String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    assemble(d)
  }

  /** Same hash over a byte slice — lets callers (e.g. [[CdcEnds]]) hash
    * many overlapping windows of one buffer without a substring allocation
    * per window.
    */
  def hashSlice(bytes: Array[Byte], offset: Int, len: Int): Long = {
    val md = md5.get()
    md.reset()
    md.update(bytes, offset, len)
    assemble(md.digest())
  }

  private def assemble(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}
