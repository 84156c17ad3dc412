package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975): one pass
  * over the text finds EVERY occurrence of every pattern — including
  * overlapping ones and patterns nested inside longer patterns — in
  * O(|text| + matches), independent of the pattern count.
  *
  * This is the blocklist/contamination-scan primitive of a curation
  * pipeline: scanning for 10⁵ banned phrases with a regex alternation or
  * per-pattern `contains` costs O(|text| · patterns) and collapses at
  * corpus scale; the automaton costs one state transition per character
  * regardless of how many patterns are loaded. Built once per plan from
  * the pattern literal (executor-side on first eval, like a broadcast),
  * `Serializable` so the task closure ships it cheaply.
  *
  * Matching is over UTF-16 code units; for BMP text (this corpus,
  * including the zh documents) that coincides with the per-codepoint
  * scan the DuckDB oracle replays via substr().
  */
final class AhoAutomaton(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern set")
  require(patterns.forall(_.nonEmpty), "empty-string pattern")

  val nPatterns: Int = patterns.length

  // goto trie --------------------------------------------------------
  private val children = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Char, Int]())
  private val endsHere = scala.collection.mutable.ArrayBuffer(List.empty[Int])
  patterns.zipWithIndex.foreach { case (p, pid) =>
    var s = 0
    p.foreach { ch =>
      val m = children(s)
      if (!m.containsKey(ch)) {
        children += new java.util.HashMap[Char, Int]()
        endsHere += Nil
        m.put(ch, children.size - 1)
      }
      s = m.get(ch)
    }
    endsHere(s) = pid :: endsHere(s)
  }

  // failure + output links (BFS) --------------------------------------
  private val fail = new Array[Int](children.size)
  // outLink(s): the nearest proper-suffix state with a pattern ending
  // there — walking it emits every nested/overlapping match at a
  // position in O(matches), the classic dictionary-suffix chain
  private val outLink = Array.fill(children.size)(-1)
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).forEach { (_, c) => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      outLink(s) =
        if (endsHere(fail(s)).nonEmpty) fail(s) else outLink(fail(s))
      children(s).forEach { (ch, c) =>
        var f = fail(s)
        while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
        fail(c) = if (children(f).containsKey(ch) && children(f).get(ch) != c)
          children(f).get(ch) else 0
        queue += c
      }
    }
  }

  private val endsArr: Array[Array[Int]] =
    endsHere.map(_.reverse.toArray).toArray

  /** Per-pattern occurrence counts over `text` (all matches, overlapping
    * included), as a fresh int array indexed by pattern position.
    */
  def countAll(text: String): Array[Int] = {
    val counts = new Array[Int](nPatterns)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !children(s).containsKey(ch)) s = fail(s)
      if (children(s).containsKey(ch)) s = children(s).get(ch)
      var o = if (endsArr(s).nonEmpty) s else outLink(s)
      while (o != -1) {
        val pids = endsArr(o)
        var j = 0
        while (j < pids.length) { counts(pids(j)) += 1; j += 1 }
        o = outLink(o)
      }
      i += 1
    }
    counts
  }

  /** Codegen entry point: counts boxed as Catalyst array data. */
  def countAllAsArrayData(text: UTF8String): ArrayData =
    new GenericArrayData(countAll(text.toString))
}

/** `graft_aho(text, patterns)` — per-pattern occurrence counts as
  * `array<int>` (position i = count of patterns[i], overlapping matches
  * included). `patterns` must be a foldable `array<string>` literal: the
  * automaton is built once per expression instance, not per row. The
  * portable (extension-less) formulation this must match element for
  * element is [[CrossHash.ahoCounts]]'s higher-order-function scan.
  */
case class AhoCounts(text: Expression, patterns: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = patterns

  override def prettyName: String = "graft_aho"

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = text.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (text.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_aho expects a string text argument, got ${text.dataType}")
    else if (!patterns.foldable ||
        !patterns.dataType.isInstanceOf[ArrayType] ||
        patterns.dataType.asInstanceOf[ArrayType].elementType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_aho expects a foldable array<string> pattern literal")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val automaton: AhoAutomaton = {
    val arr = patterns.eval().asInstanceOf[ArrayData]
    new AhoAutomaton(Array.tabulate(arr.numElements())(i =>
      arr.getUTF8String(i).toString))
  }

  override protected def nullSafeEval(t: Any, pats: Any): Any =
    automaton.countAllAsArrayData(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the automaton rides the generated class as a referenced object —
    // the codegen analogue of a broadcast: built once, used per row
    // inside the whole-stage loop
    val autoRef = ctx.addReferenceObj("ahoAutomaton", automaton,
      classOf[AhoAutomaton].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $autoRef.countAllAsArrayData($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, patterns = newRight)
}
