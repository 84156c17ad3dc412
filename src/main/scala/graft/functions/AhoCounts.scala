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
  * Matching is over UTF-16 code units with BMP-only patterns (enforced
  * by [[AhoPatternCheck]]); astral characters in the TEXT are harmless —
  * no surrogate unit equals a BMP pattern char — and [[spansAll]] reports
  * codepoint positions, so both match semantics and span offsets coincide
  * with the per-codepoint scan the DuckDB oracle replays via substr()
  * even on astral-bearing documents.
  */
final class AhoAutomaton(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern set")
  require(patterns.forall(_.nonEmpty), "empty-string pattern")

  val nPatterns: Int = patterns.length
  private val patLens: Array[Int] = patterns.map(_.length)

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

  /** Every match over `text` as a (start, len) span — 1-based CODEPOINT
    * start position (Spark `substr` semantics, so the excision/redaction
    * folds slice correctly even when the document carries astral
    * characters before a match), length in codepoints, which for the
    * BMP-only patterns this automaton accepts equals the pattern's UTF-16
    * length. Overlapping and nested matches each emit their own span.
    * Sorted by (start asc, len asc), the exact order the fold
    * formulation's `array_sort` over (start, len) structs produces, so
    * the two dispatch targets stay element-identical — including on
    * astral-bearing text, where the fold's substr scan is codepoint-based
    * too. Same single automaton pass as [[countAll]]; the codepoint
    * cursor just skips low surrogates (the second half of an astral
    * pair), which no BMP pattern char can match.
    */
  def spansAll(text: String): Array[(Int, Int)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var s = 0
    var i = 0
    var cp = 0 // 1-based codepoint index of the unit at i (pairs count once)
    while (i < text.length) {
      val ch = text.charAt(i)
      if (!Character.isLowSurrogate(ch)) cp += 1
      while (s != 0 && !children(s).containsKey(ch)) s = fail(s)
      if (children(s).containsKey(ch)) s = children(s).get(ch)
      var o = if (endsArr(s).nonEmpty) s else outLink(s)
      while (o != -1) {
        val pids = endsArr(o)
        var j = 0
        while (j < pids.length) {
          val len = patLens(pids(j))
          // match end sits at codepoint cp; the matched slice is all-BMP
          // (it equals a BMP pattern), so its codepoint span is `len`
          buf += ((cp - len + 1, len))
          j += 1
        }
        o = outLink(o)
      }
      i += 1
    }
    buf.sortInPlaceBy(x => (x._1, x._2)).toArray
  }

  /** Codegen entry point: spans boxed as Catalyst (start, len) rows. */
  def spansAllAsArrayData(text: UTF8String): ArrayData =
    new GenericArrayData(spansAll(text.toString).map { case (st, ln) =>
      org.apache.spark.sql.catalyst.InternalRow(st, ln)
    }.toArray[Any])
}

/** Shared analysis-time validation of the `(text, patterns)` signature the
  * two automaton expressions take: string text, a foldable non-empty
  * array<string> literal with non-null, non-empty, BMP-only patterns.
  */
private[functions] object AhoPatternCheck {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def check(prettyName: String, text: Expression,
      patterns: Expression): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string text argument, got ${text.dataType}")
    else if (!patterns.foldable ||
        !patterns.dataType.isInstanceOf[ArrayType] ||
        patterns.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a foldable array<string> pattern literal")
    else {
      // the literal is foldable, so validate its VALUE here too — a NULL,
      // empty-string, or empty-array pattern set would otherwise surface
      // as an NPE/require inside a task at first eval instead of an
      // analysis-time error (a SQL call like graft_aho(t, array('')))
      val arr = patterns.eval().asInstanceOf[ArrayData]
      if (arr == null || arr.numElements() == 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a non-empty, non-null pattern array")
      else {
        val vals = Array.tabulate(arr.numElements())(i =>
          if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString)
        if (vals.exists(v => v == null || v.isEmpty))
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName patterns must be non-null, non-empty strings")
        else if (vals.exists(v => v.codePointCount(0, v.length) != v.length))
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName patterns must be BMP-only (the automaton matches " +
              "UTF-16 code units; the fold formulation slices by codepoint)")
        else TypeCheckResult.TypeCheckSuccess
      }
    }
  }
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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    AhoPatternCheck.check(prettyName, text, patterns)

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

/** `graft_aho_spans(text, patterns)` — every match as a
  * `array<struct<start:int,len:int>>` span (1-based CODEPOINT start,
  * overlapping and nested matches included), sorted by (start, len): the
  * ACTING form
  * of the blocklist scan — [[AhoCounts]] tells a pipeline HOW MUCH is
  * blocklisted, this tells it WHERE, which is what the excision verb
  * ([[graft.operators.Text.exciseSpans]]) consumes. Same once-per-plan
  * automaton, same single pass per row. The portable formulation this
  * must match element for element is [[CrossHash.ahoSpansFold]]'s
  * per-pattern position scan under the identical (start, len) sort.
  */
case class AhoSpans(text: Expression, patterns: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = patterns

  override def prettyName: String = "graft_aho_spans"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = text.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    AhoPatternCheck.check(prettyName, text, patterns)

  @transient private lazy val automaton: AhoAutomaton = {
    val arr = patterns.eval().asInstanceOf[ArrayData]
    new AhoAutomaton(Array.tabulate(arr.numElements())(i =>
      arr.getUTF8String(i).toString))
  }

  override protected def nullSafeEval(t: Any, pats: Any): Any =
    automaton.spansAllAsArrayData(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("ahoAutomaton", automaton,
      classOf[AhoAutomaton].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $autoRef.spansAllAsArrayData($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, patterns = newRight)
}
