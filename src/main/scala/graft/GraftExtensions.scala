package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{AhoCounts, AhoSpans, CdcEnds, DotProductD, H60}

/** Session extensions registering graft's native expressions with the SQL
  * function registry, so they are usable from both the Column API and
  * `spark.sql(...)`. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductD(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_h60"),
      new ExpressionInfo(classOf[H60].getName, "graft_h60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        H60(children(0))))
    e.injectFunction((
      FunctionIdentifier("graft_aho"),
      new ExpressionInfo(classOf[AhoCounts].getName, "graft_aho"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AhoCounts(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_aho_spans"),
      new ExpressionInfo(classOf[AhoSpans].getName, "graft_aho_spans"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AhoSpans(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_cdc_ends"),
      new ExpressionInfo(classOf[CdcEnds].getName, "graft_cdc_ends"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // n and mask are plan-time constants in the Column API; the SQL
        // surface accordingly requires foldable int literals
        def lit(i: Int): Int = {
          val e = children(i)
          require(e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType,
            s"graft_cdc_ends argument ${i + 1} must be an int literal")
          e.eval().asInstanceOf[Int]
        }
        CdcEnds(children(0), lit(1), lit(2))
      }))
  }
}
