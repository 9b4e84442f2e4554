package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductExpr, FrequentItemsSketch, MediaDimsExpr, TopKByDouble, VectorSum}

/** Session extension registering graft's native expressions as SQL
  * functions (`SELECT graft_dot(a, b)`), so pure-SQL users get the codegen
  * path too. Enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * The DataFrame API does not require this — `VectorFunctions.dotNative`
  * builds the expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot expects exactly 2 arguments")
        DotProductExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_sum"),
      new ExpressionInfo(classOf[VectorSum].getName, "vec_sum"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "vec_sum expects exactly 1 argument")
        VectorSum(children.head).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("freq_items"),
      new ExpressionInfo(classOf[FrequentItemsSketch].getName, "freq_items"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "freq_items expects (column, capacity)")
        require(children(1).foldable, "freq_items capacity must be a literal")
        FrequentItemsSketch(children.head,
          children(1).eval().asInstanceOf[Number].intValue())
          .toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("media_dims"),
      new ExpressionInfo(classOf[MediaDimsExpr].getName, "media_dims"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "media_dims expects exactly 1 argument")
        MediaDimsExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[TopKByDouble].getName, "top_k_by"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "top_k_by expects (value, id, k)")
        require(children(2).foldable, "top_k_by k must be a literal")
        TopKByDouble(children.head, children(1),
          children(2).eval().asInstanceOf[Number].intValue())
          .toAggregateExpression()
      }))
  }
}
