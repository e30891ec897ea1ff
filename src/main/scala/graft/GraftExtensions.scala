package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{KmvKSmallest, VecDot}

/** Engine extensions, injected at session build
  * (`Sessions.builder` calls `.withExtensions(new GraftExtensions)`);
  * also usable via `spark.sql.extensions=graft.GraftExtensions` on a
  * cluster. Currently registers the codegen'd `vec_dot` expression so
  * every API surface (SQL text, DataFrame, views) can call it. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getCanonicalName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvKSmallest].getCanonicalName, "kmv_sketch"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "kmv_sketch takes (value, k) arguments")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"kmv_sketch k must be an integer literal, got $other")
        }
        KmvKSmallest(children.head, k)
      }))
  }
}
