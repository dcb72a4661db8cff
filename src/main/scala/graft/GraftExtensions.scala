package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorDistance
import graft.model.IndexKind.Metric

/** Session extension that registers the engine's native expressions as SQL
  * functions, so plain `spark.sql` can use them:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT vector_distance_cosine(a, b) FROM t")
  * }}}
  *
  * [[GraftExtensions.register]] does the same on an already-built session
  * (temp functions) — handy in notebooks/tests.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorDistance].getName, name),
        builder))
    }
}

object GraftExtensions {

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Metric.all.map { m =>
      val name = s"vector_distance_${m.name}"
      name -> { (args: Seq[Expression]) =>
        require(args.length == 2, s"$name expects exactly 2 arguments")
        VectorDistance(args.head, args(1), m)
      }
    }

  /** Register all engine functions as temp functions on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
