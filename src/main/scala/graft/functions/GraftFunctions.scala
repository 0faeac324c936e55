package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the engine's custom Catalyst expressions, both
  * per-session (`register`) and via `SparkSessionExtensions` for
  * spark-submit (`--conf spark.sql.extensions=graft.functions.GraftExtensions`). */
object GraftFunctions {

  private def unary(name: String, mk: Expression => Expression)
      : Seq[Expression] => Expression = exprs => {
    require(exprs.length == 1,
      s"$name takes exactly 1 argument, got ${exprs.length}")
    mk(exprs.head)
  }

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash64", classOf[SimHash64].getName,
      unary("graft_simhash64", SimHash64.apply)),
    ("graft_mix64", classOf[Mix64].getName,
      unary("graft_mix64", Mix64.apply)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, className, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
}
