package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Registers function builders into an EXISTING session's registry
  * (SparkSessionExtensions only applies at session construction). */
object FunctionBridge {
  def registerTemp(spark: SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit =
    castToImpl(spark).sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
