/* Test-only accessor: SparkSessionExtensions' build methods are
 * private[sql], so the injection test reads them through this probe. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

object ExtensionsProbe {
  def strategies(ext: SparkSessionExtensions, spark: SparkSession): Seq[Any] =
    ext.buildPlannerStrategies(spark)
  def rules(ext: SparkSessionExtensions, spark: SparkSession): Seq[Any] =
    ext.buildOptimizerRules(spark)
}
