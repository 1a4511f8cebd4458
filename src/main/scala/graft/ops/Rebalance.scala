package graft.ops

import org.apache.spark.sql.DataFrame

/** Pre-amplification rebalance: a row-AMPLIFYING stage (a B-fold
  * replicate explode, a |queries|-fold broadcast cross join) inherits
  * the scan's split count — and a small input (one parquet file under
  * `maxPartitionBytes`) yields ONE split, so the amplified work runs on
  * one core no matter how wide the cluster. Repartitioning the
  * pre-amplification rows is cheap by construction (the exchange moves
  * 1/B of the downstream row count); at real scale the scan already
  * has more splits than cores and this is a no-op. */
object Rebalance {
  def forAmplification(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (df.rdd.getNumPartitions < sc.defaultParallelism)
      df.repartition(sc.defaultParallelism)
    else df
  }
}
