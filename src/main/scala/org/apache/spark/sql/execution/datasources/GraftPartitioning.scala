package org.apache.spark.sql.execution.datasources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.StructType

/** Narrow bridge to `PartitioningUtils.parsePartitions`, which is
  * `private[datasources]`. Graft's scan builds its partition spec
  * explicitly from snapshot metadata (several layout roots per scan —
  * zero-copy forks and registered tables read files under other
  * tables' data dirs), which the public single-`basePath` option
  * cannot express.
  */
object GraftPartitioning {

  def parse(
      leafDirs: Seq[Path],
      basePaths: Set[Path],
      partitionSchema: StructType,
      timeZoneId: String): PartitionSpec =
    PartitioningUtils.parsePartitions(
      leafDirs,
      typeInference = false,
      basePaths = basePaths,
      userSpecifiedSchema = Some(partitionSchema),
      caseSensitive = true,
      validatePartitionColumns = false,
      timeZoneId = timeZoneId,
      ignoreInvalidPartitionPaths = false)
}
