package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink surface beyond parquet + ARFF: ORC, headered CSV,
  * and JSON-lines, with the option sets a 100 TB ingest actually needs
  * pinned as defaults rather than rediscovered per job:
  *
  *  - **CSV**: explicit schema only (schema inference is a full extra
  *    pass over the data — never at scale), `FAILFAST` by default so a
  *    malformed row kills the job with context instead of silently
  *    nulling columns, `multiLine` off (a multiline CSV is not
  *    splittable — one file becomes one task).
  *  - **JSONL**: explicit schema only (same inference economics), one
  *    object per line (splittable; a pretty-printed JSON array is
  *    not), `FAILFAST` by default.
  *  - **ORC**: columnar twin of parquet — predicate pushdown and
  *    column pruning work the same way and are spec-asserted
  *    (FormatsSpec) so a regression in either shows up as a plan
  *    diff, not a 100× scan.
  *  - **Partitioned parquet**: `partitionBy` directory layout, the
  *    coarse pruning lever: a filter on the partition column must
  *    show up as `PartitionFilters` (pruned file listing), reading
  *    none of the other directories.
  *
  * All readers return plain DataFrames — everything downstream
  * (operators, oracle queries) is source-agnostic.
  */
object Formats {

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      failFast: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("multiLine", "false")
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType,
      failFast: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet: one directory per distinct value
    * of `partitionCol`. Keep the column LOW-cardinality (source, date,
    * lang — not doc_id): each partition is at least one file, and a
    * million tiny files is its own scale failure. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
