package graft.spark

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Materialization seam for the graph tables (north rule: "materializes the
  * graph as partitioned (subj, pred, obj) Iceberg tables").
  *
  * The sandbox ships no Iceberg runtime jars (SURVEY.md §7.4), so the
  * default binding is parquet with Iceberg-layout partitioning + the
  * Resume manifest standing in for snapshot metadata. Every writer in the
  * pipeline goes through this trait, so an Iceberg deployment implements it
  * once against a catalog table name:
  *
  *  - `write`              → `df.writeTo(table).using("iceberg").createOrReplace()`
  *  - `overwritePartitions`→ `df.writeTo(table).overwritePartitions()`
  *  - `read`               → `spark.table(table)`
  *
  * and gains real snapshot isolation + atomic partition replacement; the
  * manifest-based Resume then degrades gracefully into a redundant (but
  * still idempotent) progress record.
  */
trait TableIO {
  /** Full-table overwrite, partitioned by `partitionCols`. */
  def write(df: DataFrame, table: String, partitionCols: Seq[String]): Unit

  /** Replace ONLY the partitions present in `df` (dynamic overwrite) —
    * the idempotent-retry primitive Resume builds on.
    */
  def overwritePartitions(df: DataFrame, table: String, partitionCols: Seq[String]): Unit

  def read(spark: SparkSession, table: String): DataFrame
}

/** Parquet binding: `table` is a directory path. */
final class ParquetTableIO extends TableIO {
  override def write(df: DataFrame, table: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(table)

  override def overwritePartitions(df: DataFrame, table: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(table)

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(table)
}

object TableIO {
  val default: TableIO = new ParquetTableIO
}
