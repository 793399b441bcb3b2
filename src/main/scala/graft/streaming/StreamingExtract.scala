package graft.streaming

import graft.core.RegistryIndex
import graft.model.Triple
import graft.spark.ExtractPipeline
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Turn

/** Structured-Streaming front end for the extraction stage.
  *
  * The reference is strictly batch (one document at a time, SURVEY.md §2.9);
  * the streaming obligations come from the graft: a transcripts *stream*
  * (files landing in a table directory) is extracted with the exact same
  * row-local operator — extraction is stateless per row, so the stream runs
  * in append mode with no state store. Windowed per-conversation counts ride
  * on the event-time `ts` column with a watermark for late turns.
  */
object StreamingExtract {

  /** File-stream of transcript parquet → triple stream (append-mode safe). */
  def extractStream(spark: SparkSession, inputDir: String,
                    registry: RegistryIndex = ExtractPipeline.defaultRegistry): Dataset[Triple] = {
    val turns = spark.readStream.schema(Turn.schema).parquet(inputDir)
    ExtractPipeline.extract(turns, registry)
  }

  /** Event-time windowed triple counts per conversation: 1-minute tumbling
    * windows with a 5-minute watermark (late turns beyond that are dropped,
    * deterministically).
    */
  def windowedConvCounts(spark: SparkSession, inputDir: String): DataFrame = {
    val turns = spark.readStream.schema(Turn.schema).parquet(inputDir)
      .filter(ExtractPipeline.markupFilter)
    turns
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"))
  }
}
