package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Extension registry: the training-data-pipeline operators
  * (SURVEY.md §7.2 M5) — dedup, similarity search, text analysis, and
  * event/stream rollups — each with a DuckDB oracle whose SQL is
  * generated from the same constants as the Spark plan, so the two
  * stay structurally in lockstep.
  *
  * Determinism notes (same rules as [[Registry]]):
  *  - all hashing is md5 over explicit strings (no murmur3/hashCode);
  *  - embeddings are quantized to BIGINT before any arithmetic, so dot
  *    products are exact integer math; cosine/ratios are derived with an
  *    identical expression shape in Spark and the oracle;
  *  - every query ends in a total ORDER BY;
  *  - the documents fixture has no duplicate texts, so dedup queries
  *    synthesize duplicates in-query (UNION ALL of a shifted copy) —
  *    deterministically, mirrored in the oracle.
  */
object RegistryExt
    extends RegistryDedup with RegistryIndex with RegistryTrainPrep
    with RegistryText with RegistryEvents with RegistryMultimodal
    with RegistryStreaming {

  val queries: Map[String, Q] =
    dedup ++ similarity ++ index ++ text ++ events ++ streaming ++
      multimodal ++ trainprep
  val oracles: Map[String, String] =
    dedupOracles ++ similarityOracles ++ indexOracles ++ textOracles ++
      eventsOracles ++ streamingOracles ++ multimodalOracles ++
      trainprepOracles
}

