package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-explicit interchange formats (ORC / JSON / CSV) alongside the
  * parquet mainline — the "another source format" surface a pipeline
  * needs at its edges (upstream drops, downstream exports).
  *
  * Reads take an EXPLICIT schema, always: schema inference is a full
  * extra scan for JSON/CSV and a footer read per file for ORC — at
  * 100 TB an inference pass is a silent second job, and inferred types
  * drift (a column of "1"s infers int today, string tomorrow). The
  * schema IS the contract; inference is for notebooks.
  *
  * CSV is restricted to flat schemas (no arrays/structs/maps — CSV
  * cannot represent them; enforced loudly rather than silently
  * stringified). ORC carries predicate pushdown + column pruning like
  * parquet (asserted in FormatsSpec). */
object Formats {

  val supported: Set[String] = Set("orc", "json", "csv")

  private def requireSupported(format: String): Unit =
    require(supported.contains(format),
      s"format must be one of $supported, got $format")

  private def requireFlatForCsv(format: String, schema: StructType): Unit =
    if (format == "csv") {
      val nested = schema.fields.filter(_.dataType match {
        case _: org.apache.spark.sql.types.ArrayType => true
        case _: org.apache.spark.sql.types.StructType => true
        case _: org.apache.spark.sql.types.MapType => true
        case _ => false
      })
      require(nested.isEmpty,
        s"CSV cannot represent nested columns: ${nested.map(_.name).toSeq}")
    }

  /** Write `df` at `path` in `format`, optionally hive-partitioned (the
    * same pruning layout as the parquet sinks). */
  def write(df: DataFrame, path: String, format: String,
      partitionBy: Seq[String] = Nil): Unit = {
    requireSupported(format)
    requireFlatForCsv(format, df.schema)
    val w = df.write.mode("overwrite").format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .option("header", "true") // csv only; ignored by orc/json
      .save(path)
  }

  /** Read `path` as `format` with the EXPLICIT `schema` — no inference
    * job, no type drift. */
  def read(spark: SparkSession, path: String, format: String,
      schema: StructType): DataFrame = {
    requireSupported(format)
    requireFlatForCsv(format, schema)
    spark.read.format(format).schema(schema)
      .option("header", "true").load(path)
  }
}
