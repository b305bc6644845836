package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S6: config JSON source (config.py:20-35) — `config/config.json` with a
  * `gl_codes: {code: name}` map, loaded with an explicit schema (no
  * inference) and normalized to the engine's (code_type, code, name) table
  * shape so it composes with the COA pipeline output. */
object Config {

  val schema: StructType = StructType(Seq(
    StructField("gl_codes", MapType(StringType, StringType))))

  /** Raw typed load. multiLine handles pretty-printed config files. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("multiLine", "true").json(path)

  /** Map column → normalized 2-col code table (SURVEY.md §1.1 row 4). */
  def glCodes(config: DataFrame): DataFrame =
    config.select(explode(col("gl_codes")).as(Seq("code", "name")))
      .withColumn("code_type", lit("gl"))
}
