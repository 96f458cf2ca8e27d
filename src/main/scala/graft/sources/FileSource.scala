package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources beyond parquet (S1 surface breadth): CSV and
  * JSON-lines with EXPLICIT schemas — inference requires an extra full
  * pass over the data and silently drifts types between runs, both
  * unacceptable at 100 TB. `FAILFAST` surfaces corrupt rows instead of
  * nulling them; relax to `PERMISSIVE` + `columnNameOfCorruptRecord`
  * when quarantining bad rows into a side output is preferred.
  *
  * Both formats split by file (CSV additionally by range when
  * uncompressed), so partition parallelism comes from the file layout;
  * keep shards ~128-256 MB (see GraftSession scan sizing).
  */
object FileSource {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)
}
