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

  /** Result of a quarantine read; call `unpersist()` once both frames
    * are consumed — the underlying parse is cached so good/quarantined
    * don't scan the input twice, and the cache must not outlive the
    * batch (a per-batch caller that never unpersists pins every ingest
    * in executor storage for the application lifetime). */
  case class QuarantineRead(good: DataFrame, quarantined: DataFrame,
                            private val raw: DataFrame) {
    def unpersist(): Unit = { raw.unpersist(); () }
  }

  /** Quarantine read: PERMISSIVE parse with the corrupt raw line
    * captured, split into (good, quarantined) frames — the production
    * posture when one bad row must not kill a 100 TB ingest but must
    * not silently vanish either (the reference's per-row try/except
    * without the silent-drop). `good` carries the declared schema;
    * `quarantined` carries the raw offending line for replay/triage. */
  def readJsonLinesQuarantine(spark: SparkSession, path: String,
                              schema: StructType): QuarantineRead = {
    val corruptCol = "_corrupt_record"
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(corruptCol,
        org.apache.spark.sql.types.StringType, nullable = true))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      // Spark requires caching/materializing before filtering on the
      // corrupt column (the parser populates it lazily per-row)
      .cache()
    val good = raw.filter(raw(corruptCol).isNull)
      .drop(corruptCol)
    val bad = raw.filter(raw(corruptCol).isNotNull)
      .select(raw(corruptCol).as("raw_line"))
    QuarantineRead(good, bad, raw)
  }
}
