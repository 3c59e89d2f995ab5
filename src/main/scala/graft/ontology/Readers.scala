package graft.ontology

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ontology source readers (ref SURVEY.md A6): the reference ships 24 parser
  * classes (kazu/ontology_preprocessing/parsers.py:62-1709) that all
  * normalize a source file into the same long/thin frame
  * `[IDX, DEFAULT_LABEL, SYN, MAPPING_TYPE]` (base.py:725-743). Here that is
  * one generic reader per physical format producing the `ontology_raw`
  * shape; source-specific column wrangling is a column-mapping config, not a
  * class hierarchy. Parquet sources map 1:1 to the reference's
  * ChemblParquetOntologyParser (parsers.py:1132).
  */
object OntologyReaders {

  final case class ColumnMapping(
      idx: String,
      defaultLabel: String,
      syn: String,
      mappingType: Option[String] = None // literal "exactSyn" if absent
  )

  private def normalize(
      df: DataFrame,
      parserName: String,
      entityClass: String,
      m: ColumnMapping
  ): DataFrame = {
    val mt = m.mappingType.map(col).getOrElse(lit("exactSyn"))
    df.select(
        lit(parserName).as("parserName"),
        lit(entityClass).as("entityClass"),
        col(m.idx).cast("string").as("idx"),
        coalesce(col(m.defaultLabel).cast("string"), col(m.idx).cast("string"))
          .as("defaultLabel"),
        col(m.syn).cast("string").as("syn"),
        mt.cast("string").as("mappingType"))
      .filter(col("syn").isNotNull && col("idx").isNotNull)
      .distinct()
  }

  /** Tabular source (csv/tsv, ref TabularOntologyParser). */
  def fromCsv(spark: SparkSession, path: String, parserName: String,
      entityClass: String, mapping: ColumnMapping,
      delimiter: String = "\t"): DataFrame =
    normalize(spark.read.option("header", "true").option("sep", delimiter)
      .csv(path), parserName, entityClass, mapping)

  /** JSON-lines source (ref JsonLinesOntologyParser). Synonym columns may be
    * arrays → exploded to one row per synonym. */
  def fromJsonLines(spark: SparkSession, path: String, parserName: String,
      entityClass: String, mapping: ColumnMapping,
      synIsArray: Boolean = false): DataFrame = {
    val raw = spark.read.json(path)
    val df = if (synIsArray) raw.withColumn(mapping.syn, explode(col(mapping.syn)))
             else raw
    normalize(df, parserName, entityClass, mapping)
  }

  /** Parquet source (ref ChemblParquetOntologyParser, parsers.py:1132). */
  def fromParquet(spark: SparkSession, path: String, parserName: String,
      entityClass: String, mapping: ColumnMapping): DataFrame =
    normalize(spark.read.parquet(path), parserName, entityClass, mapping)

  /** In-memory rows (DummyParser analogue, kazu/tests/utils.py:88-120). */
  def fromRows(spark: SparkSession, rows: Seq[OntologyRow]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** The default-label rows must also exist as synonym rows
    * (ref base.py behaviour): ensure by unioning them in. When the default
    * label ALREADY exists as an explicit synonym row, the explicit row's
    * mappingType wins — resolved with a deterministic aggregate, not
    * dropDuplicates (which keeps an arbitrary row per partition order and
    * would make the surviving mappingType, hence LinkingCandidate
    * mappingTypes, nondeterministic run-to-run). */
  def withDefaultLabelSynonyms(ontologyRaw: DataFrame): DataFrame =
    ontologyRaw.unionByName(
      ontologyRaw.select(col("parserName"), col("entityClass"), col("idx"),
        col("defaultLabel"), col("defaultLabel").as("syn"),
        lit("defaultLabel").as("mappingType")).distinct()
    ).groupBy("parserName", "idx", "syn")
      .agg(
        // entityClass/defaultLabel are functionally dependent on
        // (parserName, idx) in a well-formed ontology, but independent
        // min() aggregates would CHIMERA a malformed one (entityClass from
        // one source row, defaultLabel from another) — aggregate them as
        // one struct so the surviving pair always comes from a single row,
        // while staying deterministic (min over the struct ordering)
        min(struct(col("entityClass"), col("defaultLabel"))).as("_row"),
        // explicit synonym rows sort before the planted "defaultLabel"
        // tag only by accident of name — order explicitly: prefer any
        // NON-planted type, then break remaining ties lexicographically
        min(when(col("mappingType") =!= "defaultLabel", col("mappingType")))
          .as("explicitType"),
        min(col("mappingType")).as("anyType"))
      .select(col("parserName"), col("_row.entityClass").as("entityClass"),
        col("idx"), col("_row.defaultLabel").as("defaultLabel"), col("syn"),
        coalesce(col("explicitType"), col("anyType")).as("mappingType"))
}
