package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.Classifiers

/** Spark-native restatement of the reference's full study pipeline
  * (EP1 trace, SURVEY.md §3): wide expression matrix (TSV) → melt →
  * metadata enrichment (illness / platform / technology classification) →
  * dimension records → key-resolved fact rows with idempotent anti-join
  * dedup.
  *
  * Where the reference streams pandas chunks into SQL Server MERGEs
  * (Scripts/python/enhanced_main_etl.py:375-996), this is one declarative
  * plan: the TSV scan parallelizes by file split, the melt is a Catalyst
  * Expand, dims are broadcast for key resolution, and the idempotency
  * anti-join replaces the staging PK. At 100 TB the same plan holds: scans
  * scale with splits, the only shuffle is the fact-side dedup, and dim
  * lookups stay broadcast.
  */
object ExpressionPipeline {

  /** S1 ▸ chunked TSV matrix scan: col 1 = Gene, remaining columns =
    * sample accessions (reference: extract_expression_matrix_streaming,
    * Scripts/python/enhanced_main_etl.py:375-410). Header-driven schema,
    * UTF-8 fixed (reference S3 encoding detection collapses to utf-8).
    */
  def readMatrix(spark: SparkSession, tsvPath: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("inferSchema", "true")
      .option("encoding", "UTF-8")
      .csv(tsvPath)

  /** P1+P2 ▸ melt wide → long and annotate constants (reference:
    * pd.melt + rename, Scripts/python/enhanced_main_etl.py:394-406).
    */
  def melt(matrix: DataFrame, study: String, fileName: String, fileHash: String): DataFrame = {
    val sampleCols = matrix.columns.filterNot(_ == "Gene")
    matrix.unpivot(
      Array(col("Gene")),
      sampleCols.map(col),
      "sample_accession_code", "expression_value")
      .withColumnRenamed("Gene", "gene_id")
      .withColumn("study_accession_code", lit(study))
      .withColumn("file_name", lit(fileName))
      .withColumn("file_hash", lit(fileHash))
  }

  /** C6 ▸ sample-dimension records from the metadata samples map:
    * illness classification (C1, override beats rule) + platform parse
    * (C2) + manufacturer (C3) + technology (C4).
    * `samples` columns: sample_accession_code, refinebio_title,
    * refinebio_organism, refinebio_platform, study_technology.
    */
  def sampleDim(samples: DataFrame, overrides: Map[String, String]): DataFrame = {
    val (label, method) = Classifiers.classify(
      col("sample_accession_code"), col("refinebio_title"),
      Classifiers.illnessRules, overrides)
    val (acc, name) = Classifiers.platformParts(col("refinebio_platform"))
    samples.select(
      col("sample_accession_code"),
      col("refinebio_title").as("sample_title"),
      col("refinebio_organism").as("organism"),
      label.as("illness_label"),
      method.as("illness_method"),
      acc, name,
      Classifiers.manufacturer(col("refinebio_platform")).as("manufacturer"),
      Classifiers.technology(col("study_technology"), col("refinebio_platform"))
        .as("measurement_technology"))
  }

  /** J1/J3 ▸ key resolution: long rows ⋈ sample dim (broadcast) with
    * null-key quarantine (P3: rows whose sample didn't resolve are
    * dropped to a side channel, not silently lost — reference:
    * dropna(subset=['sample_key']), Scripts/python/enhanced_main_etl.py:963-971).
    */
  def resolveFacts(longRows: DataFrame, sampleDim: DataFrame): (DataFrame, DataFrame) = {
    val dim = sampleDim.select(
      col("sample_accession_code"),
      xxhash64(col("sample_accession_code")).as("sample_key"),
      col("illness_label"))
    val joined = longRows.join(broadcast(dim), Seq("sample_accession_code"), "left")
    val quarantine = joined.filter(col("sample_key").isNull)
    val facts = joined.filter(col("sample_key").isNotNull)
      .withColumn("gene_key", xxhash64(col("gene_id")))
      .withColumn("expression_log2_value",
        when(col("expression_value") > 0, log(2.0, col("expression_value"))))
    (facts, quarantine)
  }

  /** M5/J5 ▸ idempotent append: anti-join away rows whose
    * (file_hash, gene_id, sample) identity is already in the target —
    * replaying the same file is a no-op (reference: staging PK +
    * content-hash batch id, Scripts/database_schema.sql:211).
    */
  def idempotentAppend(target: DataFrame, incoming: DataFrame): DataFrame = {
    val keys = Seq("file_hash", "gene_id", "sample_accession_code")
    incoming.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
  }
}
