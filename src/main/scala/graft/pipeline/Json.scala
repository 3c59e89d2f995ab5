package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession, Encoders}
import org.apache.spark.sql.functions._
import graft.model.KDoc

/** JSON document sink/source (ref SURVEY.md A3: Document.to_json/from_json,
  * kazu/data/__init__.py:514-661). The reference pins a cattrs field layout;
  * we own our canonical schema (the KDoc case-class encoder schema) and
  * guarantee a lossless round-trip — structural comparison is what our
  * goldens use, per SURVEY A3 guidance.
  */
object Json {

  val schema = Encoders.product[KDoc].schema

  def toJson(docs: Dataset[KDoc]): Dataset[String] = docs.toDF().toJSON

  def fromJson(spark: SparkSession, lines: Dataset[String]): Dataset[KDoc] = {
    import spark.implicits._
    lines.select(from_json($"value", schema).as("doc"))
      .select("doc.*")
      .as[KDoc]
  }

  def writeJson(docs: Dataset[KDoc], path: String): Unit =
    toJson(docs).write.mode("overwrite").text(path)

  def readJson(spark: SparkSession, path: String): Dataset[KDoc] = {
    import spark.implicits._
    fromJson(spark, spark.read.text(path).as[String])
  }
}
