package graft.engine

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** OP-SRC-5 — the manifest catalog (`core.py:57-98` point, `:125-168` area,
  * read at `:303-307`): a JSON file recording what was downloaded/processed
  * per region. Catalog-sized by definition → the write side is plain
  * driver-side JSON (json4s, shipped with Spark); the read side is
  * `spark.read.json` so downstream planning can treat the feature list as
  * a (small) DataFrame.
  */
object Manifest {

  implicit private val fmts: Formats = DefaultFormats

  final case class Feature(
      region_id: String,
      start_date: String,
      end_date: String,
      geometry: String,
      unzip_sub_folders: Seq[String],
      preds: Seq[String],
      rect_regions: Map[String, Seq[Double]],
      data_file: Option[String])

  final case class Spec(
      processing_type: String,
      aggregation_type: Option[String],
      gapfilling: Boolean,
      features: Seq[Feature])

  def write(m: Spec, path: String): Unit =
    Files.writeString(Paths.get(path), Serialization.write(m))

  /** Read-modify-append (`core.py:67-98`): existing features for the same
    * region ids are replaced by the incoming ones (the reference's
    * stale-key cleanup), new ones appended.
    */
  def append(path: String, incoming: Seq[Feature]): Spec = {
    val existing =
      if (Files.exists(Paths.get(path)))
        Serialization.read[Spec](Files.readString(Paths.get(path)))
      else Spec("BoundingBox", None, gapfilling = false, Nil)
    val incomingIds = incoming.map(_.region_id).toSet
    val merged = existing.features.filterNot(f =>
      incomingIds.contains(f.region_id)) ++ incoming
    val out = existing.copy(features = merged)
    write(out, path)
    out
  }

  /** Feature list as a DataFrame (`spark.read.json` + explode). */
  def readFeatures(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(col("processing_type"), col("gapfilling"),
        explode(col("features")).as("f"))
      .select(col("processing_type"), col("gapfilling"),
        col("f.region_id").as("region_id"),
        col("f.start_date").as("start_date"),
        col("f.end_date").as("end_date"),
        col("f.geometry").as("geometry"),
        size(col("f.preds")).as("n_preds"),
        col("f.data_file").as("data_file"))
}
