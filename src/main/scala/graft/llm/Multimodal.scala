package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads travel as opaque
  * `BinaryType` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample are per-partition batch
  * operations over the binary payloads.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment) behind [[decodeStub]] — a deterministic fake that hashes
  * payload bytes into a fixed-size feature vector. Everything around it —
  * schema, batch iteration, partitioning, metadata plumbing — is the real
  * Spark-side design: at 100 TB the payloads dominate, so every operator
  * here avoids shuffling binary columns (metadata-only projections shuffle;
  * payload transforms stay map-side).
  */
object Multimodal {

  val metadataSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap a payload expression as (payload BINARY, meta STRUCT). Width /
    * height / frame count normally come from container headers; the stub
    * derives them deterministically from a caller-supplied non-negative
    * content hash (`seed`, typically `polyhash` of the source field) so the
    * values are stable AND closed-form reproducible in ANSI SQL.
    */
  def attach(payload: Column, modality: Column, seed: Column): Column =
    struct(
      payload.as("payload"),
      struct(
        modality.as("modality"),
        length(payload).cast("long").as("byte_len"),
        (pmod(seed, lit(1280)) + 64).cast("int").as("width"),
        (pmod(seed, lit(720)) + 64).cast("int").as("height"),
        (pmod(seed, lit(240)) + 1).cast("int").as("n_frames")).as("meta"))

  /** Deterministic fake "decode → feature vector": featureᵢ =
    * ((seed·(i+1)) mod 997) / 997. Closed-form (oracle-checkable) and
    * shaped exactly like a real embedding head's output. Replace with a
    * real codec via [[mapBinaryBatches]] in production.
    */
  def decodeStub(seed: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(seed * (i + 1), lit(997)).cast("double") / 997d)

  /** Resize: a metadata transform — the stub rewrites target dimensions
    * (aspect-preserving fit into a `maxDim` box) and carries the payload
    * untouched; a real codec resizes in [[mapBinaryBatches]]. Kept
    * metadata-only so a resize over 100 TB of video never shuffles or
    * rewrites payload bytes until the decode stage actually consumes them.
    */
  def resizeMeta(mm: Column, maxDim: Int): Column = {
    val w = mm.getField("meta").getField("width")
    val h = mm.getField("meta").getField("height")
    val scale = least(lit(maxDim) / greatest(w, h).cast("double"), lit(1d))
    struct(
      mm.getField("payload").as("payload"),
      struct(
        mm.getField("meta").getField("modality").as("modality"),
        mm.getField("meta").getField("byte_len").as("byte_len"),
        floor(w * scale).cast("int").as("width"),
        floor(h * scale).cast("int").as("height"),
        mm.getField("meta").getField("n_frames").as("n_frames")).as("meta"))
  }

  /** Frame sampling: explode `n` evenly-spaced frame indices from the
    * metadata frame count — a metadata-only operation (the payload column
    * is carried, not transformed; Parquet's columnar layout means unsampled
    * frames are never materialized).
    */
  def sampleFrames(df: DataFrame, mmCol: String, n: Int): DataFrame = {
    val frames = col(s"$mmCol.meta.n_frames")
    df.withColumn("frame_idx",
      explode(transform(sequence(lit(0), lit(n - 1)),
        i => (i * frames / n).cast("int"))))
  }

  /** ViT-style patch grid: one row per `patch × patch` window at `stride`
    * spacing over the image metadata — the tokenization step of an image
    * encoder, as a METADATA-ONLY explode (the payload column is carried
    * by reference; actual pixel extraction belongs in the
    * [[mapBinaryBatchesTyped]] decode stage, which consumes these
    * coordinates). Patches are emitted only where they fit entirely
    * (`x0 + patch ≤ width`, ViT convention — no ragged edge padding);
    * an image smaller than one patch yields no rows. Grid coordinates
    * come from ONE `patch_idx` explode with div/mod recovery, not a
    * nested double explode.
    */
  /** Patches along one dimension under the full-fit convention — shared
    * by [[patchGrid]] (which explodes them) and [[patchCount]] (which
    * only needs the total). Integer floor-div via double: dims < 2^31,
    * so the double is exact.
    */
  private def fitsDim(dim: Column, patch: Int, stride: Int): Column =
    when(dim >= patch,
      floor((dim - patch).cast("double") / stride).cast("int") + 1)
      .otherwise(lit(0))

  /** Number of ViT patches an image contributes WITHOUT exploding them —
    * the context-budget cost of the image for sequence packing
    * ([[graft.llm.Shaping.packByCost]]): a multimodal training sequence
    * spends one token per patch, so `text_tokens + patchCount` is the
    * document's footprint. Pure metadata arithmetic, codegen'd.
    */
  def patchCount(mmCol: Column, patch: Int, stride: Int): Column = {
    require(patch >= 1 && stride >= 1, "patch and stride must be positive")
    (fitsDim(mmCol.getField("meta").getField("width"), patch, stride) *
      fitsDim(mmCol.getField("meta").getField("height"), patch, stride))
      .cast("long")
  }

  def patchGrid(df: DataFrame, mmCol: String, patch: Int,
      stride: Int): DataFrame = {
    require(patch >= 1 && stride >= 1, "patch and stride must be positive")
    val w = col(s"$mmCol.meta.width")
    val h = col(s"$mmCol.meta.height")
    def fits(dim: Column) = fitsDim(dim, patch, stride)
    val nx = fits(w)
    val ny = fits(h)
    val n = nx * ny
    df.withColumn("__nx", nx)
      .withColumn("patch_idx",
        explode(when(n > 0, sequence(lit(0), n - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("grid_x", pmod(col("patch_idx"), col("__nx")))
      .withColumn("grid_y", floor(col("patch_idx").cast("double") /
        col("__nx")).cast("int"))
      .withColumn("x0", col("grid_x") * stride)
      .withColumn("y0", col("grid_y") * stride)
      .drop("__nx")
  }

  /** The preferred real-codec extension point: per-partition batch decode
    * that STAYS INSIDE the SQL engine. `Dataset.mapPartitions` with a row
    * encoder compiles to DeserializeToObject → MapPartitions →
    * SerializeFromObject inside the same query plan — upstream parquet
    * scans keep their columnar batches and pushed filters, AQE keeps
    * re-planning downstream stages, and rows re-enter Tungsten format
    * immediately after the decode. (PySpark's `mapInArrow` is the same
    * idea for Python workers; the Scala `Dataset.mapInArrow` overload only
    * accepts a Python-UDF column, so `mapPartitions` + encoder IS the
    * Scala-native columnar-preserving form.) One decoder context per
    * partition, amortized over its batch.
    */
  def mapBinaryBatchesTyped(df: DataFrame, mmCol: String, dim: Int)(
      decode: Array[Byte] => Array[Double]): DataFrame = {
    val outSchema = df.schema.add(StructField("features",
      ArrayType(DoubleType)))
    val payloadIdx = df.schema.fieldIndex(mmCol)
    df.mapPartitions { rows =>
      // one decoder context per partition would initialize here
      rows.map { r =>
        val mm = r.getStruct(payloadIdx)
        val payload = mm.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq :+ decode(payload).toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** RDD-boundary fallback form of [[mapBinaryBatchesTyped]] — kept for
    * codecs that need raw RDD control (custom partitioners, explicit
    * preservesPartitioning). Crossing `df.rdd` abandons the query plan:
    * no AQE below this point and a full deserialize to GenericRow, so
    * prefer the typed form.
    */
  def mapBinaryBatches(df: DataFrame, mmCol: String, dim: Int)(
      decode: Array[Byte] => Array[Double]): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("features",
      ArrayType(DoubleType)))
    val payloadIdx = inSchema.fieldIndex(mmCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // one decoder context per partition would initialize here
      rows.map { r =>
        val mm = r.getStruct(payloadIdx)
        val payload = mm.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq :+ decode(payload).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
