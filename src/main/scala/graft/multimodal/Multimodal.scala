package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §1.2 north star): media as opaque
  * BINARY columns plus a typed metadata struct, processed in BATCHES per
  * partition — the Scala analogue of a mapInPandas pipeline: rows are
  * grouped into fixed-size batches inside each partition (no shuffle),
  * each batch goes through decode → feature-extract as one unit, and the
  * output schema is declared up front.
  *
  * The actual image/audio codecs are NOT in this environment, so
  * [[StubCodecs]] marks the decode boundary: a real deployment swaps the
  * stub for a codec call without touching the Spark plumbing (schema,
  * batching, partitioning) which is real and tested.
  */
object Multimodal {

  /** One media row: id, media kind, payload, typed metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
    width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    feature: Array[Float])

  /** Pack (id, binary) rows into the canonical media schema. */
  def pack(df: DataFrame, idCol: String, bytesCol: String, kind: String,
      width: Int = 0, height: Int = 0, sampleRate: Int = 0,
      durationMs: Long = 0L): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(bytesCol).cast("binary").as("bytes"),
      lit(width).as("width"), lit(height).as("height"),
      lit(sampleRate).as("sample_rate"), lit(durationMs).as("duration_ms"))

  /** Batched per-partition decode + feature extraction. `batchSize`
    * bounds peak decoded memory per task exactly like a mapInPandas
    * batch; partitioning is preserved (narrow transformation).
    *
    * `codec` is the injection seam a deployment swaps a real decoder
    * into (it must be serializable — it ships inside the task
    * closure); the default is the deterministic [[StubCodecs]] fake.
    * LibrarySpec's seam test injects a tracking codec through it and
    * pins the batching/schema/partition-preservation invariants
    * independently of any codec's behavior.
    */
  def extractFeatures(ds: Dataset[MediaRow], batchSize: Int = 64,
      dim: Int = 16,
      codec: (Seq[MediaRow], Int) => Seq[Array[Float]] =
        StubCodecs.decodeBatch): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one decode call per BATCH — the codec boundary
        val decoded = codec(batch, dim)
        require(decoded.length == batch.length,
          s"codec returned ${decoded.length} features for ${batch.length} rows")
        batch.zip(decoded).map { case (row, feat) =>
          MediaFeatures(row.media_id, row.kind, row.bytes.length.toLong, feat)
        }
      }
    }
  }

  /** Batched image resize through the same codec boundary as
    * [[extractFeatures]]: payloads transform per batch, metadata is
    * updated to the target dimensions, schema/partitioning unchanged
    * (narrow — no shuffle). Swap [[StubCodecs.resizeBatch]] for a real
    * image library in deployment.
    */
  def resize(ds: Dataset[MediaRow], width: Int, height: Int,
      batchSize: Int = 64): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val resized = StubCodecs.resizeBatch(batch, width, height)
        batch.zip(resized).map { case (row, bytes) =>
          row.copy(bytes = bytes, width = width, height = height)
        }
      }
    }
  }

  /** Batched perceptual hashing through the same codec boundary: one
    * 64-bit aHash per media row (narrow — no shuffle). Downstream
    * dedup bands the hash exactly like the simhash text path; swap
    * [[StubCodecs.phashBatch]] for a real decode+DCT in deployment.
    */
  def perceptualHash(ds: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[(Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val hashes = StubCodecs.phashBatch(batch)
        batch.zip(hashes).map { case (row, h) => (row.media_id, h) }
      }
    }
  }

  /** Frame sampling for "video" rows: every `everyNth` frame index up to
    * the frame count implied by duration × fps. Pure expression — the
    * generator explodes WITHOUT decoding (decode happens downstream on
    * the sampled frames only, which is the point at 100 TB).
    */
  def sampleFrames(df: DataFrame, fps: Int = 30, everyNth: Int = 10): DataFrame =
    df.withColumn("n_frames",
        (col("duration_ms") * fps / 1000).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(everyNth))))
      .drop("n_frames")
}

/** STUB codec layer — deterministic fakes standing in for image/audio
  * libraries that are not present in this container. Swap `decodeBatch`
  * for real codec calls in deployment; everything upstream/downstream is
  * real Spark plumbing.
  */
object StubCodecs {
  import Multimodal.MediaRow

  /** Deterministic fake "decode": features derived from a rolling hash
    * of the payload — stable across runs/JVMs, so tests can assert exact
    * equality while exercising the real batch path.
    */
  def decodeBatch(batch: Seq[MediaRow], dim: Int): Seq[Array[Float]] =
    batch.map { row =>
      val h = row.bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
      Array.tabulate(dim)(i => (((h >>> (i % 8 * 8)) & 0xff) / 255.0f))
    }

  /** Deterministic "perceptual" hash: the real average-hash (aHash)
    * algorithm applied to the raw payload as the fake decoded signal —
    * split the byte stream into 64 equal blocks, bit i = (block mean >
    * global mean). Unlike a cryptographic fake this is genuinely
    * LOCALITY-SENSITIVE: a small payload edit moves only the touched
    * block means, so near-identical media land within a few Hamming
    * bits — which is the property the banded dedup downstream needs.
    * A real deployment decodes to luma pixels first and hashes those;
    * everything after the decode is unchanged.
    */
  def phashBatch(batch: Seq[MediaRow]): Seq[Long] =
    batch.map { row =>
      val src = row.bytes
      if (src.isEmpty) 0L
      else {
        val n = src.length
        val means = Array.tabulate(64) { b =>
          val lo = (b.toLong * n / 64).toInt
          val hi = math.max(lo + 1, ((b + 1).toLong * n / 64).toInt)
          var s = 0L; var i = lo
          while (i < hi) { s += (src(i) & 0xff); i += 1 }
          s.toDouble / (hi - lo)
        }
        val g = means.sum / 64
        means.zipWithIndex.foldLeft(0L) { case (acc, (m, i)) =>
          if (m > g) acc | (1L << i) else acc
        }
      }
    }

  /** Deterministic fake "resize": payload re-sampled to a length
    * proportional to the target area (stride-sampled bytes — stable,
    * content-dependent, and size-monotonic like a real resize).
    */
  def resizeBatch(batch: Seq[MediaRow], width: Int,
      height: Int): Seq[Array[Byte]] =
    batch.map { row =>
      val target = math.max(1, width * height / 64)
      val src = row.bytes
      if (src.isEmpty) new Array[Byte](target)
      else Array.tabulate(target)(i => src((i.toLong * src.length / target).toInt))
    }
}
