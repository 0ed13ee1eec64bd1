package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * decoded/feature-extracted in batched partition passes.
  *
  * The decode step itself is a STUB — image/audio codecs are not available in
  * this environment — but everything Spark-side is real and tested: the
  * schema (binary payload + struct metadata), the partition-batched execution
  * shape (mapPartitions over an iterator, the JVM analogue of a pandas-batch
  * UDF: decode amortizes per-batch setup, never per-row), and the
  * deterministic feature contract. Swapping [[FeatureExtractor.stub]] for a
  * real codec changes one function, no plan shape.
  *
  * At 100 TB: payloads dominate row size, so operators project them away as
  * early as possible (`features` drops the payload right after extraction),
  * and the scan never shuffles — feature extraction is a narrow map.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(media_id: Long, kind: String,
                               payload: Array[Byte], width: Int, height: Int,
                               format: String)

  /** Extracted features: fixed-dim double vector per media row. */
  final case class MediaFeatures(media_id: Long, kind: String, dim: Int,
                                 features: Array[Double])

  /** Deterministic media corpus derived from the documents table: payload =
    * md5(text) bytes (a stand-in for real image/audio bytes), metadata from
    * the doc row. Purely column-level — reproducible on any engine.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      to_binary(md5(col("text")), lit("hex")).as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      lit("stub/v1").as("format"))

  /** The decode/feature-extract stub: nibble histogram of the payload bytes
    * (16 bins) — deterministic, cheap, and shaped exactly like a real
    * embedding extraction (bytes in, fixed-dim vector out). A real
    * implementation would decode pixels/samples here instead.
    */
  object FeatureExtractor {
    val Dim = 16

    def stub(payload: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](Dim)
      payload.foreach { b =>
        hist((b >> 4) & 0xF) += 1.0
        hist(b & 0xF) += 1.0
      }
      hist
    }
  }

  /** Batched feature extraction: one extractor "session" per partition
    * (mapPartitions), rows streamed through it — the execution shape a real
    * codec needs (model load / codec init once per batch, not per row).
    */
  def features(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (codec/model handle)
        rows.map { case (id, kind, payload) =>
          MediaFeatures(id, kind, FeatureExtractor.Dim, FeatureExtractor.stub(payload))
        }
      }
  }

  /** Resize stub: maps a payload to a fixed target "resolution" by
    * deterministic byte bucketing (averaging each bucket) — the plumbing of
    * a real image resize (payload in, smaller payload + updated metadata
    * out) with the codec swapped for arithmetic. Batched like [[features]].
    */
  def resize(spark: SparkSession, media: DataFrame, targetBytes: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("width"), col("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, w, h) =>
          val out = new Array[Byte](math.min(targetBytes, payload.length))
          if (out.nonEmpty) {
            val bucket = payload.length.toDouble / out.length
            var i = 0
            while (i < out.length) {
              val from = (i * bucket).toInt
              val until = math.max(((i + 1) * bucket).toInt, from + 1)
              var sum = 0L
              var j = from
              while (j < until && j < payload.length) { sum += payload(j) & 0xFF; j += 1 }
              out(i) = (sum / math.max(j - from, 1)).toByte
              i += 1
            }
          }
          (id, out, out.length, w, h)
        }
      }
      .toDF("media_id", "resized", "n_bytes", "orig_width", "orig_height")
  }

  /** 29-bit gradient perceptual hash of a payload's leading 16-byte grid —
    * the aHash/dHash family re-expressed over the stub byte grid: bit i
    * (i < 15) is the adjacent-byte gradient b(i) > b(i+1) (classic dHash),
    * bits 15..28 are the stride-2 gradients b(i) > b(i+2) (a second,
    * longer-range gradient ring in place of aHash's global-mean compare,
    * whose bits all flip together when one byte moves the mean — local
    * comparisons keep a single-byte perturbation's Hamming damage ≤ 2).
    * A real image pHash replaces the byte grid with a decoded/resized
    * luminance grid; the bit construction and everything downstream
    * (banding, Hamming verify, CC collapse) are unchanged.
    *
    * Pure column arithmetic over hex(payload) — codegen'd built-ins,
    * reproducible bit-for-bit on any engine (the m4 oracle recomputes it
    * in SQL).
    */
  def perceptualHash(payload: Column): Column = {
    val hx = lower(hex(payload))
    def b(i: Int): Column = conv(substring(hx, 2 * i + 1, 2), 16, 10).cast("int")
    val bits =
      (0 until 15).map(i => (b(i) > b(i + 1), i)) ++
        (0 until 14).map(i => (b(i) > b(i + 2), 15 + i))
    bits.map { case (c, idx) => when(c, lit(1L << idx)).otherwise(lit(0L)) }
      .reduce(_ + _)
  }

  /** (offset, width) of each pigeonhole band: the `totalBits` hash bits
    * partitioned EXACTLY across `bands` bands (widths differ by at most 1,
    * e.g. 29 bits / 7 bands → 5,4,4,4,4,4,4). A uniform rounded-up width
    * would push the last band past the top bit, giving it an all-zero key
    * every row shares — the banded self-join would silently degenerate to a
    * full cross product. Exact partitioning keeps the pigeonhole guarantee
    * (≤ bands−1 flips leave some band untouched) AND every band
    * discriminating. Spec-pinned for all legal band counts.
    */
  private[graft] def bandLayout(totalBits: Int, bands: Int): Seq[(Int, Int)] = {
    require(bands >= 1 && bands <= totalBits, s"bands must be in [1, $totalBits]")
    val widths = {
      var remaining = totalBits
      (0 until bands).map { i =>
        val w = (remaining + (bands - i) - 1) / (bands - i)
        remaining -= w
        w
      }
    }
    widths.scanLeft(0)(_ + _).init.zip(widths)
  }

  /** Media near-duplicate pairs by perceptual hash: all (a, b) with
    * Hamming(pHash(a), pHash(b)) ≤ maxHamming, blocked by the SimHash
    * pigeonhole — the hash splits into maxHamming+1 bands, and two hashes
    * within the Hamming ball must agree EXACTLY on at least one band, so
    * the banded equi-join has perfect recall and is never all-pairs.
    * Pairs dedup as two longs; the hash column re-joins for the
    * bit_count verify (the d4 shape over media ids).
    *
    * Compose with Dedup.dupClusters for the canonical-per-cluster media
    * dedup pipeline (the v5 composition with pHash in place of
    * embeddings) — registered as m4.
    */
  def mediaNearDupPairs(media: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 6,
      s"maxHamming must be in [0, 6] (29-bit hash), got $maxHamming")
    val bands = maxHamming + 1
    val layout = bandLayout(29, bands)
    val ph = media.select(col("media_id"), perceptualHash(col("payload")).as("ph"))
      .repartition(col("media_id"))
    val banded = ph.select(col("media_id"),
        explode(array(layout.zipWithIndex.map { case ((off, w), bd) =>
          struct(lit(bd).as("band"),
            shiftright(col("ph"), off)
              .bitwiseAND(lit((1L << w) - 1)).as("key"))
        }: _*)).as("bk"))
      .select(col("media_id"), col("bk.band"), col("bk.key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
      .join(ph.select(col("media_id").as("a_id"), col("ph").as("pa")), "a_id")
      .join(ph.select(col("media_id").as("b_id"), col("ph").as("pb")), "b_id")
      .select(col("a_id"), col("b_id"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Frame/sample subsampling stub: deterministic stride over the payload —
    * the plumbing for "take every Nth frame" without a codec.
    */
  /** PAYLOAD-ENTROPY QUALITY GATE — the corrupt/blank-media detector: the
    * Shannon entropy of each payload's nibble distribution, flagging
    * degenerate payloads (a blank frame, a zero-filled ingest truncation,
    * a stuck encoder all collapse to a few symbols; real compressed media
    * bytes are near-uniform). The byte-level twin of t3's text-quality
    * heuristics, and the multimodal family's first per-row statistical
    * gate.
    *
    * Cross-engine: symbol counts are EXACT integers read off the hex
    * rendering (length-difference per symbol — a flat 16-term codegen'd
    * expression, no UDF, no explode); the only floats are the final
    * −(c/n)·ln(c/n) terms whose libm ulp is absorbed by the round-4
    * output, and the flag derives from the ROUNDED value (the c8 rule).
    * One narrow scan-bound projection: no join, no shuffle.
    */
  def mediaEntropy(media: DataFrame, lowThreshold: Double = 2.0): DataFrame = {
    val hx = lower(hex(col("payload")))
    val n = length(hx).cast("double")
    val entropy = "0123456789abcdef".map { ch =>
      val c = (length(hx) - length(replace(hx, lit(ch.toString), lit(""))))
        .cast("double")
      when(c > 0, -(c / n) * log(c / n)).otherwise(lit(0.0))
    }.reduce(_ + _)
    media.select(col("media_id"), round(entropy, 4).as("entropy"))
      .withColumn("low_entropy", col("entropy") < lowThreshold)
      .orderBy("media_id")
  }

  /** Media INTEGRITY gate — the structural pre-decode screen an ingest
    * pipeline runs before paying for any codec: dimension sanity
    * (positive width/height — NULL counts corrupt, the e13 null rule:
    * "unknown" is not "valid"), payload length against the format's
    * expected byte count (truncated uploads), and a kind whitelist
    * (unroutable rows can't pick a decoder). One combine-safe aggregate
    * pass over a narrow projection (the payload contributes only its
    * length — bytes never leave the scan), one summary row out.
    *
    * Per-check counts are INDEPENDENT (a row can fail several);
    * `n_quarantined` counts rows failing ≥ 1 check — the e13 invariant
    * that every row lands in exactly one sink holds against
    * `n_good + n_quarantined = n_rows`.
    */
  def integrityGate(media: DataFrame, expectedPayloadBytes: Int = 16,
                    kinds: Seq[String] = Seq("image", "audio", "video")): DataFrame = {
    require(expectedPayloadBytes > 0 && kinds.nonEmpty, "gate config invalid")
    val dimsOk = coalesce(col("width") > 0 && col("height") > 0, lit(false))
    val payloadOk = coalesce(
      length(col("payload")) === expectedPayloadBytes, lit(false))
    val kindOk = coalesce(col("kind").isInCollection(kinds), lit(false))
    val good = dimsOk && payloadOk && kindOk
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    media.agg(
      count(lit(1)).as("n_rows"),
      cnt(good).as("n_good"),
      cnt(!dimsOk).as("n_bad_dims"),
      cnt(!payloadOk).as("n_bad_payload"),
      cnt(!kindOk).as("n_bad_kind"),
      cnt(!good).as("n_quarantined"))
  }

  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        (id, payload.zipWithIndex.collect { case (b, i) if i % stride == 0 => b })
      }
      .toDF("media_id", "sampled")
      .select(col("media_id"), length(col("sampled")).as("n_sampled"))
  }
}
