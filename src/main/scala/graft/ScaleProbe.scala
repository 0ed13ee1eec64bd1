package graft

import graft.operators.{Dedup, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence probe: synthesize a documents corpus one decade beyond
  * the largest driver scale factor (10× sf0.1 = 50k docs) and measure the
  * shingle-blocked dedup family (d2 jaccard, d7 containment, d3
  * minhash-LSH, p7 quality survivors) plus the blocked-candidate count on
  * BOTH corpora — local evidence that the df-cap/minShared blocking knobs
  * hold where per-row work, not fixed overhead, dominates. Results are
  * recorded in SCALE.md / BASELINE.md.
  *
  * Synthesis (deterministic, no RNG, fully distributed): the decade corpus
  * is TEN DISJOINT SHARDS, each statistically identical to sf0.1 — shard 0
  * is the original, shards 1-9 suffix every token with the shard number.
  * Within a shard the token co-occurrence structure, shingle-df profile,
  * and the corpus's real near-duplicate pairs replicate exactly; across
  * shards no shingle ever collides. That is what a 10× ORGANIC corpus
  * looks like to shingle blocking (10× the shingle mass at the same df
  * distribution, 10× the true pairs). The tempting alternative — remixing
  * the same token streams into new documents — was measured and rejected:
  * the driver corpus's vocabulary is small, so re-drawn token runs push
  * 90%+ of shingles over the df cap and the probe measures a pathological
  * boilerplate corpus instead of a bigger organic one (that regime is the
  * documented containmentPairs caveat, not the scaling question).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
  *        sbt "runMain graft.ScaleProbe"
  * Prints one JSON line per corpus with counts and per-op seconds.
  */
object ScaleProbe {

  /** 10 disjoint sf0.1-equivalent shards (token-suffix isolation). The id
    * stride is derived from the INPUT's max doc_id (not a hard-coded
    * constant), so the "ten disjoint shards" invariant holds for any SF
    * directory the probe is pointed at — a fixed stride would silently
    * collide shards once source ids exceed it.
    */
  def synthesizeDecade(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val stride = 1L + base.agg(max(col("doc_id"))).head.getLong(0)
    val shards = base
      .select(col("doc_id"), split(col("text"), " ").as("t"),
        explode(sequence(lit(1L), lit(9L))).as("c"))
      .select((col("doc_id") + col("c") * lit(stride)).as("doc_id"),
        array_join(
          transform(col("t"), tok => concat(tok, col("c").cast("string"))),
          " ").as("text"))
    base.unionByName(shards)
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def profile(label: String, docs: DataFrame): String = {
    val nDocs = docs.count()
    // candidate volume through the shared blocking chain (d2/d7's input)
    val (nCands, tBlock) = timed(
      Dedup.blockedIdPairs(Dedup.withShingles(docs, 3), maxDf = 20, minShared = 3).count())
    val (nJac, tJac) = timed(Dedup.jaccardPairs(docs).count())
    val (nCont, tCont) = timed(Dedup.containmentPairs(docs).count())
    val (nMh, tMh) = timed(Dedup.minhashPairs(docs, threshold = 0.6).count())
    val (nSurv, tP7) = timed(
      Pipeline.bestQualitySurvivors(docs,
        Dedup.jaccardPairs(docs).select("a_id", "b_id")).count())
    f"""{"corpus":"$label","n_docs":$nDocs,"blocked_candidates":$nCands,""" +
      f""""block_sec":$tBlock%.2f,"d2_pairs":$nJac,"d2_sec":$tJac%.2f,""" +
      f""""d7_pairs":$nCont,"d7_sec":$tCont%.2f,"d3_pairs":$nMh,"d3_sec":$tMh%.2f,""" +
      f""""p7_survivors":$nSurv,"p7_sec":$tP7%.2f}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val organic = spark.read.parquet(s"$sfDir/documents.parquet")
    // materialize the decade corpus to parquet so every op reads it the way
    // it reads the driver corpus (scan-rooted plans, no recompute of synth)
    val dir = java.nio.file.Files.createTempDirectory("graft-decade").toString + "/documents"
    synthesizeDecade(organic).write.mode("overwrite").parquet(dir)
    val decade = spark.read.parquet(dir)

    // warm-up: JIT/codegen on the small corpus
    Dedup.jaccardPairs(organic).count()
    println(profile("sf0.1", organic))
    println(profile("sf0.1x10", decade))
    spark.stop()
  }
}
