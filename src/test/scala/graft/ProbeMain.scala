package graft
import org.apache.spark.sql.SparkSession
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val ds = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val t0 = System.nanoTime
      val m = graft.operators.Bpe.trainMergesLocal(ds, 5000)
      println(s"PROBE $sf merges=${m.length} secs=${(System.nanoTime-t0)/1e9}")
    }
    spark.stop()
  }
}
