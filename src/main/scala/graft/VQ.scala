package graft
import org.apache.spark.sql.SparkSession
object VQ { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions","8")
    .config("spark.sql.session.timeZone","UTC")
    .config("spark.sql.extensions","graft.spark.GraftExtensions")
    .config("spark.ui.enabled","false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  println("[vq] start")
  val t0 = System.nanoTime()
  println("[vq] rows=" + SparkEntry.queries("q_table_catalog_service")(spark, "/root/testdata/sf0.01").count() + f" in ${(System.nanoTime()-t0)/1e9}%.2f s")
  spark.stop(); sys.exit(0)
}}
