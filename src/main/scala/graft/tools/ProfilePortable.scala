package graft.tools
import graft.Tables
import graft.operators.Corpus
import org.apache.spark.sql.SparkSession
object ProfilePortable {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    d.count()
    def time(name: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[prof] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("funnel xxhash") {
      Corpus.funnel(Corpus.clean(d, "doc_id", "text", minQuality = 0.2,
        keepLangs = Set("en", "es", "de"))).write.format("noop").mode("overwrite").save()
    }
    time("funnel portable") {
      Corpus.funnel(Corpus.clean(d, "doc_id", "text", minQuality = 0.2,
        keepLangs = Set("en", "es", "de"), portableHash = true))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
