package graft.llm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TickProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = Embeddings.hashedEmbeddings(docs, "doc_id", "text", 64)
        .select(col("doc_id").as("vec_id"),
          transform(col("emb"), c => c.cast("double")).as("embedding"))
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 6, 2)
      for (th <- Seq(0.80, 0.84, 0.88)) {
        val n = Similarity.semanticDup(emb, "vec_id", "embedding", th, cents).count()
        println(s"$dir th=$th pairs=$n")
      }
    }
    spark.stop()
  }
}
