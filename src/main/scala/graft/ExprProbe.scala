package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: time the similarity expression pipeline piecewise (which
  * sub-expression of the LSH corpus projection is hot). */
object ExprProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val emb = Tables.load(spark, sfDir, "embeddings")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    val planes = Similarity.hyperplanes(6, 64, 42L)
    val norm = emb.repartition(32)
      .withColumn("_n", Similarity.l2Norm(col("embedding")))
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          when(col("_n") > 0.0, x.cast("double") / col("_n")).otherwise(0.0)).as("_e"))
    time("normalize-only") {
      norm.write.format("noop").mode("overwrite").save(); 0L
    }
    time("normalize+1dot") {
      norm.withColumn("_d", Similarity.dot(col("_e"), typedlit(planes.head)))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("normalize+bucket6") {
      norm.withColumn("_b", Similarity.lshBucket(col("_e"), planes))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    spark.stop()
  }
}
