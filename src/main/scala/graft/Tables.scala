package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table loader (TESTDATA.md): one parquet file per table under
  * the scale-factor directory the driver passes in. */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
