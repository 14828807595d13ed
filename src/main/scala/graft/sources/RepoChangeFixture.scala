package graft.sources

import scala.util.Random

import graft.etl.model.RepoFileChange

/** Deterministic change-stream generator over the north-rule input table
  * (BASELINE.json input_hint): source-code repositories
  * `(repo, path, commit, lang, content)`. Batch 0 is the full snapshot (all
  * rows at commit c0); later batches modify random subsets (FIXTURES.md §2).
  */
object RepoChangeFixture {

  val Langs = Seq("scala", "python", "rust", "go", "java")

  final case class Spec(
      seed: Long = 42L,
      repos: Int = 20,
      pathsPerRepo: Int = 40,
      batches: Int = 3,
      changeFraction: Double = 0.3)

  /** (batches of changes, expected final row per (repo, path)). */
  def generate(spec: Spec): (Seq[Seq[RepoFileChange]], Map[(String, String), RepoFileChange]) = {
    val rnd = new Random(spec.seed)
    val keys = for (r <- 0 until spec.repos; p <- 0 until spec.pathsPerRepo)
      yield (s"repo-$r", s"src/f$p.${Langs(p % Langs.size)}")
    var seq = 0L
    def content(repo: String, path: String, commit: String): String = {
      val body = (0 until 5).map(i => s"line$i of $path in $repo at $commit " +
        s"w${rnd.nextInt(1000)}").mkString("\n")
      body
    }
    val batches = (0 until spec.batches).map { b =>
      val selected = if (b == 0) keys else keys.filter(_ => rnd.nextDouble() < spec.changeFraction)
      selected.map { case (repo, path) =>
        seq += 1
        val commit = f"c$b%02d-$seq%06d"
        RepoFileChange(repo, path, commit, seq,
          Langs(math.abs(path.hashCode) % Langs.size), content(repo, path, commit))
      }
    }
    val expected = batches.flatten
      .groupBy(c => (c.repo, c.path))
      .map { case (k, cs) => k -> cs.maxBy(_.commitSeq) }
    (batches, expected)
  }

  /** Write batches as parquet files under `dir` (one subdir write each —
    * the file-stream tails them in order). */
  def writeBatches(spark: org.apache.spark.sql.SparkSession,
      batches: Seq[Seq[RepoFileChange]], dir: String): Unit = {
    import spark.implicits._
    batches.zipWithIndex.foreach { case (b, i) =>
      spark.createDataset(b).toDF()
        .select("repo", "path", "commit", "commitSeq", "lang", "content")
        .coalesce(1).write.mode("append").parquet(dir)
    }
  }
}
