package graft.operators

import java.io.{BufferedOutputStream, FileOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

import graft.etl.binary.Base58

/** Program (ELF) extraction — F8/F9 filters + K4 sink (SURVEY.md §2.2, §2.8;
  * reference: programs.rs:12-62).
  */
object Programs {

  // public Solana loader program ids (programs.rs:33-49)
  val BpfLoaderDeprecated: Array[Byte] = Base58.decode("BPFLoader1111111111111111111111111111111111")
  val BpfLoader: Array[Byte] = Base58.decode("BPFLoader2111111111111111111111111111111111")
  val BpfLoaderUpgradeable: Array[Byte] = Base58.decode("BPFLoaderUpgradeab1e11111111111111111111111")

  /** bincode enum tag of UpgradeableLoaderState::ProgramData (programs.rs:39-47):
    * 4-byte LE tag == 3; the ELF payload starts at byte 45 (4 tag + 8 slot +
    * 1 + 32 Option<Pubkey> upgrade authority). */
  final val ProgramDataTag = 3
  final val ProgramDataHeaderLen = 45

  private val tagUdf = udf((data: Array[Byte]) =>
    if (data == null || data.length < 4) -1
    else java.nio.ByteBuffer.wrap(data, 0, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)

  /** F8: non-upgradeable executables keep their whole payload;
    * F9: upgradeable ProgramData accounts contribute `data[45..]`.
    * Result: (pubkey BINARY, elf BINARY). */
  def programs(accounts: DataFrame): DataFrame = {
    val nonUpgradeable = accounts
      .filter((col("owner") === lit(BpfLoaderDeprecated) || col("owner") === lit(BpfLoader)) &&
        col("executable"))
      .select(col("pubkey"), col("data").as("elf"))
    val upgradeable = accounts
      .filter(col("owner") === lit(BpfLoaderUpgradeable) &&
        tagUdf(col("data")) === ProgramDataTag &&
        length(col("data")) > ProgramDataHeaderLen)
      // substring is 1-indexed: byte 46 onward == data[45..]
      .select(col("pubkey"), expr(s"substring(data, ${ProgramDataHeaderLen + 1})").as("elf"))
    nonUpgradeable.unionByName(upgradeable)
  }

  /** K4: write one `<base58 pubkey>.so` per program (programs.rs:54-62) —
    * distributed foreachPartition writer, local/NFS-style target dir. */
  def writeProgramsDir(programs: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    programs.select("pubkey", "elf").foreachPartition { (rows: Iterator[Row]) =>
      rows.foreach { r =>
        val name = Base58.encode(r.getAs[Array[Byte]]("pubkey"))
        val out = new BufferedOutputStream(new FileOutputStream(s"$dir/$name.so"))
        try out.write(r.getAs[Array[Byte]]("elf")) finally out.close()
      }
    }
  }

  /** K4 tar form, byte-compatible with the reference's sink: a ustar of
    * `<base58 pubkey>.so` entries, mode 0644 (programs.rs:54-62) — the
    * exact shape the opcode-stats tool consumes from stdin
    * (solana-opcode-stats/main.rs:30-53). A tar is one sequential stream,
    * so rows are pulled to the writer via `toLocalIterator` (one partition
    * in memory at a time), matching the reference's single-threaded writer;
    * use [[writeProgramsDir]] when a distributed sink is wanted. */
  def writeProgramsTar(programs: DataFrame, file: String): Unit = {
    val fos = new BufferedOutputStream(new FileOutputStream(file), 1 << 16)
    try writeProgramsTar(programs, fos) finally fos.close()
  }

  /** Stream form of [[writeProgramsTar]] (e.g. stdout — the reference writes
    * its tar to a file or stdout, programs.rs:12-30). Does NOT close `sink`. */
  def writeProgramsTar(programs: DataFrame, sink: java.io.OutputStream): Unit = {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val out = new TarArchiveOutputStream(sink)
    out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    try {
      val it = programs.select("pubkey", "elf").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val elf = r.getAs[Array[Byte]]("elf")
        val e = new TarArchiveEntry(s"${Base58.encode(r.getAs[Array[Byte]]("pubkey"))}.so")
        e.setSize(elf.length.toLong)
        e.setMode(java.lang.Integer.parseInt("644", 8)) // programs.rs:58
        out.putArchiveEntry(e)
        out.write(elf)
        out.closeArchiveEntry()
      }
      out.finish()
    } finally out.flush()
  }

  /** S10: read a programs tar back as (pubkey BINARY, elf BINARY) — the
    * stats source (solana-opcode-stats/main.rs:30-53; entry name is the
    * base58 pubkey + ".so"). Sequential by format: one task per tar,
    * parallelism across tars. */
  def readProgramsTar(spark: org.apache.spark.sql.SparkSession, paths: Seq[String]): DataFrame = {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    spark.createDataset(paths).repartition(math.max(1, paths.size))
      .mapPartitions { it =>
        val conf = new Configuration()
        it.flatMap { path =>
          val p = new Path(path)
          val tar = new TarArchiveInputStream(new java.io.BufferedInputStream(
            p.getFileSystem(conf).open(p), 1 << 16))
          new Iterator[(Array[Byte], Array[Byte])] {
            private var entry = tar.getNextEntry
            override def hasNext: Boolean = {
              while (entry != null && !entry.getName.endsWith(".so")) entry = tar.getNextEntry
              if (entry == null) { tar.close(); false } else true
            }
            override def next(): (Array[Byte], Array[Byte]) = {
              val name = entry.getName.stripSuffix(".so")
              val elf = tar.readAllBytes()
              entry = tar.getNextEntry
              (Base58.decode(name), elf)
            }
          }
        }
      }
      .toDF("pubkey", "elf")
  }
}
