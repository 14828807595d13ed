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
}
