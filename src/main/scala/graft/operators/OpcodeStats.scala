package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.binary.Sbpf

/** eBPF opcode histogram (A5/G2/O1 — SURVEY.md §2.4;
  * reference: solana-opcode-stats/main.rs:84-128).
  *
  * The reference's per-program `num_programs |= 1` then summed merge is a
  * commutative monoid ≙ `countDistinct(program)`; the instruction count is a
  * plain `sum`. The explode (one program blob → many instruction rows) is a
  * typed flatMap in `mapPartitions` form via explode over a UDF'd opcode
  * array — partial aggregation (map-side combine) collapses each partition
  * to ≤256 opcode rows before the shuffle, so the shuffle volume is O(256 ×
  * partitions) regardless of program sizes.
  */
object OpcodeStats {

  private val opcodesUdf = udf((elf: Array[Byte]) =>
    if (elf == null) Array.empty[Int]
    else Sbpf.opcodes(Sbpf.textSection(elf)).toArray)

  private val mnemonicUdf = udf((op: Int) => Sbpf.mnemonic(op))

  /** (program pubkey, opcode) pairs — G2 generator. */
  def instructions(programs: DataFrame): DataFrame =
    programs.select(col("pubkey"), explode(opcodesUdf(col("elf"))).as("opcode"))

  /** Histogram ordered by opcode, zero rows omitted (O1):
    * (opcode "0x%02x", mnemonic, num_programs, num_insns). */
  def histogram(programs: DataFrame): DataFrame =
    instructions(programs)
      .groupBy(col("opcode"))
      .agg(count(lit(1)).as("num_insns"),
        countDistinct(col("pubkey")).as("num_programs"))
      .filter(col("num_insns") > 0)
      .orderBy(col("opcode"))
      .select(format_string("0x%02x", col("opcode")).as("opcode"),
        mnemonicUdf(col("opcode")).as("mnemonic"),
        col("num_programs"), col("num_insns"))
}
