package graft.etl.binary

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal sBPF/eBPF instruction utilities for the opcode-stats pipeline
  * (reference: /root/reference/src/bin/solana-opcode-stats/main.rs:84-107;
  * it delegates ELF loading to solana_rbpf and then walks `.text` in 8-byte
  * instruction slots, 16 for LD_DW_IMM).
  *
  * Everything here derives from the public eBPF ISA encoding (opcode byte =
  * 3-bit class | source bit | 4-bit operation; LDDW 0x18 is a double-slot
  * instruction) and the public ELF64 object format.
  */
object Sbpf {

  final val LdDwImm = 0x18

  /** Opcodes of the instruction stream: 8-byte slots, LDDW consumes 16 B.
    * Trailing partial slots are ignored. */
  def opcodes(text: Array[Byte]): Iterator[Int] = new Iterator[Int] {
    private var pos = 0
    override def hasNext: Boolean = pos + 8 <= text.length
    override def next(): Int = {
      val op = text(pos) & 0xff
      pos += (if (op == LdDwImm) 16 else 8)
      op
    }
  }

  /** `.text` section of an ELF64 little-endian image; falls back to the whole
    * buffer when the input is not a parseable ELF (the reference rejects such
    * inputs via rbpf; we keep them, which only matters for synthetic stubs). */
  def textSection(elf: Array[Byte]): Array[Byte] = {
    try {
      if (elf.length < 64 || elf(0) != 0x7f || elf(1) != 'E' || elf(2) != 'L' || elf(3) != 'F')
        return elf
      val b = ByteBuffer.wrap(elf).order(ByteOrder.LITTLE_ENDIAN)
      val shoff = b.getLong(0x28)
      val shentsize = b.getShort(0x3a).toInt & 0xffff
      val shnum = b.getShort(0x3c).toInt & 0xffff
      val shstrndx = b.getShort(0x3e).toInt & 0xffff
      if (shoff <= 0 || shnum == 0 || shstrndx >= shnum) return elf
      def section(i: Int): (Int, Long, Long) = { // (name off, offset, size)
        val base = (shoff + i.toLong * shentsize).toInt
        (b.getInt(base), b.getLong(base + 0x18), b.getLong(base + 0x20))
      }
      val (_, strOff, strSize) = section(shstrndx)
      def name(nameOff: Int): String = {
        val start = (strOff + nameOff).toInt
        var end = start
        while (end < elf.length && end < strOff + strSize && elf(end) != 0) end += 1
        new String(elf, start, end - start, "US-ASCII")
      }
      (0 until shnum).iterator.map(section).collectFirst {
        case (n, off, size) if name(n) == ".text" &&
          off + size <= elf.length && size > 0 =>
          java.util.Arrays.copyOfRange(elf, off.toInt, (off + size).toInt)
      }.getOrElse(elf)
    } catch { case _: RuntimeException => elf }
  }

  /** Mnemonic derived from the public eBPF opcode encoding (NOT a copy of
    * the reference's lookup table): class | size/mode or op | source. */
  def mnemonic(op: Int): String = {
    val cls = op & 0x07
    cls match {
      case 0 | 1 | 2 | 3 => // LD / LDX / ST / STX — mode | size | class
        val clsNames = Array("ld", "ldx", "st", "stx")
        val clsName = clsNames(cls)
        val size = (op >> 3) & 0x03 match {
          case 0 => "w"; case 1 => "h"; case 2 => "b"; case 3 => "dw"
        }
        val mode = (op >> 5) & 0x07 match {
          case 0 => "imm"; case 1 => "abs"; case 2 => "ind"; case 3 => "mem"
          case 6 => "xadd"; case m => s"m$m"
        }
        s"$clsName$size $mode"
      case 4 | 7 => // ALU32 / ALU64 — op | source | class
        val width = if (cls == 4) "32" else "64"
        val src = if ((op & 0x08) != 0) "reg" else "imm"
        val alu = (op >> 4) & 0x0f match {
          case 0x0 => "add"; case 0x1 => "sub"; case 0x2 => "mul"; case 0x3 => "div"
          case 0x4 => "or"; case 0x5 => "and"; case 0x6 => "lsh"; case 0x7 => "rsh"
          case 0x8 => "neg"; case 0x9 => "mod"; case 0xa => "xor"; case 0xb => "mov"
          case 0xc => "arsh"; case _ => "end"
        }
        if (alu == "neg") s"$alu$width" else s"$alu$width $src"
      case 5 | 6 => // JMP / JMP32
        val width = if (cls == 6) "32" else ""
        val src = if ((op & 0x08) != 0) "reg" else "imm"
        (op >> 4) & 0x0f match {
          case 0x0 => "ja"
          case 0x8 => "call"
          case 0x9 => "exit"
          case j =>
            val cond = j match {
              case 0x1 => "jeq"; case 0x2 => "jgt"; case 0x3 => "jge"; case 0x4 => "jset"
              case 0x5 => "jne"; case 0x6 => "jsgt"; case 0x7 => "jsge"
              case 0xa => "jlt"; case 0xb => "jle"; case 0xc => "jslt"; case 0xd => "jsle"
              case other => s"j$other"
            }
            s"$cond$width $src"
        }
      case _ => f"unknown_0x$op%02x"
    }
  }
}
