package graft.etl.binary

/** Base58 (Bitcoin alphabet) encode/decode.
  *
  * The reference emits base58 pubkeys at its CSV edge (csv.rs:50-51) and in
  * program tar entry names (programs.rs:56). Standard public algorithm; no
  * third-party dependency (commons-codec has no base58).
  */
object Base58 {
  private val Alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val Indexes: Array[Int] = {
    val idx = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => idx(c.toInt) = i }
    idx
  }

  def encode(input: Array[Byte]): String = {
    if (input.isEmpty) return ""
    var zeros = 0
    while (zeros < input.length && input(zeros) == 0) zeros += 1
    // base-256 → base-58 long division
    val source = java.util.Arrays.copyOf(input, input.length)
    val encoded = new Array[Char](input.length * 2)
    var outStart = encoded.length
    var inStart = zeros
    while (inStart < source.length) {
      outStart -= 1
      encoded(outStart) = Alphabet(divmod(source, inStart, 256, 58))
      if (source(inStart) == 0) inStart += 1
    }
    while (outStart < encoded.length && encoded(outStart) == Alphabet(0)) outStart += 1
    val sb = new StringBuilder
    var i = 0
    while (i < zeros) { sb.append(Alphabet(0)); i += 1 }
    sb.appendAll(encoded, outStart, encoded.length - outStart)
    sb.toString
  }

  def decode(input: String): Array[Byte] = {
    if (input.isEmpty) return Array.emptyByteArray
    val input58 = new Array[Byte](input.length)
    var i = 0
    while (i < input.length) {
      val c = input.charAt(i)
      val digit = if (c < 128) Indexes(c.toInt) else -1
      require(digit >= 0, s"invalid base58 character '$c'")
      input58(i) = digit.toByte
      i += 1
    }
    var zeros = 0
    while (zeros < input58.length && input58(zeros) == 0) zeros += 1
    val decoded = new Array[Byte](input.length)
    var outStart = decoded.length
    var inStart = zeros
    while (inStart < input58.length) {
      outStart -= 1
      decoded(outStart) = divmod(input58, inStart, 58, 256).toByte
      if (input58(inStart) == 0) inStart += 1
    }
    while (outStart < decoded.length && decoded(outStart) == 0) outStart += 1
    val out = new Array[Byte](zeros + (decoded.length - outStart))
    System.arraycopy(decoded, outStart, out, zeros, decoded.length - outStart)
    out
  }

  /** One step of long division of `number` (digits base `base`) by `divisor`,
    * in place; returns the remainder. */
  private def divmod(number: Array[Byte], firstDigit: Int, base: Int, divisor: Int): Int = {
    var remainder = 0
    var i = firstDigit
    while (i < number.length) {
      val digit = number(i) & 0xff
      val temp = remainder * base + digit
      number(i) = (temp / divisor).toByte
      remainder = temp % divisor
      i += 1
    }
    remainder
  }
}
