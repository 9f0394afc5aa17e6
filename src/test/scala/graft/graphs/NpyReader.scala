package graft.graphs

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal NumPy `.npy` reader for the reference's golden fixtures
  * (test-only): little-endian float64/int32, C-order, version 1.0. */
object NpyReader {

  final case class Npy(shape: Seq[Int], doubles: Array[Double])

  def read(path: String): Npy = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length > 10 && bytes(0) == 0x93.toByte &&
      new String(bytes, 1, 5, "ASCII") == "NUMPY", s"not an npy file: $path")
    val headerLen = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
    val header = new String(bytes, 10, headerLen, "ASCII")
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header).get.group(1)
    require(!header.contains("'fortran_order': True"), "fortran order unsupported")
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header).get.group(1)
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val n = shape.product
    val buf = ByteBuffer.wrap(bytes, 10 + headerLen, bytes.length - 10 - headerLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](n)
    descr match {
      case "<f8" => var i = 0; while (i < n) { out(i) = buf.getDouble(); i += 1 }
      case "<i4" => var i = 0; while (i < n) { out(i) = buf.getInt().toDouble; i += 1 }
      case "<i8" => var i = 0; while (i < n) { out(i) = buf.getLong().toDouble; i += 1 }
      case other => throw new IllegalArgumentException(s"unsupported dtype $other")
    }
    Npy(shape, out)
  }
}
