package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Pure-JVM reader for NumPy `.npy` arrays — the format the reference
  * ships its per-fold feature scalers in
  * (data/trained_models/vbf/scalers/scalers_pytorch_test_{fold}.npy,
  * consumed by stage1/dnn_models.py's StandardScaler load). Format per
  * the public NumPy NEP-1 spec: magic "\\x93NUMPY", version bytes,
  * little-endian header length, a Python-dict-literal header
  * ({'descr','fortran_order','shape'}), then raw data. Scope: '<f8' /
  * '<f4' C-order arrays of any rank — all the reference's scaler files
  * are (2, n_features) float64. */
object NumpyFile {

  final case class NpyArray(shape: Seq[Int], data: Array[Double]) {
    /** Row-major element access for rank-2 arrays. */
    def apply(i: Int, j: Int): Double = data(i * shape(1) + j)
  }

  def read(path: String): NpyArray = {
    val raw = Files.readAllBytes(Paths.get(path))
    require(raw.length > 10 &&
      (raw(0) & 0xff) == 0x93 && new String(raw, 1, 5, "ISO-8859-1") == "NUMPY",
      s"$path: not an .npy file")
    val major = raw(6) & 0xff
    val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val (hdrLen, hdrOff) =
      if (major == 1) ((b.getShort(8) & 0xffff), 10)
      else (b.getInt(8), 12) // v2/v3: uint32 header length
    val header = new String(raw, hdrOff, hdrLen, "ISO-8859-1")
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(sys.error(s"$path: no descr in header"))
    val fortran = "'fortran_order':\\s*(\\w+)".r.findFirstMatchIn(header)
      .exists(_.group(1) == "True")
    require(!fortran, s"$path: fortran_order arrays unsupported")
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .map(_.group(1).split(',').map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
      .getOrElse(sys.error(s"$path: no shape in header"))
    val n = if (shape.isEmpty) 1 else shape.product
    val dataOff = hdrOff + hdrLen
    val d = ByteBuffer.wrap(raw, dataOff, raw.length - dataOff)
      .order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](n)
    descr match {
      case "<f8" =>
        require(raw.length - dataOff >= n * 8, s"$path: truncated f8 data")
        var i = 0; while (i < n) { out(i) = d.getDouble(); i += 1 }
      case "<f4" =>
        require(raw.length - dataOff >= n * 4, s"$path: truncated f4 data")
        var i = 0; while (i < n) { out(i) = d.getFloat().toDouble; i += 1 }
      case other => sys.error(s"$path: unsupported descr '$other' (need <f8/<f4)")
    }
    NpyArray(shape, out)
  }
}
