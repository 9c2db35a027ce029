package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Edge cases of the round-8 surfaces the fixture files don't reach:
  * the .npy v2 header path, degenerate SVG panels, and TemplateExport
  * input validation. */
class Round8EvalSpec extends SparkSpec {

  test("NumpyFile reads a v2.0 header (uint32 length) array") {
    val header = "{'descr': '<f8', 'fortran_order': False, 'shape': (2,), }\n"
    val out = java.nio.ByteBuffer.allocate(12 + header.length + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put("NUMPY".getBytes("ISO-8859-1"))
    out.put(2.toByte).put(0.toByte).putInt(header.length)
    out.put(header.getBytes("ISO-8859-1"))
    out.putDouble(42.0).putDouble(-0.5)
    val p = java.nio.file.Files.createTempFile("graft_npy2", ".npy")
    java.nio.file.Files.write(p, out.array())
    val a = sources.NumpyFile.read(p.toString)
    assert(a.shape == Seq(2) && a.data.toSeq == Seq(42.0, -0.5))
  }

  private val s12Schema = StructType(Seq(
    StructField("region", StringType), StructField("cbin", LongType),
    StructField("data_n", LongType), StructField("mc_val", FloatType),
    StructField("mc_err", FloatType), StructField("ratio", FloatType),
    StructField("ratio_err", FloatType), StructField("pull", FloatType)))
  private def row(cbin: Long, dn: Long, mc: Float, me: Float,
      ratio: java.lang.Float): Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any]("r", cbin, dn, mc, me, ratio,
        if (ratio == null) null else 0.1f, 0.0f), s12Schema)

  test("PlotSvg renders an all-empty panel without NaN coordinates") {
    val svg = report.PlotSvg.render("r", Seq(row(1L, 0L, 0f, 0f, null)))
    assert(!svg.contains("NaN") && !svg.contains("Infinity"), svg)
    assert(svg.contains("""class="mc"""") && svg.contains("""class="data""""))
    // no ratio mark for the null ratio
    assert(!svg.contains("""class="ratio""""))
  }

  test("PlotSvg clamps off-scale ratios into the ratio pad") {
    val svg = report.PlotSvg.render("r",
      Seq(row(1L, 100L, 10f, 1f, 10.0f), row(2L, 1L, 10f, 1f, 0.01f)))
    // both ratio points exist and their y-coordinates sit inside the pad
    val ys = """class="ratio" cx="[0-9.]+" cy="([0-9.]+)"""".r
      .findAllMatchIn(svg).map(_.group(1).toDouble).toSeq
    assert(ys.size == 2)
    ys.foreach(y => assert(y >= 335.0 && y <= 455.0, s"ratio y $y outside pad"))
  }

  test("TemplateExport rejects out-of-range bins with a clear error") {
    import org.apache.spark.sql.functions._
    val bad = spark.range(1).select(lit("r").as("region"),
      lit("c").as("channel"), lit("nominal").as("variation"),
      lit(99L).as("bin"), lit(1.0f).as("value"), lit(1.0f).as("sumw2"))
    val e = intercept[Exception] {
      report.TemplateExport.toTH1DSpecs(bad, nbins = 40, lo = 0.0, hi = 160.0)
    }
    assert(e.getMessage != null)
  }
}
