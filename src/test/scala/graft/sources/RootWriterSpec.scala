package graft.sources

import graft.SparkSpec
import graft.sources.RootHistFile.TH1DSpec

/** TH1D writer edge cases beyond the SinksSpec round-trip: variable
  * binning, missing sumw2, >254-char names (the TString length-escape
  * path), many keys in one file, and spec validation. Every case is
  * proven by reading the written file back through the SAME reader that
  * is pinned against real ROOT-written files by independent-parse
  * goldens. */
class RootWriterSpec extends SparkSpec {

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("graft_rw").toString + s"/$name"

  test("variable-bin histogram round-trips edges exactly") {
    val edges = Array(0.0, 1.0, 2.5, 5.0, 10.0, 20.0)
    val contents = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0) // 5 bins + u/o
    val p = tmp("varbin.root")
    RootHistFile.writeTH1D(p, Seq(TH1DSpec("hv", "variable", 5,
      edges.head, edges.last, edges, contents, Array.empty, 21.0)))
    val h = RootHistFile.read(p).head
    assert(h.nbins == 5 && h.axes(0).edges.toSeq == edges.toSeq)
    assert(h.contents.toSeq == contents.toSeq && h.sumw2.isEmpty)
    // bin boundaries resolve through the edge array
    assert(h.axes(0).low(3) == 2.5 && h.axes(0).high(3) == 5.0)
  }

  test("a 300-char name exercises the TString length-escape path") {
    val longName = "n" * 300
    val contents = Array(0.0, 7.0, 0.0)
    val p = tmp("longname.root")
    RootHistFile.writeTH1D(p, Seq(TH1DSpec(longName, "t" * 260, 1,
      0.0, 1.0, Array.empty, contents, Array.empty, 7.0)))
    val h = RootHistFile.read(p).head
    assert(h.name == longName && h.title == "t" * 260)
    assert(h.contents.toSeq == contents.toSeq)
  }

  test("50 histograms in one file keep their identities and order") {
    val specs = (0 until 50).map { i =>
      val c = Array.tabulate(12)(b => (i * 100 + b).toDouble)
      TH1DSpec(f"h_$i%02d", s"hist $i", 10, 0.0, 10.0, Array.empty,
        c, c.map(v => v * v), i.toDouble)
    }
    val p = tmp("many.root")
    RootHistFile.writeTH1D(p, specs)
    val back = RootHistFile.read(p)
    assert(back.size == 50)
    back.zip(specs).foreach { case (h, s) =>
      assert(h.name == s.name && h.contents.toSeq == s.contents.toSeq &&
        h.sumw2.toSeq == s.sumw2.toSeq && h.entries == s.entries)
    }
    // the connector sees all 50 too (one partition per file)
    import org.apache.spark.sql.functions._
    val df = spark.read.format("root-hist").option("path", p).load()
    assert(df.select(countDistinct(col("hist"))).head.getLong(0) == 50L)
  }

  test("malformed specs are rejected with a clear message") {
    val p = tmp("bad.root")
    val e1 = intercept[IllegalArgumentException] {
      RootHistFile.writeTH1D(p, Seq(TH1DSpec("h", "", 4, 0.0, 1.0,
        Array.empty, Array(1.0, 2.0), Array.empty, 0.0))) // 2 cells, need 6
    }
    assert(e1.getMessage.contains("cells"))
    val e2 = intercept[IllegalArgumentException] {
      RootHistFile.writeTH1D(p, Seq(TH1DSpec("h", "", 2, 0.0, 1.0,
        Array(0.0, 0.5), Array.fill(4)(0.0), Array.empty, 0.0))) // 2 edges, need 3
    }
    assert(e2.getMessage.contains("edges"))
  }
}
