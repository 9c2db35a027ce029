package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector over ROOT TH1 histogram files: one output row
  * per histogram BIN (under/overflow included, with null outer bounds),
  * the same long-format shape as the engine's own histogram sink (S6) —
  * so a calibration file's content lands directly joinable against the
  * L1 binned-lookup family without a conversion step. This closes the
  * ingestion gap for the reference's correction inputs (the pileup and
  * muon SF/resolution ROOT files under data/): a user points
  * `spark.read.format("graft.sources.RootHistSource")` at the reference's
  * own files (reference: run_stage1.py's correction loaders).
  *
  * Scale shape: files are enumerated once on the driver (a directory
  * option expands to every *.root under it), ONE partition per file —
  * a thousand calibration files scan as a thousand parallel tasks, and
  * column pruning reaches the reader (unneeded columns are never
  * materialized into rows).
  */
object RootHistSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("dir", StringType, nullable = false), // in-file TDirectory path
    StructField("hist", StringType, nullable = false),
    StructField("key_name", StringType, nullable = false), // TKey name (lookup path)
    StructField("cls", StringType, nullable = false),
    StructField("cycle", IntegerType, nullable = false),
    StructField("key_pos", LongType, nullable = false), // unique per TKey
    StructField("title", StringType, nullable = false),
    StructField("ndim", IntegerType, nullable = false),
    StructField("nbins", IntegerType, nullable = false),     // x axis
    StructField("nbinsy", IntegerType, nullable = true),     // null for 1-D
    StructField("nbinsz", IntegerType, nullable = true),     // null below 3-D
    StructField("xmin", DoubleType, nullable = false),
    StructField("xmax", DoubleType, nullable = false),
    StructField("entries", DoubleType, nullable = false),
    StructField("bin", IntegerType, nullable = false),       // global cell
    StructField("binx", IntegerType, nullable = false),
    StructField("biny", IntegerType, nullable = true),
    StructField("binz", IntegerType, nullable = true),
    StructField("x_low", DoubleType, nullable = true),   // null = underflow
    StructField("x_high", DoubleType, nullable = true),  // null = overflow
    StructField("y_low", DoubleType, nullable = true),
    StructField("y_high", DoubleType, nullable = true),
    StructField("z_low", DoubleType, nullable = true),
    StructField("z_high", DoubleType, nullable = true),
    StructField("content", DoubleType, nullable = false),
    StructField("sumw2", DoubleType, nullable = true),   // null = not stored
    StructField("bin_entries", DoubleType, nullable = true))) // TProfile only

  /** Expand the path option: comma-separated entries, each a file or a
    * directory (recursively yielding *.root). Driver-side, once. */
  def expand(pathOpt: String): Seq[String] = {
    import java.nio.file.{Files, Paths}
    pathOpt.split(',').map(_.trim).filter(_.nonEmpty).toSeq.flatMap { p =>
      val path = Paths.get(p)
      if (Files.isDirectory(path)) {
        val s = Files.walk(path)
        try s.iterator().asScala
          .filter(f => f.toString.endsWith(".root") && Files.isRegularFile(f))
          .map(_.toString).toVector.sorted
        finally s.close()
      } else Seq(p)
    }
  }
}

class RootHistSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "root-hist"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RootHistSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    RootHistTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("RootHistSource requires a path option")))
  override def supportsExternalMetadata(): Boolean = false
}

case class RootHistTable(pathOpt: String) extends Table with SupportsRead {
  override def name(): String = s"root_hist($pathOpt)"
  override def schema(): StructType = RootHistSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    RootHistScanBuilder(pathOpt)
}

case class RootHistScanBuilder(pathOpt: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RootHistSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = RootHistScan(pathOpt, required)
}

case class RootHistFilePartition(path: String) extends InputPartition

case class RootHistScan(pathOpt: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    RootHistSource.expand(pathOpt)
      .map(RootHistFilePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    RootHistReaderFactory(required.fieldNames)
}

case class RootHistReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RootHistReader(p.asInstanceOf[RootHistFilePartition].path, cols)
}

/** Emits one row per (histogram, bin). The whole file's histograms are
  * parsed up front (calibration files are KB-scale); iteration is then
  * pure pointer walking. */
class RootHistReader(path: String, cols: Array[String])
    extends PartitionReader[InternalRow] {
  private val hists = RootHistFile.read(path).toIndexedSeq
  private var h = 0
  private var bin = -1
  private val fileU = UTF8String.fromString(path)

  override def next(): Boolean = {
    if (h >= hists.length) return false
    bin += 1
    if (bin >= hists(h).contents.length) {
      h += 1; bin = -1
      return next()
    }
    true
  }

  override def get(): InternalRow = {
    val hist = hists(h)
    val ax = hist.axes
    // ROOT's flat cell layout: bin = binx + (nx+2)·(biny + (ny+2)·binz)
    val nx2 = ax(0).nbins + 2
    val bx = bin % nx2
    val rest = bin / nx2
    val by = if (hist.dim >= 2) rest % (ax(1).nbins + 2) else 0
    val bz = if (hist.dim >= 3) rest / (ax(1).nbins + 2) else 0
    def lowEdge(d: Int, b: Int): Any =
      if (hist.dim <= d) null
      else if (b == 0) null // underflow opens at -inf
      else if (b > ax(d).nbins) ax(d).xmax
      else ax(d).low(b)
    def highEdge(d: Int, b: Int): Any =
      if (hist.dim <= d) null
      else if (b > ax(d).nbins) null // overflow opens at +inf
      else if (b == 0) ax(d).xmin
      else ax(d).high(b)
    val row = new GenericInternalRow(cols.length)
    var i = 0
    while (i < cols.length) {
      val v: Any = cols(i) match {
        case "file" => fileU
        case "dir" => UTF8String.fromString(hist.dir)
        case "hist" => UTF8String.fromString(hist.name)
        case "key_name" => UTF8String.fromString(hist.keyName)
        case "cls" => UTF8String.fromString(hist.cls)
        case "cycle" => hist.cycle
        case "key_pos" => hist.keyPos
        case "title" => UTF8String.fromString(hist.title)
        case "ndim" => hist.dim
        case "nbins" => ax(0).nbins
        case "nbinsy" => if (hist.dim >= 2) ax(1).nbins else null
        case "nbinsz" => if (hist.dim >= 3) ax(2).nbins else null
        case "xmin" => hist.xmin
        case "xmax" => hist.xmax
        case "entries" => hist.entries
        case "bin" => bin
        case "binx" => bx
        case "biny" => if (hist.dim >= 2) by else null
        case "binz" => if (hist.dim >= 3) bz else null
        case "x_low" => lowEdge(0, bx)
        case "x_high" => highEdge(0, bx)
        case "y_low" => lowEdge(1, by)
        case "y_high" => highEdge(1, by)
        case "z_low" => lowEdge(2, bz)
        case "z_high" => highEdge(2, bz)
        case "content" => hist.contents(bin)
        case "sumw2" =>
          if (bin < hist.sumw2.length) hist.sumw2(bin) else null
        case "bin_entries" =>
          if (bin < hist.binEntries.length) hist.binEntries(bin) else null
      }
      row.update(i, v)
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}

/** Companion connector for TGraph/TGraphErrors/TGraphAsymmErrors: one
  * row per graph POINT with (a)symmetric errors (nulls where the class
  * stores none). The reference's NNLOPS reweighting curves
  * (data/NNLOPS_reweight.root) and the tag-and-probe efficiency graphs
  * inside the muon-SF files land directly joinable for interp lookups
  * (the L2 family). Same planning shape as [[RootHistSource]]: driver
  * enumerates files, one partition per file, pruning pushed to the
  * reader. */
object RootGraphSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("dir", StringType, nullable = false),
    StructField("graph", StringType, nullable = false),
    StructField("cls", StringType, nullable = false),
    StructField("cycle", IntegerType, nullable = false),
    StructField("key_pos", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("npoints", IntegerType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("ex_low", DoubleType, nullable = true),
    StructField("ex_high", DoubleType, nullable = true),
    StructField("ey_low", DoubleType, nullable = true),
    StructField("ey_high", DoubleType, nullable = true)))
}

class RootGraphSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "root-graph"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RootGraphSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    RootGraphTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("RootGraphSource requires a path option")))
  override def supportsExternalMetadata(): Boolean = false
}

case class RootGraphTable(pathOpt: String) extends Table with SupportsRead {
  override def name(): String = s"root_graph($pathOpt)"
  override def schema(): StructType = RootGraphSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    RootGraphScanBuilder(pathOpt)
}

case class RootGraphScanBuilder(pathOpt: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RootGraphSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = RootGraphScan(pathOpt, required)
}

case class RootGraphScan(pathOpt: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    RootHistSource.expand(pathOpt)
      .map(RootHistFilePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    RootGraphReaderFactory(required.fieldNames)
}

case class RootGraphReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RootGraphReader(p.asInstanceOf[RootHistFilePartition].path, cols)
}

class RootGraphReader(path: String, cols: Array[String])
    extends PartitionReader[InternalRow] {
  private val graphs = RootHistFile.readGraphs(path).toIndexedSeq
  private var g = 0
  private var pt = -1
  private val fileU = UTF8String.fromString(path)

  override def next(): Boolean = {
    if (g >= graphs.length) return false
    pt += 1
    if (pt >= graphs(g).n) { g += 1; pt = -1; return next() }
    true
  }

  override def get(): InternalRow = {
    val gr = graphs(g)
    def e(a: Array[Double]): Any = if (pt < a.length) a(pt) else null
    val row = new GenericInternalRow(cols.length)
    var i = 0
    while (i < cols.length) {
      val v: Any = cols(i) match {
        case "file" => fileU
        case "dir" => UTF8String.fromString(gr.dir)
        case "graph" => UTF8String.fromString(gr.name)
        case "cls" => UTF8String.fromString(gr.cls)
        case "cycle" => gr.cycle
        case "key_pos" => gr.keyPos
        case "title" => UTF8String.fromString(gr.title)
        case "npoints" => gr.n
        case "i" => pt
        case "x" => gr.xs(pt)
        case "y" => gr.ys(pt)
        case "ex_low" => e(gr.exLow)
        case "ex_high" => e(gr.exHigh)
        case "ey_low" => e(gr.eyLow)
        case "ey_high" => e(gr.eyHigh)
      }
      row.update(i, v)
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}

/** Third connector: TTree branch data, one row per (branch, entry,
  * element) — jagged vector branches explode to element rows (empty
  * entries keep one row with null element so event counts survive),
  * flat leaves emit a single element 0. This is the NanoAOD TABLE shape:
  * `spark.read.format("graft.sources.RootTreeSource")` on an event file
  * yields the long-format event table the engine's jagged-model queries
  * (g01/g02) pivot from. Baskets decode without the TTree metadata
  * object (see RootHistFile.readTree); the in-file golden — decoded
  * muon_eta re-histogrammed equals the same file's hEta TH1F bin for
  * bin — pins the contract. One partition per file, pruning pushed. */
object RootTreeSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("dir", StringType, nullable = false),
    StructField("tree", StringType, nullable = false),
    StructField("branch", StringType, nullable = false),
    StructField("entry", LongType, nullable = false),
    StructField("n", IntegerType, nullable = false),  // entry's vector length
    StructField("i", IntegerType, nullable = true),   // null for empty entry
    StructField("value", DoubleType, nullable = true)))
}

class RootTreeSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "root-tree"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RootTreeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    RootTreeTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("RootTreeSource requires a path option")))
  override def supportsExternalMetadata(): Boolean = false
}

case class RootTreeTable(pathOpt: String) extends Table with SupportsRead {
  override def name(): String = s"root_tree($pathOpt)"
  override def schema(): StructType = RootTreeSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    RootTreeScanBuilder(pathOpt)
}

case class RootTreeScanBuilder(pathOpt: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RootTreeSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = RootTreeScan(pathOpt, required)
}

case class RootTreeScan(pathOpt: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    RootHistSource.expand(pathOpt)
      .map(RootHistFilePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    RootTreeReaderFactory(required.fieldNames)
}

case class RootTreeReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RootTreeReader(p.asInstanceOf[RootHistFilePartition].path, cols)
}

class RootTreeReader(path: String, cols: Array[String])
    extends PartitionReader[InternalRow] {
  private val entries = RootHistFile.readTree(path).toIndexedSeq
  private var e = 0
  private var i = -1
  private val fileU = UTF8String.fromString(path)

  override def next(): Boolean = {
    if (e >= entries.length) return false
    i += 1
    val n = entries(e).values.length
    // an empty entry still yields its one null-element row (i == 0 slot)
    if (i >= math.max(n, 1)) { e += 1; i = -1; return next() }
    true
  }

  override def get(): InternalRow = {
    val t = entries(e)
    val n = t.values.length
    val row = new GenericInternalRow(cols.length)
    var k = 0
    while (k < cols.length) {
      val v: Any = cols(k) match {
        case "file" => fileU
        case "dir" => UTF8String.fromString(t.dir)
        case "tree" => UTF8String.fromString(t.tree)
        case "branch" => UTF8String.fromString(t.branch)
        case "entry" => t.entry
        case "n" => n
        case "i" => if (n == 0) null else i
        case "value" => if (n == 0) null else t.values(i)
      }
      row.update(k, v)
      k += 1
    }
    row
  }

  override def close(): Unit = ()
}
