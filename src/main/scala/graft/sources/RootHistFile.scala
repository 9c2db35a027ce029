package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.Inflater

/** Pure-JVM reader for TH1 histograms inside ROOT files — the engine-side
  * slice of the reference's ROOT ingestion (reference: run_stage1.py reads
  * NanoAOD TTrees; config/branches.py and the correction loaders read TH1
  * calibration files like data/pileup/mcPileup2018.root and the
  * muon-SF/resolution files, which are exactly the inputs this reader
  * covers). Format knowledge is the public ROOT I/O documentation
  * (root.cern "ROOT files" spec + TFile/TKey/TBuffer headers): big-endian
  * throughout, a TKey record chain from fBEGIN, 9-byte compression block
  * headers ("ZL" = zlib, inflatable with java.util.zip), and TBuffer
  * byte-count framing (uint32 | 0x40000000) around every streamed object
  * — which is what makes a minimal reader robust: anything we do not
  * model (TAttLine, TList of functions, later-version trailing members)
  * is SKIPPED by its own byte count instead of parsed.
  *
  * Scope: TH1D / TH1F / TH1I keys (streamer version 4+; the reference's
  * files are v7), fixed or variable binning, optional fSumw2. TH2/TGraph
  * and other classes are skipped — the reader never throws on them.
  */
object RootHistFile {

  /** One histogram axis: fixed binning when `edges` is empty. */
  final case class HistAxis(nbins: Int, xmin: Double, xmax: Double,
      edges: Array[Double]) {
    def low(b: Int): Double =
      if (edges.nonEmpty) edges(b - 1)
      else xmin + (xmax - xmin) * (b - 1) / nbins
    def high(b: Int): Double =
      if (edges.nonEmpty) edges(b)
      else xmin + (xmax - xmin) * b / nbins
  }

  /** One TH1/TH2/TH3, fully decoded. `dir` is the in-file TDirectory
    * path ("" at top level) — the discriminator for files that store the
    * same histogram name in several directories (the muon-SF layout).
    * `axes` has `dim` entries (x, then y, then z); `sumw2` is empty when
    * the histogram never stored errors. `contents`/`sumw2` are ROOT's
    * flat cell layout — Π(nbins_i + 2) entries, global cell =
    * binx + (nx+2)·(biny + (ny+2)·binz), under/overflow included. */
  final case class RootHist(
      file: String, dir: String, cls: String, name: String, cycle: Int,
      keyPos: Long, title: String, dim: Int, axes: IndexedSeq[HistAxis],
      entries: Double, contents: Array[Double], sumw2: Array[Double],
      binEntries: Array[Double] = Array.empty, // TProfile only
      keyName: String = "") { // the TKey name (lookup path component);
                              // can differ from the streamed fName — the
                              // muon-SF trigger files key "abseta_pt_DATA"
                              // over an fName carrying the full
                              // tag-and-probe cut string
    def nbins: Int = axes(0).nbins
    def xmin: Double = axes(0).xmin
    def xmax: Double = axes(0).xmax
  }

  private val ByteCountMask = 0x40000000

  private final class Cursor(val b: ByteBuffer) {
    def u8(): Int = b.get() & 0xff
    def i16(): Int = b.getShort().toInt
    def i32(): Int = b.getInt()
    def i64(): Long = b.getLong()
    def f32(): Float = b.getFloat()
    def f64(): Double = b.getDouble()
    def pos: Int = b.position()
    def seek(p: Int): Unit = b.position(p)
    def skip(n: Int): Unit = b.position(b.position() + n)

    def tString(): String = {
      var n = u8()
      if (n == 255) n = i32()
      val arr = new Array[Byte](n)
      b.get(arr)
      new String(arr, java.nio.charset.StandardCharsets.ISO_8859_1)
    }

    /** TBuffer byte-count framing: returns (version, endPosition). The
      * count excludes its own 4 bytes; end = countPos + 4 + count. */
    def byteCountVersion(): (Int, Int) = {
      val cntPos = pos
      val raw = i32()
      require((raw & ByteCountMask) != 0, s"no byte-count at $cntPos")
      val cnt = raw & (ByteCountMask - 1)
      val ver = i16() & 0xffff
      (ver, cntPos + 4 + cnt)
    }

    /** Skip one byte-count-framed object entirely. */
    def skipFramed(): Unit = { val (_, end) = byteCountVersion(); seek(end) }

    /** TNamed: returns (name, title), cursor left at the object end. */
    def tNamed(): (String, String) = {
      val (_, end) = byteCountVersion()
      i16() // TObject streamer version
      i32() // fUniqueID
      val bits = i32()
      if ((bits & 0x00000002) != 0) i16() // kIsReferenced → pidf
      val name = tString()
      val title = tString()
      seek(end)
      (name, title)
    }

    def tArrayD(): Array[Double] = {
      val n = i32()
      val a = new Array[Double](n)
      var i = 0; while (i < n) { a(i) = f64(); i += 1 }
      a
    }
    def tArrayF(): Array[Double] = {
      val n = i32()
      val a = new Array[Double](n)
      var i = 0; while (i < n) { a(i) = f32().toDouble; i += 1 }
      a
    }
    def tArrayI(): Array[Double] = {
      val n = i32()
      val a = new Array[Double](n)
      var i = 0; while (i < n) { a(i) = i32().toDouble; i += 1 }
      a
    }
  }

  private def tAxis(c: Cursor): HistAxis = {
    val (_, end) = c.byteCountVersion()
    c.tNamed()
    c.skipFramed() // TAttAxis
    val nbins = c.i32()
    val xmin = c.f64()
    val xmax = c.f64()
    val edges = c.tArrayD()
    c.seek(end) // fFirst/fLast/labels/time fields all version-dependent — skip
    HistAxis(nbins, xmin, xmax, edges)
  }

  /** Parse one decompressed TH1/TH2/TH3 object buffer. The byte-count
    * frames make dimensionality uniform: a TH2 is
    * [TH2x outer [TH2 base [TH1 base ...] 4 doubles] TArray], a TH3 adds
    * one more nesting level — so the TH1 base parse is shared and each
    * enclosing frame is exited by its recorded end, never by modelling
    * the THn members. */
  private def parseTHn(buf: Array[Byte], cls: String, file: String,
      keyName: String, cycle: Int): RootHist = {
    val isProfile = cls == "TProfile"
    val dim = if (isProfile) 1 else cls.charAt(2) - '0' // TH1*/TH2*/TH3*
    val c = new Cursor(ByteBuffer.wrap(buf).order(ByteOrder.BIG_ENDIAN))
    c.byteCountVersion()                        // THnX outer frame
    // ONE intermediate base frame for 2-D/3-D (TH2 inside TH2D, TH3
    // inside TH3D — both inherit TH1 directly; TH3's TAtt3D base and
    // the THn members live inside this frame, after the TH1 base) and
    // for TProfile (whose base is TH1D; its own members — fBinEntries,
    // error mode, y sums — follow that frame)
    val midEnds = if (dim > 1 || isProfile) Seq(c.byteCountVersion()._2) else Nil
    val (baseVer, baseEnd) = c.byteCountVersion() // TH1 base frame
    require(baseVer >= 4, s"TH1 streamer v$baseVer unsupported (need >= 4)")
    val (name, title) = c.tNamed()
    c.skipFramed(); c.skipFramed(); c.skipFramed() // TAttLine/Fill/Marker
    c.i32() // fNcells (redundant with the axis product; asserted below)
    val xAxis = tAxis(c)
    val yAxis = tAxis(c)
    val zAxis = tAxis(c)
    c.skip(4) // fBarOffset, fBarWidth (two int16)
    val entries = c.f64()
    c.skip(7 * 8) // fTsumw..fNormFactor
    c.tArrayD() // fContour
    val sumw2 = c.tArrayD()
    // everything after fSumw2 (fOption, fFunctions TList, buffers, and
    // any members newer streamer versions appended) is skipped via the
    // base frame's byte count; likewise the THn members (fScalefactor,
    // fTsumwy..., TAtt3D) via the intermediate frame ends — then the
    // payload array follows the OUTERMOST base frame's end
    // TProfile's payload (Σw·y per bin, a TH1D TArrayD) sits INSIDE the
    // TH1D mid frame right after the TH1 base; its fBinEntries follows
    // the mid frame. Plain THn payloads follow the outermost base frame.
    c.seek(if (isProfile) baseEnd else (baseEnd +: midEnds).max)
    val contents = (if (isProfile) "D" else cls.substring(3)) match {
      case "D" => c.tArrayD()
      case "F" => c.tArrayF()
      case "I" => c.tArrayI()
    }
    val binEntries =
      if (isProfile) { c.seek(midEnds.head); c.tArrayD() }
      else Array.empty[Double]
    val axes = IndexedSeq(xAxis, yAxis, zAxis).take(dim)
    val cells = axes.map(_.nbins + 2).product
    require(contents.length == cells,
      s"$cls $keyName: ${contents.length} cells, axes say $cells")
    RootHist(file, "", cls, if (name.nonEmpty) name else keyName, cycle,
      0L, title, dim, axes, entries, contents, sumw2, binEntries, keyName)
  }

  /** Decompress a ROOT key payload: a sequence of 9-byte-headed blocks.
    * Only "ZL" (zlib) is supported — every file the reference ships uses
    * it; other algos raise with the algo tag in the message. */
  private def decompress(blob: Array[Byte], objLen: Int): Array[Byte] = {
    val out = new Array[Byte](objLen)
    var q = 0
    var w = 0
    while (q < blob.length && w < objLen) {
      val algo = new String(blob, q, 2, java.nio.charset.StandardCharsets.ISO_8859_1)
      val csz = (blob(q + 3) & 0xff) | ((blob(q + 4) & 0xff) << 8) |
        ((blob(q + 5) & 0xff) << 16)
      require(algo == "ZL", s"unsupported ROOT compression '$algo'")
      val inf = new Inflater()
      inf.setInput(blob, q + 9, csz)
      var n = 1
      while (n > 0 && !inf.finished()) {
        n = inf.inflate(out, w, objLen - w)
        w += n
      }
      inf.end()
      q += 9 + csz
    }
    require(w == objLen, s"decompressed $w of $objLen bytes")
    out
  }

  private val Supported = Set("TH1D", "TH1F", "TH1I",
    "TH2D", "TH2F", "TH2I", "TH3D", "TH3F", "TH3I", "TProfile")

  /** One TGraph/TGraphErrors/TGraphAsymmErrors: n points with optional
    * asymmetric errors (empty arrays when the class has none). */
  final case class RootGraph(
      file: String, dir: String, cls: String, name: String, cycle: Int,
      keyPos: Long, title: String, n: Int,
      xs: Array[Double], ys: Array[Double],
      exLow: Array[Double], exHigh: Array[Double],
      eyLow: Array[Double], eyHigh: Array[Double])

  /** A Double_t* member with a //[fNpoints] count: 1-byte presence flag
    * then n doubles. */
  private def starArray(c: Cursor, n: Int): Array[Double] = {
    val flag = c.u8()
    if (flag == 0) Array.empty
    else { val a = new Array[Double](n); var i = 0
      while (i < n) { a(i) = c.f64(); i += 1 }; a }
  }

  private def parseGraph(buf: Array[Byte], cls: String, file: String,
      keyName: String, cycle: Int): RootGraph = {
    val c = new Cursor(ByteBuffer.wrap(buf).order(ByteOrder.BIG_ENDIAN))
    // TGraphErrors/AsymmErrors wrap a TGraph base frame; plain TGraph's
    // outer frame IS the base
    if (cls != "TGraph") c.byteCountVersion()
    val (_, baseEnd) = c.byteCountVersion() // TGraph frame
    val (name, title) = c.tNamed()
    c.skipFramed(); c.skipFramed(); c.skipFramed() // TAttLine/Fill/Marker
    val n = c.i32()
    val xs = starArray(c, n)
    val ys = starArray(c, n)
    c.seek(baseEnd) // fFunctions/fHistogram/fMin/fMax skipped by frame
    val (exl, exh, eyl, eyh) = cls match {
      case "TGraphErrors" =>
        val ex = starArray(c, n); val ey = starArray(c, n)
        (ex, ex, ey, ey) // symmetric
      case "TGraphAsymmErrors" =>
        (starArray(c, n), starArray(c, n), starArray(c, n), starArray(c, n))
      case _ => (Array.empty[Double], Array.empty[Double],
        Array.empty[Double], Array.empty[Double])
    }
    RootGraph(file, "", cls, if (name.nonEmpty) name else keyName, cycle,
      0L, title, n, xs, ys, exl, exh, eyl, eyh)
  }

  private val GraphClasses = Set("TGraph", "TGraphErrors", "TGraphAsymmErrors")

  private val DirClasses = Set("TDirectory", "TDirectoryFile")

  /** One TTree entry of one branch: `values` is the entry's element
    * array (empty for an empty jagged entry, length 1 for a flat leaf).
    * The NanoAOD shape — jagged per-event vectors — lands as one
    * TreeEntry per (branch, event). */
  final case class TreeEntry(
      file: String, dir: String, tree: String, branch: String,
      entry: Long, values: Array[Double])

  /** Decode every TBasket in the file into per-entry value arrays,
    * grouped by (tree, branch), entries numbered in basket file order
    * (ROOT writes a branch's baskets in entry order). Two payload
    * layouts are handled, auto-detected per basket:
    *
    *  - FRAMED vector entries (a `vector<double>`/`vector<float>`
    *    branch): each entry is byte-count-framed — uint32 count with the
    *    0x40000000 bit, uint16 streamer version, int32 n, n elements —
    *    so the element width falls out of (count − 6) / n and the walk
    *    is self-describing; verified against fNevBuf from the basket
    *    key's trailer (fVersion, fBufferSize, fNevBufSize, fNevBuf,
    *    fLast — the 19 bytes ROOT appends inside the key header).
    *  - RAW fixed-width values (a flat `branch/F` or `/D` leaf):
    *    (fLast − keyLen) == fNevBuf × {4,8} exactly; 4-byte cells are
    *    read as float32 (the NanoAOD convention for flat leaves).
    *
    * This reads the DATA without parsing the TTree metadata object
    * (whose streamed-pointer machinery is the one part of ROOT I/O a
    * minimal reader cannot skip by byte counts); the cost is that leaf
    * names/types come from the basket keys and payload shape instead of
    * TLeaf records. The golden test proves the trade sound: the decoded
    * muon_eta stream re-histogrammed matches the SAME FILE's hEta TH1F
    * bin-for-bin. */
  def readTree(path: String): Seq[TreeEntry] = {
    val out = Seq.newBuilder[TreeEntry]
    val entryCounters = scala.collection.mutable.Map.empty[(String, String), Long]
    readKeys(path) { (raw, pos, nbytes, cls, keyName, keyTitle, cycle,
        keyLen, objLen, dir, hdrEnd) =>
      if (cls == "TBasket") {
        val c = new Cursor(ByteBuffer.wrap(raw).order(ByteOrder.BIG_ENDIAN))
        c.seek(hdrEnd)
        c.i16() // basket version
        c.i32() // fBufferSize
        c.i32() // fNevBufSize
        val nevBuf = c.i32()
        val last = c.i32()
        val dataOff = pos.toInt + keyLen
        val dataLen = nbytes - keyLen
        val blob0 = java.util.Arrays.copyOfRange(raw, dataOff, dataOff + dataLen)
        val blob = if (objLen > dataLen) decompress(blob0, objLen) else blob0
        val dataEnd = last - keyLen
        val key = (keyTitle, keyName)
        val entry0 = entryCounters.getOrElse(key, 0L)
        val b = new Cursor(ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN))
        // Raw flat-leaf layouts have payload size EXACTLY nevBuf*width
        // with zero framing overhead, so they are mutually exclusive
        // with framed payloads (each frame adds >= 10 bytes). Test the
        // unambiguous exact-size cases FIRST: a flat float/double whose
        // first value is >= 2.0 sets bit 30 of its big-endian bytes and
        // would otherwise be misread as a byte-count frame.
        val rawF64 = nevBuf > 0 && dataEnd == nevBuf * 8L
        val rawF32 = nevBuf > 0 && dataEnd == nevBuf * 4L
        val framed = !rawF64 && !rawF32 &&
          dataEnd >= 4 && (b.i32() & ByteCountMask) != 0
        b.seek(0)
        if (framed) {
          var e = 0
          while (e < nevBuf && b.pos < dataEnd) {
            val cnt = b.i32() & (ByteCountMask - 1)
            val entryEnd = b.pos + cnt
            b.i16() // element streamer version
            val n = b.i32()
            val elemSz = if (n > 0) (cnt - 6) / n else 8
            val vals = new Array[Double](math.max(n, 0))
            var i = 0
            while (i < n) {
              vals(i) = if (elemSz == 8) b.f64() else b.f32().toDouble
              i += 1
            }
            b.seek(entryEnd)
            out += TreeEntry(path, dir, keyTitle, keyName, entry0 + e, vals)
            e += 1
          }
        } else if (rawF64) {
          var e = 0
          while (e < nevBuf) {
            out += TreeEntry(path, dir, keyTitle, keyName, entry0 + e,
              Array(b.f64())); e += 1
          }
        } else if (rawF32) {
          var e = 0
          while (e < nevBuf) {
            out += TreeEntry(path, dir, keyTitle, keyName, entry0 + e,
              Array(b.f32().toDouble)); e += 1
          }
        } // other layouts (split objects) skipped
        entryCounters(key) = entry0 + nevBuf
      }
    }
    out.result()
  }

  /** Read every supported histogram from one ROOT file. */
  def read(path: String): Seq[RootHist] =
    readObjects(path, Supported) { (obj, cls, keyName, cycle, dir, pos) =>
      parseTHn(obj, cls, path, keyName, cycle).copy(dir = dir, keyPos = pos)
    }

  /** Read every TGraph/TGraphErrors/TGraphAsymmErrors from one file. */
  def readGraphs(path: String): Seq[RootGraph] =
    readObjects(path, GraphClasses) { (obj, cls, keyName, cycle, dir, pos) =>
      parseGraph(obj, cls, path, keyName, cycle).copy(dir = dir, keyPos = pos)
    }

  /** Generic file scan. Two passes over the in-memory key chain: pass 1
    * maps each TDirectory key's seekKey to its (name, parent) — children
    * reference their directory by that offset in seekPdir — so pass 2
    * can stamp every object with its full in-file path. The callback
    * receives (raw, pos, nbytes, cls, keyName, keyTitle, cycle, keyLen,
    * objLen, dir, hdrEnd) where hdrEnd is the byte offset right after
    * the key's title TString — where class-specific key trailers (the
    * TBasket fields) begin. */
  private def readKeys(path: String)(
      f: (Array[Byte], Long, Int, String, String, String, Int, Int, Int,
        String, Int) => Unit): Unit = {
    val raw = Files.readAllBytes(Paths.get(path))
    val c = new Cursor(ByteBuffer.wrap(raw).order(ByteOrder.BIG_ENDIAN))
    val magic = new Array[Byte](4); c.b.get(magic)
    require(new String(magic) == "root", s"$path: not a ROOT file")
    val fVersion = c.i32()
    val fBegin = c.i32()
    val large = fVersion > 1000000
    val fEnd = if (large) c.i64() else c.i32().toLong

    def walk(g: (Long, Int, String, String, String, Int, Int, Int, Long,
        Int) => Unit): Unit = {
      var pos = fBegin.toLong
      var guard = 0
      while (pos < fEnd && pos + 4 <= raw.length && guard < 1000000) {
        guard += 1
        c.seek(pos.toInt)
        val nbytes = c.i32()
        if (nbytes == 0) { pos = fEnd }
        else if (nbytes < 0) { pos += -nbytes } // gap record
        else {
          val kver = c.i16()
          val objLen = c.i32()
          c.i32() // datime
          val keyLen = c.i16()
          val cycle = c.i16()
          val seekPdir =
            if (kver > 1000) { c.i64(); c.i64() }
            else { c.i32(); c.i32().toLong }
          val cls = c.tString()
          val keyName = c.tString()
          val keyTitle = c.tString()
          g(pos, nbytes, cls, keyName, keyTitle, cycle, keyLen, objLen,
            seekPdir, c.pos)
          pos += nbytes
        }
      }
    }

    // pass 1: directory tree (seekKey == record position for the files
    // this reader targets; robust because unresolvable parents fall back
    // to top level rather than failing)
    val dirs = scala.collection.mutable.Map.empty[Long, (String, Long)]
    walk { (pos, _, cls, name, _, _, _, _, seekPdir, _) =>
      if (DirClasses(cls)) dirs(pos) = (name, seekPdir)
    }
    def dirPath(seekPdir: Long): String = {
      val parts = List.newBuilder[String]
      var at = seekPdir
      var hops = 0
      while (at != 0 && at != fBegin.toLong && hops < 64) {
        hops += 1
        dirs.get(at) match {
          case Some((name, parent)) => parts += name; at = parent
          case None => at = 0
        }
      }
      parts.result().reverse.mkString("/")
    }

    walk { (pos, nbytes, cls, keyName, keyTitle, cycle, keyLen, objLen,
        seekPdir, hdrEnd) =>
      f(raw, pos, nbytes, cls, keyName, keyTitle, cycle, keyLen, objLen,
        dirPath(seekPdir), hdrEnd)
    }
  }

  // ------------------------------------------------------------------
  // TH1D writer — the reverse direction of the reader above, closing
  // SURVEY §2.1 S8 (the reference exports its stage-3 templates as TH1D
  // keys in a ROOT file; python/io.py:230-235 is the shape). Emits a
  // minimal-but-spec-conforming file: 100-byte TFile header, one
  // uncompressed TKey record per histogram, each payload a streamed
  // TH1D with proper TBuffer byte-count framing (root.cern TFile/TKey/
  // TBuffer spec). Everything the reader models is written exactly
  // (TNamed, the three TAtt frames, three TAxis frames, stat doubles,
  // fContour/fSumw2 TArrayDs, cell payload); members the reader skips
  // by byte count are written as spec-shaped zeros so any byte-count-
  // honoring ROOT reader walks the same path.
  // ------------------------------------------------------------------

  /** Mutable big-endian buffer with frame backpatching. */
  private final class WBuf {
    private var arr = new Array[Byte](4096)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length)
        arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, len + n))
    def pos: Int = len
    def u8(v: Int): Unit = { ensure(1); arr(len) = v.toByte; len += 1 }
    def i16(v: Int): Unit = { ensure(2)
      arr(len) = (v >> 8).toByte; arr(len + 1) = v.toByte; len += 2 }
    def i32(v: Int): Unit = { ensure(4)
      var i = 0; while (i < 4) { arr(len + i) = (v >> (24 - 8 * i)).toByte; i += 1 }
      len += 4 }
    def f32(v: Float): Unit = i32(java.lang.Float.floatToIntBits(v))
    def f64(v: Double): Unit = { val b = java.lang.Double.doubleToLongBits(v)
      i32((b >> 32).toInt); i32(b.toInt) }
    def tString(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      if (b.length >= 255) { u8(255); i32(b.length) } else u8(b.length)
      ensure(b.length); System.arraycopy(b, 0, arr, len, b.length)
      len += b.length
    }
    def patchI32(at: Int, v: Int): Unit = {
      var i = 0; while (i < 4) { arr(at + i) = (v >> (24 - 8 * i)).toByte; i += 1 }
    }
    /** Open a TBuffer frame: reserves the byte-count slot, writes the
      * version; returns the slot position for [[endFrame]]. */
    def frame(version: Int): Int = { val at = pos; i32(0); i16(version); at }
    def endFrame(at: Int): Unit =
      patchI32(at, (pos - at - 4) | ByteCountMask)
    def bytes: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  private def wNamed(w: WBuf, name: String, title: String): Unit = {
    val f = w.frame(1)           // TNamed v1
    w.i16(1); w.i32(0); w.i32(0) // TObject v1, fUniqueID, fBits
    w.tString(name); w.tString(title)
    w.endFrame(f)
  }

  private def wAxis(w: WBuf, name: String, nbins: Int, xmin: Double,
      xmax: Double, edges: Array[Double]): Unit = {
    val f = w.frame(10) // TAxis v10
    wNamed(w, name, "")
    val fa = w.frame(4) // TAttAxis v4
    w.i32(510); w.i16(1); w.i16(1); w.i16(42); w.f32(0.005f); w.f32(0.035f)
    w.f32(0.03f); w.f32(1f); w.f32(0.035f); w.i16(1); w.i16(42)
    w.endFrame(fa)
    w.i32(nbins); w.f64(xmin); w.f64(xmax)
    w.i32(edges.length); edges.foreach(w.f64) // fXbins TArrayD
    w.i32(0); w.i32(0)  // fFirst, fLast
    w.i16(0)            // fBits2
    w.u8(0)             // fTimeDisplay
    w.tString("")       // fTimeFormat
    w.i32(0); w.i32(0)  // fLabels*, fModLabs* (null object tags)
    w.endFrame(f)
  }

  /** Serialize one TH1D object buffer (the TKey payload). */
  private def th1dPayload(name: String, title: String, nbins: Int,
      xmin: Double, xmax: Double, edges: Array[Double],
      contents: Array[Double], sumw2: Array[Double],
      entries: Double): Array[Byte] = {
    require(contents.length == nbins + 2,
      s"TH1D $name: need ${nbins + 2} cells (under/overflow), got ${contents.length}")
    require(sumw2.isEmpty || sumw2.length == nbins + 2,
      s"TH1D $name: sumw2 must be empty or ${nbins + 2} cells")
    require(edges.isEmpty || edges.length == nbins + 1,
      s"TH1D $name: edges must be empty (fixed bins) or ${nbins + 1}")
    val w = new WBuf
    val outer = w.frame(3) // TH1D class v3
    val base = w.frame(8)  // TH1 base v8
    wNamed(w, name, title)
    val l = w.frame(2); w.i16(602); w.i16(1); w.i16(1); w.endFrame(l)  // TAttLine
    val fl = w.frame(2); w.i16(0); w.i16(1001); w.endFrame(fl)        // TAttFill
    val m = w.frame(2); w.i16(1); w.i16(1); w.f32(1f); w.endFrame(m)  // TAttMarker
    w.i32(nbins + 2) // fNcells
    wAxis(w, "xaxis", nbins, xmin, xmax, edges)
    wAxis(w, "yaxis", 1, 0.0, 1.0, Array.empty)
    wAxis(w, "zaxis", 1, 0.0, 1.0, Array.empty)
    w.i16(0); w.i16(1000) // fBarOffset, fBarWidth
    w.f64(entries)
    val sw = contents.view.slice(1, nbins + 1).sum
    val sw2 = (if (sumw2.nonEmpty) sumw2 else contents)
      .view.slice(1, nbins + 1).sum
    w.f64(sw); w.f64(sw2); w.f64(0.0); w.f64(0.0) // fTsumw/w2/wx/wx2
    w.f64(-1111.0); w.f64(-1111.0); w.f64(1.0)    // fMax/fMin/fNormFactor
    w.i32(0)                                      // fContour TArrayD (empty)
    w.i32(sumw2.length); sumw2.foreach(w.f64)     // fSumw2 TArrayD
    w.tString("")   // fOption
    w.i32(0)        // fFunctions (null object tag)
    w.i32(0); w.u8(0)     // fBufferSize, fBuffer (absent)
    w.i16(0); w.i16(2)    // fBinStatErrOpt, fStatOverflows
    w.endFrame(base)
    // TArrayD cell payload follows the TH1 base frame
    w.i32(contents.length); contents.foreach(w.f64)
    w.endFrame(outer)
    w.bytes
  }

  /** One histogram to write: fixed binning when `edges` is empty;
    * `contents`/`sumw2` are the full nbins+2 cell layout (under/overflow
    * at 0 and nbins+1), `sumw2` may be empty. */
  final case class TH1DSpec(name: String, title: String, nbins: Int,
      xmin: Double, xmax: Double, edges: Array[Double],
      contents: Array[Double], sumw2: Array[Double], entries: Double)

  /** Write `hists` as TH1D keys in a new ROOT file at `path`. */
  def writeTH1D(path: String, hists: Seq[TH1DSpec]): Unit = {
    val fBegin = 100
    val records = Seq.newBuilder[Array[Byte]]
    var pos = fBegin
    for (h <- hists) {
      val payload = th1dPayload(h.name, h.title, h.nbins, h.xmin, h.xmax,
        h.edges, h.contents, h.sumw2, h.entries)
      val k = new WBuf
      k.i32(0)          // nbytes (patched)
      k.i16(4)          // key version (32-bit seeks)
      k.i32(payload.length) // objLen
      k.i32(0)          // datime
      k.i16(0)          // keyLen (patched)
      k.i16(1)          // cycle
      k.i32(pos)        // seekKey
      k.i32(fBegin)     // seekPdir (top level)
      k.tString("TH1D"); k.tString(h.name); k.tString(h.title)
      val keyLen = k.pos
      val hdr = k.bytes
      val rec = new Array[Byte](keyLen + payload.length)
      System.arraycopy(hdr, 0, rec, 0, keyLen)
      System.arraycopy(payload, 0, rec, keyLen, payload.length)
      val bb = ByteBuffer.wrap(rec).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0, rec.length)        // nbytes
      bb.putShort(14, keyLen.toShort) // keyLen slot (nbytes4+ver2+objLen4+datime4)
      records += rec
      pos += rec.length
    }
    val fEnd = pos
    val hdr = new WBuf
    hdr.u8('r'); hdr.u8('o'); hdr.u8('o'); hdr.u8('t')
    hdr.i32(63200)   // fVersion (small-file format: 32-bit seeks)
    hdr.i32(fBegin)
    hdr.i32(fEnd)
    hdr.i32(fEnd)    // fSeekFree (no free list)
    hdr.i32(0)       // fNbytesFree
    hdr.i32(hists.size) // nfree slot reused as key count hint
    hdr.i32(0)       // fNbytesName
    hdr.u8(4)        // fUnits
    hdr.i32(0)       // fCompress (uncompressed: objLen == dataLen)
    hdr.i32(0); hdr.i32(0) // fSeekInfo, fNbytesInfo (no streamer info)
    hdr.i16(1)       // fUUID version stub
    var i = 0; while (i < 16) { hdr.u8(0); i += 1 }
    val head = java.util.Arrays.copyOf(hdr.bytes, fBegin) // pad to fBEGIN
    val out = java.nio.file.Files.newOutputStream(Paths.get(path))
    try { out.write(head); records.result().foreach(out.write) }
    finally out.close()
  }

  /** Key-chain object scan: keyPos (the record's file offset) uniquely
    * identifies a key even when a file stores several copies of one
    * object under the SAME name and cycle (GoldenJSON pileup does). */
  private def readObjects[T](path: String, classes: Set[String])(
      parse: (Array[Byte], String, String, Int, String, Long) => T): Seq[T] = {
    val out = Seq.newBuilder[T]
    readKeys(path) { (raw, pos, nbytes, cls, keyName, _, cycle, keyLen,
        objLen, dir, _) =>
      if (classes(cls)) {
        val dataOff = pos.toInt + keyLen
        val dataLen = nbytes - keyLen
        val blob = java.util.Arrays.copyOfRange(raw, dataOff, dataOff + dataLen)
        val obj = if (objLen > dataLen) decompress(blob, objLen) else blob
        out += parse(obj, cls, keyName, cycle, dir, pos)
      }
    }
    out.result()
  }
}
