package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipFile

import scala.collection.mutable

/** Pure-JVM reader for PyTorch `.pt` checkpoint files — the format the
  * reference ships its trained VBF DNN folds in
  * (data/trained_models/vbf/models/model_pytorch_test_{fold}.pt, loaded
  * by stage2/mva_evaluators.py:175-181). A `.pt` saved with
  * `torch.save(state_dict)` is, per the public PyTorch serialization
  * format, a ZIP archive: `archive/data.pkl` is a protocol-2 pickle of
  * an OrderedDict(name -> tensor) where each tensor is a
  * `torch._utils._rebuild_tensor_v2(persistent_id, offset, shape,
  * stride, ...)` call and the persistent id names a storage blob
  * (`archive/data/<key>`, raw little-endian scalars). This implements a
  * minimal pickle virtual machine for exactly the opcode subset those
  * files use (pickle opcodes are a public, stable spec) — no torch, no
  * Python. Scope: Float/DoubleStorage, contiguous row-major tensors. */
object TorchPt {

  final case class Tensor(shape: Seq[Int], data: Array[Double]) {
    def apply(i: Int, j: Int): Double = data(i * shape(1) + j)
  }

  private final case class StorageId(dtype: String, key: String, numel: Int)
  private final case class TensorRef(sid: StorageId, offset: Int, shape: Seq[Int])
  private final case class Global(mod: String, name: String)
  private object Mark

  /** Read a state_dict `.pt`: ordered (name -> Tensor). */
  def readStateDict(path: String): Seq[(String, Tensor)] = {
    val zip = new ZipFile(path)
    try {
      val root = zip.stream().filter(_.getName.endsWith("/data.pkl"))
        .findFirst().orElseThrow(() =>
          new IllegalArgumentException(s"$path: no data.pkl — not a torch save"))
      val prefix = root.getName.stripSuffix("data.pkl")
      val pkl = zip.getInputStream(root).readAllBytes()
      val dict = unpickle(pkl, path)
      dict.map { case (name, t) =>
        val entry = zip.getEntry(s"${prefix}data/${t.sid.key}")
        require(entry != null, s"$path: missing storage ${t.sid.key}")
        val raw = zip.getInputStream(entry).readAllBytes()
        val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        val n = t.shape.product
        val width = if (t.sid.dtype == "DoubleStorage") 8 else 4
        require(raw.length >= (t.offset + n) * width,
          s"$path: storage ${t.sid.key} truncated")
        b.position(t.offset * width)
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          out(i) = if (width == 8) b.getDouble() else b.getFloat().toDouble
          i += 1
        }
        name -> Tensor(t.shape, out)
      }
    } finally zip.close()
  }

  /** The pickle VM: protocol-2 subset used by torch state_dict saves. */
  private def unpickle(p: Array[Byte], path: String): Seq[(String, TensorRef)] = {
    val b = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val stack = mutable.ArrayBuffer.empty[Any]
    val memo = mutable.HashMap.empty[Int, Any]
    val out = mutable.LinkedHashMap.empty[String, TensorRef]

    def line(): String = { // readline for GLOBAL's "module\nname\n"
      val sb = new StringBuilder
      var c = b.get()
      while (c != '\n') { sb.append(c.toChar); c = b.get() }
      sb.toString
    }
    def popMark(): Seq[Any] = {
      val i = stack.lastIndexOf(Mark)
      require(i >= 0, s"$path: pickle MARK underflow")
      val items = stack.slice(i + 1, stack.size).toSeq
      stack.remove(i, stack.size - i)
      items
    }
    def reduce(callable: Any, args: Seq[Any]): Any = callable match {
      case Global("collections", "OrderedDict") => out // THE state dict
      case Global("torch._utils", "_rebuild_tensor_v2") =>
        val sid = args(0).asInstanceOf[StorageId]
        val offset = args(1).asInstanceOf[Int]
        val shape = args(2).asInstanceOf[Seq[Any]].map(_.asInstanceOf[Int])
        TensorRef(sid, offset, shape)
      case other => other // inert object (e.g. metadata dict rebuilds)
    }

    var done = false
    while (!done) {
      (b.get() & 0xff) match {
        case 0x80 => b.get() // PROTO
        case '.' => done = true // STOP
        case '(' => stack += Mark
        case ')' => stack += Seq.empty[Any] // EMPTY_TUPLE
        case '}' => stack += mutable.HashMap.empty[Any, Any] // EMPTY_DICT
        case ']' => stack += mutable.ArrayBuffer.empty[Any] // EMPTY_LIST
        case 'c' => stack += Global(line(), line()) // GLOBAL
        case 'q' => memo(b.get() & 0xff) = stack.last // BINPUT
        case 'r' => memo(b.getInt()) = stack.last // LONG_BINPUT
        case 'h' => stack += memo(b.get() & 0xff) // BINGET
        case 'j' => stack += memo(b.getInt()) // LONG_BINGET
        case 'K' => stack += (b.get() & 0xff) // BININT1
        case 'M' => stack += (b.getShort() & 0xffff) // BININT2
        case 'J' => stack += b.getInt() // BININT
        case 'X' => // BINUNICODE
          val n = b.getInt(); val a = new Array[Byte](n); b.get(a)
          stack += new String(a, "UTF-8")
        case 0x8c => // SHORT_BINUNICODE (proto 4)
          val n = b.get() & 0xff; val a = new Array[Byte](n); b.get(a)
          stack += new String(a, "UTF-8")
        case 0x88 => stack += true // NEWTRUE
        case 0x89 => stack += false // NEWFALSE
        case 'N' => stack += null // NONE
        case 't' => val items = popMark(); stack += items // TUPLE
        case 0x85 => val a1 = stack.remove(stack.size - 1); stack += Seq(a1) // TUPLE1
        case 0x86 => // TUPLE2
          val a2 = stack.remove(stack.size - 1); val a1 = stack.remove(stack.size - 1)
          stack += Seq(a1, a2)
        case 0x87 => // TUPLE3
          val a3 = stack.remove(stack.size - 1); val a2 = stack.remove(stack.size - 1)
          val a1 = stack.remove(stack.size - 1); stack += Seq(a1, a2, a3)
        case 'R' => // REDUCE
          val args = stack.remove(stack.size - 1).asInstanceOf[Seq[Any]]
          val callable = stack.remove(stack.size - 1)
          stack += reduce(callable, args)
        case 'Q' => // BINPERSID: pid tuple ('storage', Global(torch, XStorage), key, loc, numel)
          val pid = stack.remove(stack.size - 1).asInstanceOf[Seq[Any]]
          val dtype = pid(1).asInstanceOf[Global].name
          stack += StorageId(dtype, pid(2).asInstanceOf[String],
            pid(4).asInstanceOf[Int])
        case 's' => // SETITEM
          val v = stack.remove(stack.size - 1); val k = stack.remove(stack.size - 1)
          stack.last match {
            case m: mutable.HashMap[Any @unchecked, Any @unchecked] => m(k) = v
            case m: AnyRef if m eq out => v match {
              case t: TensorRef => out(k.asInstanceOf[String]) = t
              case _ => // metadata entry on the state dict — ignore
            }
            case other => sys.error(s"$path: SETITEM on ${other.getClass}")
          }
        case 'u' => // SETITEMS
          val items = popMark()
          stack.last match {
            case m: mutable.HashMap[Any @unchecked, Any @unchecked] =>
              items.grouped(2).foreach { case Seq(k, v) => m(k) = v }
            case m: AnyRef if m eq out =>
              items.grouped(2).foreach {
                case Seq(k: String, t: TensorRef) => out(k) = t
                case _ => // non-tensor entries (metadata) — ignore
              }
            case other => sys.error(s"$path: SETITEMS on ${other.getClass}")
          }
        case 'b' => stack.remove(stack.size - 1) // BUILD: drop state, keep obj
        case 0x94 => memo(memo.size) = stack.last // MEMOIZE (proto 4)
        case op => sys.error(
          s"$path: unsupported pickle opcode 0x${op.toHexString} at ${b.position() - 1}")
      }
    }
    out.toSeq
  }
}
