package graft.sources

import java.nio.charset.StandardCharsets

/** Minimal Python-pickle READER for petastorm metadata — the JVM
  * side of schema auto-derivation: `make_reader`'s schema is a
  * pickled `Unischema` in `_common_metadata`
  * (etl/dataset_metadata.py:356-386), and parsing it here means a
  * graft reader opens ANY petastorm store without the user
  * re-declaring fields. The pickle wire format is the public stdlib
  * spec (`pickletools`); this VM covers the opcode set CPython's
  * pickler emits for Unischema objects across protocols 0-5 — the
  * 0.7.6 legacy fixtures (protocol 0: memoized text opcodes), py2/3
  * protocol 2 (binary ints/strings, NEWOBJ), and modern protocol 4/5
  * (framing, STACK_GLOBAL, MEMOIZE, short unicode).
  *
  * This is NOT a general unpickler: no class is ever instantiated
  * and nothing executes — REDUCE/NEWOBJ/BUILD produce inert
  * [[PickleReader.PyObject]] records (class name + args + state),
  * which is exactly why parsing untrusted metadata here is safe
  * where Python's `pickle.loads` is not. Unsupported opcodes fail
  * loudly with the opcode position. */
object PickleReader {

  sealed trait Py
  case object PyNone extends Py
  final case class PyBool(b: Boolean) extends Py
  final case class PyLong(v: Long) extends Py
  final case class PyFloat(v: Double) extends Py
  final case class PyString(s: String) extends Py
  final case class PyBytes(b: Vector[Byte]) extends Py
  final case class PyGlobal(module: String, name: String) extends Py
  final case class PyTuple(items: Vector[Py]) extends Py
  final class PyList(val items: scala.collection.mutable.ArrayBuffer[Py])
      extends Py {
    override def toString: String = s"PyList(${items.mkString(", ")})"
  }
  final class PyDict(
      val m: scala.collection.mutable.LinkedHashMap[Py, Py]) extends Py {
    def get(key: String): Option[Py] = m.get(PyString(key))
    override def toString: String = s"PyDict(${m.mkString(", ")})"
  }
  /** Inert stand-in for an instantiated object: `cls(args*)` with
    * attribute `state` applied by BUILD. */
  final class PyObject(val cls: PyGlobal, var args: Vector[Py],
      val state: scala.collection.mutable.LinkedHashMap[Py, Py])
      extends Py {
    def attr(name: String): Option[Py] = state.get(PyString(name))
    override def toString: String =
      s"PyObject(${cls.module}.${cls.name}, args=$args, state=$state)"
  }

  private val Reconstructors =
    Set(("copyreg", "_reconstructor"), ("copy_reg", "_reconstructor"))

  /** Parse `data`; ANY malformation — unknown opcode, truncation,
    * stack underflow, bad numbers — surfaces as
    * IllegalArgumentException with the failing byte position (the
    * fuzz contract: adversarial input cannot leak raw
    * IndexOutOfBounds/NoSuchElement errors, let alone hang). */
  def loads(data: Array[Byte]): Py =
    try loadsUnsafe(data)
    catch {
      case e: IllegalArgumentException => throw e
      case e: Exception =>
        throw new IllegalArgumentException(
          s"malformed pickle: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def loadsUnsafe(data: Array[Byte]): Py = {
    var i = 0
    val stack = scala.collection.mutable.ArrayBuffer.empty[Py]
    val marks = scala.collection.mutable.ArrayBuffer.empty[Int]
    val memo = scala.collection.mutable.HashMap.empty[Int, Py]
    var memoNext = 0

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"pickle parse error at byte ${i - 1}: $msg")
    def u8(): Int = { val v = data(i) & 0xff; i += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u16() | (u16() << 16)
    def u32(): Long = i32().toLong & 0xffffffffL
    def readLine(): String = {
      val start = i
      while (i < data.length && data(i) != '\n') i += 1
      require(i < data.length, "unterminated line opcode")
      val s = new String(data, start, i - start, StandardCharsets.US_ASCII)
      i += 1
      s
    }
    def take(n: Int): Array[Byte] = {
      require(n >= 0 && i + n <= data.length, s"short read of $n bytes")
      val a = java.util.Arrays.copyOfRange(data, i, i + n); i += n; a
    }
    def pop(): Py = {
      require(stack.nonEmpty, "pop on empty pickle stack")
      stack.remove(stack.length - 1)
    }
    def popToMark(): Vector[Py] = {
      require(marks.nonEmpty, "no MARK on stack")
      val m = marks.remove(marks.length - 1)
      val items = stack.slice(m, stack.length).toVector
      stack.remove(m, stack.length - m)
      items
    }
    def put(id: Int): Unit = memo(id) = stack.last
    def memoize(): Unit = { memo(memoNext) = stack.last; memoNext += 1 }
    def setItems(pairs: Vector[Py], target: Py): Unit = target match {
      case d: PyDict =>
        pairs.grouped(2).foreach {
          case Vector(k, v) => d.m(k) = v
          case _ => fail("odd SETITEMS arity")
        }
      case o => fail(s"SETITEM(S) on non-dict $o")
    }
    /** Unquote a protocol-0 STRING repr (ASCII + \\ escapes). */
    def unrepr(s: String): String = {
      require(s.length >= 2 && (s.head == '\'' || s.head == '"') &&
        s.last == s.head, s"bad STRING repr: $s")
      val body = s.substring(1, s.length - 1)
      val sb = new StringBuilder
      var j = 0
      while (j < body.length) {
        val c = body.charAt(j)
        if (c == '\\' && j + 1 < body.length) {
          body.charAt(j + 1) match {
            case '\\' => sb.append('\\'); j += 2
            case '\'' => sb.append('\''); j += 2
            case '"' => sb.append('"'); j += 2
            case 'n' => sb.append('\n'); j += 2
            case 't' => sb.append('\t'); j += 2
            case 'x' =>
              sb.append(Integer.parseInt(body.substring(j + 2, j + 4), 16)
                .toChar)
              j += 4
            case o => fail(s"unsupported string escape \\$o")
          }
        } else { sb.append(c); j += 1 }
      }
      sb.toString
    }
    def reduce(callable: Py, argsV: Py): Py = {
      val args = argsV match {
        case PyTuple(it) => it
        case o => Vector(o)
      }
      callable match {
        case g @ PyGlobal(m, n) if Reconstructors((m, n)) =>
          // _reconstructor(cls, base, basestate): for tuple-based
          // classes (UnischemaField) basestate IS the content tuple
          require(args.length == 3, s"_reconstructor arity ${args.length}")
          val cls = args(0) match {
            case c: PyGlobal => c
            case o => fail(s"_reconstructor cls is $o")
          }
          val callArgs = args(2) match {
            case PyTuple(it) => it
            case PyNone => Vector.empty[Py]
            case o => Vector(o)
          }
          new PyObject(cls, callArgs,
            scala.collection.mutable.LinkedHashMap.empty)
        case PyGlobal("collections", "OrderedDict") =>
          val d = new PyDict(scala.collection.mutable.LinkedHashMap.empty)
          args.headOption match {
            case Some(l: PyList) => l.items.foreach {
              case PyTuple(Vector(k, v)) => d.m(k) = v
              case p: PyList if p.items.length == 2 =>
                d.m(p.items(0)) = p.items(1) // py2 pickles pairs as lists
              case o => fail(s"OrderedDict pair is $o")
            }
            case _ => ()
          }
          d
        case g: PyGlobal =>
          new PyObject(g, args,
            scala.collection.mutable.LinkedHashMap.empty)
        case o => fail(s"REDUCE callable is $o")
      }
    }

    while (i < data.length) {
      val op = u8()
      (op: @annotation.switch) match {
        case 0x80 => u8() // PROTO version
        case 0x95 => take(8) // FRAME length (advisory)
        case '.' =>
          val r = pop()
          return r
        case 'c' =>
          stack += PyGlobal(readLine(), readLine())
        case 0x93 => // STACK_GLOBAL
          val name = pop(); val mod = pop()
          (mod, name) match {
            case (PyString(m), PyString(n)) => stack += PyGlobal(m, n)
            case o => fail(s"STACK_GLOBAL on $o")
          }
        case '(' => marks += stack.length
        case ')' => stack += PyTuple(Vector.empty)
        case 't' => stack += PyTuple(popToMark())
        case 0x85 => stack += PyTuple(Vector(pop()))
        case 0x86 =>
          val b = pop(); val a = pop(); stack += PyTuple(Vector(a, b))
        case 0x87 =>
          val c = pop(); val b = pop(); val a = pop()
          stack += PyTuple(Vector(a, b, c))
        case '}' =>
          stack += new PyDict(scala.collection.mutable.LinkedHashMap.empty)
        case 'd' =>
          val d = new PyDict(scala.collection.mutable.LinkedHashMap.empty)
          setItems(popToMark(), d)
          stack += d
        case 's' =>
          val v = pop(); val k = pop()
          setItems(Vector(k, v), stack.last)
        case 'u' => // SETITEMS
          val pairs = popToMark()
          setItems(pairs, stack.last)
        case ']' =>
          stack += new PyList(scala.collection.mutable.ArrayBuffer.empty)
        case 'l' =>
          stack += new PyList(
            scala.collection.mutable.ArrayBuffer.from(popToMark()))
        case 'a' =>
          val v = pop()
          stack.last match {
            case l: PyList => l.items += v
            case o => fail(s"APPEND on $o")
          }
        case 'e' =>
          val vs = popToMark()
          stack.last match {
            case l: PyList => l.items ++= vs
            case o => fail(s"APPENDS on $o")
          }
        case 'N' => stack += PyNone
        case 0x88 => stack += PyBool(true)
        case 0x89 => stack += PyBool(false)
        case 'I' =>
          readLine() match {
            case "01" => stack += PyBool(true)
            case "00" => stack += PyBool(false)
            case s => stack += PyLong(s.toLong)
          }
        case 'L' =>
          stack += PyLong(readLine().stripSuffix("L").toLong)
        case 'J' => stack += PyLong(i32().toLong)
        case 'K' => stack += PyLong(u8().toLong)
        case 'M' => stack += PyLong(u16().toLong)
        case 0x8a => // LONG1: n bytes little-endian two's complement
          val n = u8()
          require(n <= 8, s"LONG1 of $n bytes exceeds Long")
          val bs = take(n)
          var v = 0L
          var k = n - 1
          while (k >= 0) { v = (v << 8) | (bs(k) & 0xffL); k -= 1 }
          if (n > 0 && n < 8 && (bs(n - 1) & 0x80) != 0)
            v -= (1L << (8 * n)) // sign-extend
          stack += PyLong(v)
        case 'F' => stack += PyFloat(readLine().toDouble)
        case 'G' =>
          val bs = take(8)
          var bits = 0L
          bs.foreach(b => bits = (bits << 8) | (b & 0xffL))
          stack += PyFloat(java.lang.Double.longBitsToDouble(bits))
        case 'S' => stack += PyString(unrepr(readLine()))
        case 'V' => stack += PyString(readLine())
        case 'U' =>
          stack += PyString(new String(take(u8()),
            StandardCharsets.ISO_8859_1))
        case 'T' =>
          stack += PyString(new String(take(i32()),
            StandardCharsets.ISO_8859_1))
        case 'X' =>
          stack += PyString(new String(take(i32()), StandardCharsets.UTF_8))
        case 0x8c =>
          stack += PyString(new String(take(u8()), StandardCharsets.UTF_8))
        case 'B' => stack += PyBytes(take(i32()).toVector)
        case 'C' => stack += PyBytes(take(u8()).toVector)
        case 'p' => put(readLine().toInt)
        case 'q' => put(u8())
        case 'r' => put(i32())
        case 0x94 => memoize()
        case 'g' => stack += memo.getOrElse(readLine().toInt,
          fail("GET of unknown memo id"))
        case 'h' => stack += memo.getOrElse(u8(), fail("BINGET unknown"))
        case 'j' => stack += memo.getOrElse(i32(),
          fail("LONG_BINGET unknown"))
        case 'R' =>
          val args = pop(); val callable = pop()
          stack += reduce(callable, args)
        case 0x81 => // NEWOBJ: cls.__new__(cls, *args)
          val args = pop(); val cls = pop()
          (cls, args) match {
            case (g: PyGlobal, PyTuple(it)) =>
              stack += new PyObject(g, it,
                scala.collection.mutable.LinkedHashMap.empty)
            case o => fail(s"NEWOBJ on $o")
          }
        case 'b' => // BUILD
          val state = pop()
          (stack.last, state) match {
            case (o: PyObject, d: PyDict) => o.state ++= d.m
            case (o: PyObject, PyNone) => ()
            case (tgt, st) => fail(s"BUILD of $st on $tgt")
          }
        case other =>
          fail(f"unsupported pickle opcode 0x$other%02x " +
            s"('${other.toChar}')")
      }
    }
    fail("pickle ended without STOP")
  }
}
