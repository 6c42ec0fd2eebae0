package graft.sources

import scala.collection.mutable

/** Minimal pure-Scala HDF5 codec for the subset a pandas `HDFStore`
  * (fixed format — what tabata's Opset uses, reference opset.py:52-74,
  * 96-105) actually writes: superblock version 0, version-1 group
  * b-trees + local heaps + symbol-table nodes, version-1 object headers,
  * CONTIGUOUS little-endian datasets of float64/float32/int64/int32 and
  * fixed-length strings, 1-D or 2-D. Written against the public HDF5
  * File Format Specification (v1.8); no HDF5 library ships in this
  * build's offline dependency set, and the migration path
  * ([[Hdf5Opset]]) only needs this subset.
  *
  * Out of scope, REJECTED LOUDLY rather than misread: chunked/compressed
  * layouts (re-save the store uncompressed — pandas fixed format without
  * `complevel` is contiguous), superblock v2/v3 (h5py `libver='latest'`),
  * variable-length strings, big-endian data.
  *
  * Scale note: an .h5 store is a single unsplittable driver-side file by
  * nature — this codec exists for the ONE-TIME migration of existing
  * tabata stores into the long-format parquet every graft operator runs
  * on, not as a data source for distributed scans. Many stores migrate
  * in parallel with one task per file ([[Hdf5Opset.convert]] per path).
  */
object Hdf5 {

  private val Signature: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF — the "undefined address"

  // ---------------------------------------------------------------------
  // typed dataset payloads
  // ---------------------------------------------------------------------

  sealed trait H5Data { def length: Int }
  final case class F64(values: Array[Double]) extends H5Data { def length: Int = values.length }
  final case class I64(values: Array[Long]) extends H5Data { def length: Int = values.length }
  final case class Str(values: Array[String]) extends H5Data { def length: Int = values.length }

  /** A dataset: `dims` as stored (row-major / C order), typed payload. */
  final case class H5Dataset(dims: Array[Long], data: H5Data)

  /** A group: child datasets by name, child groups by name. */
  final case class H5Group(datasets: Map[String, H5Dataset], groups: Map[String, H5Group])

  // ---------------------------------------------------------------------
  // little-endian growable buffer with back-patching (writer)
  // ---------------------------------------------------------------------

  private final class Buf {
    private var arr = new Array[Byte](1 << 16)
    var pos: Int = 0
    private def ensure(n: Int): Unit =
      if (pos + n > arr.length) {
        var cap = arr.length
        while (cap < pos + n) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def u8(v: Int): Unit = { ensure(1); arr(pos) = v.toByte; pos += 1 }
    def u16(v: Int): Unit = { u8(v & 0xff); u8((v >> 8) & 0xff) }
    def u32(v: Long): Unit = { u16((v & 0xffff).toInt); u16(((v >> 16) & 0xffff).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xffffffffL); u32((v >>> 32) & 0xffffffffL) }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, arr, pos, b.length); pos += b.length }
    def zeros(n: Int): Unit = { ensure(n); pos += n } // arr is zero-initialized
    def patchU64(at: Int, v: Long): Unit = {
      var i = 0; var x = v
      while (i < 8) { arr(at + i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(arr, pos)
  }

  // ---------------------------------------------------------------------
  // writer
  // ---------------------------------------------------------------------

  /** Serialize a root group (one level of sub-groups, as pandas stores
    * one group per DataFrame) to HDF5 bytes. Sub-group and dataset counts
    * per group are capped at 256 (a single-level v1 b-tree at the
    * superblock's K values) — far above any fixture, and the READER
    * walks arbitrary depth regardless.
    */
  def write(root: H5Group): Array[Byte] = {
    val buf = new Buf
    // superblock v0
    buf.bytes(Signature)
    buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0) // versions: sb, freespace, root STE, reserved
    buf.u8(0)                                  // shared header msg version
    buf.u8(8); buf.u8(8); buf.u8(0)            // sizeof offsets, lengths, reserved
    buf.u16(4); buf.u16(16)                    // group leaf K, group internal K
    buf.u32(0)                                 // consistency flags
    buf.u64(0)                                 // base address
    buf.u64(Undef)                             // free-space address
    val eofPatch = buf.pos; buf.u64(0)         // end-of-file address (patched)
    buf.u64(Undef)                             // driver info address
    // root symbol-table entry
    buf.u64(0)                                 // link name offset (root: none)
    val rootHdrPatch = buf.pos; buf.u64(0)     // object header address (patched)
    buf.u32(0); buf.u32(0)                     // cache type 0, reserved
    buf.u64(0); buf.u64(0)                     // scratch

    val rootAddr = writeGroup(buf, root)
    buf.patchU64(rootHdrPatch, rootAddr)
    buf.patchU64(eofPatch, buf.pos.toLong)
    buf.result()
  }

  /** Write `root` to a file path. */
  def writeFile(path: String, root: H5Group): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path), write(root))

  private def align8(b: Buf): Unit = while (b.pos % 8 != 0) b.u8(0)

  /** One object-header-v1 message, body written by `body` then padded
    * to 8 bytes. Returns nothing; message count handled by caller.
    */
  private def message(b: Buf, tpe: Int)(body: Buf => Unit): Unit = {
    val tmp = new Buf
    body(tmp)
    val raw = tmp.result()
    val padded = (raw.length + 7) / 8 * 8
    b.u16(tpe); b.u16(padded); b.u8(0); b.u8(0); b.u8(0); b.u8(0)
    b.bytes(raw); b.zeros(padded - raw.length)
  }

  /** Object header v1 around pre-rendered messages. Returns its address. */
  private def objectHeader(b: Buf, msgs: Seq[Array[Byte]]): Long = {
    align8(b)
    val addr = b.pos.toLong
    val total = msgs.map(_.length).sum
    b.u8(1); b.u8(0)          // version, reserved
    b.u16(msgs.length)        // message count
    b.u32(1)                  // reference count
    b.u32(total.toLong)       // header size (messages only)
    b.u32(0)                  // 4-byte pad: message data is 8-byte aligned
    msgs.foreach(b.bytes)
    addr
  }

  private def renderMessage(tpe: Int)(body: Buf => Unit): Array[Byte] = {
    val tmp = new Buf
    message(tmp, tpe)(body)
    tmp.result()
  }

  private def dataspaceMsg(dims: Array[Long]): Array[Byte] =
    renderMessage(0x0001) { m =>
      m.u8(1); m.u8(dims.length); m.u8(0); m.u8(0); m.u32(0)
      dims.foreach(m.u64)
    }

  private def datatypeMsg(data: H5Data, strSize: Int): Array[Byte] =
    renderMessage(0x0003) { m =>
      data match {
        case _: F64 =>
          m.u8(0x11)                      // version 1, class 1 (float)
          m.u8(0x20); m.u8(0x3f); m.u8(0) // LE, implied-msb norm, sign bit 63
          m.u32(8)
          m.u16(0); m.u16(64)             // bit offset, precision
          m.u8(52); m.u8(11)              // exponent location, size
          m.u8(0); m.u8(52)               // mantissa location, size
          m.u32(1023)                     // exponent bias
        case _: I64 =>
          m.u8(0x10)                      // version 1, class 0 (fixed-point)
          m.u8(0x08); m.u8(0); m.u8(0)    // LE, signed
          m.u32(8)
          m.u16(0); m.u16(64)
        case _: Str =>
          m.u8(0x13)                      // version 1, class 3 (string)
          m.u8(0); m.u8(0); m.u8(0)       // null-terminated, ASCII
          m.u32(strSize.toLong)
      }
    }

  private def layoutMsg(addr: Long, size: Long): Array[Byte] =
    renderMessage(0x0008) { m =>
      m.u8(3); m.u8(1) // version 3, contiguous
      m.u64(addr); m.u64(size)
    }

  private def writeDataset(b: Buf, ds: H5Dataset): Long = {
    val n = ds.dims.product.toInt
    require(ds.data.length == n,
      s"Hdf5.write: dims ${ds.dims.mkString("x")} != ${ds.data.length} values")
    // raw data first (so the layout message knows the address)
    align8(b)
    val dataAddr = b.pos.toLong
    val (size, strSize) = ds.data match {
      case F64(v) => v.foreach(x => b.u64(java.lang.Double.doubleToLongBits(x))); (8L * n, 0)
      case I64(v) => v.foreach(b.u64); (8L * n, 0)
      case Str(v) =>
        val w = math.max(1, if (v.isEmpty) 1 else v.map(_.getBytes("UTF-8").length).max)
        v.foreach { s =>
          val raw = s.getBytes("UTF-8")
          require(raw.length <= w, "unreachable: width is the max")
          b.bytes(raw); b.zeros(w - raw.length)
        }
        (w.toLong * n, w)
    }
    objectHeader(b, Seq(dataspaceMsg(ds.dims), datatypeMsg(ds.data, strSize),
      layoutMsg(dataAddr, size)))
  }

  /** Write a group (its children first, then heap/SNODs/b-tree/header).
    * Returns the group's object-header address.
    */
  private def writeGroup(b: Buf, g: H5Group): Long = {
    val children: Seq[(String, Either[H5Group, H5Dataset])] =
      (g.groups.toSeq.map { case (n, c) => n -> Left(c) } ++
        g.datasets.toSeq.map { case (n, d) => n -> Right(d) }).sortBy(_._1)
    require(children.size <= 256,
      s"Hdf5.write: ${children.size} children in one group exceeds the single-level b-tree cap (256)")
    val childAddrs = children.map {
      case (n, Left(cg)) => n -> writeGroup(b, cg)
      case (n, Right(d)) => n -> writeDataset(b, d)
    }
    // local heap: offset 0 = empty string (the b-tree's low sentinel key)
    val heapData = new Buf
    heapData.zeros(8)
    val nameOff = childAddrs.map { case (n, _) =>
      val off = heapData.pos.toLong
      heapData.bytes(n.getBytes("UTF-8")); heapData.u8(0)
      while (heapData.pos % 8 != 0) heapData.u8(0)
      n -> off
    }.toMap
    align8(b)
    val heapAddr = b.pos.toLong
    val hd = heapData.result()
    b.bytes("HEAP".getBytes("US-ASCII")); b.u8(0); b.u8(0); b.u8(0); b.u8(0)
    b.u64(hd.length.toLong); b.u64(Undef)
    val heapDataPatch = b.pos; b.u64(0)
    align8(b)
    b.patchU64(heapDataPatch, b.pos.toLong)
    b.bytes(hd)
    // symbol-table nodes: up to 2*K_leaf = 8 sorted entries each
    val snods = childAddrs.grouped(8).toSeq
    val snodAddrs = snods.map { grp =>
      align8(b)
      val addr = b.pos.toLong
      b.bytes("SNOD".getBytes("US-ASCII")); b.u8(1); b.u8(0)
      b.u16(grp.size)
      grp.foreach { case (n, hdrAddr) =>
        b.u64(nameOff(n)); b.u64(hdrAddr); b.u32(0); b.u32(0); b.u64(0); b.u64(0)
      }
      b.zeros((8 - grp.size) * 40) // unused slots of the fixed-capacity node
      addr
    }
    // b-tree v1, single level-0 node (capacity 2*K_internal = 32 SNODs)
    align8(b)
    val btreeAddr = b.pos.toLong
    b.bytes("TREE".getBytes("US-ASCII")); b.u8(0); b.u8(0)
    b.u16(snodAddrs.size)
    b.u64(Undef); b.u64(Undef)
    b.u64(0) // key 0: empty string (heap offset 0) — below every name
    snods.zip(snodAddrs).foreach { case (grp, addr) =>
      b.u64(addr)
      b.u64(nameOff(grp.last._1)) // key i+1: largest name in child i
    }
    b.zeros((32 - snodAddrs.size) * 16)
    // group object header: one symbol-table message
    objectHeader(b, Seq(renderMessage(0x0011) { m => m.u64(btreeAddr); m.u64(heapAddr) }))
  }

  // ---------------------------------------------------------------------
  // reader
  // ---------------------------------------------------------------------

  private final class Rd(val a: Array[Byte]) {
    def u8(p: Int): Int = a(p) & 0xff
    def u16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    def u32(p: Int): Long = (u16(p).toLong | (u16(p + 2).toLong << 16)) & 0xffffffffL
    def u64(p: Int): Long = u32(p) | (u32(p + 4) << 32)
    def ascii(p: Int, n: Int): String = new String(a, p, n, "US-ASCII")
    /** NUL-terminated string at `p`. */
    def cstr(p: Int): String = {
      var e = p
      while (e < a.length && a(e) != 0) e += 1
      new String(a, p, e - p, "UTF-8")
    }
  }

  /** Parse HDF5 bytes into the root [[H5Group]]. */
  def read(bytes: Array[Byte]): H5Group = {
    val r = new Rd(bytes)
    require(bytes.length > 96 && (0 until 8).forall(i => bytes(i) == Signature(i)),
      "Hdf5.read: not an HDF5 file (bad signature)")
    require(r.u8(8) == 0,
      s"Hdf5.read: superblock version ${r.u8(8)} unsupported (only v0 — " +
        "re-save without libver='latest')")
    require(r.u8(13) == 8 && r.u8(14) == 8,
      "Hdf5.read: only 8-byte offsets/lengths supported")
    // superblock v0: root symbol-table entry at offset 24+8+8+8+8 = 56;
    // its object-header address is the second 8-byte field
    val rootHeader = r.u64(56 + 8)
    readGroupAt(r, rootHeader)
  }

  def readFile(path: String): H5Group =
    read(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** All (type, bodyOffset, bodySize) messages of a v1 object header,
    * following continuation blocks.
    */
  private def messagesAt(r: Rd, addr: Long): Seq[(Int, Int, Int)] = {
    require(r.u8(addr.toInt) == 1,
      s"Hdf5.read: object header version ${r.u8(addr.toInt)} at $addr unsupported (only v1)")
    val count = r.u16(addr.toInt + 2)
    val out = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    // blocks of (start, length); the first starts after the 16-byte prologue
    var blocks = List((addr.toInt + 16, r.u32(addr.toInt + 8).toInt))
    while (blocks.nonEmpty && out.size < count) {
      val (start, len) = blocks.head
      blocks = blocks.tail
      var p = start
      while (p + 8 <= start + len && out.size < count) {
        val tpe = r.u16(p); val size = r.u16(p + 2)
        if (tpe == 0x0010) // continuation: body = (offset, length)
          blocks = (r.u64(p + 8).toInt, r.u64(p + 16).toInt) :: blocks
        else if (tpe != 0x0000)
          out += ((tpe, p + 8, size))
        p += 8 + size
      }
    }
    out.toSeq
  }

  private def readGroupAt(r: Rd, headerAddr: Long): H5Group = {
    val msgs = messagesAt(r, headerAddr)
    val st = msgs.find(_._1 == 0x0011).getOrElse(
      throw new IllegalArgumentException(s"Hdf5.read: no symbol-table message at $headerAddr"))
    val btree = r.u64(st._2); val heap = r.u64(st._2 + 8)
    require(r.ascii(heap.toInt, 4) == "HEAP", "Hdf5.read: bad local heap signature")
    val heapData = r.u64(heap.toInt + 24)
    val datasets = mutable.LinkedHashMap.empty[String, H5Dataset]
    val groups = mutable.LinkedHashMap.empty[String, H5Group]
    def walkBtree(node: Long): Unit = {
      require(r.ascii(node.toInt, 4) == "TREE", "Hdf5.read: bad b-tree signature")
      val level = r.u8(node.toInt + 5)
      val used = r.u16(node.toInt + 6)
      var p = node.toInt + 24 + 8 // skip key 0
      (0 until used).foreach { _ =>
        val child = r.u64(p); p += 16 // child, key i+1
        if (level > 0) walkBtree(child)
        else {
          require(r.ascii(child.toInt, 4) == "SNOD", "Hdf5.read: bad SNOD signature")
          val n = r.u16(child.toInt + 6)
          (0 until n).foreach { i =>
            val e = child.toInt + 8 + i * 40
            val name = r.cstr((heapData + r.u64(e)).toInt)
            val hdr = r.u64(e + 8)
            val childMsgs = messagesAt(r, hdr)
            if (childMsgs.exists(_._1 == 0x0011)) groups(name) = readGroupAt(r, hdr)
            else datasets(name) = readDatasetAt(r, childMsgs)
          }
        }
      }
    }
    walkBtree(btree)
    H5Group(datasets.toMap, groups.toMap)
  }

  private def readDatasetAt(r: Rd, msgs: Seq[(Int, Int, Int)]): H5Dataset = {
    val sp = msgs.find(_._1 == 0x0001).getOrElse(
      throw new IllegalArgumentException("Hdf5.read: dataset without dataspace"))
    val spVersion = r.u8(sp._2)
    val (rank, dims0) = spVersion match {
      case 1 => (r.u8(sp._2 + 1), sp._2 + 8)
      case 2 => (r.u8(sp._2 + 1), sp._2 + 4)
      case v => throw new IllegalArgumentException(s"Hdf5.read: dataspace version $v unsupported")
    }
    val dims = Array.tabulate(rank)(i => r.u64(dims0 + 8 * i))
    val n = if (rank == 0) 1 else dims.product.toInt

    val dt = msgs.find(_._1 == 0x0003).getOrElse(
      throw new IllegalArgumentException("Hdf5.read: dataset without datatype"))
    val clsVer = r.u8(dt._2)
    val cls = clsVer & 0x0f
    val bits0 = r.u8(dt._2 + 1)
    val tsize = r.u32(dt._2 + 4).toInt
    require((bits0 & 0x01) == 0 || cls == 3,
      "Hdf5.read: big-endian data unsupported (re-save on a little-endian host)")

    val lay = msgs.find(_._1 == 0x0008).getOrElse(
      throw new IllegalArgumentException("Hdf5.read: dataset without data layout"))
    val layVersion = r.u8(lay._2)
    val dataAddr: Long = layVersion match {
      case 3 =>
        val layClass = r.u8(lay._2 + 1)
        require(layClass == 1,
          s"Hdf5.read: layout class $layClass unsupported (only CONTIGUOUS — " +
            "re-save the store without compression/chunking)")
        r.u64(lay._2 + 2)
      case 1 | 2 =>
        // v1/v2: version, dimensionality, class at +2, reserved(5), address
        val layClass = r.u8(lay._2 + 2)
        require(layClass == 1, s"Hdf5.read: layout class $layClass unsupported (only contiguous)")
        r.u64(lay._2 + 8)
      case v => throw new IllegalArgumentException(s"Hdf5.read: layout version $v unsupported")
    }
    val base = dataAddr.toInt

    val data: H5Data = cls match {
      case 1 => // float
        tsize match {
          case 8 => F64(Array.tabulate(n)(i => java.lang.Double.longBitsToDouble(r.u64(base + 8 * i))))
          case 4 => F64(Array.tabulate(n)(i => java.lang.Float.intBitsToFloat(r.u32(base + 4 * i).toInt).toDouble))
          case s => throw new IllegalArgumentException(s"Hdf5.read: float$s unsupported")
        }
      case 0 => // fixed-point
        val signed = (bits0 & 0x08) != 0
        tsize match {
          case 8 => I64(Array.tabulate(n)(i => r.u64(base + 8 * i)))
          case 4 => I64(Array.tabulate(n)(i =>
            if (signed) r.u32(base + 4 * i).toInt.toLong else r.u32(base + 4 * i)))
          case 2 => I64(Array.tabulate(n)(i =>
            if (signed) r.u16(base + 2 * i).toShort.toLong else r.u16(base + 2 * i).toLong))
          case 1 => I64(Array.tabulate(n)(i =>
            if (signed) r.a(base + i).toLong else r.u8(base + i).toLong))
          case s => throw new IllegalArgumentException(s"Hdf5.read: int$s unsupported")
        }
      case 3 => // fixed-length string, NUL-padded/terminated
        Str(Array.tabulate(n) { i =>
          val start = base + tsize * i
          var e = 0
          while (e < tsize && r.a(start + e) != 0) e += 1
          new String(r.a, start, e, "UTF-8")
        })
      case c => throw new IllegalArgumentException(
        s"Hdf5.read: datatype class $c unsupported (float/int/fixed-string only)")
    }
    H5Dataset(dims, data)
  }
}
