package graft.analysis

import scala.collection.mutable

/** Minimal reader for the reference's serialized FST format — enough to
  * ENUMERATE every (input string, output) pair of kuromoji's
  * TokenInfoDictionary FST so the Japanese surface lexicon can be
  * recovered from the module's own shipped data.
  *
  * Format source (all reference, lucene/core/.../util/fst/):
  *  - FST.java:82-141 (flag bits, versions), :636-648 (readLabel),
  *    constructor at :FST(DataInput) — codec header, packed flag,
  *    optional empty output, input type, packed node-ref map, startNode,
  *    counts, byte store;
  *  - FST.java readFirstRealTargetArc/readNextRealArc/seekToNextNode
  *    (:975-1330) — fixed-array vs list nodes, BIT_TARGET_NEXT layout,
  *    packed targets (BIT_TARGET_DELTA / node-ref deref / absolute);
  *  - PackedInts.java getReader — the node-ref map's packed codec
  *    (PACKED format, byte-aligned in version 2; kuromoji's map is
  *    bpv=24, i.e. Packed8ThreeBlocks);
  *  - PositiveIntOutputs.java — outputs are plain VLongs.
  *
  * Only the PACKED on-disk variant is supported (forward byte reader;
  * kuromoji ships packed FSTs); the unpacked reverse-reader variant is
  * refused loudly.
  */
object LuceneFst {

  private val BitFinalArc = 1
  private val BitLastArc = 2
  private val BitTargetNext = 4
  private val BitStopNode = 8
  private val BitArcHasOutput = 16
  private val BitArcHasFinalOutput = 32
  private val BitTargetDelta = 64
  private val ArcsAsFixedArray = BitArcHasFinalOutput
  private val CodecMagic = 0x3fd76c17

  /** Forward cursor over a byte array (Lucene DataInput subset:
    * big-endian fixed ints, MSB-continuation varints). */
  private final class In(val b: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = b(pos) & 0xFF; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def i32(): Int = (u8() << 24) | (u8() << 16) | (u8() << 8) | u8()
    def vInt(): Int = {
      var v = u8(); var r = v & 0x7F; var sh = 7
      while ((v & 0x80) != 0) { v = u8(); r |= (v & 0x7F) << sh; sh += 7 }
      r
    }
    def vLong(): Long = {
      var v = u8(); var r = (v & 0x7FL); var sh = 7
      while ((v & 0x80) != 0) { v = u8(); r |= (v & 0x7FL) << sh; sh += 7 }
      r
    }
    def checkHeader(codec: String): Int = {
      require(i32() == CodecMagic, s"bad codec magic before '$codec'")
      val len = vInt()
      val name = new String(b, pos, len, "UTF-8"); pos += len
      require(name == codec, s"expected codec '$codec', got '$name'")
      i32() // version
    }
  }

  private final class Arc {
    var flags = 0; var label = 0
    var output = 0L; var finalOutput = 0L
    var target = 0L; var nextArc = 0L
    var bytesPerArc = 0; var posArcsStart = 0L
    var arcIdx = 0; var numArcs = 0
    def flag(f: Int): Boolean = (flags & f) != 0
  }

  final class Fst private[LuceneFst] (bytes: Array[Byte], startNode: Long,
                                      nodeRef: Array[Long], inputType: Int) {

    private def readLabel(in: In): Int = inputType match {
      case 0 => in.u8()
      case 1 => in.u16()
      case _ => in.vInt()
    }

    private def readFirstRealTargetArc(node: Long, arc: Arc, in: In): Arc = {
      in.pos = node.toInt
      if (in.u8() == ArcsAsFixedArray) {
        arc.numArcs = in.vInt()
        arc.bytesPerArc = in.vInt()
        arc.arcIdx = -1
        arc.posArcsStart = in.pos; arc.nextArc = in.pos
      } else {
        arc.nextArc = node
        arc.bytesPerArc = 0
      }
      readNextRealArc(arc, in)
    }

    private def seekToNextNode(in: In): Unit = {
      var done = false
      while (!done) {
        val flags = in.u8()
        readLabel(in)
        if ((flags & BitArcHasOutput) != 0) in.vLong()
        if ((flags & BitArcHasFinalOutput) != 0) in.vLong()
        if ((flags & BitStopNode) == 0 && (flags & BitTargetNext) == 0)
          in.vLong()
        done = (flags & BitLastArc) != 0
      }
    }

    private def readNextRealArc(arc: Arc, in: In): Arc = {
      if (arc.bytesPerArc != 0) {
        arc.arcIdx += 1
        in.pos = (arc.posArcsStart + arc.arcIdx.toLong * arc.bytesPerArc).toInt
      } else in.pos = arc.nextArc.toInt
      arc.flags = in.u8()
      arc.label = readLabel(in)
      arc.output = if (arc.flag(BitArcHasOutput)) in.vLong() else 0L
      arc.finalOutput = if (arc.flag(BitArcHasFinalOutput)) in.vLong() else 0L
      if (arc.flag(BitStopNode)) {
        arc.target = if (arc.flag(BitFinalArc)) -1L else 0L
        arc.nextArc = in.pos
      } else if (arc.flag(BitTargetNext)) {
        arc.nextArc = in.pos
        if (!arc.flag(BitLastArc)) {
          if (arc.bytesPerArc == 0) seekToNextNode(in)
          else in.pos = (arc.posArcsStart + arc.bytesPerArc.toLong * arc.numArcs).toInt
        }
        arc.target = in.pos
      } else {
        val p = in.pos
        val code = in.vLong()
        arc.target =
          if (arc.flag(BitTargetDelta)) p + code
          else if (code < nodeRef.length) nodeRef(code.toInt)
          else code
        arc.nextArc = in.pos
      }
      arc
    }

    /** Depth-first enumeration of every accepted (string, summed output). */
    def foreachEntry(f: (String, Long) => Unit): Unit = {
      if (startNode <= 0) return
      val in = new In(bytes)
      val sb = new java.lang.StringBuilder
      def visit(node: Long, outAcc: Long): Unit = {
        val arc = new Arc
        readFirstRealTargetArc(node, arc, in)
        var done = false
        while (!done) {
          val out = outAcc + arc.output
          sb.append(arc.label.toChar)
          if (arc.flag(BitFinalArc)) f(sb.toString, out + arc.finalOutput)
          if (arc.target > 0) {
            // save list-node cursor state across the recursive visit
            val (na, bpa, pas, idx, n2) =
              (arc.nextArc, arc.bytesPerArc, arc.posArcsStart, arc.arcIdx, arc.numArcs)
            visit(arc.target, out)
            arc.nextArc = na; arc.bytesPerArc = bpa; arc.posArcsStart = pas
            arc.arcIdx = idx; arc.numArcs = n2
          }
          sb.setLength(sb.length - 1)
          if (arc.flag(BitLastArc)) done = true
          else readNextRealArc(arc, in)
        }
      }
      visit(startNode, 0L)
    }
  }

  /** Parse a serialized FST (PositiveIntOutputs; packed variant only). */
  def load(stream: java.io.InputStream): Fst = {
    require(stream != null, "missing FST resource")
    val bytes = try stream.readAllBytes() finally stream.close()
    val in = new In(bytes)
    val version = in.checkHeader("FST")
    require(version >= 3 && version <= 4, s"unsupported FST version $version")
    val packed = in.u8() == 1
    require(packed, "only the packed FST variant is supported")
    if (in.u8() == 1) { val n = in.vInt(); in.pos += n } // empty-string output
    val inputType = in.u8()
    // packed node-ref map: PackedInts codec header + PACKED data
    in.checkHeader("PackedInts")
    val bpv = in.vInt()
    val valueCount = in.vInt()
    val fmt = in.vInt()
    require(fmt == 0, s"unsupported PackedInts format $fmt")
    val nodeRef = new Array[Long](valueCount)
    val dataStart = in.pos
    var i = 0
    while (i < valueCount) {
      // byte-aligned big-endian bit window [i*bpv, (i+1)*bpv)
      val bitPos = i.toLong * bpv
      var bit = 0
      var v = 0L
      while (bit < bpv) {
        val byteIdx = ((bitPos + bit) >> 3).toInt
        val bitInByte = ((bitPos + bit) & 7).toInt
        val take = math.min(8 - bitInByte, bpv - bit)
        val chunk = (bytes(dataStart + byteIdx) >> (8 - bitInByte - take)) &
          ((1 << take) - 1)
        v = (v << take) | chunk
        bit += take
      }
      nodeRef(i) = v
      i += 1
    }
    in.pos = dataStart + ((valueCount.toLong * bpv + 7) / 8).toInt
    val startNode = in.vLong()
    in.vLong(); in.vLong(); in.vLong() // nodeCount, arcCount, arcWithOutputCount
    val numBytes = in.vLong()
    val body = java.util.Arrays.copyOfRange(bytes, in.pos, in.pos + numBytes.toInt)
    new Fst(body, startNode, nodeRef, inputType)
  }
}
