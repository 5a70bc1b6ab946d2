package graft.codec

/** One compressed 128-posting block of one term's posting list.
  *
  * Layout (our design, inspired by but not copied from the reference's
  * Lucene50 codec — delta-gap + VByte per the north star, with the
  * reference's freq==1 folding `(delta<<1)|1`
  * [lucene/core/src/java/org/apache/lucene/codecs/lucene50/Lucene50PostingsWriter.java:332-343]
  * and 128-posting framing [Lucene50PostingsFormat.java:398]):
  *
  *  - docBytes: per posting, VLong((docId-prev)<<1 | (tf==1)), then
  *    VInt(tf) only when tf>1; prev starts at firstDoc so blocks are
  *    self-contained (decodable without earlier blocks = skip-list jumps).
  *  - nrmBytes: one raw BM25 norm byte per posting (denormalized from the
  *    doc side at build time so query-time scoring needs no docmeta join).
  *  - posBytes: per posting, tf VInts of position deltas.
  *
  * Block metadata doubles as the skip list + block-max WAND data
  * (reference analogs: MultiLevelSkipListWriter.java:31-62 for skipping;
  * SURVEY.md §4.3 for the block-max design): `maxPartial` is the max over
  * the block's postings of tf/(tf+cache[norm]) computed with the exact
  * query-time Float ops, so weight*maxPartial dominates every true score
  * in the block (float multiply by a positive is monotone) — pruning is
  * rank-safe.
  */
final case class PostingBlock(
    term: String,
    firstDoc: Long,
    lastDoc: Long,
    count: Int,
    maxTf: Int,
    sumTf: Long,
    maxPartial: Float,
    docBytes: Array[Byte],
    nrmBytes: Array[Byte],
    posBytes: Array[Byte])

/** One decoded posting. */
final case class Posting(docId: Long, tf: Int, positions: Array[Int], norm: Byte)

/** One pre-encoded posting as it rides the merge shuffle: `pb` =
  * VInt(tf) ++ tf VInt position-deltas (graft.index.SegPosting layout). */
final case class PrePosting(docId: Long, norm: Byte, pb: Array[Byte])

object PostingsCodec {

  /** 128, the reference's postings block size / skip interval
    * (Lucene50PostingsFormat.java:398). */
  final val BlockSize = 128

  /** Encode one term's postings (sorted by docId asc) into blocks.
    * `cache` is the 256-entry BM25 norm cache k1*((1-b)+b*dl/avgdl)
    * (BM25Similarity.java:200-212) used only for the maxPartial bound;
    * pass null to skip (maxPartial = NaN).
    */
  def encode(term: String, postings: Iterator[Posting],
             cache: Array[Float]): Iterator[PostingBlock] = {
    val grouped = postings.grouped(BlockSize)
    grouped.map { chunk =>
      val docW = new VByte.Writer(chunk.size * 2)
      val posW = new VByte.Writer(chunk.size * 2)
      val nrm = new Array[Byte](chunk.size)
      var prev = chunk.head.docId
      val firstDoc = chunk.head.docId
      var maxTf = 0
      var sumTf = 0L
      var maxPartial = Float.NegativeInfinity
      var i = 0
      while (i < chunk.size) {
        val p = chunk(i)
        val delta = p.docId - prev
        prev = p.docId
        if (p.tf == 1) docW.writeVLong((delta << 1) | 1L)
        else { docW.writeVLong(delta << 1); docW.writeVInt(p.tf) }
        nrm(i) = p.norm
        var prevPos = 0
        var j = 0
        while (j < p.positions.length) {
          posW.writeVInt(p.positions(j) - prevPos); prevPos = p.positions(j); j += 1
        }
        if (p.tf > maxTf) maxTf = p.tf
        sumTf += p.tf
        if (cache != null) {
          val f = p.tf.toFloat
          val partial = f / (f + cache(p.norm & 0xFF))
          if (partial > maxPartial) maxPartial = partial
        }
        i += 1
      }
      PostingBlock(term, firstDoc, prev, chunk.size, maxTf, sumTf,
        if (cache == null) Float.NaN else maxPartial,
        docW.toBytes, nrm, posW.toBytes)
    }
  }

  /** Encode one term's PRE-ENCODED postings (sorted by docId asc) into
    * blocks — the builder's hot path. Each posting's position deltas are
    * already VByte bytes (SegPosting.pb = VInt(tf) ++ deltas), so block
    * posBytes are assembled by raw byte concatenation; only the doc-gap
    * stream is encoded here. Float ops for maxPartial are identical to
    * [[encode]] (CodecSpec proves block-for-block equality of the paths).
    */
  def encodePre(term: String, postings: Iterator[PrePosting],
                cache: Array[Float]): Iterator[PostingBlock] = {
    val grouped = postings.grouped(BlockSize)
    grouped.map { chunk =>
      val docW = new VByte.Writer(chunk.size * 2)
      val posW = new VByte.Writer(chunk.size * 4)
      val nrm = new Array[Byte](chunk.size)
      var prev = chunk.head.docId
      val firstDoc = chunk.head.docId
      var maxTf = 0
      var sumTf = 0L
      var maxPartial = Float.NegativeInfinity
      var i = 0
      while (i < chunk.size) {
        val p = chunk(i)
        // tf prefix of pb
        var q = 0
        var b = p.pb(q); q += 1
        var tf = b & 0x7F
        var shift = 7
        while ((b & 0x80) != 0) {
          b = p.pb(q); q += 1
          tf |= (b & 0x7F) << shift
          shift += 7
        }
        val delta = p.docId - prev
        prev = p.docId
        if (tf == 1) docW.writeVLong((delta << 1) | 1L)
        else { docW.writeVLong(delta << 1); docW.writeVInt(tf) }
        nrm(i) = p.norm
        posW.writeRaw(p.pb, q, p.pb.length - q)
        if (tf > maxTf) maxTf = tf
        sumTf += tf
        if (cache != null) {
          val f = tf.toFloat
          val partial = f / (f + cache(p.norm & 0xFF))
          if (partial > maxPartial) maxPartial = partial
        }
        i += 1
      }
      PostingBlock(term, firstDoc, prev, chunk.size, maxTf, sumTf,
        if (cache == null) Float.NaN else maxPartial,
        docW.toBytes, nrm, posW.toBytes)
    }
  }

  /** Decode a block back to postings (with positions). */
  def decode(b: PostingBlock): Array[Posting] = {
    val out = new Array[Posting](b.count)
    val docR = new VByte.Reader(b.docBytes)
    val posR = new VByte.Reader(b.posBytes)
    var prev = b.firstDoc
    var i = 0
    while (i < b.count) {
      val raw = docR.readVLong()
      val tf = if ((raw & 1L) == 1L) 1 else docR.readVInt()
      val docId = prev + (raw >>> 1)
      prev = docId
      val positions = new Array[Int](tf)
      var acc = 0
      var j = 0
      while (j < tf) { acc += posR.readVInt(); positions(j) = acc; j += 1 }
      out(i) = Posting(docId, tf, positions, b.nrmBytes(i))
      i += 1
    }
    out
  }

  /** Decode only (docId, tf, norm) triples — the scoring hot path
    * (positions skipped without parsing; posBytes untouched). */
  def decodeDocs(b: PostingBlock): (Array[Long], Array[Int], Array[Byte]) = {
    val docs = new Array[Long](b.count)
    val tfs = new Array[Int](b.count)
    val docR = new VByte.Reader(b.docBytes)
    var prev = b.firstDoc
    var i = 0
    while (i < b.count) {
      val raw = docR.readVLong()
      val tf = if ((raw & 1L) == 1L) 1 else docR.readVInt()
      prev += (raw >>> 1)
      docs(i) = prev; tfs(i) = tf
      i += 1
    }
    (docs, tfs, b.nrmBytes)
  }
}
