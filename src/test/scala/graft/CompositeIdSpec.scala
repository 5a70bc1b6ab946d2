package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.CompositeId
import graft.index.CompositeId.{HashRange, fullRange}

/** CompositeIdRouter vectors from the reference's own suites:
  * TestHashPartitioner.{testMapHashes,testHashCodes,testCompositeHashCodes,
  * testNonConformingCompositeIds,testRandomCompositeIds}
  * (solr/core/src/test/org/apache/solr/cloud/TestHashPartitioner.java:
  * 39-250) plus public murmur3_x86_32 vectors. */
class CompositeIdSpec extends AnyFunSuite {

  test("murmur3_x86_32 public vectors") {
    assert(CompositeId.murmur3("") === 0)
    assert(CompositeId.murmur3("hello") === 0x248bfa47)
    assert(CompositeId.murmur3("hello world") === 0x5e928f0f)
    assert(CompositeId.murmur3(
      "The quick brown fox jumps over the lazy dog") === 0x2e4ff723)
    assert(CompositeId.murmur3("abc") === 0xb3dd93fa)
  }

  test("partitionRange (testMapHashes)") {
    val r1 = CompositeId.partitionRange(1)
    assert(r1 === Seq(fullRange))
    val r2 = CompositeId.partitionRange(2)
    assert(r2(0) === HashRange(0x80000000, 0xffffffff))
    assert(r2(1) === HashRange(0x00000000, 0x7fffffff))
    val r4 = CompositeId.partitionRange(4)
    assert(r4 === Seq(
      HashRange(0x80000000, 0xbfffffff), HashRange(0xc0000000, 0xffffffff),
      HashRange(0x00000000, 0x3fffffff), HashRange(0x40000000, 0x7fffffff)))
    // invariants for 1..30 partitions: cover, contiguity, 0xffff rounding
    (1 to 30).foreach { i =>
      val ranges = CompositeId.partitionRange(i)
      assert(ranges.size === i)
      assert(ranges.head.min === Int.MinValue)
      assert(ranges.last.max === Int.MaxValue)
      ranges.sliding(2).foreach {
        case Seq(a, b) => assert(a.max + 1 === b.min)
        case _ =>
      }
      val rangeStep = math.max(1L, 0xffffffffL / i)
      if (rangeStep >= (1L << 16) * 16) {
        ranges.dropRight(1).foreach(r => assert((r.max & 0xffff) === 0xffff))
      }
    }
  }

  private val shards4 = CompositeId.partitionRange(4)
  private def doId(id: String): Int = CompositeId.shardOf(id, shards4)
  private def doQuery(key: String): Set[Int] =
    CompositeId.searchShards(Some(key), shards4).toSet

  test("plain id routing (testHashCodes b/c/d/e -> shard1..4)") {
    assert(doId("b") === 0)
    assert(doId("c") === 1)
    assert(doId("d") === 2)
    assert(doId("e") === 3)
  }

  test("composite routing depends only on the route key (testCompositeHashCodes)") {
    assert(doId("b!foo") === 0)
    assert(doId("c!bar") === 1)
    assert(doId("d!baz") === 2)
    assert(doId("e!qux") === 3)
    // /bits >= 2 gives the same result on a 4-shard ring
    for (bits <- Seq(2, 32)) {
      assert(doId(s"b/$bits!foo") === 0)
      assert(doId(s"c/$bits!bar") === 1)
      assert(doId(s"d/$bits!baz") === 2)
      assert(doId(s"e/$bits!qux") === 3)
    }
    // 0 bits to the route key: routes by the second part
    assert(doId("foo/0!b") === 0)
    assert(doId("foo/0!c") === 1)
    assert(doId("foo/0!d") === 2)
    assert(doId("foo/0!e") === 3)
  }

  test("route-key query pruning (doQuery vectors)") {
    assert(doQuery("foo/0!") === Set(0, 1, 2, 3)) // whole ring
    assert(doQuery("b/1!") === Set(0, 1)) // top bit of hash(b) is 1
    assert(doQuery("d/1!") === Set(2, 3)) // top bit of hash(d) is 0
    assert(CompositeId.searchShards(None, shards4) === shards4.indices)
    // simple key -> single shard
    assert(doQuery("b") === Set(0))
  }

  test("non-conforming ids route without exceptions") {
    val ids = Seq("A!B!C!D", "!!!!!!", "A!!!!B", "A!!B!!C", "A/59!B",
      "A/8/!B/19/", "A!B/-5", "!/130!", "!!A/1000", "A//8!B///10!C////")
    ids.foreach { id =>
      val s = doId(id)
      assert(s >= 0 && s < 4, s"id '$id' -> $s")
    }
  }

  test("random composite ids route without exceptions (seeded fuzz)") {
    val rnd = new scala.util.Random(7)
    val shards = CompositeId.partitionRange(1 + rnd.nextInt(10))
    (0 until 10000).foreach { _ =>
      val sb = new StringBuilder
      (0 until (1 + rnd.nextInt(30))).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 => sb.append('!')
          case 1 => sb.append('/')
          case 2 => sb.append((-100 + rnd.nextInt(1101)).toString)
          case _ =>
            (0 until (1 + rnd.nextInt(10))).foreach { _ =>
              sb.append((32 + rnd.nextInt(95)).toChar)
            }
        }
      }
      val id = sb.toString
      val s = CompositeId.shardOf(id, shards)
      assert(s >= 0 && s < shards.size, s"id '$id' -> $s")
    }
  }

  test("keyHashRange of a simple key is a point; composite a 16-bit band") {
    val h = CompositeId.murmur3("en")
    assert(CompositeId.keyHashRange("en") === HashRange(h, h))
    val r = CompositeId.keyHashRange("en!")
    assert(r.min === (h & 0xffff0000))
    assert(r.max === ((h & 0xffff0000) | 0xffff))
  }
}
