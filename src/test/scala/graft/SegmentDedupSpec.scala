package graft

import org.apache.spark.sql.functions._

/** Semantics of the C4-style segment dedup core (p3): reference
  * implementation on the driver vs the distributed pipeline. */
class SegmentDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def refDedup(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    // first occurrence by (doc_id, seg_idx) wins, corpus-wide
    val segs = docs.flatMap { case (id, text) =>
      text.toLowerCase.split("\\s+").grouped(10).zipWithIndex
        .map { case (g, i) => (id, i.toLong, g.mkString(" ")) }
    }
    val firstOwner = segs.groupBy(_._3).map { case (seg, occ) =>
      seg -> occ.map(o => (o._1, o._2)).min
    }
    docs.map { case (id, _) =>
      val mine = segs.filter(_._1 == id)
      val kept = mine.filter(o => firstOwner(o._3) == ((o._1, o._2)))
      id -> (mine.size.toLong, kept.size.toLong,
        kept.sortBy(_._2).map(_._3).mkString(" "))
    }.toMap
  }

  test("segment dedup equals the reference on duplicated and unique docs") {
    val a = (1 to 25).map(i => s"w$i").mkString(" ")        // 3 segments
    val b = (1 to 10).map(i => s"w$i").mkString(" ") + " " + // repeats A's seg 0
      (30 to 42).map(i => s"x$i").mkString(" ")              // then unique
    val c = "solo tokens only here"                          // 1 short segment
    val d = a                                                // full duplicate of A
    val docs = Seq(1L -> a, 2L -> b, 3L -> c, 4L -> d)
    val got = graft.queries.LlmPipeline.segmentDedup(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == refDedup(docs))
    // spot-check the semantics the reference encodes: doc 4 keeps nothing
    // (every segment first occurred in doc 1), doc 2 loses exactly its
    // copied first segment, doc 1 and 3 keep everything
    assert(got(4L)._2 == 0L && got(4L)._3 == "")
    assert(got(2L)._2 == got(2L)._1 - 1)
    assert(got(1L)._3 == a.toLowerCase && got(3L)._3 == c)
  }

  test("a corpus with no cross-doc duplicate segments reassembles unchanged") {
    val docs = (1L to 8L).map(id =>
      id -> (1 to 23).map(i => s"t${id}_$i").mkString(" "))
    val got = graft.queries.LlmPipeline.segmentDedup(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    for ((id, text) <- docs) assert(got(id) == text)
  }
}
