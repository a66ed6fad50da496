package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ChunkingOps

/** q263 chunk-overlap eval against a full independent Scala model:
  * chunk spans, storage overhead, and needle-span coverage recomputed
  * from the raw documents with no shared code.
  */
class ChunkingOpsSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.01"

  test("q263 equals the driver-side chunking model (spans, overhead, coverage)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS len").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val corpusChars = docs.map(_._2).sum
    val panel = docs.filter { case (id, len) =>
      id % ChunkingOps.PanelMod == ChunkingOps.PanelRes &&
        id < ChunkingOps.PanelMax && len >= ChunkingOps.NeedleHi
    }
    val expect = ChunkingOps.Strides.map { st =>
      var nChunks = 0L
      var chunkChars = 0L
      var covered = 0L
      docs.foreach { case (id, len) =>
        val last = (len - 1) / st // matches `div` on len-1 >= -1
        var anyCover = false
        (0L to last).foreach { i =>
          val cstart = 1L + i * st
          nChunks += 1
          chunkChars += math.min(ChunkingOps.ChunkSize.toLong, len - cstart + 1)
          if (cstart <= ChunkingOps.NeedleLo &&
            cstart + ChunkingOps.ChunkSize - 1 >= ChunkingOps.NeedleHi)
            anyCover = true
        }
        if (anyCover && panel.exists(_._1 == id)) covered += 1
      }
      (ChunkingOps.ChunkSize.toLong, st.toLong, nChunks,
        (chunkChars - corpusChars) * 1000 / corpusChars,
        panel.length.toLong, covered,
        covered * 1000 / math.max(panel.length.toLong, 1L))
    }.sortBy(-_._2)
    val got = ChunkingOps.q263(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expect)
    // the sweep must actually separate the configs: the no-overlap
    // stride misses boundary-crossing needles that overlap covers
    val byStride = got.map(r => r._2 -> r._7).toMap
    assert(byStride(240L) < byStride(120L),
      s"needle at ${ChunkingOps.NeedleLo}..${ChunkingOps.NeedleHi} must " +
        s"separate stride 240 from 120: $byStride")
    // and overlap must cost storage: overhead grows as stride shrinks
    val ov = got.sortBy(-_._2).map(_._4)
    assert(ov == ov.sorted, s"overhead must rise as stride falls: $ov")
  }
}
