package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q149 invariants beyond the DuckDB oracle: the matrix derivation is
  * validated through the engine path with unit-vector probes, and the
  * fixed-point scheme is shown exactly partitioning-independent. */
class RandomProjectionSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent recompute of R[i][j] (hex-string parse, not byte
    * shifts — a genuinely different code path from the query's). */
  private def rij(i: Int, j: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$i:$j".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 17 - 8
  }

  test("unit-vector probes read the projection matrix back exactly") {
    val probes = Seq(0, 5, 63)
    val rows = probes.map { i =>
      (i.toLong, Array.tabulate(64)(d => if (d == i) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val out = TextVector.q149RandomProjectionOn(rows)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.size == probes.size * TextVector.RpOutDim)
    for (i <- probes; j <- 0 until TextVector.RpOutDim)
      assert(out((i.toLong, j)) == 1000000L * rij(i, j),
        s"probe e_$i column $j read ${out((i.toLong, j))}, matrix says ${rij(i, j)}")
  }

  test("projections are exact Longs: identical under any partitioning") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = TextVector.q149RandomProjectionOn(e)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val b = TextVector.q149RandomProjectionOn(e.repartition(7))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(a == b)
    assert(a.size == e.count() * TextVector.RpOutDim)
  }
}
