package graft.queries

import graft.SparkSpec

/** Property checks for the graph / history / layout operators beyond the
  * hash oracle: SCD2 interval chaining, funnel monotonicity, retention
  * bounds, PageRank mass bounds, triangle-degree consistency, and Z-order
  * two-dimensional locality.
  */
class GraphHistorySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.Registry.all.find(_.name == name).get.run(spark, sfDir)

  test("q89 SCD2 versions chain gaplessly with exactly one open current row per key") {
    val rows = run("q89_scd2_history").collect().map { r =>
      (r.getLong(0), r.getInt(2), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getInt(6))
    } // (user_id, version, valid_from_us, valid_to_us, is_current)
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val hist = vs.sortBy(_._2)
      assert(hist.map(_._2).toSeq == (1 to hist.length),
        s"user $user: versions not dense")
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3),
            s"user $user: v${a._2} valid_to != v${b._2} valid_from")
        case _ => ()
      }
      assert(hist.last._4.isEmpty, s"user $user: last interval not open")
      assert(hist.count(_._5 == 1) == 1 && hist.last._5 == 1,
        s"user $user: is_current not exactly the last version")
    }
  }

  test("q92 funnel stage counts are monotone non-increasing per day") {
    run("q92_funnel_conversion").collect().foreach { r =>
      val (v, c, p) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(v >= c && c >= p, s"day ${r.getString(0)}: funnel $v/$c/$p not monotone")
    }
  }

  test("q93 retention never exceeds cohort size and offset 0 is the full cohort") {
    val rows = run("q93_retention_cohorts").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (cd, off, size, active) =>
      assert(active <= size, s"cohort $cd offset $off: $active > $size")
    }
    rows.filter(_._2 == 0).foreach { case (cd, _, size, active) =>
      assert(active == size, s"cohort $cd: offset-0 retention $active != $size")
    }
  }

  test("q95 PageRank ranks respect the damping floor and total-mass ceiling") {
    val rows = run("q95_pagerank_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, pr, deg) =>
      assert(pr >= 150000L, s"doc $id: pr $pr below damping floor")
      if (deg == 0) assert(pr == 150000L, s"isolated doc $id: pr $pr != floor")
    }
    // integer truncation only ever loses mass vs the float fixpoint
    assert(rows.map(_._2).sum <= 1000000L * rows.length)
  }

  test("q97 degrees agree with q95's independent degree computation") {
    val prDeg = run("q95_pagerank_neardup").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val triRows = run("q97_triangle_count").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    triRows.foreach { case (id, deg, tri, ppm) =>
      assert(prDeg(id) == deg, s"doc $id: deg mismatch $deg vs ${prDeg(id)}")
      assert(ppm <= 1000000L, s"doc $id: clustering coefficient $ppm > 1")
      if (deg < 2) assert(tri == 0L, s"doc $id: deg<2 but $tri triangles")
    }
  }

  test("q98 Z-order buckets bound BOTH dimensions (the locality property)") {
    // bucket = z div 2^14 keeps the low 7 interleaved bits of each
    // dimension inside a bucket, so both spans are <= 127 — the
    // two-column file-skipping guarantee row-major layout cannot give.
    run("q98_zorder_layout").collect().foreach { r =>
      val (b, minC, maxC, minD, maxD) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(maxC - minC <= 127, s"bucket $b: cust span ${maxC - minC} > 127")
      assert(maxD - minD <= 127, s"bucket $b: day span ${maxD - minD} > 127")
    }
  }
}
