package graft

/** Best (minimum) driver-observed per-query seconds across the round
  * 1–11 bench artifacts (`BENCH_r01..r11.json`, all sf0.1, cold
  * local[32], keyed by short query id) — the "recorded reference time"
  * the bench's outlier re-pair pass compares against. A min-of-history
  * is an ACHIEVABLE time on this hardware by construction; a suite min
  * that reads more than 2x it flags the query for end-of-suite
  * re-pairing and GC/heap attribution (see Bench). Queries newer than
  * round 11 have no entry and are exempt until a driver round records
  * them. Regenerated per-round from the artifacts, not hand-edited.
  */
object BenchReference {
  /** short query id -> min driver seconds at sf0.1 (rounds 1-11) */
  val sf01DriverMin: Map[String, Double] = Map(
    "m01" -> 0.58, "m02" -> 0.5, "m03" -> 0.58, "m04" -> 0.49,
    "m05" -> 0.5, "p01" -> 1.34, "p02" -> 0.54, "p03" -> 0.15,
    "p04" -> 0.41, "p05" -> 10.37, "p06" -> 1.61, "p07" -> 4.28,
    "p08" -> 1.28, "p09" -> 1.69, "p10" -> 1.6, "q01" -> 1.27,
    "q02" -> 0.48, "q03" -> 0.83, "q04" -> 0.49, "q05" -> 0.26,
    "q06" -> 0.42, "q07" -> 0.98, "q08" -> 0.53, "q09" -> 0.54,
    "q10" -> 0.5, "q11" -> 0.49, "q12" -> 0.32, "q13" -> 0.27,
    "q14" -> 0.47, "q15" -> 0.45, "q16" -> 0.49, "q17" -> 0.12,
    "q18" -> 0.44, "q19" -> 0.3, "q20" -> 0.8, "q21" -> 0.21,
    "q22" -> 0.94, "q23" -> 0.78, "q24" -> 0.64, "q25" -> 0.61,
    "q26" -> 0.57, "q27" -> 1.74, "q28" -> 0.52, "q29" -> 0.44,
    "q30" -> 0.83, "q31" -> 0.5, "q32" -> 0.66, "q33" -> 0.56,
    "q34" -> 5.29, "t01" -> 0.48, "t02" -> 0.53, "t03" -> 0.4,
    "t04" -> 0.37, "t05" -> 0.36, "t06" -> 0.41, "t07" -> 2.83,
    "t08" -> 0.92, "t09" -> 2.61, "t10" -> 0.32, "t11" -> 0.36,
    "t12" -> 0.8, "t13" -> 3.2, "t14" -> 0.32, "t15" -> 1.54,
    "t16" -> 1.87, "t17" -> 0.63, "t18" -> 0.46, "t19" -> 0.29,
    "t20" -> 0.34, "t21" -> 0.37, "t22" -> 0.4, "t23" -> 0.91,
    "t24" -> 3.58, "t25" -> 0.54, "t26" -> 0.86, "t27" -> 0.26,
    "t28" -> 0.68, "t29" -> 2.13, "t30" -> 1.83, "t31" -> 0.43,
    "t32" -> 1.08, "t33" -> 0.83, "t34" -> 6.64, "t35" -> 1.2,
    "t36" -> 0.84, "t37" -> 0.44, "t38" -> 0.55, "t39" -> 0.41,
    "t40" -> 0.61, "t41" -> 0.29, "t42" -> 0.86, "t43" -> 1.41,
    "t44" -> 1.6, "t45" -> 1.55, "t46" -> 1.03, "t47" -> 0.76,
    "t48" -> 1.09, "t49" -> 1.27, "t50" -> 1.06, "t51" -> 0.82,
    "t52" -> 0.57, "t53" -> 3.31, "t54" -> 0.78, "t55" -> 0.62,
    "t56" -> 0.33, "t57" -> 2.17, "t58" -> 1.91, "t59" -> 0.64,
    "v01" -> 0.34, "v02" -> 1.17, "v03" -> 0.35, "v04" -> 1.48,
    "v05" -> 1.44, "v06" -> 1.77, "v07" -> 0.42, "v08" -> 1.01,
    "v09" -> 0.8, "v10" -> 1.32, "v11" -> 1.12, "v12" -> 0.58,
    "v13" -> 0.62, "v14" -> 0.6, "v15" -> 0.9)
}
