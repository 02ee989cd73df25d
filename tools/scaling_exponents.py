#!/usr/bin/env python3
"""Turn ScalingBench CSV rows (query,dir,cold_sec,steady_sec) into the
PERF.md exponent table: exponent = log10(t_x10 / t_x1) on STEADY times
(staging colds are reported separately by the bench itself). Also prints
the saturated-regime ratio t_x10sat / t_x10 — shape sensitivity at equal
volume. Reads row lines from the files given on argv (greps them out of
sbt noise itself).
Usage: python3 tools/scaling_exponents.py <log-or-csv> [...]
"""
import math
import re
import sys

rows = {}
for path in sys.argv[1:]:
    for line in open(path):
        m = re.match(r"^(q\d+\w*),(\S+?)(x1warm|x100|x10sat|x10|x1),([\d.]+),([\d.]+)", line.strip())
        if m:
            q, _, tag, cold, steady = m.groups()
            rows.setdefault(q, {})[tag] = (float(cold), float(steady))

print(f"{'query':34} {'x1':>7} {'x10':>7} {'exp':>5} {'x10sat':>7} {'sat/x10':>7}"
      f" {'x100':>8} {'exp100':>6}")
for q in sorted(rows, key=lambda s: int(re.match(r"q(\d+)", s).group(1))):
    r = rows[q]
    if "x1" not in r or "x10" not in r:
        print(f"{q:34} INCOMPLETE {sorted(r)}")
        continue
    t1, t10 = r["x1"][1], r["x10"][1]
    # sub-100ms steady times are scheduler-latency floors, not data cost;
    # clamp the denominator so the exponent reads as an upper bound
    exp = math.log10(t10 / max(t1, 0.05))
    sat = r.get("x10sat", (None, None))[1]
    satr = f"{sat / t10:7.2f}" if sat else "      -"
    # second-decade exponent (x10 -> x100): confirms or breaks the first
    t100 = r.get("x100", (None, None))[1]
    e100 = f"{math.log10(t100 / max(t10, 0.05)):6.2f}" if t100 else "     -"
    t100s = f"{t100:8.3f}" if t100 else "       -"
    flag = " <-- check" if exp >= 1.3 or (t100 and math.log10(t100 / max(t10, 0.05)) >= 1.3) else ""
    print(f"{q:34} {t1:7.3f} {t10:7.3f} {exp:5.2f} "
          f"{sat if sat else float('nan'):7.3f} {satr}{t100s} {e100}{flag}")
