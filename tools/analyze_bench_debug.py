#!/usr/bin/env python3
"""Analyze a GRAFT_DEBUG=1 Bench stderr capture.

Correlates per-query wall time with the per-query JVM telemetry
([bench-jvm]: code-cache occupancy, GC/JIT deltas, loaded classes) and
the per-iteration trainer timings ([fm]/[sgd]/[adpredictor]) to separate
uniform host slowdown from specific stalls (code-cache exhaustion, GC
debt, JIT storms, first-iteration compilation).

Usage: analyze_bench_debug.py <stderr-file> [baseline_bench_full.json]
"""
import json
import re
import sys


def main() -> None:
    path = sys.argv[1]
    base = json.load(open(sys.argv[2]))["queries"] if len(sys.argv) > 2 else {}
    qtime: dict[str, float] = {}
    jvm: dict[str, dict] = {}
    iters: dict[str, list[int]] = {}
    cur = None
    order: list[str] = []
    for line in open(path, errors="replace"):
        m = re.search(r"\[bench\] (q\d+\w*) +([\d.]+) s", line)
        if m:
            qtime[m.group(1)] = float(m.group(2))
            order.append(m.group(1))
            cur = m.group(1)
            continue
        m = re.search(
            r"\[bench-jvm\] (q\d+\w*) +codecache +([\d.]+) MB \(\+ *(-?[\d.]+)\)"
            r" gc \+ *(\d+) ms +jit \+ *(\d+) ms +classes +(\d+) \(\+ *(-?\d+)\)",
            line)
        if m:
            jvm[m.group(1)] = dict(
                cc=float(m.group(2)), dcc=float(m.group(3)),
                gc=int(m.group(4)), jit=int(m.group(5)),
                classes=int(m.group(6)), dclasses=int(m.group(7)))
            continue
        m = re.search(r"\[(fm|sgd|adpredictor)\] (?:iter|sweep) (\d+) (\d+) ms", line)
        if m and cur is not None:
            # trainer lines print while the NEXT query runs? No: they print
            # during their own query, i.e. after the previous [bench] line.
            iters.setdefault(f"after:{cur}:{m.group(1)}", []).append(int(m.group(3)))
    # trainer iteration lines appear BEFORE their query's [bench] line;
    # re-key them to the query that follows in the file order
    print(f"{len(qtime)} queries, {len(jvm)} jvm rows")
    print("\n== top queries by wall time (ratio vs baseline if given) ==")
    for q, t in sorted(qtime.items(), key=lambda x: -x[1])[:15]:
        j = jvm.get(q, {})
        ratio = f"  x{t / base[q]:.2f} vs base" if base.get(q, 0) > 0.5 else ""
        print(f"{q:30s} {t:7.1f}s gc+{j.get('gc', 0):6d}ms jit+{j.get('jit', 0):6d}ms "
              f"cc {j.get('cc', 0):6.1f}MB dcls+{j.get('dclasses', 0):5d}{ratio}")
    print("\n== code cache / classes over suite order ==")
    for i, q in enumerate(order):
        if i % 10 == 0 or q in ("q47_adpredictor", "q53_fm", "q86_fm_side_features",
                                "q76_reader_roundtrips", "q77_fingerprint"):
            j = jvm.get(q, {})
            print(f"{i:3d} {q:30s} cc {j.get('cc', 0):6.1f}MB "
                  f"classes {j.get('classes', 0):7d} gc+{j.get('gc', 0):5d}ms "
                  f"jit+{j.get('jit', 0):5d}ms")
    print("\n== trainer iteration profiles (ms, in file order) ==")
    for k, v in iters.items():
        if len(v) > 1:
            print(f"{k:40s} {v}  first/median "
                  f"{v[0] / sorted(v)[len(v) // 2]:.1f}x")


if __name__ == "__main__":
    main()
