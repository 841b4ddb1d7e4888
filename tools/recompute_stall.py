#!/usr/bin/env python3
"""Classify every query row of a round's full-bench sibling rolls under
the spec-pinned stall rule in `Bench.stallFlag` (BenchEstimatorSpec)
and — with --write — stamp the derived `queries_stall` map plus rule /
sibling provenance into each artifact in place (raw fields untouched).

Why a post-hoc tool and not a live Bench field: a stall (the zero-steal
contention mode — wall ballooning while the process-CPU delta stays at
its steady level, every other instrument clean; the r13 roll-c q51
22.1 s entry) is only visible against same-query SIBLING-ROLL medians,
which do not exist inside a single run. So the rule's authority lives
in Scala (Bench.stallFlag, spec-pinned), and this mirror executes it
over a round's committed rolls — the same relationship
recompute_host_ratio.py has to Bench.hostRatio. host_ratio inputs for
rolls that predate the embedded map (_b/_c) are recomputed from their
own raw calib_timeline under the committed rule.

Flag values (only flagged entries appear in the map; an explicitly
empty map means checked-and-clean):
  stall                 wall >1.4x sibling median, every instrument
                        clean, cpu_sec within 1.15x of ITS sibling
                        median — confirmed same-work-not-scheduled
  stall_cpu_unconfirmed the same shape in a roll predating the cpu_sec
                        layer (no cpu to confirm)
  excess_cpu / low_cpu  wall inflated and clean but cpu materially
                        above/below its sibling median — work
                        variance, not a stall; published so the entry
                        still carries a mechanical flag

Usage: python3 tools/recompute_stall.py [--write] <roll.json> <roll.json> ...
       (all rolls of one round together: each artifact's map is
        computed against the OTHER artifacts on the command line)
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from recompute_host_ratio import recomputed_map

RULE = "cpu_sibling_r14"
SPAN_RE = (r',"queries_stall":\{[^}]*\}'
           r',"stall_rule":"[^"]*","stall_siblings":\[[^\]]*\]')


def median_of(xs):
    """Mirror of Bench.medianOf EXACTLY: sorted upper-middle element."""
    s = sorted(xs)
    return s[len(s) // 2]


def stall_flag(wall, sib_wall_med, cpu, sib_cpu_med, steal, minflt,
               gc_ms, retried, host_ratio):
    """Mirror of Bench.stallFlag (spec: BenchEstimatorSpec). Negative
    cpu/sib_cpu_med/gc_ms mean the field predates that instrument."""
    if wall < 1.0 or sib_wall_med <= 0 or wall <= 1.4 * sib_wall_med:
        return None
    if (steal > 0.004 or minflt > 1000000
            or (gc_ms >= 0 and gc_ms > 0.2 * wall * 1000)
            or retried or host_ratio > 1.4):
        return None
    if cpu >= 0 and sib_cpu_med > 0:
        band = max(cpu, sib_cpu_med) / min(cpu, sib_cpu_med)
        if band <= 1.15:
            return "stall"
        return "excess_cpu" if cpu > sib_cpu_med else "low_cpu"
    return "stall_cpu_unconfirmed"


def stall_map(d, siblings):
    """The queries_stall map for artifact d against its sibling rolls.

    host_ratio: the artifact's embedded map where present, else
    recomputed from its raw calib_timeline (pre-map rolls)."""
    hr = d.get("queries_host_ratio") or recomputed_map(d)
    flags = {}
    for q, wall in d["queries"].items():
        sib_w = [s["queries"][q] for s in siblings if q in s["queries"]]
        sib_c = [s["queries_cpu_sec"][q] for s in siblings
                 if q in s.get("queries_cpu_sec", {})]
        f = stall_flag(
            wall,
            median_of(sib_w) if sib_w else -1.0,
            d.get("queries_cpu_sec", {}).get(q, -1.0),
            median_of(sib_c) if sib_c else -1.0,
            # pre-r12 rolls predate the steal/minflt maps; absent maps
            # read clean (0), consistent with the gc/cpu -1 convention
            # rather than a KeyError (r14 ADVICE)
            d.get("queries_steal_frac", {}).get(q, 0.0),
            d.get("queries_minflt", {}).get(q, 0),
            d.get("queries_gc_ms", {}).get(q, -1),
            q in d.get("retried", {}),
            hr[q])
        if f:
            flags[q] = f
    return flags


def main():
    argv = sys.argv[1:]
    write = "--write" in argv
    paths = [p for p in argv if p != "--write"]
    assert len(paths) >= 2, "need at least two sibling rolls"
    arts = [(p, json.loads(open(p).read())) for p in paths]
    for path, d in arts:
        sibs = [s for p2, s in arts if p2 != path]
        flags = stall_map(d, sibs)
        print(f"{path}: {flags if flags else 'clean'}")
        if not write:
            continue
        text = open(path).read()
        text = re.sub(SPAN_RE, "", text)  # idempotent re-stamp
        span = (',"queries_stall":{'
                + ",".join(f'"{q}":"{v}"' for q, v in sorted(flags.items()))
                + '}' + f',"stall_rule":"{RULE}","stall_siblings":'
                + json.dumps([os.path.basename(p2)
                              for p2, _ in arts if p2 != path]))
        assert text.rstrip().endswith("}")
        out = text.rstrip()[:-1] + span + "}\n"
        json.loads(out)  # still valid JSON
        open(path, "w").write(out)
        print(f"{path}: stamped ({len(flags)} flagged)")


if __name__ == "__main__":
    main()
