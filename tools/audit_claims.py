#!/usr/bin/env python3
"""Re-verify every quantitative claim in README.md's r13 authority note
against the COMMITTED artifacts (r12 VERDICT What's-wrong #1b: two r12
README claims were falsified by the artifacts they cited; the r13 done
criterion is that every claim be mechanically re-verifiable — this
script is that verification). Pure stdlib; run from the repo root:

    python3 tools/audit_claims.py

Exits nonzero if any claim fails. When a claim is deliberately changed
(new round, re-rolled artifact), update the matching check here in the
same commit — a stale check failing loudly is this file working.
"""
import json
import os
import statistics
import sys

# Resolve everything from this file's location (r13 ADVICE): the repo
# root is the parent of tools/, so the auditor runs from any cwd.
TOOLS = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(TOOLS)
sys.path.insert(0, TOOLS)
from recompute_host_ratio import recomputed_map  # the spec-pinned rule
from recompute_stall import stall_map  # mirror of Bench.stallFlag

FAILURES = []


def art(name):
    """Committed-artifact path, cwd-independent."""
    return os.path.join(ROOT, name)


def ok(cond, msg):
    print(("OK   " if cond else "FAIL ") + msg)
    if not cond:
        FAILURES.append(msg)


def main():
    auth = json.load(open(art("bench_full_r13.json")))
    sibs = {k: json.load(open(art(f"bench_full_r13_{k}.json"))) for k in "bcdef"}
    r11 = json.load(open(art("bench_full_r11.json")))
    r12 = json.load(open(art("bench_full_r12.json")))

    # --- headline: authoritative roll -------------------------------
    ok(abs(auth["value"] - 337.5) < 0.1 and len(auth["queries"]) == 148
       and not auth["errors"],
       "authoritative: 148 queries, 337.5 s, 0 errors")
    ok(abs(auth["calib_sec"] - 0.489) < 0.001, "authoritative calib_sec 0.489")
    ok(abs(auth["steal_frac_wall"] - 0.0016) < 0.0002,
       "authoritative steal_frac_wall 0.0016")

    # --- calib-normalized totals are flat across rounds -------------
    for name, d, exp in [("r11", r11, 690), ("r12", r12, 700),
                         ("r13", auth, 690)]:
        v = d["value"] / d["calib_sec"]
        ok(abs(v - exp) < 2, f"{name} normalized {exp} sec-per-calib ({v:.0f})")

    # --- sibling totals and field evolution --------------------------
    for k, exp in [("b", 383.7), ("c", 408.2), ("d", 395.3), ("e", 370.5),
                   ("f", 332.0)]:
        ok(abs(sibs[k]["value"] - exp) < 0.1, f"_{k} total {exp} s")
    ok(abs(sibs["f"]["calib_sec"] - 0.549) < 0.001
       and sibs["f"]["steal_frac_wall"] < 0.001
       and "queries_cpu_sec" in sibs["f"] and not sibs["f"]["errors"],
       "_f: best raw total, calib 0.549, steal <0.001, full field set")
    ok("queries_steal_frac" in sibs["b"] and "queries_gc_ms" not in sibs["b"]
       and "queries_gc_ms" not in sibs["c"],
       "_b/_c carry steal/minflt maps only (pre-gc/host_ratio rolls)")
    ok("queries_host_ratio" in sibs["d"] and "queries_cpu_sec" not in sibs["d"],
       "_d has gc_ms/host_ratio, predates cpu_sec")
    ok("queries_cpu_sec" in auth, "authoritative has the complete field set")

    # --- host_ratio is a DERIVED field: embedded map must equal a
    # recomputation from the artifact's own raw timeline under the
    # spec-pinned rule (Bench.hostRatio / BenchEstimatorSpec) ----------
    for label, d in [("auth", auth), ("_d", sibs["d"]), ("_e", sibs["e"]),
                     ("_f", sibs["f"])]:
        want = recomputed_map(d)
        got = d["queries_host_ratio"]
        drift = [n for n in want if abs(got[n] - round(want[n], 2)) > 0.005]
        ok(not drift,
           f"{label} queries_host_ratio == recomputed from raw timeline"
           f" ({len(drift)} drifted)")

    # --- host_ratio provenance (r13 ADVICE): _d/_e were rolled under
    # the pre-r13 nearest-bracket rule and brought to the committed rule
    # by tools/recompute_host_ratio.py — they carry the tool's stamp;
    # auth/_f embedded their maps engine-side under the final rule and
    # carry none. For the stamped pair the equality check above is
    # necessarily circular (both sides are this tool's code); their
    # non-circular evidence is the stamp itself plus the raw timeline.
    for label, d, recomp in [("auth", auth, False), ("_d", sibs["d"], True),
                             ("_e", sibs["e"], True), ("_f", sibs["f"], False)]:
        got = d.get("host_ratio_recomputed", False)
        ok(got == recomp,
           f"{label} host_ratio provenance: "
           + ("tool-recomputed (stamped)" if recomp else "engine-written"))

    # --- attribution acceptance test ---------------------------------
    # every authoritative entry disagreeing >1.4x with the sibling-roll
    # median carries a nonzero mechanical flag in its own row
    unattributed = []
    for n, v in auth["queries"].items():
        med = statistics.median(s["queries"][n] for s in sibs.values())
        if med <= 0 or v <= 0 or max(v, med) < 1.0:
            continue
        if max(v, med) / min(v, med) > 1.4:
            att = (auth["queries_steal_frac"].get(n, 0) > 0.004
                   or auth["queries_minflt"].get(n, 0) > 1e6
                   or auth["queries_gc_ms"].get(n, 0) > 0.2 * 1000 * v
                   or auth["queries_host_ratio"].get(n, 1) > 1.4
                   or n in auth.get("retried", {})
                   or n in auth.get("queries_stall", {}))
            if not att:
                unattributed.append(n)
    ok(not unattributed,
       "zero unattributed >1.4x-vs-sibling-median entries of >=1 s "
       f"(sub-second = scheduling noise, out of claim scope) ({unattributed})")

    # --- the q86 story ------------------------------------------------
    q86c = sibs["c"]["retried"]["q86_fm_side_features"]
    ok(abs(q86c["first"] - 60.8) < 0.1 and abs(q86c["retry"] - 12.0) < 0.1
       and q86c["trigger"] == "jit" and q86c["kept"] == "retry",
       "_c q86 first 60.8 s jit-caught, 12.0 s retry kept")
    q86 = [auth["queries"]["q86_fm_side_features"]] + \
          [s["queries"]["q86_fm_side_features"] for s in sibs.values()]
    ok(11.35 <= min(q86) and max(q86) <= 15.05,
       "q86 publishes 11.4-15.0 s across all six rolls")

    # --- _b head burst, _c q51 stall, _d q20 residual ----------------
    head = [t for i, t in sibs["b"]["calib_timeline"] if i <= 5]
    ok(0.76 <= min(head) and max(head) <= 1.39,
       "_b head samples 0.77-1.38 s")
    ok(abs(sibs["b"]["calib_mini_min_sec"] - 0.132) < 0.005,
       "_b robust floor ~0.13 s")
    q51 = [auth["queries"]["q51_pmf"]] + \
          [sibs[k]["queries"]["q51_pmf"] for k in "bdef"]
    ok(abs(sibs["c"]["queries"]["q51_pmf"] - 22.1) < 0.1
       and 7.1 < min(q51) and max(q51) < 8.3,
       "_c q51 22.1 s; 7.2-8.2 s in the other five")
    ok(abs(sibs["d"]["queries"]["q20_minhash_dups"] - 3.5) < 0.1,
       "_d q20 3.5 s residual")

    # --- stall classification (r13 VERDICT What's-wrong #1): the
    # queries_stall maps stamped into the six rolls are DERIVED — each
    # must equal a recomputation under the spec-pinned Bench.stallFlag
    # mirror against the other five rolls, and the two r13 residuals
    # must classify the way the rule's acceptance criterion demands:
    # _c-q51 (wall 3.1x, every available instrument clean) carries the
    # stall flag; _d-q20 is a host BURST (recomputed host_ratio 7.5),
    # so the stall rule correctly does NOT claim it.
    rolls = [("auth", auth)] + [(f"_{k}", sibs[k]) for k in "bcdef"]
    for label, d in rolls:
        others = [s for l2, s in rolls if l2 != label]
        want = stall_map(d, others)
        ok(d.get("queries_stall") == want and "stall_rule" in d,
           f"{label} queries_stall == recomputed under Bench.stallFlag "
           f"({len(want)} flagged)")
    ok(sibs["c"]["queries_stall"].get("q51_pmf") == "stall_cpu_unconfirmed",
       "_c q51 carries the stall flag (cpu layer absent in that roll)")
    ok("q20_minhash_dups" not in sibs["d"]["queries_stall"]
       and sibs["d"]["queries_host_ratio"]["q20_minhash_dups"] > 1.4,
       "_d q20 classifies as host burst (host_ratio 7.5), not stall")
    flagged = {l: sorted(d.get("queries_stall", {})) for l, d in rolls}
    ok(flagged == {"auth": [], "_b": ["q72_warmstart_matrix",
                                     "q90_gas_pagerank"],
                   "_c": ["q51_pmf"], "_d": ["q63_functional_pagerank"],
                   "_e": [], "_f": ["q110_boilerplate_strip"]},
       f"stall maps: exactly 5 flagged entries across six rolls ({flagged})")
    ok(sibs["f"]["queries_stall"]["q110_boilerplate_strip"] == "excess_cpu",
       "_f q110 wall moved WITH its cpu (1.55 vs 0.78 s): work variance,"
       " not a stall")

    # --- watchlist ----------------------------------------------------
    q64 = [auth["queries"]["q64_token_pmi"]] + \
          [s["queries"]["q64_token_pmi"] for s in sibs.values()]
    ok(2.13 < min(q64) and max(q64) < 2.49 and max(q64) / min(q64) < 1.17,
       "q64 2.14-2.48 s (1.16x) across six rolls")
    q140 = [auth["queries"]["q140_perplexity_buckets"]] + \
           [s["queries"]["q140_perplexity_buckets"] for s in sibs.values()]
    ok(2.73 < min(q140) and max(q140) < 3.98
       and "q140_perplexity_buckets" in sibs["b"]["retried"],
       "q140 2.74-3.97 s, slow end calib-flagged in _b")

    # --- probe journal -------------------------------------------------
    pw = [json.loads(l) for l in open(art("PROBES_r13.json"))]
    ok(abs(min(p["pr_sec"] for p in pw) - 7.48) < 0.01,
       "PR best 7.48 s (17.11 M edge-iters/s)")
    ok(abs(min(p["tc_sec"] for p in pw) - 12.22) < 0.01,
       "TC best 12.22 s (2.62 M edges/s)")
    ok(max(max(p["pr_steal_frac_runs"]) for p in pw) <= 0.001,
       "PR probe steal <= 0.001 every run")

    # --- scale decade ---------------------------------------------------
    sc = json.load(open(art("BENCH_SCALE_r13.json")))
    third = sorted(n for n, q in sc["queries"].items()
                   if len(q["small_runs"]) > 2 or len(q["large_runs"]) > 2)
    ok(third == ["q135_semantic_dedup", "q14_triangle_count"],
       f"third-run rule fired exactly on q14-small and q135-large ({third})")
    wide = [n for n, q in sc["queries"].items()
            for side in ("small_runs", "large_runs")
            if len(q[side]) == 2
            and min(r["sec"] for r in q[side]) > 0
            and max(r["sec"] for r in q[side]) /
                min(r["sec"] for r in q[side]) > 2]
    ok(not wide, f"no published pair spreads >2x without a third run ({wide})")
    worst = max(q["ratio"] for q in sc["queries"].values())
    ok(worst < 7.5 and all(q["ratio"] < 10 for q in sc["queries"].values()),
       f"all 17 flagships sub-linear for 10x data (worst FM {worst:.2f}x)")
    # sibling scale roll: 14/17 ratios within 1.25x; the three movers
    # (q53/q65/q135) are the barrier-heavy variance rows, q53's burst
    # flagged by its own pre-run mini-calibs (0.28-0.31 s vs the floor)
    scb = json.load(open(art("BENCH_SCALE_r13_b.json")))
    agree = [n for n in sc["queries"]
             if max(sc["queries"][n]["ratio"], scb["queries"][n]["ratio"]) /
                min(sc["queries"][n]["ratio"], scb["queries"][n]["ratio"])
                <= 1.25]
    ok(len(agree) == 14 and
       set(sc["queries"]) - set(agree) ==
       {"q53_fm", "q65_knn_ivf", "q135_semantic_dedup"},
       f"sibling scale roll: 14/17 ratios within 1.25x "
       f"(movers {sorted(set(sc['queries']) - set(agree))})")
    ok(abs(scb["queries"]["q53_fm"]["ratio"] - 11.52) < 0.05
       and len(scb["queries"]["q53_fm"]["large_runs"]) == 3
       and max(r["pre_calib_sec"]
               for r in scb["queries"]["q53_fm"]["large_runs"]) > 0.25,
       "sibling q53 11.5x: third run fired, burst in its own pre-calibs")

    print()
    if FAILURES:
        print(f"{len(FAILURES)} CLAIM(S) FAILED")
        sys.exit(1)
    print("ALL CLAIMS VERIFIED against committed artifacts")


if __name__ == "__main__":
    main()
