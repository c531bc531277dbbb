#!/usr/bin/env python3
"""Drift-normalized comparison of two graft.Bench JSON artifacts.

Usage:  python3 scripts/bench_diff.py RECORD.json CANDIDATE.json

Rounds 11-13 each re-derived by hand that this host's per-core wall
drifts +/-15% between windows (pinned md5 microbench, zero hypervisor
steal, loadavg ~0) -- so bench TOTALS from this box are meaningless as
a regression signal; only per-query diffs against a same-code record,
normalized by the clock witness, separate code from clock (SCALE.md
r13).  This script is that analysis, mechanized (VERDICT r13 #1):

  * loads the full per-query maps of both artifacts (bench_full format
    written to scripts/bench_last.json; older records work too),
  * prints totals, loadavg and the microbench clock witness,
  * per-query: median delta/ratio, and every mover beyond the jitter
    band (|delta| > 0.5s AND ratio outside [0.8, 1.25] -- the same
    band the hand analyses used),
  * emits ONE verdict line: CLOCK (drift explains the delta), CODE
    (named queries regressed beyond what the clock can explain), or
    FAIL (a query failed in the candidate).
"""
import json
import math
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def micro(d):
    """Mean of the run's start/end clock-witness readings, or None."""
    vals = [d[k] for k in ("microbench_start_sec", "microbench_end_sec")
            if isinstance(d.get(k), (int, float))]
    return sum(vals) / len(vals) if vals else None


def micro_mt(d):
    """Mean of the multi-core witness readings (r14+ artifacts), or None.

    The single-thread witness misses core THEFT: a co-tenant can take
    half the cores while per-core throughput reads normal, inflating
    every many-task query 2-4x (the r14 resumed-session false alarm:
    verdict CODE on 30 movers that all re-probed at baseline).  The
    multi-core witness runs the same loop on min(16, cores) threads;
    under theft the slowest-thread wall rises far beyond the
    single-thread number.
    """
    vals = [d[k] for k in ("microbench_mt_start_sec", "microbench_mt_end_sec")
            if isinstance(d.get(k), (int, float))]
    return sum(vals) / len(vals) if vals else None


def family(name):
    return name.lstrip("_").split("_", 1)[0]


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a_path, b_path = sys.argv[1], sys.argv[2]
    a, b = load(a_path), load(b_path)
    qa, qb = a.get("queries", {}), b.get("queries", {})
    if not qa or not qb:
        sys.exit("both artifacts need a 'queries' map "
                 "(use the bench_full format)")

    print(f"record:    {a_path}  total={a.get('value', float('nan')):.1f}s"
          f"  n={len(qa)}  loadavg_start={a.get('loadavg_start', '?')}")
    print(f"candidate: {b_path}  total={b.get('value', float('nan')):.1f}s"
          f"  n={len(qb)}  loadavg_start={b.get('loadavg_start', '?')}")

    ma, mb = micro(a), micro(b)
    clock = None
    if ma and mb:
        clock = mb / ma
        print(f"clock witness: microbench {ma:.3f}s -> {mb:.3f}s "
              f"(candidate core is {clock:.2f}x the record's wall; "
              f"this host's proven envelope is +/-15%)")
    else:
        print("clock witness: absent in at least one artifact "
              "(pre-r14 record) -- falling back to per-query band only")

    mta, mtb = micro_mt(a), micro_mt(b)
    cores_contended = False
    if mta and mtb:
        mt_ratio = mtb / mta
        cores_contended = mt_ratio > 1.3
        print(f"multi-core witness: {mta:.3f}s -> {mtb:.3f}s "
              f"({mt_ratio:.2f}x"
              + ("; candidate window had CONTENDED CORES -- expect "
                 "many-task queries inflated beyond the per-core clock"
                 if cores_contended else "; no core-theft signal") + ")")

    # Whole-run hypervisor steal (r14+ artifacts): the instant-sampling
    # witnesses miss theft BETWEEN their samples; steal_pct integrates
    # /proc/stat over the entire run.  3.4% average steal was measured
    # bracketing a 291s run whose start loadavg read 0.65 and whose
    # start witnesses read near-normal -- bursts land on the queries.
    steal_b = b.get("steal_pct")
    if isinstance(steal_b, (int, float)) and steal_b >= 0:
        stolen = steal_b > 1.0
        print(f"steal witness: candidate ran under {steal_b:.1f}% "
              f"hypervisor steal"
              + (" -- co-tenant bursts hit mid-run; totals are not "
                 "comparable" if stolen else " (clean)"))
        cores_contended = cores_contended or stolen

    failed_a = sorted(k for k, v in qa.items() if v < 0)
    failed_b = sorted(k for k, v in qb.items() if v < 0)
    added = sorted(set(qb) - set(qa))
    removed = sorted(set(qa) - set(qb))
    for label, names in (("FAILED in record", failed_a),
                         ("FAILED in candidate", failed_b),
                         ("only in candidate", added),
                         ("only in record", removed)):
        if names:
            print(f"{label}: {', '.join(names[:8])}"
                  + (f" (+{len(names) - 8} more)" if len(names) > 8 else ""))

    common = [k for k in qa if k in qb and qa[k] >= 0 and qb[k] >= 0]
    deltas = {k: qb[k] - qa[k] for k in common}
    ratios = {k: qb[k] / qa[k] for k in common if qa[k] > 1e-9}
    med_d = statistics.median(deltas.values())
    med_r = statistics.median(ratios.values())
    print(f"per-query ({len(common)} common): median delta {med_d:+.3f}s, "
          f"median ratio {med_r:.3f}")

    # Jitter band from the r11-r13 hand analyses: a mover must shift
    # both absolutely (>0.5s) and relatively (outside [0.8, 1.25]).
    movers = [k for k in common
              if abs(deltas[k]) > 0.5
              and (k not in ratios or ratios[k] > 1.25 or ratios[k] < 0.8)]
    movers.sort(key=lambda k: -abs(deltas[k]))
    regressed = [k for k in movers if deltas[k] > 0]
    improved = [k for k in movers if deltas[k] < 0]
    if movers:
        print(f"movers beyond band (|d|>0.5s, ratio outside [0.8,1.25]): "
              f"{len(regressed)} regressed, {len(improved)} improved")
        for k in movers[:15]:
            r = ratios.get(k, math.nan)
            print(f"  {k:<32} {qa[k]:7.2f}s -> {qb[k]:7.2f}s "
                  f"({deltas[k]:+6.2f}s, {r:5.2f}x)  [{family(k)}]")
        if len(movers) > 15:
            print(f"  ... and {len(movers) - 15} more")

    # Verdict.  A loaded/slow-clock window inflates the WHOLE suite
    # (median ratio tracks the clock witness; regressed movers are the
    # jitter-prone tail smeared across families).  A code regression is
    # the opposite shape: median ~flat, specific queries far outside
    # what the clock can explain.
    if failed_b:
        verdict = (f"FAIL -- {len(failed_b)} candidate queries failed "
                   f"({', '.join(failed_b[:4])}); fix before comparing walls")
    elif not regressed:
        verdict = ("CLOCK -- no query regressed beyond the jitter band; "
                   f"total delta {b.get('value', 0) - a.get('value', 0):+.1f}s "
                   "is host drift (or the candidate is simply faster)")
    else:
        # clock-explicable: median ratio within the witness envelope,
        # or -- when the record predates the witness fields -- within
        # the host's proven bare +/-15% envelope (SCALE.md r13); few
        # regressed movers, spread across >1 family (a single-family or
        # single-query regression is a code signal even under drift).
        if clock:
            in_env = abs(med_r - clock) < 0.10 or 0.85 <= med_r <= 1.15
            env_note = f"tracks the witness {clock:.2f}"
        else:
            in_env = 0.85 <= med_r <= 1.15
            env_note = "sits inside the host's proven +/-15% envelope"
        # Two environment shapes, both distinct from a code regression:
        #  * few movers, all jitter-prone tails across families, median
        #    near the clock witness (the r13 driver-window shape);
        #  * the WHOLE suite uniformly inflated -- many regressed, ZERO
        #    improved, median visibly up, movers spread across >=3
        #    families (external load sharing the cores; a code bug
        #    cannot inflate the median of hundreds of untouched
        #    queries).
        fams = {family(k) for k in regressed}
        few_movers = (len(regressed) <= max(3, len(common) // 20)
                      and len(fams) > 1)
        uniform_shift = (not improved and med_r >= 1.03 and len(fams) >= 3)
        # Contended-core windows break the uniform_shift test when the
        # candidate ALSO carries real code improvements (improved != []):
        # the r14 resumed session read CODE on 30 cross-family movers
        # that all re-probed at baseline.  When the candidate's own
        # multi-core witness says cores were stolen and the regressions
        # are spread across >=3 families, trust the witness.
        contended_window = cores_contended and len(fams) >= 3
        clockish = in_env and (few_movers or uniform_shift)
        # external-load witness from the candidate's own loadavg fields
        try:
            load1 = max(float(str(b.get(k, "0")).split()[0])
                        for k in ("loadavg_start", "loadavg_end"))
        except (ValueError, IndexError):
            load1 = 0.0
        load_note = (f" (candidate 1-min loadavg up to {load1:.1f} -- "
                     "shared cores)") if load1 > 1.5 else ""
        if clockish:
            big = [k for k in regressed if ratios.get(k, 1) > 2.0]
            spot = ("; spot-check the >2x movers against the record's "
                    f"commit ({', '.join(big[:3])}: byte-identical source "
                    "=> host)" if big else "")
            if uniform_shift and not few_movers:
                shape = ("the whole suite shifted uniformly (0 improved) "
                         "-- external load, not code")
            else:
                shape = (f"the {len(regressed)} regressed movers are "
                         "jitter-prone tails across families; no code signal")
            verdict = (f"CLOCK/HOST -- median ratio {med_r:.2f} "
                       f"{env_note}; {shape}{load_note}{spot}")
        elif contended_window:
            # A contention witness ALONE (mt ratio > 1.3 or steal > 1%)
            # must not definitively exonerate the candidate: a genuine
            # broad regression that happens to run under mild steal
            # would be waved through (ADVICE r14 #1). Demand a re-probe
            # of the movers in isolation -- same-session probe A/Bs
            # cancel the host regime; the witnesses say the window is
            # dirty, not that the code is clean.
            verdict = (f"RE-PROBE -- a contention witness (multi-core or "
                       f"steal) flags core theft and the {len(regressed)} "
                       f"regressed movers span {len(fams)} families, but "
                       f"the single-thread clock does not corroborate "
                       f"(median ratio {med_r:.2f}); re-probe the movers "
                       "in isolation (graft.tools.OptProbe time "
                       + " ".join(regressed[:5]) + ") before concluding"
                       f"{load_note}")
        else:
            verdict = (f"CODE -- {len(regressed)} queries regressed beyond "
                       "what the clock witness explains; investigate: "
                       + ", ".join(regressed[:5]))
    print(f"verdict: {verdict}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # | head
        pass
