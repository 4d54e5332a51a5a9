#!/usr/bin/env python3
"""Regression flags for bench sweeps: BENCH_FULL.json(s) vs bench_prior.json.

The TWO-KEY + EPSILON rule the round gates apply, checked in so the
analysis is reproducible instead of ad-hoc:

  flag(query) iff  wall > 2*prior_wall + EPS
              AND (no task floor OR task > 2*prior_task + EPS)

- two keys: a loaded box stretches WALL while task-seconds stay flat
  (scheduler noise, not a regression); a real plan regression moves
  both. Requiring both keys is what kept r12/r13 load flaps out of the
  verdicts.
- EPS (0.3 s absolute): sub-second queries flap by scheduler/GC
  quanta a pure ratio misreads — tt12's one-task manifest read has a
  4 ms task floor, so an 80 ms flap is "20x" while being pure jitter;
  dd6's 0.45 s wall doubles under load atop a flat 3.9 s task profile.
  The epsilon sits far below any regression worth a round's attention
  and far above the observed jitter quanta.

Usage: tools/flags.py BENCH_FULL_1.json [BENCH_FULL_2.json ...]
(min-of-sweeps across all FULLs given; prior read from
bench_prior.json). Exit 1 iff any flag fires.
"""
import json
import sys

EPS = 0.3


def main():
    fulls = [json.load(open(p)) for p in sys.argv[1:]]
    if not fulls:
        print(__doc__)
        return 2
    prior = json.load(open("bench_prior.json"))

    def best(section, name):
        vals = [f.get(section, {}).get(name) for f in fulls]
        vals = [v for v in vals if v is not None]
        return min(vals) if vals else None

    names = set()
    for f in fulls:
        names |= set(f.get("queries", {}))
    # a prior query missing from every sweep is a shrunk regression
    # surface, not a pass — surface it loudly (renames/drops must be
    # explained in BENCH_NOTES, never silent)
    uncompared = sorted(set(prior) - names)
    for n in uncompared:
        print(f"UNCOMPARED {n}: in bench_prior but absent from the sweep(s)")
    flags = []
    for n in sorted(names):
        p = prior.get(n)
        if p is None:
            continue
        pw = p["wall"] if isinstance(p, dict) else p
        pt = p.get("task") if isinstance(p, dict) else None
        w, t = best("queries", n), best("task_s", n)
        wall_bad = w is not None and w > 2 * pw + EPS
        # a prior task floor with NO task data in the sweep cannot
        # acquit a wall regression — treat missing task data as bad
        task_bad = pt is None or t is None or t > 2 * pt + EPS
        if wall_bad and task_bad:
            flags.append((n, pw, w, pt, t))
    for n, pw, w, pt, t in flags:
        print(f"FLAG {n}: wall {pw:.3f}->{w:.3f} task {pt}->{t}")
    if not flags:
        print(f"no flags ({len(names)} queries, {len(fulls)} sweep(s), "
              f"eps={EPS}s, two-key rule"
              + (f", {len(uncompared)} UNCOMPARED" if uncompared else "")
              + ")")
    # UNCOMPARED is a gate failure too: a silently shrunk regression
    # surface must not exit 0 — a rename/drop is acknowledged by
    # updating bench_prior.json, never by the sweep just omitting it
    return 1 if (flags or uncompared) else 0


if __name__ == "__main__":
    sys.exit(main())
