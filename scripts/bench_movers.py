#!/usr/bin/env python3
"""Automated mover adjudication between two bench runs.

Every round-over-round verdict has had to hand-adjudicate >1.2x
per-query movers (regression vs host drift) with interleaved A/Bs
(bench_ab.py) — expensive, so only the top few movers ever got
adjudicated and the long tail stayed "probably drift". Since r15 the
bench embeds its own host-drift canary (three fixed synthetic probes
in fresh child JVMs, start AND end of run, BenchCore.canaryNames);
this script turns that instrument into the adjudicator:

  1. join the two runs' per-query best times,
  2. normalize each ratio by the CPU-canary ratio (the host factor:
     the cpu probe is pure codegen hashing — it cannot move on a graft
     code change, only on host speed),
  3. verdict every mover beyond the threshold:
       - HOST DRIFT    : the normalized ratio falls back inside the
                         threshold band — the host moved, not the code
       - SUB-SECOND    : absolute time < 1 s in both runs — fixed-cost
                         (JVM/plan/setup) dominated; timing noise at
                         this magnitude exceeds any code signal
       - ESCALATE      : normalized, multi-second mover — run
                         scripts/bench_ab.py (interleaved A/B in fresh
                         JVMs) before reading it as a regression

The canary-normalized verdict replaces the hand A/B for the long
tail; ESCALATE rows are the short list that still deserves one.

A second adjudication lever when the host is unquiet (large or
drifting canary ratios): run the official bench TWICE at the same
HEAD and feed the pair to this script — the resulting "movers" are
same-code by construction, so that report IS the session's noise
floor, and any cross-round escalate that reproduces inside it (or
whose code path the round's git diff never touched) is drift, not
regression (see BENCH_MOVERS_r16.md's addendum for a worked
example: within-run canary drift of ±0.3 put 22 same-code queries
in the escalate band).

Inputs are driver-contract JSON lines (bench_results.json — one line:
{"metric":"total",...,"queries":{...},"canary":{...}}). The driver's
BENCH_rN.json wrapper (which retains only an output TAIL) is accepted
best-effort: query times are recovered from the surviving "passes"
fragments and the canary block, with a warning that sub-second
queries may be missing. For an old run with no embedded canary
(pre-r15), the host factor falls back to 1.0 and HOST DRIFT verdicts
cannot be issued — every mover escalates.

Usage:
  python3 scripts/bench_movers.py OLD.json NEW.json \
      [--out BENCH_MOVERS_rN.md] [--threshold 1.2] \
      [--old-label r15] [--new-label r16]
"""
import argparse
import json
import math
import re
import sys


def parse_run(path):
    """-> (times: {name: best_sec}, canary: {probe: sec} or None).

    Canary seconds are the mean of the run's start and end triples —
    the run-average host speed, which is what a whole-run comparison
    needs (start-vs-end drift WITHIN a run is the canary ratio already
    embedded in the line).
    """
    text = open(path).read().strip()
    # the whole file (the driver's pretty-printed BENCH_rN wrapper), or
    # the last line that parses (a driver-contract single-line run)
    obj = None
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        for line in reversed(text.splitlines()):
            try:
                obj = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if obj is None:
        sys.exit(f"{path}: no parseable JSON line")
    # driver wrapper with a fully-parsed run embedded
    if isinstance(obj.get("parsed"), dict) and "queries" in obj["parsed"]:
        obj = obj["parsed"]
    if "queries" in obj and isinstance(obj["queries"], dict):
        times = {k: float(v) for k, v in obj["queries"].items()
                 if isinstance(v, (int, float)) and float(v) > 0}
        canary = _canary_means(obj.get("canary"))
        # order = bench execution order (the queries map is emitted in
        # shard-merge order); shard_host = per-shard pure-JVM probe
        # brackets, present since r16
        return times, canary, obj.get("shard_host"), list(obj["queries"])
    if "tail" in obj:  # driver BENCH_rN.json wrapper: recover from tail
        tail = obj["tail"]
        times = {}
        for m in re.finditer(r'"(q_\w+)":\[([\d.eE+,-]+)\]', tail):
            try:
                passes = [float(x) for x in m.group(2).split(",")]
            except ValueError:
                continue
            if passes and all(p > 0 for p in passes):
                times[m.group(1)] = min(passes)
        canary = None
        cm = re.search(r'"canary":(\{.*)', tail)
        if cm:
            frag = cm.group(1)
            # the canary block is the last object on the line; trim to
            # its balanced prefix
            depth, end = 0, None
            for i, ch in enumerate(frag):
                if ch == "{":
                    depth += 1
                elif ch == "}":
                    depth -= 1
                    if depth == 0:
                        end = i + 1
                        break
            if end:
                try:
                    canary = _canary_means(json.loads(frag[:end]))
                except json.JSONDecodeError:
                    pass
        print(f"WARNING: {path} is a truncated driver tail — recovered "
              f"{len(times)} query times from pass fragments; sub-second "
              "queries (single-pass, no fragment) may be missing",
              file=sys.stderr)
        return times, canary, None, None
    sys.exit(f"{path}: neither a driver-contract line nor a BENCH_rN wrapper")


def _canary_means(c):
    if not c or "start" not in c or "end" not in c:
        return None
    out = {}
    for k in c["start"]:
        if k in c["end"]:
            out[k] = (float(c["start"][k]) + float(c["end"][k])) / 2.0
    return out or None


def geomean(xs):
    xs = [x for x in xs if x > 0]
    return math.exp(sum(math.log(x) for x in xs) / len(xs)) if xs else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--out", default=None)
    ap.add_argument("--threshold", type=float, default=1.2)
    ap.add_argument("--old-label", default="old")
    ap.add_argument("--new-label", default="new")
    args = ap.parse_args()

    t_old, c_old, sh_old, _ord_old = parse_run(args.old)
    t_new, c_new, sh_new, ord_new = parse_run(args.new)
    common = sorted(set(t_old) & set(t_new))
    if not common:
        sys.exit("no common queries between the two runs")

    host = 1.0
    host_note = ""
    if c_old and c_new and "__canary_cpu" in c_old and "__canary_cpu" in c_new:
        host = c_new["__canary_cpu"] / c_old["__canary_cpu"]
        others = {k: c_new[k] / c_old[k] for k in c_old
                  if k in c_new and k != "__canary_cpu"}
        host_note = (f"host factor (cpu canary, run-mean {args.new_label}/"
                     f"{args.old_label}) = {host:.3f}; other probes: "
                     + ", ".join(f"{k.replace('__canary_', '')}="
                                 f"{v:.3f}" for k, v in sorted(others.items())))
    else:
        host_note = ("no canary in both runs — host factor 1.0, HOST DRIFT "
                     "verdicts unavailable (every mover escalates)")

    # Per-shard host factors (since r16 the bench brackets every shard
    # child with a pure-JVM probe): a query normalizes by ITS OWN
    # shard's factor when both runs probed the same shard (matched by
    # index AND first/last query names — the pinned manifest keeps
    # shard composition stable across rounds), else by the run-mean
    # factor. This is what the run-mean canary cannot do: correct for
    # host drift WITHIN a run.
    ranges = []  # (firstPos, lastPos, factor) in new-run order
    if sh_old and sh_new and ord_new:
        qpos = {q: i for i, q in enumerate(ord_new)}

        def probe_mean(e):
            vals = [float(e[k]) for k in ("start", "end") if k in e]
            return sum(vals) / len(vals) if vals else None
        for eo in sh_old:
            en = next((x for x in sh_new
                       if x.get("shard") == eo.get("shard")), None)
            if (not en or en.get("first") != eo.get("first")
                    or en.get("last") != eo.get("last")):
                continue
            fo, fn = probe_mean(eo), probe_mean(en)
            if fo and fn and en["first"] in qpos and en["last"] in qpos:
                ranges.append((qpos[en["first"]], qpos[en["last"]], fn / fo))
        if ranges:
            host_note += (f"; per-shard probe factors for {len(ranges)} "
                          "matched shards: "
                          + ", ".join(f"{f:.3f}" for _, _, f in ranges))

        def factor_for(q):
            i = qpos.get(q)
            if i is not None:
                for a, b, f in ranges:
                    if a <= i <= b:
                        return f
            return host
    else:
        def factor_for(q):
            return host

    thr = args.threshold
    rows = []
    for q in common:
        r = t_new[q] / t_old[q]
        rn = r / factor_for(q)
        if max(r, 1 / r) <= thr:
            continue
        if max(rn, 1 / rn) <= thr:
            verdict = "HOST DRIFT"
            why = "normalized ratio inside the threshold band"
        elif t_old[q] < 1.0 and t_new[q] < 1.0:
            verdict = "SUB-SECOND"
            why = "fixed-cost dominated; noise exceeds code signal"
        else:
            verdict = "ESCALATE"
            why = "normalized multi-second mover — run bench_ab.py"
        rows.append((q, t_old[q], t_new[q], r, rn, verdict, why))
    rows.sort(key=lambda x: -max(x[4], 1 / x[4]))

    gm = geomean([t_new[q] / t_old[q] for q in common])
    gm_n = geomean([t_new[q] / t_old[q] / factor_for(q) for q in common])
    lines = [
        f"# Bench movers: {args.old_label} -> {args.new_label}",
        "",
        f"Runs: `{args.old}` ({len(t_old)} queries) vs `{args.new}` "
        f"({len(t_new)}); {len(common)} common.",
        "",
        f"- {host_note}",
        f"- geomean ratio over common queries: **{gm:.3f}** raw, "
        f"**{gm_n:.3f}** host-normalized",
        f"- movers beyond {thr}x: **{len(rows)}** "
        f"({sum(1 for r in rows if r[5] == 'ESCALATE')} escalate, "
        f"{sum(1 for r in rows if r[5] == 'HOST DRIFT')} host drift, "
        f"{sum(1 for r in rows if r[5] == 'SUB-SECOND')} sub-second)",
        "",
        f"| query | {args.old_label} s | {args.new_label} s | ratio | "
        "normalized | verdict | note |",
        "|---|---|---|---|---|---|---|",
    ]
    for q, to, tn, r, rn, verdict, why in rows:
        lines.append(f"| {q} | {to:.3f} | {tn:.3f} | {r:.3f} | {rn:.3f} | "
                     f"**{verdict}** | {why} |")
    if not rows:
        lines.append(f"| _none_ | | | | | | no mover beyond {thr}x |")
    report = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
        print(f"wrote {args.out}")
    print(report)


if __name__ == "__main__":
    main()
