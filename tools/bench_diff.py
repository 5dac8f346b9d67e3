#!/usr/bin/env python3
"""Per-query bench regression ledger.

Diffs two BENCH_r{N}.json files (driver format: {"n","rc","cpus","sf",
"parsed":{"queries":{name:sec}}}; a bare {"queries":...} line from a
local graft.Bench run also works) and separates SELECTIVE regressions
from uniform machine-load noise: per-query ratios are normalized by the
median ratio of all common queries, so a loaded box (everything ~1.3x)
reports nothing, while one query at 3x alone is flagged.

Flagged queries feed the fresh-JVM adjudication loop the round-8/10/11
judges ran by hand: in-suite driver numbers on a contended box routinely
show 2-5x phantom regressions that vanish in a standalone JVM.
`--remeasure` prints the exact ProfileQuery command for the flagged set;
`--run` executes it (sbt Test/runMain, one JVM, per-query sf0.001 warmup,
best-of-3 at sf0.1) and stamps TRIAGE_r{N}.json next to the new bench
file with a per-query contention-vs-regression verdict: fresh-JVM best
<= old driver seconds x threshold => "contention" (the box, not the
code), else "regression" (real - go profile it).

`--ledger` (r16 VERDICT #2 — automatic contention triage) compares ONE
bench file against the per-query MEDIAN of every matching-sf row in
BENCH_HISTORY.jsonl instead of a single prior round: the ledger median
is epoch-stable (builder fresh-JVM pairs + the judge's idle-box rerun
live there), so a contended driver row can't hide behind an equally
contended predecessor, and a RAW ratio >= threshold triggers the
fresh-JVM rerun — exactly the adjudication the r16 judge ran by hand
when the driver's 237 s row (real: 128 s idle) read as a 2.4x breach.

Usage:
  python3 tools/bench_diff.py BENCH_r07.json BENCH_r08.json [--threshold 1.5]
  python3 tools/bench_diff.py            # newest two BENCH_r*.json in repo root
  python3 tools/bench_diff.py --remeasure   # also print the re-run command
  python3 tools/bench_diff.py --run         # re-run + write TRIAGE_r{N}.json
  python3 tools/bench_diff.py BENCH_r16.json --ledger [--run]
                                         # vs BENCH_HISTORY per-query medians
  python3 tools/bench_diff.py --ledger --calib-floor 2.20
                  # pin the idle calibration floor (also GRAFT_CALIB_FLOOR
                  # env) instead of trusting the historical min; and
                  # --proxy-bound N for the untagged-row proxy test
"""
import glob
import json
import os
import re
import statistics
import subprocess
import sys


def _expand_from_history(path, partial, sf=None, total=None):
    """Match a partial (truncated or summary-line) queries dict to its
    full-precision row in BENCH_HISTORY.jsonl (append-only, one row per
    Bench run — the builder's AND the driver's post-round run, so no run
    overwrites another's ledger). A history row qualifies iff every
    query name shared with the partial agrees within 3-decimal rounding,
    its "sf" matches the partial's (when both are known — two distinct
    runs on a stable machine CAN agree to 3 decimals on the heaviest
    queries, r14 ADVICE), and, when the partial carries a total, the
    row's total agrees within rounding of the shared set. Newest
    qualifying row wins; multiple qualifiers print a stderr warning so a
    silent wrong-row attribution is at least visible. Returns the full
    dict or None."""
    hist = os.path.join(os.path.dirname(os.path.abspath(path)),
                        "BENCH_HISTORY.jsonl")
    if not os.path.exists(hist) or not partial:
        return None
    rows = []
    with open(hist) as f:
        for ln in f:
            ln = ln.strip()
            if ln:
                try:
                    rows.append(json.loads(ln))
                except json.JSONDecodeError:
                    pass
    matches = []
    for row in reversed(rows):
        full = row.get("queries")
        if not isinstance(full, dict):
            continue
        if sf is not None and row.get("sf") is not None and row["sf"] != sf:
            continue
        shared = set(full) & set(partial)
        if len(shared) >= min(5, len(partial)) and all(
                abs(full[q] - partial[q]) <= 2e-3 for q in shared):
            # the summary line's total covers ALL queries (including the
            # omitted tail), so a matching row's own total must agree to
            # rounding (3 decimals per entry, so allow 2e-3 slack overall)
            if total is not None and row.get("value") is not None and \
                    abs(float(row["value"]) - float(total)) > 2e-3:
                continue
            matches.append(full)
    if len(matches) > 1:
        print(f"# WARNING: {len(matches)} history rows match the partial "
              f"ledger in {os.path.basename(path)}; using the newest "
              "(pass the full BENCH_LOCAL.json to disambiguate)",
              file=sys.stderr)
    return matches[0] if matches else None


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    q = d.get("queries")
    if isinstance(q, dict) and q:
        # a round-14+ summary line marks how many sub-second entries were
        # cut for the tail-capture budget; 0 omitted = already complete
        if d.get("omitted", 0) == 0:
            return q
        return _expand_from_history(path, q, sf=d.get("sf"),
                                    total=d.get("value")) or q
    # Driver BENCH_r{N}.json files before round 14 carry parsed=null and
    # only a (possibly truncated) "tail" string holding the JSON line —
    # regex out every "name":seconds pair instead of failing (judge
    # round-8 finding: the tool exited on exactly the files it was
    # written for), then try to recover the full set from the history.
    tail = d.get("tail")
    if isinstance(tail, str):
        # require a ',' or '}' after the number so a value whose digits
        # were cut by stdout truncation (e.g. `"q_foo":12.3<EOF>`) is
        # dropped instead of silently recorded as a wrong timing
        q = {m.group(1): float(m.group(2))
             for m in re.finditer(r'"(q[^"]*)":(-?\d+(?:\.\d+)?)[,}]', tail)}
        if q:
            return _expand_from_history(path, q) or q
    raise SystemExit(f"{path}: no queries dict found")


def _ledger_medians(path, sf=None, epoch_bound=1.5, calib_floor=None,
                    proxy_bound=None):
    """Per-query median seconds over every BENCH_HISTORY.jsonl row whose
    sf matches (rows without an sf are skipped when sf is known), with
    EPOCH HYGIENE (r17 VERDICT #4): contended-epoch rows are excluded
    before the median, or every loaded driver run drags the per-query
    medians up and blinds the 1.5x flag a little more.

    A row is judged contended by its explicit epoch tag when it carries
    one — "calib_sec", a fixed CPU-bound calibration job Bench times at
    suite start AND end (max wins since r19); > epoch_bound x the floor
    means the box, not the code. The floor defaults to min(calib_sec)
    over the same history, which fails two ways (r18 ADVICE): an
    all-contended early history excludes nothing, and one anomalously
    fast calib after a box/JVM change mass-excludes legitimate older
    epochs. `calib_floor` (CLI --calib-floor / env GRAFT_CALIB_FLOOR;
    this box's documented idle constant is 2.20) pins it explicitly,
    with the historical min as fallback.

    Untagged (legacy) rows fall back to a proxy: the row's median
    per-query ratio against the ELEMENTWISE MIN across all rows (the
    idle envelope) — a uniform >bound inflation is load (a real code
    regression is selective and barely moves a 96-query median ratio).
    The proxy statistic has a different spread than the calib ratio (a
    quiet row's median still sits above the best-ever envelope, while
    calib is a tight fixed job), so it takes its own `proxy_bound`
    (--proxy-bound; defaults to epoch_bound for continuity).
    If everything is excluded, the least-inflated row is kept so the
    median never goes empty."""
    hist = os.path.join(os.path.dirname(os.path.abspath(path)),
                        "BENCH_HISTORY.jsonl")
    if not os.path.exists(hist):
        raise SystemExit(f"--ledger needs {hist}")
    rows = []
    with open(hist) as f:
        for ln in f:
            ln = ln.strip()
            if not ln:
                continue
            try:
                row = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if sf is not None and row.get("sf") != sf:
                continue
            if not isinstance(row.get("queries"), dict):
                continue
            rows.append(row)
    if not rows:
        return {}, 0
    mins = {}
    for row in rows:
        for name, sec in row["queries"].items():
            sec = float(sec)
            if sec >= 0 and (name not in mins or sec < mins[name]):
                mins[name] = sec
    if calib_floor is None:
        calibs = [float(r["calib_sec"]) for r in rows
                  if isinstance(r.get("calib_sec"), (int, float))
                  and float(r["calib_sec"]) > 0]
        calib_floor = min(calibs) if calibs else None
    if proxy_bound is None:
        proxy_bound = epoch_bound

    def proxy_factor(row):
        rat = [float(s) / mins[q] for q, s in row["queries"].items()
               if mins.get(q, 0) > 0 and float(s) >= 0]
        return statistics.median(rat) if rat else 1.0

    kept, dropped = [], []
    for row in rows:
        tag = row.get("calib_sec")
        if isinstance(tag, (int, float)) and float(tag) > 0 and calib_floor:
            contended = float(tag) > calib_floor * epoch_bound
            why = f"calib {float(tag):.2f}s vs floor {calib_floor:.2f}s"
        else:
            pf = proxy_factor(row)
            contended = pf > proxy_bound
            why = f"proxy uniform factor {pf:.2f}x vs idle envelope"
        (dropped if contended else kept).append((row, why))
    if not kept:  # never let hygiene empty the ledger
        best = min(rows, key=proxy_factor)
        kept = [(best, "least-inflated fallback")]
        dropped = [(r, w) for r, w in dropped if r is not best]
    if dropped:
        print(f"# epoch hygiene: excluded {len(dropped)}/{len(rows)} "
              f"contended ledger rows (bound {epoch_bound}x): " + "; ".join(
                  f"total={r.get('value', 0):.1f}s ({w})" for r, w in dropped),
              file=sys.stderr)
    samples = {}
    for row, _ in kept:
        for name, sec in row["queries"].items():
            if float(sec) >= 0:
                samples.setdefault(name, []).append(float(sec))
    return {q: statistics.median(v) for q, v in samples.items()}, len(kept)


def _write_triage(new_path, payload):
    rnum = re.search(r"r(\d+)", os.path.basename(new_path))
    out = os.path.join(os.path.dirname(os.path.abspath(new_path)),
                       f"TRIAGE_{'r' + rnum.group(1) if rnum else 'local'}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"# wrote {out}")
    return out


def _profile(names, reps, root):
    """One ProfileQuery JVM over `names`; returns query -> best seconds."""
    cmd = ["sbt", "-batch",
           "Test/runMain graft.tools.ProfileQuery " + " ".join(names + [str(reps)])]
    print("# fresh-JVM re-measure command:")
    print("  " + " ".join(f"'{c}'" if " " in c else c for c in cmd))
    proc = subprocess.run(cmd, cwd=root, capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        print(f"# WARNING: sbt exited {proc.returncode}", file=sys.stderr)
    return {m.group(1): float(m.group(2)) for m in re.finditer(
        r"\[prof\] (\S+)\s+best\s+([0-9.]+) s", proc.stdout)}


def _rerun_and_verdict(names, baseline, new, threshold, reps=3):
    """Fresh-JVM best-of-N per flagged query via ProfileQuery; verdict
    per query: fresh <= baseline x threshold => the driver row was the
    BOX (contention), else the CODE (regression — go profile it).

    Two passes: one shared JVM over every flagged query (cheap), then
    any residual "regression" re-measured ALONE in its own JVM — a
    40-query shared JVM accumulates heap/GC state that inflates
    late-position rows (r16: q_boilerplate read 1.36 s at position 28
    of 44 but 0.48 s solo), and a regression verdict sends someone
    profiling, so it must survive isolation before it's recorded.

    The isolated pass runs at max(reps, 8): a solo JVM lacks the JIT
    state every other mode accumulates (the suite's 90+ predecessors,
    or the shared pass's earlier queries), and iterative queries ramp
    for many reps — q_corpus_clusters descends monotonically 3.8 s →
    2.2 s over 8 fresh-JVM reps (r17 VERDICT #1: the triage's isolated
    6.2 s number at low reps contradicted every other measurement of
    the same code; it was the ramp, not the query). Both passes feed
    min() into the verdict, so extra reps can only make the verdict
    more accurate, never flakier."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best = _profile(names, reps, root)
    residual = [q for q in names
                if best.get(q) is not None
                and best[q] > baseline[q] * threshold]
    solo = {}
    if residual:
        print(f"# {len(residual)} residual regression(s) — isolated "
              "single-query JVM confirmation pass:")
        for q in residual:
            solo.update(_profile([q], max(reps, 8), root))
    triage = {}
    for q in names:
        fresh = best.get(q)
        if q in solo and solo[q] is not None:
            fresh = min(fresh, solo[q])
        verdict = ("no-fresh-jvm-number" if fresh is None else
                   "contention" if fresh <= baseline[q] * threshold else
                   "regression")
        triage[q] = {"baseline_sec": baseline[q],
                     "driver_sec": new[q],
                     "fresh_jvm_best_sec": fresh,
                     "verdict": verdict}
        if q in solo:
            triage[q]["isolated_jvm_best_sec"] = solo[q]
    return triage


def main_ledger(new_path, threshold, argv, reps=3, calib_floor=None,
                proxy_bound=None):
    new = load_queries(new_path)
    with open(new_path) as f:
        d = json.load(f)
        if isinstance(d.get("parsed"), dict):
            d = d["parsed"]
    med, nrows = _ledger_medians(new_path, sf=d.get("sf"),
                                 calib_floor=calib_floor,
                                 proxy_bound=proxy_bound)
    # the new row's own epoch tag, when Bench stamped one: a contended
    # new row is self-identifying before any per-query flag fires
    tag = d.get("calib_sec")
    if isinstance(tag, (int, float)) and float(tag) > 0:
        print(f"# new row epoch tag: calib_sec={float(tag):.2f}s "
              f"load={d.get('load', '?')} — ratios below are suspect if "
              "this exceeds the ledger's tagged floor")
    common = sorted(set(new) & set(med))
    if not common:
        raise SystemExit("no queries shared with the history ledger")
    ratios = {q: new[q] / med[q] for q in common if med[q] > 0}
    uniform = statistics.median(ratios.values())
    flagged = {q: r for q, r in ratios.items() if r >= threshold}
    print(f"# {os.path.basename(new_path)} vs BENCH_HISTORY.jsonl medians "
          f"({nrows} rows, {len(common)} common queries): uniform factor "
          f"{uniform:.2f}x, raw-ratio threshold {threshold}x")
    print(f"# total: ledger-median {sum(med[q] for q in common):.1f}s -> "
          f"driver {sum(new[q] for q in common):.1f}s on the common set")
    payload = {"mode": "ledger", "new": os.path.basename(new_path),
               "history_rows": nrows, "threshold": threshold,
               "uniform_factor": round(uniform, 3), "queries": {}}
    if not flagged:
        print("OK: no row exceeds the ledger median by the threshold")
        if "--run" in argv:
            _write_triage(new_path, payload)
        return 0
    print(f"ROWS OVER LEDGER MEDIAN ({len(flagged)}):")
    for q, r in sorted(flagged.items(), key=lambda kv: -kv[1]):
        print(f"  {q}: ledger median {med[q]:.2f}s -> driver {new[q]:.2f}s "
              f"({r:.2f}x)")
    if "--run" in argv:
        names = sorted(flagged, key=lambda q: -flagged[q])
        payload["reps"] = reps
        payload["queries"] = _rerun_and_verdict(names, med, new, threshold,
                                                reps)
        _write_triage(new_path, payload)
        for q, t in payload["queries"].items():
            fj = t["fresh_jvm_best_sec"]
            print(f"  {q}: driver {t['driver_sec']:.2f}s, ledger "
                  f"{t['baseline_sec']:.2f}s, fresh-JVM "
                  f"{fj if fj is None else format(fj, '.2f')}s -> {t['verdict']}")
    return 1


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    threshold = 1.5
    # Fresh-JVM reps per flagged query. 3 is enough for steady queries,
    # but the high-variance single-partition rows (corpus_pipeline,
    # semantic_dedup) need ~5 before best-of-N converges to the ledger
    # median — the r16 triage's first pass at reps=3 mislabeled three
    # contention rows as regressions that reps=6 cleared.
    reps = 3
    # explicit idle calibration floor: CLI wins, then env, then the
    # historical min fallback inside _ledger_medians (r18 ADVICE)
    calib_floor = None
    if os.environ.get("GRAFT_CALIB_FLOOR"):
        calib_floor = float(os.environ["GRAFT_CALIB_FLOOR"])
    proxy_bound = None
    for a in argv:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
        if a.startswith("--calib-floor"):
            calib_floor = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
        if a.startswith("--proxy-bound"):
            proxy_bound = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
    if "--ledger" in argv:
        if not args:
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            bench = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                           key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
            if not bench:
                raise SystemExit("need a BENCH_r*.json file")
            args = [bench[-1]]
        return main_ledger(args[0], threshold, argv, reps,
                           calib_floor=calib_floor, proxy_bound=proxy_bound)
    if len(args) >= 2:
        old_path, new_path = args[0], args[1]
    else:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        bench = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                       key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        if len(bench) < 2:
            raise SystemExit("need two BENCH_r*.json files")
        old_path, new_path = bench[-2], bench[-1]

    old, new = load_queries(old_path), load_queries(new_path)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    med = statistics.median(ratios.values())
    print(f"# {os.path.basename(old_path)} -> {os.path.basename(new_path)}: "
          f"{len(common)} common queries, median ratio {med:.2f}x "
          f"(uniform load factor), selective threshold {threshold}x")
    print(f"# total: {sum(old[q] for q in common):.1f}s -> "
          f"{sum(new[q] for q in common):.1f}s on the common set")
    only_new = sorted(set(new) - set(old), key=lambda q: -new[q])
    if only_new:
        print("# new this round: " +
              ", ".join(f"{q} {new[q]:.2f}s" for q in only_new))
    flagged = {q: r / med for q, r in ratios.items() if r / med >= threshold}
    if not flagged:
        print("OK: no selective regression (load-normalized)")
        if "--run" in argv:
            # still stamp the (empty) triage: the artifact proves the
            # adjudication ran against THIS ledger pair, the round-12
            # process miss (a stale TRIAGE is indistinguishable from a
            # skipped one)
            rnum = re.search(r"r(\d+)", os.path.basename(new_path))
            out = os.path.join(os.path.dirname(os.path.abspath(new_path)),
                               f"TRIAGE_{'r' + rnum.group(1) if rnum else 'local'}.json")
            with open(out, "w") as f:
                json.dump({"old": os.path.basename(old_path),
                           "new": os.path.basename(new_path),
                           "threshold": threshold,
                           "median_ratio": med,
                           "queries": {}}, f, indent=2)
            print(f"# wrote {out} (no flagged queries)")
        return 0
    print(f"SELECTIVE REGRESSIONS ({len(flagged)}):")
    for q, nr in sorted(flagged.items(), key=lambda kv: -kv[1]):
        print(f"  {q}: {old[q]:.2f}s -> {new[q]:.2f}s  "
              f"raw {ratios[q]:.2f}x, load-normalized {nr:.2f}x")

    if "--remeasure" in argv or "--run" in argv:
        names = sorted(flagged, key=lambda q: -flagged[q])
        cmd = ["sbt", "-batch",
               "Test/runMain graft.tools.ProfileQuery " + " ".join(names + [str(reps)])]
        print("# fresh-JVM re-measure command:")
        print("  " + " ".join(f"'{c}'" if " " in c else c for c in cmd))
        if "--run" in argv:
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            proc = subprocess.run(cmd, cwd=root, capture_output=True, text=True)
            sys.stdout.write(proc.stdout[-2000:])
            best = {m.group(1): float(m.group(2)) for m in re.finditer(
                r"\[prof\] (\S+)\s+best\s+([0-9.]+) s", proc.stdout)}
            triage = {}
            for q in names:
                fresh = best.get(q)
                verdict = ("no-fresh-jvm-number" if fresh is None else
                           "contention" if fresh <= old[q] * threshold else
                           "regression")
                triage[q] = {"old_driver_sec": old[q],
                             "new_driver_sec": new[q],
                             "fresh_jvm_best_sec": fresh,
                             "verdict": verdict}
            rnum = re.search(r"r(\d+)", os.path.basename(new_path))
            out = os.path.join(os.path.dirname(os.path.abspath(new_path)),
                               f"TRIAGE_{'r' + rnum.group(1) if rnum else 'local'}.json")
            with open(out, "w") as f:
                json.dump({"old": os.path.basename(old_path),
                           "new": os.path.basename(new_path),
                           "threshold": threshold,
                           "queries": triage}, f, indent=2)
            print(f"# wrote {out}")
            for q, t in triage.items():
                fj = t["fresh_jvm_best_sec"]
                print(f"  {q}: driver {t['new_driver_sec']:.2f}s, fresh-JVM "
                      f"{fj if fj is None else format(fj, '.2f')}s -> {t['verdict']}")
            if proc.returncode != 0:
                print(f"# WARNING: sbt exited {proc.returncode}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
