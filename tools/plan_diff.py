#!/usr/bin/env python3
"""Diff two PlanAudit artifacts (PLANS.json): flag every query whose
physical-plan health counts changed — a join degrading from broadcast
to sort-merge, a new exchange, lost filter pushdown, an operator
falling out of whole-stage codegen. Plan diffs are exact (no noise
threshold): any count change is a
real plan change and deserves a look, even when benign (e.g. an extra
scan from a new shared-relation reuse).

Usage: python3 tools/plan_diff.py PLANS_old.json PLANS_new.json
Exit 0 = no diffs, 1 = diffs printed.
"""
import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    diffs = 0
    for q in sorted(set(old) | set(new)):
        a, b = old.get(q), new.get(q)
        if a == b:
            continue
        diffs += 1
        if a is None:
            print(f"[plan_diff] {q}: NEW query")
        elif b is None:
            print(f"[plan_diff] {q}: REMOVED query")
        else:
            changed = {
                k: (a.get(k), b.get(k))
                for k in sorted(set(a) | set(b))
                if a.get(k) != b.get(k)
            }
            parts = ", ".join(f"{k} {v[0]}->{v[1]}" for k, v in changed.items())
            print(f"[plan_diff] {q}: {parts}")
    if diffs == 0:
        print(f"[plan_diff] no plan changes across {len(new)} queries")
    return 0 if diffs == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
