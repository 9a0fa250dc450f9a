"""Diff two shuffle-ledger artifacts (PLANS_r{N}.json, written by
``plan_audit.py --ledger``).

The ledger exists so a quiet plan change that adds a shuffle without
changing answers gets caught the round it lands; this is the diff that
reads two of them. Prints added/removed queries and, for every query
whose fingerprint changed, the per-counter delta — an exchanges bump is
the "new shuffle" signal, a broadcasts drop is the "lost broadcast"
signal, a scans bump is the "extra pass over the data" signal.

    python scripts/plan_diff.py PLANS_r13.json PLANS_r14.json
"""

from __future__ import annotations

import argparse
import json
import sys

COUNTERS = ("exchanges", "broadcasts", "bnlj", "scans", "aqe_shuffle_reads")


def diff(old: dict, new: dict) -> dict:
    oq, nq = old["queries"], new["queries"]
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    changed = {
        name: {k: (oq[name][k], nq[name][k]) for k in COUNTERS if oq[name][k] != nq[name][k]}
        for name in sorted(set(oq) & set(nq))
        if any(oq[name][k] != nq[name][k] for k in COUNTERS)
    }
    return {
        "added": added,
        "removed": removed,
        "changed": changed,
        "old_errors": old.get("errors", {}),
        "new_errors": new.get("errors", {}),
        "totals_delta": {
            k: new["totals"].get(k, 0) - old["totals"].get(k, 0) for k in COUNTERS
        },
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    d = diff(old, new)
    for name in d["added"]:
        print(f"+ {name}: {new['queries'][name]}")
    for name in d["removed"]:
        print(f"- {name}")
    for name, deltas in d["changed"].items():
        parts = ", ".join(f"{k} {a}→{b}" for k, (a, b) in deltas.items())
        print(f"~ {name}: {parts}")
    if d["old_errors"] or d["new_errors"]:
        print(f"! errors — old: {sorted(d['old_errors'])}, new: {sorted(d['new_errors'])}")
    print(json.dumps({"summary": {"added": len(d["added"]),
                                  "removed": len(d["removed"]),
                                  "changed": len(d["changed"]),
                                  "totals_delta": d["totals_delta"]}}))
    # a changed fingerprint is a signal, not automatically a failure: exit
    # nonzero only for errors, so CI can gate on broken sweeps while plan
    # drift stays a human review item (the commit must explain it)
    return 1 if (d["old_errors"] or d["new_errors"]) else 0


if __name__ == "__main__":
    sys.exit(main())
