"""Refreeze per-query bench budgets at close-out (r10 VERDICT item 8):
budget = 2x the best-known per-query min across rounds, i.e.
min(previous budget, 2x this close-out's min) — a budget can only
TIGHTEN, never loosen — except for queries whose registered computation
changed this round (audit-form re-baselines, the r09 precedent), which
re-baseline at 2x the new form's close-out min.

r12: REBASELINE holds dedup_minhash_lsh, carried over from r11 — its
r11 mid-build audit extension (raw-text equivalence pass on top of the
xxhash pipeline) was priced against the pre-audit budget all of r11
because the r11 close-out refreeze never ran (r11 VERDICT item 1); the
re-baseline the r11 tool declared is executed HERE, at the first
close-out that actually runs.  No r12 change altered any query's
computation (every optimization is value-identical, xxhash-verified).

Usage: python tools/refreeze_budgets.py [closeout_json]
"""

from __future__ import annotations

import json
import sys

# Queries whose registered computation changed since their budget was
# frozen (all in the r11 mid-build, budgets never re-baselined because
# the r11 refreeze never ran — r11 VERDICT item 1):
# * dedup_minhash_lsh: runs the xxhash pipeline PLUS the raw-text
#   equivalence audit (re-baseline declared by the r11 tool);
# * ann_pca_topk: converted from rows-only to the equivalence-audit
#   form in b90a6f6 — it now ALSO runs an independent projected-space
#   candidate leg at 2x the candidate budget plus a full-width cosine
#   re-join and rank checks; its 1.453s budget priced the bare
#   pca_topk call (same r09 audit-form precedent).
REBASELINE = {"dedup_minhash_lsh", "ann_pca_topk"}


def main() -> None:
    closeout_path = (
        sys.argv[1] if len(sys.argv) > 1 else "reports/bench_closeout.json"
    )
    with open(closeout_path) as fh:
        closeout = json.load(fh)
    with open("reports/bench_budget.json") as fh:
        budget_doc = json.load(fh)
    budgets = budget_doc["budget_seconds"]
    mins = closeout["queries"]

    tightened, rebased, kept = [], [], []
    for name, old in sorted(budgets.items()):
        if name not in mins:
            kept.append(name)
            continue
        cand = round(2.0 * mins[name], 3)
        if name in REBASELINE:
            budgets[name] = cand
            rebased.append((name, old, cand))
        elif cand < old:
            budgets[name] = cand
            tightened.append((name, old, cand))
        else:
            kept.append(name)

    budget_doc["basis"] = (
        "2.0 x best-known per-query min across all rounds' full bench "
        "runs; r12 close-out refreeze (OPTIMIZATION_r12.md): budgets "
        "tightened to 2x the r12 close-out min wherever that is lower "
        "than the standing budget, never loosened; dedup_minhash_lsh "
        "and ann_pca_topk re-baselined at 2x the close-out min because "
        "their registered computations gained equivalence audits in the "
        "r11 mid-build (raw-text audit / independent projected-space "
        "leg) and the r11 refreeze never ran (r11 VERDICT item 1; r09 "
        "audit-form precedent). Close-out git_sha: "
        + str(closeout.get("git_sha"))
    )
    with open("reports/bench_budget.json", "w") as fh:
        json.dump(budget_doc, fh, indent=1, sort_keys=True)
    print(f"tightened {len(tightened)}, rebased {len(rebased)}, "
          f"kept {len(kept)}")
    for name, old, new in rebased:
        print(f"  REBASE {name}: {old} -> {new}")
    for name, old, new in sorted(tightened, key=lambda t: t[1] - t[2])[-15:]:
        print(f"  tighten {name}: {old} -> {new}")


if __name__ == "__main__":
    main()
