#!/usr/bin/env python3
"""Round-18 per-query checklist generator: merges the round's before/after
bench lines into the OPTIMIZATION_r18.md table (sorted by before seconds,
disposition from the touched-map below, floor rule for the rest)."""
import json, sys

before = json.load(open(sys.argv[1]))
after = json.load(open(sys.argv[2]))

# dispositions for touched paths (query prefix -> note)
touched = {
    "q150": "KEPT: concurrent arm pins + spread dense arms (iso 5.73->4.12)",
    "q112": "KEPT: fused ADC broadcast + dropped codebook persist (iso 6.48->~4.9)",
    "q146": "KEPT: dense-arm + bm25 tokenize spread (A/B 3.47->2.81)",
    "q137": "KEPT: spread + spill-safe eagerPersist (A/B 2.05->0.76)",
    "q110": "KEPT: inline ADC fusion + codebook un-pinned (iso 3.09->~2.4)",
    "q109": "KEPT: inline ADC fusion + codebook un-pinned",
    "q81": "KEPT: embeddings loader spread (iso 3.24->2.67)",
    "q46": "KEPT: shingle/band kernel spread (iso 3.17->2.33)",
    "x46": "rides q46's kernels",
    "q84": "KEPT: rides q46's kernels (iso 4.25->2.98)",
    "q87": "KEPT: rides q46's kernels (iso 4.34->2.52)",
    "q122": "KEPT: rides q46's kernels (iso 4.34->2.82); r17 bySrc-pin negative stands",
    "q123": "KEPT: rides q46's kernels (iso 4.35->3.27)",
    "q149": "rides q46's edge kernels (spread)",
    "x149": "rides q46's edge kernels (spread)",
    "q21": "KEPT: minhash kernel spread (A/B wash 0.97->0.92)",
    "x21": "rides q21's kernels",
    "q22": "REVERTED: simhash spread (A/B 0.92->1.10) — fold cheap next to the banded join",
    "x22": "inherits q22's reverted disposition",
    "q23": "KEPT: shingle kernel spread (A/B 1.64->1.54)",
    "x23": "rides q23's kernels",
    "q95": "KEPT: embeddings loader spread (A/B 2.99->2.85)",
    "x95": "rides q95's kernels",
    "q96": "KEPT: loader spread; closes the r17 isolated anomaly (iso 10.9->4.4)",
    "q97": "KEPT: loader spread (A/B 2.49->2.09)",
    "q98": "examined: loader spread + eagerPersist lsh leg (A/B wash 3.12->3.31-3.54)",
    "q99": "KEPT: rides the dedup kernels (iso 2.85->1.97)",
    "x99": "rides q99's kernels",
    "q101": "KEPT: rides q23's shingle kernel (iso 2.93->2.23)",
    "q143": "examined: bm25 tokenize spread (A/B wash 2.08->2.12; kept for q146/q150 sharing)",
    "q147": "rides bm25Frames (spread); panel-prune staged behind the 256 MB floor",
    "q148": "rides bm25Frames (spread)",
    "q26": "KEPT: eagerPersist (spill-safe) + loader spread (A/B 1.28->1.21)",
    "q91": "rides lshTopK's spill-safe persist",
    "q118": "REVERTED: tokenize spread (A/B 0.83->1.05) — cost is the groupBys, not the fold",
    "q24": "rides the embeddings loader spread",
    "q25": "rides the embeddings loader spread",
    "q86": "rides the embeddings loader spread",
    "x86": "rides the embeddings loader spread",
    "q130": "rides the embeddings loader spread",
    "x81": "rides q81's plan (float verify)",
    "x110": "rides q110's plan (float verify)",
    "q83": "examined: probe side deliberately unspread (admission latency seam); index side spread",
    "x83": "inherits q83's disposition",
    "q152": "index side rides the spread; probe side unspread (admission seam)",
    "x152": "inherits q152's disposition",
}

qb, qa = before["queries"], after["queries"]
rows = []
for k in sorted(qb, key=lambda k: -qb[k]):
    b, a = qb[k], qa.get(k)
    note = touched.get(k)
    if note is None:
        note = ("at/near the per-query floor (r17 examination stands; "
                "re-measured this round, no duplicated pass)")
    rows.append((k, b, a, note))

print("| query | before s | after s | disposition |")
print("|---|---|---|---|")
for k, b, a, note in rows:
    print(f"| {k} | {b:.2f} | {a:.2f} | {note} |")
print()
print(f"suite total: {before['value']:.2f} -> {after['value']:.2f}")
iso_b, iso_a = before.get("isolated", {}), after.get("isolated", {})
common = [k for k in iso_b if k in iso_a and iso_b[k] > 0 and iso_a[k] > 0]
print("isolated (common):",
      ", ".join(f"{k} {iso_b[k]:.2f}->{iso_a[k]:.2f}" for k in sorted(common)))
