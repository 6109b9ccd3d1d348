"""Driver-hash freshness audit + canonical rotation generator.

The driver value-hashes the FIRST 50 registry entries each round
(CORRECTNESS_r{N}.json), so `queries/__init__._PRIORITY` is a rotation
schedule.  Hand-carrying its age arithmetic in comments drifted twice
(VERDICT r11/r12 "what's wrong" items), so from r13 the ordering and the
preamble's claims are GENERATED here, from the CORRECTNESS files
themselves:

    python examples/rotation_audit.py              # audit only
    python examples/rotation_audit.py --emit       # + canonical order

Canonical rotation = never-hashed entries first (new additions), then
ascending last-hashed round (stalest cohort next), ties broken by the
CURRENT priority position (keeps each cohort's internal order stable).
The close gate asserts the live _PRIORITY equals the canonical order —
if this script fails at close, the registry preamble is stale.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50

# Changed-surface promotion (VERDICT r16 item 3): queries whose Spark
# implementation was REWRITTEN in an optimization round must reach the
# driver's next 50-query hash window even when the age-based rotation
# would not — the window exists precisely to re-hash changed surfaces.
# Promotions are round-scoped: they apply only while the latest
# CORRECTNESS file predates PROMOTED_THROUGH_ROUND (once the driver has
# hashed them, the normal age rotation resumes).
PROMOTED_THROUGH_ROUND = 17
PROMOTED = [
    # r16 rewrites never driver-hashed post-change (VERDICT r16 item 3)
    "dedup_embedding_cosine",
    "dedup_levenshtein_pairs",
    "dedup_lsh_jaccard",
    "agg_cube_flag_status",
    "agg_grouping_sets",
    "tpch_q2_min_cost_supplier",
    "text_repetition_ratios",
    "agg_approx_count_distinct",
    "dedup_incremental_batch",
    "embed_documents_distributed",
    # r17 rewrites (single-pass BM25 scorer + two-step cosine, pinned
    # jaccard shingles, recursion-level job merge + pinned part view)
    "search_bm25_topk",
    "search_hybrid_rrf",
    "search_bm25_topk_batch",
    "search_hybrid_rrf_batch",
    "search_rerank_overlap",
    "dedup_jaccard_pairs",
    "recursive_cte_subtree_rollup",
    "recursive_bom_extended_quantity",
    "recursive_reachability_semi_naive",
    # r17 session-2 rewrites (exact verify sides of the two MLlib LSH
    # contrast rows vectorized to Arrow/numpy kernels)
    "similarity_join_brp_lsh",
    "dedup_minhash_mllib",
]


def last_hashed() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rec = json.load(f)
        for name, row in rec.items():
            if isinstance(row, dict) and row.get("err") is None:
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> int:
    sys.path.insert(0, ROOT)
    from binaryvectordb_spark.queries import QUERIES
    names = list(QUERIES)
    lh = last_hashed()
    cur_round = max(
        int(re.search(r"_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))

    pos = {n: i for i, n in enumerate(names)}
    promoted = (PROMOTED if cur_round < PROMOTED_THROUGH_ROUND else [])
    promo_rank = {n: i for i, n in enumerate(promoted)}
    canonical = sorted(
        names,
        key=lambda n: (0 if n in promo_rank else 1,
                       promo_rank.get(n, 0), lh.get(n, -1), pos[n]))
    if promoted:
        print(f"promotions active (through r{PROMOTED_THROUGH_ROUND}): "
              f"{len(promoted)} changed surfaces forced to the window head")

    hist: dict[int | None, int] = {}
    for n in names:
        hist[lh.get(n)] = hist.get(lh.get(n), 0) + 1
    print(f"registry: {len(names)} queries; driver window: {WINDOW}")
    print(f"latest CORRECTNESS round: r{cur_round}")
    print("last-hashed histogram (None = never):",
          dict(sorted(hist.items(), key=lambda kv: (kv[0] is None,
                                                    kv[0] or 0))))
    window = canonical[:WINDOW]
    never = [n for n in window if n not in lh]
    stalest_in = sorted({lh[n] for n in window if n in lh})
    behind = canonical[WINDOW:]
    worst_behind = min((lh.get(n, -1) for n in behind), default=None)
    print(f"next window: {len(never)} never-hashed + cohorts {stalest_in}")
    print(f"oldest hash left BEHIND the window: r{worst_behind} "
          f"(age after next round: {cur_round + 1 - worst_behind})")
    displaced = [n for n in behind if lh.get(n) == (stalest_in[0]
                                                    if stalest_in else None)]
    if displaced:
        print(f"displaced tail of the stalest cohort ({len(displaced)}): "
              f"{displaced}")

    # compare the FULL list, not just the window (r13 review: a
    # behind-the-window hand-edit would change the NEXT round's derived
    # window while still passing a window-only gate)
    ok = names == canonical
    print("live _PRIORITY matches canonical (full list):", ok)
    if "--emit" in sys.argv:
        print("\n# canonical order (paste into _PRIORITY):")
        for n in canonical:
            print(f'    "{n}",')
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
