#!/usr/bin/env python
"""The contract workflow end-to-end (r11) — Deequ's suggest → trim →
gate loop on this engine's expectations tier:

1. **Suggest**: ``expectations.suggest_rules`` profiles the corpus in
   one aggregation and proposes a contract that holds by construction.
2. **Trim by hand**: suggestions are a STARTING POINT — the operator
   drops rules that would over-fit (observed bounds on the key column,
   a frozen vocabulary for an open-ended field) and loosens the ones
   expected to move between releases.
3. **Gate**: the trimmed contract + row-count drift + numeric PSI
   drift guard every release (``write_version(expect=...,
   max_row_delta_frac=.., max_psi=..)``); a violating release never
   commits.
4. **Audit**: ``versioning.release_card`` publishes the dataset card
   WITH the recorded contract trail — gated releases show their rule
   counts, ungated ones show NULL (visible, not silently equal).

Run: python examples/contract_workflow.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import expectations as E, versioning
from mongo_arrow_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    store = tempfile.mkdtemp(prefix="contract_wf_") + "/release"
    spark = get_spark("contract-workflow")
    docs = load_tables(spark, sf_dir)["documents"]

    # 1. suggest: every proposed rule is true on the profiled frame
    suggested = E.suggest_rules(docs)
    print(f"suggested {len(suggested)} rules:")
    for r in suggested:
        print("   ", r["kind"], r.get("column") or r.get("columns") or "*")
    assert E.check(docs, suggested).filter(
        F.col("status") == "fail"
    ).count() == 0, "suggestions must hold by construction"

    # 2. trim by hand: drop the observed-bounds rule on the KEY column
    # (ids grow forever) and any frozen vocabulary on the open-ended
    # source field; loosen the n_chars bound for future longer docs
    # ... and keep uniqueness only for the actual key: the profiler
    # can't know that distinct text at this scale was incidental
    trimmed = [
        r
        for r in suggested
        if not (r["kind"] == "in_range" and r.get("column") in ("doc_id",))
        and not (
            r["kind"] == "accepted_values" and r.get("column") == "source"
        )
        and not (r["kind"] == "in_range" and r.get("column") == "n_chars")
        and not (
            r["kind"] == "unique" and r.get("columns") != ["doc_id"]
        )
    ]
    trimmed.append(E.in_range("n_chars", 1, 10_000, max_violation_frac=0.01))
    trimmed.append(E.matches("source", "^src[0-9]+$"))
    print(f"trimmed to {len(trimmed)} rules (the human step)")

    # 3. gate the releases
    meta = versioning.write_version(docs, store, expect=trimmed)
    print(f"v{meta['version']} committed under the trimmed contract")
    grown = docs.unionByName(
        docs.limit(20).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    meta = versioning.write_version(
        grown,
        store,
        expect=trimmed,
        max_row_delta_frac=0.5,
        max_psi={"n_chars": 0.2},
    )
    print(
        f"v{meta['version']} committed through contract + row-drift + "
        "PSI gates"
    )
    # a vocabulary-breaking release must be refused by the SAME contract
    broken = grown.withColumn("lang", F.lit("zz"))
    try:
        versioning.write_version(broken, store, expect=trimmed)
        raise SystemExit("gate failed to refuse a broken release")
    except E.ExpectationError as e:
        print(f"gate refused a broken release: {str(e)[:80]}...")
    assert [m["version"] for m in versioning.list_versions(store)] == [1, 2]

    # 4. audit trail on the card
    card = versioning.release_card(spark, store).first()
    print(
        f"release card v{card['version']}: {card['n_docs']} docs, "
        f"contract_rules={card['contract_rules']}, "
        f"contract_failed={card['contract_failed']}"
    )
    assert card["contract_rules"] == len(trimmed)
    assert card["contract_failed"] == 0
    # an ungated hotfix release is visible as such
    versioning.write_version(grown.limit(30), store, max_row_delta_frac=None)
    ungated = versioning.release_card(spark, store).first()
    assert ungated["contract_rules"] is None
    print(
        f"release card v{ungated['version']}: shipped UNGATED "
        "(contract columns NULL — the card shows it)"
    )
    print("contract workflow complete")


if __name__ == "__main__":
    main()
