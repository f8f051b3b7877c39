"""Deterministic synthetic docket tree (FIXTURES.md §A1/A2).

Small, seeded, and intentionally messy: records with absent optional
keys, ~1%-style sparse fields, per-docket comment-volume skew, and a
corrupt file — the failure modes the reference's try/except walk
handles one file at a time (``convert_to_iceberg.py:237-270``).

``build_records`` is the single source of truth: ``write_docket_tree``
serializes it to JSON files, and the workload oracle replays it in
plain Python — both sides of every differential check derive from the
same in-memory records, so the fixture can never drift between them.
"""

from __future__ import annotations

import json
import os
import random

AGENCIES = ("CMS", "DEA", "EPA")

#: Per-docket comment volumes — skewed on purpose (the reference corpus
#: ranges 981..25,725 per docket, CONVERSION_READY.md:37-41).
COMMENT_COUNTS = (40, 8, 2)

N_DOCUMENTS = 2  # per docket
N_CORRUPT = 2  # malformed files dropped into the comments subtree


def _docket_ids(replica: int = 0) -> list[str]:
    """Docket ids for one fixture replica. ``replica`` shifts the year
    so multiple replicas can coexist under one tree root with disjoint
    ids — the knob the 20× ingest scale measurement uses (PLANS.md);
    replica 0 is the canonical fixture every oracle replays."""
    return [f"{a}-{2025 + replica}-{i:04d}" for i, a in enumerate(AGENCIES)]


def expected_counts() -> dict[str, int]:
    """Ground truth for round-trip tests."""
    return {
        "dockets": len(AGENCIES),
        "documents": len(AGENCIES) * N_DOCUMENTS,
        "comments": sum(COMMENT_COUNTS),
        "corrupt": N_CORRUPT,
    }


def build_records(seed: int = 42, replica: int = 0) -> dict[str, list[dict]]:
    """The whole tree as in-memory JSON:API records:
    ``{"dockets": [...], "documents": [...], "comments": [...]}``.
    Deterministic in ``seed`` — one ``random.Random`` drives every
    sparse-field draw in a fixed order."""
    rng = random.Random(seed)
    dockets: list[dict] = []
    documents: list[dict] = []
    comments: list[dict] = []
    for d_idx, docket_id in enumerate(_docket_ids(replica)):
        agency = docket_id.split("-")[0]
        dockets.append(
            {
                "data": {
                    "id": docket_id,
                    "type": "dockets",
                    "links": {"self": f"https://example.invalid/dockets/{docket_id}"},
                    "attributes": {
                        "title": f"Synthetic docket {docket_id}",
                        "agencyId": agency,
                    },
                    "relationships": {
                        "comments": {
                            "data": [
                                {"id": f"{docket_id}-{c:04d}"}
                                for c in range(COMMENT_COUNTS[d_idx])
                            ]
                        },
                        "documents": {
                            "data": [
                                {"id": f"{docket_id}-doc-{n}"}
                                for n in range(N_DOCUMENTS)
                            ]
                        },
                    },
                }
            }
        )

        for n in range(N_DOCUMENTS):
            doc_id = f"{docket_id}-doc-{n}"
            documents.append(
                {
                    "data": {
                        "id": doc_id,
                        "type": "documents",
                        "links": {
                            "self": f"https://example.invalid/documents/{doc_id}"
                        },
                        "attributes": {
                            "docketId": docket_id,
                            "agencyId": agency,
                            "title": f"Rule document {n}",
                            "documentType": "Rule" if n == 0 else "Notice",
                            "postedDate": f"2025-01-{n + 1:02d}T00:00:00Z",
                        },
                    }
                }
            )

        for c in range(COMMENT_COUNTS[d_idx]):
            comment_id = f"{docket_id}-{c:04d}"
            attrs = {
                "commentOn": f"{docket_id}-doc-0",
                "docketId": docket_id,
                "agencyId": agency,
                "comment": (
                    f"Synthetic comment {c} "
                    + ("about public health " if rng.random() < 0.25 else "")
                    + "text " * rng.randint(1, 30)
                ),
                "postedDate": f"2025-02-{rng.randint(1, 28):02d}T12:00:00Z",
                "withdrawn": rng.random() < 0.05,
                "documentType": "Public Submission",
            }
            # Absent-key sparsity (convert_to_iceberg.py:379-381): names
            # usually present, organization/reasonWithdrawn rarely.
            if rng.random() < 0.8:
                attrs["firstName"] = "Anonymous"
                attrs["lastName"] = "Anonymous"
            if rng.random() < 0.1:
                attrs["organization"] = f"Org {rng.randint(1, 5)}"
            record = {
                "data": {
                    "id": comment_id,
                    "type": "comments",
                    "links": {
                        "self": f"https://example.invalid/comments/{comment_id}"
                    },
                    "attributes": attrs,
                },
            }
            if rng.random() < 0.3:
                n_att = rng.randint(1, 3)
                record["data"]["relationships"] = {
                    "attachments": {
                        "data": [{"id": f"{comment_id}-att-{k}"} for k in range(n_att)]
                    }
                }
                record["included"] = [
                    {"id": f"{comment_id}-att-{k}", "type": "attachments"}
                    for k in range(n_att)
                ]
            comments.append(record)
    return {"dockets": dockets, "documents": documents, "comments": comments}


def write_docket_tree(
    root: str, seed: int = 42, replica: int = 0
) -> dict[str, int]:
    """Materialize the tree under ``root``; returns expected_counts().

    ``replica`` writes a disjoint-id copy (see ``_docket_ids``) so N
    calls on one root build an N× tree for ingest scale runs."""
    recs = build_records(seed, replica)
    for docket in recs["dockets"]:
        docket_id = docket["data"]["id"]
        base = os.path.join(root, docket_id, "raw-data")
        os.makedirs(os.path.join(base, "docket"), exist_ok=True)
        os.makedirs(os.path.join(base, "documents"), exist_ok=True)
        os.makedirs(os.path.join(base, "comments"), exist_ok=True)
        with open(os.path.join(base, "docket", f"{docket_id}.json"), "w") as f:
            json.dump(docket, f, indent=2)
    for doc in recs["documents"]:
        docket_id = doc["data"]["attributes"]["docketId"]
        base = os.path.join(root, docket_id, "raw-data")
        with open(
            os.path.join(base, "documents", f"{doc['data']['id']}.json"), "w"
        ) as f:
            json.dump(doc, f, indent=2)
    for rec in recs["comments"]:
        docket_id = rec["data"]["attributes"]["docketId"]
        base = os.path.join(root, docket_id, "raw-data")
        with open(
            os.path.join(base, "comments", f"{rec['data']['id']}.json"), "w"
        ) as f:
            json.dump(rec, f, indent=2)

    # Corrupt files (F7): truncated JSON in the first docket's comments.
    first = os.path.join(root, _docket_ids(replica)[0], "raw-data", "comments")
    for k in range(N_CORRUPT):
        with open(os.path.join(first, f"corrupt-{k}.json"), "w") as f:
            f.write('{"data": {"id": "broken", "attributes": {')
    return expected_counts()
