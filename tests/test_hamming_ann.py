"""Recall pin for the bit-packed Hamming ANN tier (B753/B754).

The q685/q686 oracle pair proves the SQL is correct; this test pins
the ACCURACY of the signature prefilter itself: the Hamming top-20
candidate set must recover far more of the exact-cosine top-5 than a
random candidate set of the same size would. One 64-bit sign
signature on near-random synthetic vectors is the adversarial case
for SRP (true neighbors are barely more aligned than noise), so the
pin is a floor well below the observed ~0.5, but an order of
magnitude above the ~0.04 chance rate.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"
N_PROBES = 5
K_EXACT = 5
K_CAND = 20


def _load():
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy()
    rows = tbl.column("embedding").to_pylist()
    keep = np.array([v is not None and len(v) == 64 for v in rows])
    V = np.array([v for v, k in zip(rows, keep) if k], dtype=np.float64)
    ids = ids[keep]
    norms = np.linalg.norm(V, axis=1)
    ok = norms > 0
    return ids[ok], V[ok], V[ok] / norms[ok, None]


def test_hamming_prefilter_recall_beats_chance():
    ids, V, Vn = _load()
    sig = V > 0
    recalls = []
    # probe the first N ids actually present (test data may be
    # regenerated without a contiguous 0..N id range)
    for p in sorted(ids)[:N_PROBES]:
        pi = int(np.where(ids == p)[0][0])
        cos = Vn @ Vn[pi]
        cos[pi] = -2.0
        exact = set(ids[np.lexsort((ids, -cos))[:K_EXACT]])
        ham = (sig != sig[pi]).sum(axis=1)
        ham[pi] = 1 << 20
        cand = set(ids[np.lexsort((ids, ham))[:K_CAND]])
        recalls.append(len(exact & cand) / K_EXACT)
    mean = float(np.mean(recalls))
    chance = K_CAND / (len(ids) - 1)
    assert mean >= 0.3, f"mean recall {mean} below pin"
    assert mean >= 5 * chance, f"recall {mean} vs chance {chance}"


def test_recall_grows_with_candidate_budget():
    """The budget→recall knob must behave monotonically in aggregate:
    doubling the candidate set from 20 to 80 should strictly add
    recovered true neighbors across the probe set."""
    ids, V, Vn = _load()
    sig = V > 0
    hits20 = hits80 = 0
    for p in sorted(ids)[:N_PROBES]:
        pi = int(np.where(ids == p)[0][0])
        cos = Vn @ Vn[pi]
        cos[pi] = -2.0
        exact = set(ids[np.lexsort((ids, -cos))[:K_EXACT]])
        ham = (sig != sig[pi]).sum(axis=1)
        ham[pi] = 1 << 20
        order = np.lexsort((ids, ham))
        hits20 += len(exact & set(ids[order[:20]]))
        hits80 += len(exact & set(ids[order[:80]]))
    assert hits80 > hits20
