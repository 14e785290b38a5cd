"""Generate a BENCHMARK-ONLY sf1 dataset at .scale/sf1 (gitignored).

The driver fixtures stop at sf0.1; VERDICT r5 item 8 asks for sf1 scale
curves on the most expensive headliners to test the sf0.001→0.1
extrapolations. /root/testdata is read-only, so this synthesizes a 10×
replica under the repo, deterministic (fixed seeds), with distributions
matched to the measured sf0.1 statistics so selectivity/skew trends remain
meaningful:

- relational tables (customer/supplier/part/orders/lineitem/events):
  key-shifted 10× replication — every foreign key is offset by the same
  per-replica stride as its referenced primary key, so join fan-outs,
  match rates, and per-key skew are IDENTICAL to sf0.1 (a customer still
  has the same order count; a part still appears in the same number of
  lineitems).
- documents: freshly generated 50,000-doc corpus matching measured sf0.1
  stats (30-word vocab, 10–100 words/doc uniform, lang mix 41% en / ~15%
  each zh,es,fr,de, 20 uniform sources, 5% near-dup rate implemented as
  perturbed copies carrying the 'dup' marker token — same structure the
  driver generator uses). Replicating texts verbatim would have created
  10-way exact-dup clusters and blown the candidate-pair counts
  quadratically in the replica count, which is precisely the distortion
  this dataset must NOT have.
- embeddings: 10× replication with per-replica seeded Gaussian
  perturbation (sigma 0.05) + renormalization — cluster structure and
  label balance preserved, no exact duplicate vectors.
- region/nation: copied (dimension tables don't scale).

NOT for correctness runs: oracle checks stay on the driver fixtures.
Usage: python tools/make_scale_data.py   (writes ~170 MB, ~1 min)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# defaults produce the classic sf1; --replicas 100 --name sf10 makes the
# second-decade point (VERDICT r10 item 8) with identical construction
DST = os.path.join(_REPO, ".scale", "sf1")
REPLICAS = 10

# per-replica key stride = sf0.1 table cardinality (keys are 0..N-1)
STRIDES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"user_id": 1_500},
}

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def replicate(name: str) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    chunks = []
    for r in range(REPLICAS):
        cols = {}
        for field in t.schema.names:
            col = t.column(field)
            stride = STRIDES[name].get(field)
            if stride:
                col = pa.chunked_array(
                    [pa.compute.add(c, r * stride) for c in col.chunks]
                )
            cols[field] = col
        chunks.append(pa.table(cols))
    pq.write_table(pa.concat_tables(chunks), f"{DST}/{name}.parquet")


def gen_documents(n: int = 50_000, dup_rate: float = 0.05, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    lens = rng.integers(10, 101, size=n)
    texts: list[str] = []
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    for i in range(n):
        if i > 0 and rng.random() < dup_rate:
            # near-dup of a recent doc: copy + replace one token with the
            # 'dup' marker (the sf0.1 corpus's measured structure: ~5% of
            # docs carry 'dup', near-dup pairs detectable by MinHash)
            base = texts[int(rng.integers(max(0, i - 200), i))].split()
            base[int(rng.integers(0, len(base)))] = "dup"
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(rng.choice(VOCAB, size=lens[i])))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([str(x) for x in langs]),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{DST}/documents.parquet")


def gen_embeddings(seed: int = 7) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    base_vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(t.column("label").to_pylist())
    n = len(base_vecs)
    rng = np.random.default_rng(seed)
    all_vecs, all_ids, all_labels = [], [], []
    for r in range(REPLICAS):
        v = base_vecs + rng.normal(0, 0.05, size=base_vecs.shape).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        all_vecs.append(v)
        all_ids.append(np.arange(n, dtype=np.int64) + r * n)
        all_labels.append(labels)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(all_ids)),
            "embedding": pa.array(
                [row for v in all_vecs for row in v.tolist()],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(all_labels).astype(np.int32)),
        }
    )
    pq.write_table(tbl, f"{DST}/embeddings.parquet")


def main() -> None:
    global DST, REPLICAS
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--name", default="sf1")
    args = ap.parse_args()
    REPLICAS = args.replicas
    DST = os.path.join(_REPO, ".scale", args.name)

    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{DST}/{name}.parquet")
    for name in STRIDES:
        replicate(name)
        print(f"{name}: x{REPLICAS} key-shifted", file=sys.stderr)
    gen_documents(n=5_000 * REPLICAS)
    print(f"documents: {5 * REPLICAS}k generated", file=sys.stderr)
    gen_embeddings()
    print(f"embeddings: {2 * REPLICAS}k perturbed replicas", file=sys.stderr)
    print(DST)


if __name__ == "__main__":
    main()
