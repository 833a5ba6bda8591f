"""Deterministic sf1.0-scale replica for OPTIMIZATION measurement only.

The driver's round-end bench may run at a driver-generated sf larger than
the committed /root/testdata dirs (BENCH_r05.json: sf=1.0). This tool tiles
/root/testdata/sf0.1 10x with key offsets so hot queries can be measured at
that scale locally:

- join structure preserved (custkey/orderkey/partkey/suppkey offsets move
  together), so q1/q3/q5 see 10x volume with the same selectivities;
- the kg shapes survive exactly: c_custkey stays contiguous 1..150000, so
  the binary-tree closure (custkey -> custkey/2) gets depth ~17 and the
  %7-broken chain components scale like the driver's;
- documents: per-tile vowel permutation of the text (length-preserving, so
  n_chars stays truthful) keeps each tile's internal near-duplicate
  structure while making cross-tile docs non-duplicates -> duplicate
  density scales linearly like a real corpus, not quadratically like a
  naive copy;
- embeddings: per-tile deterministic jitter (seeded by tile) keeps vectors
  well-spread instead of 10 exact copies of each point.

NOT used by bench.py / the driver / any test oracle. Results from it are
quoted in OPTIMIZATION_r06.md as "replica sf1.0".

Usage: python tools/gen_sf_replica.py [out_dir] [tiles]
       default out_dir=/dev/shm/zelph_replica/sf1.0, tiles=10
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")

VOWELS = "aeiou"
# tile 0 = identity; others are distinct permutations of the vowels
PERMS = [
    "aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "aieou", "eoiua", "iuoae", "oaeiu", "ueaio",
]


def _mutate_text(arr: pa.ChunkedArray, perm: str) -> pa.ChunkedArray:
    if perm == VOWELS:
        return arr
    # length-preserving character substitution, both cases
    src = VOWELS + VOWELS.upper()
    dst = perm + perm.upper()
    out = []
    for chunk in arr.chunks:
        pdser = chunk.to_pandas()
        out.append(pa.array(pdser.str.translate(str.maketrans(src, dst)),
                            type=chunk.type))
    return pa.chunked_array(out)


def _offset(col: pa.ChunkedArray, off: int) -> pa.ChunkedArray:
    if off == 0:
        return col
    return pc.add(col, pa.scalar(off, type=col.type))


def tile_table(name: str, tiles: int, out_dir: Path) -> None:
    t = pq.read_table(SRC / f"{name}.parquet")
    n = t.num_rows
    if name in ("region", "nation"):
        pq.write_table(t, out_dir / f"{name}.parquet")
        print(f"{name}: copied {n} rows")
        return

    key_offsets: dict[str, int] = {}
    if name == "customer":
        key_offsets = {"c_custkey": 15000}
    elif name == "supplier":
        key_offsets = {"s_suppkey": 1000}
    elif name == "part":
        key_offsets = {"p_partkey": 20000}
    elif name == "orders":
        mx = pc.max(t["o_orderkey"]).as_py()
        key_offsets = {"o_orderkey": mx, "o_custkey": 15000}
    elif name == "lineitem":
        mx = pc.max(t["l_orderkey"]).as_py()
        key_offsets = {"l_orderkey": mx, "l_partkey": 20000,
                       "l_suppkey": 1000}
    elif name == "events":
        mxu = pc.max(t["user_id"]).as_py()
        key_offsets = {"event_id": 100000, "user_id": mxu}
    elif name == "documents":
        key_offsets = {"doc_id": 5000}
    elif name == "embeddings":
        mxv = pc.max(t["vec_id"]).as_py()
        key_offsets = {"vec_id": mxv}

    pieces = []
    for k in range(tiles):
        cols = {}
        for field in t.schema.names:
            col = t[field]
            if field in key_offsets:
                col = _offset(col, key_offsets[field] * k)
            elif name == "documents" and field == "text":
                col = _mutate_text(col, PERMS[k % len(PERMS)])
            elif name == "embeddings" and field == "embedding" and k > 0:
                # jitter the list VALUES (top-level column is list<float>;
                # the leaf is named 'element') so tiles are not 10 exact
                # copies of every vector — that would make the near-dup
                # candidate volume quadratic by construction
                lst = col.combine_chunks()
                rng = np.random.default_rng(1000 + k)
                vals = lst.values.to_numpy(zero_copy_only=False)
                jit = rng.normal(0.0, 0.15, size=len(vals)).astype(
                    np.float32)
                col = pa.chunked_array([pa.ListArray.from_arrays(
                    lst.offsets, pa.array(vals + jit, type=pa.float32()))])
            cols[field] = col
        pieces.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(pieces)
    pq.write_table(out, out_dir / f"{name}.parquet", row_group_size=200_000)
    print(f"{name}: {n} -> {out.num_rows} rows")


def main() -> None:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1
                   else "/dev/shm/zelph_replica/sf1.0")
    tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        tile_table(name, tiles, out_dir)
    print(f"replica at {out_dir} ({tiles} tiles)")


if __name__ == "__main__":
    main()
