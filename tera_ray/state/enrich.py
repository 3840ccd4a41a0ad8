"""Enrichment actor pool (SURVEY T3).

The reference enriches chemicals by calling PubChem over the network per
id (``tera/DataAccess.py:486-497,518-527,581-592``).  No network in the
engine: enrichment reads a LOCAL SNAPSHOT table (broadcast once via
``ray.put``) and runs an expensive per-key derivation behind a per-actor
LRU memo — ids repeat heavily across batches, so each actor derives each
distinct key once (the same memo treatment as the fuzzy linker).
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow as pa

import ray


class EnrichStage:
    """Actor-pool stage: append derived columns for ``key_col`` through a
    broadcast snapshot + memoized ``derive_fn(key, snapshot_row) -> dict``.

    ``derive_fn`` must be a module-level (picklable) function; its
    results must be scalars.  Missing keys yield nulls.
    """

    def __init__(self, snapshot_ref, key_col: str, derive_fn,
                 out_cols: list[tuple[str, object]], memo_size: int = 65536):
        snap = ray.get(snapshot_ref) if isinstance(snapshot_ref, ray.ObjectRef) else snapshot_ref
        key_name = snap.schema.names[0]
        self.lookup = {}
        for b in snap.to_batches():
            keys = b[key_name].to_pylist()
            rows = b.to_pylist()
            for k, r in zip(keys, rows):
                self.lookup.setdefault(k, r)
        self.key_col = key_col
        self.out_cols = out_cols
        self._derive = lru_cache(maxsize=memo_size)(
            lambda k: derive_fn(k, self.lookup.get(k)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        outs = [self._derive(k) for k in keys]
        for name, typ in self.out_cols:
            batch = batch.append_column(
                name, pa.array([o.get(name) if o else None for o in outs], typ))
        return batch

    def memo_info(self):
        return self._derive.cache_info()


def enrich(ds, snapshot: pa.Table, key_col: str, derive_fn,
           out_cols: list[tuple[str, object]], concurrency=(1, 8),
           batch_size: int = 4096):
    ref = ray.put(snapshot)
    return ds.map_batches(
        EnrichStage,
        fn_constructor_kwargs={"snapshot_ref": ref, "key_col": key_col,
                               "derive_fn": derive_fn, "out_cols": out_cols},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def fingerprint_features(key: str, row: dict | None) -> dict | None:
    """Example derivation: PubChem-style fingerprint → feature scalars
    (cf. cactvs fingerprint handling, ``tera/DataAccess.py:486-497``)."""
    if row is None:
        return None
    fp = int(row["fp"])
    return {"fp_bits": bin(fp).count("1"), "fp_hex": hex(fp)}
