"""Stage-boundary checkpointing with per-partition lineage manifests.

North-rule requirement (SURVEY §4 "Checkpoint / resume"): every stage
boundary materializes partitioned Parquet plus a ``_MANIFEST.json``
recording the stage id, its input fingerprint, and per-partition row
counts; a resumed run skips stages whose manifest matches and re-reads
their output.  The reference has only whole-graph ``save()``
(``tera/DataAggregation.py:54-62``) — no resume.

Layout per stage::

    <root>/<stage>/part=<k>/*.parquet     hash(partition key) = k
    <root>/<stage>/_MANIFEST.json         written LAST (atomic rename) —
                                          its presence certifies the stage

A run that dies mid-stage leaves no manifest, so the stage re-runs from
its (checkpointed) inputs; completed stages are never recomputed.
Partitioning by a stable key hash keeps outputs resumable and balanced —
never one giant file.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

MANIFEST = "_MANIFEST.json"


def _hash_partition(col: pa.ChunkedArray | pa.Array, num_partitions: int) -> pa.Array:
    from ..stages.base import bucket_column

    return bucket_column(col, num_partitions).cast(pa.int64())


def write_stage(ds, root: str, stage: str, input_fingerprint: str,
                partition_key: str = "subj", num_partitions: int = 32,
                metrics: dict | None = None):
    """Materialize ``ds`` as hash-partitioned Parquet + manifest.

    Returns the stage directory.  The write streams through
    ``write_parquet`` with a derived ``part`` column (one directory per
    hash bucket); per-partition row counts are aggregated from the
    written files, NOT from a driver-side collect.
    """
    t0 = time.perf_counter()
    stage_dir = os.path.join(root, stage)
    # A crashed run leaves partial parquet files with NO manifest; Ray's
    # write_parquet uses unique filenames, so re-executing into the same
    # directory would keep the stale files and both the manifest row
    # count and read_stage would silently include them.  Clear first:
    # the manifest (written last, atomic rename) is the only completion
    # certificate, so deleting an uncertified directory is always safe.
    if os.path.isdir(stage_dir):
        import shutil

        shutil.rmtree(stage_dir)
    os.makedirs(stage_dir, exist_ok=True)

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("part", _hash_partition(t[partition_key],
                                                       num_partitions))

    ds.map_batches(add_part, batch_format="pyarrow").write_parquet(
        stage_dir, partition_cols=["part"])

    import pyarrow.parquet as pq

    parts: dict[str, int] = {}
    total = 0
    for dirpath, _, files in os.walk(stage_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            n = pq.read_metadata(os.path.join(dirpath, f)).num_rows
            key = os.path.basename(dirpath)
            parts[key] = parts.get(key, 0) + n
            total += n
    manifest = {
        "stage": stage,
        "input_fingerprint": input_fingerprint,
        "partition_key": partition_key,
        "num_partitions": num_partitions,
        "row_count": total,
        "partitions": dict(sorted(parts.items())),
        "written_at": time.time(),
        # operational metrics (wall time incl. the distributed write,
        # plus caller extras) — informational only: resume matches on
        # input_fingerprint, never on metrics
        "metrics": {"wall_s": round(time.perf_counter() - t0, 3),
                    **(metrics or {})},
    }
    tmp = os.path.join(stage_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(stage_dir, MANIFEST))
    return stage_dir


def read_manifest(root: str, stage: str) -> dict | None:
    p = os.path.join(root, stage, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def stage_is_complete(root: str, stage: str, input_fingerprint: str) -> bool:
    m = read_manifest(root, stage)
    return m is not None and m.get("input_fingerprint") == input_fingerprint


def read_stage(root: str, stage: str):
    """Re-open a completed stage's output as a Dataset (drops the
    physical ``part`` column)."""
    import ray.data

    ds = ray.data.read_parquet(os.path.join(root, stage))
    return ds.map_batches(
        lambda t: t.drop_columns([c for c in ("part",) if c in t.schema.names]),
        batch_format="pyarrow")


def input_fingerprint(*paths: str) -> str:
    """Cheap deterministic fingerprint of input files: (path, size,
    mtime_ns) tuples hashed — enough to invalidate on changed inputs
    without reading data."""
    import hashlib

    h = hashlib.sha1()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\x1f".encode())
    return h.hexdigest()


def run_stage(ds_factory, root: str, stage: str, fingerprint: str,
              partition_key: str = "subj", num_partitions: int = 32):
    """Resume-aware stage execution: if a matching manifest exists, skip
    the work and re-open the stored output; otherwise run ``ds_factory()``,
    checkpoint it, and return the re-opened Dataset."""
    if stage_is_complete(root, stage, fingerprint):
        return read_stage(root, stage), True
    write_stage(ds_factory(), root, stage, fingerprint,
                partition_key=partition_key, num_partitions=num_partitions)
    return read_stage(root, stage), False


def build_kg_checkpointed(data_dir: str, ckpt_root: str, fuzzy: bool = True,
                          num_partitions: int = 32):
    """Flagship pipeline with resumable stage boundaries:

      link    — transcripts → mention triples  (key: conv_id)
      lexicon — lexicon-table triples          (key: subj)
      kg      — union + exact dedup            (key: subj)

    Each stage writes hash-partitioned Parquet + manifest; a rerun with
    the same inputs skips completed stages (byte-identical manifests).
    """
    import ray
    import ray.data

    from ..pipelines.transcripts import (
        build_lexicon,
        lexicon_triples,
        link_transcripts,
    )
    from ..stages.base import dedup_triples

    tpath = os.path.join(data_dir, "transcripts.parquet")
    lex_tables = [os.path.join(data_dir, n + ".parquet")
                  for n in ("species", "species_synonyms", "chemicals",
                            "tests", "results")
                  if os.path.exists(os.path.join(data_dir, n + ".parquet"))]
    fp_link = input_fingerprint(tpath, *lex_tables) + f"|fuzzy={fuzzy}"
    fp_lex = input_fingerprint(*lex_tables)

    def make_link():
        lex_ref = build_lexicon(data_dir)
        tr = ray.data.read_parquet(tpath)
        return link_transcripts(tr, lex_ref, fuzzy=fuzzy)

    link_ds, link_skipped = run_stage(make_link, ckpt_root, "link", fp_link,
                                      partition_key="conv_id",
                                      num_partitions=num_partitions)

    def make_lex():
        return ray.data.from_arrow(lexicon_triples(data_dir))

    lex_ds, lex_skipped = run_stage(make_lex, ckpt_root, "lexicon", fp_lex,
                                    partition_key="subj",
                                    num_partitions=min(8, num_partitions))

    fp_kg = fp_link + "|" + fp_lex

    def make_kg():
        return dedup_triples(link_ds.union(lex_ds))

    kg_ds, kg_skipped = run_stage(make_kg, ckpt_root, "kg", fp_kg,
                                  partition_key="subj",
                                  num_partitions=num_partitions)
    return kg_ds, {"link": link_skipped, "lexicon": lex_skipped,
                   "kg": kg_skipped}
