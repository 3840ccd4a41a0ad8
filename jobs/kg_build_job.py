"""`ray job submit`-able driver for the flagship KG build.

The north rule asks for the pipeline to run as a submitted Ray job on
a fixed-size multi-node cluster, resumable from checkpoint with
per-partition lineage + metrics.  This is that entrypoint:

Cluster (from any machine with the Ray job CLI)::

    ray job submit --address http://<head>:8265 --working-dir . -- \
        python jobs/kg_build_job.py \
        --data-dir /mnt/shared/fixtures \
        --ckpt-dir /mnt/shared/ckpt/kg_v1

Single box (CI / smoke; starts a local Ray)::

    python jobs/kg_build_job.py --data-dir /tmp/tera_ray_fixtures/1000 \
        --ckpt-dir /tmp/kg_job_ckpt

Behavior:

- Inside a submitted job, ``ray.init()`` attaches to the running
  cluster (the job runtime sets the address); standalone it starts a
  local instance — no flags needed either way.  ``--address`` forces
  one explicitly.
- The build is :func:`tera_ray.state.checkpoint.build_kg_checkpointed`:
  three stages (link / lexicon / kg), each materialized as
  hash-partitioned Parquet + a lineage manifest under ``--ckpt-dir``.
  Re-submitting the SAME job after a crash (or a ``ray job stop``)
  skips every completed stage — kill-and-resume is the contract, and
  the final kg stage directory IS the output store (point downstream
  readers at ``<ckpt-dir>/kg``).
- Exit: prints ONE summary JSON line (triples, wall, per-stage
  skipped flags, per-stage manifest metrics) and returns 0; any stage
  failure propagates a non-zero exit so ``ray job status`` reflects it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python jobs/kg_build_job.py` puts jobs/ (not the repo root) on
# sys.path — both locally and inside a submitted job's working_dir —
# so anchor the import root explicitly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-dir", required=True,
                    help="dir with transcripts.parquet + lexicon tables")
    ap.add_argument("--ckpt-dir", required=True,
                    help="checkpoint root (shared storage on a cluster)")
    ap.add_argument("--num-partitions", type=int, default=32,
                    help="hash partitions per stage (match cluster cores)")
    ap.add_argument("--no-fuzzy", action="store_true",
                    help="disable fuzzy mention matching")
    ap.add_argument("--address", default=None,
                    help="explicit Ray address (default: job cluster / local)")
    ap.add_argument("--validate", action="store_true",
                    help="verify stage parquet metadata against manifests "
                         "after the build")
    ap.add_argument("--shard", nargs="+", default=None, metavar="PARQUET",
                    help="nightly mode: ingest ONLY these transcript shard "
                         "files incrementally (novel-partition append via "
                         "the _SHARDS.json registry; re-delivered shards "
                         "are idempotent no-ops) instead of a full build")
    ap.add_argument("--no-trust-sharding", action="store_true",
                    help="with --shard: don't attest prev disjointness "
                         "from the registry — probe prev's lineage before "
                         "taking the shuffle-free path")
    ap.add_argument("--consolidate", action="store_true",
                    help="fold all registered shard stages into a fresh "
                         "base stage (atomic registry commit; re-delivery "
                         "ledger preserved) and exit")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(**({"address": args.address} if args.address else {}),
                 ignore_reinit_error=True)

    from tera_ray.state.checkpoint import (build_kg_checkpointed,
                                           read_manifest, validate_stage)

    if args.consolidate:
        from tera_ray.state.checkpoint import consolidate_shards

        t0 = time.time()
        c = consolidate_shards(args.ckpt_dir,
                               num_partitions=args.num_partitions)
        c["mode"] = "consolidate"
        c["wall_sec"] = round(time.time() - t0, 2)
        print(json.dumps(c))
        return 0

    if args.shard:
        from tera_ray.state.checkpoint import (merged_kg,
                                               read_shard_registry,
                                               update_kg_incremental)

        t0 = time.time()
        r = update_kg_incremental(
            args.ckpt_dir, args.data_dir, args.shard,
            fuzzy=not args.no_fuzzy,
            num_partitions=args.num_partitions,
            trust_sharding=not args.no_trust_sharding)
        out = {
            "mode": "shard",
            "skipped": r["skipped"],
            "stage": r["stage"],
            "novel_rows": r["novel_rows"],
            "registered_shards": len(read_shard_registry(
                args.ckpt_dir)["shards"]),
            "wall_sec": round(time.time() - t0, 2),
        }
        if args.validate and r["stage"]:
            v = validate_stage(args.ckpt_dir, r["stage"])
            out["valid"] = v.get("ok")
            if not v.get("ok"):
                print(json.dumps({"error": "shard stage failed validation",
                                  "detail": v}))
                return 2
            out["merged_rows"] = merged_kg(args.ckpt_dir).count()
        print(json.dumps(out))
        return 0

    t0 = time.time()
    kg, skipped = build_kg_checkpointed(
        args.data_dir, args.ckpt_dir, fuzzy=not args.no_fuzzy,
        num_partitions=args.num_partitions)
    n = kg.count()
    wall = time.time() - t0

    stages = {}
    for stage in ("link", "lexicon", "kg"):
        m = read_manifest(args.ckpt_dir, stage) or {}
        stages[stage] = {
            "skipped": bool(skipped.get(stage)),
            "rows": m.get("row_count"),
            "partitions": len(m.get("partitions", {})),
            "metrics": m.get("metrics"),
        }
        if args.validate:
            v = validate_stage(args.ckpt_dir, stage)
            stages[stage]["valid"] = v.get("ok")
            if not v.get("ok"):
                print(json.dumps({"error": f"stage {stage} failed "
                                  f"validation", "detail": v}))
                return 2

    print(json.dumps({
        "triples": n,
        "wall_sec": round(wall, 2),
        "triples_per_sec": round(n / wall, 1) if wall > 0 else None,
        "store": os.path.join(args.ckpt_dir, "kg"),
        "stages": stages,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
