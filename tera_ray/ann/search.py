"""Similarity search over an embedding column (engine-first addition).

Two paths:

- :func:`brute_topk` — exact cosine top-k.  The query matrix is
  normalized once and broadcast via ``ray.put``; every block computes a
  numpy matmul against it and emits only its LOCAL top-k per query
  (k rows/query/block), so the final ``groupby(query).map_groups`` merge
  shuffles O(num_blocks · k · |Q|) rows — never the corpus.
- :func:`ivf_topk` — IVF scale path: k-means-lite centroids (deterministic
  seeded init + a few Lloyd rounds on a driver-side sample), each vector
  assigned to its nearest centroid in one map pass; a query probes only
  the ``nprobe`` nearest lists.  Same local-top-k merge shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..dedup.embed import _vecs


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _empty_result(id_col: str) -> pa.Table:
    """The scorers' typed empty partial — ONE definition so the empty
    and non-empty block schemas can never diverge."""
    return pa.table({"query_id": pa.array([], pa.int64()),
                     id_col: pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())})


def _brute_score(batch: pa.Table, *, queries_ref, k: int, id_col: str,
                 vec_col: str) -> pa.Table:
    """Per-block exact top-k against the broadcast, pre-normalized
    query matrix.  ``ray.get`` of the broadcast ref resolves from the
    local object store (zero-copy shared memory, one transfer per node
    on a cluster) — cheap enough per TASK that no actor pool is needed
    for the default path."""
    if batch.num_rows == 0:   # empty block: typed empty result
        return _empty_result(id_col)
    q = (ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef)
         else queries_ref)
    qids, Q = q["qids"], q["Q"]              # (|Q|, dim), normalized
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    v = _normalize(_vecs(batch, vec_col).astype(Q.dtype))
    sims = Q @ v.T                           # (|Q|, rows)
    k = min(k, sims.shape[1])
    part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
    rows = np.repeat(np.arange(sims.shape[0]), k)
    cols = part.reshape(-1)
    return pa.table({
        "query_id": pa.array(np.asarray(qids)[rows], pa.int64()),
        id_col: pa.array(ids[cols], pa.int64()),
        "cosine": pa.array(sims[rows, cols].astype(np.float64)),
    })


class BruteScorer:
    """Actor-pool variant of :func:`_brute_score` (state fetched once
    per actor) — pass ``concurrency=`` to :func:`brute_topk` to use it;
    worthwhile only when the query matrix is large enough that even a
    local plasma get per task shows up."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.state = q
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _brute_score(batch, queries_ref=self.state, k=self.k,
                            id_col=self.id_col, vec_col=self.vec_col)


def _merge_topk(ds, k: int, id_col: str):
    """Per-query global top-k from per-block local top-k rows, with a
    deterministic (−cosine, id) tie-break."""

    def top(t: pa.Table) -> pa.Table:
        sims = t["cosine"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            "query_id": t["query_id"].take(pa.array(order)),
            id_col: pa.array(ids[order]),
            "cosine": pa.array(sims[order]),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        })

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(ds, "query_id", top)


def make_query_ref(qids: np.ndarray, Q: np.ndarray, dtype=np.float32):
    """``dtype=np.float64`` makes cosines bit-match a float64 oracle
    (e.g. DuckDB ``list_cosine_similarity``) given identical inputs."""
    return ray.put({"qids": np.asarray(qids, np.int64),
                    "Q": _normalize(np.asarray(Q, dtype))})


def brute_topk(ds, qids, Q, k: int = 10, id_col: str = "vec_id",
               vec_col: str = "embedding", concurrency=None,
               dtype=np.float32):
    """Exact cosine top-k.  Default = TASK-pool scoring (scales with
    the corpus, zero actor spin-up — the former fixed (1, 8) actor
    pool paid ~0.5s startup on small inputs and capped wide corpora at
    8 workers).  Pass ``concurrency`` for an explicit actor pool."""
    ref = make_query_ref(qids, Q, dtype=dtype)
    proj = ds.select_columns([id_col, vec_col])
    if concurrency is None:
        local = proj.map_batches(
            _brute_score, batch_format="pyarrow",
            fn_kwargs={"queries_ref": ref, "k": k,
                       "id_col": id_col, "vec_col": vec_col})
    else:
        local = proj.map_batches(
            BruteScorer, batch_format="pyarrow", concurrency=concurrency,
            fn_constructor_kwargs={"queries_ref": ref, "k": k,
                                   "id_col": id_col, "vec_col": vec_col})
    return _merge_topk(local, k, id_col)


# --- IVF -------------------------------------------------------------------

def _centroid_sample(ds, id_col: str, vec_col: str, sample_size: int,
                     salt: str = "ivf-centroids:") -> np.ndarray:
    """Deterministic DISTRIBUTED sample for centroid training: the
    ``sample_size`` rows with the smallest salted-FNV-1a hash of their
    id (bottom-k by hash).  A pure function of the id set — invariant
    to row order, partitioning and read parallelism, and unbiased on
    source-ordered petabyte data, unlike a ``limit()`` head sample
    which trains centroids on the first domain in the corpus.  The
    driver collects only ~1.25 × sample_size pre-filtered rows, never
    the corpus (a deterministic under-delivery — the hash landing
    unluckily — escalates the threshold geometrically, so the full
    scan can only be reached when n ≲ sample_size)."""
    from ..text.curation import _salted_fnv

    n = ds.count()
    if n == 0:
        raise ValueError("cannot train centroids on an empty dataset")
    frac = 1.0 if n <= sample_size else min(1.0, 1.25 * sample_size / n)
    while True:
        thresh = np.uint64(min(int(frac * float(2**64 - 1)), 2**64 - 1))

        def pick(t: pa.Table, thresh=thresh) -> pa.Table:
            h = _salted_fnv(t[id_col], salt)
            mask = h <= thresh
            kept = t.select([id_col, vec_col]).filter(pa.array(mask))
            return kept.append_column(
                "__h", pa.array(h[mask], pa.uint64()))

        rows = ds.select_columns([id_col, vec_col]).map_batches(
            pick, batch_format="pyarrow").take_all()
        if len(rows) >= min(sample_size, n) or frac >= 1.0:
            break
        frac = min(1.0, frac * 4)
    rows.sort(key=lambda r: (r["__h"], r[id_col]))
    del rows[sample_size:]
    return np.asarray([r[vec_col] for r in rows], np.float32)


def train_centroids(sample: np.ndarray, n_centroids: int, rounds: int = 5,
                    seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (normalized,
    cosine ≙ dot).  Empty clusters re-seeded from the sample."""
    rng = np.random.RandomState(seed)
    s = _normalize(sample.astype(np.float32))
    idx = rng.choice(len(s), size=min(n_centroids, len(s)), replace=False)
    C = s[idx].copy()
    for _ in range(rounds):
        assign = (s @ C.T).argmax(axis=1)
        for c in range(len(C)):
            members = s[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
            else:
                C[c] = s[rng.randint(len(s))]
        C = _normalize(C)
    return C


def ivf_topk(ds, qids, Q, k: int = 10, n_centroids: int = 64, nprobe: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_size: int = 10_000, dtype=np.float32):
    """Approximate top-k: score only vectors whose IVF list is among the
    query's ``nprobe`` nearest centroids.  Probing all lists
    (nprobe == n_centroids) recovers the exact brute-force result;
    combined with ``dtype=np.float64`` the scores bit-match a float64
    SQL oracle (see ``make_query_ref``)."""
    sample = _centroid_sample(ds, id_col, vec_col, sample_size)
    C = train_centroids(sample, n_centroids)
    Qn = _normalize(np.asarray(Q, dtype))
    probe = np.argsort(-(Qn @ C.T.astype(dtype)), axis=1)[:, :nprobe]
    # query → allowed lists, inverted ONCE at the driver to
    # list → query-row indices (it only depends on the probe plan, not
    # the data), then broadcast with everything else — scoring runs as
    # plain TASKS (no actor pool; see brute_topk for the rationale)
    by_list: dict[int, np.ndarray] = {}
    for qi, lists in enumerate(probe):
        for li in lists:
            by_list.setdefault(int(li), []).append(qi)
    by_list = {li: np.asarray(v) for li, v in by_list.items()}
    ref = ray.put({"C": C, "qids": np.asarray(qids, np.int64),
                   "Q": Qn, "by_list": by_list, "k": k, "dtype": dtype})

    def ivf_score(batch: pa.Table, ref=ref, id_col=id_col,
                  vec_col=vec_col) -> pa.Table:
        if batch.num_rows == 0:   # empty block: typed empty result
            return _empty_result(id_col)
        st = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        C, qids, Q, k = st["C"], st["qids"], st["Q"], st["k"]
        dt, by_list = st["dtype"], st["by_list"]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        v = _normalize(_vecs(batch, vec_col, dtype=dt))
        assign = (v @ C.T.astype(dt)).argmax(axis=1)
        out_q, out_i, out_s = [], [], []
        for li in np.unique(assign):
            quers = by_list.get(int(li))
            if quers is None:
                continue
            mask = assign == li
            sub, sub_ids = v[mask], ids[mask]
            sims = Q[quers] @ sub.T
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(sims.shape[0]), kk)
            cols = part.reshape(-1)
            out_q.append(qids[quers[rows]])
            out_i.append(sub_ids[cols])
            out_s.append(sims[rows, cols])
        if not out_q:
            return _empty_result(id_col)
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            id_col: pa.array(np.concatenate(out_i), pa.int64()),
            "cosine": pa.array(np.concatenate(out_s).astype(np.float64)),
        })

    local = ds.select_columns([id_col, vec_col]).map_batches(
        ivf_score, batch_format="pyarrow")
    return _merge_topk(local, k, id_col)


# --- kNN self-join -----------------------------------------------------------

def knn_join(ds, k: int = 5, n_lists: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_size: int = 10_000, dtype=np.float32,
             rounds: int = 5, seed: int = 42):
    """EVERY row's cosine top-k neighbors (self excluded) — the kNN
    self-join behind retrieval augmentation, kNN-graph clustering and
    near-dup mining.  Unlike :func:`brute_topk`/:func:`ivf_topk` the
    query set here IS the corpus, so broadcasting a query matrix would
    be O(N·dim) driver state; instead both roles flow through ONE
    list-keyed shuffle:

    1. centroids from a driver-side sample (:func:`train_centroids`);
    2. one map pass tags each vector as DATA in its nearest list and
       replicates it as QUERY into its ``nprobe`` nearest lists —
       shuffle volume = (1 + nprobe) × N vector rows, never N²;
    3. per list: one matmul scores that list's queries against its
       data, self-matches masked, local top-k per query;
    4. the standard per-query merge (same (−cosine, id) tie-break as
       :func:`brute_topk`) — O(N · k · nprobe) small rows.

    ``nprobe == n_lists`` recovers the EXACT brute-force join (every
    query meets every list) at nprobe× replication cost — the
    validation mode; production keeps nprobe ≪ n_lists and accepts
    IVF recall.  ``dtype=np.float64`` bit-matches a float64 SQL
    oracle.  Output: (query_id, ``id_col``, cosine, rank)."""
    nprobe = min(nprobe, n_lists)
    sample = _centroid_sample(ds, id_col, vec_col, sample_size)
    C = train_centroids(sample, n_lists, rounds=rounds, seed=seed)
    cref = ray.put(C.astype(dtype))

    def scatter(t: pa.Table) -> pa.Table:
        """DATA row in its own list + QUERY replicas in nprobe lists."""
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = _normalize(_vecs(t, vec_col, dtype=dtype))
        Cd = ray.get(cref)
        sims = v @ Cd.T                          # (rows, n_lists)
        if len(ids) == 0:
            return pa.table({
                "list": pa.array([], pa.int32()),
                "role": pa.array([], pa.int8()),
                id_col: pa.array([], pa.int64()),
                vec_col: pa.array([], pa.list_(pa.float64())),
            })
        near = np.argsort(-sims, axis=1)[:, :nprobe]  # query lists
        own = near[:, 0]                              # data list = argmax
        n, d = v.shape
        lists = np.concatenate([own.astype(np.int32),
                                near.reshape(-1).astype(np.int32)])
        roles = np.concatenate([np.zeros(n, np.int8),
                                np.ones(n * nprobe, np.int8)])
        out_ids = np.concatenate([ids, np.repeat(ids, nprobe)])
        rows = np.concatenate([np.arange(n), np.repeat(np.arange(n), nprobe)])
        flat = v[rows].astype(np.float64).reshape(-1)
        vecs = pa.ListArray.from_arrays(
            pa.array(np.arange(len(rows) + 1) * d, pa.int32()),
            pa.array(flat, pa.float64()))
        return pa.table({"list": pa.array(lists), "role": pa.array(roles),
                         id_col: pa.array(out_ids), vec_col: vecs})

    def per_list(t: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          id_col: pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        role = t["role"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        v = _vecs(t, vec_col, dtype=dtype)       # already normalized
        dm, qm = role == 0, role == 1
        if not dm.any() or not qm.any():
            return empty
        D, dids = v[dm], ids[dm]
        Q, qids = v[qm], ids[qm]
        sims = Q @ D.T
        sims[qids[:, None] == dids[None, :]] = -np.inf   # mask self
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(sims.shape[0]), kk)
        cols = part.reshape(-1)
        keep = np.isfinite(sims[rows, cols])     # drop masked self rows
        rows, cols = rows[keep], cols[keep]
        return pa.table({
            "query_id": pa.array(qids[rows], pa.int64()),
            id_col: pa.array(dids[cols], pa.int64()),
            "cosine": pa.array(sims[rows, cols].astype(np.float64)),
        })

    from ..stages.base import bucketed_map_groups

    scattered = ds.select_columns([id_col, vec_col]).map_batches(
        scatter, batch_format="pyarrow")
    local = bucketed_map_groups(scattered, "list", per_list)
    return _merge_topk(local, k, id_col)
