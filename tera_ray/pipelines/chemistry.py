"""Concrete chemistry enrichment (SURVEY T3 made concrete; reference
``get_fingerprint`` / ``get_names`` / ``get_features``,
``tera/DataAccess.py:486-592``).

The reference calls PubChem over the network once per chemical id.  No
network in the engine: the compound store is a LOCAL SNAPSHOT table
(``chem_fingerprints``: cas_number → fingerprint int) broadcast once
via ``ray.put`` into an :class:`~tera_ray.state.enrich.EnrichStage`
actor pool — fingerprint-derived features (`get_fingerprint` /
`get_features` analogs) are memoized per actor; name/synonym features
(`get_names` analog) are vectorized Arrow kernels over the chemicals
table's own alias column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import ECOTOX_NS
from ..stages.base import cat
from ..state.enrich import enrich


def derive_chem_features(key: str, row: dict | None) -> dict | None:
    """Per-compound snapshot derivation (the ``Compound.from_cid``
    analog): fingerprint bit count + canonical hex form.  Missing
    snapshot keys yield None → null feature columns (the reference
    prints-and-skips on PubChem NotFound; ``DataAccess.py:492-496``)."""
    if row is None:
        return None
    fp = int(row["fp"])
    return {"fp_bits": bin(fp).count("1"), "fp_hex": hex(fp)}


CHEM_FEATURE_COLS = [("fp_bits", pa.int64()), ("fp_hex", pa.string())]


def enrich_chemicals(chem_ds, fingerprints: pa.Table, ns: str = ECOTOX_NS,
                     concurrency=(1, 8)):
    """chemicals (cas_number, chemical_name) × fingerprint snapshot →
    one feature row per chemical:

    ``(chemical, cas_number, n_synonyms, fp_bits, fp_hex)``

    ``n_synonyms`` counts the comma-separated alias list (`get_names`),
    ``fp_bits``/``fp_hex`` derive from the broadcast fingerprint
    snapshot (`get_fingerprint`/`get_features`).  Streaming: the only
    non-map state is the ``ray.put`` snapshot, fetched once per actor.
    """
    out = enrich(chem_ds, fingerprints, "cas_number", derive_chem_features,
                 CHEM_FEATURE_COLS, concurrency=concurrency)

    def finish(t: pa.Table) -> pa.Table:
        names = pc.fill_null(t["chemical_name"].combine_chunks(), "")
        n_syn = pc.list_value_length(pc.split_pattern(names, ", "))
        return pa.table({
            "chemical": cat(ns, "cas/", t["cas_number"]),
            "cas_number": t["cas_number"].combine_chunks().cast(pa.string()),
            "n_synonyms": n_syn.cast(pa.int64()),
            "fp_bits": t["fp_bits"],
            "fp_hex": t["fp_hex"],
        })

    return out.map_batches(finish, batch_format="pyarrow")
