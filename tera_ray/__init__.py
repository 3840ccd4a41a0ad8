"""tera_ray — Ray-Data-native knowledge-graph construction engine.

From-scratch rebuild of the data-processing capabilities of
NIVA-Knowledge-Graph/TERA over Parquet conversation transcripts, plus
the training-data operators a 100 TB pipeline needs.  See README.md for
the architecture and the SURVEY §2 coverage matrix.

Public entry points (import submodules lazily — everything is
self-contained per module, nothing here touches Ray at import time):

- ``tera_ray.pipelines.transcripts`` — flagship build
  (``build_kg`` / ``build_kg_canonical``), conversation reconstruction
- ``tera_ray.stages`` — triple emitters + alignment
- ``tera_ray.query`` — KG queries and relational operators
  (``bucket_multijoin``, ``sessionize``, ``top1_per_key``)
- ``tera_ray.dedup`` / ``ann`` / ``text`` / ``multimodal`` —
  training-data operators
- ``tera_ray.state`` — lexicons, mapping tables, union-find, checkpoints
- ``tera_ray.protocols`` — the user-extension surface (SURVEY §2.11)
"""

__version__ = "0.1.0"
