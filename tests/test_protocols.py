"""SURVEY §2.11: shipped components satisfy the extension protocols."""

import pyarrow as pa

from tera_ray.protocols import (
    LinkerStage,
    Source,
    TripleEmitter,
    is_mapping_table,
)


def test_emitters_are_triple_emitters():
    from tera_ray.schema import TRIPLE_SCHEMA
    from tera_ray.stages import ecotox, taxonomy, traits

    emitters = [taxonomy.emit_hierarchy, taxonomy.emit_names,
                taxonomy.emit_divisions, ecotox.emit_taxa,
                ecotox.emit_synonyms, ecotox.emit_chemicals,
                ecotox.emit_tests, ecotox.emit_results,
                traits.emit_traits, traits.emit_term_labels,
                traits.emit_subclasses]
    for fn in emitters:
        assert isinstance(fn, TripleEmitter)
    # shape contract: empty input batch -> empty TRIPLE_SCHEMA output
    empty = pa.table({c: pa.array([], pa.string())
                      for c in ["child", "parent", "rank", "division"]})
    out = taxonomy.emit_hierarchy(empty)
    assert out.schema.equals(TRIPLE_SCHEMA)


def test_sources_are_sources():
    from tera_ray.sources.dumps import read_comma_dump, read_ntriples, read_pipe_dump
    from tera_ray.sources.mappings import read_logmap, read_wikidata_csv

    for fn in [read_pipe_dump, read_comma_dump, read_ntriples, read_logmap,
               read_wikidata_csv]:
        assert isinstance(fn, Source)


def test_stateful_stages_are_linker_stages():
    from tera_ray.dedup.minhash import MinHashStage
    from tera_ray.multimodal.media import FrameSampleStage, ImageDecodeStage
    from tera_ray.pipelines.transcripts import LinkerStage as TLinker
    from tera_ray.sources.dumps import NTriplesParser
    from tera_ray.state.enrich import EnrichStage

    for cls in [TLinker, EnrichStage, MinHashStage, ImageDecodeStage,
                FrameSampleStage, NTriplesParser]:
        assert isinstance(cls, type) and issubclass(type(cls), type)
        assert callable(getattr(cls, "__call__"))


def test_mapping_table_contract():
    t = pa.table({"src": ["a"], "dst": ["b"], "score": [1.0]})
    assert is_mapping_table(t)
    assert not is_mapping_table(t.drop_columns(["score"]))
