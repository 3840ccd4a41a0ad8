"""Single-threaded conformance oracle (SURVEY §5.2).

A direct, dependency-light transliteration of the reference emitters'
row closures (``tera/DataAggregation.py``) producing plain
``(subj, pred, obj, is_literal)`` tuples.  Used ONLY by tests to define
golden output; the engine under test is the vectorized Ray Data code in
``tera_ray/``.  Blank nodes use the engine's deterministic ids so exact
set comparison is possible (reference BNodes are random per run; the
P/R comparator treats attribute-isomorphic BNodes as equal, which
deterministic ids satisfy by construction).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from tera_ray.schema import (
    ECOTOX_NS, EOL_NS, NAN_VALUES, NCBI_NS, RDF_TYPE, RDF_VALUE, RDFS_DOMAIN,
    RDFS_LABEL, RDFS_SUBCLASSOF, OWL_SUBPROPERTYOF, SKOS_PREFLABEL, UNIT,
    UNIT_UNITS,
)
from tera_ray.units import unit_parser

_URL_RE = re.compile(r"^https?://[^\s/$.?#][^\s]*$")


def _clean(df: pd.DataFrame, subset=None, fill=False, strip=True, scrub=()) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: np.nan if (v is None or v in NAN_VALUES) else v)
    df = df.dropna(subset=subset) if subset else df.dropna()
    if fill:
        df = df.fillna("missing")
    if strip:
        df = df.apply(lambda x: x.str.strip() if x.dtype == object else x)
    for c in scrub:
        df[c] = df[c].map(
            lambda v: v if pd.isnull(v) else re.sub(r"\W", "", str(v))
        )
    return df


def hierarchy(df: pd.DataFrame, ns=NCBI_NS):
    out = set()
    df = _clean(df[["child", "parent", "rank", "division"]])
    for c, p, r, d in zip(df["child"], df["parent"], df["rank"], df["division"]):
        cu = ns + "taxon/" + str(c)
        rc = r
        r = r.replace(" ", "_")
        if r != "no_rank":
            out.add((cu, ns + "rank", ns + "rank/" + r, False))
            out.add((ns + "rank/" + r, RDFS_LABEL, rc, True))
            out.add((ns + "rank/" + r, RDF_TYPE, ns + "Rank", False))
        pu = ns + "taxon/" + str(p)
        du = ns + "division/" + str(d).replace(" ", "_")
        if r == "species":
            out.add((cu, RDF_TYPE, pu, False))
            out.add((cu, RDF_TYPE, du, False))
        else:
            out.add((cu, RDFS_SUBCLASSOF, pu, False))
            out.add((cu, RDFS_SUBCLASSOF, du, False))
    return out


def names(df: pd.DataFrame, ns=NCBI_NS):
    out = set()
    df = _clean(df[["taxon", "name", "unique_name", "name_type"]])
    for c, n, un, nt in zip(df["taxon"], df["name"], df["unique_name"], df["name_type"]):
        cu = ns + "taxon/" + str(c)
        if len(un) > 0:
            out.add((cu, ns + "uniqueName", un, True))
            out.add((ns + "uniqueName", OWL_SUBPROPERTYOF, RDFS_LABEL, False))
            out.add((ns + "uniqueName", OWL_SUBPROPERTYOF, SKOS_PREFLABEL, False))
        if len(n) > 0:
            ntl = nt
            ntu = ns + nt.replace(" ", "_")
            out.add((ntu, OWL_SUBPROPERTYOF, RDFS_LABEL, False))
            out.add((cu, ntu, n, True))
            out.add((ntu, RDFS_LABEL, ntl, True))
            out.add((ntu, RDFS_DOMAIN, ns + "Taxon", False))
    return out


def divisions(df: pd.DataFrame, ns=NCBI_NS):
    out = set()
    df = _clean(df[["division", "acronym", "name"]])
    for d, a, n in zip(df["division"], df["acronym"], df["name"]):
        du = ns + "division/" + str(d)
        out.add((du, RDF_TYPE, ns + "Division", False))
        out.add((du, RDFS_LABEL, n, True))
    return out


def tests_emitter(df: pd.DataFrame, ns=ECOTOX_NS):
    out = set()
    cols = ["test_id", "test_cas", "species_number", "study_duration_mean",
            "study_duration_unit", "organism_habitat", "organism_lifestage",
            "organism_age_mean", "organism_age_unit", "organism_init_wt_mean",
            "organism_init_wt_unit"]
    df = _clean(df[cols], subset=["test_id", "test_cas", "species_number"], fill=True)
    for row in zip(*[df[c] for c in cols]):
        (test_id, cas, sn, stdm, stdu, habitat, lifestage,
         age, ageunit, weight, weightunit) = row
        t = ns + "test/" + str(test_id)
        out.add((t, RDF_TYPE, ns + "Test", False))
        out.add((t, ns + "species", ns + "taxon/" + str(sn), False))
        out.add((t, ns + "chemical", ns + "cas/" + str(cas), False))
        for v, u, p in zip([stdm, age, weight], [stdu, ageunit, weightunit],
                           ["studyDuration", "organismAge", "organismWeight"]):
            if v != "missing":
                b = "_:m|%s|%s|%s|%s" % (test_id, p, v, u)
                out.add((b, RDF_VALUE, v, True))
                if u != "missing":
                    pu = unit_parser(u)
                    if pu:
                        out.add((b, UNIT_UNITS, UNIT + pu, False))
                out.add((t, ns + p, b, False))
        if habitat != "missing":
            out.add((t, ns + "organismHabitat", ns + "habitat/" + habitat, False))
        if lifestage != "missing":
            out.add((t, ns + "organismLifestage", ns + "lifestage/" + lifestage, False))
    return out


def results_emitter(df: pd.DataFrame, ns=ECOTOX_NS):
    out = set()
    cols = ["test_id", "endpoint", "conc1_mean", "conc1_unit", "effect"]
    df = _clean(df[cols], subset=cols, fill=True)
    for test_id, endpoint, conc, conc_unit, effect in zip(*[df[c] for c in cols]):
        t = ns + "test/" + str(test_id)
        key = "%s|%s|%s|%s|%s" % (test_id, endpoint, effect, conc, conc_unit)
        r = "_:r|" + key
        b = "_:c|" + key
        out.add((r, ns + "endpoint", ns + "endpoint/" + str(endpoint), False))
        out.add((r, ns + "effect", ns + "effect/" + str(effect), False))
        conc_d = "".join(filter(str.isdigit, conc))
        if conc_d:
            out.add((b, RDF_VALUE, conc_d, True))
            if conc_unit != "missing":
                pu = unit_parser(conc_unit)
                if pu:
                    out.add((b, UNIT_UNITS, UNIT + pu, False))
        out.add((r, ns + "concentration", b, False))
        out.add((t, ns + "hasResult", r, False))
    return out


def taxa(df: pd.DataFrame, ns=ECOTOX_NS):
    out = set()
    df = _clean(df[["species_number", "common_name", "latin_name", "ecotox_group"]])
    for s, cn, ln, group in zip(df["species_number"], df["common_name"],
                                df["latin_name"], df["ecotox_group"]):
        su = ns + "taxon/" + s
        group = str(group).replace(" ", "")
        names_ = group.split(",")
        group_uri = [ns + "group/" + gr.replace("\\W", "") for gr in group.split(",")]
        for gri, n in zip(group_uri, names_):
            if len(n) < 1:
                continue
            out.add((su, ns + "ecotoxGroup", gri, False))
            out.add((gri, RDFS_LABEL, n, True))
        if cn:
            out.add((su, ns + "commonName", cn, True))
        if ln:
            out.add((su, ns + "latinName", ln, True))
    return out


def synonyms(df: pd.DataFrame, ns=ECOTOX_NS):
    out = set()
    df = _clean(df[["species_number", "latin_name"]],
                subset=["species_number", "latin_name"])
    for s, ln in zip(df["species_number"], df["latin_name"]):
        out.add((ns + "taxon/" + s, ns + "synonym", ln, True))
    return out


def ecotox_hierarchy(df: pd.DataFrame, ns=ECOTOX_NS):
    out = set()
    ks = ["species_number", "genus", "family", "tax_order", "class",
          "superclass", "subphylum_div", "phylum_division", "kingdom"]
    df = _clean(df[ks], subset=["species_number"], strip=False, scrub=ks)
    for row in zip(*[df[k] for k in ks]):
        sn, *lineage = row
        rank = None
        for k, l in zip(["species"] + ks[1:], lineage):
            rank = k
            if not pd.isnull(l):
                break
        ranku = ns + "rank/" + rank
        out.add((ranku, RDF_TYPE, ns + "Rank", False))
        lin = [ns + "taxon/" + str(l).strip() for l in lineage if not pd.isnull(l)]
        s = ns + "taxon/" + sn
        out.add((s, ns + "rank", ranku, False))
        lin = [s] + lin
        for child, parent in zip(lin, lin[1:] + [None]):
            if not parent:
                break
            if rank == "species":
                out.add((child, RDF_TYPE, parent, False))
            else:
                out.add((child, RDFS_SUBCLASSOF, parent, False))
    return out


def chemicals(df: pd.DataFrame, ns=ECOTOX_NS):
    out = set()
    df = _clean(df[["cas_number", "chemical_name", "ecotox_group"]])
    for c, n, group in zip(df["cas_number"], df["chemical_name"], df["ecotox_group"]):
        cu = ns + "cas/" + str(c)
        out.add((cu, RDF_TYPE, ns + "Chemical", False))
        for a in n.split(", "):
            out.add((cu, RDFS_LABEL, a, True))
        names_ = group.split(",")
        g = group.replace("/", "").replace(".", "").replace(" ", "")
        for gr, nm in zip(g.split(","), names_):
            gri = ns + "group/" + gr
            out.add((cu, RDFS_SUBCLASSOF, gri, False))
            out.add((gri, RDFS_LABEL, nm, True))
            out.add((gri, RDF_TYPE, ns + "ChemicalGroup", False))
    return out


def traits(df: pd.DataFrame, ns=EOL_NS):
    out = set()
    df = _clean(df[["page_id", "predicate", "value_uri"]])
    for s, p, o in zip(df["page_id"], df["predicate"], df["value_uri"]):
        su = ns + s
        if _URL_RE.match(su) and _URL_RE.match(p) and _URL_RE.match(o):
            out.add((su, p, o, False))
    return out


def eol_subclasses(df: pd.DataFrame):
    out = set()
    df = _clean(df[["child", "parent"]])
    for c, p in zip(df["child"], df["parent"]):
        if _URL_RE.match(c) and _URL_RE.match(p):
            out.add((c, RDFS_SUBCLASSOF, p, False))
    return out
