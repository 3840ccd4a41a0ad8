"""Deterministic synthetic fixtures (FIXTURES.md; seed=42, no external data).

Generates the transcript table from ``BASELINE.json`` ``input_hint``
(``conv_id, turn_idx, role, text, tool, ts``) plus the lexicon / effect
tables whose shapes mirror the reference's ``test_data/`` corpus.  All
tables are written once to a cache directory and re-read as Parquet, so
tests / benches at the same scale are reproducible and cheap.

Transcript text embeds lexicon mentions (species aliases, chemical
names, endpoint/effect codes, concentrations with units); ~20% of
species mentions use synonym aliases, ~5% are lightly misspelled (for
the fuzzy-linking path; mutation position >= 2 so 2-char-prefix blocking
retains recall, documented in stages/align.py), ~30% of turns mention
nothing.  Rows are emitted shuffled so turn-order reconstruction is
actually exercised.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

ENDPOINTS = ["LC50", "EC50", "NOEC", "LOEC", "EC10"]
EFFECTS = ["MOR", "GRO", "REP", "DEV"]
UNITS = ["mg/L", "ug/L", "mM", "ng/L", "g/L", "mg/kg"]
DUR_UNITS = ["h", "d", "w"]
HABITATS = ["Water", "Soil", "Sediment"]
LIFESTAGES = ["Adult", "Juvenile", "Larva", "Egg"]
GROUPS = ["Fish", "Crustaceans", "Insects/Spiders", "Algae", "Mammals",
          "Birds", "Worms", "Fungi", "StandardTestSpecies"]
CHEM_GROUPS = ["Metals", "Organophosphates", "PAHs", "Pesticides",
               "Surfactants/Oils", "Solvents. Misc"]

_SYL1 = ["Dan", "Onco", "Lepo", "Pime", "Cypri", "Gamma", "Daph", "Chiro",
         "Sal", "Micro", "Ranu", "Xeno", "Amei", "Poeci", "Hyal", "Cera"]
_SYL2 = ["io", "rhynchus", "mis", "phales", "nus", "rus", "nia", "nomus",
         "mo", "pterus", "ncu", "pus", "urus", "lia", "lella", "todes"]
_SYL3 = ["rerio", "mykiss", "macrochirus", "promelas", "carpio", "pulex",
         "magna", "riparius", "trutta", "salar", "aztec", "laevis",
         "melas", "reticulata", "azteca", "dubia", "major", "minor",
         "vulgaris", "communis", "montanus", "sylvestris"]
_COMMON = ["zebrafish", "rainbow trout", "bluegill", "fathead minnow",
           "common carp", "water flea", "midge", "brown trout", "salmon",
           "guppy", "clawed frog", "scud", "shiner", "darter", "sculpin",
           "stickleback", "sunfish", "perch", "minnow", "chub"]
_CHEM1 = ["chlor", "meth", "benz", "tolu", "phen", "naphth", "atra", "diaz",
          "mala", "para", "carb", "endo", "fluo", "nitro", "sulf", "cyper"]
_CHEM2 = ["pyrifos", "oxychlor", "ene", "idine", "anthrene", "zine", "inon",
          "thion", "aryl", "ofuran", "sulfan", "ranthene", "benzene",
          "methrin", "achlor", "oxon"]


def _rng() -> np.random.RandomState:
    return np.random.RandomState(SEED)


def _misspell(word: str, pos_seed: int) -> str:
    """Light misspelling: swap two adjacent chars at position >= 2."""
    if len(word) < 5:
        return word
    i = 2 + (pos_seed % (len(word) - 3))
    return word[:i] + word[i + 1] + word[i] + word[i + 2:]


def gen_species(n: int, rng) -> dict[str, list]:
    latin, seen = [], set()
    i1 = rng.randint(0, len(_SYL1), size=4 * n)
    i2 = rng.randint(0, len(_SYL2), size=4 * n)
    i3 = rng.randint(0, len(_SYL3), size=4 * n)
    k = 0
    while len(latin) < n and k < 4 * n:
        name = _SYL1[i1[k]] + _SYL2[i2[k]] + " " + _SYL3[i3[k]]
        if name not in seen:
            seen.add(name)
            latin.append(name)
        k += 1
    n = len(latin)
    common = [
        _COMMON[rng.randint(len(_COMMON))] + (" %d" % i if i >= len(_COMMON) else "")
        for i in range(n)
    ]
    # sparse lineage ids; genus shared by blocks of ~4 species
    genus = ["g%d" % (i // 4 + 1000) for i in range(n)]
    family = ["f%d" % (i // 16 + 2000) for i in range(n)]
    tax_order = ["o%d" % (i // 64 + 3000) for i in range(n)]
    klass = ["c%d" % (i // 256 + 4000) for i in range(n)]
    kingdom = ["k1" for _ in range(n)]
    drop = rng.rand(n)
    return {
        "species_number": [str(100000 + i) for i in range(n)],
        "common_name": common,
        "latin_name": latin,
        "kingdom": kingdom,
        "phylum_division": [None if drop[i] < 0.3 else "p%d" % (i // 512 + 5000) for i in range(n)],
        "subphylum_div": [None] * n,
        "superclass": [None if drop[i] < 0.6 else "sc%d" % (i // 300 + 6000) for i in range(n)],
        "class": klass,
        "tax_order": tax_order,
        "family": family,
        "genus": [None if drop[i] < 0.1 else genus[i] for i in range(n)],
        "species": [str(100000 + i) for i in range(n)],
        "ecotox_group": [
            GROUPS[rng.randint(len(GROUPS))]
            + ("," + GROUPS[rng.randint(len(GROUPS))] if rng.rand() < 0.3 else "")
            for _ in range(n)
        ],
    }


def gen_synonyms(species: dict[str, list], rng) -> dict[str, list]:
    nums, names = [], []
    for num, latin in zip(species["species_number"], species["latin_name"]):
        if rng.rand() < 0.5:
            g, s = latin.split(" ", 1)
            nums.append(num)
            names.append(g + "us " + s)  # old-genus style synonym
    return {"species_number": nums, "latin_name": names}


def gen_chemicals(n: int, rng) -> dict[str, list]:
    names, seen = [], set()
    i1 = rng.randint(0, len(_CHEM1), size=4 * n)
    i2 = rng.randint(0, len(_CHEM2), size=4 * n)
    k = 0
    while len(names) < n and k < 4 * n:
        nm = _CHEM1[i1[k]] + _CHEM2[i2[k]]
        if nm not in seen:
            seen.add(nm)
            names.append(nm)
        k += 1
    n = len(names)
    alias = [
        names[i] + (", " + names[i] + " technical" if rng.rand() < 0.25 else "")
        for i in range(n)
    ]
    return {
        "cas_number": [str(50000 + 7 * i) for i in range(n)],
        "chemical_name": alias,
        "ecotox_group": [CHEM_GROUPS[rng.randint(len(CHEM_GROUPS))] for _ in range(n)],
    }


def gen_taxonomy(species: dict[str, list], rng):
    """NCBI-style nodes/names/divisions over an id space disjoint from the
    ECOTOX-style species table; names reuse latin names so the
    NCBI<->ECOTOX alignment (SURVEY J5) has true matches."""
    n = len(species["species_number"])
    child = [str(900000 + i) for i in range(n)]
    parent = [str(950000 + i // 4) for i in range(n)]
    rank = ["species"] * n
    division = [str(rng.randint(0, 11)) for _ in range(n)]
    # genus nodes
    genera = sorted(set(parent))
    nodes = {
        "child": child + genera,
        "parent": parent + ["990000"] * len(genera),
        "rank": rank + ["genus"] * len(genera),
        "division": division + ["10"] * len(genera),
    }
    name_type = ["scientific name" if rng.rand() < 0.8 else "common name" for _ in range(n)]
    # '' unique_name is a NAN sentinel → exercises the dropna path
    names = {
        "taxon": child,
        "name": list(species["latin_name"]),
        "unique_name": [
            species["latin_name"][i] if rng.rand() < 0.7 else "" for i in range(n)
        ],
        "name_type": name_type,
    }
    divisions = {
        "division": [str(d) for d in range(12)],
        "acronym": ["DIV%d" % d for d in range(12)],
        "name": ["Division %d" % d for d in range(12)],
    }
    return nodes, names, divisions


def gen_tests_results(n_tests: int, species, chemicals, rng):
    ns = len(species["species_number"])
    nc = len(chemicals["cas_number"])
    si = rng.randint(0, ns, size=n_tests)
    ci = rng.randint(0, nc, size=n_tests)
    def maybe(vals, p):
        # present with probability p, else a reference NA sentinel
        return [
            vals[rng.randint(len(vals))] if rng.rand() < p
            else ("NR" if rng.rand() < 0.5 else "--")
            for _ in range(n_tests)
        ]
    tests = {
        "test_id": [str(i + 1) for i in range(n_tests)],
        "test_cas": [chemicals["cas_number"][c] for c in ci],
        "species_number": [species["species_number"][s] for s in si],
        "study_duration_mean": maybe([str(d) for d in (24, 48, 96, 7, 14)], 0.8),
        "study_duration_unit": maybe(DUR_UNITS, 0.8),
        "organism_habitat": maybe(HABITATS, 0.7),
        "organism_lifestage": maybe(LIFESTAGES, 0.6),
        "organism_age_mean": maybe([str(d) for d in (1, 2, 7, 30)], 0.4),
        "organism_age_unit": maybe(DUR_UNITS, 0.4),
        "organism_init_wt_mean": maybe(["0.5", "1.2", "2.0"], 0.3),
        "organism_init_wt_unit": maybe(["g", "mg"], 0.3),
    }
    n_res = int(n_tests * 1.5)
    ti = rng.randint(0, n_tests, size=n_res)
    results = {
        "test_id": [str(t + 1) for t in ti],
        "endpoint": [ENDPOINTS[rng.randint(len(ENDPOINTS))] + ("*" if rng.rand() < 0.1 else "") for _ in range(n_res)],
        "conc1_mean": [
            ("%g" % (10 ** (3 * rng.rand()))) + (">" if rng.rand() < 0.05 else "")
            for _ in range(n_res)
        ],
        "conc1_unit": [UNITS[rng.randint(len(UNITS))] if rng.rand() < 0.9 else "NC" for _ in range(n_res)],
        "effect": [EFFECTS[rng.randint(len(EFFECTS))] for _ in range(n_res)],
    }
    return tests, results


def gen_transcripts(n_turns: int, species, synonyms, chemicals, rng,
                    mention_rate: float = 0.70, synonym_rate: float = 0.20,
                    common_rate: float = 0.15, misspell_rate: float = 0.05):
    """Transcript turns with embedded mentions; Zipf-ish conversation
    sizes.  Rates parametrize the mention mix — the ``hard`` fixture
    variant (misspelling-heavy, low mention density) stresses the
    linker's fuzzy path where candidate-mask pruning actually bites."""
    ns = len(species["species_number"])
    nc = len(chemicals["cas_number"])
    syn_by_num = {}
    for num, nm in zip(synonyms["species_number"], synonyms["latin_name"]):
        syn_by_num.setdefault(num, []).append(nm)

    # conversation sizes: Zipf-distributed with a few hot conversations
    sizes = []
    total = 0
    cid = 0
    while total < n_turns:
        z = min(int(rng.zipf(1.5)), 5000)
        size = max(2, min(z * 4, n_turns - total)) if rng.rand() < 0.05 else \
            max(2, min(4 + int(rng.zipf(1.8)), n_turns - total, 64))
        sizes.append(size)
        total += size
        cid += 1

    conv_ids, turn_idx, roles, texts, tools, tss = [], [], [], [], [], []
    base_ts = np.int64(1_700_000_000_000_000)  # us
    roles_cycle = ["user", "assistant", "tool"]
    n_conv = len(sizes)
    conv_offsets = rng.randint(0, 10**9, size=n_conv)
    for c, size in enumerate(sizes):
        cname = "conv-%08d" % c
        for t in range(size):
            r = roles_cycle[t % 3]
            u = rng.rand()
            # no-mention gate is "u < 1 - mention_rate" (NOT
            # "u >= mention_rate") so the default variant draws the
            # exact RNG stream of the pre-parametrization generator —
            # cached fixtures and recorded baselines stay reproducible
            if u < 1.0 - mention_rate:
                text = "Turn %d of conversation %d with no relevant findings." % (t, c)
            else:
                si = rng.randint(ns)
                ci = rng.randint(nc)
                num = species["species_number"][si]
                alias = species["latin_name"][si]
                v = rng.rand()
                if v < synonym_rate and num in syn_by_num:
                    alias = syn_by_num[num][0]
                elif v < synonym_rate + common_rate:
                    alias = species["common_name"][si]
                if rng.rand() < misspell_rate:
                    alias = _misspell(alias, rng.randint(1 << 30))
                chem = chemicals["chemical_name"][ci].split(", ")[0]
                ep = ENDPOINTS[rng.randint(len(ENDPOINTS))]
                ef = EFFECTS[rng.randint(len(EFFECTS))]
                conc = "%g" % (10 ** (3 * rng.rand()))
                unit = UNITS[rng.randint(len(UNITS))]
                text = "Exposure of %s to %s gave %s %s %s (%s)." % (
                    alias, chem, ep, conc, unit, ef)
            conv_ids.append(cname)
            turn_idx.append(t)
            roles.append(r)
            texts.append(text)
            tools.append("search" if r == "tool" else "")
            tss.append(base_ts + conv_offsets[c] + t * 1_000_000)

    table = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(np.array(tss, dtype="int64")).cast(pa.timestamp("us")),
    })
    # shuffle rows so reconstruction is non-trivial
    perm = rng.permutation(table.num_rows)
    return table.take(pa.array(perm))


_TRAIT_PREDS = [
    "http://eol.org/schema/terms/ExtinctionStatus",
    "http://eol.org/schema/terms/Habitat",
    "http://rs.tdwg.org/dwc/terms/habitat",
    "http://eol.org/schema/terms/ecoregion",
]
_TRAIT_VALUES = [
    "http://eol.org/schema/terms/extant",
    "http://eol.org/schema/terms/extinct",
    "http://purl.obolibrary.org/obo/ENVO_00000873",
    "http://purl.obolibrary.org/obo/ENVO_00002030",
]


def gen_eol(n_pages: int, rng) -> tuple[dict, dict, dict]:
    """EOL-style traits / terms / rels tables (SURVEY M9-M11 fixtures).
    ~10% of trait rows carry a non-URL value (gated out by the
    emitters, as in the reference's validators.url checks)."""
    pages = [str(1_000_000 + i) for i in range(n_pages)]
    n_traits = n_pages * 3
    traits = {
        "page_id": [pages[rng.randint(n_pages)] for _ in range(n_traits)],
        "predicate": [_TRAIT_PREDS[rng.randint(len(_TRAIT_PREDS))]
                      for _ in range(n_traits)],
        "value_uri": [
            _TRAIT_VALUES[rng.randint(len(_TRAIT_VALUES))]
            if rng.rand() < 0.9 else "not a url"
            for _ in range(n_traits)],
    }
    uris = sorted(set(_TRAIT_PREDS + _TRAIT_VALUES))
    terms = {"uri": uris, "name": ["term %d" % i for i in range(len(uris))]}
    n_rels = n_pages
    rels = {
        "child": ["https://eol.org/pages/" + pages[rng.randint(n_pages)]
                  for _ in range(n_rels)],
        "parent": ["https://eol.org/pages/" + str(2_000_000 + rng.randint(50))
                   if rng.rand() < 0.9 else "bad uri"
                   for _ in range(n_rels)],
    }
    return traits, terms, rels


def gen_fingerprints(chemicals: dict[str, list], rng) -> dict[str, list]:
    """Per-chemical 63-bit fingerprint ints (tanimoto fixtures; cf. the
    PubChem binary fingerprints, ``tera/DataAccess.py:486-497``).
    Chemicals in the same ecotox_group share ~2/3 of their bits so
    similarity search has structure."""
    groups = sorted(set(chemicals["ecotox_group"]))
    base = {g: int(rng.randint(0, 1 << 62)) for g in groups}
    fps = []
    for g in chemicals["ecotox_group"]:
        noise = int(rng.randint(0, 1 << 62)) & int(rng.randint(0, 1 << 62))
        fps.append((base[g] & ~noise) | (noise & int(rng.randint(0, 1 << 62))))
    return {"cas_number": list(chemicals["cas_number"]), "fp": fps}


def gen_sameas_pairs(rng) -> dict[str, list]:
    """Mapping-fixture with sub-threshold rows, duplicate pairs, and
    a->b->c chains (FIXTURES.md §4a)."""
    src = ["A1", "A1", "A2", "B1", "B2", "C1", "C1", "D1"]
    dst = ["B1", "B1", "B2", "C1", "C2", "D1", "D1", "E1"]
    score = [0.99, 0.97, 0.98, 0.96, 0.5, 0.99, 0.91, 0.97]
    return {"src": src, "dst": dst, "score": score}


SCALES = {"t1": 1_000, "t2": 20_000, "bench": 500_000,
          "scale": 2_000_000, "scale4": 8_000_000}

# transcripts bigger than this are written as a multi-file dataset so
# ray.data.read_parquet parallelizes the read (single-file reads start
# as ONE task and only then split blocks — a serial head at scale)
_MULTIFILE_THRESHOLD = 100_000
_MULTIFILE_ROWS = 62_500


# transcript-mix presets per fixture variant: "hard" is the adversarial
# linking fixture — 10× the misspelling rate, heavier synonym/common-
# name share, and LOW mention density (90% of turns mention nothing) so
# the fuzzy candidate-mask pruning dominates the linker's work
_VARIANTS = {
    "default": dict(mention_rate=0.70, synonym_rate=0.20,
                    common_rate=0.15, misspell_rate=0.05),
    "hard": dict(mention_rate=0.10, synonym_rate=0.25,
                 common_rate=0.25, misspell_rate=0.50),
}


def fixture_dir(scale: str | int, root: str = "/tmp/tera_ray_fixtures",
                variant: str = "default") -> str:
    n_turns = SCALES.get(scale, scale) if isinstance(scale, str) else int(scale)
    suffix = "" if variant == "default" else "-" + variant
    out = os.path.join(root, str(n_turns) + suffix)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    rng = _rng()
    n_species = max(50, min(5000, n_turns // 20))
    n_chem = max(40, min(4000, n_turns // 25))
    species = gen_species(n_species, rng)
    synonyms = gen_synonyms(species, rng)
    chemicals = gen_chemicals(n_chem, rng)
    nodes, names, divisions = gen_taxonomy(species, rng)
    tests, results = gen_tests_results(max(100, n_turns // 10), species, chemicals, rng)
    transcripts = gen_transcripts(n_turns, species, synonyms, chemicals, rng,
                                  **_VARIANTS[variant])
    sameas = gen_sameas_pairs(rng)
    # independent stream so pre-existing tables stay byte-identical
    rng2 = np.random.RandomState(SEED + 1)
    traits, terms, rels = gen_eol(max(50, n_turns // 40), rng2)
    fingerprints = gen_fingerprints(chemicals, rng2)

    def w(name, data):
        t = data if isinstance(data, pa.Table) else pa.table(
            {k: pa.array(v) for k, v in data.items()})
        path = os.path.join(out, name + ".parquet")
        if name == "transcripts" and t.num_rows > _MULTIFILE_THRESHOLD:
            os.makedirs(path, exist_ok=True)
            for i, lo in enumerate(range(0, t.num_rows, _MULTIFILE_ROWS)):
                pq.write_table(t.slice(lo, _MULTIFILE_ROWS),
                               os.path.join(path, f"part-{i:04d}.parquet"))
        else:
            pq.write_table(t, path)

    w("species", species)
    w("species_synonyms", synonyms)
    w("chemicals", chemicals)
    w("taxonomy_nodes", nodes)
    w("taxonomy_names", names)
    w("divisions", divisions)
    w("tests", tests)
    w("results", results)
    w("transcripts", transcripts)
    w("sameas_pairs", sameas)
    w("traits", traits)
    w("terms", terms)
    w("eol_rels", rels)
    w("chem_fingerprints", fingerprints)
    with open(done, "w") as f:
        f.write("ok")
    return out
