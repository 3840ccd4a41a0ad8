"""Scalar unit / string / similarity functions.

From-scratch re-implementations of the reference's scalar library with
identical observable behaviour (``tera/utils.py:15-225``).  These are
pure functions; the engine applies them over *distinct* values inside
``map_batches`` (units have tiny cardinality) and joins the result back
— never per input row (SURVEY.md F1/F2).
"""

from __future__ import annotations

from functools import lru_cache
from itertools import combinations

# tera/utils.py:15-38
UNIT_LOOKUP = {
    "mg": "Milligram",
    "ug": "Microgram",
    "kg": "Kilogram",
    "mM": "Millimol",
    "ng": "Nanogram",
    "g": "Gram",
    "µg": "Microgram",
    "L": "Litre",
    "%": "Percent",
    "cm": "Centimetre",
    "mm": "Millimetre",
    "nm": "Nanometre",
    "deg": "Degree",
    "C": "Celcius",
    "K": "Kelvin",
    "l": "Litre",
    "psu": "PracticalSalinityUnit",
    "h": "Hour",
    "d": "Day",
    "w": "Week",
}

# tera/utils.py:40-48
PREFIX_TABLE = {
    "kilo": 1000,
    "hekto": 100,
    "deka": 10,
    "desi": 0.1,
    "centi": 0.01,
    "milli": 1e-3,
    "micro": 1e-6,
    "nano": 1e-9,
    "percent": 0.01,
}

BASE_UNITS = ["gram", "mol", "litre", "metre"]


@lru_cache(maxsize=65536)
def unit_parser(string: str) -> str:
    """Unit string -> QUDT-style name, e.g. ``mg/L`` -> ``MilligramPerLitre``.

    Mirrors ``tera/utils.py:52-99`` exactly, including its quirks: the
    no-op ``str.replace`` calls for ``dm^3``/``dm3`` (results discarded in
    the reference, so here too), the longest-parsable-substring fallback,
    and the empty-string result for unparsable input.
    """
    if len(string) < 2 and string not in UNIT_LOOKUP:
        return ""

    # (reference bug kept: replace() results are discarded, utils.py:73-76)

    for elem, name in zip(["/", "^2", "^3", " "], ["Per", "Squared", "Cubed", ""]):
        if elem in string:
            a, b = string.split(elem, 1)
            return unit_parser(a) + name + unit_parser(b)

    if "-1" in string:
        return unit_parser(string.replace("-1", "/"))

    if string in UNIT_LOOKUP:
        return UNIT_LOOKUP[string]

    res1 = [string[x:y] for x, y in combinations(range(len(string) + 1), r=2)]
    res1.remove(string)
    res = [(unit_parser(s), s) for s in res1]
    res = [(a, b) for a, b in res if len(a) > 1]
    if res:
        u, _ = sorted(res, key=lambda x: len(x[1]), reverse=True)[0]
        return u
    return ""


def _units_of_same_type(unit1: str, unit2: str) -> bool:
    """Dimensional-compatibility check (``tera/utils.py:101-120``)."""
    unit1 = unit1.lower()
    unit2 = unit2.lower()
    for prefix in ["milli", "nano", "micro", "kilo", "centi"]:
        unit1 = unit1.replace(prefix, "")
        unit2 = unit2.replace(prefix, "")
    unit1 = unit1.replace("mol", "gram")
    unit2 = unit2.replace("mol", "gram")
    if "per" in unit1 and "per" in unit2:
        a1, b1 = unit1.split("per", 1)
        a2, b2 = unit2.split("per", 1)
        return _units_of_same_type(a1, a2) and _units_of_same_type(b1, b2)
    return unit1 == unit2


def _to_base_unit(unit: str) -> float:
    """Multiplicative factor to the base unit (``tera/utils.py:122-149``)."""
    unit = unit.lower()
    if unit in BASE_UNITS:
        return 1
    if "per" in unit:
        a, b = unit.split("per", 1)
        return _to_base_unit(a) / _to_base_unit(b)
    if "squared" in unit:
        a, b = unit.split("squared", 1)
        return _to_base_unit(a) ** 2 * _to_base_unit(b)
    if "cubed" in unit:
        a, b = unit.split("cubed", 1)
        return _to_base_unit(a) ** 3 * _to_base_unit(b)
    if unit in PREFIX_TABLE:
        return PREFIX_TABLE[unit]
    tmp = unit
    for bs in BASE_UNITS:
        unit = unit.replace(bs, "")
    if unit != tmp:
        return _to_base_unit(unit)
    return 0


def unit_conversion(from_unit: str, to_unit: str, molecular_mass: float | None = None) -> float:
    """Conversion factor between two parsed unit names (``tera/utils.py:151-203``)."""
    if from_unit == to_unit:
        return 1
    from_unit = strip_namespace(from_unit, ["/", "#"])
    to_unit = strip_namespace(to_unit, ["/", "#"])
    assert _units_of_same_type(from_unit, to_unit)
    from_unit = from_unit.lower()
    to_unit = to_unit.lower()
    mm_f = 1.0
    mm_t = 1.0
    if "mol" in from_unit:
        assert molecular_mass
        mm_f = molecular_mass
        from_unit = from_unit.replace("mol", "gram")
    if "mol" in to_unit:
        assert molecular_mass
        mm_t = molecular_mass
        to_unit = to_unit.replace("mol", "gram")
    return (mm_f * _to_base_unit(from_unit)) / (mm_t * _to_base_unit(to_unit))


def tanimoto(fp1: int, fp2: int) -> float:
    """Tanimoto similarity over integer bitsets.

    The reference version (``tera/utils.py:206-225``) has a latent type
    bug (``&`` on strings); we take int bitsets, which is what the math
    means.  Accepts '0'/'1' strings too, for parity with call sites.
    """
    if isinstance(fp1, str):
        fp1 = int(fp1, 2)
    if isinstance(fp2, str):
        fp2 = int(fp2, 2)
    c1 = bin(fp1).count("1")
    c2 = bin(fp2).count("1")
    both = bin(fp1 & fp2).count("1")
    return float(both) / (c1 + c2 - both)


def strip_namespace(string: str, var=("/",)) -> str:
    """URI -> local id by shortest split-tail (``tera/utils.py:337-359``)."""
    if isinstance(var, str):
        var = [var]
    tmp1 = str(string)
    for v in var:
        tmp2 = str(string).split(v)[-1]
        if len(tmp2) < len(tmp1):
            tmp1 = tmp2
    return tmp1
