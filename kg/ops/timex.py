"""Temporal-expression and measured-quantity normalization: the fact
TIMESTAMPING and quantity-canonicalization steps of KG construction.
OpenIE/table/JSON-LD extraction produce surface objects ("March 5,
2020", "5 km"); facts need comparable values (ISO dates with explicit
granularity, SI magnitudes) before temporal scoping, conflict
resolution, or range queries can work.

Scale shape: both extractors are PURE MAPS — one mega-alternation
regexp_extract_all finds the surfaces (alternation order resolves
overlaps by consumption: "5 March 2020" is eaten by the DMY alternative
before the bare "March 2020" month-year shape can fire), then the
normalization of each surface is a per-element column expression.
No Python, no shuffle; invalid calendar dates (Feb 30) are nulled by
try_to_date and dropped as data, not errors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "extract_timex", "extract_measures", "MEASURE_UNITS",
    "fact_time_scope", "extract_coords", "extract_quotes",
    "haversine_km", "geo_near_join", "EARTH_RADIUS_KM",
]

_MONTHS = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]
_M = "|".join(_MONTHS)

# Alternation order matters: day-carrying shapes before month-year, so a
# "5 March 2020" match consumes the text the bare "March 2020" shape
# would otherwise claim. Numeric m/d/y is parsed US-style (documented).
_TIMEX_RE = (
    rf"\b(?:\d{{4}}-\d{{2}}-\d{{2}}"
    rf"|(?:{_M}) \d{{1,2}}, \d{{4}}"
    rf"|\d{{1,2}} (?:{_M}) \d{{4}}"
    rf"|(?:{_M}) \d{{4}}"
    rf"|\d{{1,2}}/\d{{1,2}}/\d{{4}})\b"
)
# Bare years only with an explicit "in <year>" anchor — a free-standing
# 4-digit number is usually not a date.
_YEAR_RE = r"\bin (\d{4})\b"


def _month_num(name: Column) -> Column:
    return F.array_position(
        F.array(*[F.lit(m) for m in _MONTHS]), name
    ).cast("int")


def _pad2(c: Column) -> Column:
    return F.lpad(c, 2, "0")


def extract_timex(
    docs: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """One row per temporal expression: (url, surface, iso, granularity).
    ``iso`` is the zero-padded ISO-8601 day string; month-granularity
    surfaces normalize to the month's first day, year-granularity to
    Jan 1 — with ``granularity`` ∈ {'day','month','year'} recording what
    the text actually asserted (consumers must not over-read)."""
    surfaces = F.regexp_extract_all(F.col(text_col), F.lit(_TIMEX_RE), F.lit(0))
    year_hits = F.regexp_extract_all(F.col(text_col), F.lit(_YEAR_RE), F.lit(1))

    s = F.col("surface")
    iso = (
        F.when(
            s.rlike(r"^\d{4}-\d{2}-\d{2}$"),
            F.concat(s, F.lit("#day")),
        )
        .when(
            s.rlike(rf"^(?:{_M}) \d{{1,2}}, \d{{4}}$"),
            F.concat(
                F.regexp_extract(s, rf"^(?:{_M}) \d{{1,2}}, (\d{{4}})$", 1),
                F.lit("-"),
                _pad2(_month_num(F.regexp_extract(s, rf"^({_M})", 1))),
                F.lit("-"),
                _pad2(F.regexp_extract(s, rf"^(?:{_M}) (\d{{1,2}}),", 1)),
                F.lit("#day"),
            ),
        )
        .when(
            s.rlike(rf"^\d{{1,2}} (?:{_M}) \d{{4}}$"),
            F.concat(
                F.regexp_extract(s, r"(\d{4})$", 1),
                F.lit("-"),
                _pad2(_month_num(F.regexp_extract(s, rf" ({_M}) ", 1))),
                F.lit("-"),
                _pad2(F.regexp_extract(s, r"^(\d{1,2}) ", 1)),
                F.lit("#day"),
            ),
        )
        .when(
            s.rlike(rf"^(?:{_M}) \d{{4}}$"),
            F.concat(
                F.regexp_extract(s, r"(\d{4})$", 1),
                F.lit("-"),
                _pad2(_month_num(F.regexp_extract(s, rf"^({_M})", 1))),
                F.lit("-01#month"),
            ),
        )
        .when(
            s.rlike(r"^\d{1,2}/\d{1,2}/\d{4}$"),
            F.concat(
                F.regexp_extract(s, r"(\d{4})$", 1),
                F.lit("-"),
                _pad2(F.regexp_extract(s, r"^(\d{1,2})/", 1)),
                F.lit("-"),
                _pad2(F.regexp_extract(s, r"^\d{1,2}/(\d{1,2})/", 1)),
                F.lit("#day"),
            ),
        )
    )
    dated = (
        docs.select(
            F.col(id_col).alias("url"), F.explode(surfaces).alias("surface")
        )
        .select(
            "url", "surface",
            F.split(iso, "#").getItem(0).alias("iso"),
            F.split(iso, "#").getItem(1).alias("granularity"),
        )
        .where(F.col("iso").isNotNull())
    )
    yeared = docs.select(
        F.col(id_col).alias("url"), F.explode(year_hits).alias("y")
    ).select(
        "url",
        F.concat(F.lit("in "), F.col("y")).alias("surface"),
        F.concat(F.col("y"), F.lit("-01-01")).alias("iso"),
        F.lit("year").alias("granularity"),
    )
    return dated.unionByName(yeared).where(
        F.try_to_date(F.col("iso"), "yyyy-MM-dd").isNotNull()
    )


# unit -> (SI factor, SI unit); longer tokens first so the alternation
# never truncates a unit ("km" before "m", "kg"/"mg" before "g").
MEASURE_UNITS: list[tuple[str, float, str]] = [
    ("km", 1000.0, "m"),
    ("cm", 0.01, "m"),
    ("mm", 0.001, "m"),
    ("mi", 1609.344, "m"),
    ("ft", 0.3048, "m"),
    ("kg", 1.0, "kg"),
    ("mg", 1e-6, "kg"),
    ("lb", 0.45359237, "kg"),
    ("GHz", 1e9, "Hz"),
    ("MHz", 1e6, "Hz"),
    ("kHz", 1e3, "Hz"),
    ("TB", 1e12, "B"),
    ("GB", 1e9, "B"),
    ("MB", 1e6, "B"),
    ("KB", 1e3, "B"),
    ("Hz", 1.0, "Hz"),
    ("m", 1.0, "m"),
    ("g", 0.001, "kg"),
    ("%", 0.01, "ratio"),
]

_UNIT_ALT = "|".join(
    u.replace("%", "%") for u, _, _ in MEASURE_UNITS
)
_MEASURE_RE = rf"\b(\d+(?:\.\d+)?) ?({_UNIT_ALT})(?![A-Za-z])"


def extract_measures(
    docs: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """One row per quantity mention:
    (url, surface, value, unit, value_si, unit_si) — value_si in the
    unit's SI base (m / kg / Hz / B / ratio). Pure map: one
    regexp_extract_all + per-element parse + a literal CASE ladder for
    the conversion table."""
    nums = F.regexp_extract_all(
        F.col(text_col), F.lit(_MEASURE_RE), F.lit(0)
    )
    rows = docs.select(
        F.col(id_col).alias("url"), F.explode(nums).alias("surface")
    )
    value = F.regexp_extract("surface", r"^(\d+(?:\.\d+)?)", 1).cast(
        "double"
    )
    unit = F.regexp_extract("surface", rf"({_UNIT_ALT})$", 1)
    factor = None
    si_unit = None
    for u, f_, si in MEASURE_UNITS:
        cond = unit == u
        factor = (
            F.when(cond, F.lit(f_))
            if factor is None
            else factor.when(cond, F.lit(f_))
        )
        si_unit = (
            F.when(cond, F.lit(si))
            if si_unit is None
            else si_unit.when(cond, F.lit(si))
        )
    return rows.select(
        "url",
        "surface",
        value.alias("value"),
        unit.alias("unit"),
        (value * factor).alias("value_si"),
        si_unit.alias("unit_si"),
    )


def fact_time_scope(
    triples: DataFrame,
    timex: DataFrame,
    keys: tuple = ("subj", "pred", "obj"),
    url_col: str = "url",
) -> DataFrame:
    """Doc-level temporal scoping of facts: associate each fact with the
    DAY-granularity dates mentioned in the documents that assert it
    (document-date association — the standard first approximation when
    extraction is not sentence-aligned; month/year-granularity timex
    rows are excluded rather than over-read as days).

    Returns one row per fact:
      (keys..., t_earliest, t_latest, n_dated, t_modal)
    where n_dated counts (asserting doc, mentioned date) evidence pairs
    and t_modal is the most-mentioned date (ties → earliest), the
    single-date scope a consumer would pick.

    Scale shape: one equi-join on the url key (both sides arrive
    url-partitioned from extraction, so the join reuses that layout),
    then two partial-agged groupBys — (fact, date) collapse first, fact
    rollup second; the modal date is the window-free min(struct(-n,
    date)) argmax idiom. No Python, no window.
    """
    days = timex.where(F.col("granularity") == "day").select(
        F.col(url_col).alias("url"), "iso"
    )
    dated = triples.select(*keys, F.col(url_col).alias("url")).join(
        days, "url"
    )
    per = dated.groupBy(*keys, "iso").agg(F.count(F.lit(1)).alias("n"))
    key = F.struct((-F.col("n")).alias("negn"), F.col("iso").alias("iso"))
    return (
        per.groupBy(*keys)
        .agg(
            F.min("iso").alias("t_earliest"),
            F.max("iso").alias("t_latest"),
            F.sum("n").alias("n_dated"),
            F.min(key).alias("_b"),
        )
        .select(
            *keys, "t_earliest", "t_latest", "n_dated",
            F.col("_b.iso").alias("t_modal"),
        )
    )


# degree-notation ("52.52°N 13.40°E") and signed-decimal-pair
# ("52.5200, -13.4050") coordinate shapes. The decimal pair requires
# both members to carry a fractional part — two bare integers separated
# by a comma are usually a list, not a location.
_COORD_DEG_RE = (
    r"\b(\d{1,2}(?:\.\d+)?)°([NS])[, ] ?(\d{1,3}(?:\.\d+)?)°([EW])\b"
)
_COORD_DEC_RE = r"(?<![\d.-])(-?\d{1,2}\.\d+), (-?\d{1,3}\.\d+)\b"


def extract_coords(
    docs: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """One row per coordinate mention: (url, surface, lat, lon) —
    degree-notation hemispheres folded into signs, out-of-range pairs
    (|lat| > 90, |lon| > 180) dropped as data. Pure map, same shape as
    the other miners."""
    deg = F.regexp_extract_all(
        F.col(text_col), F.lit(_COORD_DEG_RE), F.lit(0)
    )
    dec = F.regexp_extract_all(
        F.col(text_col), F.lit(_COORD_DEC_RE), F.lit(0)
    )
    s = F.col("surface")
    lat_deg = F.regexp_extract(s, _COORD_DEG_RE, 1).cast("double") * F.when(
        F.regexp_extract(s, _COORD_DEG_RE, 2) == "S", -1.0
    ).otherwise(1.0)
    lon_deg = F.regexp_extract(s, _COORD_DEG_RE, 3).cast("double") * F.when(
        F.regexp_extract(s, _COORD_DEG_RE, 4) == "W", -1.0
    ).otherwise(1.0)
    lat_dec = F.regexp_extract(s, _COORD_DEC_RE, 1).cast("double")
    lon_dec = F.regexp_extract(s, _COORD_DEC_RE, 2).cast("double")
    is_deg = s.contains("°")
    out = docs.select(
        F.col(id_col).alias("url"),
        F.explode(F.concat(deg, dec)).alias("surface"),
    ).select(
        "url", "surface",
        F.when(is_deg, lat_deg).otherwise(lat_dec).alias("lat"),
        F.when(is_deg, lon_deg).otherwise(lon_dec).alias("lon"),
    )
    return out.where(
        (F.abs("lat") <= 90.0) & (F.abs("lon") <= 180.0)
    )


# Quotebank-style attribution: '<Speaker> said[,:] "<quote>"' and the
# inverted '"<quote>," said <Speaker>'. Speaker NP = capitalized token
# sequence; quotes are double-quoted spans without embedded quotes.
_NP_RE = r"[A-Z][A-Za-z0-9-]*(?: [A-Z][A-Za-z0-9-]*)*"
_QUOTE_FWD_RE = rf'\b({_NP_RE}) said[,:]? "([^"]+)"'
_QUOTE_INV_RE = rf'"([^"]+)," said ({_NP_RE})\b'


def extract_quotes(
    docs: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """One row per attributed quotation: (url, speaker, quote, shape)
    with shape ∈ {'forward','inverted'}. The (speaker, said, quote)
    triple is KG evidence the same way SVO triples are — the Quotebank
    construction. Pure map: two regexp_extract_all passes per shape
    (speaker group, quote group) zipped positionally."""
    outs = []
    for shape, rx, sg, qg in (
        ("forward", _QUOTE_FWD_RE, 1, 2),
        ("inverted", _QUOTE_INV_RE, 2, 1),
    ):
        speakers = F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(sg))
        quotes = F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(qg))
        matches = F.transform(
            speakers,
            lambda sp, i: F.struct(
                sp.alias("speaker"), F.element_at(quotes, i + 1).alias("q")
            ),
        )
        outs.append(
            docs.select(
                F.col(id_col).alias("url"), F.explode(matches).alias("m")
            ).select(
                "url",
                F.col("m.speaker").alias("speaker"),
                F.col("m.q").alias("quote"),
                F.lit(shape).alias("shape"),
            )
        )
    return outs[0].unionByName(outs[1])


# --- spatial near-join over extracted coordinates --------------------

EARTH_RADIUS_KM = 6371.0088
_KM_PER_DEG_LAT = 111.19492664455873  # pi * R / 180


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance (km) as pure column expressions."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def geo_near_join(
    points: DataFrame,
    radius_km: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 66.0,
    cell_cap: int = 100_000,
) -> DataFrame:
    """All point pairs within ``radius_km`` great-circle distance:
    (id_a < id_b, dist_km) — the geo-dedup/conflation join the
    extracted-coordinate facts (extract_coords) feed: "are these two
    mined places the same place".

    Scale shape — the dedup-module banding discipline applied to space:
    a grid of cells sized so any two points within the radius are in the
    same or an adjacent cell (lat cell = radius/111.19 km-per-degree;
    lon cell widened by 1/cos(max_abs_lat) and snapped so an integer
    count of cells rings the globe, with wraparound at the
    antimeridian). One side explodes to its 3×3 cell neighborhood, the
    join is a plain equi-join on the cell key, and an exact haversine
    check verifies — so precision is exact and the only cost knob is
    candidate count. Cells holding more than ``cell_cap`` points are
    dropped count-then-filter (a coordinate every page repeats — (0,0)
    boilerplate — would otherwise go quadratic, same guard as the LSH
    buckets).

    Scope: points with |lat| > ``max_abs_lat`` are excluded (lon cells
    narrow toward the poles faster than a fixed grid can guarantee
    adjacency; polar corpora should band on a polar projection instead).
    """
    import math

    clat = float(radius_km) / _KM_PER_DEG_LAT
    lon_deg_needed = clat / math.cos(math.radians(max_abs_lat))
    n_lon = max(1, int(360.0 // lon_deg_needed))
    clon = 360.0 / n_lon
    base = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
    ).where(F.abs(F.col("lat")) <= max_abs_lat)
    cells = base.select(
        "id",
        "lat",
        "lon",
        F.floor(F.col("lat") / clat).cast("long").alias("la"),
        F.pmod(
            F.floor((F.col("lon") + 180.0) / clon), F.lit(n_lon)
        ).cast("long").alias("lo"),
    )
    hot = (
        cells.groupBy("la", "lo")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > cell_cap)
        .select("la", "lo")
    )
    cells = cells.join(F.broadcast(hot), ["la", "lo"], "left_anti")
    neigh = F.explode(
        F.array(
            *[
                F.struct(
                    (F.col("la") + i).alias("la2"),
                    F.pmod(F.col("lo") + j, F.lit(n_lon)).alias("lo2"),
                )
                for i in (-1, 0, 1)
                for j in (-1, 0, 1)
            ]
        )
    )
    a = cells.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        neigh.alias("n"),
    ).select(
        "id_a", "lat_a", "lon_a",
        F.col("n.la2").alias("la"), F.col("n.lo2").alias("lo"),
    )
    b = cells.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "la",
        "lo",
    )
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        a.join(b, ["la", "lo"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_km", F.round(dist, 6))
        .where(F.col("dist_km") <= float(radius_km))
        .select("id_a", "id_b", "dist_km")
    )
