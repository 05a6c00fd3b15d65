"""Temporal-expression + quantity normalization (kg/ops/timex.py):
shape coverage, overlap consumption, invalid-date rejection, unit
ladder, plan purity."""

from __future__ import annotations

from kg.ops.timex import extract_measures, extract_timex


def _docs(spark, *texts: str):
    return spark.createDataFrame(
        [(f"u{i}", t) for i, t in enumerate(texts)], "url string, text string"
    )


class TestTimex:
    def test_all_shapes_normalize(self, spark):
        got = sorted(
            map(
                tuple,
                extract_timex(
                    _docs(
                        spark,
                        "Founded on March 5, 2020 and sold 2020-07-14. "
                        "Expanded 5 March 2021 in Berlin.",
                        "Revenue grew in March 2022, then dipped in 2023. "
                        "Ship date 12/31/2019.",
                    )
                )
                .select("url", "surface", "iso", "granularity")
                .collect(),
            )
        )
        assert got == [
            ("u0", "2020-07-14", "2020-07-14", "day"),
            ("u0", "5 March 2021", "2021-03-05", "day"),
            ("u0", "March 5, 2020", "2020-03-05", "day"),
            ("u1", "12/31/2019", "2019-12-31", "day"),
            ("u1", "March 2022", "2022-03-01", "month"),
            ("u1", "in 2023", "2023-01-01", "year"),
        ]

    def test_dmy_consumes_month_year(self, spark):
        # "5 March 2021" must NOT additionally yield a "March 2021"
        # month-granularity row — alternation order eats it
        rows = extract_timex(_docs(spark, "Expanded 5 March 2021.")).collect()
        assert len(rows) == 1 and rows[0].granularity == "day"

    def test_invalid_calendar_dates_dropped(self, spark):
        df = extract_timex(
            _docs(spark, "Invalid: February 30, 2020. Also 13/13/2020.")
        )
        assert df.count() == 0

    def test_bare_year_needs_anchor(self, spark):
        df = extract_timex(_docs(spark, "Error code 2020 appeared twice."))
        assert df.count() == 0


class TestMeasures:
    def test_unit_ladder(self, spark):
        got = {
            r.surface: (r.value, r.unit, r.value_si, r.unit_si)
            for r in extract_measures(
                _docs(
                    spark,
                    "The drive is 2 TB, weighs 1.5 kg, runs at 3.2 GHz, "
                    "80% full, 5 km away, 12 ft tall.",
                )
            ).collect()
        }
        assert got["2 TB"] == (2.0, "TB", 2.0e12, "B")
        assert got["1.5 kg"] == (1.5, "kg", 1.5, "kg")
        assert got["3.2 GHz"] == (3.2, "GHz", 3.2e9, "Hz")
        assert got["80%"] == (80.0, "%", 0.8, "ratio")
        assert got["5 km"] == (5.0, "km", 5000.0, "m")
        assert got["12 ft"][3] == "m"

    def test_longer_unit_wins_and_word_boundary(self, spark):
        got = {
            r.surface: r.unit
            for r in extract_measures(
                _docs(spark, "It is 3 km long, 4 mg heavy, 5 meters? no: "
                             "5 mg exact.")
            ).collect()
        }
        # 'km' not truncated to 'm'; '5 meters' must NOT match bare 'm'
        assert got == {"3 km": "km", "4 mg": "mg", "5 mg": "mg"}


def test_timex_pure_map_no_python(spark):
    d = _docs(spark, "on March 5, 2020")
    for df in (extract_timex(d), extract_measures(d)):
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p
        assert "MapInPandas" not in p and "BatchEvalPython" not in p


class TestFactTimeScope:
    def test_modal_and_granularity_gate(self, spark):
        from kg.ops.timex import fact_time_scope

        triples = spark.createDataFrame(
            [("A", "ceo_of", "X", f"u{i}") for i in range(3)]
            + [("B", "ceo_of", "Y", "u9")],
            "subj string, pred string, obj string, url string",
        )
        timex = spark.createDataFrame(
            [
                ("u0", "2020-01-05", "day"),
                ("u1", "2020-01-05", "day"),
                ("u2", "2021-06-01", "day"),
                ("u2", "2022-01-01", "year"),   # gated out
                ("u9", "2019-12-31", "month"),  # gated out -> B has no scope
            ],
            "url string, iso string, granularity string",
        )
        rows = {tuple(r[:3]): r for r in fact_time_scope(triples, timex).collect()}
        a = rows[("A", "ceo_of", "X")]
        assert (a.t_earliest, a.t_latest, a.n_dated, a.t_modal) == (
            "2020-01-05", "2021-06-01", 3, "2020-01-05"
        )
        assert ("B", "ceo_of", "Y") not in rows

    def test_no_window_in_plan(self, spark):
        from kg.ops.timex import fact_time_scope

        t = spark.createDataFrame(
            [("a", "p", "b", "u")], "subj string, pred string, obj string, url string"
        )
        x = spark.createDataFrame(
            [("u", "2020-01-01", "day")], "url string, iso string, granularity string"
        )
        p = (
            fact_time_scope(t, x)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in p
        assert "CartesianProduct" not in p


class TestCoordsQuotes:
    def test_coords_shapes_and_range_gate(self, spark):
        from kg.ops.timex import extract_coords

        got = {
            r.surface: (r.lat, r.lon)
            for r in extract_coords(
                _docs(
                    spark,
                    "Berlin is at 52.52°N 13.40°E today.",
                    "Buried at 33.86°S 151.21°E and also -12.04, -77.03.",
                    "Nonsense 95.00, 10.00 and 10.00, 190.00 dropped.",
                    "Id 152.52, 13.40 must not match its tail digits.",
                )
            ).collect()
        }
        assert got == {
            "52.52°N 13.40°E": (52.52, 13.40),
            "33.86°S 151.21°E": (-33.86, 151.21),
            "-12.04, -77.03": (-12.04, -77.03),
        }

    def test_quotes_both_shapes(self, spark):
        from kg.ops.timex import extract_quotes

        got = sorted(
            map(
                tuple,
                extract_quotes(
                    _docs(
                        spark,
                        'Ada Lovelace said, "Machines can compose music." '
                        '"I rather doubt it," said Charles Babbage.',
                        "No quotes here, just said nothing.",
                    )
                ).select("url", "speaker", "quote", "shape").collect(),
            )
        )
        assert got == [
            ("u0", "Ada Lovelace", "Machines can compose music.", "forward"),
            ("u0", "Charles Babbage", "I rather doubt it", "inverted"),
        ]

    def test_miners_pure_map(self, spark):
        from kg.ops.timex import extract_coords, extract_quotes

        d = _docs(spark, "x")
        for df in (extract_coords(d), extract_quotes(d)):
            p = df._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in p
            assert "MapInPandas" not in p and "BatchEvalPython" not in p


class TestGeoNearJoin:
    def test_matches_brute_force_on_hash_points(self, spark):
        """Banded join == brute-force haversine on md5-derived points,
        including a pair straddling the antimeridian."""
        import hashlib
        import math

        from kg.ops.timex import geo_near_join

        pts = []
        for i in range(120):
            h = hashlib.md5(f"geo{i}".encode()).hexdigest()
            lat = (int(h[:6], 16) % 12000) / 100.0 - 60.0
            lon = (int(h[6:12], 16) % 36000) / 100.0 - 180.0
            pts.append((i, lat, lon))
        # explicit antimeridian pair ~50km apart at lat 10
        pts.append((900, 10.0, 179.8))
        pts.append((901, 10.0, -179.75))
        df = spark.createDataFrame(pts, "id long, lat double, lon double")
        got = {
            (r.id_a, r.id_b): r.dist_km
            for r in geo_near_join(df, 200.0).collect()
        }

        def hav(a, b):
            la1, lo1, la2, lo2 = map(
                math.radians, (a[1], a[2], b[1], b[2])
            )
            x = (
                math.sin((la2 - la1) / 2) ** 2
                + math.cos(la1) * math.cos(la2)
                * math.sin((lo2 - lo1) / 2) ** 2
            )
            return 2 * 6371.0088 * math.asin(math.sqrt(x))

        want = {}
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                a, b = pts[i], pts[j]
                d = hav(a, b)
                if round(d, 6) <= 200.0:
                    key = (min(a[0], b[0]), max(a[0], b[0]))
                    want[key] = round(d, 6)
        assert got.keys() == want.keys()
        assert (900, 901) in got  # wraparound candidate survived banding
        for k in want:
            assert abs(got[k] - want[k]) < 1e-6

    def test_cell_cap_drops_boilerplate_coordinate(self, spark):
        from kg.ops.timex import geo_near_join

        rows = [(i, 0.0, 0.0) for i in range(50)] + [
            (100, 45.0, 45.0), (101, 45.1, 45.1)
        ]
        df = spark.createDataFrame(rows, "id long, lat double, lon double")
        got = geo_near_join(df, 100.0, cell_cap=10).collect()
        ids = {r.id_a for r in got} | {r.id_b for r in got}
        assert ids == {100, 101}  # the (0,0) pile was capped away
