"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md).

Generates the ``pages`` input table (url, warc_ts, html, text, lang) plus the
gazetteer / regex / alias dimension tables and oracle-computed golden outputs
(expected mentions and triples). Everything is seeded — same seed, same
bytes — so the byte-identical-extraction and P/R gates are reproducible.

The html template embeds boilerplate (<nav>/<footer>) around <p> sentences;
``kg.textextract.extract_text`` recovers exactly the <p> sentences joined by
"\\n", which is stored in the ``text`` column as the golden.
"""

from __future__ import annotations

import datetime as _dt
import random
from html import escape

import pandas as pd

from kg import openie, oracle

# ---- dimension data (canonical fixture dictionaries, FIXTURES.md §2-3) ----

GAZETTEER_DATA: dict[str, list[str]] = {
    "CakeSize": ["Large", "Medium", "Tiny"],
    "CakeType": ["Carrot", "Chocolate", "Coffee", "Sponge"],
    "Drinks": ["Coffee", "Beer", "Red Wine", "White Wine", "Coke", "Diet Coke"],
    "Biscuit": ["Rich Tea", "Digestive", "Chocolate"],
    "cars": ["Fiesta", "Focus", "Golf"],
    "fruits": ["Apple", "Banana", "Pear"],
    "alarms": ["a210", "a211", "a212"],
}

REGEX_DATA: dict[str, str] = {
    "CakeSizeRegex": "^[Ll].+$",
    "CakeTypeRegex": "^[Cc].+$",
    "ralarms": r"[A]\d{3}$",
}

# entity-linking dictionary: alias surface -> (entity_id, canonical).
# Alias groups share token overlap so MinHash blocking + connected components
# have known ground-truth components (FIXTURES.md §6).
ALIAS_GROUPS: list[tuple[int, str, list[str]]] = [
    (1, "Acme Corporation", ["Acme Corporation", "Acme Corp", "Acme", "ACME"]),
    (2, "Globex", ["Globex", "Globex Inc", "globex"]),
    (3, "Initech", ["Initech", "initech ltd"]),
    (4, "Stark Industries", ["Stark Industries", "Stark Industries Inc"]),
    (5, "Hooli", ["Hooli", "hooli"]),
    (6, "Ada Lovelace", ["Ada Lovelace", "A. Lovelace", "Lovelace"]),
    (7, "Alan Turing", ["Alan Turing", "A. Turing", "Turing"]),
    (8, "Grace Hopper", ["Grace Hopper", "G. Hopper"]),
    (9, "London", ["London", "london"]),
    (10, "Paris", ["Paris"]),
    (11, "Cambridge", ["Cambridge"]),
    (12, "Diet Coke", ["Diet Coke", "diet coke", "Coke"]),
    (13, "Red Wine", ["Red Wine", "red wine"]),
    (14, "Coffee", ["Coffee", "coffee"]),
]

# Zipf-ish hot subjects: a small set appearing in ~30% of SVO sentences —
# this is the head-entity skew the salted linking join must absorb.
HOT_SUBJECTS = ["Acme Corporation", "Coffee", "London"]

_SVO_TEMPLATES = [
    ("{s} founded {o}", "founded"),
    ("{s} acquired {o}", "acquired"),
    ("{s} is located in {o}", "located_in"),
    ("{s} works for {o}", "works_for"),
    ("{s} was born in {o}", "born_in"),
    ("{s} is the CEO of {o}", "ceo_of"),
    ("{s} is part of {o}", "part_of"),
    ("{s} produces {o}", "produces"),
]

_GAZ_TEMPLATES = [
    "I want a {v} cake",
    "Order a {v} today",
    "She asked for {v} with breakfast",
    "We served {v} at the party",
    "Maybe some {v}, or not",
]

_DISTRACTORS = [
    "The weather stayed calm all afternoon",
    "Nothing interesting happened on the way home",
    "Please close the door when you leave",
    "The report is due at the end of the quarter",
    "General remarks follow in the appendix",
]

_TOKEN_EDGE_CASES = [
    "hi",
    "Fred Bloggs rules OK",
    "set alarm 12345",
    "12345",
    "123.45",
    "1,234.50",
]

_LANGS = ["en", "en", "en", "en", "es", "fr", "it", "pt"]  # en weight 0.5+

_EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)


def _alias_surfaces() -> list[str]:
    out = []
    for _eid, _canon, aliases in ALIAS_GROUPS:
        out.extend(aliases)
    return out


def _gaz_values() -> list[str]:
    out = []
    for values in GAZETTEER_DATA.values():
        out.extend(values)
    return out


def make_sentences(
    rng: random.Random, sentence_range: tuple[int, int] = (2, 5)
) -> list[str]:
    """Sentences per page (default 2-5), mixing gazetteer/SVO/distractor/edge."""
    n = rng.randint(*sentence_range)
    sentences = []
    aliases = _alias_surfaces()
    gvals = _gaz_values()
    for _ in range(n):
        roll = rng.random()
        if roll < 0.35:
            sentences.append(rng.choice(_GAZ_TEMPLATES).format(v=rng.choice(gvals)))
        elif roll < 0.75:
            tmpl, _pred = rng.choice(_SVO_TEMPLATES)
            if rng.random() < 0.30:
                s = rng.choice(HOT_SUBJECTS)
            else:
                s = rng.choice(aliases)
            o = rng.choice(aliases)
            sentences.append(tmpl.format(s=s, o=o))
        elif roll < 0.95:
            sentences.append(rng.choice(_DISTRACTORS))
        else:
            sentences.append(rng.choice(_TOKEN_EDGE_CASES))
    return sentences


#: external hosts linked from footers — the cross-site edges of the link graph
EXTERNAL_HOSTS = ("wiki.test", "news.test", "cdn.test")


def page_html(doc_id: int, sentences: list[str]) -> bytes:
    """Page HTML with a deterministic link structure (doc_id-derived, so the
    link graph is reproducible without an RNG):

    - nav: a relative next-page link and a relative jump link carrying a
      tracking param (exercises resolution + utm stripping),
    - first paragraph: the first word wrapped in a fragment-only anchor —
      inside ``<p>`` but TEXT-PRESERVING, so ``extract_text`` byte-identity
      (BASELINE.json input_hint) is unaffected,
    - footer: an absolute link to one of three external hosts.
    """
    paras = []
    for i, s in enumerate(sentences):
        esc = escape(s)
        if i == 0:
            head, sep, rest = esc.partition(" ")
            esc = f'<a href="#s0">{head}</a>{sep}{rest}'
        paras.append(f"<p>{esc}</p>")
    ext = EXTERNAL_HOSTS[doc_id % len(EXTERNAL_HOSTS)]
    html = (
        f"<html><head><title>t{doc_id}</title>"
        f"<script>var x={doc_id};</script></head>"
        f"<body><nav>site navigation boilerplate"
        f' <a href="/{doc_id + 1:08d}">next</a>'
        f' <a href="/{doc_id * 2 + 1:08d}?utm_source=nav&page={doc_id % 9}">'
        f"jump</a></nav>"
        f"{''.join(paras)}"
        f"<footer>copyright boilerplate {doc_id % 7}"
        f' <a href="https://{ext}/ref/{doc_id % 53}">source</a></footer>'
        f"</body></html>"
    )
    return html.encode("utf-8")


def gen_pages(
    n_docs: int, seed: int = 42, sentence_range: tuple[int, int] = (2, 5)
) -> pd.DataFrame:
    """Generate the pages table as a pandas DataFrame (deterministic)."""
    rng = random.Random(seed)
    rows = []
    for doc_id in range(n_docs):
        sentences = make_sentences(rng, sentence_range)
        html = page_html(doc_id, sentences)
        rows.append(
            {
                "url": f"https://ex{seed}.test/{doc_id:08d}",
                "warc_ts": _EPOCH + _dt.timedelta(seconds=doc_id),
                "html": html,
                "text": "\n".join(sentences),
                "lang": rng.choice(_LANGS),
            }
        )
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    # microsecond precision: Spark's parquet reader rejects TIMESTAMP(NANOS),
    # which is what pandas' default ns dtype writes
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us, UTC]")
    return df


def gazetteer_df() -> pd.DataFrame:
    from kg.normalize import norm_value

    rows = [
        {"entity_name": name, "value": v, "value_norm": norm_value(v)}
        for name, values in GAZETTEER_DATA.items()
        for v in values
    ]
    return pd.DataFrame(rows)


def regex_df() -> pd.DataFrame:
    return pd.DataFrame(
        [{"entity_name": k, "pattern": v} for k, v in REGEX_DATA.items()]
    )


def alias_df() -> pd.DataFrame:
    from kg.normalize import norm_value

    rows = []
    for eid, canon, aliases in ALIAS_GROUPS:
        for a in aliases:
            rows.append(
                {
                    "alias": a,
                    "alias_norm": norm_value(a),
                    "entity_id": eid,
                    "canonical": canon,
                }
            )
    return pd.DataFrame(rows)


def expected_mentions(pages: pd.DataFrame) -> pd.DataFrame:
    """Oracle mentions for every page: (url, matched_word, entity_name, detector)."""
    gaz = oracle.build_gazetteer(GAZETTEER_DATA)
    rx = oracle.compile_regexes(REGEX_DATA)
    rows = []
    for url, text in zip(pages["url"], pages["text"]):
        for word, name, det in oracle.find_entities_rows(text, gaz, rx):
            rows.append(
                {"url": url, "matched_word": word, "entity_name": name, "detector": det}
            )
    return pd.DataFrame(rows, columns=["url", "matched_word", "entity_name", "detector"])


def expected_triples(pages: pd.DataFrame) -> pd.DataFrame:
    """Oracle triples for every page: (url, subj, pred, obj)."""
    rows = []
    for url, text in zip(pages["url"], pages["text"]):
        for subj, pred, obj in openie.extract_triples(text):
            rows.append({"url": url, "subj": subj, "pred": pred, "obj": obj})
    return pd.DataFrame(rows, columns=["url", "subj", "pred", "obj"])


def expected_tokens(pages: pd.DataFrame) -> pd.DataFrame:
    """Oracle tokenizer output per page: (url, tokens_joined)."""
    from kg.tokenize import tokenize

    rows = [
        {
            "url": url,
            "tokens_joined": " ".join(tokenize(text, True, "large", lang)),
        }
        for url, text, lang in zip(pages["url"], pages["text"], pages["lang"])
    ]
    return pd.DataFrame(rows, columns=["url", "tokens_joined"])


def edges_df(n_chains: int = 30, seed: int = 42) -> pd.DataFrame:
    """Deterministic graph fixture for connected components: ``n_chains``
    components of varied shape (chains, rings, stars) over disjoint id
    ranges, plus cross-links inside each component only — so the true
    component of every node is the minimum id of its chain. The DuckDB
    oracle recomputes components independently via a recursive-CTE
    transitive closure (different algorithm, genuine cross-check)."""
    import random

    rng = random.Random(seed)
    rows: list[tuple[int, int]] = []
    base = 0
    for c in range(n_chains):
        size = rng.randint(2, 9)
        ids = list(range(base, base + size))
        shape = c % 3
        if shape == 0:  # chain
            rows += [(ids[i], ids[i + 1]) for i in range(size - 1)]
        elif shape == 1:  # ring
            rows += [(ids[i], ids[(i + 1) % size]) for i in range(size)]
        else:  # star
            rows += [(ids[0], ids[i]) for i in range(1, size)]
        # a couple of redundant intra-component links, random orientation
        for _ in range(min(2, size - 1)):
            a, b = rng.sample(ids, 2)
            rows.append((a, b))
        base += size + rng.randint(0, 2)  # gaps -> ids absent from the graph
    return pd.DataFrame(rows, columns=["src", "dst"]).astype("int64")


def redirects_df() -> pd.DataFrame:
    """Deterministic redirect-edge fixture for resolve_redirects: 12 chains
    of length 1..5 ending at a terminal url, a 3-cycle, a self-loop (not a
    redirect — dropped), a duplicate-src pair (functional violation — the
    min dst wins), and a 40-hop chain exceeding the default max_hops=32
    (terminal but unresolvable within budget)."""
    rows: list[tuple[str, str]] = []
    for c in range(12):
        length = (c % 5) + 1
        for i in range(length):
            nxt = (
                f"http://r{c}.example/hop{i + 1}"
                if i + 1 < length
                else f"http://final{c}.example/"
            )
            rows.append((f"http://r{c}.example/hop{i}", nxt))
    rows += [
        ("http://cyc.example/0", "http://cyc.example/1"),
        ("http://cyc.example/1", "http://cyc.example/2"),
        ("http://cyc.example/2", "http://cyc.example/0"),
        ("http://self.example/", "http://self.example/"),
        ("http://dup.example/", "http://zzz.example/"),
        ("http://dup.example/", "http://aaa.example/"),
    ]
    rows += [
        (f"http://long.example/{i}", f"http://long.example/{i + 1}")
        for i in range(40)
    ]
    return pd.DataFrame(rows, columns=["src_url", "dst_url"])


def media_df(n: int = 60, seed: int = 42) -> pd.DataFrame:
    """Media fixture WITH generation-time ground truth: the payload header
    is parsed by the query under test; the truth columns (width/height/
    channels/n_frames) are written independently at generation time."""
    from kg.ops.multimodal import synth_media

    pdf = synth_media(n, seed=seed)
    truths = []
    for payload in pdf["payload"]:
        import struct as _s

        if bytes(payload[:4]) == b"FIMG":
            w, h, c = _s.unpack(">HHB", bytes(payload[4:9]))
            truths.append((w, h, c, 0))
        else:
            nf, w, h = _s.unpack(">HHH", bytes(payload[4:10]))
            truths.append((w, h, 0, nf))
    pdf[["width", "height", "channels", "n_frames"]] = pd.DataFrame(truths)
    pdf["n_bytes"] = [len(p) for p in pdf["payload"]]
    return pdf


# custom phrase patterns for the O3/O4 gate: "fred bloggs" collides with the
# backend's PERSON gazetteer at equal token length (tie -> custom wins);
# "diet coke" and "alarm" have no NER overlap (pure adds)
CUSTOM_ENTITIES: dict[str, str] = {
    "fred bloggs": "vip_user",
    "diet coke": "menu_item",
    "alarm": "device",
}


def expected_ner(
    pages: pd.DataFrame, custom_entities: dict[str, str] | None = None
) -> pd.DataFrame:
    """Oracle NER mentions per page via the single-node detect backend:
    (url, value, label, category, start, end)."""
    from kg.detect import detect
    from kg.textextract import extract_text

    rows = []
    for url, html, lang in zip(pages["url"], pages["html"], pages["lang"]):
        for m in detect(extract_text(html), lang=lang, custom_entities=custom_entities):
            rows.append((url, m.value, m.label, m.category, m.start, m.end))
    return pd.DataFrame(
        rows, columns=["url", "value", "label", "category", "start", "end"]
    )


def materialize(outdir: str, sizes: dict[str, int] | None = None, seed: int = 42) -> None:
    """Write fixture parquet files: pages_{name}.parquet + dims + goldens."""
    import pathlib

    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    sizes = sizes or {"tiny": 100, "small": 10_000}
    gazetteer_df().to_parquet(out / "gazetteer.parquet", index=False)
    regex_df().to_parquet(out / "regex_entities.parquet", index=False)
    alias_df().to_parquet(out / "alias_dict.parquet", index=False)
    for name, n in sizes.items():
        pages = gen_pages(n, seed=seed)
        pages.to_parquet(out / f"pages_{name}.parquet", index=False)
        expected_mentions(pages).to_parquet(
            out / f"expected_mentions_{name}.parquet", index=False
        )
        expected_triples(pages).to_parquet(
            out / f"expected_triples_{name}.parquet", index=False
        )
        expected_tokens(pages).to_parquet(
            out / f"expected_tokens_{name}.parquet", index=False
        )
    materialize_extras(outdir, seed=seed)


def materialize_extras(outdir: str, seed: int = 42) -> None:
    """Graph/media/NER fixtures added after the original set — separate entry
    so the original committed fixtures are never rewritten."""
    import pathlib

    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    edges_df(seed=seed).to_parquet(out / "edges.parquet", index=False)
    media_df(seed=seed).to_parquet(out / "media.parquet", index=False)
    redirects_df().to_parquet(out / "redirects.parquet", index=False)
    pages = pd.read_parquet(out / "pages_tiny.parquet")
    expected_ner(pages).to_parquet(out / "expected_ner_tiny.parquet", index=False)
    expected_ner(pages, CUSTOM_ENTITIES).to_parquet(
        out / "expected_custom_ner_tiny.parquet", index=False
    )


if __name__ == "__main__":
    import sys

    materialize(sys.argv[1] if len(sys.argv) > 1 else "fixtures")
