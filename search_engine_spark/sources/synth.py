"""Deterministic synthetic `pages` corpus (FIXTURES.md §1-§3).

Schema (BASELINE.json input_hint):
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Every page is a pure function of ``(page_id, n_pages)`` — seed 42 baked in —
so the corpus is identical regardless of scale-out, partitioning, or whether
it is generated distributed (``synth_pages_df``: spark.range -> mapInPandas,
pages are synthesized ON EXECUTORS, nothing large ever sits in the driver)
or locally (``synth_pages_local``: the same record function in a loop, used
by the pure-Python oracle).

Fixture design points exercised (FIXTURES.md):
- Zipf(s=1.1) term draws over vocab w0000..w1999 -> head-term skew
- 40 real stopwords + punctuation-rich tokens (don't, x-y_z, v1.2.3, café,
  naïve) -> tokenizer regex parity incl. unicode \\w
- log-normal doc lengths, plus empty docs / all-stopword docs /
  single-char-token docs / ~2% near-duplicates (score ties)
- planted rare terms (df=1,2) and a >N/2-frequency term (negative IDF ->
  epsilon floor)
- `text` column DERIVED from `html` via the engine's own extractor, so the
  byte-identity invariant is enforced by construction and tested.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from search_engine_spark.functions.html_extract import extract_text_py

SEED = 42
VOCAB_SIZE = 2000
_EPOCH = datetime(2024, 11, 13, 0, 0, 0, tzinfo=timezone.utc)

# 40 stopwords sampled (deterministically: every 10th) from the vendored list
def _sample_stopwords() -> list[str]:
    from search_engine_spark.config import load_stopwords

    alpha = sorted(w for w in load_stopwords() if w.isalpha())
    return alpha[:: max(1, len(alpha) // 40)][:40]


PUNCT_TOKENS = [
    "don't", "x-y_z", "v1.2.3", "café", "naïve", "re-index", "state-of-the-art",
    "C++", "foo.bar", "a_b", "über", "80%", "e.g.", "i.e.", "rock'n'roll",
    "semi;colon", "quo\"te", "tab\tchar", "tilde~", "amp&ersand",
]

# Zipf(s=1.1) pmf over the vocabulary (shared, precomputed once per process)
_ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_ZIPF_P = (1.0 / _ranks**1.1) / np.sum(1.0 / _ranks**1.1)
_VOCAB = np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)])

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def _body_tokens(page_id: int, n_pages: int) -> list[str]:
    """The token stream of a page body (pure function of page_id)."""
    # near-duplicates: ~2% of pages replicate the previous page's body
    if page_id % 50 == 1 and page_id > 1:
        return _body_tokens(page_id - 1, n_pages)
    if page_id % 97 == 0:
        return []  # empty doc
    rng = np.random.RandomState((SEED * 1_000_003 + page_id) % (2**31 - 1))
    stop = _sample_stopwords()
    if page_id % 101 == 5:
        # all-stopword doc: tokenizes to nothing -> doc_len 0
        return list(rng.choice(stop, size=30))
    if page_id % 103 == 7:
        # single-char tokens only -> dropped by len<=1 filter
        return list(rng.choice(list("abcdefg"), size=40))
    length = max(5, int(rng.lognormal(mean=math.log(300), sigma=0.6)))
    words = list(_VOCAB[rng.choice(VOCAB_SIZE, size=length, p=_ZIPF_P)])
    # sprinkle stopwords (~20%) and punctuation-rich tokens (~2%)
    n_stop = length // 5
    pos = rng.choice(length, size=min(n_stop, length), replace=False)
    for p in pos:
        words[p] = stop[int(rng.randint(len(stop)))]
    for _ in range(max(1, length // 50)):
        words[int(rng.randint(length))] = PUNCT_TOKENS[int(rng.randint(len(PUNCT_TOKENS)))]
    # planted terms
    if page_id == 3:
        words.append("xylophonium")          # df = 1
    if page_id in (5, 7):
        words.append("quartzine")            # df = 2
    if page_id % 3 != 0:
        words.append("ubiquitone")           # df ≈ 2N/3 -> negative raw idf
    return words


def gen_page_record(page_id: int, n_pages: int) -> dict:
    """One deterministic page row (url, warc_ts, html, text, lang)."""
    rng = np.random.RandomState((SEED * 7_000_003 + page_id) % (2**31 - 1))
    section = f"s{page_id % 8}"
    url = f"https://synth.example/{section}/{page_id:06d}.html"
    title = f"Synth page {page_id} {section}"
    toks = _body_tokens(page_id, n_pages)
    body = " ".join(toks)
    n_h = int(rng.randint(0, 4))
    n_code = int(rng.randint(0, 3))
    n_links = int(rng.randint(0, 6))
    heads = "".join(f"<h2>heading {i} w{(page_id + i) % 100:04d}</h2>" for i in range(n_h))
    codes = "".join(f"<pre><code>code_block_{i}(x)</code></pre>" for i in range(n_code))
    links = "".join(
        f'<a href="https://synth.example/s{(page_id + i) % 8}/{(page_id * 31 + i * 7) % n_pages:06d}.html">doc {i}</a>'
        for i in range(n_links)
    )
    html = (
        f"<html><head><title>{title}</title>"
        f"<script>junk(); var x = 1 &amp;&amp; 2;</script><style>.x{{color:red}}</style></head>"
        f"<body><nav>{links}</nav><h1>{title}</h1>{heads}{codes}"
        f"<p>{body}</p><!-- comment ignored --></body></html>"
    ).encode("utf-8")
    lang = "en" if page_id % 20 < 19 else ("de" if page_id % 2 == 0 else "fr")
    return {
        "url": url,
        "warc_ts": _EPOCH + timedelta(seconds=page_id),
        "html": html,
        "text": extract_text_py(html),
        "lang": lang,
    }


def synth_pages_local(n_pages: int) -> list[dict]:
    return [gen_page_record(i, n_pages) for i in range(n_pages)]


def synth_pages_df(spark: SparkSession, n_pages: int, partitions: int | None = None) -> DataFrame:
    """Distributed generation: spark.range -> mapInPandas (Arrow batches)."""
    parts = partitions or min(64, max(4, n_pages // 2000))

    def gen(batches):
        for pdf in batches:
            rows = [gen_page_record(int(i), n_pages) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"]).dt.tz_localize(None)
            yield out

    return spark.range(0, n_pages, numPartitions=parts).mapInPandas(gen, PAGES_SCHEMA)


# ------------------------------------------------ skewed (web-realistic) pages
#
# The base corpus above draws every doc iid, which makes per-block BM25
# maxima FLAT (any 128 consecutive postings almost surely contain a
# near-max-scoring doc), so block-max pruning can never discard a block —
# the wrong instrument for measuring WAND. Real web corpora are not iid in
# doc-id order: crawl order groups pages by site, and sites share doc
# length, topical vocabulary, and spamminess. This variant reproduces that
# structure deterministically:
#
# - pages belong to SITES of 512 contiguous page ids; urls sort by site,
#   so the index's dense doc ids (and therefore posting blocks) inherit
#   site locality;
# - each site has a topic (a 32-term contiguous vocab slice), a lognormal
#   doc-length multiplier, and a 2% chance of being a spam farm;
# - normal pages draw ~60% of tokens from the site topic (per-term tf ~ 5)
#   and the rest from the global Zipf tail (tf ~ 1);
# - spam-farm pages repeat 8 focus terms of the topic ~37x each —
#   tf-saturated BM25 maxima that drive theta.
#
# Result: posting blocks of off-topic sites carry low maxima and are
# prunable once theta locks onto topical/spam blocks — the regime
# block-max WAND exists for. Pure perf fixture: text is generated
# directly (html is a thin wrapper; the byte-identity invariant is
# exercised by the base corpus, not this one).

SITE_PAGES = 512
N_TOPIC_TERMS = 32
SPAM_SITE_RATE = 0.02


def _skewed_tokens(page_id: int) -> list[str]:
    site = page_id // SITE_PAGES
    srng = np.random.RandomState((SEED * 11_000_003 + site) % (2**31 - 1))
    topic = int(srng.randint(0, VOCAB_SIZE // N_TOPIC_TERMS))
    len_mult = float(np.exp(srng.normal(0.0, 0.8)))
    is_spam = bool(srng.rand() < SPAM_SITE_RATE)
    rng = np.random.RandomState((SEED * 13_000_003 + page_id) % (2**31 - 1))
    base = topic * N_TOPIC_TERMS
    topic_vocab = _VOCAB[base : base + N_TOPIC_TERMS]
    if is_spam:
        focus = topic_vocab[rng.choice(N_TOPIC_TERMS, size=8, replace=False)]
        return list(focus[rng.randint(0, 8, size=300)])
    length = max(20, int(rng.lognormal(mean=math.log(250.0 * len_mult), sigma=0.4)))
    n_topic = int(length * 0.6)
    words = list(topic_vocab[rng.randint(0, N_TOPIC_TERMS, size=n_topic)])
    words += list(_VOCAB[rng.choice(VOCAB_SIZE, size=length - n_topic, p=_ZIPF_P)])
    return words


def gen_skewed_page_record(page_id: int) -> dict:
    site = page_id // SITE_PAGES
    url = f"https://site{site:06d}.example/{page_id:08d}.html"
    body = " ".join(_skewed_tokens(page_id))
    text = f"Synth skewed page {page_id} {body}"
    return {
        "url": url,
        "warc_ts": _EPOCH + timedelta(seconds=page_id),
        "html": f"<html><body><p>{text}</p></body></html>".encode("utf-8"),
        "text": text,
        "lang": "en",
    }


def synth_pages_skewed_df(
    spark: SparkSession, n_pages: int, partitions: int | None = None
) -> DataFrame:
    """Distributed skewed-corpus generation (same schema as pages)."""
    parts = partitions or min(64, max(4, n_pages // 2000))

    def gen(batches):
        for pdf in batches:
            rows = [gen_skewed_page_record(int(i)) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"]).dt.tz_localize(None)
            yield out

    return spark.range(0, n_pages, numPartitions=parts).mapInPandas(gen, PAGES_SCHEMA)


def synth_graph_edges(n_pages: int) -> tuple[list[dict], list[dict]]:
    """(nodes, edges) mirroring webpage_graph.json (FIXTURES.md §2).

    ~10% of pages get no node (doc weight defaults to 1.0); edge weights in
    [0.7, 1.68]; includes reciprocal pairs to exercise the undirected-dedup
    quirk (reference service/scrape_web.py:417-421).
    """
    rng = np.random.RandomState(SEED)
    nodes, edges = [], []
    for i in range(n_pages):
        if i % 10 == 9:
            continue  # no graph node
        url = f"https://synth.example/s{i % 8}/{i:06d}.html"
        nodes.append(
            {
                "id": str(i),
                "url": url,
                "title": f"Synth page {i}",
                "weight": float(0.5 + rng.rand()),
                "initial_rank": float(rng.rand()),
                "content_length": int(rng.randint(0, 12000)),
                "headers_count": int(rng.randint(0, 8)),
                "code_blocks": int(rng.randint(0, 15)),
                "outbound_links": int(rng.randint(0, 40)),
            }
        )
    ids = [n["id"] for n in nodes]
    for i, n in enumerate(nodes):
        deg = int(rng.randint(1, 6))
        for _ in range(deg):
            # preferential attachment toward low ids
            j = int(len(ids) * rng.rand() ** 2)
            if ids[j] != n["id"]:
                edges.append(
                    {"src": n["id"], "dst": ids[j], "weight": float(0.7 + 0.98 * rng.rand())}
                )
    # reciprocal pair to exercise undirected dedup
    if len(ids) >= 2:
        edges.append({"src": ids[0], "dst": ids[1], "weight": 1.0})
        edges.append({"src": ids[1], "dst": ids[0], "weight": 1.2})
    for i, e in enumerate(edges):
        e["seq"] = i  # encounter order (drives first-wins undirected dedup)
    return nodes, edges


# FIXTURES.md §3 — the reference query set (incl. the reference's own smoke
# query style "whta is padas, hw ues it?" — misspellings within Indel 80)
REFERENCE_QUERY_SET: list[str] = [
    "w0000 w0001",                       # head terms, multi-term
    "w0005, w0010? w0015!",              # punctuation cleanup
    "w0002 w0002 w0002",                 # repeated tokens (multiplicity)
    "the and of",                        # stopword-only (scores 0 via idf miss)
    "w000 w00111",                       # OOV misspellings, fuzzy-matchable
    "zzqqxx",                            # OOV, no fuzzy match >= 80
    "???",                               # empty after cleanup
    "xylophonium",                       # df=1 rare term, < k matches -> zero-pad
    "ubiquitone",                        # negative-idf term (epsilon floor)
    "w0042 quartzine don't",             # mixed rare + punct-rich
]


# ------------------------------------------------ multilingual lang-id corpus

# ~30 high-frequency words per language: enough character-trigram signal to
# train/evaluate lang-id profiles; deterministic word-salad docs below.
LANG_WORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "quick", "brown", "people", "would", "there", "their",
           "about", "which", "think", "other", "after", "first", "because",
           "government", "through", "world", "information", "making",
           "different", "important", "another", "question", "national",
           "something", "development", "interest", "between", "history",
           "without"),
    "de": ("der", "die", "und", "nicht", "werden", "haben", "einen",
           "deutschland", "menschen", "zwischen", "entwicklung", "geschichte",
           "wichtig", "andere", "frage", "regierung", "durch", "welt",
           "information", "machen", "unterschiedlich", "etwas", "interesse",
           "ohne", "immer", "schon", "jahre", "heute", "gegen", "leben"),
    "fr": ("le", "les", "des", "pour", "dans", "avec", "cette", "sont",
           "france", "gens", "serait", "leur", "autour", "lequel", "penser",
           "autre", "premier", "parce", "gouvernement", "travers", "monde",
           "information", "faire", "question", "nationale", "quelque",
           "entre", "histoire", "sans", "toujours"),
    "es": ("el", "los", "las", "para", "con", "esta", "son", "gente",
           "madrid", "entre", "desarrollo", "historia", "importante",
           "otro", "pregunta", "gobierno", "mundo", "informacion", "hacer",
           "diferente", "algo", "nacional", "interes", "sin", "siempre",
           "despues", "primero", "porque", "pensar", "vida"),
}


def gen_multilingual_record(lang: str, doc_id: int, words_per_doc: int = 40) -> dict:
    """One deterministic word-salad doc: pure function of (lang, doc_id)."""
    vocab = LANG_WORDS[lang]
    import zlib

    # zlib.crc32, not hash(): str hash is salted per process
    rng = np.random.RandomState(
        (SEED * 1_000_003 + zlib.crc32(lang.encode()) % 65_521 + doc_id) % (2**31 - 1)
    )
    words = [vocab[i] for i in rng.randint(0, len(vocab), words_per_doc)]
    return {"doc_id": doc_id, "lang": lang, "text": " ".join(words)}


def synth_multilingual_local(n_per_lang: int, words_per_doc: int = 40) -> list[dict]:
    out = []
    doc_id = 0
    for lang in sorted(LANG_WORDS):
        for _ in range(n_per_lang):
            out.append(gen_multilingual_record(lang, doc_id, words_per_doc))
            doc_id += 1
    return out


def synth_multilingual_df(
    spark: SparkSession, n_per_lang: int, words_per_doc: int = 40
) -> DataFrame:
    """(doc_id, lang, text) labeled multilingual corpus for lang-id
    training/eval; deterministic and identical at any parallelism."""
    return spark.createDataFrame(
        pd.DataFrame(synth_multilingual_local(n_per_lang, words_per_doc))
    )
