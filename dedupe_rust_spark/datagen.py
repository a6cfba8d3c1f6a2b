"""Deterministic synthetic `pages` + `labeled_pairs` generator (FIXTURES.md).

Seeded (42), pure-Python (no Spark) so tests, the DuckDB oracle and the
bench harness all see byte-identical inputs. Raw text material is sampled
from the driver's read-only /root/testdata/sf*/documents.parquet.

Row classes (FIXTURES.md §1): 60% unique, 15% exact dups (incl. a hot
boilerplate key for skew), 15% near dups in similarity tiers, 5% cross-host
exact copies, 5% adversarial same-title non-dups; ~2% null/garbage/empty html.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta, timezone

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.textcore import render_html

GEN_VERSION = "4"
EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc)
N_HOSTS = 50


def _hosts(rng: random.Random) -> list[str]:
    return [f"host{i:02d}.example.com" for i in range(N_HOSTS)]


def _zipf_host(rng: random.Random, hosts: list[str]) -> str:
    # Zipf-ish: rank r with probability ~ 1/(r+1)
    r = min(int(rng.paretovariate(1.1)) - 1, len(hosts) - 1)
    return hosts[r]


def _doc_rows(sf_dir: str) -> list[tuple[int, str, str]]:
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text", "lang"])
    df = tbl.to_pandas().sort_values("doc_id")
    return list(df.itertuples(index=False, name=None))


def _paragraphs(text: str) -> list[str]:
    words = text.split()
    if not words:
        return ["empty document body"]
    out, chunk = [], 18
    for i in range(0, len(words), chunk):
        out.append(" ".join(words[i : i + chunk]))
    return out


def _title(words: list[str], doc_id: int) -> str:
    return " ".join(words[:6]) + f" #{doc_id}"


def _edit_words(rng: random.Random, words: list[str], frac: float,
                vocab: list[str]) -> list[str]:
    """Substitute ~frac of words at distinct indices, each a guaranteed
    real change; deterministic given rng state."""
    out = list(words)
    n_edit = min(max(1, int(len(words) * frac)), len(out))
    for i in rng.sample(range(len(out)), n_edit):
        w = rng.choice(vocab)
        while w == out[i]:
            w = rng.choice(vocab)
        out[i] = w
    return out


class _Builder:
    def __init__(self, seed: int):
        self.rng = random.Random(seed)
        self.rows: list[dict] = []
        self.by_url: dict[str, int] = {}
        self.pairs: list[tuple[str, str, bool, str]] = []
        self.hosts = _hosts(self.rng)
        self.i = 0

    def url(self, host: str, slug: str) -> str:
        u = f"https://{host}/{slug}-{self.i}.html"
        self.i += 1
        return u

    def add_page(self, host: str, slug: str, title: str, paras: list[str],
                 lang: str, html_override: bytes | None = ...) -> str:
        url = self.url(host, slug)
        if html_override is ...:
            html = render_html(title, paras)
            text = "\n\n".join([title] + [p for p in paras if p.strip()])
        else:
            html = html_override
            text = None
        self.by_url[url] = len(self.rows)
        self.rows.append(
            {
                "url": url,
                "warc_ts": EPOCH + timedelta(seconds=self.i),
                "html": html,
                "text": text,
                "lang": lang,
            }
        )
        return url

    def add_copy(self, src_row_url: str, host: str, slug: str) -> str:
        src = self.rows[self.by_url[src_row_url]]
        url = self.url(host, slug)
        self.by_url[url] = len(self.rows)
        self.rows.append({**src, "url": url,
                          "warc_ts": EPOCH + timedelta(seconds=self.i)})
        return url

    def pair(self, a: str, b: str, is_dup: bool, tier: str) -> None:
        if a > b:
            a, b = b, a
        self.pairs.append((a, b, is_dup, tier))


def generate(sf_dir: str, n_rows: int | None = None, seed: int = 42,
             constant_family: bool = False
             ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build (pages_df, labeled_pairs_df). Deterministic in
    (sf_dir, n_rows, seed, constant_family).

    constant_family=True (round 6 — the r5 verdict's scaling-corpus ask):
    from the second cycle over the base documents on, each visit's body is
    decorrelated from the base doc by a deterministic ~45% word
    substitution BEFORE families are built. In the default mode every
    visit of the same base doc is a near-dup of every other visit, so
    family (and LSH block) sizes grow ~linearly with n_rows — a
    super-linear pair density that belongs to the generator, not the
    plan. With constant families, cross-visit similarity sits far below
    every match threshold (~45% word edits kill ~3x that fraction of
    word-3-shingles), so dup/near-dup family sizes are set by the
    per-visit roll alone and stay CONSTANT in n_rows — the corpus a
    shuffle-bytes-per-doubling measurement needs."""
    docs = _doc_rows(sf_dir)
    if n_rows is None:
        n_rows = 2 * len(docs)
    b = _Builder(seed)
    rng = b.rng
    vocab = sorted({w for _, t, _ in docs[:200] for w in t.split()})[:2000]
    if not vocab:
        vocab = ["alpha", "beta", "gamma"]

    # hot boilerplate family: ~2% of N exact copies of one template (skew)
    hot_n = max(3, int(0.02 * n_rows))
    hot_paras = ["all rights reserved contact us terms of service privacy"] * 3
    hot_urls = []
    for k in range(hot_n):
        host = _zipf_host(rng, b.hosts)
        if not hot_urls:
            u = b.add_page(host, "boilerplate", "Site Notice", hot_paras, "en")
        else:
            u = b.add_copy(hot_urls[0], host, "boilerplate")
        hot_urls.append(u)
    for k in range(1, min(len(hot_urls), 40)):  # cap the O(m^2) label blowup
        b.pair(hot_urls[0], hot_urls[k], True, "exact")

    di = 0
    while len(b.rows) < n_rows:
        doc_id, text, lang = docs[di % len(docs)]
        di += 1
        words = text.split() or ["empty", "doc"]
        if constant_family and di > len(docs):
            # decorrelate this visit from every other visit of the same
            # base doc (see docstring) — the visit's own family below is
            # then built from the decorrelated body as usual
            words = _edit_words(rng, words, 0.45, vocab)
        title = _title(words, doc_id) + (f" v{di}" if di > len(docs) else "")
        paras = _paragraphs(" ".join(words))
        host = _zipf_host(rng, b.hosts)
        slug = f"doc{doc_id}"
        roll = rng.random()

        if roll < 0.60:  # unique
            u = b.add_page(host, slug, title, paras, lang)
            # ~2% of uniques get degraded html (null / garbage / empty)
            r2 = rng.random()
            if r2 < 0.01:
                b.rows[-1]["html"] = None
                b.rows[-1]["text"] = None
            elif r2 < 0.015:
                b.rows[-1]["html"] = bytes(rng.getrandbits(8) for _ in range(64))
                b.rows[-1]["text"] = None
            elif r2 < 0.02:
                b.rows[-1]["html"] = b""
                b.rows[-1]["text"] = None
        elif roll < 0.75:  # exact-dup family on (mostly) the same host
            u0 = b.add_page(host, slug, title, paras, lang)
            for c in range(rng.randint(1, 3)):
                uc = b.add_copy(u0, host, f"{slug}copy{c}")
                b.pair(u0, uc, True, "exact")
        elif roll < 0.90:  # near-dup family
            u0 = b.add_page(host, slug, title, paras, lang)
            frac = rng.choice([0.03, 0.10, 0.25])
            n_tot = len(title.split()) + len(words)
            for c in range(rng.randint(1, 2)):
                # edit count targets a fraction of TOTAL tokens (title incl.)
                n_edit = min(max(1, round(frac * n_tot)), len(words))
                ew = _edit_words(rng, words, n_edit / len(words), vocab)
                uc = b.add_page(host, f"{slug}near{c}", title,
                                _paragraphs(" ".join(ew)), lang)
                # Label by MEASURED token-level similarity of the full texts
                # (title included) — short docs make intended-frac labels lie.
                n_diff = sum(1 for x, y in zip(words, ew) if x != y)
                sim = 1.0 - n_diff / n_tot
                if 0.82 < sim < 0.88:
                    continue  # boundary band: row kept, pair left unlabeled
                tier = ("near_high" if sim >= 0.95 else
                        "near_mid" if sim >= 0.88 else
                        "near_low" if sim >= 0.70 else "negative")
                b.pair(u0, uc, sim >= 0.88, tier)
        elif roll < 0.95:  # cross-host exact copies
            u0 = b.add_page(host, slug, title, paras, lang)
            for c in range(rng.randint(1, 2)):
                other = rng.choice([h for h in b.hosts if h != host])
                uc = b.add_copy(u0, other, f"{slug}x{c}")
                b.pair(u0, uc, True, "exact")
        else:  # adversarial: same host + same title, different body
            u0 = b.add_page(host, slug, title, paras, lang)
            alt = _edit_words(rng, words, 0.95, vocab)
            u1 = b.add_page(host, f"{slug}adv", title,
                            _paragraphs(" ".join(alt)), lang)
            b.pair(u0, u1, False, "negative")

    # Random negative pairs, ~3x positives. Two rows derived from the SAME
    # base doc may legitimately be near-dups even across "families" (the
    # generator cycles docs), so negatives must come from different base
    # docs — base key is the leading "docNN"/"boilerplate" slug in the url.
    import re as _re

    def _base(u: str) -> str:
        m = _re.search(r"/((?:doc\d+)|boilerplate)", u)
        return m.group(1) if m else u

    pos = [p for p in b.pairs if p[2]]
    urls = [r["url"] for r in b.rows]
    want = 3 * len(pos)
    tries = 0
    neg_seen: set[tuple[str, str]] = set()
    while len(neg_seen) < want and tries < 20 * want:
        tries += 1
        a, c = rng.choice(urls), rng.choice(urls)
        if a == c or _base(a) == _base(c):
            continue
        key = (min(a, c), max(a, c))
        neg_seen.add(key)
    for a, c in sorted(neg_seen):
        b.pair(a, c, False, "negative")

    pages = pd.DataFrame(b.rows)
    pairs = pd.DataFrame(b.pairs, columns=["url_a", "url_b", "is_dup", "tier"])
    pairs = pairs.drop_duplicates(["url_a", "url_b"]).reset_index(drop=True)
    return pages, pairs


_PA_PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def materialize(sf_dir: str, out_dir: str, n_rows: int | None = None,
                seed: int = 42, force: bool = False,
                constant_family: bool = False) -> tuple[str, str]:
    """Write pages.parquet + labeled_pairs.parquet under out_dir (cached)."""
    os.makedirs(out_dir, exist_ok=True)
    pages_path = os.path.join(out_dir, "pages.parquet")
    pairs_path = os.path.join(out_dir, "labeled_pairs.parquet")
    cf = "_cf" if constant_family else ""
    stamp = os.path.join(out_dir,
                         f".stamp_v{GEN_VERSION}_s{seed}_n{n_rows}{cf}")
    if not force and os.path.exists(stamp):
        return pages_path, pairs_path
    # regenerating: drop every other stamp so a dir can never satisfy two
    # different (version, seed, n_rows) requests at once (stale-cache trap)
    for f in os.listdir(out_dir):
        if f.startswith(".stamp_"):
            os.unlink(os.path.join(out_dir, f))
    pages, pairs = generate(sf_dir, n_rows=n_rows, seed=seed,
                            constant_family=constant_family)
    tbl = pa.Table.from_pandas(pages, schema=_PA_PAGES, preserve_index=False)
    # small row groups => the scan splits across tasks (a single row group
    # would make the html read single-threaded in Spark)
    pq.write_table(tbl, pages_path, row_group_size=8192)
    pq.write_table(pa.Table.from_pandas(pairs, preserve_index=False), pairs_path)
    with open(stamp, "w") as f:
        f.write(GEN_VERSION)
    return pages_path, pairs_path


def pages_dir_for(sf_dir: str, n_rows: int | None = None, seed: int = 42,
                  constant_family: bool = False) -> str:
    """Default cache location for a given sf_dir, under the repo. The seed
    and the constant_family mode are part of the directory tag so
    concurrent variants never share a cache dir."""
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".data")
    tag = os.path.basename(os.path.normpath(sf_dir)) + (
        f"_n{n_rows}" if n_rows else ""
    ) + (f"_s{seed}" if seed != 42 else "") + (
        "_cf" if constant_family else "")
    out = os.path.abspath(os.path.join(base, tag))
    materialize(sf_dir, out, n_rows=n_rows, seed=seed,
                constant_family=constant_family)
    return out
