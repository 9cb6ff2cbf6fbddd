"""Deterministic synthetic fixtures (FIXTURES.md F1-F3). Seeded, no wall
clock, no external data.

- ``pages(n)``: the BASELINE.json input_hint corpus —
  (url, warc_ts, html, text, lang) with planted near-duplicate groups
  (Zipf-skewed sizes), exact copies, and long-shared-substring pairs.
  ``html`` is rendered from ``text`` by a fixed reversible template so that
  ``extract_text(html) == text`` byte-identically per url.
- ``people(n, overlap)``: voter-file-style linkage tables (reference
  example/Example.ipynb shape) with typo perturbations.
"""

from __future__ import annotations

import datetime as dt
import random

__all__ = [
    "pages",
    "people",
    "voters",
    "embeddings",
    "render_html",
    "extract_text",
    "VOCAB",
]

VOCAB = (
    "the a of to and in for on with data web page site user time year world "
    "news market report value system model index search query result link "
    "home about contact service product price review article story science "
    "health sport music film travel food city country state government"
).split()

_TEMPLATE_PRE = "<html><head><title>doc</title></head><body><p>"
_TEMPLATE_POST = "</p></body></html>"


def render_html(text: str) -> bytes:
    return (_TEMPLATE_PRE + text + _TEMPLATE_POST).encode("utf-8")


def extract_text(html: bytes) -> str:
    """Inverse of render_html — a pure function, byte-identical per url."""
    s = html.decode("utf-8")
    return s[len(_TEMPLATE_PRE) : len(s) - len(_TEMPLATE_POST)]


def _doc(rng: random.Random, n_tokens: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n_tokens))


def _mutate(rng: random.Random, text: str, rate: float) -> str:
    """Token-level mutation (swap/delete/insert) at the given rate."""
    toks = text.split()
    out = []
    for t in toks:
        r = rng.random()
        if r < rate / 3:
            continue  # delete
        if r < 2 * rate / 3:
            out.append(rng.choice(VOCAB))  # replace
            continue
        out.append(t)
        if r < rate:
            out.append(rng.choice(VOCAB))  # insert
    return " ".join(out) if out else text


def pages(
    n: int = 500,
    seed: int = 42,
    dup_fraction: float = 0.35,
    mutate_rate: float = 0.06,
    doc_tokens: tuple[int, int] = (30, 120),
):
    """Rows (url, warc_ts, html, text, lang) + ground truth.

    Returns (rows, truth_pairs, truth_clusters): rows is a list of dicts;
    truth_pairs is a set of (i, j) index pairs (i > j) that are planted
    duplicates of one another (same group); truth_clusters maps index ->
    group root index.
    """
    rng = random.Random(seed)
    langs = ["en", "en", "en", "de", "es", "fr", "zh"]
    base_ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    texts: list[str] = []
    group_of: list[int] = []
    i = 0
    while i < n:
        root_text = _doc(rng, rng.randint(*doc_tokens))
        texts.append(root_text)
        group_of.append(i)
        root = i
        i += 1
        if rng.random() < dup_fraction and i < n:
            # Zipf-skewed group size: mostly 1 copy, occasionally many
            size = min(max(1, int(rng.paretovariate(1.6))), 12, n - i)
            for k in range(size):
                r = rng.random()
                if r < 0.25:
                    copy = root_text  # exact copy
                elif r < 0.85:
                    copy = _mutate(rng, root_text, mutate_rate)  # near dup
                else:
                    # long shared substring: root text embedded in new noise
                    copy = (
                        _doc(rng, 10) + " " + root_text + " " + _doc(rng, 10)
                    )
                texts.append(copy)
                group_of.append(root)
                i += 1

    rows = []
    for idx, text in enumerate(texts):
        rows.append(
            {
                "doc_id": idx,
                "url": f"https://site{idx % 37}.example/p/{idx}",
                "warc_ts": base_ts + dt.timedelta(seconds=idx * 17),
                "html": render_html(text),
                "text": text,
                "lang": langs[idx % len(langs)],
            }
        )

    truth_pairs = set()
    by_group: dict[int, list[int]] = {}
    for idx, g in enumerate(group_of):
        by_group.setdefault(g, []).append(idx)
    for members in by_group.values():
        for x in range(len(members)):
            for y in range(x):
                truth_pairs.add((members[x], members[y]))
    truth_clusters = {idx: g for idx, g in enumerate(group_of)}
    return rows, truth_pairs, truth_clusters


_FIRST = "james mary john patricia robert jennifer michael linda william barbara".split()
_LAST = "smith johnson williams brown jones garcia miller davis rodriguez martinez".split()
_STREET = "main oak pine maple cedar elm washington lake hill park".split()


def embeddings(
    n: int = 400,
    dim: int = 32,
    n_clusters: int = 8,
    dup_frac: float = 0.3,
    dup_noise: float = 0.03,
    seed: int = 42,
):
    """Clustered unit embeddings with planted near-duplicates.

    Returns (rows, dup_pairs): rows are (vec_id, embedding: list[float],
    label); ``dup_frac`` of rows are a prior row plus gaussian noise of
    scale ``dup_noise`` (cosine ~0.995+ to their source), so semantic-dedup
    operators have a ground-truth-ish planted pair set. Deterministic."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = np.empty((n, dim))
    labels = np.empty(n, dtype=np.int64)
    dup_pairs: list[tuple[int, int]] = []
    for i in range(n):
        if i > 0 and rng.random() < dup_frac:
            src = int(rng.integers(0, i))
            v = vecs[src] + dup_noise * rng.standard_normal(dim)
            labels[i] = labels[src]
            dup_pairs.append((i, src))
        else:
            c = int(rng.integers(0, n_clusters))
            v = cents[c] + 0.35 * rng.standard_normal(dim)
            labels[i] = c
        vecs[i] = v / max(float(np.linalg.norm(v)), 1e-12)
    rows = [
        (i, [float(x) for x in vecs[i]], int(labels[i])) for i in range(n)
    ]
    return rows, dup_pairs


def _typo(rng: random.Random, s: str) -> str:
    if len(s) < 3:
        return s
    i = rng.randrange(len(s) - 1)
    op = rng.random()
    if op < 0.4:  # swap
        return s[:i] + s[i + 1] + s[i] + s[i + 2 :]
    if op < 0.7:  # drop
        return s[:i] + s[i + 1 :]
    return s[:i] + rng.choice("abcdefghijklmnopqrstuvwxyz") + s[i + 1 :]


def people(n: int = 300, overlap: float = 0.5, seed: int = 42, typo_rate: float = 0.5):
    """Two linkage tables with ``overlap * n`` shared entities (reference
    example shape: last_name first_name house_number street_name birth_year).
    Returns (rows_a, rows_b); each row dict carries the ground-truth ncid.
    """
    rng = random.Random(seed)

    def fresh(ncid):
        return {
            "ncid": f"e{ncid}",
            "last_name": rng.choice(_LAST) + rng.choice(_LAST)[:3],
            "first_name": rng.choice(_FIRST),
            "house_number": str(rng.randint(1, 9999)),
            "street_name": rng.choice(_STREET) + " " + rng.choice(["st", "ave", "rd"]),
            "birth_year": str(rng.randint(1940, 2005)),
        }

    n_shared = int(n * overlap)
    shared = [fresh(i) for i in range(n_shared)]
    rows_a = [dict(r) for r in shared] + [fresh(10_000 + i) for i in range(n - n_shared)]
    rows_b = []
    for r in shared:
        c = dict(r)
        if rng.random() < typo_rate:
            f = rng.choice(["last_name", "first_name", "street_name"])
            c[f] = _typo(rng, c[f])
        rows_b.append(c)
    rows_b += [fresh(20_000 + i) for i in range(n - n_shared)]
    rng.shuffle(rows_a)
    rng.shuffle(rows_b)
    return rows_a, rows_b


_SYL = (
    "son ber man ton vil gar mar lee ro da hal win ker ley ford "
    "bur ham mont wood stone field brook clay ash thorn bell cro "
    "dun fair glen hart kin lan mor nor oak pem quin rid sel tal"
).split()


def voters(n: int = 100_000, overlap: float = 0.5, seed: int = 42, typo_rate: float = 0.5):
    """Reference-workload-shaped linkage tables at REALISTIC cardinality
    (example/Example.ipynb cells 3-7: real NC voter files have tens of
    thousands of distinct names, so per-variable agreement sets are sparse).
    ``people()`` keeps its 10-name pools for small oracle tests; this
    generator scales field cardinality with n so a 100k x 100k run has the
    same density profile as the reference's published benchmark:
    last ~ n/5 distinct, first ~ n/50, street ~ n/20, house ~ 10k,
    birth_year 66. Same row schema + ncid ground truth as people()."""
    rng = random.Random(seed)

    def pool(size, k_syllables):
        # never ask for more than ~60% of the combinatorial space or the
        # rejection loop stalls (len(_SYL)**k possible values)
        size = min(size, int(0.6 * len(_SYL) ** k_syllables))
        out = set()
        while len(out) < size:
            out.add("".join(rng.choice(_SYL) for _ in range(k_syllables)))
        return sorted(out)

    lasts = pool(min(25_000, max(100, n // 5)), 3)
    firsts = pool(min(2_500, max(50, n // 50)), 2)
    streets = [
        s + " " + sfx
        for s in pool(min(2_000, max(50, n // 60)), 2)
        for sfx in ("st", "ave", "rd")
    ]

    def fresh(ncid):
        return {
            "ncid": f"e{ncid}",
            "last_name": rng.choice(lasts),
            "first_name": rng.choice(firsts),
            "house_number": str(rng.randint(1, 9999)),
            "street_name": rng.choice(streets),
            "birth_year": str(rng.randint(1940, 2005)),
        }

    n_shared = int(n * overlap)
    shared = [fresh(i) for i in range(n_shared)]
    rows_a = [dict(r) for r in shared] + [fresh(10_000_000 + i) for i in range(n - n_shared)]
    rows_b = []
    for r in shared:
        c = dict(r)
        if rng.random() < typo_rate:
            f = rng.choice(["last_name", "first_name", "street_name"])
            c[f] = _typo(rng, c[f])
        rows_b.append(c)
    rows_b += [fresh(20_000_000 + i) for i in range(n - n_shared)]
    rng.shuffle(rows_a)
    rng.shuffle(rows_b)
    return rows_a, rows_b
