"""Frozen tokenization spec — shared verbatim by the Spark engine, the pure
Python oracle (tests), and (for the "simple" mode) the DuckDB oracle SQL.

Mirrors the reference pipeline *shape* — lowercase -> stopword removal ->
stemming (reference: Lucene EnglishAnalyzerConfigurable with Krovetz stemming,
/root/reference/QryEval/QryParser.java:40-49,428-445) — but is our own spec:
a regex token pass, the classic Lucene English stop set, and a deterministic
"s-stemmer". The exact linguistics don't matter; what matters is that engine
and oracle share one frozen pure function so rankings are rank-identical.

Two modes:

- FULL mode (web pages / index build): ``extract_text`` (html bytes -> text,
  byte-identical per url as required by BASELINE.json input_hint) and
  ``tokenize_full`` (stopwords occupy positions but emit no postings —
  reference keeps stopword positions in field length, Idx.java:99-115 and
  TermVector stems[0], TermVector.java:22-60).

- SIMPLE mode (the driver's ``documents`` test table, whose text is already
  clean space-separated tokens): split on a single space, drop empties, no
  stop/stem — exactly DuckDB ``string_split(text, ' ')`` so oracle SQL can
  reproduce it.
"""

from __future__ import annotations

import html as _htmllib
import re

# ---------------------------------------------------------------------------
# Stop set: Lucene's classic English stop words (public domain list).
# Frozen — do not edit without regenerating every golden file.
# ---------------------------------------------------------------------------
STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_TAG_RE = re.compile(rb"<script\b.*?</script\s*>|<style\b.*?</style\s*>", re.S | re.I)
_MARKUP_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Deterministic html -> text. Pure function of the bytes (the
    byte-identical-per-url invariant): strip script/style, strip tags,
    unescape entities, collapse whitespace."""
    if html_bytes is None:
        return ""
    raw = _TAG_RE.sub(b" ", html_bytes)
    s = raw.decode("utf-8", errors="replace")
    s = _MARKUP_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def s_stem(tok: str) -> str:
    """Deterministic minimal English s-stemmer (frozen spec).

    Rules (first match wins), only for tokens of length >= 4:
      1. '...sses' -> '...ss'
      2. '...ies'  -> '...y'
      3. '...s' (not '...ss', not '...us') -> drop the 's'
    """
    if len(tok) < 4:
        return tok
    if tok.endswith("sses"):
        return tok[:-2]
    if tok.endswith("ies"):
        return tok[:-3] + "y"
    if tok.endswith("s") and not tok.endswith(("ss", "us")):
        return tok[:-1]
    return tok


def tokenize_full(text: str) -> list[str | None]:
    """Lowercase, regex-split, stop, stem. Returns one slot per raw token;
    stopword slots are None (they hold a position and count toward field
    length but emit no posting)."""
    if not text:
        return []
    out: list[str | None] = []
    for tok in _TOKEN_RE.findall(text.lower()):
        out.append(None if tok in STOPWORDS else s_stem(tok))
    return out


def tokenize_query_term(tok: str) -> str | None:
    """Tokenize a single query term exactly like document text. Returns None
    if the term is a stopword (the reference drops it and later removes
    emptied operators, QryParser.java:141-179,230-259)."""
    toks = tokenize_full(tok)
    for t in toks:
        if t is not None:
            return t
    return None


def simple_tokens(text: str) -> list[str]:
    """SIMPLE mode: DuckDB-reproducible split. ``string_split(text, ' ')``
    with empty strings dropped. No lowercase/stop/stem (driver test corpus is
    already clean)."""
    if not text:
        return []
    return [t for t in text.split(" ") if t]


# ---------------------------------------------------------------------------
# Vectorized (Arrow) UDF factories. Kept as factories so importing this
# module never requires an active SparkSession.
# ---------------------------------------------------------------------------

def make_udfs():
    """Returns dict of pandas UDFs: extract_text_udf, tokenize_full_udf,
    simple_tokens_udf."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def extract_text_udf(h: pd.Series) -> pd.Series:
        return h.map(lambda b: extract_text(b) if b is not None else "")

    @F.pandas_udf(T.ArrayType(T.StringType(), containsNull=True))
    def tokenize_full_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: tokenize_full(x) if x is not None else [])

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def simple_tokens_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: simple_tokens(x) if x is not None else [])

    return {
        "extract_text": extract_text_udf,
        "tokenize_full": tokenize_full_udf,
        "simple_tokens": simple_tokens_udf,
    }
