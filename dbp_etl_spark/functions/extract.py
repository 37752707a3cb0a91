"""HTML -> text extraction and language tagging.

This is the engine's analog of the reference's external row transform
(sofria-cli USX->verses extraction, /root/reference/load/UpdateDBPTextFilesets.py:60-89,
consumed at :158-196): an opaque payload column is turned into a clean
text column with a **byte-identical** contract — the same input bytes
must always produce the same output string, across runs, partitionings
and parallelism levels.

Two implementations of the *same* spec:

* ``extract_text_py`` — pure-Python oracle (used by tests as golden).
* ``extract_text_udf`` — Arrow-batched pandas UDF (the production path;
  no per-row Python at the Spark API layer).

Determinism rules (the reference's equivalent traps are its unicode
sanitization and quote-escaping, /root/reference/load/SQLBatchExec.py:30-41,99-104):

1. bytes are decoded as UTF-8 with U+FFFD replacement;
2. ``<script>``/``<style>`` blocks and HTML comments are removed;
3. block-level closing tags and ``<br>`` become newlines;
4. remaining tags are stripped; entities decoded via ``html.unescape``;
5. output is NFC-normalized;
6. ``\r`` is dropped (reference analog: .replace('\\r',''),
   /root/reference/load/UpdateDBPTextFilesets.py:186); each line is
   space-collapsed and stripped; empty lines dropped; lines joined
   with a single ``\n``.

No locale-dependent calls; ``html.unescape`` and ``unicodedata`` are
stdlib and version-stable for the entity/NFC subsets we exercise.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_BREAK_RE = re.compile(
    r"<\s*(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr|/table|/ul|/ol|/blockquote|/section|/article|/header|/footer|/title)\s*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]*>")
_SPACE_RE = re.compile(r"[ \t\f\v]+")


def extract_text_py(html_bytes: bytes | None) -> str | None:
    """Pure-Python golden implementation of the extraction spec."""
    if html_bytes is None:
        return None
    s = bytes(html_bytes).decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub("", s)
    s = _COMMENT_RE.sub("", s)
    s = _BLOCK_BREAK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    s = unicodedata.normalize("NFC", s)
    s = s.replace("\r", "")
    lines = []
    for line in s.split("\n"):
        line = _SPACE_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched production path; same spec as ``extract_text_py``."""
    return html.map(extract_text_py, na_action="ignore")


# ---------------------------------------------------------------------------
# Language tagging — deterministic n-gram / stopword heuristic.
# Reference analog: ISO language resolution against the LPTS dimension
# (/root/reference/load/LPTSExtractReader.py:674-676 and the fallback
# ladder /root/reference/load/UpdateDBPBiblesTable.py:138-189). We have
# no dimension for raw web text, so the engine ships a lightweight,
# fully deterministic classifier over the extracted text.
# ---------------------------------------------------------------------------

_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to a in is it that was for on are with as be at by this have from or had not but what all were when we there can an your which their".split()
    ),
    "de": frozenset(
        "der die das und ist in den von zu mit sich des auf für nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem über".split()
    ),
    "fr": frozenset(
        "le la les de des et un une du en est que qui dans pour pas sur ne se ce il au plus par avec sont ou son ses mais comme tout nous".split()
    ),
    "es": frozenset(
        "el la los las de y un una en es que del se no por con para su al lo como más pero sus le ha me si sin sobre este ya entre cuando todo esta son".split()
    ),
}
_TOKEN_RE = re.compile(r"[a-zA-ZÀ-ɏ]+")


def detect_lang_py(text: str | None) -> str | None:
    """Deterministic stopword-vote language id over {en,de,fr,es}; 'und' if unsure."""
    if text is None:
        return None
    tokens = _TOKEN_RE.findall(text.lower())
    if not tokens:
        return "und"
    scores = {lang: 0 for lang in _STOPWORDS}
    for tok in tokens:
        for lang, sw in _STOPWORDS.items():
            if tok in sw:
                scores[lang] += 1
    # deterministic arg-max: break ties on language code order
    best_lang, best_score = None, -1
    for lang in sorted(scores):
        if scores[lang] > best_score:
            best_lang, best_score = lang, scores[lang]
    if best_score * 20 < len(tokens):  # <5% stopword hits -> undetermined
        return "und"
    return best_lang


@F.pandas_udf(T.StringType())
def detect_lang_udf(text: pd.Series) -> pd.Series:
    return text.map(detect_lang_py, na_action="ignore")


def detect_lang_expr(text_col):
    """JVM-expression twin of detect_lang_py — same stopword vote, same
    tie-break (first max in sorted language order), same <5% 'und'
    floor — but built from array/filter expressions so it runs inside
    whole-stage codegen (no Python) AND is mirrorable in plain SQL for
    the driver's oracle (query doc_lang_id). Parity with the UDF is
    pytest-pinned."""
    toks = F.regexp_extract_all(F.lower(text_col), F.lit(r"[a-zA-ZÀ-ɏ]+"), 0)
    n = F.size(toks)
    def _score(sw):
        # single-arg lambda: a 2-arg lambda would make Spark bind the
        # second parameter as the element INDEX
        return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))

    scores = {
        lang: _score(F.array(*[F.lit(w) for w in sorted(_STOPWORDS[lang])]))
        for lang in sorted(_STOPWORDS)
    }
    order = sorted(_STOPWORDS)  # tie-break: earliest code wins
    best = F.greatest(*scores.values())
    pick = None
    for i, lang in enumerate(order):
        cond = scores[lang] == best
        pick = F.when(cond, F.lit(lang)) if pick is None else pick.when(cond, F.lit(lang))
    return (
        F.when(text_col.isNull(), F.lit(None).cast("string"))
        .when((n == 0) | (best * 20 < n), F.lit("und"))
        .otherwise(pick)
    )


@F.pandas_udf(
    T.StructType(
        [T.StructField("text", T.StringType()), T.StructField("lang", T.StringType())]
    )
)
def extract_and_lang_udf(
    html: pd.Series, changed: pd.Series, old_text: pd.Series, old_lang: pd.Series
) -> pd.DataFrame:
    """Combined (text, lang) extraction in one Arrow round trip.

    Rows where ``changed`` is false reuse ``old_text``/``old_lang``
    (incremental compute for touch-only updates); a single struct
    return avoids the N-fold UDF re-evaluation that separate
    text/lang expressions suffer after projection collapse."""
    texts = old_text.copy()
    langs = old_lang.copy()
    mask = changed.fillna(True).astype(bool)
    new_texts = html[mask].map(extract_text_py, na_action="ignore")
    texts[mask] = new_texts
    langs[mask] = new_texts.map(detect_lang_py, na_action="ignore")
    return pd.DataFrame({"text": texts, "lang": langs})


# ---------------------------------------------------------------------
# HTML <head> metadata extraction — pure JVM expression trees.
# Reference analog: per-file metadata pulled out of content and pushed
# into dimension rows (title/language fields assembled in
# /root/reference/load/UpdateDBPFilesetTables.py and the LPTS XML
# attributes); for web pages the equivalent head fields are title,
# rel=canonical, meta description and robots directives.
# ---------------------------------------------------------------------

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def decode_entities(col):
    """Minimal named/numeric entity decode (the five ubiquitous ones).
    ``&amp;`` is decoded LAST so ``&amp;lt;`` yields the literal
    ``&lt;`` rather than double-decoding to ``<``."""
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _attr_pair(tag_re: str, key_attr: str, key_val: str, want_attr: str):
    """Extract ``want_attr`` from the first ``<tag ...>`` whose
    ``key_attr`` equals ``key_val``, tolerating either attribute order.
    Returns a closure over the html string column."""

    def expr(html_s):
        before = (
            rf"(?is)<{tag_re}[^>]*\b{key_attr}\s*=\s*[\"']{key_val}[\"']"
            rf"[^>]*\b{want_attr}\s*=\s*[\"']([^\"']*)[\"']"
        )
        after = (
            rf"(?is)<{tag_re}[^>]*\b{want_attr}\s*=\s*[\"']([^\"']*)[\"']"
            rf"[^>]*\b{key_attr}\s*=\s*[\"']{key_val}[\"']"
        )
        return F.coalesce(
            F.nullif(F.regexp_extract(html_s, before, 1), F.lit("")),
            F.nullif(F.regexp_extract(html_s, after, 1), F.lit("")),
        )

    return expr


def html_meta_exprs(html_col) -> dict[str, "Column"]:
    """Head-metadata columns from an html BINARY (or string) column —
    one JVM regexp pass per field, no UDF, so the projection stays
    inside whole-stage codegen and prunes to the html column only.

    Fields: ``title`` (entity-decoded, whitespace-collapsed),
    ``canonical_url`` (<link rel=canonical>, entity-decoded — hrefs
    legally carry ``&amp;``), ``meta_description`` (entity-decoded),
    ``robots_meta`` (lowercased directive list), ``html_lang``
    (<html lang=...>). Absent fields are NULL, not ''."""
    s = html_col.cast("string")
    title = F.nullif(
        F.trim(
            F.regexp_replace(
                decode_entities(F.regexp_extract(s, r"(?is)<title[^>]*>(.*?)</title>", 1)),
                r"\s+",
                " ",
            )
        ),
        F.lit(""),
    )
    return {
        "title": title,
        "canonical_url": decode_entities(_attr_pair("link", "rel", "canonical", "href")(s)),
        "meta_description": decode_entities(
            _attr_pair("meta", "name", "description", "content")(s)
        ),
        "robots_meta": F.lower(_attr_pair("meta", "name", "robots", "content")(s)),
        "html_lang": F.lower(
            F.nullif(F.regexp_extract(s, r"(?is)<html[^>]*\blang\s*=\s*[\"']([^\"']*)[\"']", 1), F.lit(""))
        ),
    }
