"""Block-level boilerplate removal — jusText-style content extraction.

The content-vs-chrome classifier every web-corpus pipeline runs between
raw HTML and the text column (nav bars, link farms, cookie banners and
footers out; article paragraphs in). The reference's analog is its
payload→clean-text transform (sofria-cli USX extraction,
/root/reference/load/UpdateDBPTextFilesets.py:60-89) — there the markup
is trusted and fully consumed; on crawled web pages most markup is
chrome, so extraction must first CLASSIFY blocks before stripping them.

Algorithm (simplified jusText, Pomikálek 2011):

1. split the page into blocks at block-level closing tags / ``<br>``;
2. per block compute character length, link density (chars inside
   ``<a>`` / total chars) and stopword fraction;
3. context-free classify: high link density → *bad*; shorter than
   ``min_chars`` → *short* (undecided); stopword-dense → *good*;
   everything else (gibberish, code, keyword stuffing) → *bad*;
4. context pass: a *short* block is promoted to *good* only when BOTH
   its immediate neighbors are context-free *good* (an inline
   "read more" between two paragraphs survives; a footer line whose
   only good neighbor is on one side does not);
5. the kept text is the good blocks' tag-stripped, space-collapsed
   text joined with ``\n``.

Scale shape: the entire operator is ONE pure-JVM expression tree over
higher-order array functions (split / transform / filter / zip_with /
array_join) — per-document-local math stays inside the row's own block
array, so there is no explode, no shuffle, and no Python: it runs
map-only at IO speed over a 100 TB corpus exactly like the other
per-document filters in functions/quality.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# block boundaries: closing block-level tags and <br>
BLOCK_SEP = r"</(?:p|div|h[1-6]|li|ul|ol|table|tr|td|section|article|header|footer|nav|blockquote)>|<br\s*/?>"
_TAG = r"<[^>]*>"
# anchor inner text; (?s) so anchors spanning newlines still match
_ANCHOR = r"(?s)<a\b[^>]*>(.*?)</a>"
_WS = r"\s+"

# compact English function-word list (block-level signal only — the
# per-document language tagger in functions/extract.py has its own)
STOPWORDS = (
    "the of and a to in is it for on with as at by an be this that "
    "are was or from all one"
).split()


def _clean_text(b) -> Column:
    """Tag-strip + whitespace-collapse + trim a raw block fragment."""
    return F.trim(F.regexp_replace(F.regexp_replace(b, _TAG, " "), _WS, " "))


def boilerplate_exprs(
    html: Column,
    min_chars: int = 25,
    max_link_density: float = 0.4,
    min_stopword_frac: float = 0.25,
) -> dict[str, Column]:
    """Column expressions for block-level boilerplate removal.

    Returns ``n_blocks`` (non-empty blocks), ``n_good`` (blocks kept
    after the context pass) and ``content`` (kept text, blocks joined
    with ``\\n``; empty string when nothing survives).
    """
    sw = F.array(*[F.lit(w) for w in STOPWORDS])

    def link_chars(b) -> Column:
        # total cleaned-text chars inside this block's anchors
        return F.aggregate(
            F.regexp_extract_all(b, F.lit(_ANCHOR), 1),
            F.lit(0),
            lambda acc, a: acc + F.length(_clean_text(a)),
        )

    blocks = F.filter(
        F.transform(
            F.split(html, BLOCK_SEP),
            lambda b: F.struct(
                _clean_text(b).alias("text"), link_chars(b).alias("lc")
            ),
        ),
        lambda s: s["text"] != "",
    )

    def classify(s) -> Column:
        # 0 = bad, 1 = short (undecided), 2 = good
        n = F.length(s["text"])
        toks = F.split(F.lower(s["text"]), " ")
        swf = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.size(toks)
        return (
            F.when(s["lc"] / n > max_link_density, 0)
            .when(n < min_chars, 1)
            .when(swf >= min_stopword_frac, 2)
            .otherwise(0)
        )

    cls = F.transform(blocks, classify)
    n_b = F.size(blocks)

    # context pass over indices; element_at is 1-based and throws on 0,
    # so edge neighbors stay behind lazily-evaluated CaseWhen guards
    # (same trap as quality.repetition_exprs' short-doc guard)
    def finalize(i) -> Column:
        here = F.element_at(cls, i.cast("int"))
        prev_good = F.coalesce(
            F.when(i >= 2, F.element_at(cls, (i - 1).cast("int")) == 2),
            F.lit(False),
        )
        next_good = F.coalesce(
            F.when(i < n_b, F.element_at(cls, (i + 1).cast("int")) == 2),
            F.lit(False),
        )
        return (
            F.when(here == 2, 2)
            .when((here == 1) & prev_good & next_good, 2)
            .otherwise(0)
        )

    # sequence(1, 0) would descend on block-less pages — guard n_b >= 1
    fin = F.when(
        n_b >= 1, F.transform(F.sequence(F.lit(1), n_b), finalize)
    ).otherwise(F.array().cast("array<int>"))
    kept = F.filter(
        F.zip_with(blocks, fin, lambda b, c: F.when(c == 2, b["text"])),
        lambda t: t.isNotNull(),
    )
    # NULL html propagates NULL through all three outputs
    return {
        "n_blocks": n_b.cast("bigint"),
        "n_good": F.size(kept).cast("bigint"),
        "content": F.array_join(kept, "\n"),
    }
