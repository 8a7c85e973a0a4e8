"""Zone-map file skipping for sort-clustered distributed tables.

Tables declared with ``SORT BY (col)`` keep each written file clustered on
the sort column, so parquet footer min/max statistics become *file-level*
zone maps: a range predicate on the sort column can skip whole files before
Spark ever schedules a task for them. This is the same design as
Iceberg/Delta data skipping (manifest min/max per file) and the reference's
DuckDB zone maps (row-group min/max), lifted to the bucket-directory layout.

Division of labor with the engine: Spark already prunes *row groups* via
pushed filters once a file is opened; file-level skipping removes the file
from the scan plan entirely — fewer tasks, fewer footer opens, and on object
storage fewer GETs. At 100 TB the min/max index belongs in a catalog
manifest (one metadata read, like Delta's log); reading footers directly is
the same O(#files) driver metadata pass as the file index itself and needs
no extra infrastructure here.

Correctness contract (same as ``pruning.py``): skipping is an OPTIMIZATION,
never a filter. Bounds extraction is conservative — only conjuncts of the
shape ``col OP literal`` / ``literal OP col`` / ``col BETWEEN a AND b``
tighten the range; anything else (ORs, functions, unknown syntax) is
ignored, which can only keep extra files. A file is skipped only when its
footer stats PROVE it disjoint from the bound; missing/untyped stats keep
the file.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass

from duckdb_mpp_spark.pruning import _tokenize

_CMP = {"=", "<", "<=", ">", ">="}
_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}


@dataclass
class Bounds:
    """Closed/open interval on the sort column. ``None`` end = unbounded."""

    lo: object | None = None
    lo_inclusive: bool = True
    hi: object | None = None
    hi_inclusive: bool = True
    # Set when two conjuncts constrained the same column with incomparable
    # literal types (``x > 5 AND x > '7'`` — legal SQL, Spark coerces).
    # Such bounds are dropped entirely: skipping must degrade to a full
    # scan, never crash the query (review r4).
    invalid: bool = False

    def tighten_lo(self, v, inclusive: bool) -> None:
        try:
            if self.lo is None or v > self.lo or (v == self.lo and not inclusive):
                self.lo, self.lo_inclusive = v, inclusive
        except TypeError:
            self.invalid = True

    def tighten_hi(self, v, inclusive: bool) -> None:
        try:
            if self.hi is None or v < self.hi or (v == self.hi and not inclusive):
                self.hi, self.hi_inclusive = v, inclusive
        except TypeError:
            self.invalid = True

    @property
    def constrained(self) -> bool:
        return not self.invalid and (self.lo is not None or self.hi is not None)


def _parse_literal_value(kind: str, text: str):
    """SQL literal token → comparable Python value (None if unsupported)."""
    if kind == "number":
        f = float(text)
        return int(text) if f.is_integer() and "." not in text and "e" not in text.lower() else f
    if kind == "string":
        return text[1:-1].replace("''", "'")
    if kind == "typed":
        head, _, rest = text.partition("'")
        inner = rest.rstrip()[:-1].replace("''", "'")
        t = head.strip().upper()
        try:
            if t == "DATE":
                return datetime.date.fromisoformat(inner)
            if t == "TIMESTAMP":
                return datetime.datetime.fromisoformat(inner)
        except ValueError:
            return None
    return None


def _split_top_level_and(toks: list[tuple[str, str]]) -> list[list[tuple[str, str]]]:
    """Split on depth-0 ANDs — except the AND that belongs to a BETWEEN
    phrase (``x BETWEEN a AND b`` must stay one conjunct, otherwise the
    orphan upper bound could be misattributed to the sort column)."""
    out, cur, depth, between_pending = [], [], 0, False
    for k, v in toks:
        if k == "lparen":
            depth += 1
        elif k == "rparen":
            depth -= 1
        if depth == 0 and k == "word" and v.upper() == "BETWEEN":
            between_pending = True
        if depth == 0 and k == "word" and v.upper() == "AND":
            if between_pending:
                between_pending = False
                cur.append((k, v))
                continue
            out.append(cur)
            cur = []
            continue
        cur.append((k, v))
    out.append(cur)
    return out


def _strip_parens(toks: list[tuple[str, str]]) -> list[tuple[str, str]]:
    while (
        len(toks) >= 2
        and toks[0][0] == "lparen"
        and toks[-1][0] == "rparen"
    ):
        depth = 0
        for i, (k, _) in enumerate(toks):
            depth += k == "lparen"
            depth -= k == "rparen"
            if depth == 0 and i < len(toks) - 1:
                return toks  # outer parens don't wrap the whole conjunct
        toks = toks[1:-1]
    return toks


_NOT_A_COLUMN = {
    "AND", "OR", "NOT", "IN", "BETWEEN", "IS", "NULL", "TRUE", "FALSE",
    "LIKE", "EXISTS", "CASE", "WHEN", "THEN", "ELSE", "END", "DATE",
    "TIMESTAMP", "INTERVAL", "CAST",
}


def _col_name(tok: tuple[str, str], qualifiers: set[str]) -> str | None:
    """Column name a word token references (qualifier stripped when it is a
    known table alias), lower-cased; None for non-words and keywords."""
    if tok[0] != "word":
        return None
    name = tok[1].lower()
    if name.upper() in _NOT_A_COLUMN:
        return None
    if "." in name:
        qual, _, base = name.rpartition(".")
        if qual in qualifiers:
            return base
        return name  # struct-field path (matches the parquet leaf name)
    return name


def all_bounds(
    where: str | None, qualifiers: set[str] | None = None
) -> dict[str, Bounds]:
    """Conservative per-column bounds implied by ``where`` — the data-
    skipping predicate analysis, generalized from the SORT BY column to
    EVERY column (r4, Iceberg-style column stats in the manifest).

    Returns {column_name_lower: Bounds} for columns with a usable
    constraint. Top-level conjuncts that aren't a simple comparison on a
    bare column (ORs, functions, col-vs-col) are ignored — they can only
    narrow the result further, so ignoring them keeps skipping sound."""
    if not where:
        return {}
    toks = _tokenize(where)
    if toks is None:
        return {}
    # A depth-0 OR means the expression is a DISJUNCTION of AND-chains
    # (AND binds tighter than OR), so no individual comparison is a
    # required conjunct — deriving bounds from any of them would skip
    # files that satisfy a different disjunct (review r4: wrong results).
    # ORs nested inside parentheses are safe: their parenthesized group is
    # one unrecognized conjunct and is simply ignored below.
    depth = 0
    for k, v in toks:
        depth += k == "lparen"
        depth -= k == "rparen"
        if depth == 0 and k == "word" and v.upper() == "OR":
            return {}
    quals = {q.lower() for q in (qualifiers or set())}
    out: dict[str, Bounds] = {}

    def bnd(col: str) -> Bounds:
        return out.setdefault(col, Bounds())

    for conj in _split_top_level_and(toks):
        conj = _strip_parens(conj)
        # col OP lit  |  lit OP col
        if len(conj) == 3 and conj[1][0] == "op" and conj[1][1] in _CMP:
            col = _col_name(conj[0], quals)
            if col is not None and conj[2][0] != "word":
                op, lit_tok = conj[1][1], conj[2]
            else:
                col = _col_name(conj[2], quals)
                if col is None or conj[0][0] == "word":
                    continue  # col-vs-col or lit-vs-lit: no bound
                op, lit_tok = _FLIP.get(conj[1][1], "="), conj[0]
            v = _parse_literal_value(lit_tok[0], lit_tok[1])
            if v is None:
                continue
            b = bnd(col)
            if op == "=":
                b.tighten_lo(v, True)
                b.tighten_hi(v, True)
            elif op == ">":
                b.tighten_lo(v, False)
            elif op == ">=":
                b.tighten_lo(v, True)
            elif op == "<":
                b.tighten_hi(v, False)
            elif op == "<=":
                b.tighten_hi(v, True)
        # col IN (lit, lit, ...) → [min, max] envelope (files outside the
        # envelope can't contain any listed value; exact membership is left
        # to the engine's filter)
        elif (
            len(conj) >= 4
            and _col_name(conj[0], quals) is not None
            and conj[1][0] == "word"
            and conj[1][1].upper() == "IN"
            and conj[2][0] == "lparen"
            and conj[-1][0] == "rparen"
        ):
            vals = []
            for k, v in conj[3:-1]:
                if k == "comma":
                    continue
                pv = _parse_literal_value(k, v)
                if pv is None:
                    vals = None  # non-literal element → no envelope
                    break
                vals.append(pv)
            if vals:
                try:
                    lo, hi = min(vals), max(vals)
                except TypeError:
                    continue  # mixed-type list → incomparable, ignore
                b = bnd(_col_name(conj[0], quals))
                b.tighten_lo(lo, True)
                b.tighten_hi(hi, True)
        # col BETWEEN a AND b (kept whole by the splitter)
        elif (
            len(conj) == 5
            and _col_name(conj[0], quals) is not None
            and conj[1][0] == "word"
            and conj[1][1].upper() == "BETWEEN"
            and conj[3][0] == "word"
            and conj[3][1].upper() == "AND"
        ):
            lo = _parse_literal_value(conj[2][0], conj[2][1])
            hi = _parse_literal_value(conj[4][0], conj[4][1])
            b = bnd(_col_name(conj[0], quals))
            if lo is not None:
                b.tighten_lo(lo, True)
            if hi is not None:
                b.tighten_hi(hi, True)
    return {c: b for c, b in out.items() if b.constrained}


def sort_bounds(
    where: str | None, sort_col: str, qualifiers: set[str] | None = None
) -> Bounds | None:
    """Conservative bounds on ``sort_col`` implied by ``where`` (the
    single-column view of :func:`all_bounds`, kept for callers/tests)."""
    return all_bounds(where, qualifiers).get(sort_col.lower())


def _coerce(stat, bound):
    """Coerce a parquet stat and a parsed literal to comparable types;
    returns (stat, bound) or None when incomparable (→ keep the file)."""
    import datetime as _dt

    if stat is None or bound is None:
        return None
    if isinstance(stat, (int, float)) and isinstance(bound, (int, float)):
        # compare as-is: Python's int/float comparison is exact, while a
        # float cast collapses distinct int64 values above 2^53 and could
        # prove a false "disjoint"
        return stat, bound
    if isinstance(stat, bytes):
        try:
            stat = stat.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(stat, str) and isinstance(bound, str):
        return stat, bound
    if isinstance(stat, _dt.datetime) and isinstance(bound, _dt.datetime):
        # naive/aware mixes are incomparable in Python (TypeError) even
        # though Spark compares them fine after session-tz normalization —
        # keep the file rather than crash the scan (review r4)
        if (stat.tzinfo is None) != (bound.tzinfo is None):
            return None
        return stat, bound
    if isinstance(stat, _dt.date) and isinstance(bound, _dt.date):
        # datetime vs date mixes: promote the pure-date side to a midnight
        # datetime — Spark casts DATE to TIMESTAMP at 00:00, so this is the
        # value the engine actually compares. Truncating the datetime side
        # to a date instead is UNSOUND for the lo/fmax check: a file with
        # fmax 2024-01-02 23:00 truncates to 2024-01-02 == lo and an
        # exclusive `ts > DATE '2024-01-02'` would skip it even though its
        # intraday rows satisfy the predicate.
        if isinstance(stat, _dt.datetime) and not isinstance(bound, _dt.datetime):
            return stat, _dt.datetime.combine(bound, _dt.time.min)
        if isinstance(bound, _dt.datetime) and not isinstance(stat, _dt.datetime):
            return _dt.datetime.combine(stat, _dt.time.min), bound
        return stat, bound
    if isinstance(stat, str) and isinstance(bound, _dt.date):
        # same promotion rule for string-typed stats: a datetime-shaped stat
        # string must not be truncated to its date prefix on the lo side.
        # No .strip(): a whitespace-padded stat is non-canonical and must
        # never parse here (file_overlaps refuses the skip first, but this
        # branch stays strict on its own — review r7)
        try:
            s = stat
            if len(s) > 10:
                sdt = _dt.datetime.fromisoformat(s)
                bdt = (
                    bound
                    if isinstance(bound, _dt.datetime)
                    else _dt.datetime.combine(bound, _dt.time.min)
                )
                return sdt, bdt
            sd = _dt.date.fromisoformat(s)
            if isinstance(bound, _dt.datetime):
                return _dt.datetime.combine(sd, _dt.time.min), bound
            return sd, bound
        except ValueError:
            return None
    if isinstance(stat, _dt.date) and isinstance(bound, str):
        # DATE/TIMESTAMP column compared against a bare string literal
        try:
            if isinstance(stat, _dt.datetime):
                return stat, _dt.datetime.fromisoformat(bound)
            return stat, _dt.date.fromisoformat(bound[:10])
        except ValueError:
            return None
    return None


_CANON_DATE_RE = re.compile(
    r"\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2}(\.\d{1,9})?)?"
)


def _canonical_temporal_stat(s) -> bool:
    """True when a STRING column stat is in strict canonical ISO form
    (zero-padded, no surrounding whitespace/sign). Only then is the
    column's lexicographic min/max order consistent with Spark's lenient
    string→date/timestamp cast for every castable value the stats bound:
    any leading-whitespace / '+' form sorts below all digit-leading
    strings (it would BE fmin), and unpadded-month/day or bare-prefix
    forms sort outside a canonical [fmin, fmax] (they would BE a stat) —
    so requiring BOTH stats canonical excludes every non-monotone form
    from the file (review r7: lexicographic fmax ' 2024-05-01'-style
    stats previously stripped+parsed, skipping files whose
    whitespace-prefixed rows cast ABOVE the bound — wrong results)."""
    if isinstance(s, bytes):
        try:
            s = s.decode("utf-8")
        except UnicodeDecodeError:
            return False
    if not isinstance(s, str):
        return True  # natively-typed stats don't take the string path
    return bool(_CANON_DATE_RE.fullmatch(s))


def file_overlaps(fmin, fmax, bounds: Bounds) -> bool:
    """True unless the footer stats PROVE the file disjoint from bounds.
    Any comparison that raises (types _coerce paired but Python still
    can't order) keeps the file — skipping degrades, never crashes."""
    if isinstance(bounds.lo, datetime.date) or isinstance(
        bounds.hi, datetime.date
    ):
        # temporal bound over a string-statted column: both stats must be
        # strictly canonical or no skip is sound (see helper docstring)
        if isinstance(fmin, (str, bytes)) or isinstance(fmax, (str, bytes)):
            if not (
                _canonical_temporal_stat(fmin)
                and _canonical_temporal_stat(fmax)
            ):
                return True
    try:
        if bounds.lo is not None:
            c = _coerce(fmax, bounds.lo)
            if c is not None:
                fmx, lo = c
                if fmx < lo or (fmx == lo and not bounds.lo_inclusive):
                    return False
        if bounds.hi is not None:
            c = _coerce(fmin, bounds.hi)
            if c is not None:
                fmn, hi = c
                if fmn > hi or (fmn == hi and not bounds.hi_inclusive):
                    return False
    except TypeError:
        return True
    return True


def file_sort_stats(path: str, sort_col: str):
    """(min, max) of ``sort_col`` over all row groups of one parquet file,
    from footer metadata only; (None, None) when stats are absent."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    try:
        idx = md.schema.names.index(sort_col)
    except ValueError:
        return None, None
    mn = mx = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None, None
        mn = st.min if mn is None or st.min < mn else mn
        mx = st.max if mx is None or st.max > mx else mx
    return mn, mx
