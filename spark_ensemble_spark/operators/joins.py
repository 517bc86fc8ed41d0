"""Temporal join operators Spark lacks natively.

:func:`asof_join` — "latest right row at or before the left row's time" per
key: the workhorse of feature/training-data pipelines (attach the most recent
account state / price / label to every event). Spark has no ASOF JOIN;
the scalable formulation is union-tag + carry-forward window:

* tag right rows 0 and left rows 1, union them on (key, ts, tag);
* one window per key ordered by (ts, tag) carries the last non-null right
  payload forward (``F.last(ignorenulls=True)`` over an unbounded-preceding
  running frame);
* keep only left rows.

One shuffle + sort on the key — same cost as a sort-merge join — and no
per-key driver state, so it scales to fact-sized both sides. A
broadcast-right variant is intentionally NOT special-cased: AQE already
broadcasts the union's small side when sizes allow.

Ties are inclusive (right_ts == left_ts matches) because the right tag sorts
first at equal ts — the same semantics as DuckDB's ``ASOF JOIN`` (>=), which
is what the registry oracle uses.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach ``payload_cols`` from the temporally
    nearest right row per ``on`` key: the latest with ``right_ts <= left_ts``
    (``backward``, default) or the earliest with ``right_ts >= left_ts``
    (``forward``). Unmatched left rows keep NULL payloads (left-join
    semantics).

    If several right rows share (key, ts), the carried value is the last in
    the underlying sort — pre-aggregate right to one row per (key, ts) when
    a deterministic winner matters (the registry query does).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    dup = set(payload_cols) & set(left.columns)
    if dup:
        raise ValueError(f"payload columns collide with left columns: {sorted(dup)}")

    # Helper columns get collision-free names so a left/right frame that
    # already contains "__ts"/"__tag"/"__filled_*" cannot be clobbered.
    taken = set(left.columns) | set(right.columns)

    def fresh(base: str) -> str:
        name, i = base, 0
        while name in taken:
            i += 1
            name = f"{base}_{i}"
        taken.add(name)
        return name

    ts_c, tag_c = fresh("__ts"), fresh("__tag")
    filled = {c: fresh(f"__filled_{c}") for c in payload_cols}

    left_cols: List[str] = left.columns
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias(ts_c),
        F.lit(0).alias(tag_c),
        *[F.col(c) for c in payload_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c != on],
    )
    l = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias(ts_c),
        F.lit(1).alias(tag_c),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
        *[F.col(c) for c in left_cols if c != on],
    )
    unioned = r.unionByName(l)

    order = (
        [F.asc(ts_c), F.asc(tag_c)]
        if direction == "backward"
        else [F.desc(ts_c), F.asc(tag_c)]
    )
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(filled[c])
            for c in payload_cols
        ],
    )
    # Left frame's original column order (including the position of `on`),
    # then the attached payloads.
    return carried.filter(F.col(tag_c) == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(filled[c]).alias(c) for c in payload_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Scalable point-in-interval join: left rows whose ``left_ts`` falls in
    ``[right_start, right_end]`` of a right row (inner), optionally also
    matching on equi ``keys``.

    Spark plans a bare inequality join as BroadcastNestedLoopJoin — O(n·m)
    compares and a mandatory broadcast, the classic range-join cliff. This
    implementation BUCKETIZES time instead: each left row maps to exactly one
    ``bucket_seconds``-wide bucket, each right interval explodes to the
    buckets it intersects, and the join becomes an EQUI-join on
    (keys..., bucket) followed by the exact containment filter. Because a
    left point lies in exactly one bucket, every qualifying pair matches
    exactly once — no post-join dedup. Pick ``bucket_seconds`` near the
    typical interval length: the explode factor is
    ~1 + interval_len/bucket_seconds (bounded-length intervals keep it
    constant), and bucket skew inherits the key skew handled by AQE.
    """
    lts = F.unix_micros(F.col(left_ts))
    rs = F.unix_micros(F.col(right_start))
    re = F.unix_micros(F.col(right_end))
    w_us = int(bucket_seconds) * 1_000_000
    lb = left.withColumn("__bucket", (lts / w_us).cast("long"))
    rb = right.withColumn(
        "__bucket",
        F.explode(F.sequence((rs / w_us).cast("long"), (re / w_us).cast("long"))),
    )
    cond = [F.col(f"l.__bucket") == F.col("r.__bucket")] + [
        F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys
    ]
    joined = lb.alias("l").join(rb.alias("r"), cond)
    return joined.filter(
        (F.col(f"l.{left_ts}") >= F.col(f"r.{right_start}"))
        & (F.col(f"l.{left_ts}") <= F.col(f"r.{right_end}"))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    block_len: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Entity-resolution join: rows whose normalized strings are within
    ``max_distance`` edits, candidates limited to a shared
    ``block_len``-char normalized prefix — the two-table generalization of
    the blocked self-match (``fuzzy_part_name_pairs``). Appends a ``__dist``
    column (collision-free renamed if taken); ``how='left'`` keeps
    unmatched left rows (NULL right side, NULL dist) for the
    "match or keep for manual review" pipeline shape.

    ``left_col`` and ``right_col`` MAY share a name (two catalogs with the
    same schema): expressions are alias-qualified, so nothing is ambiguous —
    though as with any Spark join, duplicate payload names in the OUTPUT
    still need the caller to select/rename.

    Scale shape: one equi-join on the prefix block — levenshtein (quadratic
    per pair) runs only inside blocks, never across the cross product; on
    the inner path it is evaluated ONCE per block pair (post-join column,
    not a join predicate). The prefix blocker trades recall for that bound
    (edits INSIDE the prefix can move a row out of its block — the standard
    trade; use the MinHash band blocker for typo-anywhere recall)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    taken = set(left.columns) | set(right.columns)

    def fresh(base: str) -> str:
        name, i = base, 0
        while name in taken:
            i += 1
            name = f"{base}_{i}"
        taken.add(name)
        return name

    al, ar, dist_c = fresh("__fj_l"), fresh("__fj_r"), fresh("__dist")
    la, ra = left.alias(al), right.alias(ar)
    norm_l = F.lower(F.trim(F.col(f"{al}.{left_col}")))
    norm_r = F.lower(F.trim(F.col(f"{ar}.{right_col}")))
    # length pre-filter: |len(a)−len(b)| ≤ edit distance always, so this
    # never changes results — it just keeps the quadratic levenshtein off
    # candidates that cannot possibly match (the dominant cost inside a
    # coarse block; measured 48s→sub-10s on the sf0.1 part fixture)
    len_ok = (
        F.abs(F.length(norm_l) - F.length(norm_r)) <= max_distance
    )
    block_eq = (
        F.substring(norm_l, 1, block_len) == F.substring(norm_r, 1, block_len)
    ) & len_ok
    dist = F.levenshtein(norm_l, norm_r)
    if how == "inner":
        # block-only join predicate; the edit distance is a post-join column
        # so Catalyst evaluates it once per candidate
        return (
            la.join(ra, block_eq, "inner")
            .withColumn(dist_c, dist)
            .filter(F.col(dist_c) <= max_distance)
        )
    # LEFT: the distance must live in the ON clause (filtering after the
    # join would drop the NULL-extended unmatched rows). levenshtein(x, NULL)
    # is NULL, so unmatched rows report NULL dist with no special casing.
    #
    # Known double evaluation (ADVICE r5, deliberate): the ON clause runs
    # levenshtein once per block candidate and the withColumn re-runs it per
    # MATCHED output row — ≤2× the inner path's cost, bounded by the same
    # prefix-block + length pre-filter. The alternatives are worse or
    # unsound: an inner-join ∪ anti-join rebuild re-evaluates the same
    # distance inside the anti's ON clause (still 2×) and needs a unique
    # left key; computing the distance post-join on a block-only left join
    # cannot distinguish "no block match" from "all candidates above
    # max_distance" without dropping the NULL-extension contract.
    return la.join(ra, block_eq & (dist <= max_distance), "left").withColumn(
        dist_c, dist
    )
