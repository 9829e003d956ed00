"""The extraction pipeline — fused fast path + staged inspectable path.

Both implement the spec in :mod:`yomitoku_spark.spec` and must match the
pure-Python oracle byte-for-byte per ``(conv_id, turn_idx)``.

**Fused path** (:func:`extract`): ONE ``mapInPandas`` stage over the
transcripts scan — segment, featurize, classify, reading-order, emit all
inside a single Arrow batch. Zero shuffles; embarrassingly parallel over
turns. This is the plan you want at 10^12 turns: throughput scales
linearly with executors because no stage exchanges data (the reference's
analog is its per-page loop, cli/main.py:538-549 — we parallelize
across pages/turns instead of within one).

**Staged path** (:func:`extract_staged`): the same semantics decomposed
into Catalyst-visible stages so features/decisions are queryable:

- ``segment_blocks``  — mapInPandas payload → long-form blocks rows
- ``order_blocks``    — grouped pandas UDF (layout turns only) for the
  reading-order DAG sort (reference: reading_order.py:14-223)
- ``featurize``       — pure column expressions (link density etc. —
  jusText/Readability-style block features; whole-stage codegen)
- ``classify``        — pure column expressions (keep/drop; the analog
  of the reference's meta-role filter, document_analyzer.py:552-568)
- ``emit``            — one hash aggregation per turn: ordered
  collect_list → array_join (reference content concatenation:
  document_analyzer.py:233-235, export_markdown.py)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yomitoku_spark import spec
from yomitoku_spark.operators.reading_order import reading_order_numpy
from yomitoku_spark.plans.segment import BLOCK_FIELDS, BLOCKS_SCHEMA, segment_turn

RESULT_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, extracted_text string, "
    "spans array<struct<start:int,end:int,kind:string>>, "
    "blocks_kept int, blocks_dropped int, chars_emitted int"
)

_EMPTY_SPANS = "CAST(array() AS array<struct<start:int,end:int,kind:string>>)"


# ------------------------------------------------------------------
# shared vectorized keep rule (numpy mirror of the classify() column
# expressions — the single CASE both paths implement)
# ------------------------------------------------------------------


def _keep_mask(bdf: pd.DataFrame) -> np.ndarray:
    dens = bdf["link_chars"].to_numpy() / np.maximum(bdf["visible_len"].to_numpy(), 1)
    content = bdf["content_len"].to_numpy()
    visible = bdf["visible_len"].to_numpy()
    kind = bdf["kind"].to_numpy()
    source = bdf["source"].to_numpy()
    ok_dens = dens <= spec.MAX_LINK_DENSITY
    keep = np.select(
        [
            bdf["boiler"].to_numpy() | bdf["meta"].to_numpy(),
            source == "layout",
            kind == spec.KIND_HEADING,
            kind == spec.KIND_TABLE,
            kind == spec.KIND_LIST,
            kind == spec.KIND_KV,
            kind == spec.KIND_CODE,
        ],
        [
            False,
            content > 0,
            (content >= spec.MIN_HEADING_CHARS) & ok_dens,
            content > 0,
            (content > 0) & ok_dens,
            True,
            True,
        ],
        default=(visible >= spec.MIN_PARA_CHARS) & ok_dens,
    )
    return keep.astype(bool)


def _areas(b: np.ndarray) -> np.ndarray:
    return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])


def _vote_vertical(verticals: np.ndarray, boxes: np.ndarray) -> bool:
    """Area-weighted page/figure direction vote (reference
    judge_page_direction, document_analyzer.py:20-40): vertical wins
    only when its summed block area strictly exceeds horizontal's."""
    a = _areas(boxes)
    v = int(a[verticals].sum())
    return v > int(a.sum()) - v


def _layout_order_arrays(
    roles: np.ndarray, verticals: np.ndarray, boxes: np.ndarray
) -> np.ndarray:
    """Emit order for one layout page with the reference's offset rule
    (document_analyzer.py:572-588): page headers first (ordered
    left2right among themselves), then main content, then page footers
    (left2right). Main content auto-picks right2left when the page's
    area-weighted direction vote is vertical (:575-581), else
    top2bottom. Paragraph/heading blocks ≥0.7-contained in a figure box
    are absorbed by their FIRST containing figure (deviation: the
    reference copies a paragraph into every containing figure,
    document_analyzer.py:43-66; one owner keeps extraction
    duplication-free) and emit immediately after it, inner-ordered
    left2right (or right2left when the absorbed set votes vertical).
    Header/footer blocks are still DROPPED from the extracted text by
    the ignore-meta keep rule — the offsets order the block table the
    way the reference orders its paragraph list."""
    n = len(roles)
    order = np.full(n, -1, dtype=np.int64)
    hdr = roles == spec.ROLE_PAGE_HEADER
    ftr = roles == spec.ROLE_PAGE_FOOTER
    h_pos = np.nonzero(hdr)[0]
    f_pos = np.nonzero(ftr)[0]
    m_pos = np.nonzero(~(hdr | ftr))[0]  # META_ROLES == {header, footer}
    if len(h_pos):
        perm = reading_order_numpy(boxes[h_pos], "left2right")
        order[h_pos[perm]] = np.arange(len(perm))
    if len(m_pos):
        mb = boxes[m_pos]
        mv = verticals[m_pos]
        d = "right2left" if _vote_vertical(mv, mb) else "top2bottom"
        # figure absorption (reference extract_paragraph_within_figure:
        # contained > 0.7 of the paragraph's area → 10·overlap > 7·area)
        is_fig = roles[m_pos] == spec.ROLE_FIGURE
        absorbable = (roles[m_pos] == spec.ROLE_PARAGRAPH) | (
            roles[m_pos] == spec.ROLE_HEADING
        )
        owner = np.full(len(m_pos), -1, dtype=np.int64)
        fig_loc = np.nonzero(is_fig)[0]
        pa = _areas(mb)
        for pi in np.nonzero(absorbable)[0]:
            for fi in fig_loc:
                w = min(mb[fi][2], mb[pi][2]) - max(mb[fi][0], mb[pi][0])
                h = min(mb[fi][3], mb[pi][3]) - max(mb[fi][1], mb[pi][1])
                ov = max(w, 0) * max(h, 0)
                if 10 * ov > 7 * pa[pi]:
                    owner[pi] = fi
                    break
        top = np.nonzero(owner < 0)[0]
        perm = reading_order_numpy(mb[top], d)
        seq: list[int] = []
        for t in perm:
            li = int(top[t])
            seq.append(li)
            if is_fig[li]:
                kids = np.nonzero(owner == li)[0]
                if len(kids):
                    inner = (
                        "right2left"
                        if _vote_vertical(mv[kids], mb[kids])
                        else "left2right"
                    )
                    kperm = reading_order_numpy(mb[kids], inner)
                    seq.extend(int(k) for k in kids[kperm])
        order[m_pos[np.asarray(seq, dtype=np.int64)]] = len(h_pos) + np.arange(len(seq))
    if len(f_pos):
        perm = reading_order_numpy(boxes[f_pos], "left2right")
        order[f_pos[perm]] = len(h_pos) + len(m_pos) + np.arange(len(perm))
    return order


def _layout_order(blocks: list[tuple]) -> np.ndarray:
    """Emit order for one layout turn's raw block tuples (doc order)."""
    role_col = BLOCK_FIELDS.index("role")
    vert_col = BLOCK_FIELDS.index("vertical")
    box_cols = [BLOCK_FIELDS.index(c) for c in ("x1", "y1", "x2", "y2")]
    roles = np.asarray([b[role_col] for b in blocks], dtype=object)
    verts = np.asarray([b[vert_col] for b in blocks], dtype=bool)
    boxes = np.asarray([[b[c] for c in box_cols] for b in blocks], dtype=np.int64)
    return _layout_order_arrays(roles, verts, boxes.reshape(-1, 4))


# ------------------------------------------------------------------
# fused path
# ------------------------------------------------------------------


def _extract_batches(batches):
    src_col = BLOCK_FIELDS.index("source")
    bid_col = BLOCK_FIELDS.index("block_id")
    for pdf in batches:
        n = len(pdf)
        rows, turn_of, orders = [], [], []
        for i, (tx, tl) in enumerate(zip(pdf["text"].tolist(), pdf["tool"].tolist())):
            blks = segment_turn(tx, tl)
            if blks and blks[0][src_col] == "layout":
                order = _layout_order(blks)
            else:
                order = np.asarray([b[bid_col] for b in blks], dtype=np.int64)
            rows.extend(blks)
            orders.extend(order.tolist())
            turn_of.extend([i] * len(blks))
        out = pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].to_numpy(),
                "turn_idx": pdf["turn_idx"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "extracted_text": "",
                "spans": [[] for _ in range(n)],
                "blocks_kept": np.zeros(n, dtype="int32"),
                "blocks_dropped": np.zeros(n, dtype="int32"),
                "chars_emitted": np.zeros(n, dtype="int32"),
            }
        )
        if rows:
            bdf = pd.DataFrame(rows, columns=BLOCK_FIELDS)
            bdf["ti"] = turn_of
            bdf["order"] = orders
            keep = _keep_mask(bdf)
            ti_all = np.asarray(turn_of, dtype=np.int64)
            n_blocks = np.bincount(ti_all, minlength=n)
            kept = bdf[keep].sort_values(["ti", "order"], kind="stable")
            ti_k = kept["ti"].to_numpy()
            n_kept = np.bincount(ti_k, minlength=n)
            # group boundaries on the (sorted) kept frame — one pass,
            # no per-group pandas machinery
            rendered = kept["rendered"].tolist()
            starts = kept["start"].tolist()
            ends = kept["end"].tolist()
            kinds = kept["kind"].tolist()
            bounds = (
                np.flatnonzero(np.r_[True, ti_k[1:] != ti_k[:-1]])
                if len(ti_k)
                else np.empty(0, dtype=np.int64)
            )
            texts = out["extracted_text"].to_numpy(dtype=object)
            spans = out["spans"].to_numpy(dtype=object)
            for gi, s in enumerate(bounds):
                e = bounds[gi + 1] if gi + 1 < len(bounds) else len(ti_k)
                ti = int(ti_k[s])
                texts[ti] = spec.BLOCK_JOINER.join(rendered[s:e])
                spans[ti] = [
                    {"start": int(st), "end": int(en), "kind": kd}
                    for st, en, kd in zip(starts[s:e], ends[s:e], kinds[s:e])
                ]
            out["extracted_text"] = texts
            out["spans"] = spans
            out["blocks_kept"] = n_kept.astype("int32")
            out["blocks_dropped"] = (n_blocks - n_kept).astype("int32")
            out["chars_emitted"] = out["extracted_text"].str.len().astype("int32")
        yield out


def extract(transcripts: DataFrame, repartition: int | None = None) -> DataFrame:
    """Fused extraction: transcripts → result, one Arrow stage, no shuffle.

    ``repartition`` optionally round-robin rebalances the scan first —
    the unit of work is the TURN, so even a single hot conversation
    (long-conversation skew, the north rule's case) spreads evenly.
    """
    df = transcripts.select("conv_id", "turn_idx", "text", "tool", "ts")
    if repartition:
        df = df.repartition(repartition)
    return df.mapInPandas(_extract_batches, schema=RESULT_SCHEMA)


# ------------------------------------------------------------------
# staged path
# ------------------------------------------------------------------


def segment_blocks(transcripts: DataFrame) -> DataFrame:
    """S2: payload → long-form raw blocks (one row per block)."""

    def seg(batches):
        for pdf in batches:
            rows, convs, turns = [], [], []
            for cid, ti, tx, tl in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"].tolist(), pdf["tool"].tolist()
            ):
                blks = segment_turn(tx, tl)
                rows.extend(blks)
                convs.extend([cid] * len(blks))
                turns.extend([ti] * len(blks))
            bdf = pd.DataFrame(rows, columns=BLOCK_FIELDS)
            bdf.insert(0, "turn_idx", pd.Series(turns, dtype="int32"))
            bdf.insert(0, "conv_id", convs)
            yield bdf

    return transcripts.select("conv_id", "turn_idx", "text", "tool").mapInPandas(
        seg, schema=BLOCKS_SCHEMA
    )


def order_blocks(blocks: DataFrame) -> DataFrame:
    """S5: reading-order assignment (grouped pandas UDF over the tiny
    per-turn group — reference reading_order.py:14-223). Layout turns
    get the DAG toposort order; all other payload classes keep document
    order. ONE grouped pass over all blocks — splitting layout/rest
    into two branches would re-run the upstream Python segment stage
    once per branch (no common-subplan reuse across a mapInPandas)."""

    def og(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) and pdf["source"].iat[0] == "layout":
            order = _layout_order_arrays(
                pdf["role"].to_numpy(dtype=object),
                pdf["vertical"].to_numpy(dtype=bool),
                pdf[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.int64).reshape(-1, 4),
            )
        else:
            order = pdf["block_id"].to_numpy()
        return pdf.assign(order=order.astype("int32"))

    return blocks.groupBy("conv_id", "turn_idx").applyInPandas(
        og, schema=BLOCKS_SCHEMA + ", order int"
    )


def featurize(blocks: DataFrame) -> DataFrame:
    """S3: block features as pure column expressions (codegen'd JVM-side).

    link_density / text_density are the jusText-/Readability-style
    priors the classifier thresholds on."""
    return (
        blocks.withColumn(
            "link_density",
            F.col("link_chars") / F.greatest(F.col("visible_len"), F.lit(1)),
        )
        .withColumn(
            "text_density",
            F.col("content_len") / F.greatest(F.col("end") - F.col("start"), F.lit(1)),
        )
        .withColumn("word_count", F.size(F.split(F.trim(F.col("rendered")), r"\s+")))
    )


def classify(blocks: DataFrame) -> DataFrame:
    """S4: keep/drop — one CASE expression (analog of the reference's
    meta-role / noise filters, document_analyzer.py:552-568, 248-253)."""
    ok_dens = F.col("link_density") <= spec.MAX_LINK_DENSITY
    keep = (
        F.when(F.col("boiler") | F.col("meta"), F.lit(False))
        .when(F.col("source") == "layout", F.col("content_len") > 0)
        .when(
            F.col("kind") == spec.KIND_HEADING,
            (F.col("content_len") >= spec.MIN_HEADING_CHARS) & ok_dens,
        )
        .when(F.col("kind") == spec.KIND_TABLE, F.col("content_len") > 0)
        .when(F.col("kind") == spec.KIND_LIST, (F.col("content_len") > 0) & ok_dens)
        .when(F.col("kind") == spec.KIND_KV, F.lit(True))
        .when(F.col("kind") == spec.KIND_CODE, F.lit(True))
        .otherwise(
            (F.col("visible_len") >= spec.MIN_PARA_CHARS) & ok_dens
        )
    )
    return blocks.withColumn("keep", keep)


def emit(blocks: DataFrame, transcripts: DataFrame) -> DataFrame:
    """S7: per-turn ordered concatenation + spans + metrics.

    One hash aggregation (map-side partial → final), then a left join
    back to the turn spine so empty turns still emit a row. collect_list
    skips the NULLs that when(keep,...) produces for dropped blocks, so
    kept-content assembly and kept/dropped metrics share one shuffle."""
    bs = F.array_sort(
        F.collect_list(
            F.when(
                F.col("keep"),
                F.struct("order", "rendered", "start", "end", "kind"),
            )
        )
    )
    agg = blocks.groupBy("conv_id", "turn_idx").agg(
        bs.alias("bs"),
        F.sum(F.col("keep").cast("int")).alias("k"),
        F.sum((~F.col("keep")).cast("int")).alias("d"),
    )
    agg = agg.select(
        "conv_id",
        "turn_idx",
        F.array_join(F.transform("bs", lambda b: b["rendered"]), spec.BLOCK_JOINER).alias(
            "et"
        ),
        F.transform(
            "bs",
            lambda b: F.struct(
                b["start"].alias("start"), b["end"].alias("end"), b["kind"].alias("kind")
            ),
        ).alias("sp"),
        "k",
        "d",
    )
    spine = transcripts.select("conv_id", "turn_idx", "ts")
    res = spine.join(agg, ["conv_id", "turn_idx"], "left")
    return res.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "ts",
        F.coalesce(F.col("et"), F.lit("")).alias("extracted_text"),
        F.coalesce(F.col("sp"), F.expr(_EMPTY_SPANS)).alias("spans"),
        F.coalesce(F.col("k"), F.lit(0)).cast("int").alias("blocks_kept"),
        F.coalesce(F.col("d"), F.lit(0)).cast("int").alias("blocks_dropped"),
        F.length(F.coalesce(F.col("et"), F.lit(""))).cast("int").alias("chars_emitted"),
    )


def extract_staged(transcripts: DataFrame) -> DataFrame:
    blocks = classify(featurize(order_blocks(segment_blocks(transcripts))))
    return emit(blocks, transcripts)
