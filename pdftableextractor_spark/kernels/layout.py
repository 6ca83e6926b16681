"""PDF word-box layout kernel (Arrow-batched, pandas/numpy inside).

Replaces the reference's Textract block parsing (textract_processor.py:
186-301) with geometry-driven layout analysis, per north_star:

- reading-order sort by (top, left)        — textract_processor.py:209-214
- line clustering by y-gap                 — (new; Textract pre-grouped LINEs)
- table-region detection via whitespace-gap column clustering
- row/column grid reconstruction via x-interval merging
- dense grid emission row-major with '' fill — textract_processor.py:285-297

The kernel is invoked via ``mapInPandas`` over exploded ``kind='pdf'`` spans
(one row = one serialized page), so parallelism is at *page* granularity —
a 500-page document costs 500 independent units of work, which is the skew
story: no single task ever owns a whole heavy document.

Frozen constants (the corpus generator and golden fixtures depend on them):
  LINE_EPS      new text line when top gap > 0.01 (page fraction)
  GAP_MIN       segment break when horizontal gap >= 0.05
  COL_MERGE_EPS x-intervals merging into one column when within 0.02
  MIN_TABLE_ROWS a run of >= 2 consecutive multi-segment lines is a table
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pdftableextractor_spark.types import RS, US

LINE_EPS = 0.01
GAP_MIN = 0.05
COL_MERGE_EPS = 0.02
MIN_TABLE_ROWS = 2

KERNEL_OUT_SCHEMA = (
    "doc_id string, offset int, sub_idx int, kind string, "
    "text string, media_ref string"
)


def parse_boxes(payload: str) -> list[tuple[str, float, float, float, float]]:
    """'word\\x1ftop\\x1fleft\\x1fwidth\\x1fheight' records joined by \\x1e."""
    boxes = []
    if not payload:
        return boxes
    for rec in payload.split(RS):
        parts = rec.split(US)
        if len(parts) != 5:
            continue
        w, t, l, wd, h = parts
        boxes.append((w, float(t), float(l), float(wd), float(h)))
    return boxes


def _cluster_lines(boxes) -> list[list[tuple]]:
    """Group word boxes into reading-order lines by y-gap, then x-sort."""
    order = sorted(range(len(boxes)), key=lambda i: (boxes[i][1], boxes[i][2], i))
    lines: list[list[tuple]] = []
    anchor_top = None
    for i in order:
        b = boxes[i]
        if anchor_top is not None and b[1] - anchor_top <= LINE_EPS:
            lines[-1].append(b)
        else:
            lines.append([b])
            anchor_top = b[1]
    return [sorted(ln, key=lambda b: (b[2], b[1])) for ln in lines]


def _segments(line) -> list[dict]:
    """Split an x-sorted line into whitespace-gap segments."""
    segs = []
    cur_words, cur_start, cur_end = [], None, None
    for w, t, l, wd, h in line:
        if cur_end is not None and l - cur_end >= GAP_MIN:
            segs.append({"text": " ".join(cur_words), "start": cur_start, "end": cur_end})
            cur_words, cur_start, cur_end = [], None, None
        if cur_start is None:
            cur_start = l
        cur_words.append(w)
        cur_end = l + wd
    if cur_words:
        segs.append({"text": " ".join(cur_words), "start": cur_start, "end": cur_end})
    return segs


def _merge_columns(seg_lines: list[list[dict]]) -> list[tuple[float, float]]:
    """x-interval union over all segments of a table region → column spans."""
    ivals = sorted(
        (s["start"], s["end"]) for segs in seg_lines for s in segs
    )
    cols: list[list[float]] = []
    for st, en in ivals:
        if cols and st <= cols[-1][1] + COL_MERGE_EPS:
            cols[-1][1] = max(cols[-1][1], en)
        else:
            cols.append([st, en])
    return [(c[0], c[1]) for c in cols]


def _assign_col(seg: dict, cols: list[tuple[float, float]]) -> int:
    center = (seg["start"] + seg["end"]) / 2.0
    for j, (st, en) in enumerate(cols):
        if st - COL_MERGE_EPS <= center <= en + COL_MERGE_EPS:
            return j
    # nearest by center distance (robust fallback)
    return min(
        range(len(cols)),
        key=lambda j: min(abs(center - cols[j][0]), abs(center - cols[j][1])),
    )


def layout_page(payload: str) -> list[tuple[str, str]]:
    """One serialized page → ordered [(kind, text)] with kind in
    ('text', 'table_cell'). Text lines are RAW (normalization/footnote/
    boilerplate filtering happens in the shared Spark-side SQL path so the
    string semantics live in exactly one place)."""
    boxes = parse_boxes(payload)
    if not boxes:
        return []
    lines = _cluster_lines(boxes)
    seg_lines = [_segments(ln) for ln in lines]
    tabular = [len(s) >= 2 for s in seg_lines]

    out: list[tuple[str, str]] = []
    i = 0
    n = len(lines)
    while i < n:
        if tabular[i]:
            j = i
            while j < n and tabular[j]:
                j += 1
            if j - i >= MIN_TABLE_ROWS:
                region = seg_lines[i:j]
                cols = _merge_columns(region)
                for segs in region:
                    cells = [""] * len(cols)
                    for s in segs:
                        c = _assign_col(s, cols)
                        cells[c] = (cells[c] + " " + s["text"]).strip()
                    for cell in cells:
                        out.append(("table_cell", cell))
                i = j
                continue
            # single tabular line → plain text line
            for k in range(i, j):
                out.append(("text", " ".join(s["text"] for s in seg_lines[k])))
            i = j
        else:
            out.append(("text", " ".join(s["text"] for s in seg_lines[i])))
            i += 1
    return out


def pdf_layout_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, offset, text) pdf-span rows →
    (doc_id, offset, sub_idx, kind, text, media_ref) expansion rows."""
    for pdf in batches:
        doc_ids, offsets, subs, kinds, texts = [], [], [], [], []
        for doc_id, offset, payload in zip(
            pdf["doc_id"].values, pdf["offset"].values, pdf["text"].values
        ):
            for sub, (kind, text) in enumerate(layout_page(payload)):
                doc_ids.append(doc_id)
                offsets.append(offset)
                subs.append(sub)
                kinds.append(kind)
                texts.append(text)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="string"),
                "offset": pd.Series(offsets, dtype="int32"),
                "sub_idx": pd.Series(subs, dtype="int32"),
                "kind": pd.Series(kinds, dtype="string"),
                "text": pd.Series(texts, dtype="string"),
                "media_ref": pd.Series([""] * len(doc_ids), dtype="string"),
            }
        )
