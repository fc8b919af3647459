"""Fixed-shape event packing for segment-packed inference.

Replaces bucketed padding (data/bucketing.py) on the inference fast path:
events are packed back-to-back into rows of a single static length S, each
event aligned to 128 cells (the flash block granularity), with a per-cell
segment id.  One compiled program serves every batch (vs one per bucket
shape — each a 40-240 s axon compile), and padding drops from the bucket
quantum (512) to the 128-cell alignment.

Packing: first-fit decreasing over aligned lengths — classic bin packing,
>90% typical fill at S >> max event.  Oversize events (aligned length > S)
are rejected at pack time (the caller routes them to the bucketed path).

The attention-band contract (ops/flash_packed.py): valid segment ids are
nondecreasing along each row, padding cells carry -1.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..ops.flash_packed import SEG_ALIGN as ALIGN


def aligned_len(n: int, align: int = ALIGN) -> int:
    return -(-n // align) * align


@dataclasses.dataclass
class PackedBatch:
    """Layout of one (rows, S) packed batch."""

    rows: List[List[Tuple[int, int, int]]]  # per row: (event_idx, offset, n_cells)

    @property
    def n_events(self) -> int:
        return sum(len(r) for r in self.rows)


def pack_events(
    cell_counts: Sequence[int],
    S: int = 5120,
    rows_per_batch: int = 8,
    align: int = ALIGN,
) -> List[PackedBatch]:
    """First-fit-decreasing packing of events into (rows_per_batch, S)
    batches.  Returns the layout; max_segment_len for the kernel is
    ``max(aligned event length)`` over the input."""
    if align < ALIGN or align % ALIGN:
        # the model derives its max-segments-per-row bound as S // SEG_ALIGN
        # (models/flow_model.py); packing more finely would overflow it and
        # zero the conditioning context of the excess segments
        raise ValueError(f"align={align} must be a multiple of {ALIGN}")
    counts = np.asarray(cell_counts)
    if counts.size == 0:
        return []
    order = np.argsort(-counts)  # decreasing
    rows: List[Tuple[int, List[Tuple[int, int, int]]]] = []  # (used, items)
    for idx in order:
        n = int(counts[idx])
        a = aligned_len(n, align)
        if a > S:
            raise ValueError(f"event {idx} has {n} cells; aligned {a} > S={S}")
        for ri, (used, items) in enumerate(rows):
            if used + a <= S:
                items.append((int(idx), used, n))
                rows[ri] = (used + a, items)
                break
        else:
            rows.append((a, [(int(idx), 0, n)]))

    # group rows into batches; pad the final batch with empty rows
    batches = []
    all_rows = [items for _, items in rows]
    for i in range(0, len(all_rows), rows_per_batch):
        chunk = all_rows[i : i + rows_per_batch]
        while len(chunk) < rows_per_batch:
            chunk.append([])
        batches.append(PackedBatch(rows=chunk))
    return batches


HIGH_KEYS_F32 = ("eta", "cosphi", "sinphi", "e_proxy", "target")


def collate_packed(events, batch_layout: PackedBatch, S: int) -> Dict[str, np.ndarray]:
    """Build the packed model batch for one PackedBatch.

    ``events``: indexable by the event indices stored in the layout (the
    SupResEvents dataset's SupResEvent objects, data/sr_dataset.py).
    Produces the same per-cell feature keys as ``collate`` plus ``seg``
    ((B, S) int32, -1 padding); segment ids number events within a row in
    offset order.
    """
    B = len(batch_layout.rows)
    out: Dict[str, np.ndarray] = {}
    for k in HIGH_KEYS_F32:
        out[k] = np.zeros((B, S, 1), np.float32)
    out["layer"] = np.zeros((B, S, 1), np.int32)
    out["q_mask"] = np.zeros((B, S), bool)
    out["seg"] = np.full((B, S), -1, np.int32)

    for bi, row in enumerate(batch_layout.rows):
        for si, (ev_idx, off, n) in enumerate(sorted(row, key=lambda t: t[1])):
            ev = events[ev_idx]
            for k in HIGH_KEYS_F32:
                if k in ev.high:
                    out[k][bi, off : off + n, 0] = ev.high[k]
            out["layer"][bi, off : off + n, 0] = ev.high["layer"]
            out["q_mask"][bi, off : off + n] = True
            out["seg"][bi, off : off + n] = si
    return out
