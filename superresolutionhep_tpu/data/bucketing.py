"""Length bucketing to a small set of padded shapes.

The reference controls attention memory with a greedy n^2-cost batch packer
over *dynamic* per-batch max lengths (utility/sampler.py:4-58, threshold e.g.
``"3520**2 * 6"``).  Dynamic shapes force an XLA recompile per batch, so the
TPU-native equivalent buckets events into a few fixed pad lengths (multiples
of ``quantum``, MXU/flash-block friendly) and sizes each bucket's batch so
``batch * pad_n^2 <= cost_budget`` — the same memory-control semantics with a
bounded number of compiled programs.

Incomplete final batches are padded with filler slots (index -1 -> fully
masked rows), keeping shapes static.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class Bucket:
    pad_n: int
    batch_size: int


def make_buckets(
    counts: Sequence[int],
    quantum: int = 128,
    cost_budget: int | None = None,
    max_batch_size: int = 512,
    min_batch_size: int = 1,
    batch_multiple_of: int = 1,
    fine_quantum: int | None = None,
    fine_above: int = 0,
) -> List[Bucket]:
    """Derive bucket pad sizes covering the observed length distribution.

    ``batch_multiple_of`` rounds batch sizes up to a multiple of the data-mesh
    size so batches shard evenly across devices.

    ``fine_quantum``/``fine_above`` switch to a finer pad quantum for events
    longer than ``fine_above``: absolute padding waste in attention flops is
    ~2*N*pad per event, so it grows with N — a fine quantum at the top end
    buys most of the padding reduction for a handful of extra compiled
    shapes, while short events keep the coarse quantum (small-L batches run
    the dense stack at lower efficiency, so extra small buckets cost more
    than their padding saves — measured, BASELINE.md bucket-quantum sweep).
    """

    def _pad(n: int) -> int:
        q = fine_quantum if (fine_quantum is not None and n > fine_above) else quantum
        return int(np.ceil(n / q)) * q

    pad_sizes = sorted({_pad(n) for n in set(int(c) for c in counts)})
    if not pad_sizes:
        pad_sizes = [quantum]
    buckets = []
    m = max(1, batch_multiple_of)
    for pad_n in pad_sizes:
        if cost_budget is not None:
            bs = max(min_batch_size, min(max_batch_size, cost_budget // (pad_n * pad_n)))
        else:
            bs = max_batch_size
        # round DOWN to the mesh multiple so batch * pad_n^2 never exceeds the
        # memory budget; m is the floor when the budget allows fewer than m
        bs = max(m, (int(bs) // m) * m)
        buckets.append(Bucket(pad_n=pad_n, batch_size=int(bs)))
    return buckets


class BucketBatcher:
    """Assign events to buckets by padded length; iterate fixed-shape batches.

    Yields ``(indices, bucket)`` where ``indices`` is an int array of length
    ``bucket.batch_size`` with -1 for filler slots.
    """

    def __init__(
        self,
        counts: Sequence[int],
        quantum: int = 128,
        cost_budget: int | None = None,
        max_batch_size: int = 512,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        batch_multiple_of: int = 1,
        tail_shrink: bool | str = False,
        fine_quantum: int | None = None,
        fine_above: int = 0,
        merge_tail_up: int = 0,
    ):
        # env vars and YAML both arrive as strings: normalize/validate so
        # BENCH_TAIL=0 / "off" / "false" can't silently mean pow2 halving
        allowed = {False: False, True: "pow2", "pow2": "pow2", "exact": "exact",
                   "false": False, "off": False, "0": False, "none": False,
                   "true": "pow2", "1": "pow2"}
        key = tail_shrink.strip().lower() if isinstance(tail_shrink, str) else bool(tail_shrink)
        if key not in allowed:
            raise ValueError(
                f"tail_shrink={tail_shrink!r} not in {{False, True, 'pow2', 'exact'}}"
            )
        tail_shrink = allowed[key]
        # the flash kernel requires sequence lengths that are multiples of
        # its 128-lane block; a non-conforming fine quantum would build
        # bucket shapes the kernel rejects at dispatch time (the coarse
        # quantum is not gated here: CPU/einsum configs legitimately use 64)
        if fine_quantum is not None and fine_quantum % 128 != 0:
            raise ValueError(f"fine_quantum={fine_quantum} must be a multiple of 128")
        self.counts = np.asarray(counts, np.int64)
        self.buckets = make_buckets(
            self.counts, quantum, cost_budget, max_batch_size,
            batch_multiple_of=batch_multiple_of,
            fine_quantum=fine_quantum, fine_above=fine_above,
        )
        self.quantum = quantum
        self.shuffle = shuffle
        self.drop_last = drop_last
        # shrink the batch dim of each bucket's final underfilled batch:
        # filler slots are NOT free — the dense stack runs over every padded
        # token (XLA cannot skip them) and the flash kernel still streams the
        # masked blocks, so a 2-real-event batch padded to B=64 costs ~32x its
        # useful work (measured: 4.7 s for 2 events at (64, 2048), BENCH_r02).
        #   "pow2" (or True): halve down to the smallest power-of-two multiple
        #     that still fits — at most log2(B) extra compiled shapes/bucket.
        #   "exact": ceil(n_real / batch_multiple_of) * batch_multiple_of —
        #     zero filler rows (up to mesh rounding).  A 64-batch bucket with
        #     an 18-event tail runs B=18 instead of B=32 (14 filler rows, 44%
        #     of that batch wasted under pow2); measured 7.4% of the
        #     production bench's executed attention flops (BASELINE.md r4).
        #     Costs one extra compiled shape per distinct tail size, amortised
        #     by the persistent compile cache.  B has no TPU tiling
        #     constraint (leading dim), so odd sizes run at full rate.
        self.tail_shrink = tail_shrink
        self.batch_multiple_of = max(1, batch_multiple_of)
        # merge a bucket's underfilled tail UP into the next-larger bucket
        # when it holds <= merge_tail_up events: a 1-2 event batch pays ~26
        # sequential sampler evals of dispatch-bound device time for almost
        # no useful work (measured ~0.1-0.9 s each, BASELINE.md round-5
        # 256-quantum sweep: 9 such batches = ~2.5 s of the 64 s wall); the
        # moved events fit the larger pad by construction and the extra
        # cell-padding is cheaper than the fixed per-batch cost.  0 = off.
        self.merge_tail_up = int(merge_tail_up)
        self._rng = np.random.default_rng(seed)

        pad_sizes = np.array([b.pad_n for b in self.buckets])
        # smallest bucket that fits each event
        self.event_bucket = np.searchsorted(pad_sizes, self.counts, side="left")

    def _plan(self, shuffle_events: bool) -> List[tuple[np.ndarray, Bucket]]:
        pools = []
        for bi in range(len(self.buckets)):
            idxs = np.nonzero(self.event_bucket == bi)[0]
            if shuffle_events:
                self._rng.shuffle(idxs)
            pools.append(idxs)
        if self.merge_tail_up:
            for bi in range(len(self.buckets) - 1):
                rem = len(pools[bi]) % self.buckets[bi].batch_size
                if 0 < rem <= self.merge_tail_up:
                    pools[bi + 1] = np.concatenate([pools[bi][-rem:], pools[bi + 1]])
                    pools[bi] = pools[bi][:-rem]
        batches = []
        for bi, bucket in enumerate(self.buckets):
            idxs = pools[bi]
            for s in range(0, len(idxs), bucket.batch_size):
                chunk = idxs[s : s + bucket.batch_size]
                if len(chunk) < bucket.batch_size:
                    # drop incomplete batches per bucket (matches __len__'s
                    # cnt // batch_size accounting, not global batch order)
                    if self.drop_last:
                        continue
                    bs = bucket.batch_size
                    if self.tail_shrink == "exact":
                        # exact fit, rounded up to the data-mesh multiple
                        m = self.batch_multiple_of
                        bs = min(bs, -(-len(chunk) // m) * m)
                    elif self.tail_shrink:
                        # shrunk sizes must stay multiples of the data-mesh
                        # size (halving 14 -> 7 would break even sharding)
                        m = self.batch_multiple_of
                        while bs // 2 >= len(chunk) and bs // 2 >= m and (bs // 2) % m == 0:
                            bs //= 2
                    chunk = np.concatenate(
                        [chunk, np.full(bs - len(chunk), -1, np.int64)]
                    )
                    batches.append((chunk, Bucket(bucket.pad_n, bs)))
                    continue
                batches.append((chunk, bucket))
        return batches

    def __iter__(self) -> Iterator[tuple[np.ndarray, Bucket]]:
        batches = self._plan(shuffle_events=self.shuffle)
        if self.shuffle:
            order = self._rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        yield from batches

    def __len__(self) -> int:
        if self.merge_tail_up:
            # batch count depends on the merged pools, not per-bucket counts
            return len(self._plan(shuffle_events=False))
        n = 0
        for bi, bucket in enumerate(self.buckets):
            cnt = int((self.event_bucket == bi).sum())
            if self.drop_last:
                n += cnt // bucket.batch_size
            else:
                n += int(np.ceil(cnt / bucket.batch_size))
        return n
