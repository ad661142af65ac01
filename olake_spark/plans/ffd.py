"""Greedy first-fit-decreasing bin packing for compaction planning.

Driver-side planner (north rule: "bin-packing compaction groups small
files via a greedy first-fit-decreasing planner broadcast to
executors"). Pure function — unit-testable without Spark. The
reference sizes its scan chunks the same way in spirit: equal raw
bytes per unit of parallel work (constants/constants.go:33-34).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Bin:
    bin_id: int
    capacity: int
    items: list[tuple[str, int]] = field(default_factory=list)  # (id, size)

    @property
    def size(self) -> int:
        return sum(s for _, s in self.items)

    @property
    def room(self) -> int:
        return self.capacity - self.size


class _LeftmostRoomTree:
    """Segment tree over bin free-room: leftmost bin with room ≥ x in
    O(log n). Grows by doubling; keeps FFD's first-fit order exact."""

    def __init__(self):
        self.cap = 1
        self.tree = [0, 0]  # max-room over segments; 1-indexed heap
        self.n = 0

    def _grow(self):
        old_cap, old = self.cap, self.tree
        self.cap *= 2
        self.tree = [0] * (2 * self.cap)
        # old leaves occupy [old_cap, 2*old_cap) → copy to new leaf span
        self.tree[self.cap : self.cap + old_cap] = old[old_cap : 2 * old_cap]
        for i in range(self.cap - 1, 0, -1):
            self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])

    def append(self, room: int) -> int:
        if self.n == self.cap:
            self._grow()
        idx = self.n
        self.n += 1
        self.set_room(idx, room)
        return idx

    def set_room(self, idx: int, room: int) -> None:
        i = self.cap + idx
        self.tree[i] = room
        i //= 2
        while i:
            self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])
            i //= 2

    def leftmost_with(self, need: int) -> int | None:
        # n == 0 guard: with no bins the root max is 0, so a zero-size
        # item would otherwise "find" nonexistent leaf 0
        if self.n == 0 or self.tree[1] < need:
            return None
        i = 1
        while i < self.cap:
            i *= 2
            if self.tree[i] < need:
                i += 1
        return i - self.cap


def first_fit_decreasing(
    items: list[tuple[str, int]],
    capacity: int,
    min_items_per_bin: int = 2,
) -> list[Bin]:
    """Pack (id, size) items into bins of ``capacity`` bytes.

    Classic FFD semantics: sort descending, place each item in the
    FIRST (lowest-index) bin with room, else open a new bin. Items
    larger than capacity get their own bin. Bins holding fewer than
    ``min_items_per_bin`` items are dropped from the result —
    rewriting a lone file buys nothing.

    The first-fit lookup runs on a leftmost-room segment tree:
    O(n log n) overall, so planning stays driver-trivial at 10^5-10^6
    files (a naive scan is O(n·bins) — minutes at 200k files).
    """
    bins: list[Bin] = []
    tree = _LeftmostRoomTree()
    for item_id, size in sorted(items, key=lambda kv: (-kv[1], kv[0])):
        idx = tree.leftmost_with(size)
        if idx is None:
            b = Bin(bin_id=len(bins), capacity=max(capacity, size), items=[(item_id, size)])
            bins.append(b)
            tree.append(b.capacity - size)
        else:
            b = bins[idx]
            b.items.append((item_id, size))
            tree.set_room(idx, b.room)
    kept = [b for b in bins if len(b.items) >= min_items_per_bin]
    for i, b in enumerate(kept):  # re-number densely
        b.bin_id = i
    return kept
