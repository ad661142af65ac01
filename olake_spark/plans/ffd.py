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


def first_fit_decreasing(
    items: list[tuple[str, int]],
    capacity: int,
    min_items_per_bin: int = 2,
) -> list[Bin]:
    """Pack (id, size) items into bins of ``capacity`` bytes.

    Classic FFD: sort descending, place each item in the first bin
    with room, else open a new bin. Items larger than capacity get
    their own bin. Bins holding fewer than ``min_items_per_bin`` items
    are dropped from the result — rewriting a lone file buys nothing.
    """
    bins: list[Bin] = []
    for item_id, size in sorted(items, key=lambda kv: (-kv[1], kv[0])):
        placed = False
        for b in bins:
            if size <= b.room:
                b.items.append((item_id, size))
                placed = True
                break
        if not placed:
            bins.append(Bin(bin_id=len(bins), capacity=max(capacity, size), items=[(item_id, size)]))
    kept = [b for b in bins if len(b.items) >= min_items_per_bin]
    for i, b in enumerate(kept):  # re-number densely
        b.bin_id = i
    return kept
