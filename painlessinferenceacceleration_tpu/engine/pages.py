"""Host-side page allocator for the device KV arena.

Reference: the Slot segment allocator (flood/utils/batch.py:35-48, states
undefined/available/occupied/reserved/shared; best-fit allocate :900-952,
merge-on-recycle :954-1001, in-place extend :1003-1093). With fixed-size
pages the state machine collapses: a page is free or owned; "extend_slot"
becomes appending pages to a request's page list; adjacent-segment merging
is unnecessary (the attention kernel follows the page table). Page 0 is
reserved as the null page (padding target).

A prefix-cache (share=1 slots in the reference) maps to ref-counted pages;
``refs`` is kept per page so shared prefixes can be added without changing
the allocator interface.
"""

from __future__ import annotations

from typing import List, Optional


class PageAllocator:
    def __init__(self, num_pages: int, page_size: int):
        self.page_size = page_size
        self.num_pages = num_pages
        # page 0 reserved (null page)
        self._free: List[int] = list(range(num_pages - 1, 0, -1))
        self.refs = [0] * num_pages

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def page_stats(self) -> dict:
        """Arena-state histogram (the reference's ``Batch.slot_check``,
        flood/utils/batch.py:1095-1102): free / active / shared page counts
        and utilization over the usable arena (page 0 is the null page)."""
        usable = self.num_pages - 1
        free = len(self._free)
        shared = sum(1 for r in self.refs[1:] if r > 1)
        active = usable - free
        return {
            "total_pages": usable,
            "free": free,
            "active": active,
            "shared": shared,
            "utilization": round(active / usable, 4) if usable else 0.0,
        }

    def pages_for_tokens(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def allocate(self, n: int) -> Optional[List[int]]:
        """Take n pages, or None if unavailable (caller requeues — the
        reference's allocation-failure path, flood llm.py:785-819)."""
        if n > len(self._free):
            return None
        out = [self._free.pop() for _ in range(n)]
        for p in out:
            self.refs[p] = 1
        return out

    def retain(self, pages: List[int]) -> None:
        for p in pages:
            self.refs[p] += 1

    def free(self, pages: List[int]) -> None:
        for p in pages:
            self.refs[p] -= 1
            if self.refs[p] == 0:
                self._free.append(p)

    def ensure_capacity(self, pages: List[int], n_tokens: int) -> bool:
        """Grow ``pages`` in place to cover n_tokens; False if exhausted."""
        need = self.pages_for_tokens(n_tokens) - len(pages)
        if need <= 0:
            return True
        got = self.allocate(need)
        if got is None:
            return False
        pages.extend(got)
        return True
