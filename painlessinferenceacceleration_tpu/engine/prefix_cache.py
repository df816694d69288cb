"""Page-granular shared-prefix KV cache (content-addressed, copy-free).

Reference: flood's share=1 slots — prompts that share a prefix share the
prefix's KV segment (flood/flood/utils/batch.py:35-48; allocation walks
shared slots first, :900-952). TPU re-design: the paged arena already
addresses KV through per-request page tables, so sharing is free at page
granularity — a request's page table simply points at another request's
(immutable, fully-written) prompt pages. No copy-on-write is needed: only
FULL pages strictly inside a prompt are ever shared, and in-step/decode
writes always land in pages past the shared prefix.

Content addressing follows the vLLM/SGLang chained-hash scheme: page i's
key is H(key_{i-1} || tokens[i*ps:(i+1)*ps]), so a hit guarantees the whole
chain of preceding tokens matches, not just this page's block.

Eviction is LRU over cache entries, triggered by the engine when the
allocator runs dry (the cache holds one refcount per cached page; a page
whose owning request is still alive simply survives until that request
finishes)."""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import List, Sequence, Tuple

from painlessinferenceacceleration_tpu.engine.pages import PageAllocator


def _chain_key(prev: bytes, block: Sequence[int]) -> bytes:
    h = hashlib.sha1(prev)
    h.update(b"|")
    h.update(" ".join(map(str, block)).encode())
    return h.digest()


class PrefixCache:
    def __init__(self, allocator: PageAllocator, page_size: int):
        self.alloc = allocator
        self.ps = page_size
        self._entries: "OrderedDict[bytes, int]" = OrderedDict()  # key -> page

    def __len__(self) -> int:
        return len(self._entries)

    def match(self, tokens: Sequence[int]) -> Tuple[List[int], int]:
        """Longest cached page chain covering a prefix of ``tokens``.

        Returns (pages, n_matched_tokens). Matching is capped one token
        short of the full sequence: at least one token must run through
        prefill to produce the next-token logits."""
        ps = self.ps
        limit = (len(tokens) - 1) // ps  # full pages, cap at len-1 tokens
        pages: List[int] = []
        key = b"root"
        for i in range(limit):
            key = _chain_key(key, tokens[i * ps : (i + 1) * ps])
            page = self._entries.get(key)
            if page is None:
                break
            self._entries.move_to_end(key)  # LRU touch
            pages.append(page)
        return pages, len(pages) * ps

    def retain_matched(self, pages: List[int]) -> None:
        self.alloc.retain(pages)

    def register(self, tokens: Sequence[int], pages: Sequence[int]) -> int:
        """Insert the full pages of a freshly prefilled sequence.

        ``pages`` is the request's page list (shared prefix + fresh);
        entries are only added for pages not already cached. Each inserted
        page gains one refcount owned by the cache. Returns pages added."""
        ps = self.ps
        added = 0
        key = b"root"
        for i in range(len(tokens) // ps):
            key = _chain_key(key, tokens[i * ps : (i + 1) * ps])
            if key in self._entries:
                self._entries.move_to_end(key)
                continue
            if i >= len(pages):
                break
            self._entries[key] = pages[i]
            self.alloc.retain([pages[i]])
            added += 1
        return added

    def evict(self, n_pages: int) -> int:
        """Drop up to ``n_pages`` LRU entries, releasing the cache's ref on
        each (the page returns to the free list once no request holds it).
        Returns the number of entries dropped."""
        dropped = 0
        while dropped < n_pages and self._entries:
            _, page = self._entries.popitem(last=False)
            self.alloc.free([page])
            dropped += 1
        return dropped
