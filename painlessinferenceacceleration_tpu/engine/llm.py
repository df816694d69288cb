"""LLM facade: continuous-batching serving engine.

Reference: flood/facade/llm.py — the 2000-line engine that loads the model,
sizes the KV cache, spawns scheduler processes and exposes
generate / stream_generate / async_stream_generate. TPU re-design:

- ONE scheduler thread drives jitted device steps (JAX async dispatch
  overlaps host batching with device compute; the reference needs
  n_stage+1 processes to keep CUDA streams busy — llm.py:529-549).
- The pingpong control law survives: fill a prefill chunk when there is
  prompt work and pages are available, otherwise run a decode burst
  (llm.py:661-664 state machine).
- Speculative decoding activates when the decode batch is "hungry"
  (n_active <= use_spec_min_batch_size — llm.py:648, 889-918), using
  device-resident draft tables (engine/multistep.py).
- Decode runs in on-device multi-step bursts; batch sizes snap to bucket
  ladder (jit shape reuse — the reference rounds batch sizes the same way,
  llm.py:1858 opt_batch_size).
"""

from __future__ import annotations

import itertools
import threading
import time
from collections import deque
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
from painlessinferenceacceleration_tpu.engine.multistep import (
    multistep_decode,
    multistep_spec_decode,
)
from painlessinferenceacceleration_tpu.engine.pages import PageAllocator
from painlessinferenceacceleration_tpu.engine.request import Request, SamplingParams
from painlessinferenceacceleration_tpu.engine.step import prefill_step
from painlessinferenceacceleration_tpu.layers.linear import QuantSpec
from painlessinferenceacceleration_tpu.lookahead.device_tables import (
    DraftTableConfig,
    init_draft_tables,
    update_tables_batch,
    update_tables_seq,
)
from painlessinferenceacceleration_tpu.utils.metrics import EngineMetrics


class LLM:
    """Serving engine over one model instance.

    Parameters mirror the reference's documented kwargs surface
    (flood llm.py:98-163) where they translate; see EngineConfig.
    """

    def __init__(
        self,
        model_path: Optional[str] = None,
        cfg: Optional[ModelConfig] = None,
        params: Optional[dict] = None,
        ecfg: Optional[EngineConfig] = None,
        tokenizer=None,
        dtype=jnp.bfloat16,
    ):
        self.ecfg = ecfg or EngineConfig()
        self.dtype = dtype
        self.quant = QuantSpec.from_mode(self.ecfg.quant, self.ecfg.quant_group)
        if model_path is not None:
            from painlessinferenceacceleration_tpu.models.hf_loader import load_model

            cfg, params, self.quant = load_model(
                model_path, dtype=dtype, quant=self.quant
            )
            if tokenizer is None:
                try:
                    from transformers import AutoTokenizer

                    tokenizer = AutoTokenizer.from_pretrained(model_path)
                except Exception:
                    tokenizer = None
        assert cfg is not None and params is not None
        if self.ecfg.quant_embed and "embed" in params:
            from painlessinferenceacceleration_tpu.layers.embedding import (
                make_embedding,
            )

            params = dict(params)
            params["embed"] = make_embedding(
                params["embed"], QuantSpec.from_mode("w8a8_fp8")
            )
        if self.ecfg.context_parallel and not cfg.context_parallel:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, context_parallel=True)
        if cfg.context_parallel:
            # the CP attention path (ops/cp_attention.py) does not cover
            # fp8 KV arenas, alibi, or prefix-LM masks; with the arena
            # page-sharded on 'model' a silent fallback to the non-CP path
            # would force an implicit per-layer all-gather of the full
            # arena (or OOM — the very case CP exists for). Reject at
            # construction instead.
            unsupported = []
            if self.ecfg.kv_quant.startswith("fp8"):
                unsupported.append(f"kv_quant={self.ecfg.kv_quant!r}")
            if cfg.position_embedding_type == "alibi":
                unsupported.append("alibi positions")
            if cfg.prefix_lm:
                unsupported.append("prefix-LM attention")
            if unsupported:
                raise ValueError(
                    "context_parallel does not support "
                    + ", ".join(unsupported)
                    + " (the CP attention kernel would silently disengage "
                    "while the KV arena stays page-sharded)"
                )
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer

        if self.ecfg.cache_memory_fraction > 0:
            import dataclasses as _dc

            from painlessinferenceacceleration_tpu.engine.cache import (
                auto_size_pages,
            )

            self.ecfg = _dc.replace(
                self.ecfg,
                num_pages=auto_size_pages(cfg, self.ecfg, dtype),
                cache_memory_fraction=0.0,
            )
        self.kv = init_kv_cache(cfg, self.ecfg, dtype=dtype)
        self.allocator = PageAllocator(self.ecfg.num_pages, self.ecfg.page_size)
        self.prefix_cache = None
        if self.ecfg.prefix_cache:
            from painlessinferenceacceleration_tpu.engine.prefix_cache import (
                PrefixCache,
            )

            self.prefix_cache = PrefixCache(self.allocator, self.ecfg.page_size)

        # decode-slot state (numpy mirrors of device arrays)
        B = self.ecfg.max_concurrency
        P = self.ecfg.pages_per_req
        self._page_np = np.zeros((B, P), np.int32)
        self._last_np = np.zeros((B,), np.int32)
        self._ctx_np = np.zeros((B,), np.int32)
        self._slots: List[Optional[Request]] = [None] * B
        # AntGLM 2D positions: per-slot (prompt_len_eff, mask_pos) — the
        # host locates the first [MASK]/[gMASK] in the prompt
        # (tokenization_glm.py:300-307) and the model maps stream positions
        # to (position, block) ids (models/base.py glm_2d)
        self._glm = cfg.position_embedding_type == "glm_2d"
        self._glm_np = np.zeros((B, 2), np.int32) if self._glm else None

        # lookahead device tables (shared across requests, like the
        # reference's global trie / GPU tables)
        self.tcfg = DraftTableConfig(
            buckets=16384,
            ways=8,
            branch_length=self.ecfg.branch_length,
            retrieve_count=max(1, self.ecfg.decoding_length // self.ecfg.branch_length),
        )
        self.tables = init_draft_tables(self.tcfg) if self.ecfg.use_lookahead else None
        self._tails = np.full(
            (B, self.tcfg.branch_length + 2), -1, np.int32
        )

        self._queue: deque = deque()
        self._rid = itertools.count()
        self._lock = threading.Lock()
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self.metrics = EngineMetrics()
        self._decode_burst = self.ecfg.decode_burst
        self._spec_cooldown = 0  # chunk-level gate (spec_cooldown_bursts)
        self._rng = jax.random.PRNGKey(0)
        # pipelined AR decode: the last dispatched-but-undrained burst
        # (device handles). Dispatch burst N+1 from N's device carries, THEN
        # fetch N's tokens — the blocking D2H (relay RTT, the dominant
        # serving cost: 61 ms/burst wall vs ~22 ms device at 1B/B=16)
        # overlaps N+1's compute. Safe because device programs execute in
        # dispatch order (a finished row's pages can only be reused by a
        # LATER prefill program).
        self._pending = None

    # ------------------------------------------------------------------
    # public API (reference: generate llm.py:1705, stream llm.py:1892-1932)
    # ------------------------------------------------------------------

    def add_request(
        self,
        input_ids: Sequence[int],
        sampling: Optional[SamplingParams] = None,
        stream: bool = False,
        target_ids: Optional[Sequence[int]] = None,
        mm_embeds=None,
        mm_positions: Optional[Sequence[int]] = None,
    ) -> Request:
        req = Request(
            next(self._rid), list(input_ids), sampling, stream,
            list(target_ids) if target_ids else None,
            mm_embeds, list(mm_positions) if mm_positions else None,
        )
        req.arrival_t = time.perf_counter()
        # reject oversized prompts up-front: admitting one would overflow the
        # per-request page table and kill the scheduler thread (the reference
        # has the same failure mode; flood llm.py relies on callers)
        limit = self.ecfg.max_seq_len - 1
        total = req.prompt_len + len(req.target_ids or ())
        if total > limit:
            req.finish(f"error: prompt length {total} exceeds max_seq_len-1 ({limit})")
            return req
        with self._lock:
            self._queue.append(req)
        return req

    def generate(
        self,
        prompts: Union[Sequence[Sequence[int]], Sequence[str]],
        sampling: Optional[SamplingParams] = None,
    ) -> List[Request]:
        """Blocking batch generation; drives the scheduler inline unless a
        background loop is running (launch())."""
        reqs = []
        for p in prompts:
            ids = self.encode(p) if isinstance(p, str) else p
            reqs.append(self.add_request(ids, sampling))
        if self._running:
            while any(r.state != "finished" for r in reqs):
                time.sleep(0.001)
        else:
            while any(r.state != "finished" for r in reqs):
                self.step()
        return reqs

    def stream_generate(self, prompt, sampling=None):
        """Yield tokens for one request as they are produced."""
        ids = self.encode(prompt) if isinstance(prompt, str) else prompt
        req = self.add_request(ids, sampling, stream=True)
        if not self._running:
            while req.state != "finished" or not req.stream_queue.empty():
                self.step()
                while not req.stream_queue.empty():
                    t = req.stream_queue.get_nowait()
                    if t is None:
                        return
                    yield t
            return
        while True:
            t = req.stream_queue.get()
            if t is None:
                return
            yield t

    async def async_stream_generate(self, prompt, sampling=None):
        """Async token stream (reference llm.py:1932): requires launch()."""
        import asyncio

        ids = self.encode(prompt) if isinstance(prompt, str) else prompt
        req = self.add_request(ids, sampling, stream=True)
        assert self._running, "call launch() before async streaming"
        while True:
            try:
                t = req.stream_queue.get_nowait()
            except Exception:
                await asyncio.sleep(0.001)
                continue
            if t is None:
                return
            yield t

    def launch(self) -> None:
        """Start the background scheduler thread (reference llm.py:505)."""
        if self._running:
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def shutdown(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def encode(self, text: str) -> List[int]:
        assert self.tokenizer is not None, "no tokenizer loaded"
        return self.tokenizer.encode(text)

    def decode_text(self, ids: Sequence[int]) -> str:
        assert self.tokenizer is not None, "no tokenizer loaded"
        return self.tokenizer.decode(ids)

    # ------------------------------------------------------------------
    # scheduler
    # ------------------------------------------------------------------

    def _loop(self):
        while self._running:
            if not self.step():
                time.sleep(0.0005)

    def _active_rows(self) -> List[int]:
        return [i for i, r in enumerate(self._slots) if r is not None]

    def step(self) -> bool:
        """One scheduler iteration; ordering set by ecfg.schedule_policy
        (reference's pingpong/mix/timely schedulers, llm.py:587/1060/1298).
        Returns True if any work was done."""
        pol = self.ecfg.schedule_policy
        worked = self._score_phase()
        if pol == "timely":  # decode-first: inter-token latency over TTFT
            worked = self._decode_phase() or worked
            worked = self._prefill_phase() or worked
        elif pol == "mix":  # decode rows ride inside prefill batches
            mixed = self._prefill_phase(mix=True)
            worked = mixed or worked
            # no prefill work, or rep-penalty requests mix can't serve
            # (the seen-mask accumulates on the burst path) -> decode bursts
            rp_waiting = any(
                r is not None and r.state == "decode"
                and r.sampling.repetition_penalty != 1.0
                for r in self._slots
            )
            if not mixed or rp_waiting:
                worked = self._decode_phase() or worked
        else:
            worked = self._prefill_phase() or worked
            worked = self._decode_phase() or worked
        return worked

    def _score_phase(self) -> bool:
        """PPL-scoring requests (target_ids): one forward over
        prompt+targets, per-target logprobs, no decode (reference
        iterate_target + sampler targeting mode)."""
        from painlessinferenceacceleration_tpu.engine.step import score_step

        with self._lock:
            cand = [r for r in self._queue if r.target_ids]
            for r in cand:
                self._queue.remove(r)
        if not cand:
            return False
        self._drain_pending()  # scoring borrows from the shared page pool
        C = self.ecfg.prefill_chunk
        for req in cand:
            full = req.input_ids + req.target_ids
            need = self.allocator.pages_for_tokens(len(full))
            if need > self.ecfg.num_pages - 1:  # can NEVER fit: error out
                # instead of re-queueing forever (page 0 is reserved)
                req.finish(
                    f"error: scoring needs {need} pages, arena has "
                    f"{self.ecfg.num_pages - 1}"
                )
                continue
            self._reserve(need)
            pages = self.allocator.allocate(need)
            if pages is None:
                with self._lock:
                    self._queue.append(req)
                continue
            pt = np.zeros((1, self.ecfg.pages_per_req), np.int32)
            pt[0, : len(pages)] = pages
            # chunked scoring: arbitrary-length prompt+targets iterate in
            # prefill_chunk slices (reference iterate_target, request.py:57)
            tlps = []
            for off in range(0, len(full), C):
                chunk = full[off : off + C]
                buf = np.zeros((1, C), np.int32)
                buf[0, : len(chunk)] = chunk
                boundary = full[off + len(chunk)] if off + len(chunk) < len(full) else 0
                self.kv, tlp = score_step(
                    self.params, self.kv, self.cfg, jnp.asarray(buf),
                    jnp.array([off], jnp.int32),
                    jnp.array([len(chunk)], jnp.int32), jnp.asarray(pt),
                    self.quant, jnp.array([boundary], jnp.int32),
                )
                tlps.append(np.asarray(tlp[0][: len(chunk)]))
            tlp = np.concatenate(tlps)
            p0 = len(req.input_ids) - 1
            req.target_logprobs = [
                float(tlp[p0 + i]) for i in range(len(req.target_ids))
            ]
            self.allocator.free(pages)
            self.metrics.finished += 1
            req.finish("score")
        return True

    # ---- prefill ----

    def _admit(self) -> Optional[Request]:
        with self._lock:
            if not self._queue:
                return None
            req = self._queue.popleft()
        # find a free slot + pages for the prompt (+1 for the first token)
        slot = next((i for i, r in enumerate(self._slots) if r is None), None)
        source = req.prefill_source
        shared: List[int] = []
        matched = 0
        if (
            self.prefix_cache is not None
            and req.mm_embeds is None
            and not req.target_ids
        ):
            shared, matched = self.prefix_cache.match(source)
            # retain BEFORE any eviction/allocation: _reserve may evict the
            # just-matched entries (cache ref drops to 0, pages go free) and
            # allocate() could then hand the same page ids back as "fresh" —
            # the shared-prefix KV would be silently overwritten
            self.prefix_cache.retain_matched(shared)
        need = self.allocator.pages_for_tokens(len(source) + 1) - len(shared)
        if slot is None or not self._reserve(need + 1):
            if shared:
                self.allocator.free(shared)  # release the early retain
            with self._lock:
                self._queue.appendleft(req)  # backpressure: retry later
            return None
        fresh = self.allocator.allocate(need)
        if shared:
            self.metrics.prefix_hit_tokens += matched
        req.pages = shared + fresh
        req.done = matched  # prefill resumes after the shared prefix
        req.slot = slot
        req.state = "prefill"
        if self._glm:
            src = req.input_ids
            p_eff = max(len(src) - 1, 1)  # prompt ends with <sop>
            mids = self.cfg.mask_token_ids
            mpos = next(
                (j for j, t in enumerate(src) if t in mids), p_eff - 1
            )
            self._glm_np[slot] = (p_eff, max(mpos, 0))
        self._slots[slot] = req
        self._page_np[slot] = 0
        self._page_np[slot, : len(req.pages)] = req.pages
        self._ctx_np[slot] = 0
        return req

    def page_stats(self) -> dict:
        """KV-arena state histogram (reference Batch.slot_check,
        flood/utils/batch.py:1095-1102) plus prefix-cache entry count."""
        st = self.allocator.page_stats()
        st["prefix_entries"] = (
            len(self.prefix_cache) if self.prefix_cache is not None else 0
        )
        return st

    def _reserve(self, n_pages: int) -> bool:
        """True once ``n_pages`` are free, evicting LRU prefix-cache entries
        as needed (the reference reclaims shared slots the same way when
        allocation fails, flood batch.py:954-1001)."""
        # an evicted entry only frees its page if no live request still
        # holds it, so keep evicting until enough pages actually free up
        while (
            self.allocator.free_pages < n_pages
            and self.prefix_cache is not None
            and len(self.prefix_cache)
        ):
            self.prefix_cache.evict(n_pages - self.allocator.free_pages)
        return self.allocator.free_pages >= n_pages

    def _ensure_capacity(self, pages: List[int], n_tokens: int) -> bool:
        """allocator.ensure_capacity with prefix-cache eviction on pressure."""
        need = self.allocator.pages_for_tokens(n_tokens) - len(pages)
        if need > 0:
            self._reserve(need)
        return self.allocator.ensure_capacity(pages, n_tokens)

    def _prefill_phase(self, mix: bool = False) -> bool:
        # slots/pages must be current before admission — but only drain the
        # pipelined burst when there is actual prefill work, else the
        # every-iteration pingpong probe would kill decode chaining
        with self._lock:
            has_queue = bool(self._queue)
        has_mid = any(
            r is not None and r.state == "prefill" for r in self._slots
        )
        # a queued request can only be admitted into a FREE slot: when the
        # batch is full, probing the phase anyway would drain the pipelined
        # decode burst every iteration and kill chaining for the whole
        # full-batch steady state (the dominant serving regime — the
        # reference's pingpong likewise only flips to prefill when a slot
        # frees, flood llm.py:587-666)
        # batched admission (admit_min_free > 1): wait for that many free
        # slots before admitting — bounded-TTFT throughput knob.
        with self._lock:
            queued = len(self._queue)
        free_slots = sum(r is None for r in self._slots)
        # clamp to the slot count: admit_min_free > max_concurrency would
        # otherwise make can_admit permanently false once the batch drains
        # (free_slots can never reach want) and generate() would spin forever
        want = min(max(1, self.ecfg.admit_min_free), max(queued, 1),
                   len(self._slots))
        can_admit = queued > 0 and free_slots >= want
        if not (can_admit or has_mid or mix):
            return False
        # Drain the pipelined burst before admission. The overlap variant
        # (admit + prefill while the burst is still in flight,
        # PIA_PREFILL_OVERLAP=1) was measured NET-NEGATIVE: the prefill's
        # first-token fetch device-serializes behind the in-flight
        # idle-length burst (~80 ms at 1B/K=32), delaying admission and
        # dropping occupancy — A/B 2x each at 1B conc=32: drain 2810/2851
        # tok/s vs overlap 1839/1819.
        import os as _os

        if mix or _os.environ.get("PIA_PREFILL_OVERLAP", "0") != "1":
            self._drain_pending()
        C = self.ecfg.prefill_chunk
        did = False
        # admit as many queued requests as slots/pages allow, then run one
        # batched chunk per mid-prefill request (reference fills chunk_size
        # tokens across requests per step — llm.py:666-759)
        admitted = False
        while self._admit() is not None:
            admitted = True
        if not admitted and can_admit and self._pending is not None:
            # the in-flight burst may be holding just-freed pages/slots:
            # drain once and retry before giving up on admission
            self._drain_pending()
            while self._admit() is not None:
                pass
        while True:
            cand = [
                r for r in self._slots
                if r is not None and r.state == "prefill"
            ]
            if not cand:
                return did
            if mix:  # width-1 decode rows share the forward (mode-10 mix)
                for r in list(self._slots):
                    if r is None or r.state != "decode":
                        continue
                    # sampled rows ride the mix batch too (counter-mode
                    # sample_tokens_at reproduces the burst stream exactly —
                    # reference mode-10 mix has no greedy carve-out,
                    # flood/utils/batch.py:605). Repetition penalty needs
                    # the accumulating seen-mask: burst path only.
                    if r.sampling.repetition_penalty != 1.0:
                        continue
                    need = int(self._ctx_np[r.slot]) + 2
                    if need > self.ecfg.max_seq_len:
                        self._finish(r, "length")
                        continue
                    if not self._ensure_capacity(r.pages, need):
                        continue
                    self._page_np[r.slot, : len(r.pages)] = r.pages
                    cand.append(r)
            cand = cand[: self._bucket(len(cand))]
            t0 = time.perf_counter()
            B = self._bucket(len(cand))
            # NOTE: one fixed chunk width. A C/4 bucket for short batches was
            # measured NET-NEGATIVE on v5e (each extra (B, C) shape costs a
            # multi-second compile through the relay, and mixed traffic
            # forces the full width whenever one long row is present).
            buf = np.zeros((B, C), np.int32)
            starts = np.zeros((B,), np.int32)
            lens = np.zeros((B,), np.int32)
            idx = np.zeros((B,), np.int32)
            for k, req in enumerate(cand):
                if req.state == "decode":
                    buf[k, 0] = self._last_np[req.slot]
                    starts[k] = self._ctx_np[req.slot]
                    lens[k] = 1
                    idx[k] = req.slot
                    continue
                chunk = req.prefill_source[req.done : req.done + C]
                buf[k, : len(chunk)] = chunk
                starts[k] = req.done
                lens[k] = len(chunk)
                idx[k] = req.slot
            mm = {}
            if any(self._slots[int(i)].mm_embeds is not None
                   for i in idx[: len(cand)] if self._slots[int(i)] is not None):
                M = max(
                    len(r.mm_positions or ()) for r in cand
                )
                me = np.zeros((B, M, self.cfg.hidden_size), np.float32)
                mp = np.full((B, M), -1, np.int32)
                for k2, r in enumerate(cand):
                    if r.mm_embeds is not None:
                        m = len(r.mm_positions)
                        me[k2, :m] = r.mm_embeds
                        mp[k2, :m] = r.mm_positions
                mm = dict(mm_embeds=jnp.asarray(me), mm_pos=jnp.asarray(mp))
            if self._glm:
                mm = dict(mm, glm_ids=jnp.asarray(self._glm_np[idx]))
            self.kv, nxt, logits = prefill_step(
                self.params, self.kv, self.cfg, jnp.asarray(buf),
                jnp.asarray(starts), jnp.asarray(lens),
                jnp.asarray(self._page_np[idx]), self.quant,
                jnp.asarray(idx), **mm,
            )
            nxt_np = np.asarray(nxt)
            # sampled requests draw from the filtered distribution with
            # counter-mode keys (ops/sample.py sample_tokens_at): prefill
            # rows at stream position prompt_len (the first token), mix
            # decode rows at ctx+1 — exactly the positions the decode burst
            # uses, so mix serving reproduces the burst stream token-for-
            # token for sampled requests too.
            if any(r.sampling.temperature > 0 for r in cand):
                from painlessinferenceacceleration_tpu.ops.sample import (
                    sample_tokens_at,
                )

                tarr, karr, parr, marr, sarr = self._pack_sampling(cand, B)
                posn = np.zeros((B,), np.int32)
                for k2, r in enumerate(cand):
                    posn[k2] = (
                        int(starts[k2]) + 1 if r.state == "decode"
                        else len(r.prefill_source)
                    )
                sampled = np.asarray(sample_tokens_at(
                    logits, jnp.asarray(sarr), jnp.asarray(posn),
                    jnp.asarray(tarr), jnp.asarray(karr), jnp.asarray(parr),
                    jnp.asarray(marr),
                ))
                nxt_np = np.where(tarr > 0, sampled, nxt_np)
            did = True
            for k, req in enumerate(cand):
                if req.state == "decode":  # mix rows: one AR token each
                    tok = int(nxt_np[k])
                    self._commit_tokens(req, [tok], tok, int(starts[k]) + 1)
                    self.metrics.decode_steps += 1
                    continue
                req.done += int(lens[k])
                if req.done >= len(req.prefill_source):
                    self._finish_prefill(req, int(nxt_np[k]))
            self.metrics.prefill_time += time.perf_counter() - t0

    def _finish_prefill(self, req: Request, first: int) -> None:
        resumed = bool(req.output_ids)  # preempted request replaying its KV
        if resumed:
            first = req.output_ids[-1]  # already committed; re-seed decode
        else:
            req.last_token = first
            req.first_token_t = time.perf_counter()
            req.emit([first])
            self.metrics.ttft.append(req.first_token_t - req.arrival_t)
        req.state = "decode"
        self._last_np[req.slot] = first
        self._ctx_np[req.slot] = len(req.prefill_source)
        if self.prefix_cache is not None and req.mm_embeds is None:
            # publish this prompt's full pages for future shared-prefix hits
            self.prefix_cache.register(req.prefill_source, req.pages)
        if self.tables is not None:
            seed = req.prefill_source + [first]
            if not resumed:  # a resume re-plays tokens the tables already saw
                # pow2-bucketed buffer: a raw len(seed) array would compile
                # a fresh update loop PER DISTINCT PROMPT LENGTH (measured
                # ~6 s/request of prefill wall at 7B spec serving)
                cap = 1 << (max(len(seed), 16) - 1).bit_length()
                buf = np.full((min(cap, self.ecfg.max_seq_len + 1),), -1,
                              np.int32)
                n = min(len(seed), buf.shape[0])
                buf[:n] = seed[:n]
                self.tables = update_tables_seq(
                    self.tables, self.tcfg, jnp.asarray(buf), jnp.int32(n)
                )
            TAIL = self._tails.shape[1]
            self._tails[req.slot] = -1
            tail = seed[-TAIL:]
            self._tails[req.slot, -len(tail):] = tail
        self._maybe_finish(req)

    # ---- decode ----

    def _bucket(self, n: int) -> int:
        for b in self.ecfg.decode_buckets:
            if b >= n:
                return min(b, self.ecfg.max_concurrency)
        return self.ecfg.max_concurrency

    def calibrate_kv_scales(self, prompts: Sequence[Sequence[int]]) -> None:
        """Amax-calibrate the static fp8 KV scales (kv_quant='fp8').

        The reference's static FP8 cache path takes externally calibrated
        input scales (csrc/quantize/fp8_quant.cu static_scaled_fp8_quant);
        here: prefill the calibration prompts into a THROWAWAY bf16 arena,
        measure per-(layer, head) K/V amax from the written pages, and
        rebuild the fp8 arena with scale = amax / 448."""
        assert self.ecfg.kv_quant == "fp8", "calibration is for static fp8 KV"
        import dataclasses as _dc

        cal_ecfg = _dc.replace(self.ecfg, kv_quant="none")
        kv = init_kv_cache(self.cfg, cal_ecfg, dtype=jnp.bfloat16)
        P = self.ecfg.pages_per_req
        ps = self.ecfg.page_size
        C = min(self.ecfg.prefill_chunk, self.ecfg.max_seq_len)
        used = 1  # page 0 is the null page
        for p in prompts:
            p = list(p)[: self.ecfg.max_seq_len - 1]
            need = -(-len(p) // ps)
            if used + need > self.ecfg.num_pages:
                break  # arena full: calibrate on what fits (no page reuse —
                # wrapping would overwrite earlier prompts before amax)
            pt_np = np.zeros((1, P), np.int32)
            pt_np[0, :need] = np.arange(used, used + need, dtype=np.int32)
            used += need
            # fixed-width chunks: one compiled prefill shape, not one per
            # distinct prompt length (multi-second relay compiles each)
            done = 0
            while done < len(p):
                chunk = p[done : done + C]
                buf = np.zeros((1, C), np.int32)
                buf[0, : len(chunk)] = chunk
                kv, _, _ = prefill_step(
                    self.params, kv, self.cfg, jnp.asarray(buf),
                    jnp.array([done], jnp.int32),
                    jnp.array([len(chunk)], jnp.int32),
                    jnp.asarray(pt_np), self.quant,
                )
                done += len(chunk)
        Hk = self.cfg.num_key_value_heads
        D = self.cfg.head_dim

        def amax(pages):  # [L, np, ps, Hk*D] -> [L, Hk]
            a = jnp.abs(pages.astype(jnp.float32))
            L = a.shape[0]
            a = a.reshape(L, -1, Hk, D)
            return jnp.max(a, axis=(1, 3))

        k_amax = np.asarray(amax(kv["k"]))
        v_amax = np.asarray(amax(kv["v"]))
        self.kv = init_kv_cache(self.cfg, self.ecfg, dtype=self.dtype)
        # 1.25x headroom: generation activations can exceed the
        # calibration amax; anything past it saturates at the write
        self.kv["k_scale"] = jnp.asarray(
            np.maximum(k_amax * 1.25 / 448.0, 1e-8), jnp.float32
        )
        self.kv["v_scale"] = jnp.asarray(
            np.maximum(v_amax * 1.25 / 448.0, 1e-8), jnp.float32
        )

    def _pack_sampling(self, reqs, B: int):
        """Per-row sampling parameter arrays (one builder for the prefill
        first-token and decode-burst paths — a new parameter only needs to
        be threaded here)."""
        tarr = np.zeros((B,), np.float32)
        karr = np.zeros((B,), np.int32)
        parr = np.ones((B,), np.float32)
        marr = np.zeros((B,), np.float32)
        sarr = np.zeros((B,), np.int32)
        for k, r in enumerate(reqs):
            sp = r.sampling
            tarr[k], karr[k], parr[k] = sp.temperature, sp.top_k, sp.top_p
            marr[k], sarr[k] = sp.min_p, sp.seed
        return tarr, karr, parr, marr, sarr

    def _drain_pending(self) -> None:
        """Fetch + commit the in-flight pipelined burst (if any)."""
        p, self._pending = self._pending, None
        if p is None:
            return
        t0 = time.perf_counter()
        toks_np = np.asarray(p["toks"])  # blocks until the burst lands
        last_np = np.asarray(p["last"])
        ctx_np = np.asarray(p["ctx"])
        feeds = []
        for k, (i, req) in enumerate(zip(p["rows"], p["reqs"])):
            if req.state == "finished" or req.slot != i:
                continue  # finished (or slot reused) while in flight
            emitted = [int(t) for t in toks_np[k] if t >= 0]
            self._commit_tokens(req, emitted, last_np[k], ctx_np[k])
            if self.tables is not None and emitted:
                feeds.append((i, emitted))
        if feeds:
            self._feed_tables_batch(feeds)
        self.metrics.decode_steps += p["K"]
        dt = time.perf_counter() - t0
        self.metrics.decode_time += dt
        self.metrics.drain_time += dt  # D2H fetch share (relay RTT bound)

    def _feed_tables_batch(self, feeds) -> None:
        """Plain decode bursts still feed the draft tables (the reference
        updates tables from finished outputs too, flood llm.py:986-987).
        ONE dispatch for the whole burst (update_tables_batch): per-row
        update_tables_seq calls cost a relay dispatch each (~0.2 s/row
        measured at 7B spec serving)."""
        TAIL = self._tails.shape[1]
        # fixed [Bmax, W] buffer: the update loop's shape stays constant
        # across bursts (one compile)
        W = TAIL + max(self.ecfg.decode_burst, self.ecfg.decode_burst_idle)
        B = self.ecfg.max_concurrency
        bufs = np.full((B, W), -1, np.int32)
        n_valid = np.zeros((B,), np.int32)
        lo = np.zeros((B,), np.int32)
        hi = np.zeros((B,), np.int32)
        for k, (i, emitted) in enumerate(feeds):
            prev = [t for t in self._tails[i] if t >= 0]
            seq = prev + emitted
            n = min(len(seq), W)
            bufs[k, :n] = seq[:W]
            n_valid[k] = n
            lo[k] = len(prev)
            hi[k] = n
            tail = seq[-TAIL:]
            self._tails[i] = -1
            self._tails[i, -len(tail):] = tail
        self.tables = update_tables_batch(
            self.tables, self.tcfg, jnp.asarray(bufs),
            jnp.asarray(n_valid), jnp.asarray(lo), jnp.asarray(hi),
        )

    def _try_chain(self) -> bool:
        """Dispatch the next AR burst straight from the pending burst's
        device carries (no host round-trip), then drain the pending one.
        Returns False (without draining) when the batch shape/conditions
        changed and the normal rebuild path must run."""
        p = self._pending
        if p is None:
            return False
        rows = [
            i for i, r in enumerate(self._slots)
            if r is not None and r.state == "decode"
        ]
        Kp = p["K"]  # the pending burst's length (its ctx advance bound)
        # the chained burst may be LONGER than the pending one: once the
        # batch is full (or the queue idle) the steady state should run at
        # decode_burst_idle, not perpetuate the short pre-admission K
        K = Kp
        with self._lock:
            idle = not self._queue
        if idle or all(r is not None for r in self._slots):
            K = max(K, self.ecfg.decode_burst_idle)
            K = 1 << (max(K, 1).bit_length() - 1)  # jit-static power of two
        msl = self.ecfg.max_seq_len
        # SUBSET chaining: rows that finished since the pending burst was
        # built stay in the batch as DEACTIVATED lanes (act=False on
        # device: no emission, no ctx advance, no KV writes) instead of
        # forcing a drain+rebuild. Serving traffic finishes ~a request per
        # burst, so the strict rows==p["rows"] gate engaged chaining only
        # 18/140 bursts (measured, 1B conc=32) and the decode wall was
        # ~80% D2H relay RTT. Rebuild only once half the lanes are dead
        # (or admissions actually need the slots: _decode_phase runs after
        # the scheduler's prefill probe).
        live = set(rows)
        prev_rows = list(p["rows"])
        idx_of = {r: k for k, r in enumerate(prev_rows)}
        # identity, not just slot index: a freed slot can be REUSED by a
        # newly admitted request between bursts — its lane carry would
        # belong to the old request
        subset_ok = (
            len(rows) > 0
            and live <= set(prev_rows)
            and all(self._slots[i] is p["reqs"][idx_of[i]] for i in rows)
        )
        frac_ok = 2 * len(rows) >= len(prev_rows)
        ok = (
            subset_ok
            and frac_ok
            and (
                self.tables is None
                or len(rows) > self.ecfg.use_spec_min_batch_size
            )
            and p["chain_ok"]
            # conservative: pending advances <= Kp, the new burst <= K more
            and all(int(self._ctx_np[i]) + Kp + K + 2 <= msl for i in rows)
        )
        if not ok:
            return False
        act_in = p["act"]
        if len(rows) != len(prev_rows):
            # lane k of the (padded) batch carries prev_rows[k]; pad lanes
            # beyond len(prev_rows) stay whatever act says (inactive)
            lanes = int(act_in.shape[0])
            keep = np.ones((lanes,), bool)
            for k, r in enumerate(prev_rows):
                keep[k] = r in live
            act_in = act_in & jnp.asarray(keep)
        # page headroom with the STALE committed ctx (covers both bursts)
        pts_dirty = False
        for i in rows:
            req = self._slots[i]
            held = len(req.pages)
            if not self._ensure_capacity(
                req.pages, int(self._ctx_np[i]) + Kp + K + 2
            ):
                return False
            if len(req.pages) != held:
                self._page_np[i, : len(req.pages)] = req.pages
                pts_dirty = True
        t0 = time.perf_counter()
        pts = jnp.asarray(self._page_np[list(p["idx"])]) if pts_dirty else p["pts"]
        # chained budget: the device carries the decremented budget from
        # the pending burst (bleft) — no host-computed budget re-upload per
        # chain (a tiny H2D through the relay costs more than the chain
        # saves)
        self.kv, toks, last2, ctx2, act2, bleft2 = multistep_decode(
            self.params, self.kv, self.cfg, p["last"], p["ctx"], act_in,
            pts, n_steps=K, eos=p["eos"], spec=self.quant,
            slot_ids=p["slot_ids"], budget=p["bleft"], **p["samp"],
        )
        newp = dict(p, K=K, toks=toks, last=last2, ctx=ctx2, act=act2,
                    pts=pts, bleft=bleft2)
        self.metrics.chained_bursts += 1
        self.metrics.decode_time += time.perf_counter() - t0
        self._drain_pending()
        self._pending = newp
        return True

    def _decode_phase(self) -> bool:
        if self._try_chain():
            return True
        self._drain_pending()
        rows = [
            i for i, r in enumerate(self._slots)
            if r is not None and r.state == "decode"
        ]
        if not rows:
            return False
        t0 = time.perf_counter()
        K = self._decode_burst
        use_spec = (
            self.tables is not None
            and len(rows) <= self.ecfg.use_spec_min_batch_size
            # chunk-level adaptive gate: after a burst whose draft
            # retrieval ran dry, decode stays on plain AR bursts for
            # spec_cooldown_bursts before retrying (the TPU-shaped form of
            # the reference's confidence-gated draft size — a per-step
            # cond would copy the KV arena, DraftTableConfig.adaptive)
            and self._spec_cooldown == 0
            # sampled requests verify against counter-mode sampled targets
            # (reference pretrained_model.py:827-860); repetition penalty
            # depends on in-step accepted history, so it stays on the AR path
            and all(
                self._slots[i].sampling.repetition_penalty == 1.0
                for i in rows
            )
        )
        if self._spec_cooldown and self.tables is not None:
            self._spec_cooldown -= 1
        Q = self.tcfg.verify_width if use_spec else 1
        # length budget: rows that cannot fit even ONE AR step (ctx+2 tokens)
        # have genuinely reached max_seq_len; for the rest, a wide spec Q
        # that would overrun max_seq_len falls back to AR (Q=1) instead of
        # mis-finishing the request as "length"
        msl = self.ecfg.max_seq_len
        for i in list(rows):
            if int(self._ctx_np[i]) + 2 > msl:
                self._finish(self._slots[i], "length")
                rows.remove(i)
        if not rows:
            return True
        if use_spec and any(
            int(self._ctx_np[i]) + 2 * Q > msl for i in rows
        ):
            use_spec = False
            Q = 1
        # amortize the host sync over a longer burst (each burst = one
        # D2H fetch through the relay) whenever no admission can happen
        # during it: queue empty, OR batch full (a queued request can't
        # enter until a slot frees, so a longer burst delays nothing).
        # Applies to the SPEC path too (r5: spec bursts were pinned at
        # decode_burst=8, so spec serving paid a relay drain every ~8
        # verify steps while AR bursts amortized over decode_burst_idle).
        with self._lock:
            idle = not self._queue
        slots_full = all(r is not None for r in self._slots)
        if idle or slots_full:
            K = max(K, self.ecfg.decode_burst_idle)
        # page headroom for the burst (+Q: drafts are written before verify).
        # A row whose pages cannot cover the burst must NOT be dispatched
        # (its tokens would scatter into the shared null page): shrink the
        # burst to what fits, else park the row for this step (the
        # reference parks such requests in waits — flood llm.py:848-871)
        ps = self.ecfg.page_size
        # shrink the burst so every row's ctx + K*Q + Q fits max_seq_len
        # (every row fits at least one step after the Q fallback above)
        K = min(K, min((msl - int(self._ctx_np[i]) - Q) // Q for i in rows))
        K = 1 << (max(K, 1).bit_length() - 1)  # jit-static power of two
        kept, parked = [], []
        for i in rows:
            req = self._slots[i]
            ctx = int(self._ctx_np[i])
            need = ctx + K * Q + Q
            if self._ensure_capacity(req.pages, int(need)):
                kept.append(i)
                self._page_np[i, : len(req.pages)] = req.pages
                continue
            cap = len(req.pages) * ps + self.allocator.free_pages * ps
            k_fit = min(K, (cap - ctx - Q) // Q)
            if k_fit >= 1:  # snap to a power of two: n_steps is a jit-static
                k_fit = 1 << (int(k_fit).bit_length() - 1)
            if k_fit >= 1 and self._ensure_capacity(
                req.pages, ctx + k_fit * Q + Q
            ):
                K = k_fit  # burst shrinks for the whole batch
                kept.append(i)
                self._page_np[i, : len(req.pages)] = req.pages
            else:
                parked.append(i)
        rows = kept
        if not rows:
            if parked:
                # nothing can run and pages are exhausted: preempt the
                # youngest starved request (recompute later) so the rest can
                # make progress; a lone request that still cannot fit has
                # genuinely outgrown the arena
                victim = self._slots[max(
                    parked, key=lambda i: self._slots[i].arrival_t
                )]
                residents = sum(1 for r in self._slots if r is not None)
                if residents > 1:
                    self._preempt(victim)
                else:
                    self._finish(victim, "length")
            return True

        B = self._bucket(len(rows))
        rows = rows[:B]
        idx = np.zeros((B,), np.int32)
        idx[: len(rows)] = rows
        last = jnp.asarray(self._last_np[idx])
        ctx = jnp.asarray(self._ctx_np[idx])
        active = jnp.asarray(
            np.array([k < len(rows) for k in range(B)], bool)
        )
        pts = jnp.asarray(self._page_np[idx])
        eos_np = np.full((B,), -2, np.int32)
        # per-row emission budget: rows deactivate on device at
        # max_new_tokens so idle-length bursts stop paying forwards for
        # finished requests (measured 3.8x accepted-vs-committed waste at
        # 7B spec serving before this)
        rem_np = np.ones((B,), np.int32)
        for k, i in enumerate(rows):
            r = self._slots[i]
            e = r.sampling.eos_token_id
            eos_np[k] = self.ecfg.eos_token_id if e is None else e
            rem_np[k] = max(1, r.sampling.max_new_tokens - len(r.output_ids))
        eos = jnp.asarray(eos_np)
        budget = jnp.asarray(rem_np)

        # per-row sampling parameters (shared by both paths; counter-mode
        # seeds make the sampled spec path reproduce the AR stream exactly)
        samp = {}
        temps = [self._slots[i].sampling.temperature for i in rows]
        if any(t > 0 for t in temps):
            tarr, karr, parr, marr, sarr = self._pack_sampling(
                [self._slots[i] for i in rows], B
            )
            samp = dict(
                temperature=jnp.asarray(tarr), top_k=jnp.asarray(karr),
                top_p=jnp.asarray(parr), min_p=jnp.asarray(marr),
                seeds=jnp.asarray(sarr),
            )

        if use_spec:
            tails = jnp.asarray(self._tails[idx])
            if self._glm:
                samp = dict(samp, glm_ids=jnp.asarray(self._glm_np[idx]))
            (
                self.kv, self.tables, out_toks, n_acc, last2, ctx2, act2,
                tails2, wides,
            ) = multistep_spec_decode(
                self.params, self.kv, self.tables, self.cfg, self.tcfg,
                last, ctx, active, tails, pts, n_steps=K, eos=eos,
                spec=self.quant, slot_ids=jnp.asarray(idx), budget=budget,
                **samp,
            )
            out_np = np.asarray(out_toks)  # sync
            acc_np = np.asarray(n_acc)
            self._tails[idx] = np.asarray(tails2)
            for k, i in enumerate(rows):
                req = self._slots[i]
                toks: List[int] = []
                for s in range(out_np.shape[1]):
                    kk = int(acc_np[k, s])
                    toks.extend(int(x) for x in out_np[k, s, :kk])
                self._commit_tokens(req, toks, np.asarray(last2)[k], np.asarray(ctx2)[k])
                self.metrics.spec_steps += out_np.shape[1]
                self.metrics.spec_accepted += len(toks)
            wides_np = np.asarray(wides)
            self.metrics.spec_wide_steps += int(wides_np.sum())
            if (
                self.ecfg.spec_cooldown_bursts
                and wides_np.mean() < self.ecfg.spec_gate_threshold
            ):
                self._spec_cooldown = self.ecfg.spec_cooldown_bursts
        else:
            reps = [self._slots[i].sampling.repetition_penalty for i in rows]
            if any(r != 1.0 for r in reps):
                rp = np.ones((B,), np.float32)
                seen = np.zeros((B, self.cfg.vocab_size), bool)
                for k, i in enumerate(rows):
                    rp[k] = self._slots[i].sampling.repetition_penalty
                    req = self._slots[i]
                    seen[k, req.input_ids] = True
                    seen[k, req.output_ids] = True
                samp["rep_penalty"] = jnp.asarray(rp)
                samp["seen_mask"] = jnp.asarray(seen)
            slot_ids = jnp.asarray(idx)
            if self._glm:
                samp = dict(samp, glm_ids=jnp.asarray(self._glm_np[idx]))
            self.kv, toks, last2, ctx2, act2, bleft = multistep_decode(
                self.params, self.kv, self.cfg, last, ctx, active, pts,
                n_steps=K, eos=eos, spec=self.quant,
                slot_ids=slot_ids, budget=budget, **samp,
            )
            # don't fetch: park the burst so the NEXT decode phase can chain
            # off its device carries while this burst's D2H overlaps it
            self._pending = dict(
                rows=tuple(rows), reqs=[self._slots[i] for i in rows],
                K=K, toks=toks, last=last2, ctx=ctx2, act=act2, pts=pts,
                eos=eos, idx=tuple(int(x) for x in idx), samp=samp,
                slot_ids=slot_ids, bleft=bleft,
                # rep-penalty masks depend on drained outputs: no chaining
                chain_ok="rep_penalty" not in samp,
            )  # decode_steps are counted at drain time
        self.metrics.decode_time += time.perf_counter() - t0
        return True

    def _preempt(self, req: Request) -> None:
        """Reclaim a starved request's pages and requeue it for recompute
        (reference: parked ``waits`` + allocation-failure requeue, flood
        llm.py:848-871; we replay prompt+outputs through chunked prefill)."""
        self.allocator.free(req.pages)
        req.pages = []
        self._slots[req.slot] = None
        req.slot = None
        req.state = "queued"
        req.done = 0
        self.metrics.preempted += 1
        with self._lock:
            self._queue.appendleft(req)

    def _commit_tokens(self, req: Request, toks: List[int], last, ctx):
        i = req.slot
        self._last_np[i] = last
        self._ctx_np[i] = ctx
        eos = req.sampling.eos_token_id
        if eos is None:
            eos = self.ecfg.eos_token_id
        # budget cut FIRST: an eos/stop completion past max_new_tokens must
        # not set a finish reason whose tokens then get dropped
        room = req.sampling.max_new_tokens - len(req.output_ids)
        toks = toks[:room]
        if eos in toks:
            toks = toks[: toks.index(eos) + 1]
        if req.sampling.stop_sequences and toks:
            # truncate at the first completed stop sequence (HF stopping
            # criteria semantics; reference pretrained_model.py:348-360).
            # Only a bounded tail of the history can participate.
            max_stop = max(len(s) for s in req.sampling.stop_sequences)
            tail = list(req.output_ids[-(max_stop - 1):]) if max_stop > 1 else []
            for j, t in enumerate(toks):
                tail.append(t)
                for seq in req.sampling.stop_sequences:
                    if len(seq) <= len(tail) and tail[-len(seq):] == list(seq):
                        toks = toks[: j + 1]
                        req.finish_reason = "stop_sequence"
                        break
                if req.finish_reason == "stop_sequence":
                    break
        if toks:
            req.emit(toks)
            req.last_token = toks[-1]
        self._maybe_finish(req)

    def _maybe_finish(self, req: Request):
        eos = req.sampling.eos_token_id
        if eos is None:
            eos = self.ecfg.eos_token_id
        if req.finish_reason == "stop_sequence":
            self._finish(req, "stop_sequence")
        elif req.output_ids and req.output_ids[-1] == eos:
            self._finish(req, "stop")
        elif len(req.output_ids) >= req.sampling.max_new_tokens:
            self._finish(req, "length")

    def _finish(self, req: Request, reason: str):
        req.finish_t = time.perf_counter()
        self.metrics.finished += 1
        self.metrics.generated_tokens += len(req.output_ids)
        self.allocator.free(req.pages)
        req.pages = []
        self._slots[req.slot] = None
        req.finish(reason)
