"""HPD-Parsing continuous-batching scheduler with per-branch P-MTP.

Re-expresses the reference's fork scheduler
(oar-ocr-vl/src/hpd_parsing/model.rs:467-723):

- the parent decodes with fork permission; every emitted ``<FORK>`` token
  spawns a child branch whose KV is the parent's cache UP TO the fork
  position (``fork_at(prefix_len)``, :502) and whose first input is the
  ``<CHILD>`` token embedding (:478, :519);
- all live branches advance as ONE decode batch per scheduler round;
  newly forked children are admitted with priority, preempting older
  unfinished branches into a FIFO waiting queue when the pool exceeds
  ``max_active_branches`` (:541-555);
- with P-MTP, each branch drafts ``num_speculative_tokens`` tokens
  through the trained MTP head (llm_decoders.HpdMtpHead) and one causal
  target pass verifies them; the matched prefix is accepted and the
  cache trimmed (:605-702). Greedy and MTP modes emit identical tokens.

TPU-native shape discipline: branches live in a SLOT POOL — one KV cache
whose batch dimension is a power-of-two slot count, grown on demand.
Every round runs one jitted program over all slots (a per-slot
``advance`` mask freezes waiting/finished rows); per-row KV positions
ride ``KVCache.append`` row-vector writes and the per-row block mask.
Where the reference forks zero-copy tensor VIEWS, the TPU analog is an
HBM row copy (slots past the logical length are masked).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kv_cache import KVCache, decoder_cache_capacity

DEFAULT_SPECULATIVE_TOKENS = 6    # hpd_parsing/model.rs:19
DEFAULT_MAX_ACTIVE_BRANCHES = 64  # model.rs:23-41


@dataclass
class HpdSchedulerConfig:
    """HpdGenerationConfig parity (model.rs:23-41)."""

    max_new_tokens: int = 48
    use_mtp: bool = True
    num_speculative_tokens: int = DEFAULT_SPECULATIVE_TOKENS
    max_active_branches: int = DEFAULT_MAX_ACTIVE_BRANCHES

    def validate(self) -> None:
        from ..errors import InvalidInputError

        if self.use_mtp and self.num_speculative_tokens == 0:
            raise InvalidInputError(
                "num_speculative_tokens must be non-zero when P-MTP is on")
        if self.max_active_branches == 0:
            raise InvalidInputError("max_active_branches must be non-zero")


@dataclass
class HpdStats:
    """HpdRuntimeStats parity (model.rs:71-81)."""

    scheduler_rounds: int = 0
    peak_active_branches: int = 0
    forked_branches: int = 0
    shared_prefix_tokens: int = 0
    mtp_drafted_tokens: int = 0
    mtp_accepted_tokens: int = 0


@dataclass
class _Branch:
    slot: int
    child_index: Optional[int]          # None = parent
    allow_fork: bool
    max_new: int
    pending: int                        # next input token (not yet in KV)
    fresh: bool                         # first round after fork: input is
                                        # <CHILD>, which is never emitted
    tokens: List[int] = field(default_factory=list)
    finished: bool = False


@dataclass
class HpdSchedulerOutput:
    parent_tokens: List[int]
    children: List[List[int]]
    token_ids: List[int]                # parent with children spliced in
    stats: HpdStats


class HpdContinuousScheduler:
    """Drives an ``ExactVLM``-style model through the fork scheduler."""

    def __init__(self, model, *, fork_token_id: int, child_token_id: int,
                 stop_token_ids: Tuple[int, ...] = (),
                 mtp_params=None, seed: int = 11):
        from .llm_decoders import HpdMtpHead

        self.model = model
        c = model.spec.text_cfg
        self.cfg_text = c
        self.fork_token_id = int(fork_token_id)
        self.child_token_id = int(child_token_id)
        self.stop_token_ids = set(int(s) for s in stop_token_ids)
        self.stop_token_ids.add(c.eos_id)
        self.mtp = HpdMtpHead(c)
        if mtp_params is None:
            mtp_params = self.mtp.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, c.hidden), jnp.float32),
                jnp.zeros((1, c.hidden), jnp.float32))
        self.mtp_params = model.runtime.put_params_vl(mtp_params)
        self._round_jits: Dict[Tuple[int, int], object] = {}

    # ------------------------------------------------------------------
    def _round_impl(self, params, mparams, cache: KVCache, hidden,
                    pending, fresh, advance, *, k: int):
        """One scheduler round over all S slots: k MTP draft steps +
        one causal verify pass (advance_mtp_batch, model.rs:605-702;
        k=0 is advance_greedy_batch, :568-603)."""
        from .exact_models import ExactVLMModule

        module = self.model.module
        s = pending.shape[0]
        starts = cache.length

        drafts = []
        h = hidden
        prev = pending
        for _ in range(k):
            e = module.apply(params, prev[:, None],
                             method=ExactVLMModule.embed)[:, 0]
            h = self.mtp.apply(mparams, h.astype(jnp.float32),
                               e.astype(jnp.float32))
            logits = module.apply(params, h,
                                  method=ExactVLMModule.lm_logits)
            prev = jnp.argmax(logits, -1).astype(jnp.int32)
            drafts.append(prev)
        if k:
            drafts_a = jnp.stack(drafts, 1)                 # (S, k)
            verify = jnp.concatenate([pending[:, None], drafts_a], 1)
        else:
            verify = pending[:, None]
        pids = starts[:, None] + jnp.arange(k + 1)[None, :]
        ds, cv = self.model._empty_states(params, s)
        logits, hid, cache, _, _ = module.apply(
            params, verify, pids, cache, starts, ds, cv,
            method=ExactVLMModule.decode_block_hidden)
        targets = jnp.argmax(logits, -1).astype(jnp.int32)  # (S, k+1)
        if k:
            eq = (drafts_a == targets[:, :k]).astype(jnp.int32)
            matched = jnp.sum(jnp.cumprod(eq, axis=1), axis=1)
        else:
            matched = jnp.zeros((s,), jnp.int32)
        # fresh rows accept nothing (start_branch, model.rs:438-465:
        # the <CHILD> forward only seeds hidden + first pending token);
        # frozen rows neither advance nor keep the garbage writes
        matched = jnp.where(fresh | ~advance, 0, matched)
        cache = cache.with_lengths(
            jnp.where(advance, starts + 1 + matched, starts))
        idx = jnp.arange(s)
        new_hidden = jnp.where(advance[:, None],
                               hid[idx, matched].astype(hidden.dtype),
                               hidden)
        return targets, matched, cache, new_hidden

    def _round(self, s: int, k: int):
        fn = self._round_jits.get((s, k))
        if fn is None:
            fn = jax.jit(functools.partial(self._round_impl, k=k))
            self._round_jits[(s, k)] = fn
        return fn

    # ------------------------------------------------------------------
    def run(self, prefix_cache: KVCache, first_token: int, first_hidden,
            gen: HpdSchedulerConfig) -> HpdSchedulerOutput:
        """Schedule from a completed batch-1 prefill.

        ``prefix_cache``: 1-row cache holding the prompt KV (advanced to
        the prompt length); ``first_token``: the parent's pending token
        (argmax of the prefill logits); ``first_hidden``: (1, H) last
        prefill hidden (the P-MTP producer)."""

        gen.validate()
        stats = HpdStats()
        capacity = prefix_cache.capacity
        c = self.cfg_text

        s = 1
        cache = KVCache.create(c.layers, s, c.kv_heads, capacity,
                               c.head_dim, dtype=prefix_cache.k.dtype)
        cache = KVCache(cache.k.at[:, 0].set(prefix_cache.k[:, 0]),
                        cache.v.at[:, 0].set(prefix_cache.v[:, 0]),
                        cache.length.at[0].set(prefix_cache.length[0]),
                        cache.pad)
        hidden = jnp.zeros((s, c.hidden), jnp.float32)
        hidden = hidden.at[0].set(jnp.asarray(first_hidden,
                                              jnp.float32).reshape(-1))

        parent = _Branch(slot=0, child_index=None, allow_fork=True,
                         max_new=gen.max_new_tokens,
                         pending=int(first_token), fresh=False)
        active: List[_Branch] = [parent]
        waiting: List[_Branch] = []
        free_slots: List[int] = []
        children_tokens: List[List[int]] = []
        parent_tokens: Optional[List[int]] = None
        lengths = [int(prefix_cache.length[0])]   # host mirror per slot

        def grow(min_slots: int):
            nonlocal s, cache, hidden, lengths
            new_s = s
            while new_s < min_slots:
                new_s *= 2
            if new_s != s:
                cache = cache.pad_batch(new_s)
                hidden = jnp.pad(hidden, ((0, new_s - s), (0, 0)))
                lengths = lengths + [0] * (new_s - s)
                free_slots.extend(range(s, new_s))
                s = new_s

        while active or waiting:
            while len(active) < gen.max_active_branches and waiting:
                active.append(waiting.pop(0))
            stats.scheduler_rounds += 1
            stats.peak_active_branches = max(stats.peak_active_branches,
                                             len(active))

            k = gen.num_speculative_tokens if gen.use_mtp else 0
            if k:
                # BINARY k (K or 0): every distinct (s, k) pair is a
                # separately compiled round program, and shrinking k as
                # branches approached their token cap stepped K-1..0 —
                # one slow remote compile per notch. Per-branch budgets
                # are enforced at emit() (the host loop stops at
                # br.max_new), so the only hard constraint is the
                # capacity write window: dynamic_update_slice clamps
                # starts, which would clobber a waiting branch's valid
                # KV tail. Only slots owned by live branches count — a
                # freed slot's stale length must not pin k for the rest
                # of the schedule. If the full-K window cannot fit every
                # live slot, fall back to a greedy round.
                live_max = max((lengths[br.slot]
                                for br in active + waiting), default=0)
                if capacity - live_max - 2 < k:
                    k = 0
            adv = np.zeros((s,), bool)
            fresh = np.zeros((s,), bool)
            pending = np.zeros((s,), np.int32)
            for br in active:
                adv[br.slot] = True
                fresh[br.slot] = br.fresh
                pending[br.slot] = br.pending
            if gen.use_mtp:
                stats.mtp_drafted_tokens += k * sum(
                    1 for br in active if not br.fresh)

            targets, matched, cache, hidden = self._round(s, k)(
                self.model.params, self.mtp_params, cache, hidden,
                jnp.asarray(pending), jnp.asarray(fresh),
                jnp.asarray(adv))
            targets = np.asarray(targets)
            matched = np.asarray(matched)

            # --- emit + fork events (model.rs:704-723) ---
            events: List[Tuple[_Branch, int]] = []   # (branch, prefix)

            def emit(br: _Branch, token: int, prefix_len: int):
                if br.finished:
                    return
                br.tokens.append(token)
                if br.allow_fork and token == self.fork_token_id:
                    events.append((br, prefix_len))
                if (token in self.stop_token_ids
                        or len(br.tokens) >= br.max_new):
                    br.finished = True

            for br in active:
                start = lengths[br.slot]
                m = int(matched[br.slot])
                if gen.use_mtp and not br.fresh:
                    stats.mtp_accepted_tokens += m
                if not br.fresh:
                    emit(br, br.pending, start)
                for offset in range(m):
                    if br.finished:
                        break
                    emit(br, int(targets[br.slot, offset]),
                         start + 1 + offset)
                br.pending = int(targets[br.slot, m])
                br.fresh = False
                lengths[br.slot] = start + 1 + m

            # --- spawn children from the post-verification cache at the
            # exact pre-<FORK> boundary (model.rs:496-525) ---
            spawned: List[_Branch] = []
            for parent_br, prefix_len in events:
                remaining = capacity - prefix_len - 1
                if remaining <= 0:
                    continue
                if not free_slots:
                    grow(s + 1)
                slot = free_slots.pop(0)
                cache = cache.copy_row(parent_br.slot, slot, prefix_len)
                hidden = hidden.at[slot].set(0.0)
                lengths[slot] = prefix_len
                child_index = len(children_tokens)
                children_tokens.append([])
                stats.forked_branches += 1
                stats.shared_prefix_tokens += prefix_len
                spawned.append(_Branch(
                    slot=slot, child_index=child_index, allow_fork=False,
                    max_new=min(gen.max_new_tokens, remaining),
                    pending=self.child_token_id, fresh=True))

            unfinished: List[_Branch] = []
            for br in active:
                if br.finished:
                    if br.child_index is None:
                        parent_tokens = br.tokens
                    else:
                        children_tokens[br.child_index] = br.tokens
                    free_slots.append(br.slot)
                else:
                    unfinished.append(br)
            # children bypass FCFS admission; overflow preempts older
            # unfinished branches into the waiting queue (model.rs:541)
            active = list(spawned)
            while len(active) < gen.max_active_branches and (
                    unfinished or waiting):
                active.append(unfinished.pop(0) if unfinished
                              else waiting.pop(0))
            waiting.extend(unfinished)
            if len(active) > gen.max_active_branches:
                waiting.extend(active[gen.max_active_branches:])
                active = active[: gen.max_active_branches]

        assert parent_tokens is not None, "scheduler lost the parent"
        final: List[int] = []
        child_i = 0
        for tok in parent_tokens:
            if tok == self.fork_token_id:
                final.append(self.child_token_id)
                if child_i < len(children_tokens):
                    final.extend(children_tokens[child_i])
                    child_i += 1
            else:
                final.append(tok)
        return HpdSchedulerOutput(parent_tokens, children_tokens, final,
                                  stats)
